"""Same-machine, same-data throughput comparison: this engine's Spark
fixpoint vs the reference engine compiled from source (tools/refbuild).

Replaces BASELINE.md's extrapolation from the reference's published
full-Wikidata workstation numbers with a DIRECT measurement: both engines
get the IDENTICAL synthetic taxonomy workload (trusted insert + the
wikidata.zph transitive/subclass rules to fixpoint), on the same host.

Caveats (recorded with the numbers):
- The oracle build substitutes std::unordered_map for ankerl
  unordered_dense and links no mimalloc, both of which the real reference
  build uses; published microbenchmarks put dense maps ~2-3x faster on
  hit-heavy workloads, so reference-side numbers here are a LOWER bound
  on the real binary's speed. Reference reasoning runs its own thread
  pool (hardware_concurrency); insert is single-threaded DSL replay, the
  same shape as its single-reader dump import loop.
- Spark local[N] pays per-job scheduling that a long-lived in-memory
  engine does not; at these sizes that fixed cost is a large fraction,
  which is the honest point of the comparison.

Usage: python tools/ref_bench.py [--classes 2000] [--depth 12]
       [--instances 100000] [--cpus 32]
Emits one JSON line.
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

ORACLE = Path("/tmp/zelph_oracle_build/zelph_oracle")
BUILD = REPO / "tools" / "refbuild" / "build_oracle.sh"


def workload(n_chains: int, depth: int, n_instances: int):
    """Deterministic taxonomy: `n_chains` subclass chains of `depth`,
    instances attached at the chain bottoms. With the wikidata ruleset
    this saturates to chain closures (transitive meta-rule) plus
    instance lifts (subclass-lift) — the dominant rule shapes of the
    real wikidata run."""
    facts = [("P279", "P31", "Q18647515")]  # P279 ~ transitive relation
    for c in range(n_chains):
        for d in range(depth - 1):
            facts.append((f"C{c}_{d}", "P279", f"C{c}_{d+1}"))
    for i in range(n_instances):
        c = i % n_chains
        facts.append((f"Q{i}", "P31", f"C{c}_0"))
    return facts


def run_reference(facts, rules_lines):
    dsl = ["lang wikidata", "name ~ P31", "name ! Q363948", "time setup"]
    dsl += [f"trusted {s} {p} {o}" for s, p, o in facts]
    dsl.append("time insert")
    dsl += rules_lines
    dsl.append("time rules")
    dsl.append("run")
    dsl.append("time reason")
    import tempfile

    # unique path per run: the harness streams the DSL line-by-line, so a
    # shared fixed path corrupts any concurrently running benchmark
    fd, name = tempfile.mkstemp(prefix="ref_bench_", suffix=".dsl", dir="/tmp")
    path = Path(name)
    with open(fd, "w") as f:
        f.write("\n".join(dsl) + "\n")
    t0 = time.time()
    r = subprocess.run(
        [str(ORACLE), str(path)], capture_output=True, text=True, timeout=7200
    )
    wall = time.time() - t0
    assert r.returncode == 0, r.stderr[-2000:]
    times = dict(
        (m.group(1), float(m.group(2)))
        for m in re.finditer(r"TIME (\S+) ([0-9.]+)", r.stderr)
    )
    m = re.search(r"matches processed: (\d+)", r.stdout + r.stderr)
    matches = int(m.group(1)) if m else None
    return {
        "insert_s": round(times.get("insert", 0.0), 2),
        "reason_s": round(times.get("reason", 0.0), 2),
        "wall_s": round(wall, 2),
        "matches": matches,
    }


def rules_dsl():
    from zelph_spark import rules as Rz

    lines = []
    for r in Rz.wikidata_rules():
        # This simple emitter covers only plain conjunctive rules with one
        # consequence; assert the benchmarked ruleset has no constructs it
        # would silently drop (the full translation lives in
        # tests/test_reference_oracle.py::_dsl).
        assert not r.negated, f"{r.rule_id}: negated conditions unsupported"
        assert not r.unequals, f"{r.rule_id}: unequal guards unsupported"
        assert not r.extra_consequences, (
            f"{r.rule_id}: extra consequences unsupported"
        )
        conds = " | ".join(
            f"{c.subj} {c.pred} {c.obj}" for c in r.conditions
        )
        cons = r.consequence
        lines.append(
            f"rule {conds} => {cons.subj} {cons.pred} {cons.obj}"
        )
    return lines


def run_spark(facts, cpus):
    from pyspark.sql import functions as F  # noqa: F401

    from zelph_spark import rules as Rz
    from zelph_spark.reasoning import run_fixpoint
    from zelph_spark.session import get_spark

    spark = get_spark(
        app_name="ref-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "32g"},
    )
    t0 = time.time()
    df = spark.createDataFrame(facts, "subj string, pred string, obj string")
    df = df.repartition(int(cpus)).cache()
    n_in = df.count()
    insert_s = time.time() - t0

    t0 = time.time()
    res = run_fixpoint(df, Rz.wikidata_rules())
    n_out = res.edges.count()
    reason_s = time.time() - t0
    spark.stop()
    return {
        "insert_s": round(insert_s, 2),
        "reason_s": round(reason_s, 2),
        "n_in": n_in,
        "n_out": n_out,
        "deduced": n_out - n_in,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--classes", type=int, default=2000)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--instances", type=int, default=100_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    if not ORACLE.exists():
        subprocess.run(["bash", str(BUILD)], check=True, capture_output=True)

    facts = workload(args.classes, args.depth, args.instances)
    ref = run_reference(facts, rules_dsl())
    spk = run_spark(facts, args.cpus)

    n = len(facts)
    out = {
        "workload": {
            "chains": args.classes,
            "depth": args.depth,
            "instances": args.instances,
            "facts": n,
        },
        "reference_oracle": {
            **ref,
            "insert_facts_per_s": round(n / ref["insert_s"])
            if ref["insert_s"]
            else None,
        },
        "zelph_spark": {
            **spk,
            "insert_facts_per_s": round(n / spk["insert_s"])
            if spk["insert_s"]
            else None,
            "deduced_per_s": round(spk["deduced"] / spk["reason_s"])
            if spk["reason_s"]
            else None,
        },
        "cpus": args.cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
