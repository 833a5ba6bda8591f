"""Round-6 optimization measurement harness (guide §1: measure first).

NOT part of the driver contract — bench.py stays frozen. This file exists to
isolate and time individual queries with the noop sink, capture
explain("formatted") plans into plans/r06/, and dump the e2e fixpoint's
per-round log so optimization work is evidence-driven.

Usage:
    python bench_extra.py q <name> [<name> ...]   # time queries, noop sink
    python bench_extra.py plan <name> [...]       # write plans/r06/<name>_<tag>.txt
    python bench_extra.py e2e [n_docs]            # run e2e, dump fixpoint log
Env:
    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS   (default 32)
    ZELPH_PLAN_TAG     (default "before") — suffix for plan files
    ZELPH_REPEAT       (default 2) — timing repeats per query
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def get_session():
    from zelph_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("ZELPH_SPARK_PREWARM", "1")
    if not os.environ.get("ZELPH_SPARK_LOCAL_DIR") and os.path.isdir("/dev/shm"):
        shm = "/dev/shm/spark-local"
        os.makedirs(shm, exist_ok=True)
        os.environ["ZELPH_SPARK_LOCAL_DIR"] = shm
    return get_spark(
        app_name="zelph-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, int(cpus) if cpus.isdigit() else 32),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mode = sys.argv[1] if len(sys.argv) > 1 else "q"
    spark = get_session()
    import __spark_entry__ as entry

    qs = entry.queries()
    # warmup: one tiny scan+shuffle so the first timed query doesn't absorb
    # codegen/executor spin-up (same hygiene as bench.py)
    spark.read.parquet(f"{sf_dir}/nation.parquet").groupBy(
        "n_regionkey"
    ).count().collect()

    if mode == "e2e":
        # e2e with the FULL per-round fixpoint log (new-fact counts, per-round
        # seconds, plan seconds) — what run_e2e_pipeline's summary hides
        import shutil
        import tempfile

        from zelph_spark import datagen
        from zelph_spark.pipeline import run_pipeline

        n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
        docs = datagen.synthetic_corpus(spark, n_docs=n_docs, seed=42)
        root = tempfile.mkdtemp(prefix="zelph_bench_extra_")
        try:
            t0 = time.time()
            res = run_pipeline(spark, docs, root)
            n_edges = res.edges.count()
            n_sat = res.saturated_ids.count()
            dt = time.time() - t0
        finally:
            shutil.rmtree(root, ignore_errors=True)
        fx = res.counters.get("fixpoint_log", [])
        print(json.dumps({
            "sec": round(dt, 2), "n_docs": n_docs, "edges": n_edges,
            "saturated": n_sat,
            "stage_secs": res.counters.get("stage_secs", {}),
            "fixpoint_rounds": len([e for e in fx if "iter" in e]),
            "fixpoint_secs": round(sum(e.get("sec", 0) for e in fx), 2),
        }))
        for e in fx:
            print("FXLOG " + json.dumps(e), flush=True)
        return

    if mode == "plan":
        tag = os.environ.get("ZELPH_PLAN_TAG", "before")
        outdir = REPO / "plans" / "r06"
        outdir.mkdir(parents=True, exist_ok=True)
        for name in sys.argv[2:]:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (outdir / f"{name}_{tag}.txt").write_text(plan)
            print(f"wrote plans/r06/{name}_{tag}.txt ({len(plan)} chars)")
        return

    # default: timed noop-sink runs
    repeat = int(os.environ.get("ZELPH_REPEAT", "2"))
    names = sys.argv[2:] if len(sys.argv) > 2 else list(qs)
    out = {}
    for name in names:
        ts = []
        for _ in range(repeat):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = ts
        print(json.dumps({name: ts}), flush=True)
    print("SUMMARY " + json.dumps(out))


if __name__ == "__main__":
    main()
