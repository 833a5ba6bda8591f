"""Gate the Spark engine's reasoning output against the ACTUAL reference
engine (VERDICT r1 #9): tools/refbuild compiles the reference's reasoning
core verbatim from /root/reference/src/lib (see build_oracle.sh for what is
and is not reference code), a tiny DSL harness feeds it the SAME facts and
the SAME wikidata.zph ruleset the Spark fixpoint gets, and the final
triple sets are compared with the P/R >= 0.95 contract gate (BASELINE.json
north_rule).  Unlike tests/datalog_oracle.py (an independent but
self-derived oracle), the `want` set here is emitted by reference code:
unification.cpp, reasoning_evaluate/deduce/seminaive.cpp, zelph.cpp run
unmodified."""

from __future__ import annotations

import subprocess
from pathlib import Path

import pandas as pd
import pytest

from zelph_spark import extract, rules as Rz
from zelph_spark.reasoning import run_fixpoint

REPO = Path(__file__).resolve().parents[1]
BUILD_SCRIPT = REPO / "tools" / "refbuild" / "build_oracle.sh"
ORACLE_BIN = Path("/tmp/zelph_oracle_build/zelph_oracle")

# Tokens the harness renders for reference-core vocabulary nodes
# (oracle_main.cpp render()); anything carrying one of these, or an
# unnamed/variable node (_n... / _v...), is rule/engine infrastructure —
# conjunction sets, condition patterns, (P ~ RelationTypeCategory)
# auto-declarations (zelph.cpp:495-498) — not a data triple.
GLYPHS = {"~", "=>", "!", "!=", "->", "in"}


def _infrastructure(row: tuple[str, str, str]) -> bool:
    return any(t.startswith(("_n", "_v")) or t in GLYPHS for t in row)


@pytest.fixture(scope="module")
def oracle_bin():
    srcs = [
        BUILD_SCRIPT,
        BUILD_SCRIPT.parent / "oracle_main.cpp",
        BUILD_SCRIPT.parent / "ankerl" / "unordered_dense.h",
    ]
    if not ORACLE_BIN.exists() or any(
        s.stat().st_mtime > ORACLE_BIN.stat().st_mtime for s in srcs
    ):
        r = subprocess.run(
            ["bash", str(BUILD_SCRIPT)], capture_output=True, text=True
        )
        if r.returncode != 0:
            pytest.skip(
                "reference oracle build failed (environment without g++ "
                "or /root/reference): " + r.stderr[-800:]
            )
    return ORACLE_BIN


def _dsl(facts, rules) -> str:
    """Translate (facts, ruleset) to the harness DSL.  `name ~ P31` mirrors
    wikidata.zph:4 (`.name ~ wikidata P31`): the data ruleset's IsA *is* the
    engine's core.IsA node, exactly as in a real wikidata session."""
    lines = ["lang wikidata", "name ~ P31", "name ! Q363948"]
    for s, p, o in sorted(facts):
        lines.append(f"fact {s} {p} {o}")
    for r in rules:
        conds = " | ".join(f"{c.subj} {c.pred} {c.obj}" for c in r.conditions)
        cons = (
            f"{r.consequence.subj} {r.consequence.pred} {r.consequence.obj}"
            if r.consequence is not None
            else "!"
        )
        lines.append(f"rule {conds} => {cons}")
    lines += ["run", "dump"]
    return "\n".join(lines) + "\n"


def run_reference(oracle_bin, tmp_path, facts, rules):
    """Returns (data_triples, n_contradictions) from a reference run."""
    script = tmp_path / "oracle.dsl"
    script.write_text(_dsl(facts, rules))
    r = subprocess.run(
        [str(oracle_bin), str(script)],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-800:]
    out = r.stdout
    body = out.split("===DUMP===")[1].split("===END===")[0]
    triples = set()
    for line in body.strip().splitlines():
        s, p, o, _prob = line.split("\t")
        if not _infrastructure((s, p, o)):
            triples.add((s, p, o))
    n_contra = 0
    # engine diagnostics (iteration banners, totals) go to the Diagnostic
    # channel = stderr when not a TTY; deduction messages go to stdout
    for line in (out + r.stderr).splitlines():
        # "Reasoning complete. Total unification matches processed: N.
        #  Total contradictions found: M."
        if "Total contradictions found:" in line:
            n_contra = int(
                line.rsplit("Total contradictions found:", 1)[1]
                .strip()
                .rstrip(".")
            )
    return triples, n_contra


@pytest.fixture(scope="module")
def fixture_facts(spark, fixture_docs_df):
    t = extract.triples(extract.extract_all(fixture_docs_df))
    base = {(s, p, o) for s, p, o in Rz.BASE_FACTS}
    return {(r.subj, r.pred, r.obj) for r in t.collect()} | base


def _spark_edges(spark, facts, **kw):
    df = spark.createDataFrame(
        pd.DataFrame(sorted(facts), columns=["subj", "pred", "obj"])
    )
    return run_fixpoint(df, Rz.wikidata_rules(), **kw)


def test_wikidata_ruleset_pr_vs_reference_binary(
    spark, oracle_bin, fixture_facts, tmp_path
):
    """The headline contract: P/R >= 0.95 on emitted triples vs the
    reference engine itself, full 22-rule wikidata.zph deduction set on the
    extraction-fixture corpus.  (Expected to be exactly 1.0/1.0.)"""
    want, _ = run_reference(
        oracle_bin, tmp_path, fixture_facts, Rz.wikidata_rules()
    )
    res = _spark_edges(spark, fixture_facts)
    got = {(r.subj, r.pred, r.obj) for r in res.edges.collect()}

    tp = len(got & want)
    precision = tp / len(got) if got else 1.0
    recall = tp / len(want) if want else 1.0
    assert precision >= 0.95, (
        f"precision {precision:.4f}; spurious: {sorted(got - want)[:10]}"
    )
    assert recall >= 0.95, (
        f"recall {recall:.4f}; missing: {sorted(want - got)[:10]}"
    )
    # and in fact exact parity — surface any drift immediately
    assert got == want


def test_contradictions_detected_like_reference(spark, oracle_bin, tmp_path):
    """Contradiction rules (=> !): the reference engine and the Spark sweep
    must agree on whether a planted conflict fires, and derived triples must
    stay in exact parity when contradiction rules are present."""
    facts = {
        ("Q10", "P461", "Q11"),  # X opposite-of Y
        ("Q20", "P1552", "Q10"),  # A has-quality X
        ("Q20", "P1552", "Q11"),  # A has-quality Y  -> c-opp-quality fires
        ("Q30", "P279", "Q31"),
        ("Q31", "P279", "Q32"),
    }
    allrules = Rz.wikidata_rules() + Rz.wikidata_contradiction_rules()
    want, n_contra = run_reference(oracle_bin, tmp_path, facts, allrules)
    assert n_contra > 0

    res = _spark_edges(
        spark,
        facts,
        contradiction_rules=Rz.wikidata_contradiction_rules(),
    )
    assert res.contradictions.count() > 0
    got = {(r.subj, r.pred, r.obj) for r in res.edges.collect()}
    assert got == want


def test_clean_corpus_no_contradictions(spark, oracle_bin, tmp_path):
    # P279 transitivity fires only with the (P279 ~ transitive-relation)
    # declaration that real wikidata carries (WIKIDATA_CORE_FACTS)
    facts = {("Q1", "P279", "Q2"), ("Q2", "P279", "Q3")} | set(
        Rz.WIKIDATA_CORE_FACTS
    )
    allrules = Rz.wikidata_rules() + Rz.wikidata_contradiction_rules()
    want, n_contra = run_reference(oracle_bin, tmp_path, facts, allrules)
    assert n_contra == 0
    assert ("Q1", "P279", "Q3") in want
