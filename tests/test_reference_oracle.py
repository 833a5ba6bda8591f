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
    for f in sorted(facts):
        lines.append(
            f"fact {f[0]} {f[1]} {f[2]}"
            + (f" {f[3]}" if len(f) == 4 else "")
        )
    for r in rules:
        parts = [
            ("not " if i in r.negated else "")
            + f"{c.subj} {c.pred} {c.obj}"
            for i, c in enumerate(r.conditions)
        ]
        # inequality guards are conditions with relation core.Unequal
        # (reasoning_evaluate.cpp:158)
        parts += [f"{a} != {b}" for a, b in r.unequals]
        conds = " | ".join(parts)
        cons = (
            " | ".join(f"{c.subj} {c.pred} {c.obj}" for c in r.consequences)
            if r.consequences
            else "!"
        )
        lines.append(f"rule {conds} => {cons}")
    lines += ["run", "dump"]
    return "\n".join(lines) + "\n"


def _run_oracle(oracle_bin, tmp_path, dsl_text):
    script = tmp_path / "oracle.dsl"
    script.write_text(dsl_text)
    return subprocess.run(
        [str(oracle_bin), str(script)],
        capture_output=True,
        text=True,
        timeout=600,
    )


def _parse_dump(r):
    """(data_triples, probs, n_contradictions) from a completed run."""
    body = r.stdout.split("===DUMP===")[1].split("===END===")[0]
    triples, probs = set(), {}
    for line in body.strip().splitlines():
        s, p, o, prob = line.split("\t")
        if not _infrastructure((s, p, o)):
            triples.add((s, p, o))
            # a triple can appear on several lines: hash-consing is by the
            # ORIGINAL components, so entity merges leave duplicate reified
            # facts whose decoded triples coincide — keep every prob
            probs.setdefault((s, p, o), []).append(float(prob))
    n_contra = 0
    # engine diagnostics (iteration banners, totals) go to the Diagnostic
    # channel = stderr when not a TTY; deduction messages go to stdout
    for line in (r.stdout + r.stderr).splitlines():
        # "Reasoning complete. Total unification matches processed: N.
        #  Total contradictions found: M."
        if "Total contradictions found:" in line:
            n_contra = int(
                line.rsplit("Total contradictions found:", 1)[1]
                .strip()
                .rstrip(".")
            )
    return triples, probs, n_contra


def run_reference(oracle_bin, tmp_path, facts, rules):
    """Returns (data_triples, n_contradictions) from a reference run."""
    r = _run_oracle(oracle_bin, tmp_path, _dsl(facts, rules))
    assert r.returncode == 0, r.stderr[-800:]
    triples, _probs, n_contra = _parse_dump(r)
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


def test_naf_stratum_parity(spark, oracle_bin, tmp_path):
    """Stratified negation: the reference defers NAF rules to positive
    quiescence (reasoning_seminaive.cpp:140-150); our fixpoint does the
    same (R9).  The classic race case — a NAF rule whose negation target
    is derived late by a positive chain — must agree."""
    facts = {
        ("Q1", "P279", "Q2"),
        ("Q2", "P279", "Q3"),
        ("Q7", "P999", "Q7"),
        ("P279", "P31", "Q18647515"),  # P279 ~ transitive
    }
    rules = [
        # NAF: anything with a P999 self-loop and NOT a subclass of Q3
        # gets tagged; Q1 IS a subclass of Q3 but only after closure.
        Rz.R(
            "naf",
            [Rz.P("?X", "P999", "?X"), Rz.P("?X", "P279", "Q3")],
            Rz.P("?X", "P100", "Q3"),
            negated=(1,),
        ),
        Rz.R(
            "trans",
            [
                Rz.P("?R", "P31", "Q18647515"),
                Rz.P("?X", "?R", "?Y"),
                Rz.P("?Y", "?R", "?Z"),
            ],
            Rz.P("?X", "?R", "?Z"),
        ),
    ]
    want, _ = run_reference(oracle_bin, tmp_path, facts, rules)
    df = spark.createDataFrame(
        pd.DataFrame(sorted(facts), columns=["subj", "pred", "obj"])
    )
    res = run_fixpoint(df, rules)
    got = {(r.subj, r.pred, r.obj) for r in res.edges.collect()}
    assert got == want
    # the NAF deduction must exist (Q7 has no P279 path to Q3)
    assert ("Q7", "P100", "Q3") in got


def test_unequal_guard_parity(spark, oracle_bin, tmp_path):
    """Inequality guards (J10): (?X != ?Y) conditions use core.Unequal
    (reasoning_evaluate.cpp:158) and must prune identical bindings the
    same way on both engines."""
    facts = {
        ("Q1", "P50", "Q5"),
        ("Q2", "P50", "Q5"),
        ("Q1", "P50", "Q6"),
    }
    rules = [
        Rz.R(
            "siblings",
            [Rz.P("?A", "P50", "?C"), Rz.P("?B", "P50", "?C")],
            Rz.P("?A", "P60", "?B"),
            unequals=(("?A", "?B"),),
        )
    ]
    want, _ = run_reference(oracle_bin, tmp_path, facts, rules)
    df = spark.createDataFrame(
        pd.DataFrame(sorted(facts), columns=["subj", "pred", "obj"])
    )
    res = run_fixpoint(df, rules)
    got = {(r.subj, r.pred, r.obj) for r in res.edges.collect()}
    assert got == want
    assert ("Q1", "P60", "Q1") not in got  # guard pruned the reflexive pair
    assert ("Q1", "P60", "Q2") in got


def test_assert_time_probability_conflict_parity(spark, oracle_bin, tmp_path):
    """Cross-0.5 probability conflict on the SAME triple: the reference
    detects it at assert time and throws ('fact(): this fact is known to
    be wrong', zelph.cpp:476-483); the distributed engine cannot throw
    per-row, so the same condition surfaces as a conflict row from
    canon.relabel_edges — both must detect it."""
    from zelph_spark import canon

    dsl = "\n".join(
        [
            "lang wikidata",
            "fact Qd1 P13 Qt 0.4",
            "fact Qd1 P13 Qt 0.6",
            "dump",
        ]
    )
    r = _run_oracle(oracle_bin, tmp_path, dsl + "\n")
    assert r.returncode != 0
    assert "known to be wrong" in (r.stderr + r.stdout)

    edges = spark.createDataFrame(
        pd.DataFrame(
            [("Qd1", "P13", "Qt", 0.4), ("Qd1", "P13", "Qt", 0.6)],
            columns=["subj", "pred", "obj", "prob"],
        )
    )
    mm = spark.createDataFrame([], "node string, canon string")
    _resolved, conflicts = canon.relabel_edges(edges, mm)
    assert {(r.subj, r.pred, r.obj) for r in conflicts.collect()} == {
        ("Qd1", "P13", "Qt")
    }


def test_merge_duplicate_fact_probabilities(spark, oracle_bin, tmp_path):
    """What an entity merge actually does to coinciding facts, measured
    against the reference: hash-consing keys facts by their ORIGINAL
    components (network.hpp:474-483), so after merging Qc2 into Qc1 the
    two reified facts survive as distinct nodes whose decoded triples
    coincide — the reference keeps BOTH probability observations.  A
    distributed engine stores triples as rows, so coinciding rows must
    collapse; canon.relabel_edges resolves them with the reference's own
    edge-reconciliation policy (Network::merge, network.hpp:241-254:
    both<=0.5 -> min — including the {0.4, 0.5} boundary, which the
    branch order assigns to the min side; both>=0.5 -> max; cross -> the
    error path, surfaced as a conflict row). This test pins the reference
    behavior (both observations survive, no error) and that our collapse
    picks a value from the reference's surviving set by that policy."""
    from zelph_spark import canon

    dsl = "\n".join(
        [
            "lang wikidata",
            "fact Qc1 P12 Qt 0.4",
            "fact Qc2 P12 Qt 0.5",
            "fact Qb1 P11 Qt 0.6",
            "fact Qb2 P11 Qt 0.9",
            "merge Qc2 Qc1",
            "merge Qb2 Qb1",
            "dump",
        ]
    )
    r = _run_oracle(oracle_bin, tmp_path, dsl + "\n")
    assert r.returncode == 0, r.stderr[-800:]
    _triples, ref_probs, _ = _parse_dump(r)
    assert sorted(ref_probs[("Qc1", "P12", "Qt")]) == [0.4, 0.5]
    assert sorted(ref_probs[("Qb1", "P11", "Qt")]) == [0.6, 0.9]

    edges = spark.createDataFrame(
        pd.DataFrame(
            [
                ("Qc1", "P12", "Qt", 0.4),
                ("Qc2", "P12", "Qt", 0.5),
                ("Qb1", "P11", "Qt", 0.6),
                ("Qb2", "P11", "Qt", 0.9),
            ],
            columns=["subj", "pred", "obj", "prob"],
        )
    )
    mm = spark.createDataFrame(
        pd.DataFrame(
            [("Qc2", "Qc1"), ("Qb2", "Qb1")], columns=["node", "canon"]
        )
    )
    resolved, conflicts = canon.relabel_edges(edges, mm)
    assert conflicts.count() == 0
    got = {(r.subj, r.pred, r.obj): r.prob for r in resolved.collect()}
    # min of the both<=0.5 pair (0.4, boundary 0.5 owned by the min branch),
    # max of the both>=0.5 pair — each a member of the reference's kept set
    assert got[("Qc1", "P12", "Qt")] == pytest.approx(0.4)
    assert got[("Qb1", "P11", "Qt")] == pytest.approx(0.9)


def test_fresh_variable_rule_parity(spark, oracle_bin, tmp_path):
    """R6 fresh-variable rules: consequence variables unbound by conditions
    mint a new node per firing (reasoning_deduce.cpp:48-130), suppressed by
    the consequences_already_exist guard.  The reference's fresh nodes are
    anonymous counters and ours are deterministic hashes, so parity is
    structural: same fired bindings, one fresh target each, shared across
    both consequences, guard-suppressed where consequences pre-exist, and
    a second saturation deduces nothing."""
    facts = {
        ("Q1", "P31", "Qc"),
        ("Q2", "P31", "Qc"),
        ("Q5", "P31", "Qc"),
        # Q5's consequences pre-exist -> the guard must not mint for Q5
        ("Q5", "P100", "Q77"),
        ("Q77", "P31", "Qm"),
    }
    rule = Rz.R(
        "mk",
        [Rz.P("?X", "P31", "Qc")],
        [Rz.P("?X", "P100", "?N"), Rz.P("?N", "P31", "Qm")],
    )

    r = _run_oracle(oracle_bin, tmp_path, _dsl(facts, [rule]))
    assert r.returncode == 0, r.stderr[-800:]
    body = r.stdout.split("===DUMP===")[1].split("===END===")[0]
    ref = set()
    for line in body.strip().splitlines():
        s, p, o, _prob = line.split("\t")
        # keep fresh nodes (_n...) as data; drop rule machinery (glyph
        # predicates/objects, variable templates)
        if any(t in GLYPHS or t.startswith("_v") for t in (s, p, o)):
            continue
        ref.add((s, p, o))

    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(sorted(facts), columns=["subj", "pred", "obj"])
    )
    res = run_fixpoint(df, [rule])
    got = {(r_.subj, r_.pred, r_.obj) for r_ in res.edges.collect()}

    def structure(triples):
        """{X: fresh target} for fired bindings + invariants."""
        p100 = {}
        for s, p, o in triples:
            if p == "P100":
                p100.setdefault(s, set()).add(o)
        meta = {s for s, p, o in triples if p == "P31" and o == "Qm"}
        return p100, meta

    ref_p100, ref_meta = structure(ref)
    got_p100, got_meta = structure(got)
    for side_p100, side_meta in ((ref_p100, ref_meta), (got_p100, got_meta)):
        # Q1/Q2 minted exactly one fresh target each, distinct, typed Qm
        assert set(side_p100) == {"Q1", "Q2", "Q5"}
        assert side_p100["Q5"] == {"Q77"}  # guard: no new node for Q5
        t1, t2 = side_p100["Q1"], side_p100["Q2"]
        assert len(t1) == 1 and len(t2) == 1 and t1 != t2
        assert t1 | t2 <= side_meta

    # termination: a second saturation over the result deduces nothing
    res2 = run_fixpoint(res.edges, [rule])
    assert res2.n_deduced == 0


def test_fresh_variable_unprojected_body_var_parity(
    spark, oracle_bin, tmp_path
):
    """R6 minting must key on the *consequence* instantiation, not the full
    binding: for ``[?X P50 ?Y] => ?X P100 ?N`` the reference's sequential
    consequences_already_exist guard (reasoning_deduce.cpp:48-130) mints ONE
    fresh node per distinct ?X — the second firing for the same ?X (different
    ?Y) sees the consequence already present and is suppressed.  A minting
    keyed on all binding columns would create one node per (?X, ?Y)."""
    facts = {
        ("Q1", "P50", "Qa"),
        ("Q1", "P50", "Qb"),
        ("Q1", "P50", "Qd"),
        ("Q2", "P50", "Qa"),
    }
    rule = Rz.R(
        "mk1",
        [Rz.P("?X", "P50", "?Y")],
        [Rz.P("?X", "P100", "?N"), Rz.P("?N", "P31", "Qm")],
    )

    r = _run_oracle(oracle_bin, tmp_path, _dsl(facts, [rule]))
    assert r.returncode == 0, r.stderr[-800:]
    body = r.stdout.split("===DUMP===")[1].split("===END===")[0]
    ref = set()
    for line in body.strip().splitlines():
        s, p, o, _prob = line.split("\t")
        if any(t in GLYPHS or t.startswith("_v") for t in (s, p, o)):
            continue
        ref.add((s, p, o))

    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(sorted(facts), columns=["subj", "pred", "obj"])
    )
    res = run_fixpoint(df, [rule])
    got = {(r_.subj, r_.pred, r_.obj) for r_ in res.edges.collect()}

    def p100(triples):
        out = {}
        for s, p, o in triples:
            if p == "P100":
                out.setdefault(s, set()).add(o)
        return out

    ref_p100, got_p100 = p100(ref), p100(got)
    for side in (ref_p100, got_p100):
        # exactly one fresh target per distinct ?X, not per (?X, ?Y) firing
        assert set(side) == {"Q1", "Q2"}
        assert len(side["Q1"]) == 1 and len(side["Q2"]) == 1
        assert side["Q1"] != side["Q2"]

    # fresh ids are minted in the reserved range, disjoint from imports
    fresh_got = set().union(*got_p100.values())
    assert all(t.startswith("_f") for t in fresh_got)

    res2 = run_fixpoint(res.edges, [rule])
    assert res2.n_deduced == 0


def test_fresh_variable_constant_consequence_parity(
    spark, oracle_bin, tmp_path
):
    """Degenerate R6 shape: every consequence term is a constant or fresh
    (``[?X P31 Qc] => Qz P100 ?N``).  The reference mints exactly one fresh
    node on the first firing and suppresses the rest; the projected-mint
    compiler path must collapse all bindings to a single firing too."""
    facts = {
        ("Q1", "P31", "Qc"),
        ("Q2", "P31", "Qc"),
        ("Q3", "P31", "Qc"),
    }
    rule = Rz.R(
        "mk2",
        [Rz.P("?X", "P31", "Qc")],
        [Rz.P("Qz", "P100", "?N")],
    )

    r = _run_oracle(oracle_bin, tmp_path, _dsl(facts, [rule]))
    assert r.returncode == 0, r.stderr[-800:]
    body = r.stdout.split("===DUMP===")[1].split("===END===")[0]
    ref_targets = set()
    for line in body.strip().splitlines():
        s, p, o, _prob = line.split("\t")
        if s == "Qz" and p == "P100":
            ref_targets.add(o)
    assert len(ref_targets) == 1

    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(sorted(facts), columns=["subj", "pred", "obj"])
    )
    res = run_fixpoint(df, [rule])
    got_targets = {
        r_.obj
        for r_ in res.edges.collect()
        if r_.subj == "Qz" and r_.pred == "P100"
    }
    assert len(got_targets) == 1
    res2 = run_fixpoint(res.edges, [rule])
    assert res2.n_deduced == 0


def test_transitive_closure_parity(spark, oracle_bin, tmp_path):
    """C1 transitive_targets vs the reference's bfs_over_index on a branchy
    cyclic graph (closure semantics: reachable-via-predicate, excluding the
    start unless it is reachable through a cycle)."""
    import pandas as pd

    edges = [
        ("Q1", "P279", "Q2"), ("Q2", "P279", "Q3"), ("Q3", "P279", "Q1"),
        ("Q2", "P279", "Q4"), ("Q4", "P279", "Q5"), ("Q6", "P279", "Q4"),
        ("Q5", "P527", "Q9"),  # different predicate: must not leak in
    ]
    dsl = ["lang wikidata"]
    dsl += [f"fact {s} {p} {o}" for s, p, o in edges]
    dsl += ["closure Q1 P279"]
    r = _run_oracle(oracle_bin, tmp_path, "\n".join(dsl) + "\n")
    assert r.returncode == 0, r.stderr[-800:]
    body = r.stdout.split("===CLOSURE===")[1].split("===ENDCLOSURE===")[0]
    ref = set(body.split())

    from zelph_spark import closure

    pairs = spark.createDataFrame(
        pd.DataFrame(
            [(s, o) for s, p, o in edges if p == "P279"],
            columns=["subj", "obj"],
        )
    )
    start = spark.createDataFrame(pd.DataFrame({"node": ["Q1"]}))
    got = {
        r_.node
        for r_ in closure.transitive_targets(pairs, start).collect()
    }
    assert got == ref
    assert "Q1" in got  # reachable through the 3-cycle
    assert "Q9" not in got  # other predicate excluded


def _reference_import(oracle_bin, tmp_path, dump_path):
    """Run the reference Wikidata importer (wikidata.cpp, compiled from
    source) on a dump file; returns (data_triples, {qid: en_label})."""
    dsl = f"lang wikidata\nimport {dump_path}\ndump\ndumpnames en\n"
    r = _run_oracle(oracle_bin, tmp_path, dsl)
    assert r.returncode == 0, r.stderr[-800:]
    triples, _probs, _ = _parse_dump(r)
    names_body = r.stdout.split("===NAMES===")[1].split("===ENDNAMES===")[0]
    labels = {}
    for line in names_body.strip().splitlines():
        qid, label = line.split("\t", 1)
        if qid:
            labels[qid] = label
    return triples, labels


def _our_import(spark, dump_path):
    from zelph_spark.sources import dump as dmod

    lines = dmod.read_dump_lines(spark, str(dump_path))
    rows = dmod.extract_from_dump(lines).cache()
    triples = {
        (r.subj, r.pred, r.obj)
        for r in rows.filter("row_kind = 'triple'").collect()
    }
    labels = {
        r.subj: r.name for r in rows.filter("row_kind = 'label'").collect()
    }
    return triples, labels


def test_dump_import_parity_fixture(spark, oracle_bin, tmp_path):
    """S1/S2 import parity vs the reference importer itself: the verbatim
    wikidata.cpp tag-scanning parser (compiled from source) and our
    extract_from_dump must produce identical (subj, pred, obj) sets and
    identical en labels on the same synthetic dump."""
    from zelph_spark import datagen

    dump_path = tmp_path / "dump.json"
    dump_path.write_text(
        "\n".join(datagen.render_line(e) for e in datagen.fixture_entities())
        + "\n"
    )
    ref_triples, ref_labels = _reference_import(oracle_bin, tmp_path, dump_path)
    our_triples, our_labels = _our_import(spark, dump_path)
    assert our_triples == ref_triples
    assert our_labels == ref_labels


def test_dump_import_parity_large(spark, oracle_bin, tmp_path):
    """Same gate on a 2,000-entity synthetic dump exercising the
    scale-free claim mix bench.py uses (item + string + opposite/part
    claims, aliased entities)."""
    from zelph_spark import datagen

    ents = []
    for i in range(2000):
        claims = [("P31", ("item", f"Q{(i % 97) + 10}"))]
        if i % 3 == 0:
            claims.append(("P279", ("item", f"Q{((i + 1) % 997) + 1000}")))
        if i % 5 == 0:
            claims.append(("P527", ("item", f"Q{((i * 7) % 9973) + 1000}")))
        if i % 11 == 0:
            claims.append(("P461", ("item", f"Q{((i * 3) % 9973) + 1000}")))
        if i % 7 == 0:
            claims.append(("P1476", ("string", f"title {i}")))
        ents.append(
            {
                "id": f"Q{i + 1000}",
                "labels": {"en": f"entity {i}"},
                "aliases": {"en": [f"e{i}"]} if i % 2 == 0 else {},
                "claims": claims,
            }
        )
    dump_path = tmp_path / "dump.json"
    dump_path.write_text(
        "\n".join(datagen.render_line(e) for e in ents) + "\n"
    )
    ref_triples, ref_labels = _reference_import(oracle_bin, tmp_path, dump_path)
    our_triples, our_labels = _our_import(spark, dump_path)
    assert our_triples == ref_triples
    assert our_labels == ref_labels


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


def test_low_prob_fact_feeds_rules_parity(spark, oracle_bin, tmp_path):
    """Probability semantics (a): unification IGNORES fact probabilities — a
    prob-0.1 ("known to be wrong", network.hpp:65-94) fact fires rules
    exactly like a trusted one, and the deduced fact lands with prob 1
    (rule confidence, reasoning.hpp:58-62). Verified against the compiled
    reference, mirrored by run_fixpoint keeping every triple in the input."""
    facts = {("Q1", "P50", "Q2", 0.1)}
    rule = Rz.R("r", [Rz.P("?X", "P50", "?Y")], [Rz.P("?X", "P60", "?Y")])

    r = _run_oracle(oracle_bin, tmp_path, _dsl(facts, [rule]))
    assert r.returncode == 0, r.stderr[-800:]
    triples, probs, n_contra = _parse_dump(r)
    assert ("Q1", "P60", "Q2") in triples
    assert probs[("Q1", "P60", "Q2")] == [1.0]
    assert probs[("Q1", "P50", "Q2")] == [0.1]
    assert n_contra == 0

    import pandas as pd

    edges = spark.createDataFrame(
        pd.DataFrame([("Q1", "P50", "Q2")], columns=["subj", "pred", "obj"])
    )
    wrong = spark.createDataFrame(
        pd.DataFrame([("Q1", "P50", "Q2")], columns=["subj", "pred", "obj"])
    )
    res = run_fixpoint(edges, [rule], wrong_facts=wrong)
    got = {(x.subj, x.pred, x.obj) for x in res.edges.collect()}
    assert ("Q1", "P60", "Q2") in got  # the low-prob fact fired the rule
    assert res.contradictions.count() == 0  # deduced fact is NOT known-wrong


def test_deduced_known_wrong_contradiction_parity(spark, oracle_bin, tmp_path):
    """Probability semantics (b): a rule firing whose consequence is a
    known-wrong fact (prob < 0.5) raises a contradiction and does NOT
    create or upgrade the fact (reasoning_deduce.cpp:244-292,
    zelph.cpp:477: fact() throws 'known to be wrong'). Reference counts 1
    contradiction and keeps prob 0.1; run_fixpoint reports the firing as a
    '#deduced-wrong' contradiction row and deduces nothing."""
    facts = {("Q1", "P50", "Q2"), ("Q1", "P60", "Q2", 0.1)}
    rule = Rz.R("r", [Rz.P("?X", "P50", "?Y")], [Rz.P("?X", "P60", "?Y")])

    r = _run_oracle(oracle_bin, tmp_path, _dsl(facts, [rule]))
    assert r.returncode == 0, r.stderr[-800:]
    triples, probs, n_contra = _parse_dump(r)
    assert n_contra == 1
    assert probs[("Q1", "P60", "Q2")] == [0.1]  # not upgraded

    import pandas as pd

    edges = spark.createDataFrame(
        pd.DataFrame(
            [("Q1", "P50", "Q2"), ("Q1", "P60", "Q2")],
            columns=["subj", "pred", "obj"],
        )
    )
    wrong = spark.createDataFrame(
        pd.DataFrame([("Q1", "P60", "Q2")], columns=["subj", "pred", "obj"])
    )
    res = run_fixpoint(edges, [rule], wrong_facts=wrong)
    assert res.n_deduced == 0
    rows = res.contradictions.collect()
    assert len(rows) == 1
    assert rows[0].rule_id == "r#deduced-wrong"
    assert rows[0].bindings == {"X": "Q1", "Y": "Q2"}


def test_naf_rule_deduced_known_wrong_contradiction_parity(
    spark, oracle_bin, tmp_path
):
    """Probability semantics (c), closing ADVICE r3 #2: the per-deduction
    known-wrong check (reasoning_deduce.cpp:289-292) runs for NAF rules
    too — a rule with a negated condition whose firing re-deduces a
    prob<0.1 fact raises a contradiction exactly like a positive-only rule.
    deduced_wrong_contradictions previously skipped rules with negated
    conditions silently."""
    facts = {("Q1", "P50", "Q2"), ("Q1", "P60", "Q2", 0.1)}
    # X P50 Y AND NOT (X P70 Y) => X P60 Y ; P70 is empty so the rule fires
    rule = Rz.R(
        "r",
        [Rz.P("?X", "P50", "?Y"), Rz.P("?X", "P70", "?Y")],
        [Rz.P("?X", "P60", "?Y")],
        negated=(1,),
    )

    r = _run_oracle(oracle_bin, tmp_path, _dsl(facts, [rule]))
    assert r.returncode == 0, r.stderr[-800:]
    triples, probs, n_contra = _parse_dump(r)
    assert n_contra == 1
    assert probs[("Q1", "P60", "Q2")] == [0.1]  # not upgraded

    import pandas as pd

    edges = spark.createDataFrame(
        pd.DataFrame(
            [("Q1", "P50", "Q2"), ("Q1", "P60", "Q2")],
            columns=["subj", "pred", "obj"],
        )
    )
    wrong = spark.createDataFrame(
        pd.DataFrame([("Q1", "P60", "Q2")], columns=["subj", "pred", "obj"])
    )
    res = run_fixpoint(edges, [rule], wrong_facts=wrong)
    assert res.n_deduced == 0
    rows = res.contradictions.collect()
    assert len(rows) == 1
    assert rows[0].rule_id == "r#deduced-wrong"
    assert rows[0].bindings == {"X": "Q1", "Y": "Q2"}


def test_drop_cluster_later_outside_fact_parity(spark, oracle_bin, tmp_path):
    """drop_cluster destructive semantics (ADVICE r3 medium): membership is
    recorded at node-CREATION time (network.hpp:679-692), and dropping the
    cluster removes recorded nodes with ALL their edges — including a fact
    asserted LATER in the default workspace that references a
    cluster-created node (zelph_maintenance.cpp:162-181 remove_node).

    Reference run (compiled binary): Q10/P71/Q11 are created inside the
    cluster; (Q1 P70 Q10) is asserted after deactivation.  The drop removes
    5 recorded nodes; the later outside fact loses its object edge and
    survives only as a degenerate dangling decode (Q1 P70 Q1) — the
    relational model drops the destroyed row outright, so parity is on the
    well-formed triple set."""
    dsl = (
        "lang wikidata\n"
        "fact Q1 P70 Q2\n"
        "cluster exp\n"
        "fact Q10 P71 Q11\n"
        "nocluster\n"
        "fact Q1 P70 Q10\n"
        "dropcluster exp\n"
        "dump\n"
        "listclusters\n"
    )
    r = _run_oracle(oracle_bin, tmp_path, dsl)
    assert r.returncode == 0, r.stderr[-800:]
    ref_triples, _probs, _ = _parse_dump(r)
    assert "DROPPED 5" in r.stderr
    # the cluster fact AND the later outside fact are gone; the dangling
    # decode artifact (Q1 P70 Q1) is the reference's remove_node residue
    assert ref_triples == {("Q1", "P70", "Q2"), ("Q1", "P70", "Q1")}
    clusters_body = r.stdout.split("===CLUSTERS===")[1].split(
        "===ENDCLUSTERS==="
    )[0]
    assert clusters_body.strip() == ""

    from zelph_spark import clusters as cmod

    import pandas as pd

    def df(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["subj", "pred", "obj"])
        )

    edges, mem = cmod.assert_batch(
        df([("Q1", "P70", "Q2")]), df([("Q1", "P70", "Q2")])
    )
    edges, mem = cmod.assert_batch(
        edges, df([("Q10", "P71", "Q11")]), cluster="exp", membership=mem
    )
    edges, mem = cmod.assert_batch(
        edges, df([("Q1", "P70", "Q10")]), membership=mem
    )
    kept, _, mem2 = cmod.drop_cluster(edges, "exp", membership=mem)
    got = {(x.subj, x.pred, x.obj) for x in kept.collect()}
    # well-formed parity: reference set minus its dangling-decode artifact
    assert got == {("Q1", "P70", "Q2")}
    assert cmod.list_clusters(kept).count() == 0
    assert mem2.count() == 0
