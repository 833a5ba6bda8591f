"""Fixpoint semantics vs the independent Datalog oracle + the semantic
probes of FIXTURES.md §6 (ported from the reference's test_reasoning /
test_stratified / test_seminaive suites)."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

import datalog_oracle as oracle
from zelph_spark import datagen, extract, rules as Rz
from zelph_spark.reasoning import (
    evaluate_query,
    run_fixpoint,
    verify_fixpoint,
)
from zelph_spark.rules import P, R


def _df(spark, triples):
    return spark.createDataFrame(
        pd.DataFrame(triples, columns=["subj", "pred", "obj"])
    )


def _edge_set(df):
    return {(r.subj, r.pred, r.obj) for r in df.collect()}


# ---------------------------------------------------------------------------
# Full wikidata.zph ruleset on the fixture corpus, vs the oracle
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fixture_facts(spark, fixture_docs_df):
    t = extract.triples(extract.extract_all(fixture_docs_df))
    base = {(s, p, o) for s, p, o in Rz.BASE_FACTS}
    facts = {(r.subj, r.pred, r.obj) for r in t.collect()} | base
    return facts


def test_wikidata_ruleset_matches_oracle(spark, fixture_facts):
    want = oracle.stratified_fixpoint(fixture_facts, Rz.wikidata_rules())
    edges = _df(spark, sorted(fixture_facts))
    res = run_fixpoint(
        edges,
        Rz.wikidata_rules(),
        contradiction_rules=Rz.wikidata_contradiction_rules(),
    )
    got = _edge_set(res.edges)
    assert got == want
    assert res.n_deduced == len(want) - len(fixture_facts)
    # differential safety net (reasoning_seminaive.cpp:386-407)
    assert verify_fixpoint(res, Rz.wikidata_rules())
    # contradictions vs oracle
    want_c = oracle.contradiction_bindings(
        want, Rz.wikidata_contradiction_rules()
    )
    got_c = {
        (r.rule_id, frozenset(r.bindings.items()))
        for r in res.contradictions.collect()
    }
    assert got_c == want_c
    # the seeded contradictions actually fire
    fired = {r.rule_id for r in res.contradictions.collect()}
    assert "c-isa-cycle" in fired  # Q501/Q502
    assert "c-isa-and-sub" in fired  # Q503
    assert "c-opp-quality" in fired  # Q203 hot+cold


def test_expected_signature_deductions(spark, fixture_facts):
    res = run_fixpoint(_df(spark, sorted(fixture_facts)), Rz.wikidata_rules())
    got = _edge_set(res.edges)
    assert ("Q100", "P31", "Q215627") in got  # subclass lift
    assert ("Q100", "P31", "Q35120") in got  # + transitive P279
    assert ("Q213", "P527", "Q212") in got  # transitive has-part (3 hops)
    assert ("Q202", "P461", "Q201") in got  # symmetry
    assert ("Q211", "P361", "Q210") in got  # inverse swap P527 -> P361
    assert ("Q401", "P31", "Q35120") in got  # facet isa
    assert ("Q401", "P527", "Q403") in got  # facet has-part
    assert ("P361", "P1696", "P527") in got and ("P527", "P1696", "P361") in got


def test_naive_equals_seminaive(spark, fixture_facts):
    """Differential equivalence, test_seminaive.cpp:71."""
    edges = _df(spark, sorted(fixture_facts))
    a = run_fixpoint(edges, Rz.wikidata_rules(), semi_naive=True)
    b = run_fixpoint(edges, Rz.wikidata_rules(), semi_naive=False)
    assert _edge_set(a.edges) == _edge_set(b.edges)


# ---------------------------------------------------------------------------
# Semantic probes (FIXTURES.md §6)
# ---------------------------------------------------------------------------


def test_transitive_cycle_terminates(spark):
    """Chain with a cycle: closure computed, loop terminates
    (test_reasoning.cpp:349)."""
    facts = [
        ("p", "P31", Rz.TRANSITIVE),
        ("a", "p", "b"),
        ("b", "p", "c"),
        ("c", "p", "a"),
    ]
    res = run_fixpoint(_df(spark, facts), Rz.wikidata_rules())
    got = _edge_set(res.edges)
    for x in "abc":
        for y in "abc":
            assert (x, "p", y) in got  # full closure incl. self-loops
    assert res.iterations < 10


def test_naf_fires_only_after_saturation(spark):
    """Stratified NAF (test_stratified.cpp:48-95): 'base' reaches 'd' only
    transitively; the NAF rule must not fire on the pre-closure state."""
    facts = [
        ("p", "P31", Rz.TRANSITIVE),
        ("a", "p", "b"),
        ("b", "p", "c"),
        ("c", "p", "d"),
        ("x", "q", "x"),
    ]
    # NAF: anything x with (x q x) and NOT (a p x) gets flagged 'isolated'
    naf_rule = R(
        "naf-isolated",
        [P("?X", "q", "?X"), P("a", "p", "?X")],
        P("?X", "flag", "isolated"),
        negated=(1,),
    )
    rules = Rz.wikidata_rules() + [naf_rule]
    res = run_fixpoint(_df(spark, facts), rules)
    got = _edge_set(res.edges)
    # closure gives (a p d); x is not reachable -> flagged
    assert ("a", "p", "d") in got
    assert ("x", "flag", "isolated") in got
    # counter-case: if x were reachable, no flag
    facts2 = facts + [("a", "p", "x")]
    res2 = run_fixpoint(_df(spark, facts2), rules)
    assert ("x", "flag", "isolated") not in _edge_set(res2.edges)
    # oracle agreement on the NAF program
    want = oracle.stratified_fixpoint(set(facts), rules)
    assert got == want


def test_rule_order_independence(spark):
    """Stratification is schedule-independent (test_stratified.cpp:48-336)."""
    facts = [("a", "r", "b")]
    r1 = R("pos", [P("?X", "r", "?Y")], P("?Y", "s", "?X"))
    r2 = R(
        "naf",
        [P("?X", "r", "?Y"), P("?Y", "s", "?X")],
        P("?X", "t", "?Y"),
        negated=(1,),
    )
    fwd = run_fixpoint(_df(spark, facts), [r1, r2])
    rev = run_fixpoint(_df(spark, facts), [r2, r1])
    assert _edge_set(fwd.edges) == _edge_set(rev.edges)
    # (b s a) exists, so the NAF rule must never fire
    assert ("a", "t", "b") not in _edge_set(fwd.edges)


def test_naf_deduction_reopens_positive_stratum(spark):
    """Deferred consequences re-open the positive stratum
    (test_stratified.cpp:150)."""
    facts = [("a", "r", "b")]
    naf = R(
        "naf-seed", [P("?X", "r", "?Y"), P("?X", "done", "?Y")],
        P("?X", "s", "?Y"), negated=(1,),
    )
    pos = R("chain", [P("?X", "s", "?Y")], P("?X", "done", "?Y"))
    res = run_fixpoint(_df(spark, facts), [naf, pos])
    got = _edge_set(res.edges)
    assert ("a", "s", "b") in got and ("a", "done", "b") in got
    want = oracle.stratified_fixpoint(set(facts), [naf, pos])
    assert got == want
    # the re-opened stratum must not duplicate rows or double-count: edges
    # stays a set and n_deduced is exact (regression: NAF delta was unioned
    # into full twice)
    assert res.edges.count() == len(got)
    assert res.deduced.count() == len(got) - len(facts)
    assert res.n_deduced == len(got) - len(facts)


def test_unequal_guard(spark):
    """!= guard blocks same-value bindings (test_reasoning.cpp:387,551)."""
    facts = [("a", "r", "b"), ("b", "r", "b")]
    rule = R(
        "guard",
        [P("?X", "r", "?Y")],
        P("?X", "ne", "?Y"),
        unequals=(("?X", "?Y"),),
    )
    got = _edge_set(run_fixpoint(_df(spark, facts), [rule]).edges)
    assert ("a", "ne", "b") in got
    assert ("b", "ne", "b") not in got


def test_repeated_variable_in_pattern(spark):
    """(X r X) matches only self-loops (J8 binding consistency)."""
    facts = [("a", "r", "a"), ("a", "r", "b")]
    got = evaluate_query(_df(spark, facts), [P("?X", "r", "?X")]).collect()
    assert [r.X for r in got] == ["a"]


def test_query_mode_returns_bindings(spark, fixture_facts):
    """§2.7: statements with variables evaluate immediately as queries."""
    edges = _df(spark, sorted(fixture_facts))
    out = evaluate_query(
        edges,
        [P("?X", "P31", "?K"), P("?K", "P279", "?U")],
        select=["?X", "?U"],
    )
    rows = {(r.X, r.U) for r in out.collect()}
    assert ("Q100", "Q215627") in rows


# ---------------------------------------------------------------------------
# Transitive-closure acceleration (split_transitive + closure injection)
# ---------------------------------------------------------------------------

META_TRANS = R(
    "transitive",
    [P("?R", "~", "Trans"), P("?X", "?R", "?Y"), P("?Y", "?R", "?Z")],
    P("?X", "?R", "?Z"),
)


def test_split_transitive_shapes():
    from zelph_spark.reasoning import split_transitive

    const = R("t-const", [P("?a", "p", "?b"), P("?b", "p", "?c")], P("?a", "p", "?c"))
    # disqualified: consequence predicate differs / negated / repeated var
    other = R("plain", [P("?a", "q", "?b")], P("?b", "q2", "?a"))
    notrans = R(
        "not-trans", [P("?a", "p", "?b"), P("?b", "p", "?c")], P("?a", "q", "?c")
    )
    sp = split_transitive([const, META_TRANS, other, notrans])
    assert sp.const_preds == {"p"}
    assert sp.memberships == [("~", "Trans")]
    assert [r.rule_id for r in sp.rest] == ["plain", "not-trans"]
    assert split_transitive([other, notrans]) is None


def test_transitive_doubling_differential_deep_chain(spark):
    """Deep chain under the wikidata-style meta-rule: closure injection and
    the plain loop produce the identical fixpoint (confluence), both match
    the Datalog oracle, and the accelerated driver loop quiesces in 2
    rounds (saturate + verify) regardless of chain depth."""
    depth = 48
    facts = [(f"n{i:03d}", "p", f"n{i + 1:03d}") for i in range(depth)]
    facts += [("p", "~", "Trans")]
    edges = _df(spark, facts)
    fast = run_fixpoint(edges, [META_TRANS], transitive_doubling=True)
    slow = run_fixpoint(edges, [META_TRANS], transitive_doubling=False)
    got = _edge_set(fast.edges)
    assert got == _edge_set(slow.edges)
    assert got == oracle.stratified_fixpoint(set(map(tuple, facts)), [META_TRANS])
    assert fast.iterations <= 2
    # the DEFAULT (plain) loop is already O(log d): the delta joins the
    # full extent at the other position, doubling path length per round
    assert slow.iterations <= 2 + math.ceil(math.log2(depth))
    assert verify_fixpoint(fast, [META_TRANS])


def test_transitive_membership_discovered_mid_fixpoint(spark):
    """The transitive-predicate SET is data and can grow during the run
    (e.g. wikidata.zph's transitive-inverse rule): a membership fact
    deduced in round 1 must trigger closure injection for its predicate."""
    mark = R("mark", [P("?P", "mark", "yes")], P("?P", "~", "Trans"))
    depth = 16
    facts = [(f"m{i:02d}", "p", f"m{i + 1:02d}") for i in range(depth)]
    facts += [("p", "mark", "yes")]
    edges = _df(spark, facts)
    fast = run_fixpoint(edges, [META_TRANS, mark], transitive_doubling=True)
    slow = run_fixpoint(edges, [META_TRANS, mark], transitive_doubling=False)
    got = _edge_set(fast.edges)
    assert got == _edge_set(slow.edges)
    assert got == oracle.stratified_fixpoint(
        set(map(tuple, facts)), [META_TRANS, mark]
    )
    # round 0: mark fires; round 1: p discovered + closed; round 2: quiesce
    assert fast.iterations <= 3
    assert ("m00", "p", f"m{depth:02d}") in got


def test_transitive_const_shape_differential(spark):
    part_of = R(
        "po-trans", [P("?a", "part", "?b"), P("?b", "part", "?c")], P("?a", "part", "?c")
    )
    facts = [("w", "part", "x"), ("x", "part", "y"), ("y", "part", "z"),
             ("q", "other", "w")]
    edges = _df(spark, facts)
    fast = run_fixpoint(edges, [part_of], transitive_doubling=True)
    slow = run_fixpoint(edges, [part_of], transitive_doubling=False)
    got = _edge_set(fast.edges)
    assert got == _edge_set(slow.edges)
    assert ("w", "part", "z") in got
    assert verify_fixpoint(fast, [part_of])


def test_bucketed_base_differential_and_catalog_hygiene(spark, monkeypatch):
    """The bucketed-base anti-join split ((cand \\ base) \\ deltas, base read
    from a bucketed+sorted table so its side never re-exchanges) must be
    invisible semantically: identical fixpoint output vs the plain
    union-anti-join path, and no zelph_fix_base_* table may survive in the
    session catalog (the files live in the per-run scratch dir, which is
    deleted — a leaked catalog entry would poison later saveAsTable calls)."""
    facts = sorted(
        {(f"Q{i}", "P31", f"Q{100 + i % 7}") for i in range(40)}
        | {(f"Q{100 + i}", "P279", f"Q{100 + i + 1}") for i in range(6)}
        | {("P279", "~", "Trans")}
    )
    edges = _df(spark, facts)
    monkeypatch.setenv("ZELPH_FIXPOINT_BUCKET_BASE", "1")
    on = run_fixpoint(edges, Rz.wikidata_rules())
    monkeypatch.setenv("ZELPH_FIXPOINT_BUCKET_BASE", "0")
    off = run_fixpoint(edges, Rz.wikidata_rules())
    got = _edge_set(on.edges)
    assert got == _edge_set(off.edges)
    assert got == oracle.stratified_fixpoint(set(facts), Rz.wikidata_rules())
    assert on.iterations == off.iterations
    leftovers = [
        t.name for t in spark.catalog.listTables()
        if t.name.startswith("zelph_fix_base_")
    ]
    assert leftovers == []


def test_inherit_factoring_differential(spark, monkeypatch):
    """[r6] Chain-inheritance factoring (split_inherit + deferred closure-
    image injection) must be invisible semantically: identical fixpoint
    output vs the plain per-round loop AND vs the independent Datalog
    oracle, on a corpus that exercises a DEEP subclass chain (one s-hop per
    round in the plain loop, one injection in the factored one), the
    haspart-isa interleaving, and the facet variant of the same shape."""
    chain = [(f"N{i}", "P279", f"N{i+1}") for i in range(9)]
    facts = sorted(
        set(chain)
        | {("N9", "P527", "PARTX"), ("PARTX", "P31", "KX"),
           ("N0", "P31", "K0"), ("F0", "P1269", "N3"),
           ("A", "P461", "N5"), ("A", "P31", "KA")}
    )
    edges = _df(spark, facts)
    monkeypatch.setenv("ZELPH_INHERIT_DOUBLING", "1")
    fast = run_fixpoint(edges, Rz.wikidata_rules())
    monkeypatch.setenv("ZELPH_INHERIT_DOUBLING", "0")
    slow = run_fixpoint(edges, Rz.wikidata_rules())
    got = _edge_set(fast.edges)
    assert got == _edge_set(slow.edges)
    assert got == oracle.stratified_fixpoint(set(facts), Rz.wikidata_rules())
    # the deep chain actually inherited: the bottom subclass carries the
    # top's part, transitively lifted to its class too
    assert ("N0", "P527", "PARTX") in got
    assert ("N0", "P527", "KX") in got
    # facet inheritance (same factored shape, s = P1269) composed as well
    assert ("F0", "P527", "PARTX") in got
    # the factored loop quiesces in far fewer rounds than the chain depth
    assert fast.iterations < slow.iterations
    assert verify_fixpoint(fast, Rz.wikidata_rules())


def test_fuse_shape_mode_differential(spark, monkeypatch):
    """[r6] The per-shape fused evaluation (new default — measured faster
    at both 300k- and 4.4M-fact scales) and the packed all-shapes variant
    must produce identical fixpoints on a corpus that exercises every pair
    shape in the wikidata ruleset plus singles, NAF-free recursion and the
    inheritance interleaving."""
    chain = [(f"N{i}", "P279", f"N{i+1}") for i in range(6)]
    facts = sorted(
        set(chain)
        | {("N6", "P527", "PARTX"), ("PARTX", "P31", "KX"),
           ("N0", "P31", "K0"), ("F0", "P1269", "N3"),
           ("A", "P461", "B"), ("A", "P31", "KA"),
           ("C", "P1696", "D"), ("C", "P31", "KC")}
    )
    edges = _df(spark, facts)
    monkeypatch.setenv("ZELPH_FUSE_ALL_SHAPES", "0")
    per_shape = run_fixpoint(edges, Rz.wikidata_rules())
    monkeypatch.setenv("ZELPH_FUSE_ALL_SHAPES", "1")
    all_shapes = run_fixpoint(edges, Rz.wikidata_rules())
    got = _edge_set(per_shape.edges)
    assert got == _edge_set(all_shapes.edges)
    assert got == oracle.stratified_fixpoint(set(facts), Rz.wikidata_rules())
