"""SPARQL-subset text frontend (SURVEY.md §2.6), mirroring the shapes of the
reference's test_sparql.cpp corpus on a small in-test graph."""

from __future__ import annotations

import pandas as pd
import pytest

from zelph_spark.sparql import SparqlError, sparql

GRAPH = [
    ("alice", "knows", "bob"),
    ("alice", "knows", "carol"),
    ("bob", "knows", "carol"),
    ("carol", "knows", "dave"),
    ("alice", "age", "42"),
    ("carol", "age", "37"),
    ("bob", "type", "admin"),
]


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(
        pd.DataFrame(GRAPH, columns=["subj", "pred", "obj"])
    ).cache()


def rows(df):
    return {tuple(r) for r in df.collect()}


def test_bgp_join(edges):
    out = sparql(edges, "SELECT ?x ?a WHERE { ?x knows ?y . ?y age ?a }")
    assert rows(out) == {("alice", "37"), ("bob", "37")}


def test_predicate_object_lists(edges):
    out = sparql(edges, 'SELECT ?y WHERE { alice knows ?y ; age "42" }')
    assert rows(out) == {("bob",), ("carol",)}
    out2 = sparql(edges, "SELECT ?x WHERE { ?x knows bob , carol }")
    assert rows(out2) == {("alice",)}


def test_optional_and_minus(edges):
    out = sparql(
        edges,
        "SELECT ?x ?a WHERE { ?x knows carol OPTIONAL { ?x age ?a } }",
    )
    assert rows(out) == {("alice", "42"), ("bob", None)}
    out2 = sparql(edges, "SELECT ?x WHERE { ?x knows carol MINUS { ?x age ?a } }")
    assert rows(out2) == {("bob",)}


def test_union_and_filter(edges):
    out = sparql(
        edges,
        "SELECT ?x WHERE { { ?x type admin } UNION { ?x age ?a . FILTER(?a > \"40\") } }",
    )
    assert rows(out) == {("bob",), ("alice",)}


def test_property_paths(edges):
    plus = sparql(edges, "SELECT ?y WHERE { alice knows+ ?y }")
    assert rows(plus) == {("bob",), ("carol",), ("dave",)}
    star = sparql(edges, "SELECT ?y WHERE { alice knows* ?y }")
    assert rows(star) == {("alice",), ("bob",), ("carol",), ("dave",)}
    seq = sparql(edges, "SELECT ?a WHERE { ?x knows/age ?a . ?x type admin }")
    assert rows(seq) == {("37",)}


def test_group_count_order_limit(edges):
    out = sparql(
        edges,
        "SELECT ?x (COUNT(?y) AS ?n) WHERE { ?x knows ?y } GROUP BY ?x "
        "ORDER BY DESC(?n) LIMIT 1",
    )
    assert [tuple(r) for r in out.collect()] == [("alice", 2)]
    distinct = sparql(
        edges,
        "SELECT (COUNT(DISTINCT ?y) AS ?n) WHERE { ?x knows ?y }",
    )
    assert rows(distinct) == {(3,)}


def test_distinct(edges):
    out = sparql(edges, "SELECT DISTINCT ?x WHERE { ?x knows ?y }")
    assert rows(out) == {("alice",), ("bob",), ("carol",)}


def test_rejections(edges):
    for bad in (
        "SELECT ?x WHERE { ?x knows ?y BIND(?y AS ?z) }",
        "ASK { ?x knows ?y }",
        "SELECT (SUM(?a) AS ?s) WHERE { ?x age ?a }",
    ):
        with pytest.raises(SparqlError):
            sparql(edges, bad)


def test_filter_numeric_comparison(edges):
    """Bare number literal -> typed numeric comparison, NOT lexicographic
    (test_sparql.cpp 'FILTER with numeric comparison': P569 1985/1995 > 1990).
    Lexicographic would also pass here, so use a case where they diverge."""
    out = sparql(edges, "SELECT ?x WHERE { ?x age ?a . FILTER(?a > 9) }")
    # lexicographic '37' > '9' and '42' > '9' are both FALSE; numeric keeps both
    assert rows(out) == {("alice",), ("carol",)}
    out2 = sparql(edges, "SELECT ?x WHERE { ?x age ?a . FILTER(?a < 40.5) }")
    assert rows(out2) == {("carol",)}


def test_filter_str_and_lang(edges):
    """str(?x) compares node names; lang(?x) is always ''
    (sparql.zph:824-825; test_sparql.cpp str()-dedup + label idioms)."""
    out = sparql(
        edges,
        "SELECT ?a ?b WHERE { ?a knows carol . ?b knows carol . "
        "FILTER ( ( str(?a) < str(?b) ) ) }",
    )
    assert rows(out) == {("alice", "bob")}
    # lang() = "" never matches "en", but OPTIONAL rows must survive
    out2 = sparql(
        edges,
        'SELECT ?x ?l WHERE { ?x type admin OPTIONAL { ?x knows ?l . '
        'FILTER ( lang(?l) = "en" ) } }',
    )
    assert rows(out2) == {("bob", None)}
    # lang() = "" DOES match the empty string
    out3 = sparql(
        edges,
        'SELECT ?x WHERE { ?x type admin . FILTER ( lang(?x) = "" ) }',
    )
    assert rows(out3) == {("bob",)}


def test_subquery_joined_with_outer(edges):
    """{ SELECT ... } joined with an outer pattern (test_sparql.cpp
    'subquery joined with outer pattern')."""
    out = sparql(
        edges,
        "SELECT ?x WHERE { { SELECT ?x WHERE { ?x knows carol . } } "
        "?x age ?a . }",
    )
    assert rows(out) == {("alice",)}  # alice and bob know carol; only alice has an age


def test_nested_subqueries(edges):
    """Nested subqueries renaming through the chain (test_sparql.cpp
    'nested subqueries')."""
    out = sparql(
        edges,
        "SELECT DISTINCT ?third WHERE { "
        "{ SELECT ?second WHERE { "
        "  { SELECT ?first WHERE { alice knows ?first . } } "
        "  ?first knows ?second . } } "
        "?second knows ?third . }",
    )
    assert rows(out) == {("dave",)}  # alice->bob/carol->carol->dave


def test_subquery_with_group_count_order(edges):
    """Subquery with GROUP BY / COUNT / ORDER BY inside the braces
    (test_sparql.cpp 'subquery with GROUP BY, COUNT and ORDER BY')."""
    out = sparql(
        edges,
        "SELECT ?x ?n WHERE { { "
        "SELECT ?x (COUNT(?y) AS ?n) WHERE { ?x knows ?y } "
        "GROUP BY ?x ORDER BY DESC(?n) } }",
    )
    assert rows(out) == {("alice", 2), ("bob", 1), ("carol", 1)}


def test_prefix_declarations(edges, spark):
    """Declared prefixes expand to full IRIs, then pass the Wikidata-IRI
    stripping; unknown IRIs keep the FULL IRI as node name
    (test_sparql.cpp custom-PREFIX cases; sparql.zph:104-123,307-332)."""
    import pandas as pd

    g = spark.createDataFrame(pd.DataFrame(
        [("QA", "http://example.org/knows", "QB"),
         ("QC", "P279", "Q500")],
        columns=["subj", "pred", "obj"],
    ))
    out = sparql(
        g,
        "PREFIX ex: <http://example.org/> "
        "SELECT ?x WHERE { QA ex:knows ?x . }",
    )
    assert rows(out) == {("QB",)}
    # wikidata-IRI prefixes strip to bare ids — incl. empty local names
    out2 = sparql(
        g,
        "PREFIX violated_1: <http://www.wikidata.org/entity/Q500> "
        "SELECT ?i WHERE { ?i wdt:P279+ violated_1: . }",
    )
    assert rows(out2) == {("QC",)}
    # well-known prefixes resolve without declaration: wd:/wdt: strip
    out3 = sparql(g, "SELECT ?c WHERE { wd:QC wdt:P279 ?c . }")
    assert rows(out3) == {("Q500",)}


def test_both_unbound_star_rejected(edges):
    """A bare ?x p* ?y step with neither end constrained is rejected
    (sparql.zph:735; test_sparql.cpp:338 'ludicrous results')."""
    with pytest.raises(SparqlError):
        sparql(edges, "SELECT ?x ?y WHERE { ?x knows* ?y . }").collect()
    # but the same step constrained by another pattern is fine
    out = sparql(
        edges, "SELECT ?x ?y WHERE { ?x knows* ?y . ?x type admin }"
    )
    assert ("bob", "dave") in rows(out) and ("bob", "bob") in rows(out)


def test_bound_end_path_is_seeded(edges, spark, monkeypatch):
    """Q12 scale contract: a path step with a constant (or upstream-bound)
    end must run the SEEDED cone traversal (closure.transitive_targets /
    _sources, zelph.cpp:267-296), never the full-graph closure + filter."""
    import zelph_spark.sparql as S

    calls = {"seeded": 0, "full": 0}
    pair_counts = []
    orig_targets, orig_sources = S.transitive_targets, S.transitive_sources

    def spy_targets(*a, **kw):
        calls["seeded"] += 1
        out = orig_targets(*a, **kw)
        pair_counts.append(out.count())
        return out

    def spy_sources(*a, **kw):
        calls["seeded"] += 1
        out = orig_sources(*a, **kw)
        pair_counts.append(out.count())
        return out

    def spy_full(*a, **kw):
        calls["full"] += 1
        raise AssertionError("full closure used for a bound-end path")

    monkeypatch.setattr(S, "transitive_targets", spy_targets)
    monkeypatch.setattr(S, "transitive_sources", spy_sources)
    monkeypatch.setattr(S, "transitive_closure", spy_full)

    # two disjoint knows-chains: the seeded traversal from alice must touch
    # only alice's cone, not the unrelated chain
    g = spark.createDataFrame(
        pd.DataFrame(
            GRAPH + [(f"u{i}", "knows", f"u{i+1}") for i in range(30)],
            columns=["subj", "pred", "obj"],
        )
    )
    out = sparql(g, "SELECT ?y WHERE { wd:alice knows+ ?y . }")
    assert rows(out) == {("bob",), ("carol",), ("dave",)}
    assert calls == {"seeded": 1, "full": 0}
    # cone-only: 3 reachable pairs, not the 30-node chain's ~465 pairs
    assert pair_counts[0] == 3

    # constant OBJECT end seeds a backward traversal; '*' includes the start
    out2 = sparql(g, "SELECT ?x WHERE { ?x knows* wd:carol . }")
    assert rows(out2) == {("alice",), ("bob",), ("carol",)}
    assert calls["seeded"] == 2 and calls["full"] == 0
    assert pair_counts[1] == 3  # alice/bob reach carol + (carol, carol)


def test_path_memoized_within_query(edges, monkeypatch):
    """A path element appearing twice in one query computes its slice once
    (sparql.zph:75-78 memoization)."""
    import zelph_spark.sparql as S

    n = {"slices": 0}
    orig = S._path_slice

    def spy(edges_, name, memo):
        before = ("slice", name) in memo
        out = orig(edges_, name, memo)
        if not before:
            n["slices"] += 1
        return out

    monkeypatch.setattr(S, "_path_slice", spy)
    out = sparql(
        edges,
        "SELECT ?x ?y WHERE { ?x type admin . ?x knows+ ?y . ?x knows+ ?y }",
    )
    assert rows(out) == {("bob", "carol"), ("bob", "dave")}
    assert n["slices"] == 1


def test_same_variable_path_ends(spark):
    """``?x p+ ?x`` returns cycle members (VERDICT r3 defect #1 — both ends
    aliased to one column and crashed with AMBIGUOUS_REFERENCE).  The
    reference's per-solution unifier binds the repeated variable once and
    checks consistency (test corpus has no such case; unification.cpp's J8
    repeated-variable handling is the sequential analog)."""
    g = _df(
        spark,
        [
            ("a", "knows", "b"),
            ("b", "knows", "c"),
            ("c", "knows", "a"),
            ("d", "knows", "e"),
        ],
    )
    out = sparql(g, "SELECT ?x WHERE { ?x knows+ ?x . }")
    assert rows(out) == {("a",), ("b",), ("c",)}
    # upstream-bound same-variable ends route through the SEEDED branch and
    # the same intra-row guard
    out2 = sparql(g, "SELECT ?x WHERE { ?x knows b . ?x knows+ ?x }")
    assert rows(out2) == {("a",)}
    # same-variable '*' with no other binding is the ludicrous-results case
    with pytest.raises(SparqlError):
        sparql(g, "SELECT ?x WHERE { ?x knows* ?x . }").collect()


def _df(spark, triples):
    return spark.createDataFrame(
        pd.DataFrame(triples, columns=["subj", "pred", "obj"])
    )


def test_bound_end_sequence_is_seeded(spark, monkeypatch):
    """r4: a bound-end SEQUENCE path threads the seed cone element-to-
    element (sparql.zph:652-811 per-solution binding) instead of computing
    each element's full-graph closure and chaining."""
    import zelph_spark.sparql as S

    pair_counts = []
    orig_targets = S.transitive_targets

    def spy_targets(*a, **kw):
        out = orig_targets(*a, **kw)
        pair_counts.append(out.count())
        return out

    def spy_full(*a, **kw):
        raise AssertionError("full closure used for a bound-end sequence")

    monkeypatch.setattr(S, "transitive_targets", spy_targets)
    monkeypatch.setattr(S, "transitive_closure", spy_full)

    g = _df(
        spark,
        GRAPH + [(f"u{i}", "knows", f"u{i+1}") for i in range(30)],
    )
    # alice knows {bob,carol}; knows+ seeded from that frontier only
    out = sparql(g, "SELECT ?y WHERE { wd:alice knows/knows+ ?y . }")
    assert rows(out) == {("carol",), ("dave",)}
    # cone-only: {bob,carol} reach {carol,dave} = 3 pairs, not the 30-node
    # chain's ~465 full-closure pairs
    assert pair_counts == [3]

    # constant OBJECT end: plain/plain sequence threads right-to-left with
    # single-hop joins (no closure calls at all)
    out2 = sparql(g, "SELECT ?x WHERE { ?x knows/knows wd:dave . }")
    assert rows(out2) == {("alice",), ("bob",)}
    assert pair_counts == [3]


def test_star_in_sequence_identity_over_input_domain(spark):
    """ADVICE r3 #4: a mid-sequence '*' element must relate every
    intermediate to itself (zero hops) even when that node has no edges in
    the '*' predicate — closure_with_start's identity set is scoped to
    nodes PRESENT in the slice, which silently dropped such rows."""
    g = _df(
        spark,
        [
            ("alice", "age", "42"),
            ("carol", "age", "37"),
            ("x", "likes", "y"),  # the likes slice exists but is disjoint
        ],
    )
    # unseeded (both ends unbound variables)
    out = sparql(g, "SELECT ?x ?y WHERE { ?x age/likes* ?y . }")
    assert rows(out) == {("alice", "42"), ("carol", "37")}
    # seeded (constant subject end): include_start covers the frontier
    out2 = sparql(g, "SELECT ?y WHERE { wd:alice age/likes* ?y . }")
    assert rows(out2) == {("42",)}


def test_star_first_in_sequence_zero_hop_domain(spark):
    """ADVICE r4: a sequence whose FIRST element is 'p*' must include
    zero-hop subjects that have edges in the REST of the path but none in
    p — '?x p*/q ?y' ≡ q(x,y) ∪ (p+ ⨝ q), no identity set materialized."""
    g = _df(
        spark,
        [
            ("alice", "age", "42"),   # alice has NO likes edges at all
            ("bob", "likes", "alice"),  # bob reaches 42 via one likes hop
            ("x", "likes", "y"),      # disjoint likes edge, no age
        ],
    )
    out = sparql(g, "SELECT ?x ?y WHERE { ?x likes*/age ?y . }")
    assert rows(out) == {("alice", "42"), ("bob", "42")}
    # seeded subject end still goes through the cone path and agrees
    out2 = sparql(g, "SELECT ?y WHERE { wd:bob likes*/age ?y . }")
    assert rows(out2) == {("42",)}
