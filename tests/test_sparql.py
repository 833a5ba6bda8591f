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
