"""Clusters — named provenance workspaces (network.hpp:675-755), mirroring
the reference's test_clusters.cpp:32-86 cases."""

from __future__ import annotations

import pandas as pd

from zelph_spark import clusters


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    )


def _triples(df):
    return {(r.subj, r.pred, r.obj) for r in df.select("subj", "pred", "obj").collect()}


def test_drop_removes_cluster_facts_keeps_prior_knowledge(spark):
    """test_clusters.cpp:32-51: facts asserted in the workspace (and the
    nodes it created) vanish on drop; prior facts survive."""
    edges = clusters.assert_batch(
        _df(spark, [("keep1", "relK", "keep2")]), _df(spark, [("keep1", "relK", "keep2")])
    )
    edges = clusters.assert_batch(
        edges, _df(spark, [("tmp1", "relT", "tmp2")]), cluster="exp"
    )
    kept, _ = clusters.drop_cluster(edges, "exp")
    assert _triples(kept) == {("keep1", "relK", "keep2")}


def test_merge_into_default_keeps_facts_forgets_membership(spark):
    """test_clusters.cpp:54-69."""
    empty = spark.createDataFrame([], "subj string, pred string, obj string")
    edges = clusters.assert_batch(
        empty, _df(spark, [("tmp1", "relM", "tmp2")]), cluster="exp"
    )
    merged = clusters.merge_cluster(edges, "exp", None)
    assert _triples(merged) == {("tmp1", "relM", "tmp2")}
    assert clusters.list_clusters(merged).count() == 0
    # and dropping the now-nonexistent workspace removes nothing
    kept, _ = clusters.drop_cluster(merged, "exp")
    assert _triples(kept) == {("tmp1", "relM", "tmp2")}


def test_preexisting_facts_never_recorded(spark):
    """test_clusters.cpp:71-86: re-asserting an existing fact inside the
    workspace must not hand it (or its nodes) to the cluster."""
    base = _df(spark, [("a", "relP", "b")])
    edges = clusters.assert_batch(base, base)  # default workspace
    edges = clusters.assert_batch(
        edges, _df(spark, [("a", "relP", "b")]), cluster="exp"
    )
    kept, _ = clusters.drop_cluster(edges, "exp")
    assert _triples(kept) == {("a", "relP", "b")}


def test_drop_removes_edges_touching_cluster_created_nodes(spark):
    """drop_cluster removes every node the cluster created INCLUDING all of
    their edges (zelph_maintenance.cpp:162-181) — even facts later asserted
    outside the workspace that reference a cluster-created node."""
    edges = clusters.assert_batch(
        _df(spark, [("a", "relP", "b")]), _df(spark, [("a", "relP", "b")])
    )
    edges = clusters.assert_batch(
        edges, _df(spark, [("tmp1", "relT", "tmp2")]), cluster="exp"
    )
    # default-workspace fact referencing the cluster-created node tmp1:
    # tmp1 now appears OUTSIDE the cluster too, so it is shared and keeps
    # living — but the cluster-only node tmp2 dies with its edges
    edges = clusters.assert_batch(
        edges, _df(spark, [("a", "relX", "tmp1")])
    )
    kept, _ = clusters.drop_cluster(edges, "exp")
    got = _triples(kept)
    assert ("tmp1", "relT", "tmp2") not in got
    assert ("a", "relP", "b") in got
    assert ("a", "relX", "tmp1") in got


def test_drop_cleans_names_and_list_counts(spark):
    names = spark.createDataFrame(
        pd.DataFrame(
            [("tmp1", "en", "temp one"), ("a", "en", "alpha")],
            columns=["node", "lang", "name"],
        )
    )
    edges = clusters.assert_batch(
        _df(spark, [("a", "relP", "b")]),
        _df(spark, [("tmp1", "relT", "tmp2"), ("tmp1", "relT", "tmp3")]),
        cluster="exp",
    )
    lc = {(r.cluster, r.n_facts) for r in clusters.list_clusters(edges).collect()}
    assert lc == {("exp", 2)}
    kept, kept_names = clusters.drop_cluster(edges, "exp", names=names)
    assert _triples(kept) == {("a", "relP", "b")}
    assert {r.node for r in kept_names.collect()} == {"a"}
