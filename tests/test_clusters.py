"""Clusters — named provenance workspaces (network.hpp:675-755), mirroring
the reference's test_clusters.cpp:32-86 cases.  Membership is recorded at
assert time (creation-time recording, network.hpp:679-692); drop_cluster is
destructive exactly like the reference: recorded nodes die with ALL their
edges, including facts asserted later outside the workspace (pinned against
the compiled reference binary in test_reference_oracle.py)."""

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
    edges, mem = clusters.assert_batch(
        _df(spark, [("keep1", "relK", "keep2")]), _df(spark, [("keep1", "relK", "keep2")])
    )
    edges, mem = clusters.assert_batch(
        edges, _df(spark, [("tmp1", "relT", "tmp2")]), cluster="exp", membership=mem
    )
    assert {r.node for r in clusters.cluster_nodes(mem, "exp").collect()} == {
        "tmp1",
        "relT",
        "tmp2",
    }
    kept, _, mem2 = clusters.drop_cluster(edges, "exp", membership=mem)
    assert _triples(kept) == {("keep1", "relK", "keep2")}
    assert mem2.count() == 0


def test_merge_into_default_keeps_facts_forgets_membership(spark):
    """test_clusters.cpp:54-69."""
    empty = spark.createDataFrame([], "subj string, pred string, obj string")
    edges, mem = clusters.assert_batch(
        empty, _df(spark, [("tmp1", "relM", "tmp2")]), cluster="exp"
    )
    merged, mem = clusters.merge_cluster(edges, "exp", None, membership=mem)
    assert _triples(merged) == {("tmp1", "relM", "tmp2")}
    assert clusters.list_clusters(merged).count() == 0
    assert mem.count() == 0
    # and dropping the now-nonexistent workspace removes nothing
    kept, _, _ = clusters.drop_cluster(merged, "exp", membership=mem)
    assert _triples(kept) == {("tmp1", "relM", "tmp2")}


def test_preexisting_facts_never_recorded(spark):
    """test_clusters.cpp:71-86: re-asserting an existing fact inside the
    workspace must not hand it (or its nodes) to the cluster."""
    base = _df(spark, [("a", "relP", "b")])
    edges, mem = clusters.assert_batch(base, base)  # default workspace
    edges, mem = clusters.assert_batch(
        edges, _df(spark, [("a", "relP", "b")]), cluster="exp", membership=mem
    )
    assert mem.count() == 0
    kept, _, _ = clusters.drop_cluster(edges, "exp", membership=mem)
    assert _triples(kept) == {("a", "relP", "b")}


def test_drop_removes_later_outside_facts_touching_recorded_nodes(spark):
    """Reference-destructive semantics (zelph_maintenance.cpp:162-181,
    ADVICE r3): a fact asserted LATER in the default workspace that
    references a cluster-created node dies with that node on drop —
    creation-time membership, not derived-at-drop.  Parity with the
    compiled reference binary is pinned in
    test_reference_oracle.py::test_drop_cluster_later_outside_fact_parity."""
    edges, mem = clusters.assert_batch(
        _df(spark, [("a", "relP", "b")]), _df(spark, [("a", "relP", "b")])
    )
    edges, mem = clusters.assert_batch(
        edges, _df(spark, [("tmp1", "relT", "tmp2")]), cluster="exp", membership=mem
    )
    # default-workspace fact referencing the cluster-created node tmp1:
    # membership was recorded when tmp1 was created, so the drop still
    # removes tmp1 — and this later edge goes with it (reference parity)
    edges, mem = clusters.assert_batch(
        edges, _df(spark, [("a", "relX", "tmp1")]), membership=mem
    )
    kept, _, _ = clusters.drop_cluster(edges, "exp", membership=mem)
    assert _triples(kept) == {("a", "relP", "b")}


def test_drop_cleans_names_and_list_counts(spark):
    names = spark.createDataFrame(
        pd.DataFrame(
            [("tmp1", "en", "temp one"), ("a", "en", "alpha")],
            columns=["node", "lang", "name"],
        )
    )
    edges, mem = clusters.assert_batch(
        _df(spark, [("a", "relP", "b")]),
        _df(spark, [("tmp1", "relT", "tmp2"), ("tmp1", "relT", "tmp3")]),
        cluster="exp",
    )
    lc = {(r.cluster, r.n_facts) for r in clusters.list_clusters(edges).collect()}
    assert lc == {("exp", 2)}
    kept, kept_names, _ = clusters.drop_cluster(
        edges, "exp", names=names, membership=mem
    )
    assert _triples(kept) == {("a", "relP", "b")}
    assert {r.node for r in kept_names.collect()} == {"a"}


def test_merge_relabels_membership_and_facts(spark):
    """merge_cluster(from, to): facts and membership move to the target
    workspace (network.hpp:737-749 set union)."""
    empty = spark.createDataFrame([], "subj string, pred string, obj string")
    edges, mem = clusters.assert_batch(
        empty, _df(spark, [("x1", "relA", "x2")]), cluster="one"
    )
    edges, mem = clusters.assert_batch(
        edges, _df(spark, [("y1", "relB", "y2")]), cluster="two", membership=mem
    )
    edges, mem = clusters.merge_cluster(edges, "one", "two", membership=mem)
    lc = {(r.cluster, r.n_facts) for r in clusters.list_clusters(edges).collect()}
    assert lc == {("two", 2)}
    assert {r.node for r in clusters.cluster_nodes(mem, "two").collect()} == {
        "x1", "relA", "x2", "y1", "relB", "y2",
    }
    # dropping the merged workspace now removes everything it absorbed
    kept, _, _ = clusters.drop_cluster(edges, "two", membership=mem)
    assert _triples(kept) == set()


def test_drop_cluster_requires_membership(spark):
    """ADVICE r4 medium: membership=None must raise, not silently treat the
    recorded-node set as empty (reference-divergent drop)."""
    import pytest as _pytest

    edges = spark.createDataFrame(
        pd.DataFrame([("Q1", "P1", "Q2", 1.0, "exp")],
                     columns=["subj", "pred", "obj", "prob", "cluster"])
    )
    with _pytest.raises(ValueError, match="membership"):
        clusters.drop_cluster(edges, "exp")
