"""Clusters — named provenance workspaces (``network.hpp:675-755``,
``zelph_maintenance.cpp:150-181``; tests ``test_clusters.cpp:32-86``).

In the reference, an active cluster records the ids of nodes CREATED while
it is active (sequential nodes and the relation nodes materialized by
``fact()``); facts that already existed are never recorded, so dropping a
cluster can never destroy pre-existing knowledge.  ``drop_cluster`` removes
every recorded node *including all of their edges and names*;
``merge_cluster(from, "")`` keeps the facts and forgets the membership.

Spark mapping (SURVEY.md §1.6): a nullable ``cluster`` lineage column on
the edges and nodes tables — NULL means the default workspace.  Membership
is decided at assert time with the same never-re-record rule: an asserted
triple that already exists keeps its original lineage, and a node id seen
before the batch is never handed to the batch's cluster.  All operators are
pure relational transforms returning the next table snapshot; on a cluster
deployment each is an Iceberg ``DELETE WHERE``/``MERGE`` over the
partitioned tables, so dropping a multi-billion-row workspace is one
metadata-heavy anti-join, not a mutation loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EDGE_COLS = ["subj", "pred", "obj"]


def _with_cluster(df: DataFrame) -> DataFrame:
    return (
        df
        if "cluster" in df.columns
        else df.withColumn("cluster", F.lit(None).cast("string"))
    )


def _touched_nodes(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("subj").alias("node"))
        .union(edges.select(F.col("pred").alias("node")))
        .union(edges.select(F.col("obj").alias("node")))
        .distinct()
    )


def assert_batch(
    edges: DataFrame,
    new_edges: DataFrame,
    cluster: str | None = None,
) -> DataFrame:
    """Assert a batch of triples while ``cluster`` is the active workspace
    (``set_active_cluster`` + ``fact()``).  Triples that already exist keep
    their original lineage (pre-existing facts are never recorded,
    network.hpp:679-681 / test_clusters.cpp:71-86); genuinely new triples
    land with ``cluster`` as their lineage.  Returns the new edges table."""
    edges = _with_cluster(edges)
    fresh = (
        new_edges.select(*EDGE_COLS)
        .dropDuplicates(EDGE_COLS)
        .join(edges, on=EDGE_COLS, how="left_anti")
        .withColumn("cluster", F.lit(cluster).cast("string"))
    )
    extra = [c for c in edges.columns if c not in EDGE_COLS + ["cluster"]]
    for c in extra:
        fresh = fresh.withColumn(c, F.lit(None))
    return edges.unionByName(fresh, allowMissingColumns=True)


def cluster_nodes(edges: DataFrame, cluster: str) -> DataFrame:
    """The node ids a cluster tracks: nodes that appear ONLY in the
    cluster's own facts — a node referenced by any fact outside the cluster
    pre-existed (or is shared knowledge) and was never handed to the
    cluster.  One-column DF named ``node``."""
    edges = _with_cluster(edges)
    mine = _touched_nodes(edges.filter(F.col("cluster") == cluster))
    other = _touched_nodes(
        edges.filter(
            F.col("cluster").isNull() | (F.col("cluster") != cluster)
        )
    )
    return mine.join(other, on="node", how="left_anti")


def list_clusters(edges: DataFrame) -> DataFrame:
    """(cluster, n_facts) rows for every named workspace
    (``list_clusters``)."""
    edges = _with_cluster(edges)
    return (
        edges.filter(F.col("cluster").isNotNull())
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_facts"))
    )


def drop_cluster(
    edges: DataFrame, name: str, names: DataFrame | None = None
) -> tuple[DataFrame, DataFrame | None]:
    """Destructive drop (``Zelph::drop_cluster``): remove the cluster's
    facts AND every fact touching a node the cluster created, plus those
    nodes' name rows.  Pre-existing knowledge survives by construction —
    the cluster never recorded it.  Returns (edges', names')."""
    from .maintenance import remove_nodes

    edges = _with_cluster(edges)
    doomed = cluster_nodes(edges, name)
    kept = remove_nodes(
        edges.filter(
            F.col("cluster").isNull() | (F.col("cluster") != name)
        ),
        doomed,
    )
    if names is None:
        return kept, None
    kept_names = names.join(
        doomed.withColumnRenamed("node", "_dn"),
        names["node"] == F.col("_dn"),
        "left_anti",
    )
    return kept, kept_names


def merge_cluster(
    edges: DataFrame, from_cluster: str, to_cluster: str | None = None
) -> DataFrame:
    """``merge_cluster(from, to)``: relabel the workspace's facts;
    ``to_cluster=None`` merges into the default workspace — the facts stay,
    the membership is forgotten (test_clusters.cpp:54-69).  No edges are
    touched in either case."""
    edges = _with_cluster(edges)
    return edges.withColumn(
        "cluster",
        F.when(
            F.col("cluster") == from_cluster,
            F.lit(to_cluster).cast("string"),
        ).otherwise(F.col("cluster")),
    )
