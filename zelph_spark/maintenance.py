"""Graph maintenance operators (SURVEY.md §2.2 F10, §2.4 R12/R13).

zelph's mutation-style maintenance — remove a node and its edges, sweep
degree-0 nodes (``network.hpp:188-210,296-329``), prune facts matching a
rule pattern (``reasoning_pruning.cpp:32-88``), purge predicates with no
remaining facts (``reasoning_pruning.cpp:91-``) — becomes pure relational
transforms: each returns the NEW table (anti-joins), the caller commits it
as the next snapshot (Iceberg DELETE/overwrite on a cluster; StageStore
here). The largest reference prune removed 45.4M facts in one pass
(BASELINE.md) — here that is one anti-join, shuffle on the triple key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .reasoning.compiler import compile_rule_body
from .rules import Pattern, Rule, is_var

EDGE_COLS = ["subj", "pred", "obj"]


def remove_nodes(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Drop every edge touching the given nodes (column ``node``) — the
    distributed ``remove_node``."""
    n = nodes.select("node").distinct()
    out = edges
    for role in EDGE_COLS:
        out = out.join(n, out[role] == n["node"], "left_anti")
    return out


def isolated_nodes(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Degree-0 sweep (``cleanup_isolated``): nodes absent from every edge
    role."""
    touched = (
        edges.select(F.col("subj").alias("node"))
        .union(edges.select(F.col("pred").alias("node")))
        .union(edges.select(F.col("obj").alias("node")))
        .distinct()
    )
    return nodes.join(touched, "node", "left_anti")


def cleanup_names(names: DataFrame, edges: DataFrame) -> DataFrame:
    """Drop name rows whose node no longer exists (``cleanup_names``)."""
    touched = (
        edges.select(F.col("subj").alias("node"))
        .union(edges.select(F.col("pred").alias("node")))
        .union(edges.select(F.col("obj").alias("node")))
        .distinct()
    )
    return names.join(touched, "node", "left_semi")


def prune_by_pattern(
    edges: DataFrame,
    conditions: list[Pattern],
    target: int = 0,
    unequals: tuple = (),
    negated: tuple = (),
) -> tuple[DataFrame, DataFrame]:
    """R12: evaluate ``conditions`` as a query; delete the facts matched by
    condition ``target``. Returns (kept_edges, removed_edges)."""
    rule = Rule("prune", tuple(conditions), None, tuple(unequals), tuple(negated))
    bindings = compile_rule_body(rule, edges)
    pat = conditions[target]
    cols = []
    for role, term in zip(EDGE_COLS, (pat.subj, pat.pred, pat.obj)):
        cols.append(
            (F.col(term[1:]) if is_var(term) else F.lit(term)).alias(role)
        )
    removed = bindings.select(*cols).distinct()
    kept = edges.join(removed, on=EDGE_COLS, how="left_anti")
    return kept, edges.join(removed, on=EDGE_COLS, how="left_semi")


def purge_unused_predicates(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """R13: predicate nodes with no remaining facts lose their predicate
    standing (returns the surviving nodes table)."""
    used = edges.select(F.col("pred").alias("node")).distinct()
    preds = nodes.filter(F.col("kind") == "predicate")
    stale = preds.join(used, "node", "left_anti")
    return nodes.join(stale.select("node"), "node", "left_anti")
