"""SPARQL-subset solution combinators (SURVEY.md §2.6 Q1-Q15).

zelph's SPARQL layer (``stdlib/sparql.zph``, 1251 LoC of Janet) evaluates
basic graph patterns per-solution through the C unification engine and
implements its own solution-set algebra (hash join ``sparql.zph:405-468``,
left join ``:470-505``, minus ``:513-535``, union/distinct/aggregate/order/
limit ``:537-556,873,1039-1124``). Here the algebra IS the DataFrame algebra;
the BGP evaluator is the rule compiler (``reasoning.compiler.evaluate_query``)
— same machinery for rules and queries, preserving zelph's homoiconic
"queries are rule bodies" design (§2.7).

Solution DataFrames use variable-named columns. Unbound variables (OPTIONAL)
are nulls — matching sparql.zph's nil bindings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .reasoning.compiler import evaluate_query
from .rules import Pattern


def bgp(edges: DataFrame, patterns: list[Pattern]) -> DataFrame:
    """Basic graph pattern -> solutions (Q2: eval-bgp-block,
    sparql.zph:575-641)."""
    return evaluate_query(edges, patterns)


def join(a: DataFrame, b: DataFrame) -> DataFrame:
    """Natural join on shared variables (Q3: sparql.zph:426-468)."""
    shared = sorted(set(a.columns) & set(b.columns))
    return a.join(b, on=shared) if shared else a.crossJoin(b)


def optional(a: DataFrame, b: DataFrame) -> DataFrame:
    """OPTIONAL = left outer join (Q4: sparql.zph:470-505)."""
    shared = sorted(set(a.columns) & set(b.columns))
    if not shared:
        return a.crossJoin(b)  # degenerate per spec: all combinations
    return a.join(b, on=shared, how="left")


def minus(a: DataFrame, b: DataFrame) -> DataFrame:
    """MINUS (Q5: sparql.zph:513-535): remove solutions that share a
    compatible binding; with NO shared variables everything is kept
    (spec corner, sparql.zph:507-511 — unlike NAF)."""
    shared = sorted(set(a.columns) & set(b.columns))
    if not shared:
        return a
    return a.join(b, on=shared, how="left_anti")


def union(a: DataFrame, b: DataFrame) -> DataFrame:
    """UNION with disjoint variables allowed (Q6: sparql.zph:873)."""
    return a.unionByName(b, allowMissingColumns=True)


def distinct(sols: DataFrame, projected: list[str] | None = None) -> DataFrame:
    """DISTINCT over the projection (Q8: sparql.zph:537-556)."""
    if projected:
        sols = sols.select(*projected)
    return sols.dropDuplicates()


def group_count(
    sols: DataFrame,
    group_vars: list[str],
    count_var: str | None = None,
    distinct_count: bool = False,
    alias: str = "count",
) -> DataFrame:
    """GROUP BY + COUNT / COUNT(DISTINCT ?v) — the only aggregates zelph's
    subset supports (Q9: sparql.zph:1039-1086, rejects others :33-35)."""
    target = F.col(count_var) if count_var else F.lit(1)
    agg = (
        F.countDistinct(target) if distinct_count else F.count(target)
    ).alias(alias)
    return sols.groupBy(*group_vars).agg(agg)
