"""Export sinks (SURVEY.md §2.1 S10/S12/S13).

- taxonomy export: filtered closure -> JSON (S13,
  ``export_taxonomy_filtered.zph:1-13``) — ``df.write.json`` after a
  closure join;
- deduction / contradiction report (S12, ``markdown.cpp:1-363``,
  ``reasoning_deduce.cpp:311-331``): the result *tables* are the
  first-class artifact; the markdown rendering is a driver-side formatter
  over an already-aggregated (small) summary — never over raw rows.

The Mermaid HTML graph sink (S11, 1579 LoC of C++) is out of scope per
SURVEY.md §2.1 — visualization, not data processing.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, functions as F

from ..closure import transitive_closure


def export_taxonomy_json(
    edges_slice: DataFrame, path: str, roots: list[str] | None = None
) -> None:
    """Closure of a per-predicate slice -> JSON lines (subj, obj). With
    ``roots``, only pairs reaching one of the root nodes are kept (the
    'filtered' variant of the reference script)."""
    clo = transitive_closure(edges_slice.select("subj", "obj"))
    if roots:
        clo = clo.filter(F.col("obj").isin(roots))
    clo.write.mode("overwrite").json(path)


def deduction_report(
    deduced: DataFrame,
    contradictions: DataFrame,
    path: str | None = None,
    top_n: int = 20,
) -> str:
    """Markdown summary of a reasoning run: per-predicate deduction counts +
    per-rule contradiction counts. Aggregation is distributed; only the
    top-n summary rows reach the driver."""
    ded = (
        deduced.groupBy("pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("pred"))
        .limit(top_n)
        .collect()
    )
    con = (
        contradictions.groupBy("rule_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("rule_id"))
        .limit(top_n)
        .collect()
    )
    lines = ["# Reasoning report", "", "## Deductions by predicate", ""]
    lines += ["| pred | facts |", "|---|---|"]
    lines += [f"| {r.pred} | {r.n} |" for r in ded]
    lines += ["", "## Contradictions by rule", "", "| rule | matches |", "|---|---|"]
    lines += [f"| {r.rule_id} | {r.n} |" for r in con]
    text = "\n".join(lines) + "\n"
    if path:
        Path(path).write_text(text)
    return text
