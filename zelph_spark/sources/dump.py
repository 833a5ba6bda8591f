"""Wikidata JSON dump source (SURVEY.md §2.1 S1/S2).

The reference streams a ``.json``/``.json.bz2`` dump one entity per line
through a hand-rolled async reader (4 workers + an lbzip2 subprocess,
``read_async.cpp:286-544``, worker loop ``wikidata.cpp:179-216``). Spark
subsumes the whole apparatus: ``spark.read.text`` splits the file across
executors and handles compression codecs natively; partition count IS the
parallelism. The per-line scan is the same parser the spans pipeline uses
(``zelph_spark.extract.parse_entity_line``), so dump import and interleaved-
document extraction share one acceptance-rule implementation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..extract import EXTRACT_SCHEMA, parse_entity_line


def read_dump_lines(spark: SparkSession, path: str, min_partitions: int | None = None) -> DataFrame:
    """Raw entity lines. Leading '[' / trailing ']' array markers and the
    comma line suffixes of the official dump format are stripped."""
    df = spark.read.text(path)
    line = F.regexp_replace(F.col("value"), r",\s*$", "")
    out = df.select(line.alias("line")).filter(
        (F.length("line") > 2) & F.col("line").startswith("{")
    )
    if min_partitions:
        out = out.repartition(min_partitions)
    return out


def extract_from_dump(lines: DataFrame, lang: str = "en") -> DataFrame:
    """Dump lines -> tagged extraction rows (same row_kind schema as
    extract.extract_all, minus mentions: a dump line has no free text)."""

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for line in pdf["line"]:
                eid, label, triples = parse_entity_line(line, lang)
                if eid is None:
                    continue
                for pred, obj in triples:
                    rows.append((eid, "triple", eid, pred, obj, None, None, None, 0))
                if label is not None:
                    rows.append((eid, "label", eid, None, None, lang, label, None, 0))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "row_kind", "subj", "pred", "obj",
                    "lang", "name", "surface", "pos",
                ],
            )

    return lines.mapInPandas(scan, schema=EXTRACT_SCHEMA)


def export_entities(lines: DataFrame, ids: list[str]) -> DataFrame:
    """Entity export (S10, ``wikidata.cpp:950-1050``): the raw JSON lines of
    the requested entity ids — a pushed-down filter, not a driver loop."""
    pattern = F.regexp_extract(F.col("line"), r'"id":"([^"]*)"', 1)
    return lines.withColumn("_id", pattern).filter(
        F.col("_id").isin(ids)
    ).select("line")
