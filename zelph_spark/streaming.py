"""Structured Streaming ingest for the KG pipeline (beyond the reference).

zelph has no streaming surface (SURVEY.md §2.10) — its incremental story is
the semi-naive delta. At 10^12-document scale, though, the corpus ARRIVES
incrementally; this module is the Spark-native front door: a
``readStream`` over the landing directory runs the SAME stateless
extraction plan (``extract.extract_all`` is shuffle-free mapInPandas +
columnar ops, so it is trivially streamable) and appends triple/label/
mention rows to the staging table with exactly-once file-source semantics
(the stream checkpoint tracks processed files — the streaming analog of the
StageStore's resume contract). Downstream stages (link/canon/reason) stay
batch jobs over the staging table: canonicalization and the reasoning
fixpoint are global computations and belong in the periodic batch pass, as
in every production KG build.

``trigger(availableNow=True)`` gives the batch-incremental operating mode:
each invocation drains exactly the new files and terminates — a cron-able
incremental import step with resume built in.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from . import extract
from .datagen import SPANS_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    schema: str = SPANS_SCHEMA,
    available_now: bool = True,
    with_mentions: bool = True,
) -> StreamingQuery:
    """Continuously (or availableNow-incrementally) extract newly landed
    span documents into the extracted-rows staging table.

    input_path:  directory of spans-document parquet files (landing zone)
    output_path: extracted rows (same schema as extract.extract_all output)
    checkpoint_path: stream checkpoint (processed-files log = resume state)
    """
    docs = spark.readStream.schema(schema).parquet(input_path)
    ex = extract.extract_all(docs, with_mentions=with_mentions)
    writer = (
        ex.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drain(query: StreamingQuery, timeout: int = 300) -> None:
    """Block until an availableNow stream finishes its backlog."""
    query.awaitTermination(timeout)
    if query.isActive:
        query.stop()
        raise TimeoutError("stream did not drain within timeout")
