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


# ---------------------------------------------------------------------------
# Stateful / watermarked event-stream operators
# ---------------------------------------------------------------------------

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)

SESSION_OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint"
)
# open-session state: epoch SECONDS (the batch sessionizer compares
# unix_timestamp() seconds, so the stream must truncate identically or the
# two disagree on events that land within the same second as the gap edge)
_SESSION_STATE_SCHEMA = "start long, last long, n long"


def stream_sessionize(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    gap_s: int = 1800,
    watermark: str = "30 minutes",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming sessionization with a custom stateful operator
    (``applyInPandasWithState``): per-user sessions split by a ``gap_s``
    inactivity gap, emitted as soon as they CLOSE — either because a later
    event for the same user arrives past the gap, or because the event-time
    watermark passes ``session_end + gap`` (event-time timeout), so an idle
    user's last session still lands without waiting for more of their data.

    Semantics mirror the batch ``events_sessionize`` contract query (same
    gap, same second-truncated comparison); the differential test replays
    the same events table through both. State per user is one open session
    (three longs) — bounded by |active users within the watermark horizon|,
    not by stream length, which is the property that lets this run forever
    at ingest scale. Out-of-order events within the watermark are merged
    into the open session (extending it backwards if needed); older ones
    are dropped by the watermark like any late data.
    """
    import pandas as pd

    gap = int(gap_s)

    def fn(key, pdfs, state):
        user_id = key[0]

        def emit(start_s: int, end_s: int, n: int):
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.to_datetime(start_s, unit="s")],
                    "session_end": [pd.to_datetime(end_s, unit="s")],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield emit(start, last, n)
            return

        batches = [p for p in pdfs if len(p)]
        rows = pd.concat(batches) if batches else pd.DataFrame(columns=["ts"])
        rows = rows.sort_values(["ts", "event_id"])
        # epoch seconds, truncated — parity with unix_timestamp() in batch
        secs = (
            rows["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000_000
        ).tolist()

        open_ = list(state.get) if state.exists else None
        closed = []
        for t in secs:
            if open_ is None:
                open_ = [t, t, 1]
            elif t - open_[1] > gap:
                closed.append(tuple(open_))
                open_ = [t, t, 1]
            elif t < open_[0]:
                # out-of-order within the watermark: extend backwards
                open_[0] = t
                open_[2] += 1
            else:
                open_[1] = max(open_[1], t)
                open_[2] += 1
        for s in closed:
            yield emit(*s)
        if open_ is None:
            state.remove()
            return
        wm_ms = state.getCurrentWatermarkMs()
        timeout_ms = (open_[1] + gap) * 1000 + 1
        if timeout_ms <= wm_ms:
            # already closeable in this batch — don't park unreachable state
            yield emit(*open_)
            state.remove()
        else:
            state.update(tuple(open_))
            state.setTimeoutTimestamp(timeout_ms)

    events = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        events = events.option("maxFilesPerTrigger", max_files_per_trigger)
    sessions = (
        events.parquet(input_path)
        .select("event_id", "ts", "user_id")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )
    writer = (
        sessions.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_hourly(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    watermark: str = "30 minutes",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Watermarked hourly rollup in append mode: each (hour, event_type)
    aggregate is emitted exactly once, when the event-time watermark passes
    the end of its hour — the late-data-tolerant streaming analog of the
    batch ``events_hourly`` contract query (same truncation, same
    aggregates). Late events inside the watermark still count; older ones
    are dropped, and the emitted row never has to be retracted — which is
    what lets the sink be a plain append-only table at any scale.
    """
    from pyspark.sql import functions as F

    events = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        events = events.option("maxFilesPerTrigger", max_files_per_trigger)
    hourly = (
        events.parquet(input_path)
        .select("ts", "event_type", "value")
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour"), "event_type", "n", "sum_value"
        )
    )
    writer = (
        hourly.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
