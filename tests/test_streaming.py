"""Structured Streaming ingest: exactly-once incremental extraction
(streaming analog of the StageStore resume contract)."""

from __future__ import annotations

from zelph_spark import datagen, extract, streaming


def _write_docs(spark, pdf, path):
    spark.createDataFrame(pdf, schema=datagen.SPANS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stream_extract_incremental_exactly_once(spark, tmp_path):
    docs = datagen.fixture_docs()
    first, second = docs.iloc[:5], docs.iloc[5:]
    inp = str(tmp_path / "landing")
    out = str(tmp_path / "extracted")
    cp = str(tmp_path / "ckpt")

    # batch oracle over the full fixture
    want = {
        tuple(r)
        for r in extract.extract_all(
            spark.createDataFrame(docs, schema=datagen.SPANS_SCHEMA)
        ).collect()
    }

    _write_docs(spark, first, inp)
    streaming.drain(streaming.stream_extract(spark, inp, out, cp))
    n_first = spark.read.parquet(out).count()
    assert 0 < n_first < len(want)

    # land more files; a NEW availableNow run drains ONLY the new ones
    _write_docs(spark, second, inp)
    streaming.drain(streaming.stream_extract(spark, inp, out, cp))
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert got == want  # no duplicates from the first batch, nothing missing

    # a third run with no new input appends nothing (exactly-once resume)
    streaming.drain(streaming.stream_extract(spark, inp, out, cp))
    assert spark.read.parquet(out).count() == len(want)


# ---------------------------------------------------------------------------
# Stateful / watermarked event operators — differential vs the batch queries
# ---------------------------------------------------------------------------

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _land_event_chunks(spark, tmp_path):
    """Replay the driver events table as three ts-ordered parquet chunks
    (multi-micro-batch arrival) plus two far-future sentinel events that
    push the watermark past every real session/window."""
    import pandas as pd

    ev = pd.read_parquet(EVENTS).sort_values(["ts", "event_id"])
    inp = str(tmp_path / "events_landing")
    n = len(ev)
    cuts = [0, n // 3, 2 * n // 3, n]
    sdf = lambda pdf: spark.createDataFrame(pdf, schema=streaming.EVENTS_SCHEMA)
    for i in range(3):
        sdf(ev.iloc[cuts[i]:cuts[i + 1]]).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
    sentinels = []
    for k in (3, 6):
        sentinels.append(
            {
                "event_id": 10_000_000 + k,
                "ts": ev["ts"].max() + pd.Timedelta(hours=k),
                "user_id": -1,
                "event_type": "sentinel",
                "value": 0.0,
                "props": "{}",
            }
        )
    return ev, inp, [pd.DataFrame([s]) for s in sentinels], sdf


def _expected_sessions(ev, gap=1800):
    """Pandas recomputation of per-user sessions (second-truncated epochs,
    same comparison as the batch events_sessionize contract query)."""
    out = set()
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        secs = (
            g["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000_000
        ).tolist()
        start = last = secs[0]
        n = 1
        for t in secs[1:]:
            if t - last > gap:
                out.add((uid, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        out.add((uid, start, last, n))
    return out


def test_stream_sessionize_matches_batch(spark, tmp_path):
    ev, inp, sentinels, sdf = _land_event_chunks(spark, tmp_path)
    out = str(tmp_path / "sessions")
    cp = str(tmp_path / "sess_ckpt")

    kw = dict(gap_s=1800, watermark="30 minutes", max_files_per_trigger=1)
    streaming.drain(streaming.stream_sessionize(spark, inp, out, cp, **kw))
    # sentinels land in LATER availableNow runs: the watermark (and with it
    # every event-time timeout) must survive the checkpoint across restarts
    for s in sentinels:
        sdf(s).coalesce(1).write.mode("append").parquet(inp)
        streaming.drain(streaming.stream_sessionize(spark, inp, out, cp, **kw))

    got = {
        (
            r.user_id,
            int(r.session_start.timestamp()),
            int(r.session_end.timestamp()),
            r.n_events,
        )
        for r in spark.read.parquet(out).collect()
        if r.user_id != -1
    }
    assert got == _expected_sessions(ev)
    # and the per-user rollup agrees with the oracled batch contract query
    import __spark_entry__ as E

    batch = {
        (r.user_id, r.n_sessions, r.n_events)
        for r in E.queries()["events_sessionize"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    per_user = {}
    for uid, _s, _e, n in got:
        c, t = per_user.get(uid, (0, 0))
        per_user[uid] = (c + 1, t + n)
    assert {(u, c, t) for u, (c, t) in per_user.items()} == batch


def test_stream_hourly_matches_batch(spark, tmp_path):
    ev, inp, sentinels, sdf = _land_event_chunks(spark, tmp_path)
    out = str(tmp_path / "hourly")
    cp = str(tmp_path / "hourly_ckpt")

    kw = dict(watermark="30 minutes", max_files_per_trigger=1)
    streaming.drain(streaming.stream_hourly(spark, inp, out, cp, **kw))
    for s in sentinels:
        sdf(s).coalesce(1).write.mode("append").parquet(inp)
        streaming.drain(streaming.stream_hourly(spark, inp, out, cp, **kw))

    got = {
        (r.hour, r.event_type, r.n, r.sum_value)
        for r in spark.read.parquet(out).collect()
        if r.event_type != "sentinel"
    }
    import __spark_entry__ as E

    want = {
        (r.hour, r.event_type, r.n, r.sum_value)
        for r in E.queries()["events_hourly"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert got == want
