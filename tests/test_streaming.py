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
