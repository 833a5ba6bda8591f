"""Multimodal columns: opaque binary media with typed metadata.

Media payloads ride as ``binary`` columns beside typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
stages. The image/audio libraries are NOT in this container, so the codec
step is STUBBED: with PIL/soundfile absent, :func:`decode_image` &co produce
a deterministic fake derived from the payload bytes (clearly marked in the
``decoder`` output column). The Spark-side plumbing — schema, partitioning,
UDF signature, batch shape — is real and tested; swapping in a real codec is
a one-function change inside the batch iterator.

Scale notes: media rows are wide (payload bytes), so the decode stage should
run *after* any filtering join (decode last), and the output drops the
payload unless ``keep_content=True`` — never carry decoded pixels and raw
bytes through the same shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_ref string, media_type string, content binary, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 8

DECODED_SCHEMA = (
    "media_ref string, media_type string, width int, height int, "
    "decoder string, features array<float>"
)

FRAME_SCHEMA = (
    "media_ref string, frame_idx int, ts_ms int, features array<float>"
)


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from the media spans of a documents
    table: payload bytes derived from the media_ref (sha256-expanded)."""
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )
    return refs.select(
        "media_ref",
        F.when(F.xxhash64("media_ref") % 3 == 0, "audio/wav")
        .when(F.xxhash64("media_ref") % 3 == 1, "video/mp4")
        .otherwise("image/png")
        .alias("media_type"),
        F.sha2(F.col("media_ref"), 256).cast("binary").alias("content"),
        (F.pmod(F.xxhash64("media_ref", F.lit(1)), F.lit(512)) + 16)
        .cast("int")
        .alias("width"),
        (F.pmod(F.xxhash64("media_ref", F.lit(2)), F.lit(512)) + 16)
        .cast("int")
        .alias("height"),
        (F.pmod(F.xxhash64("media_ref", F.lit(3)), F.lit(60000)))
        .cast("int")
        .alias("duration_ms"),
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a feature extractor: bytes -> unit-free
    float vector via sha256 re-hashing. Stable across runs and engines."""
    h = hashlib.sha256(payload or b"").digest()
    out = []
    for i in range(dim):
        chunk = h[(4 * i) % 28 : (4 * i) % 28 + 4]
        out.append(int.from_bytes(chunk, "big") / 2**32)
    return out


def _have_pil() -> bool:
    try:  # pragma: no cover - container has no PIL
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(media: DataFrame, keep_content: bool = False) -> DataFrame:
    """Decode + feature-extract images (and pass non-images through with
    null features). Real codec when PIL is available; deterministic fake
    otherwise (decoder column says which ran)."""
    use_pil = _have_pil()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                if r.media_type.startswith("image/"):
                    if use_pil:  # pragma: no cover
                        raise NotImplementedError(
                            "real PIL decode path not wired in this container"
                        )
                    feats = _fake_features(bytes(r.content or b""))
                    decoder = "stub-sha256"
                else:
                    feats, decoder = None, "skip"
                rows.append(
                    (r.media_ref, r.media_type, r.width, r.height, decoder, feats)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "media_type", "width", "height",
                    "decoder", "features",
                ],
            )

    cols = ["media_ref", "media_type", "content", "width", "height"]
    out = media.select(*cols).mapInPandas(batches, schema=DECODED_SCHEMA)
    return out


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize metadata computation is pure columnar (no UDF): target dims
    preserving aspect ratio; the pixel work would live in the decode stage."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height")),
    )
    return media.withColumn(
        "target_width", F.ceil(F.col("width") * scale).cast("int")
    ).withColumn("target_height", F.ceil(F.col("height") * scale).cast("int"))


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled timestamp
    with stub features; batch shape (explode inside mapInPandas) is the real
    contract a codec plugs into."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                if not r.media_type.startswith("video/"):
                    continue
                n = max(1, int(r.duration_ms // every_ms))
                payload = bytes(r.content or b"")
                for i in range(n):
                    rows.append(
                        (
                            r.media_ref,
                            i,
                            i * every_ms,
                            _fake_features(payload + i.to_bytes(4, "big")),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["media_ref", "frame_idx", "ts_ms", "features"]
            )

    cols = ["media_ref", "media_type", "content", "duration_ms"]
    return media.select(*cols).mapInPandas(batches, schema=FRAME_SCHEMA)
