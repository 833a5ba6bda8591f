"""Deterministic sampling operators for training-data mixing.

Web-corpus pipelines rebalance sources before training (e.g. downsample the
dominant language, keep all of a scarce one). At 100 TB the only sampling
that survives retries, speculative execution and incremental re-runs is a
PURE FUNCTION of the row key — never `rand()`, which resamples per task
attempt. These operators hash the document key to a uniform [0,1) value and
compare against a per-group rate, so the same row always makes the same
keep/drop decision on any cluster, at any parallelism, on any engine.

All JVM-side columnar expressions (no Python UDFs, no shuffle: sampling is
a map-only filter). The hash is the first 15 hex chars of md5 (a positive
60-bit value) so the DuckDB correctness oracle recomputes the exact sample
cross-engine — same portability trick as simhash / winnowing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 2^60: the 15-hex-char md5 prefix is uniform on [0, 2^60).
_HASH_SPACE = float(1 << 60)


def hash_unit(key: Column, salt: str = "zelph") -> Column:
    """Deterministic uniform [0,1) value from a row key: the first 15 hex
    chars of md5(salt || key) scaled by 2^60. Changing ``salt`` draws an
    independent sample (the analog of a seed)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return h / F.lit(_HASH_SPACE)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    key: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "zelph",
) -> DataFrame:
    """Keep each row with probability ``rates[group]`` (``default_rate`` for
    unlisted groups), decided by the deterministic key hash. Adds
    ``sample_rate`` and ``weight`` = 1/rate rounded to 6 places — the
    Horvitz-Thompson inverse-probability weight, so downstream aggregates
    over the sample stay unbiased estimates of the full corpus.

    Scale shape: map-only (one filter over the scan, no shuffle, no state);
    the rate table rides the plan as a literal CASE/map lookup. Rows with a
    rate of 0 (or an unlisted group under the default) are dropped without
    producing output.
    """
    m = F.create_map(
        *[lit for g, r in sorted(rates.items()) for lit in (F.lit(g), F.lit(float(r)))]
    )
    rate = F.coalesce(m[F.col(group_col)], F.lit(float(default_rate)))
    return (
        df.withColumn("sample_rate", rate)
        .filter(hash_unit(F.col(key), salt) < F.col("sample_rate"))
        .withColumn("weight", F.round(F.lit(1.0) / F.col("sample_rate"), 6))
    )


def split_train_holdout(
    df: DataFrame,
    holdout_frac: float = 0.01,
    key: str = "doc_id",
    salt: str = "zelph-split",
) -> DataFrame:
    """Deterministic train/holdout assignment: adds ``split`` ('train' or
    'holdout') from the key hash. Unlike `randomSplit`, membership is stable
    across runs, retries and engines — a document can never leak from
    holdout into a later training run's train split because the pipeline
    re-executed."""
    return df.withColumn(
        "split",
        F.when(
            hash_unit(F.col(key), salt) < F.lit(float(holdout_frac)),
            F.lit("holdout"),
        ).otherwise(F.lit("train")),
    )
