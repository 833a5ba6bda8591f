"""Neural / approximate rule conditions (SURVEY.md §2.9 N1-N3).

zelph stores synapse weights in the sparse edge-weight side store
(``network.hpp:581-673``), compiles them into a small dense net
(``neural.hpp:51-90``), and lets ``≈`` rule conditions consult it during
unification — guard mode verifies candidate bindings with a confidence,
generator mode proposes bindings above a threshold, and the confidence
multiplies into the deduced fact's probability
(``reasoning_neural.cpp:1-311``, ``reasoning_deduce.cpp:256-261``).

The Spark lowering is the scored-candidate pattern: the model is SMALL
(node-pair scorer), so weights are a broadcast numpy array; scoring is an
Arrow-batched pandas UDF over the candidate DataFrame (vectorized forward
pass, no per-row Python); thresholding is a ``where``; the deduced ``prob``
is the product of condition confidences. Training (N2: forward / SGD /
write-back) is distributed full-batch gradient descent: the gradient is an
aggregation over the data, the tiny weight vector round-trips the driver
per epoch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


def _sigmoid(z):
    return 1.0 / (1.0 + np.exp(-z))


def make_scorer(weights: np.ndarray, bias: float = 0.0):
    """Broadcastable batch scorer: features array<double> -> confidence in
    [0,1]. The closure captures the (small) weights; Spark ships it with the
    serialized UDF — the broadcast-weights pattern."""
    w = np.asarray(weights, dtype="float64")
    b = float(bias)

    @pandas_udf("double")
    def score(feats: pd.Series) -> pd.Series:
        mat = np.vstack(feats.to_numpy())
        return pd.Series(_sigmoid(mat @ w + b))

    return score


def score_candidates(
    candidates: DataFrame,
    feature_col: str,
    weights: np.ndarray,
    bias: float = 0.0,
    threshold: float = 0.5,
    confidence_col: str = "confidence",
) -> DataFrame:
    """Guard/generator mode of an ``≈`` condition: score every candidate,
    keep those above threshold (reasoning_neural.cpp generator semantics).
    Downstream deduction multiplies ``confidence`` into the fact prob."""
    scorer = make_scorer(weights, bias)
    return candidates.withColumn(
        confidence_col, scorer(F.col(feature_col))
    ).filter(F.col(confidence_col) > threshold)


def combine_confidences(*cols: Column) -> Column:
    """Deduced fact probability = product of the condition confidences
    (reasoning_deduce.cpp:256-261)."""
    out = F.lit(1.0)
    for c in cols:
        out = out * c
    return out


def train_logreg(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    dim: int,
    lr: float = 1.0,
    epochs: int = 20,
) -> tuple[np.ndarray, float]:
    """Distributed full-batch logistic-regression training (the SGD
    write-back loop of N2): per epoch one aggregation job computes the exact
    gradient; only the dim+1 weight vector moves through the driver."""
    w = np.zeros(dim)
    b = 0.0
    n = df.count()
    for _ in range(epochs):
        scorer = make_scorer(w, b)
        g = (
            df.withColumn("_p", scorer(F.col(feature_col)))
            .withColumn("_err", F.col("_p") - F.col(label_col).cast("double"))
            .select(
                F.array(
                    *[
                        F.sum(F.col("_err") * F.col(feature_col)[i])
                        for i in range(dim)
                    ]
                ).alias("gw"),
                F.sum("_err").alias("gb"),
            )
            .first()
        )
        w = w - lr * np.array(g.gw) / n
        b = b - lr * g.gb / n
    return w, b
