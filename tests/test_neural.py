"""Neural/approximate conditions (SURVEY.md §2.9): scored candidates,
confidence products, distributed training."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from zelph_spark.ops import neural


@pytest.fixture(scope="module")
def xor_ish(spark):
    # linearly separable toy: label = 1 iff x0 + x1 > 1
    rows = []
    for i in range(200):
        x0, x1 = (i % 20) / 10.0, ((i * 7) % 20) / 10.0
        rows.append({"features": [x0, x1], "label": 1 if x0 + x1 > 0.95 else 0})
    return spark.createDataFrame(
        pd.DataFrame(rows), "features array<double>, label int"
    ).cache()


def test_scorer_threshold_and_guard(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2], "features": [[5.0, 0.0], [-5.0, 0.0]]}),
        "id int, features array<double>",
    )
    out = neural.score_candidates(df, "features", np.array([1.0, 0.0]))
    rows = out.collect()
    assert [r.id for r in rows] == [1]  # negative logit filtered
    assert rows[0].confidence > 0.99


def test_confidence_product(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"a": [0.8], "b": [0.5]}), "a double, b double"
    )
    got = df.select(
        neural.combine_confidences(F.col("a"), F.col("b")).alias("p")
    ).first()
    assert abs(got.p - 0.4) < 1e-12


def test_distributed_training_learns(spark, xor_ish):
    w, b = neural.train_logreg(xor_ish, "features", "label", dim=2, lr=2.0, epochs=60)
    scored = xor_ish.withColumn(
        "p", neural.make_scorer(w, b)(F.col("features"))
    )
    acc = scored.select(
        F.avg(
            ((F.col("p") > 0.5).cast("int") == F.col("label")).cast("double")
        ).alias("acc")
    ).first().acc
    assert acc > 0.95
