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


def _graph(spark, partof_triples, synapses):
    edges = spark.createDataFrame(
        pd.DataFrame(partof_triples, columns=["subj", "pred", "obj"])
    )
    syn = spark.createDataFrame(
        pd.DataFrame(synapses, columns=["a", "b", "w"])
    )
    return edges, syn


def test_graphnet_xor_forward(spark):
    """Hand-crafted bias-free XOR (test_neural.cpp:78-108): h1=relu(x1-x2),
    h2=relu(x2-x1), y=h1+h2; neuron order ascending within each layer."""
    from zelph_spark.ops.neural import GraphNet

    edges, syn = _graph(
        spark,
        [("x1", "in", "Lin"), ("x2", "in", "Lin"),
         ("h1", "in", "Lhid"), ("h2", "in", "Lhid"), ("y", "in", "Lout")],
        [("x1", "h1", 1.0), ("x2", "h1", -1.0),
         ("x1", "h2", -1.0), ("x2", "h2", 1.0),
         ("h1", "y", 1.0), ("h2", "y", 1.0)],
    )
    net = GraphNet.compile(edges, syn, ["Lin", "Lhid", "Lout"])
    assert net.layer_nodes(0) == ["x1", "x2"]
    got = [net.forward([a, b])[0] for a, b in ((0, 0), (0, 1), (1, 0), (1, 1))]
    assert got == [0.0, 1.0, 1.0, 0.0]


def test_graphnet_sgd_converges_and_writes_back(spark):
    """SGD on a 1-weight net (test_neural.cpp:115-150): lr=0 measures loss
    2.0; training converges w->2; write_back lands it in the synapse rows;
    a recompiled net predicts with the trained weight."""
    from zelph_spark.ops.neural import GraphNet

    edges, syn = _graph(
        spark, [("u", "in", "NetIn"), ("v", "in", "NetOut")],
        [("u", "v", 0.0)],
    )
    net = GraphNet.compile(edges, syn, ["NetIn", "NetOut"])
    assert abs(net.train_step([1.0], [2.0], 0.0) - 2.0) < 1e-12
    for _ in range(200):
        net.train_step([1.0], [2.0], 0.1)
    back = net.write_back(spark)
    row = back.collect()[0]
    assert (row.a, row.b) == ("u", "v") and abs(row.w - 2.0) < 1e-6
    net2 = GraphNet.compile(edges, back, ["NetIn", "NetOut"])
    assert abs(net2.forward([3.0])[0] - 6.0) < 1e-6


def test_graphnet_training_preserves_sparsity(spark):
    """Absent synapses stay absent through training
    (test_neural.cpp:153-173)."""
    from zelph_spark.ops.neural import GraphNet

    edges, syn = _graph(
        spark,
        [("i1", "in", "SpIn"), ("i2", "in", "SpIn"), ("o1", "in", "SpOut")],
        [("i1", "o1", 0.5)],
    )
    net = GraphNet.compile(edges, syn, ["SpIn", "SpOut"])
    for _ in range(50):
        net.train_nodes([("i1", 1.0), ("i2", 1.0)], [("o1", 3.0)], 0.1)
    back = {(r.a, r.b) for r in net.write_back(spark).collect()}
    assert back == {("i1", "o1")}  # i2 -> o1 never leaks into the store


def test_graphnet_node_addressed_and_batch_eval(spark):
    """Node-addressed encode/eval (neural.hpp:72-90) + distributed batch
    scoring through the pandas-UDF forward pass."""
    from zelph_spark.ops.neural import GraphNet

    edges, syn = _graph(
        spark,
        [("x1", "in", "Lin"), ("x2", "in", "Lin"),
         ("h1", "in", "Lhid"), ("h2", "in", "Lhid"), ("y", "in", "Lout")],
        [("x1", "h1", 1.0), ("x2", "h1", -1.0),
         ("x1", "h2", -1.0), ("x2", "h2", 1.0),
         ("h1", "y", 1.0), ("h2", "y", 1.0)],
    )
    net = GraphNet.compile(edges, syn, ["Lin", "Lhid", "Lout"])
    assert net.has_node(0, "x1") and not net.has_node(0, "y")
    # graded activation: x1=0.5 alone -> y = relu(0.5) = 0.5
    got = dict(net.eval_nodes([("x1", 0.5)]))
    assert abs(got["y"] - 0.5) < 1e-12
    with pytest.raises(ValueError):
        net.encode(0, [("y", 1.0)])
    samples = spark.createDataFrame(
        pd.DataFrame({"vec": [[0.0, 1.0], [1.0, 1.0], [1.0, 0.0]]}),
        "vec array<double>",
    )
    out = [r.scores[0] for r in net.batch_eval(samples, "vec").collect()]
    assert out == [1.0, 0.0, 1.0]


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
