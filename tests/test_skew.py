"""Hub-skew handling (O15; the reference's own P31 warning,
unification.cpp:713-717).  tools/skew_demo.py is the full measured
demonstration; this test pins the two engine behaviors it relies on:

1. with the engine's skew posture (factor 2.0, session.py) and byte
   thresholds scaled to sandbox partition sizes, AQE splits the hub
   partition of the fused taxonomy join (``skew=true`` in the final plan);
2. the explicit-salting fallback produces the identical result set.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from tools.skew_demo import TAXONOMY, run_round, skewed_edges
from zelph_spark.reasoning.fused import fuse_rules


@pytest.fixture(scope="module")
def skew_setup(spark):
    old = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    # sandbox-scale byte thresholds (the compressed hub partition of a 2M-row
    # corpus is ~200-400 KB; the 256MB default is cluster-partition-sized)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    edges = skewed_edges(spark, 2_000_000, 0.5, 5_000).localCheckpoint()
    yield edges
    for k, v in old.items():
        spark.conf.set(k, v)


def test_aqe_splits_hub_partition(spark, skew_setup):
    edges = skew_setup
    groups = fuse_rules([TAXONOMY])
    n, _dt, plan = run_round(edges, groups)
    assert n == 2_000_000  # every instance edge finds exactly one parent
    assert plan.count("skew=true") >= 1, plan[:2000]


def test_salted_path_matches(spark, skew_setup):
    edges = skew_setup
    groups = fuse_rules([TAXONOMY])
    n_plain, _dt, _plan = run_round(edges, groups)
    n_salted, _dt2, _plan2 = run_round(edges, groups, salt_buckets=8)
    assert n_salted == n_plain
