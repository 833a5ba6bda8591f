"""Long-id fixpoint path: reasoning over the materialized int64 edge table
must equal the string-space fixpoint mapped through node ids."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from zelph_spark import config, graph, rules as Rz
from zelph_spark.reasoning import run_fixpoint


def test_longid_fixpoint_matches_string_fixpoint(spark):
    facts = [
        ("Q1", "P31", "Q5"),
        ("Q5", "P279", "Q10"),
        ("Q10", "P279", "Q20"),
        ("P279", "P31", Rz.TRANSITIVE),
        ("Q30", "P461", "Q31"),
    ]
    sdf = spark.createDataFrame(
        pd.DataFrame(facts, columns=["subj", "pred", "obj"])
    )
    rules = Rz.wikidata_rules()

    # string-space fixpoint
    s_res = run_fixpoint(sdf, rules)
    s_edges = {(r.subj, r.pred, r.obj) for r in s_res.edges.collect()}

    # long-id space: materialize, resolve rule constants, saturate
    edges = graph.build_edges(sdf).select("subj", "pred", "obj")
    consts = Rz.rule_constants(rules) | {t for f in facts for t in f}
    cdf = spark.createDataFrame(pd.DataFrame({"name": sorted(consts)}))
    mapping = {
        r.name: r.node
        for r in cdf.select(
            "name", config.node_id(F.col("name"), F.lit("wikidata")).alias("node")
        ).collect()
    }
    l_res = run_fixpoint(edges, Rz.resolve_rules(rules, mapping))
    l_edges = {(r.subj, r.pred, r.obj) for r in l_res.edges.collect()}

    mapped = {
        (mapping[s], mapping[p], mapping[o]) for s, p, o in s_edges
    }
    assert l_edges == mapped
    assert len(l_edges) > len(facts)  # deductions happened
