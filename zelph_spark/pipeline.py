"""End-to-end KG-construction pipeline (BASELINE.json north_rule):

    documents -> extract -> link -> canonicalize -> materialize -> reason

Each stage commits to the StageStore before the next starts, so a killed run
resumes mid-pipeline (resume test: tests/test_pipeline.py). The reference
analog is the whole ``.load`` + ``.run`` lifecycle (SURVEY.md §3.2/§3.4) —
one Spark job chain instead of a 4-thread importer + shared-memory fixpoint.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import canon, extract, graph, link, rules as Rz
from .checkpoint import StageStore, run_stage
from .reasoning import run_fixpoint


@dataclass
class PipelineResult:
    extracted: DataFrame
    triples: DataFrame  # canonical string triples incl. links + base facts
    links: DataFrame
    merge_map: DataFrame
    prob_conflicts: DataFrame
    edges: DataFrame  # long-id materialized edge table
    names: DataFrame
    nodes: DataFrame
    saturated: DataFrame  # string triples at fixpoint
    deduced: DataFrame
    contradictions: DataFrame
    counters: dict


def run_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    store_root: str | None = None,
    dictionary: DataFrame | None = None,
    reason: bool = True,
    link_threshold: float = 0.1,
) -> PipelineResult:
    store = StageStore(store_root) if store_root else None

    def stage(name, compute, partition_by=None):
        if store is None:
            return compute().localCheckpoint()
        return run_stage(store, spark, name, compute, partition_by=partition_by)

    # 1. extraction (one pass; media spans untouched by construction)
    extracted = stage("extracted", lambda: extract.extract_all(docs))
    t = extract.triples(extracted)
    labels = extract.labels(extracted)

    # 2. linking against the broadcast dictionary (derived from labels if
    #    none provided — the self-linking shape used by benches)
    if dictionary is None:
        dictionary = labels.select(
            F.lower("name").alias("surface"),
            F.col("node").alias("qid"),
            F.lit("en").alias("lang"),
            F.lit(0.9).alias("prior"),
        )
    links = stage(
        "links",
        lambda: link.link_mentions(
            extract.mentions(extracted), dictionary, threshold=link_threshold
        ),
    )
    link_triples = link.links_to_triples(links)

    # 3. canonicalization: explicit same-as claims + name-collision merges
    base_facts = spark.createDataFrame(
        Rz.BASE_FACTS, "subj string, pred string, obj string"
    )
    all_triples = (
        t.select("subj", "pred", "obj")
        .unionByName(link_triples.select("subj", "pred", "obj"))
        .unionByName(base_facts)
    )
    pairs = canon.sameas_pairs_from_triples(t).unionByName(
        canon.name_conflict_pairs(
            labels.select(F.col("node"), "lang", "name")
        ).select(F.col("a"), F.col("b"))
    )
    merge_map = stage("merge_map", lambda: canon.merge_map_from_pairs(pairs))
    canon_triples_df = stage(
        "canon_triples",
        lambda: canon.relabel_edges(all_triples, merge_map)[0],
    )
    _, prob_conflicts = canon.relabel_edges(all_triples, merge_map)

    # 4. graph materialization (long ids, pred-bucket partitioning)
    with_types = canon_triples_df.unionByName(
        graph.auto_type_predicates(canon_triples_df)
    )
    edges = stage(
        "edges", lambda: graph.build_edges(with_types), partition_by=["pred_bucket"]
    )
    names = stage(
        "names",
        lambda: graph.build_names(
            canon_triples_df,
            canon.relabel_column(labels, "node", merge_map).dropDuplicates(
                ["node", "lang", "name"]
            ),
        ),
    )
    nodes = graph.build_nodes(edges)

    # 5. reasoning to fixpoint + contradiction sweep
    counters: dict = {}
    if reason:
        fp = run_fixpoint(
            canon_triples_df,
            Rz.wikidata_rules(),
            contradiction_rules=Rz.wikidata_contradiction_rules(),
        )
        saturated = (
            stage("saturated", lambda: fp.edges) if store else fp.edges
        )
        deduced, contradictions = fp.deduced, fp.contradictions
        counters.update(
            {"fixpoint_iterations": fp.iterations, "deduced": fp.n_deduced,
             "fixpoint_log": fp.log}
        )
    else:
        saturated = canon_triples_df
        deduced = canon_triples_df.limit(0)
        contradictions = spark.createDataFrame(
            [], "rule_id string, bindings map<string,string>"
        )

    return PipelineResult(
        extracted=extracted,
        triples=canon_triples_df,
        links=links,
        merge_map=merge_map,
        prob_conflicts=prob_conflicts,
        edges=edges,
        names=names,
        nodes=nodes,
        saturated=saturated,
        deduced=deduced,
        contradictions=contradictions,
        counters=counters,
    )
