"""Stage 2 — entity linking against a broadcast QID dictionary.

Spark-first analog of zelph's name-map resolution (``zelph.cpp:117-187``
get-or-create by (lang, name)) generalized to *scored candidate ranking* —
the thresholded-confidence shape of zelph's approximate (neural) rule
conditions (``reasoning_neural.cpp:1-311``): candidates above a confidence
threshold, best one wins, confidence propagates into the emitted fact's
probability column (``reasoning_deduce.cpp:256-261``).

Plan shape (SURVEY.md §2.9 N3 / §7 M3): mentions ⋈ broadcast(dictionary)
on the exact surface (a broadcast hash join — the dictionary is the small
dimension side), then one window per mention site keeps the best candidate:
longest surface first (maximal-munch), then highest prior, then smallest qid
for determinism. At 100 TB the mentions side is huge but never shuffled —
the broadcast join and the window partition by (doc_id, pos) both hash on
mention-site keys that are near-unique, so there is no hub skew here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MENTION_PRED = "zelph:mentions"


def link_mentions(
    mentions: DataFrame,
    dictionary: DataFrame,
    threshold: float = 0.1,
) -> DataFrame:
    """Resolve mention candidates to QIDs.

    mentions:   (doc_id, src_entity, surface, pos)  — from extract.mentions
    dictionary: (surface, qid, lang, prior)         — broadcast side
    returns:    (doc_id, src_entity, surface, pos, qid, score)
    """
    cands = mentions.join(
        F.broadcast(dictionary.select("surface", "qid", "prior")),
        "surface",
        "inner",
    )
    # One winner per mention *site* (doc, token position): maximal munch,
    # then prior, then qid for deterministic ties (FIXTURES.md §2).
    site = Window.partitionBy("doc_id", "pos").orderBy(
        F.length("surface").desc(), F.col("prior").desc(), F.col("qid").asc()
    )
    best = (
        cands.withColumn("rn", F.row_number().over(site))
        .filter((F.col("rn") == 1) & (F.col("prior") >= threshold))
        .drop("rn")
        .withColumnRenamed("prior", "score")
    )
    return best.select("doc_id", "src_entity", "surface", "pos", "qid", "score")


def links_to_triples(links: DataFrame) -> DataFrame:
    """Linked mentions as (subj, pred, obj, prob) triples: the document's
    entity mentions the linked QID; the ranking score becomes the fact
    probability (the N3 confidence-product semantics with one factor)."""
    return (
        links.select(
            F.col("src_entity").alias("subj"),
            F.lit(MENTION_PRED).alias("pred"),
            F.col("qid").alias("obj"),
            F.col("score").alias("prob"),
        )
        # idempotent insert: same triple keeps its max confidence
        .groupBy("subj", "pred", "obj")
        .agg(F.max("prob").alias("prob"))
    )
