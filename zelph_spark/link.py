"""Stage 2 — entity linking against a broadcast QID dictionary.

Spark-first analog of zelph's name-map resolution (``zelph.cpp:117-187``
get-or-create by (lang, name)) generalized to *scored candidate ranking* —
the thresholded-confidence shape of zelph's approximate (neural) rule
conditions (``reasoning_neural.cpp:1-311``): candidates above a confidence
threshold, best one wins, confidence propagates into the emitted fact's
probability column (``reasoning_deduce.cpp:256-261``).

Plan shape (SURVEY.md §2.9 N3 / §7 M3): mentions ⋈ broadcast(dictionary)
on the exact surface (a broadcast hash join — the dictionary is the small
dimension side), then one ``min(struct(...))`` aggregate per mention site
keeps the best candidate: longest surface first (maximal-munch), then
highest prior, then smallest qid for determinism. The aggregate replaces the
earlier ``row_number`` window: a window must shuffle EVERY candidate row on
(doc_id, pos) and sort each partition, while the hash aggregate collapses
the ~n-grams-per-token fan-out map-side (partial_min before the exchange),
so the shuffle carries ~one row per mention site instead of one per
candidate. Candidates for one site are produced by one mapper (the n-gram
explode is per-document), so the map-side combine removes essentially the
whole fan-out. No hub skew either way — (doc_id, pos) is near-unique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

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
    # NULL-prior dictionary rows are dropped up front: inside min(struct)
    # an ascending comparison sorts a NULL neg_prior FIRST, so a NULL-prior
    # candidate would win its mention site and then be discarded by the
    # score>=threshold filter — losing the site. Filtering here is exactly
    # the old prior.desc()-nulls-last behavior (a NULL-only site produced a
    # NULL score and was filtered anyway).
    cands = mentions.join(
        F.broadcast(
            dictionary.select("surface", "qid", "prior").filter(
                F.col("prior").isNotNull()
            )
        ),
        "surface",
        "inner",
    )
    # One winner per mention *site* (doc, token position): maximal munch,
    # then prior, then qid for deterministic ties (FIXTURES.md §2).
    # min(struct) with inverted numeric keys == that ordering's first row;
    # the payload columns ride along after the keys. The ordering key
    # (length, prior, qid) is unique per site — a site has exactly one
    # surface per n-gram length and src_entity is per-document — so ties
    # past qid are between identical rows and the pick is deterministic.
    best_struct = F.min(
        F.struct(
            (-F.length("surface")).alias("neg_len"),
            (-F.col("prior")).alias("neg_prior"),
            F.col("qid").alias("qid"),
            F.col("surface").alias("surface"),
            F.col("src_entity").alias("src_entity"),
            F.col("prior").alias("prior"),
        )
    ).alias("w")
    best = (
        cands.groupBy("doc_id", "pos")
        .agg(best_struct)
        .select(
            "doc_id",
            F.col("w.src_entity").alias("src_entity"),
            F.col("w.surface").alias("surface"),
            "pos",
            F.col("w.qid").alias("qid"),
            F.col("w.prior").alias("score"),
        )
        .filter(F.col("score") >= threshold)
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
