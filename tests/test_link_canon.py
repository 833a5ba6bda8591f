"""Entity linking + canonicalization semantics (SURVEY.md §7 M3/M4)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from zelph_spark import canon, datagen, extract, link


def _dict_df(spark):
    return spark.createDataFrame(datagen.fixture_qid_dictionary())


def test_link_ambiguity_resolved_by_prior(spark, fixture_docs_df):
    extracted = extract.extract_all(fixture_docs_df).cache()
    m = extract.mentions(extracted)
    links = link.link_mentions(m, _dict_df(spark)).cache()
    # 'beta' is ambiguous: Q402 (prior .9) vs Q998 (prior .2) -> Q402 wins
    beta = links.filter(F.col("surface").contains("beta")).select("qid").distinct()
    got = {r.qid for r in beta.collect()}
    assert "Q402" in got and "Q998" not in got


def test_link_maximal_munch(spark):
    """'beta city' (alias of Q402) must win over unigram 'beta' at the same
    position; surfaces are matched longest-first."""
    docs = pd.DataFrame(
        [{"doc_id": "D1", "spans": [
            {"kind": "text", "text": '{"id":"Q1","labels":{},"claims":{}}\n'
             "visit beta city today", "media_ref": "", "offset": 0}]}]
    )
    ddf = spark.createDataFrame(docs, schema=datagen.SPANS_SCHEMA)
    m = extract.mentions(extract.extract_all(ddf))
    links = link.link_mentions(m, _dict_df(spark))
    row = links.filter(F.col("surface") == "beta city").collect()
    assert len(row) == 1 and row[0].qid == "Q402"
    # unigram 'beta' at that token position must have been suppressed
    pos = row[0].pos
    uni = links.filter((F.col("pos") == pos) & (F.col("surface") == "beta"))
    assert uni.count() == 0


def test_link_deterministic_tiebreak(spark):
    """Equal surface+prior -> smallest qid wins (FIXTURES.md §2)."""
    d = spark.createDataFrame(
        pd.DataFrame([
            {"surface": "x", "qid": "Q20", "lang": "en", "prior": 0.5},
            {"surface": "x", "qid": "Q10", "lang": "en", "prior": 0.5},
        ])
    )
    m = spark.createDataFrame(
        pd.DataFrame([{"doc_id": "D", "src_entity": "Q1", "surface": "x", "pos": 0}])
    )
    got = link.link_mentions(m, d).collect()
    assert len(got) == 1 and got[0].qid == "Q10"


def test_connected_components_chain_and_star(spark):
    pairs = spark.createDataFrame(
        pd.DataFrame({"a": ["n1", "n2", "n3", "n9", "n9"],
                      "b": ["n2", "n3", "n4", "n8", "n7"]})
    )
    comp = {r.node: r.comp for r in canon.connected_components(pairs).collect()}
    assert comp["n1"] == comp["n2"] == comp["n3"] == comp["n4"] == "n1"
    assert comp["n7"] == comp["n8"] == comp["n9"] == "n7"


def test_merge_map_and_relabel_from_fixture(spark, fixture_docs_df):
    """Q800-P2888->Q801-P2888->Q802 chain: all three canonize to Q800 and
    Q802's has-part edge transfers to Q800 (Network::merge semantics)."""
    extracted = extract.extract_all(fixture_docs_df).cache()
    t = extract.triples(extracted)
    pairs = canon.sameas_pairs_from_triples(t)
    mm = canon.merge_map_from_pairs(pairs)
    got = {r.node: r.canon for r in mm.collect()}
    assert got == {"Q801": "Q800", "Q802": "Q800"}
    relabeled, conflicts = canon.relabel_edges(
        t.select("subj", "pred", "obj"), mm
    )
    rows = {(r.subj, r.pred, r.obj) for r in relabeled.collect()}
    assert ("Q800", "P527", "Q211") in rows  # transferred from Q802
    assert not any(s in ("Q801", "Q802") or o in ("Q801", "Q802")
                   for s, _, o in rows)
    assert conflicts.count() == 0


def test_probability_reconciliation_matches_reference(spark):
    """network.hpp:241-254: both>=.5 -> max, both<=.5 -> min, mixed -> conflict."""
    edges = spark.createDataFrame(
        pd.DataFrame([
            {"subj": "a", "pred": "p", "obj": "x", "prob": 0.7},
            {"subj": "b", "pred": "p", "obj": "x", "prob": 0.9},
            {"subj": "c", "pred": "p", "obj": "x", "prob": 0.2},
            {"subj": "d", "pred": "p", "obj": "x", "prob": 0.3},
            {"subj": "e", "pred": "p", "obj": "x", "prob": 0.2},
            {"subj": "f", "pred": "p", "obj": "x", "prob": 0.8},
            {"subj": "g", "pred": "p", "obj": "x", "prob": 0.4},
            {"subj": "h", "pred": "p", "obj": "x", "prob": 0.5},
        ])
    )
    mm = spark.createDataFrame(
        pd.DataFrame([
            {"node": "b", "canon": "a"},
            {"node": "d", "canon": "c"},
            {"node": "f", "canon": "e"},
            {"node": "h", "canon": "g"},
        ])
    )
    resolved, conflicts = canon.relabel_edges(edges, mm)
    probs = {r.subj: r.prob for r in resolved.collect()}
    assert probs["a"] == 0.9  # max of .7/.9
    assert probs["c"] == 0.2  # min of .2/.3
    assert "e" not in probs  # mixed .2/.8 -> conflict row
    # 0.5 boundary: {0.4, 0.5} is NOT mixed (conflict needs pmax > 0.5) and
    # the reference's both<=0.5 branch resolves it to min (network.hpp:241-254)
    assert probs["g"] == 0.4
    c = conflicts.collect()
    assert len(c) == 1 and c[0].subj == "e"


def test_link_null_prior_loses_to_scored_candidate(spark):
    """ADVICE r4: a NULL-prior dictionary row must not win its mention site
    inside the min(struct) ranking (NULL sorts first ascending) and then be
    discarded by the threshold filter — NULL-prior rows are filtered from
    the dictionary, matching the old prior.desc()-nulls-last window."""
    d = spark.createDataFrame(
        pd.DataFrame([
            {"surface": "x", "qid": "Q20", "lang": "en", "prior": None},
            {"surface": "x", "qid": "Q10", "lang": "en", "prior": 0.5},
            {"surface": "y", "qid": "Q30", "lang": "en", "prior": None},
        ])
    )
    m = spark.createDataFrame(
        pd.DataFrame([
            {"doc_id": "D", "src_entity": "Q1", "surface": "x", "pos": 0},
            {"doc_id": "D", "src_entity": "Q1", "surface": "y", "pos": 1},
        ])
    )
    got = link.link_mentions(m, d).collect()
    # site 0: the scored candidate wins; site 1 (NULL-only) yields nothing,
    # exactly as the old NULL score >= threshold filter behaved
    assert len(got) == 1 and got[0].qid == "Q10" and got[0].pos == 0
