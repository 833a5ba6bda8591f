"""End-to-end pipeline + kill/resume (SURVEY.md §5.2 items 1,4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import datalog_oracle as oracle
from zelph_spark import datagen, rules as Rz
from zelph_spark.pipeline import run_pipeline


@pytest.fixture(scope="module")
def result(spark, fixture_docs_df, tmp_path_factory):
    root = tmp_path_factory.mktemp("pipe")
    dic = spark.createDataFrame(datagen.fixture_qid_dictionary())
    return run_pipeline(spark, fixture_docs_df, str(root), dictionary=dic)


def test_pipeline_saturation_matches_oracle(spark, result):
    """The pipeline fixpoint over canonicalized triples equals the oracle
    fixpoint over the same base — the P/R gate at P=R=1.0."""
    base = {
        (r.subj, r.pred, r.obj)
        for r in result.triples.select("subj", "pred", "obj").collect()
    }
    want = oracle.stratified_fixpoint(base, Rz.wikidata_rules())
    got = {
        (r.subj, r.pred, r.obj)
        for r in result.saturated.collect()
    }
    assert got == want


def test_pipeline_canonicalization_applied(result):
    """Q801/Q802 merged into Q800 before reasoning."""
    sat = result.saturated
    assert sat.filter(F.col("subj").isin("Q801", "Q802")).count() == 0
    assert sat.filter(
        (F.col("subj") == "Q800") & (F.col("pred") == "P527")
    ).count() >= 1


def test_pipeline_links_present(result):
    """Free-text mentions resolve: Q100's body mentions alpha/beta/gamma."""
    links = result.links
    got = {
        (r.src_entity, r.qid)
        for r in links.filter(F.col("doc_id") == "Q100").collect()
    }
    assert ("Q100", "Q402") in got  # 'beta' -> city (prior beats distractor)
    assert ("Q100", "Q100") in got  # self-mention 'alpha'


def test_pipeline_resume_skips_completed_stages(spark, fixture_docs_df, tmp_path):
    """Kill/resume: after a full run, re-running reuses every stage
    checkpoint and produces identical saturated output."""
    root = tmp_path / "pipe2"
    dic = spark.createDataFrame(datagen.fixture_qid_dictionary())
    r1 = run_pipeline(spark, fixture_docs_df, str(root), dictionary=dic)
    s1 = {(r.subj, r.pred, r.obj) for r in r1.saturated.collect()}
    # simulate a killed run that completed only extract+links: drop the rest
    from zelph_spark.checkpoint import StageStore

    store = StageStore(root)
    for stage in ("canon_triples", "edges", "names", "saturated"):
        store.drop(stage)
    # resume with DIFFERENT (empty) docs: untouched stages must come from
    # the checkpoints, proving the resume path reads, not recomputes
    empty_docs = fixture_docs_df.limit(0)
    r2 = run_pipeline(spark, empty_docs, str(root), dictionary=dic)
    s2 = {(r.subj, r.pred, r.obj) for r in r2.saturated.collect()}
    assert s1 == s2
    man = store.manifest("saturated")
    assert man["rows"] == len(s2)
