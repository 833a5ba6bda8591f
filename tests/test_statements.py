"""Reified statements (S3/S4) + constraint-rule generation (S5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from zelph_spark import datagen, statements
from zelph_spark.rules import Pattern


def _line(eid):
    ent = next(e for e in datagen.fixture_entities() if e["id"] == eid)
    return datagen.render_line(ent)


def test_parse_statements_qualified_claim_only():
    got = set(statements.parse_statements(_line("Q900")))
    sid = "Q900$P39-0"
    assert got == {
        ("Q900", "p:P39", sid),
        (sid, "ps:P39", "Q901"),
        (sid, "pq:P580", "+2001-01-01T00:00:00Z"),
        (sid, "pq:P582", "+2005-01-01T00:00:00Z"),
        (sid, "wikibase:rank", "wikibase:NormalRank"),
    }
    # the unqualified P39 claim and the P31 claim materialize nothing


def test_parse_statements_qualifier_filter():
    got = set(statements.parse_statements(_line("Q900"), {"P580"}))
    sid = "Q900$P39-0"
    assert (sid, "pq:P580", "+2001-01-01T00:00:00Z") in got
    assert not any(p == "pq:P582" for _, p, _ in got)


def test_parse_snak_value_kinds():
    mk = datagen._render_snak_body
    assert statements.parse_snak_value(mk("P1", ("item", "Q42"))) == "Q42"
    assert statements.parse_snak_value(
        mk("P1", ("time", "+2020-01-01T00:00:00Z"))) == "+2020-01-01T00:00:00Z"
    assert statements.parse_snak_value(mk("P1", ("quantity", "+42"))) == "+42"
    assert statements.parse_snak_value(mk("P1", ("string", "hello"))) == "hello"
    assert statements.parse_snak_value(mk("P1", ("somevalue",))) is None
    assert statements.parse_snak_value(mk("P1", ("novalue",))) is None


def test_extract_statements_distributed(spark, tmp_path):
    lines = [datagen.render_line(e) for e in datagen.fixture_entities()]
    f = tmp_path / "d.json"
    f.write_text("\n".join(lines))
    from zelph_spark.sources import dump

    ldf = dump.read_dump_lines(spark, str(f))
    st = statements.extract_statements(ldf)
    got = {(r.subj, r.pred, r.obj) for r in st.collect()}
    want = set()
    for e in datagen.fixture_entities():
        want |= set(statements.parse_statements(datagen.render_line(e)))
    assert got == want
    assert len(got) > 5


def test_constraint_rules(spark, tmp_path):
    lines = [datagen.render_line(e) for e in datagen.fixture_entities()]
    f = tmp_path / "d.json"
    f.write_text("\n".join(lines))
    from zelph_spark.sources import dump

    st = statements.extract_statements(dump.read_dump_lines(spark, str(f)))
    rules, table = statements.constraint_rules(st)
    by_id = {r.rule_id: r for r in rules}
    # conflicts-with: (I P9000 Y, I P31 Q5) => !
    cw = by_id["c-conflict-P9000-P31-Q5"]
    assert cw.is_contradiction
    assert cw.conditions == (
        Pattern("?I", "P9000", "?Y"), Pattern("?I", "P31", "Q5"))
    # none-of: (I P9001 Q902) => !
    no = by_id["c-noneof-P9001-Q902"]
    assert no.conditions == (Pattern("?I", "P9001", "Q902"),)
    kinds = {(r.rule_kind) for r in table.collect()}
    assert kinds == {"conflicts-with", "none-of"}
    # generated rules actually fire through the engine
    from zelph_spark.reasoning import evaluate_contradictions
    import pandas as pd

    edges = spark.createDataFrame(
        pd.DataFrame(
            [("x", "P9000", "y"), ("x", "P31", "Q5"), ("z", "P9001", "Q902")],
            columns=["subj", "pred", "obj"],
        )
    )
    cons = evaluate_contradictions(edges, rules)
    fired = {r.rule_id for r in cons.collect()}
    assert fired == {"c-conflict-P9000-P31-Q5", "c-noneof-P9001-Q902"}
