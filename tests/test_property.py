"""Property-based tests (hypothesis) over the pure-Python kernels the
distributed plans wrap: the dump-line extraction kernel that runs inside the
Arrow UDF (extract.parse_entity_line mirrors wikidata.cpp:659-896), the
mention n-gram oracle, the SPARQL tokenizer, and the JVM memory-size
normalizer. No SparkSession — these pin kernel totality/determinism on
adversarial inputs that example-based tests cannot enumerate (the 100 TB
argument for the extract stage is precisely "any byte garbage in a dump
line must not kill the executor batch")."""

from __future__ import annotations

import re

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

from zelph_spark.extract import extract_mentions, parse_entity_line
from zelph_spark.session import _jvm_size
from zelph_spark.sparql import SparqlError, _tokenize

# keep CI cheap and deterministic: bounded examples, no wall-clock deadline
# (a loaded sandbox must not flake a property that is about VALUES)
COMMON = settings(max_examples=200, deadline=None)


# --- extract.parse_entity_line -------------------------------------------


@COMMON
@given(st.text(max_size=400))
def test_parse_entity_line_total_and_deterministic(line):
    """Arbitrary text never raises (a throw inside the Arrow batch would
    fail the whole executor task — documented divergence from the
    reference's throw, wikidata.cpp:720-723) and is pure."""
    r1 = parse_entity_line(line)
    r2 = parse_entity_line(line)
    assert r1 == r2
    eid, label, triples = r1
    for pred, obj in triples:
        assert pred.startswith("P")
        assert "$" not in obj
    if eid is not None:
        assert "$" not in eid


_ids = st.integers(min_value=1, max_value=10**9)


def _dump_line(qid: int, label: str | None, claims: list[tuple[int, int]]) -> str:
    """Minimal well-formed dump line in the exact shape the reference scans
    (entity id, optional en label, one single-claim property array per
    claim)."""
    parts = [f'{{"type":"item","id":"Q{qid}"']
    if label is not None:
        parts.append(
            f',"labels":{{"en":{{"language":"en","value":"{label}"}}}}'
        )
    if claims:
        claim_strs = []
        for p, o in claims:
            claim_strs.append(
                f'"P{p}":[{{"mainsnak":{{"snaktype":"value",'
                f'"property":"P{p}","datavalue":{{"value":'
                f'{{"entity-type":"item","numeric-id":{o},"id":"Q{o}"}},'
                f'"type":"wikibase-entityid"}}}},"rank":"normal"}}]'
            )
        parts.append(',"claims":{' + ",".join(claim_strs) + "}")
    parts.append("}")
    return "".join(parts)


@COMMON
@given(
    qid=_ids,
    label=st.one_of(
        st.none(),
        st.text(
            alphabet=st.characters(
                codec="ascii", exclude_characters='"\\{}$', min_codepoint=32
            ),
            min_size=1,
            max_size=30,
        ),
    ),
    claims=st.lists(st.tuples(_ids, _ids), max_size=6, unique_by=lambda c: c[0]),
)
def test_parse_entity_line_roundtrips_planted_claims(qid, label, claims):
    """A well-formed line yields exactly the planted entity/label/claims —
    the P/R=1.0 extraction property, quantified over random inputs instead
    of the fixed golden fixture."""
    line = _dump_line(qid, label, claims)
    eid, got_label, triples = parse_entity_line(line)
    assert eid == f"Q{qid}"
    assert got_label == label
    assert triples == [(f"P{p}", f"Q{o}") for p, o in claims]


@COMMON
@given(
    qid=_ids,
    claims=st.lists(st.tuples(_ids, _ids), max_size=4, unique_by=lambda c: c[0]),
)
def test_parse_entity_line_skips_dollar_objects(qid, claims):
    """Objects containing '$' (statement GUIDs leaking into the id slot) are
    dropped claim-by-claim, mirroring the reference's guard."""
    claims = [(p, o) for p, o in claims if o != qid]
    line = _dump_line(qid, None, claims)
    line = line.replace(f'"id":"Q{claims[0][1]}"', '"id":"Q$bad"', 1) if claims else line
    eid, _, triples = parse_entity_line(line)
    assert eid == f"Q{qid}"
    assert all("$" not in o for _, o in triples)


# --- extract.extract_mentions ---------------------------------------------


@COMMON
@given(st.text(max_size=200), st.integers(min_value=1, max_value=4))
def test_extract_mentions_positions_are_faithful(body, max_ngram):
    toks = re.findall(r"[a-z0-9]+", body.lower())
    out = extract_mentions(body, max_ngram=max_ngram)
    expected_count = sum(
        max(0, len(toks) - n + 1) for n in range(1, max_ngram + 1)
    )
    assert len(out) == expected_count
    for surface, i in out:
        n = surface.count(" ") + 1
        assert n <= max_ngram
        assert " ".join(toks[i : i + n]) == surface


# --- sparql tokenizer ------------------------------------------------------


@COMMON
@given(st.text(max_size=200))
def test_sparql_tokenizer_total_or_sparql_error(text):
    """The tokenizer either tokenizes or raises SparqlError — never any
    other exception type (a stray ValueError would surface as an opaque
    driver crash instead of a query error)."""
    try:
        toks = _tokenize(text)
    except SparqlError:
        return
    assert isinstance(toks, list)
    assert all(isinstance(k, str) and isinstance(v, str) for k, v in toks)


# --- session._jvm_size -----------------------------------------------------


@COMMON
@given(
    n=st.integers(min_value=1, max_value=10**6),
    suffix=st.sampled_from(["", "k", "m", "g", "t", "K", "M", "G", "T"]),
    b=st.sampled_from(["", "b", "B"]),
    pad_l=st.text(alphabet=" ", max_size=3),
    pad_r=st.text(alphabet=" ", max_size=3),
)
def test_jvm_size_normalizes_every_spark_legal_form(n, suffix, b, pad_l, pad_r):
    out = _jvm_size(f"{pad_l}{n}{suffix}{b}{pad_r}")
    assert re.fullmatch(r"[0-9]+[kmgt]?", out)
    assert out == f"{n}{suffix.lower()}"
    # idempotent: the normalized form is itself accepted
    assert _jvm_size(out) == out


@COMMON
@given(st.text(max_size=20))
def test_jvm_size_rejects_garbage_rather_than_emitting_bad_flags(s):
    if re.fullmatch(r"\s*[0-9]+\s*[kKmMgGtT]?[bB]?\s*", s):
        assert re.fullmatch(r"[0-9]+[kmgt]?", _jvm_size(s))
    else:
        with pytest.raises(ValueError):
            _jvm_size(s)
