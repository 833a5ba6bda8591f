"""Stage 1 — triple / label / mention extraction from interleaved documents.

Spark-first re-expression of zelph's Wikidata importer
(``src/lib/wikidata/wikidata.cpp:659-896`` ``process_import``, entry scan
``:898-943``): one distributed pass over the ``documents`` table with an
Arrow-batched ``mapInPandas`` parser (regex scans run in C, batch transfer via
Arrow — no per-row Python boundary crossings), instead of the reference's
4-thread shared-memory worker pool (``read_async.cpp:286-544``).

Acceptance rules mirrored exactly (SURVEY.md §2.1 S1):
- a property array is scanned only when its FIRST claim is a value-mainsnak
  (the ``":[{"mainsnak":{"snaktype":"value"`` array-opener tag,
  ``wikidata.cpp:702-706``);
- only item-valued mainsnaks (``"entity-type":"item","numeric-id":<digits>``
  then ``,"id":"``) produce triples (``wikidata.cpp:731-775``);
- the en label is taken only from the labels window — after ``"labels":{``
  and before ``"aliases":{`` / ``"descriptions":{`` (``wikidata.cpp:676-699``);
- ids containing ``$`` (statement ids) are never nodes (``wikidata.cpp:392-396``).

Scale notes: the pass is embarrassingly parallel (no shuffle); downstream
consumers filter on ``row_kind``, so run :func:`extract_all` once, persist or
checkpoint, then split. Media spans are never touched — reassembly selects
``kind='text'`` spans only, and the pipeline carries the original ``spans``
column through untouched (span-sequence invariant, BASELINE.json input_hint).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# --- the reference's scan tags (wikidata.cpp:702-706), as compiled regex ---
_RE_ENTITY_ID = re.compile(r'"id":"([^"]*)"')
_RE_PROPERTY_ARRAY = re.compile(
    r'":\[\{"mainsnak":\{"snaktype":"value","property":"([^"]*)"'
)
# claim_value_tag: mainsnak item value for one property (wikidata.cpp:728-729)
_CLAIM_FMT = (
    r'"mainsnak":\{"snaktype":"value","property":"%s","datavalue":'
    r'\{"value":\{"entity-type":"item","numeric-id":(\d+),"id":"([^"]*)"'
)
_LABELS_OPEN = '"labels":{'
_ALIASES_OPEN = '"aliases":{'
_DESCRIPTIONS_OPEN = '"descriptions":{'
_EN_LABEL_TAG = '{"language":"%s","value":"'

_RE_TOKEN = re.compile(r"[a-z0-9]+")

EXTRACT_SCHEMA = (
    "doc_id string, row_kind string, subj string, pred string, obj string, "
    "lang string, name string, surface string, pos int"
)


def reassemble_text(docs: DataFrame) -> DataFrame:
    """(doc_id, spans) -> (doc_id, full_text): sort spans by offset, keep
    ``kind='text'``, concatenate. Pure built-in columnar ops (JVM-side);
    media spans are untouched by construction."""
    sorted_spans = F.array_sort(
        "spans",
        lambda l, r: F.when(l["offset"] < r["offset"], F.lit(-1))
        .when(l["offset"] > r["offset"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    text = F.array_join(
        F.transform(
            F.filter(sorted_spans, lambda s: s["kind"] == F.lit("text")),
            lambda s: s["text"],
        ),
        "",
    )
    return docs.withColumn("full_text", text)


def parse_entity_line(line: str, lang: str = "en") -> tuple[
    str | None, str | None, list[tuple[str, str]]
]:
    """Parse one dump line -> (entity_id, label, [(pred, obj), ...]).

    Faithful mirror of ``process_import`` (wikidata.cpp:659-896); see module
    docstring for the acceptance rules."""
    m = _RE_ENTITY_ID.search(line)
    if not m or "$" in m.group(1):
        return None, None, []
    entity_id = m.group(1)
    id1 = m.start()

    # --- label window (wikidata.cpp:676-699) ---
    label = None
    labels_pos = line.find(_LABELS_OPEN)
    tag = _EN_LABEL_TAG % lang
    language0 = line.find(tag, id1 + 7)
    if language0 != -1 and labels_pos != -1 and language0 > labels_pos:
        aliases_pos = line.find(_ALIASES_OPEN, id1 + 7)
        if aliases_pos == -1 or language0 < aliases_pos:
            desc_pos = line.find(_DESCRIPTIONS_OPEN, id1 + 7)
            if desc_pos == -1 or language0 < desc_pos:
                end = line.find('"', language0 + len(tag) + 1)
                if end != -1:
                    label = line[language0 + len(tag) : end]

    # --- claims (wikidata.cpp:712-862) ---
    triples: list[tuple[str, str]] = []
    props = list(_RE_PROPERTY_ARRAY.finditer(line, id1 + 1))
    for i, pm in enumerate(props):
        prop = pm.group(1)
        if not prop or prop[0] != "P":
            # reference throws on malformed property (wikidata.cpp:720-723);
            # we skip the line defensively (documented divergence: a throw
            # would fail the whole import batch).
            return entity_id, label, []
        boundary = props[i + 1].start() if i + 1 < len(props) else len(line)
        claim_re = re.compile(_CLAIM_FMT % re.escape(prop))
        for cm in claim_re.finditer(line, pm.start(), boundary):
            obj = cm.group(2)
            if "$" not in obj:
                triples.append((prop, obj))
    return entity_id, label, triples


def extract_mentions(body: str, max_ngram: int = 3) -> list[tuple[str, int]]:
    """Python mirror of the JVM mention construction in :func:`mentions`
    (kept as the differential test oracle): lowercase word n-grams
    (1..max_ngram) with the START TOKEN INDEX as position. ``pos`` only
    identifies the mention *site* — the linking window partitions by
    (doc_id, pos) — and token index is bijective with the first token's
    char offset, so site semantics are unchanged."""
    tokens = _RE_TOKEN.findall(body.lower())
    out = []
    for n in range(1, max_ngram + 1):
        for i in range(len(tokens) - n + 1):
            out.append((" ".join(tokens[i : i + n]), i))
    return out


def extract_all(docs: DataFrame, lang: str = "en", with_mentions: bool = True) -> DataFrame:
    """One distributed extraction pass. Output rows are tagged by
    ``row_kind``: 'triple' (subj,pred,obj), 'label' (lang,name on subj),
    'mention' (surface,pos). Run once, persist, split by filter."""

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, full in zip(pdf["doc_id"], pdf["full_text"]):
                nl = full.find("\n")
                claim_line = full if nl == -1 else full[:nl]
                body = "" if nl == -1 else full[nl + 1 :]
                eid, label, triples = parse_entity_line(claim_line, lang)
                if eid is None:
                    continue
                for pred, obj in triples:
                    rows.append((doc_id, "triple", eid, pred, obj, None, None, None, 0))
                if label is not None:
                    rows.append((doc_id, "label", eid, None, None, lang, label, None, 0))
                if with_mentions and body:
                    # ONE row per doc carrying the body: the high-fanout
                    # n-gram expansion (~3x tokens rows per doc) happens
                    # JVM-side in :func:`mentions`, not in Python — this
                    # pass only attributes the body to its accepted entity.
                    rows.append((doc_id, "entity", eid, None, None, None, None, body, 0))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "row_kind", "subj", "pred", "obj",
                    "lang", "name", "surface", "pos",
                ],
            )

    return reassemble_text(docs).select("doc_id", "full_text").mapInPandas(
        scan, schema=EXTRACT_SCHEMA
    )


def triples(extracted: DataFrame) -> DataFrame:
    """(subj, pred, obj, src_doc) string triples from an extract_all pass."""
    return (
        extracted.filter(F.col("row_kind") == "triple")
        .select("subj", "pred", "obj", F.col("doc_id").alias("src_doc"))
    )


def labels(extracted: DataFrame) -> DataFrame:
    """names-table rows (node, lang, name) — analog of zelph's per-language
    name maps (``zelph.hpp:43-44``)."""
    return (
        extracted.filter(F.col("row_kind") == "label")
        .select(F.col("subj").alias("node"), "lang", "name")
    )


def mentions(extracted: DataFrame, max_ngram: int = 3) -> DataFrame:
    """Candidate mention surfaces: lowercase word n-grams (1..max_ngram)
    with start-token-index positions, built ENTIRELY JVM-side from the
    per-doc 'entity' rows — tokenization via regexp_extract_all, n-grams via
    transform(sequence)+slice (the word_shingles construction). Candidate
    *generation* only — linking resolves against the broadcast QID
    dictionary (the scored analog of zelph's name-map lookup,
    ``zelph.cpp:117-187``). The round-1 version built these rows in per-row
    Python inside mapInPandas — the highest-fanout extraction output."""
    ent = extracted.filter(F.col("row_kind") == "entity").select(
        "doc_id",
        F.col("subj").alias("src_entity"),
        F.regexp_extract_all(F.lower("surface"), F.lit("[a-z0-9]+"), 0).alias(
            "toks"
        ),
    )
    n_tok = F.size("toks")
    empty = F.array().cast("array<struct<surface:string,pos:int>>")

    def gram_expr(n):
        # single-arg lambda only: a second parameter would make pyspark pass
        # the transform() element INDEX into it
        return F.when(
            n_tok >= n,
            F.transform(
                F.sequence(F.lit(0), n_tok - n),
                lambda i: F.struct(
                    F.array_join(F.slice("toks", i + 1, n), " ").alias("surface"),
                    i.cast("int").alias("pos"),
                ),
            ),
        ).otherwise(empty)

    grams = [gram_expr(n) for n in range(1, max_ngram + 1)]
    return ent.select(
        "doc_id", "src_entity", F.explode(F.concat(*grams)).alias("g")
    ).select("doc_id", "src_entity", F.col("g.surface").alias("surface"), F.col("g.pos").alias("pos"))
