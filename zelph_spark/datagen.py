"""Deterministic synthetic fixtures for the KG-construction pipeline.

Produces the driver-contract input shape (BASELINE.json ``input_hint``):

    documents(doc_id string,
              spans array<struct<kind string, text string,
                                 media_ref string, offset int>>)

Each document is one Wikidata-style entity: its text spans concatenate to a
dump line in the exact JSON shape zelph's importer scans
(``src/lib/wikidata/wikidata.cpp:659-896`` — property arrays, item-valued
mainsnaks, label windows), followed by a newline and a free-text body with
entity mentions for the linking stage. Media spans are interleaved at
deterministic positions and must pass through every stage untouched
(span-sequence invariant: kind, text, media_ref, order).

Two generators:
- :func:`fixture_docs` — small hand-designed corpus covering every extraction
  acceptance rule, every wikidata.zph inference rule, linking ambiguity and
  canonicalization merges; returns pandas frames + golden triples.
- :func:`synthetic_corpus` — distributed, scale-free generator (mapInPandas
  over ``spark.range``) for throughput benches; never materializes on the
  driver.
"""

from __future__ import annotations

import json
import random

import pandas as pd

# ---------------------------------------------------------------------------
# Rendering helpers: structured claims -> Wikidata dump-line JSON
# ---------------------------------------------------------------------------


def _render_snak_body(prop: str, snak: tuple) -> str:
    """The snak object itself ({"snaktype":...}) — shared by mainsnaks and
    qualifier snaks."""
    kind = snak[0]
    if kind == "item":
        qid = snak[1]
        numeric = qid[1:] if qid[1:].isdigit() else "0"
        return (
            '{"snaktype":"value","property":"%s","datavalue":'
            '{"value":{"entity-type":"item","numeric-id":%s,"id":"%s"},'
            '"type":"wikibase-entityid"},"datatype":"wikibase-item"}'
            % (prop, numeric, qid)
        )
    if kind in ("somevalue", "novalue"):
        return (
            '{"snaktype":"%s","property":"%s","datatype":"wikibase-item"}'
            % (kind, prop)
        )
    if kind == "string":
        return (
            '{"snaktype":"value","property":"%s","datavalue":'
            '{"value":%s,"type":"string"},"datatype":"string"}'
            % (prop, json.dumps(snak[1]))
        )
    if kind == "time":
        return (
            '{"snaktype":"value","property":"%s","datavalue":'
            '{"value":{"time":"%s","precision":11},"type":"time"},'
            '"datatype":"time"}' % (prop, snak[1])
        )
    if kind == "quantity":
        return (
            '{"snaktype":"value","property":"%s","datavalue":'
            '{"value":{"amount":"%s","unit":"1"},"type":"quantity"},'
            '"datatype":"quantity"}' % (prop, snak[1])
        )
    raise ValueError(f"unknown snak kind {kind}")


def _render_snak(prop: str, snak: tuple, quals: list | None = None,
                 stmt_id: str | None = None, rank: str = "normal") -> str:
    """One claim object. ``quals`` = [(qprop, snak), ...] renders a
    qualifiers block; ``stmt_id`` renders the statement id (required for the
    qualifier-import path, wikidata.cpp:1322); ``rank`` is the statement
    rank (normal/preferred/deprecated)."""
    parts = ['"mainsnak":' + _render_snak_body(prop, snak)]
    if quals:
        groups: dict[str, list] = {}
        for qprop, qsnak in quals:
            groups.setdefault(qprop, []).append(qsnak)
        q = ",".join(
            '"%s":[%s]' % (qp, ",".join(_render_snak_body(qp, s) for s in snaks))
            for qp, snaks in groups.items()
        )
        parts.append('"qualifiers":{%s}' % q)
    parts.append('"type":"statement"')
    if stmt_id:
        parts.append('"id":"%s"' % stmt_id)
    parts.append('"rank":"%s"' % rank)
    return "{%s}" % ",".join(parts)


def render_line(ent: dict) -> str:
    """Render one entity to a dump line (the format wikidata.cpp tag-scans)."""
    parts = ['"type":"item"', '"id":"%s"' % ent["id"]]
    labels = ent.get("labels", {})
    lbl = ",".join(
        '"%s":{"language":"%s","value":%s}' % (lang, lang, json.dumps(v))
        for lang, v in labels.items()
    )
    parts.append('"labels":{%s}' % lbl)
    desc = ent.get("descriptions", {})
    d = ",".join(
        '"%s":{"language":"%s","value":%s}' % (lang, lang, json.dumps(v))
        for lang, v in desc.items()
    )
    parts.append('"descriptions":{%s}' % d)
    aliases = ent.get("aliases", {})
    a = ",".join(
        '"%s":[%s]'
        % (
            lang,
            ",".join(
                '{"language":"%s","value":%s}' % (lang, json.dumps(v)) for v in vals
            ),
        )
        for lang, vals in aliases.items()
    )
    parts.append('"aliases":{%s}' % a)
    # claims: (prop, snak) / (prop, snak, qualifiers) / (prop, snak,
    # qualifiers, rank) tuples; grouped per property preserving order.
    # Claims with qualifiers get statement ids.
    groups: dict[str, list] = {}
    for claim in ent.get("claims", []):
        prop, snak = claim[0], claim[1]
        quals = claim[2] if len(claim) > 2 else None
        rank = claim[3] if len(claim) > 3 else "normal"
        groups.setdefault(prop, []).append((snak, quals, rank))
    c = ",".join(
        '"%s":[%s]'
        % (
            prop,
            ",".join(
                _render_snak(
                    prop,
                    s,
                    quals=q,
                    stmt_id=f"{ent['id']}${prop}-{i}" if q else None,
                    rank=rk,
                )
                for i, (s, q, rk) in enumerate(snaks)
            ),
        )
        for prop, snaks in groups.items()
    )
    parts.append('"claims":{%s}' % c)
    parts.append('"sitelinks":{}')
    return "{%s}" % ",".join(parts)


def golden_extract(ent: dict) -> list[tuple[str, str, str]]:
    """Expected (subj, pred, obj) triples per the reference acceptance rules,
    computed from the *structured* claims (independent of the renderer+parser
    path): item-valued mainsnaks only, and a property whose FIRST claim is not
    a value snak is skipped entirely (the ``":[{"mainsnak":{"snaktype":"value"``
    array-opener tag, ``wikidata.cpp:702-706,731-741``)."""
    out = []
    groups: dict[str, list] = {}
    for claim in ent.get("claims", []):
        groups.setdefault(claim[0], []).append(claim[1])
    for prop, snaks in groups.items():
        if not snaks or snaks[0][0] not in ("item", "string", "time", "quantity"):
            continue  # first claim is somevalue/novalue -> property array tag absent
        if snaks[0][0] != "item":
            # property_tag only matches when the first mainsnak is a *value*
            # snak; non-item datavalues still open the array, but the
            # claim_value_tag (entity-type item) will not match them.
            pass
        for snak in snaks:
            if snak[0] == "item":
                out.append((ent["id"], prop, snak[1]))
    return out


def golden_label(ent: dict) -> str | None:
    """Expected en label per the label-window rule (wikidata.cpp:676-699):
    the ``{"language":"en","value":...}`` tag must occur inside the labels
    object — i.e. after ``"labels":{`` and before ``"aliases":{`` /
    ``"descriptions":{`` when those exist."""
    return ent.get("labels", {}).get("en")


# ---------------------------------------------------------------------------
# Span splitting (interleaved text + media)
# ---------------------------------------------------------------------------


def split_into_spans(
    doc_id: str, full_text: str, rng: random.Random, media_every: int = 3
) -> list[dict]:
    """Split ``full_text`` into text spans at deterministic boundaries and
    interleave media spans. ``offset`` is the position in a virtual stream
    (media counts as one unit), strictly increasing — sorting by offset
    reconstructs the original sequence."""
    spans = []
    pos = 0
    vpos = 0
    n_media = 0
    chunk_idx = 0
    while pos < len(full_text):
        size = rng.randint(40, 160)
        chunk = full_text[pos : pos + size]
        spans.append(
            {"kind": "text", "text": chunk, "media_ref": "", "offset": vpos}
        )
        vpos += len(chunk)
        pos += size
        chunk_idx += 1
        if chunk_idx % media_every == 0 and pos < len(full_text):
            spans.append(
                {
                    "kind": "media",
                    "text": "",
                    "media_ref": f"img://{doc_id}/{n_media}",
                    "offset": vpos,
                }
            )
            vpos += 1
            n_media += 1
    if not spans:
        spans.append({"kind": "text", "text": "", "media_ref": "", "offset": 0})
    return spans


def entity_to_doc(ent: dict, rng: random.Random) -> dict:
    body = ent.get("body", "")
    full_text = render_line(ent) + "\n" + body
    return {"doc_id": ent["id"], "spans": split_into_spans(ent["id"], full_text, rng)}


# ---------------------------------------------------------------------------
# Hand-designed correctness fixture
# ---------------------------------------------------------------------------

# Property entities themselves (wikidata facts noted at wikidata.zph:17-22):
# P279/P527/P1269/P361 are transitive relations; P361 is inverse of P527.
_PROPERTY_ENTITIES = [
    {
        "id": "P279",
        "labels": {"en": "is subclass of"},
        "claims": [("P31", ("item", "Q18647515"))],
    },
    {
        "id": "P527",
        "labels": {"en": "has part"},
        "claims": [("P31", ("item", "Q18647515"))],
    },
    {
        "id": "P1269",
        "labels": {"en": "is facet of"},
        "claims": [("P31", ("item", "Q18647515"))],
    },
    {
        "id": "P361",
        "labels": {"en": "is part of"},
        "claims": [
            ("P31", ("item", "Q18647515")),
            ("P1696", ("item", "P527")),
        ],
    },
]


def fixture_entities() -> list[dict]:
    """Entity corpus exercising every extraction rule and every wikidata.zph
    inference rule (see golden_* and tests/test_reasoning.py)."""
    ents = list(_PROPERTY_ENTITIES)
    # --- taxonomy chain: subclass-lift + transitive subclass -------------
    ents += [
        {
            "id": "Q35120",
            "labels": {"en": "entity"},
            "claims": [],
            "body": "The most general thing.",
        },
        {
            "id": "Q215627",
            "labels": {"en": "person"},
            "claims": [("P279", ("item", "Q35120"))],
        },
        {
            "id": "Q5",
            "labels": {"en": "human"},
            "aliases": {"en": ["homo sapiens"]},
            "claims": [("P279", ("item", "Q215627"))],
        },
        {
            "id": "Q100",
            "labels": {"en": "Alpha"},
            "descriptions": {"en": "a fixture human"},
            "claims": [("P31", ("item", "Q5"))],
            "body": "Alpha works with Beta near the Gamma building.",
        },
        # --- parts: transitive has-part + inverse swap -------------------
        {
            "id": "Q210",
            "labels": {"en": "engine"},
            "claims": [("P527", ("item", "Q211"))],
        },
        {
            "id": "Q211",
            "labels": {"en": "piston"},
            "claims": [("P527", ("item", "Q212"))],
        },
        {"id": "Q212", "labels": {"en": "piston ring"}, "claims": []},
        {
            "id": "Q213",
            "labels": {"en": "car"},
            "claims": [("P527", ("item", "Q210"))],
            "body": "A car contains an engine.",
        },
        # --- opposites: symmetry + opposite-quality contradiction --------
        {
            "id": "Q201",
            "labels": {"en": "hot"},
            "claims": [("P461", ("item", "Q202"))],
        },
        {"id": "Q202", "labels": {"en": "cold"}, "claims": []},
        {
            "id": "Q203",
            "labels": {"en": "lukewarm soup"},
            "claims": [
                ("P1552", ("item", "Q201")),
                ("P1552", ("item", "Q202")),  # -> opposite-quality contradiction
            ],
        },
        # --- facet rules --------------------------------------------------
        {
            "id": "Q401",
            "labels": {"en": "economy of Beta"},
            "claims": [("P1269", ("item", "Q402"))],
        },
        {
            "id": "Q402",
            "labels": {"en": "Beta"},
            "aliases": {"en": ["Beta City"]},
            "claims": [
                ("P31", ("item", "Q35120")),
                ("P527", ("item", "Q403")),
            ],
        },
        {"id": "Q403", "labels": {"en": "Beta harbor"}, "claims": []},
        # --- instance/subclass cycle contradictions ----------------------
        {
            "id": "Q501",
            "labels": {"en": "ouro"},
            "claims": [("P31", ("item", "Q502"))],
        },
        {
            "id": "Q502",
            "labels": {"en": "boros"},
            "claims": [("P31", ("item", "Q501"))],
        },
        # (X ~ A, X subclass B) => ! : Q503 is both instance and subclass
        {
            "id": "Q503",
            "labels": {"en": "confused"},
            "claims": [
                ("P31", ("item", "Q35120")),
                ("P279", ("item", "Q35120")),
            ],
        },
        # --- quality propagation -----------------------------------------
        {
            "id": "Q600",
            "labels": {"en": "sports car"},
            "claims": [
                ("P279", ("item", "Q213")),
                ("P1552", ("item", "Q601")),
            ],
        },
        {
            "id": "Q601",
            "labels": {"en": "fast"},
            "claims": [("P279", ("item", "Q602"))],
        },
        {"id": "Q602", "labels": {"en": "speedy"}, "claims": []},
        # --- extraction traps --------------------------------------------
        # T1: property whose FIRST claim is somevalue -> whole array skipped
        {
            "id": "Q700",
            "labels": {"en": "Gamma"},
            "claims": [
                ("P361", ("somevalue",)),
                ("P361", ("item", "Q402")),  # must NOT be extracted
                ("P31", ("item", "Q35120")),
            ],
            "body": "Gamma is a district of Beta.",
        },
        # T2: non-item datavalues are ignored; later item claims of the SAME
        # property still extract (first claim is a value snak -> tag matches)
        {
            "id": "Q701",
            "labels": {"en": "Delta"},
            "claims": [
                ("P1476", ("string", "a title, not an item")),
                ("P580", ("time", "+2020-01-01T00:00:00Z")),
                ("P1114", ("quantity", "+42")),
                ("P31", ("item", "Q35120")),
            ],
        },
        # T3: en tag ONLY inside aliases -> label must NOT be extracted
        {
            "id": "Q702",
            "labels": {"de": "Falle"},
            "aliases": {"en": ["TrapAlias"]},
            "claims": [("P31", ("item", "Q35120"))],
        },
        # T4: no en label at all, descriptions carry an en value
        {
            "id": "Q703",
            "labels": {},
            "descriptions": {"en": "described but unnamed"},
            "claims": [("P31", ("item", "Q35120"))],
        },
        # --- reified statements (qualifier import, S3) --------------------
        # Q900 held a position (P39) with start/end time qualifiers; one
        # unqualified claim that must NOT materialize a statement.
        {
            "id": "Q900",
            "labels": {"en": "office holder"},
            "claims": [
                (
                    "P39",
                    ("item", "Q901"),
                    [
                        ("P580", ("time", "+2001-01-01T00:00:00Z")),
                        ("P582", ("time", "+2005-01-01T00:00:00Z")),
                    ],
                ),
                ("P39", ("item", "Q902")),  # no qualifiers -> no statement
                ("P31", ("item", "Q5")),
            ],
        },
        {"id": "Q901", "labels": {"en": "mayor"}, "claims": []},
        # property with constraint statements (S5): P9000 conflicts with
        # P31=Q5; P9001 forbids value Q902 (none-of)
        {
            "id": "P9000",
            "labels": {"en": "fictional prop"},
            "claims": [
                (
                    "P2302",
                    ("item", "Q21502838"),
                    [
                        ("P2306", ("item", "P31")),
                        ("P2305", ("item", "Q5")),
                    ],
                ),
            ],
        },
        {
            "id": "P9001",
            "labels": {"en": "restricted prop"},
            "claims": [
                (
                    "P2302",
                    ("item", "Q52558054"),
                    [("P2305", ("item", "Q902"))],
                ),
            ],
        },
        # --- canonicalization: same-as pairs (P2888 exact-match style) ----
        {
            "id": "Q800",
            "labels": {"en": "Epsilon"},
            "claims": [
                ("P31", ("item", "Q5")),
                ("P2888", ("item", "Q801")),
            ],
        },
        {
            "id": "Q801",
            "labels": {"en": "Epsilon (duplicate)"},
            "claims": [("P2888", ("item", "Q802"))],
        },
        {
            "id": "Q802",
            "labels": {"en": "Epsilon (triplicate)"},
            "claims": [("P527", ("item", "Q211"))],
        },
    ]
    return ents


def fixture_docs(seed: int = 42) -> pd.DataFrame:
    rng = random.Random(seed)
    docs = [entity_to_doc(e, rng) for e in fixture_entities()]
    return pd.DataFrame(docs)


def fixture_golden_triples() -> pd.DataFrame:
    rows = []
    for ent in fixture_entities():
        for s, p, o in golden_extract(ent):
            rows.append({"stage": "extract", "subj": s, "pred": p, "obj": o,
                         "src_doc": ent["id"]})
    return pd.DataFrame(rows)


def fixture_golden_labels() -> pd.DataFrame:
    rows = []
    for ent in fixture_entities():
        lbl = golden_label(ent)
        if lbl is not None:
            rows.append({"node": ent["id"], "lang": "en", "name": lbl})
    return pd.DataFrame(rows)


def fixture_qid_dictionary() -> pd.DataFrame:
    """Broadcast-side linking dictionary (FIXTURES.md §2): labels + aliases
    of fixture entities, deliberate ambiguity on 'Beta' (city Q402 vs a
    distractor Q998) and a zero-prior distractor for threshold tests."""
    rows = []
    for ent in fixture_entities():
        lbl = golden_label(ent)
        if lbl:
            rows.append(
                {"surface": lbl.lower(), "qid": ent["id"], "lang": "en",
                 "prior": 0.9}
            )
        for al in ent.get("aliases", {}).get("en", []):
            rows.append(
                {"surface": al.lower(), "qid": ent["id"], "lang": "en",
                 "prior": 0.6}
            )
    rows += [
        {"surface": "beta", "qid": "Q998", "lang": "en", "prior": 0.2},
        {"surface": "gamma", "qid": "Q999", "lang": "en", "prior": 0.1},
        {"surface": "alpha", "qid": "Q997", "lang": "en", "prior": 0.05},
    ]
    df = pd.DataFrame(rows).drop_duplicates(subset=["surface", "qid"])
    return df.sort_values(["surface", "qid"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Distributed scale generator (bench path)
# ---------------------------------------------------------------------------

SPANS_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def synthetic_corpus(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    """Scale-free corpus: entity Q{i} with deterministic claims referencing
    Q{(i*k) % n}-style neighbors — generated distributedly via mapInPandas,
    never on the driver. Used by bench.py for docs/sec + scaling runs."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism

    def gen(iterator):
        for pdf in iterator:
            out = []
            for i in pdf["id"]:
                i = int(i)
                rng = random.Random((seed << 20) ^ i)
                eid = f"Q{i + 1000}"
                claims = [("P31", ("item", f"Q{(i % 97) + 10}"))]
                if i % 3 == 0:
                    claims.append(("P279", ("item", f"Q{((i + 1) % 997) + 1000}")))
                if i % 5 == 0:
                    claims.append(("P527", ("item", f"Q{((i * 7) % 9973) + 1000}")))
                if i % 11 == 0:
                    claims.append(("P461", ("item", f"Q{((i * 3) % 9973) + 1000}")))
                if i % 7 == 0:
                    claims.append(("P1476", ("string", f"title {i}")))
                ent = {
                    "id": eid,
                    "labels": {"en": f"entity {i}"},
                    "aliases": {"en": [f"e{i}"]} if i % 2 == 0 else {},
                    "claims": claims,
                    "body": f"entity {i} links to entity {(i + 1) % n_docs} and "
                    f"entity {(i * 13) % n_docs}.",
                }
                doc = entity_to_doc(ent, rng)
                out.append(doc)
            yield pd.DataFrame(out)

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, schema=SPANS_SCHEMA)
    )
