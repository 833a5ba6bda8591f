"""Core vocabulary and schema constants.

Mirrors zelph's ten predefined core nodes (reference ``zelph.hpp:248-260``,
named in ``interactive.cpp:57-66``) and the Wikidata names bound by
``stdlib/examples/wikidata/wikidata.zph:3-15``. Node identity in this engine
is a deterministic 64-bit hash of the canonical (lang, name) pair — the
columnar analog of zelph's interned name maps (``zelph.cpp:117-187``); fact
identity is ``xxhash64(pred, subj, obj)``, the analog of zelph's hash-consed
relation nodes (``network.hpp:474-483``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

# --- zelph core vocabulary (zelph.hpp:248-260 / interactive.cpp:57-66) ----
RELATION_TYPE = "->"  # RelationTypeCategory, wikidata Q130901
CAUSES = "=>"  # Causes,                wikidata Q374182
IS_A = "~"  # IsA,                   wikidata P31
UNEQUAL = "!="
CONTRADICTION = "!"  # wikidata Q363948
PART_OF = "in"
CONJUNCTION = "conjunction"
NEGATION = "negation"

# --- wikidata.zph:3-15 name bindings (zelph name → wikidata id) -----------
WD = {
    CONTRADICTION: "Q363948",
    IS_A: "P31",
    "is subclass of": "P279",
    "is facet of": "P1269",
    CAUSES: "Q374182",
    RELATION_TYPE: "Q130901",
    "is part of": "P361",
    "has part": "P527",
    "is opposite of": "P461",
    "is inverse of": "P1696",
    "has quality": "P1552",
    "is for example": "Q21514624",
    "transitive relation": "Q18647515",
}

# Convenience aliases used by the ruleset and tests.
P_INSTANCE_OF = "P31"
P_SUBCLASS = "P279"
P_FACET = "P1269"
P_PART_OF = "P361"
P_HAS_PART = "P527"
P_OPPOSITE = "P461"
P_INVERSE = "P1696"
P_HAS_QUALITY = "P1552"
Q_TRANSITIVE = "Q18647515"

EDGE_COLS = ("subj", "pred", "obj")


def node_id(name_col, lang_col=None):
    """Deterministic 64-bit node id for a (lang, name) pair.

    Columnar analog of zelph's get-or-create ``node()`` (``zelph.cpp:117-187``):
    the same name always maps to the same id on every executor with no shared
    state, which is what makes massively parallel extraction embarrassingly
    parallel. Collision odds at 1e9 nodes are ~n^2/2^65 — the same 64-bit
    hash-consing exposure the reference accepts (``network_types.hpp:41``).
    """
    if lang_col is None:
        lang_col = F.lit("wikidata")
    # Sign bit cleared: negative ids are reserved for reasoning-minted fresh
    # nodes (compiler.project_consequence), so a minted id can never collide
    # with an imported one — the analog of the reference keeping variable ids
    # in a top-bit range (network_types.hpp:44).
    return F.xxhash64(lang_col, name_col).bitwiseAND(
        F.lit(0x7FFFFFFFFFFFFFFF)
    )


def fact_id(subj_col, pred_col, obj_col):
    """Deterministic fact id = hash of (pred, subj, obj).

    Analog of zelph's hash-consed relation node (``network.hpp:474-483``):
    identical triples get identical ids, so idempotent insertion is a
    ``dropDuplicates``/MERGE on this key instead of a shared-memory probe.
    """
    return F.xxhash64(pred_col, subj_col, obj_col)
