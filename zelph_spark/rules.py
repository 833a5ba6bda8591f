"""Rule model + the signature Wikidata ruleset.

zelph stores rules *as graph data* (homoiconicity — a rule is a
``fact(condition, core.Causes, consequences)``, ``mkdocs/docs/logic.md:59-61``)
and parses them back per evaluation (``reasoning.cpp:213-276`` apply_rule).
In the Spark engine rules are plain data compiled to join chains
(SURVEY.md §2.4 R2): variables become join keys, never materialized nodes —
the relational lowering of zelph's top-bit variable ids
(``network.hpp:405-408``).

The ruleset below is the full ``stdlib/examples/wikidata/wikidata.zph:25-87``
translated into wikidata-id space (the .zph name bindings at lines 3-15):
22 deduction rules + 24 contradiction rules, plus the two base facts the
script asserts that are not part of Wikidata itself (lines 25, 34).

Fresh-variable consequences (variables appearing only in the consequence,
``reasoning_deduce.cpp:48-126``) are supported (R6): the compiler mints a
deterministic hashed id per distinct consequence instantiation, shared
across all consequences of the rule, guarded by an existence anti-join —
see ``reasoning/compiler.py`` ``project_consequence``. The Wikidata
ruleset itself has none.
"""

from __future__ import annotations

from dataclasses import dataclass

# wikidata-id vocabulary (config.WD, wikidata.zph:3-15)
ISA = "P31"  # ~
SUB = "P279"  # is subclass of
FACET = "P1269"  # is facet of
PART_OF = "P361"
HAS_PART = "P527"
OPP = "P461"  # is opposite of
INV = "P1696"  # is inverse of
QUAL = "P1552"  # has quality
FOR_EXAMPLE = "Q21514624"
TRANSITIVE = "Q18647515"


def is_var(term) -> bool:
    """Terms are strings ('?X' variables, constant names) in the surface
    ruleset, or int64 node ids after :func:`resolve_rules` — the long-id
    fixpoint path over the materialized edge table (8-byte join keys beat
    string keys at shuffle time)."""
    return isinstance(term, str) and term.startswith("?")


@dataclass(frozen=True)
class Pattern:
    subj: str
    pred: str
    obj: str

    @property
    def variables(self) -> set[str]:
        return {t for t in (self.subj, self.pred, self.obj) if is_var(t)}


@dataclass(frozen=True)
class Rule:
    rule_id: str
    conditions: tuple[Pattern, ...]
    consequence: Pattern | None = None  # None -> contradiction rule (=> !)
    unequals: tuple[tuple[str, str], ...] = ()
    negated: tuple[int, ...] = ()  # indices of NAF conditions (stratum 2)
    # Additional consequences fired from the same bindings (the reference
    # attaches any number of deductions to one condition set via repeated
    # (condition => consequence_i) facts — script_engine.cpp:1303-1308).
    extra_consequences: tuple[Pattern, ...] = ()

    @property
    def is_contradiction(self) -> bool:
        return self.consequence is None

    @property
    def positive(self) -> list[int]:
        return [i for i in range(len(self.conditions)) if i not in self.negated]

    @property
    def consequences(self) -> tuple[Pattern, ...]:
        head = (self.consequence,) if self.consequence is not None else ()
        return head + self.extra_consequences

    @property
    def fresh_vars(self) -> frozenset:
        """Consequence variables not bound by any positive condition: each
        firing creates a new node for them (R6, reasoning_deduce.cpp:48-66)."""
        bound: set[str] = set()
        for i in self.positive:
            bound |= self.conditions[i].variables
        out: set[str] = set()
        for c in self.consequences:
            out |= c.variables - bound
        return frozenset(out)


def P(s: str, p: str, o: str) -> Pattern:
    return Pattern(s, p, o)


def R(rule_id, conds, cons=None, unequals=(), negated=()):
    """``cons`` may be a single Pattern or a sequence of Patterns (the
    first is the primary consequence, the rest extra_consequences)."""
    if cons is not None and not isinstance(cons, Pattern):
        head, *rest = cons
        return Rule(
            rule_id, tuple(conds), head, tuple(unequals), tuple(negated),
            tuple(rest),
        )
    return Rule(rule_id, tuple(conds), cons, tuple(unequals), tuple(negated))


# --- base facts asserted by wikidata.zph (not part of wikidata) ------------
# line 25: "has quality" ~ transitive relation
# line 34: "is for example" is inverse of "~"
BASE_FACTS: list[tuple[str, str, str]] = [
    (QUAL, ISA, TRANSITIVE),
    (FOR_EXAMPLE, INV, ISA),
]

# Facts that ARE part of wikidata (wikidata.zph:17-22 comment) and therefore
# come from the dump/extraction, kept here for tests that bypass extraction:
WIKIDATA_CORE_FACTS: list[tuple[str, str, str]] = [
    (SUB, ISA, TRANSITIVE),
    (HAS_PART, ISA, TRANSITIVE),
    (FACET, ISA, TRANSITIVE),
    (PART_OF, ISA, TRANSITIVE),
    (PART_OF, INV, HAS_PART),
]


def rule_constants(rules: list[Rule]) -> set[str]:
    """All constant terms appearing in a ruleset (for id resolution)."""
    out: set[str] = set()
    for r in rules:
        pats = list(r.conditions) + list(r.consequences)
        for p in pats:
            for t in (p.subj, p.pred, p.obj):
                if not is_var(t):
                    out.add(t)
    return out


def resolve_rules(rules: list[Rule], mapping: dict[str, int]) -> list[Rule]:
    """Rewrite rule constants through a name->node-id mapping so the same
    compiler drives the long-id edge table (zelph_spark.graph). Constants
    missing from the mapping keep their deterministic hash id — compute it
    with config.node_id semantics before calling, or pass a complete map."""

    def term(t):
        return t if is_var(t) else mapping[t]

    def pat(p: Pattern) -> Pattern:
        return Pattern(term(p.subj), term(p.pred), term(p.obj))

    return [
        Rule(
            r.rule_id,
            tuple(pat(c) for c in r.conditions),
            pat(r.consequence) if r.consequence else None,
            r.unequals,
            r.negated,
            tuple(pat(c) for c in r.extra_consequences),
        )
        for r in rules
    ]


def wikidata_rules() -> list[Rule]:
    """The 22 deduction rules of wikidata.zph:27-56."""
    rules = [
        # facet inheritance (lines 27-31)
        R("facet-isa", [P("?X", FACET, "?Y"), P("?Y", ISA, "?C")], P("?X", ISA, "?C")),
        R("facet-sub", [P("?X", FACET, "?Y"), P("?Y", SUB, "?C")], P("?X", SUB, "?C")),
        R("facet-haspart", [P("?X", FACET, "?Y"), P("?Y", HAS_PART, "?P")], P("?X", HAS_PART, "?P")),
        R("facet-partof", [P("?X", FACET, "?Y"), P("?Y", PART_OF, "?P")], P("?X", PART_OF, "?P")),
        R("facet-quality", [P("?X", FACET, "?Y"), P("?Y", QUAL, "?Q")], P("?X", QUAL, "?Q")),
        # transitive closure meta-rule (line 36) — variable predicate ?R
        R("transitive", [P("?R", ISA, TRANSITIVE), P("?X", "?R", "?Y"), P("?Y", "?R", "?Z")], P("?X", "?R", "?Z")),
        # inverse of transitive is transitive (line 37)
        R("transitive-inverse", [P("?P", ISA, TRANSITIVE), P("?P", INV, "?Q")], P("?Q", ISA, TRANSITIVE)),
        # class membership through subclass (line 38)
        R("subclass-lift", [P("?X", ISA, "?K"), P("?K", SUB, "?U")], P("?X", ISA, "?U")),
        # quality propagation (lines 40-43)
        R("quality-isa", [P("?X", QUAL, "?E"), P("?E", ISA, "?K")], P("?X", QUAL, "?K")),
        R("quality-sub", [P("?X", QUAL, "?E"), P("?E", SUB, "?K")], P("?X", QUAL, "?K")),
        R("quality-inherit-isa", [P("?K", QUAL, "?E"), P("?X", ISA, "?K")], P("?X", QUAL, "?E")),
        R("quality-inherit-sub", [P("?K", QUAL, "?E"), P("?X", SUB, "?K")], P("?X", QUAL, "?E")),
        # part propagation (lines 44-45)
        R("haspart-isa", [P("?X", HAS_PART, "?P"), P("?P", ISA, "?K")], P("?X", HAS_PART, "?K")),
        R("haspart-inherit-sub", [P("?K", HAS_PART, "?P"), P("?X", SUB, "?K")], P("?X", HAS_PART, "?P")),
        # opposite / inverse class propagation (lines 47-50)
        R("opp-isa", [P("?X", OPP, "?Y"), P("?X", ISA, "?K")], P("?Y", ISA, "?K")),
        R("opp-sub", [P("?X", OPP, "?Y"), P("?X", SUB, "?K")], P("?Y", SUB, "?K")),
        R("inv-isa", [P("?X", INV, "?Y"), P("?X", ISA, "?K")], P("?Y", ISA, "?K")),
        R("inv-sub", [P("?X", INV, "?Y"), P("?X", SUB, "?K")], P("?Y", SUB, "?K")),
        # symmetry (lines 53-54)
        R("opp-sym", [P("?X", OPP, "?Y")], P("?Y", OPP, "?X")),
        R("inv-sym", [P("?X", INV, "?Y")], P("?Y", INV, "?X")),
        # relation swap (lines 55-56) — variable predicates ?R/?S
        R("opp-swap", [P("?R", OPP, "?S"), P("?X", "?R", "?Y")], P("?Y", "?S", "?X")),
        R("inv-swap", [P("?R", INV, "?S"), P("?X", "?R", "?Y")], P("?Y", "?S", "?X")),
    ]
    return rules


def wikidata_contradiction_rules() -> list[Rule]:
    """The 24 contradiction rules of wikidata.zph:58-87 (consequence = !)."""
    rules = [
        # opposite/inverse qualities and parts on the same subject (58-61)
        R("c-opp-quality", [P("?X", OPP, "?Y"), P("?A", QUAL, "?X"), P("?A", QUAL, "?Y")]),
        R("c-inv-quality", [P("?X", INV, "?Y"), P("?A", QUAL, "?X"), P("?A", QUAL, "?Y")]),
        R("c-opp-part", [P("?X", OPP, "?Y"), P("?A", HAS_PART, "?X"), P("?A", HAS_PART, "?Y")]),
        R("c-inv-part", [P("?X", INV, "?Y"), P("?A", HAS_PART, "?X"), P("?A", HAS_PART, "?Y")]),
        # opposite/inverse classes (63-66)
        R("c-opp-isa", [P("?X", OPP, "?Y"), P("?A", ISA, "?X"), P("?A", ISA, "?Y")]),
        R("c-opp-sub", [P("?X", OPP, "?Y"), P("?A", SUB, "?X"), P("?A", SUB, "?Y")]),
        R("c-inv-isa", [P("?X", INV, "?Y"), P("?A", ISA, "?X"), P("?A", ISA, "?Y")]),
        R("c-inv-sub", [P("?X", INV, "?Y"), P("?A", SUB, "?X"), P("?A", SUB, "?Y")]),
        # quality cycles (68-72)
        R("c-qual-isa", [P("?X", QUAL, "?E"), P("?X", ISA, "?E")]),
        R("c-qual-sub", [P("?X", QUAL, "?E"), P("?X", SUB, "?E")]),
        R("c-qual-isa-rev", [P("?X", QUAL, "?E"), P("?E", ISA, "?X")]),
        R("c-qual-sub-rev", [P("?X", QUAL, "?E"), P("?E", SUB, "?X")]),
        R("c-qual-part-rev", [P("?X", QUAL, "?E"), P("?E", HAS_PART, "?X")]),
        # part cycles (74-77)
        R("c-part-isa", [P("?X", HAS_PART, "?E"), P("?X", ISA, "?E")]),
        R("c-part-sub", [P("?X", HAS_PART, "?E"), P("?X", SUB, "?E")]),
        R("c-part-isa-rev", [P("?X", HAS_PART, "?E"), P("?E", ISA, "?X")]),
        R("c-part-sub-rev", [P("?X", HAS_PART, "?E"), P("?E", SUB, "?X")]),
        # instance AND subclass at once (80)
        R("c-isa-and-sub", [P("?X", ISA, "?A"), P("?X", SUB, "?B")]),
        # cycles between taxonomy predicates (82-87)
        R("c-isa-cycle", [P("?A", ISA, "?B"), P("?B", ISA, "?A")]),
        R("c-sub-cycle", [P("?A", SUB, "?B"), P("?B", SUB, "?A")]),
        R("c-facet-cycle", [P("?A", FACET, "?B"), P("?B", FACET, "?A")]),
        R("c-isa-sub-cycle", [P("?A", ISA, "?B"), P("?B", SUB, "?A")]),
        R("c-isa-facet-cycle", [P("?A", ISA, "?B"), P("?B", FACET, "?A")]),
        R("c-sub-facet-cycle", [P("?A", SUB, "?B"), P("?B", FACET, "?A")]),
    ]
    return rules
