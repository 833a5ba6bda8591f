"""Thin SPARQL-subset text frontend (SURVEY.md §2.6 Q1/Q14).

zelph parses its SPARQL subset with a Janet PEG (``stdlib/sparql.zph:160-270``)
and evaluates per-solution through the C unification engine. Here the parser
is a small recursive-descent over the same documented subset
(``sparql.zph:18-35``) and the evaluator is the existing DataFrame algebra
(:mod:`zelph_spark.query` + the rule compiler) — one engine for rules,
native queries, and SPARQL, preserving the homoiconic design.

Supported (mirroring the subset + rejection list at sparql.zph:33-35):
SELECT [DISTINCT] ?v... | * , WHERE { BGP with ``;``/``,`` lists, OPTIONAL,
MINUS, UNION, FILTER(?x op ?y|literal) }, property paths ``p+``/``p*`` and
sequences ``p1/p2``, GROUP BY + COUNT/COUNT(DISTINCT), ORDER BY ASC/DESC,
LIMIT, prefixes (wd:/wdt:/p:/ps:/pq: pass through as names). Rejected with
errors: BIND, VALUES, SERVICE, CONSTRUCT, ASK, EXISTS, HAVING, other
aggregates.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from . import query as Q
from .closure import closure_with_start, path_sequence, transitive_closure
from .rules import Pattern

_REJECT = re.compile(
    r"\b(BIND|VALUES|SERVICE|CONSTRUCT|ASK|EXISTS|HAVING|SUM|AVG|MIN|MAX|GROUP_CONCAT|SAMPLE)\b",
    re.IGNORECASE,
)

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lbrace>\{) | (?P<rbrace>\}) |
        (?P<dot>\.) | (?P<semi>;) | (?P<comma>,) |
        (?P<kw>OPTIONAL|MINUS|UNION|FILTER)\b |
        (?P<var>\?[A-Za-z_][A-Za-z0-9_]*) |
        (?P<iri><[^>]*>) |
        (?P<literal>"[^"]*") |
        (?P<path>[A-Za-z_][A-Za-z0-9_:.\-]*(?:/[A-Za-z_][A-Za-z0-9_:.\-]*)+[+*]?) |
        (?P<name>[A-Za-z_][A-Za-z0-9_:.\-]*[+*]?) |
        (?P<cmp><=|>=|!=|=|<|>) |
        (?P<lpar>\() | (?P<rpar>\))
    )""",
    re.VERBOSE,
)


class SparqlError(ValueError):
    pass


def _tokenize(s: str):
    pos, out = 0, []
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            raise SparqlError(f"cannot tokenize at: {s[pos:pos + 30]!r}")
        pos = m.end()
        for k, v in m.groupdict().items():
            if v is not None:
                out.append((k, v))
                break
    return out


def _strip_term(tok: tuple[str, str]) -> str:
    kind, v = tok
    if kind == "iri":
        return v[1:-1].rsplit("/", 1)[-1]
    if kind == "literal":
        return v[1:-1]
    return v


class _Parser:
    """WHERE-block parser -> algebra tree of ('bgp'|'optional'|'minus'|
    'union'|'filter', ...) nodes."""

    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def eat(self, kind=None, value=None):
        k, v = self.peek()
        if kind and k != kind or (value and v.upper() != value):
            raise SparqlError(f"expected {value or kind}, got {v!r}")
        self.i += 1
        return (k, v)

    def group(self):
        """{ ... } -> algebra node."""
        self.eat("lbrace")
        node = None
        triples: list[tuple] = []

        def flush():
            nonlocal node, triples
            if triples:
                bgp = ("bgp", triples)
                node = bgp if node is None else ("join", node, bgp)
                triples = []

        while True:
            k, v = self.peek()
            if k is None:
                raise SparqlError("unexpected end of query in group")
            if k == "rbrace":
                self.eat("rbrace")
                flush()
                return node or ("bgp", [])
            if k == "kw" and v.upper() == "OPTIONAL":
                self.eat()
                flush()
                node = ("optional", node or ("bgp", []), self.group())
            elif k == "kw" and v.upper() == "MINUS":
                self.eat()
                flush()
                node = ("minus", node or ("bgp", []), self.group())
            elif k == "kw" and v.upper() == "FILTER":
                self.eat()
                flush()
                self.eat("lpar")
                lhs = self.eat()
                op = self.eat("cmp")[1]
                rhs = self.eat()
                self.eat("rpar")
                node = ("filter", node or ("bgp", []), _strip_term(lhs), op,
                        _strip_term(rhs), lhs[0] == "var", rhs[0] == "var")
            elif k == "lbrace":
                sub = self.group()
                kk, vv = self.peek()
                if kk == "kw" and vv.upper() == "UNION":
                    self.eat()
                    right = self.group()
                    sub = ("union", sub, right)
                flush()
                node = sub if node is None else ("join", node, sub)
            else:
                triples.extend(self._triple_block())
                k2, _ = self.peek()
                if k2 == "dot":
                    self.eat("dot")

    def _term(self):
        k, v = self.peek()
        if k in ("var", "iri", "literal", "name", "path"):
            self.eat()
            return _strip_term((k, v))
        raise SparqlError(f"expected term, got {v!r}")

    def _triple_block(self):
        """subject pred obj (;/,-lists, sparql.zph predicate-object lists)."""
        out = []
        subj = self._term()
        while True:
            pred = self._term()
            obj = self._term()
            out.append((subj, pred, obj))
            k, _ = self.peek()
            while k == "comma":  # same subject+pred, more objects
                self.eat("comma")
                out.append((subj, pred, self._term()))
                k, _ = self.peek()
            if k == "semi":  # same subject, next predicate
                self.eat("semi")
                continue
            return out


def _edges_for_path(edges: DataFrame, pred: str) -> DataFrame:
    """Resolve a path element to a (subj, obj) slice: plain predicate,
    ``p+``, ``p*``, or a ``p1/p2`` sequence (sparql.zph:345-361,652-811)."""
    if "/" in pred:
        return path_sequence([_edges_for_path(edges, p) for p in pred.split("/")])
    mod = pred[-1] if pred[-1] in "+*" else ""
    name = pred.rstrip("+*")
    base = edges.filter(F.col("pred") == name).select("subj", "obj")
    if mod == "+":
        return transitive_closure(base)
    if mod == "*":
        return closure_with_start(base)
    return base


def _eval(node, edges: DataFrame) -> DataFrame:
    kind = node[0]
    if kind == "bgp":
        plain = [t for t in node[1] if not _is_path(t[1])]
        paths = [t for t in node[1] if _is_path(t[1])]
        sols = None
        if plain:
            sols = Q.bgp(edges, [Pattern(*_varfix(t)) for t in plain])
        for s, p, o in paths:
            pairs = _edges_for_path(edges, p)
            pdf = _bind_pair(pairs, s, o)
            sols = pdf if sols is None else Q.join(sols, pdf)
        if sols is None:
            raise SparqlError("empty group pattern")
        return sols
    if kind == "join":
        return Q.join(_eval(node[1], edges), _eval(node[2], edges))
    if kind == "optional":
        return Q.optional(_eval(node[1], edges), _eval(node[2], edges))
    if kind == "minus":
        return Q.minus(_eval(node[1], edges), _eval(node[2], edges))
    if kind == "union":
        return Q.union(_eval(node[1], edges), _eval(node[2], edges))
    if kind == "filter":
        _, child, lhs, op, rhs, lvar, rvar = node
        df = _eval(child, edges)
        lc = F.col(lhs[1:]) if lvar else F.lit(lhs)
        rc = F.col(rhs[1:]) if rvar else F.lit(rhs)
        cond = {
            "=": lc == rc, "!=": lc != rc, "<": lc < rc,
            ">": lc > rc, "<=": lc <= rc, ">=": lc >= rc,
        }[op]
        return df.where(cond)
    raise SparqlError(f"unknown node {kind}")


def _is_path(p: str) -> bool:
    return not p.startswith("?") and ("/" in p or p.endswith("+") or p.endswith("*"))


def _varfix(t):
    return tuple(x for x in t)


def _bind_pair(pairs: DataFrame, s: str, o: str) -> DataFrame:
    cols = []
    out = pairs
    if s.startswith("?"):
        cols.append(F.col("subj").alias(s[1:]))
    else:
        out = out.filter(F.col("subj") == s)
    if o.startswith("?"):
        cols.append(F.col("obj").alias(o[1:]))
    else:
        out = out.filter(F.col("obj") == o)
    if not cols:
        cols = [F.lit(True).alias("_matched")]
    return out.select(*cols).distinct()


def sparql(edges: DataFrame, text: str) -> DataFrame:
    """Run a SPARQL-subset SELECT over an edge DataFrame (subj, pred, obj
    as names — join against the names table upstream if starting from ids).
    Returns a solutions DataFrame with variable-named columns."""
    m = _REJECT.search(text)
    if m:
        raise SparqlError(f"unsupported SPARQL feature: {m.group(0)} "
                          "(subset per stdlib/sparql.zph:18-35)")
    head = re.match(
        r"\s*SELECT\s+(?P<distinct>DISTINCT\s+)?(?P<proj>\*|(?:\?\w+\s*)+|"
        r"(?:.*?COUNT\s*\(.*?\).*?))\s+WHERE\s*(?P<rest>\{.*)",
        text, re.IGNORECASE | re.DOTALL,
    )
    if not head:
        raise SparqlError("only SELECT ... WHERE { ... } is supported")
    rest = head.group("rest")

    # trailing modifiers after the closing brace
    depth = 0
    for idx, ch in enumerate(rest):
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                break
    body, tail = rest[: idx + 1], rest[idx + 1 :]

    tree = _Parser(_tokenize(body)).group()
    sols = _eval(tree, edges)

    proj = head.group("proj").strip()
    count_m = re.search(
        r"COUNT\s*\(\s*(DISTINCT\s+)?(\?\w+|\*)\s*\)(?:\s+AS\s+\?(\w+))?",
        proj, re.IGNORECASE,
    )
    group_m = re.search(r"GROUP\s+BY\s+((?:\?\w+\s*)+)", tail, re.IGNORECASE)
    order_m = re.search(
        r"ORDER\s+BY\s+(ASC|DESC)?\s*\(?\s*\?(\w+)\s*\)?", tail, re.IGNORECASE
    )
    limit_m = re.search(r"LIMIT\s+(\d+)", tail, re.IGNORECASE)

    if count_m:
        gvars = (
            [v[1:] for v in group_m.group(1).split()] if group_m else []
        )
        target = count_m.group(2)
        alias = count_m.group(3) or "count"
        sols = Q.group_count(
            sols if gvars else sols.withColumn("_g", F.lit(1)),
            gvars or ["_g"],
            count_var=None if target == "*" else target[1:],
            distinct_count=bool(count_m.group(1)),
            alias=alias,
        )
        if not gvars:
            sols = sols.drop("_g")
    elif proj != "*":
        want = [v[1:] for v in proj.split()]
        sols = sols.select(*want)
    if head.group("distinct"):
        sols = sols.dropDuplicates()
    if order_m:
        col = F.col(order_m.group(2))
        sols = sols.orderBy(
            col.desc() if (order_m.group(1) or "").upper() == "DESC" else col.asc()
        )
    if limit_m:
        sols = sols.limit(int(limit_m.group(1)))
    return sols
