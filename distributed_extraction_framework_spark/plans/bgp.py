"""SPARQL basic-graph-pattern queries compiled to DataFrame joins.

The reference emits triples and stops — querying them means loading a
separate triple store. A Spark-native KG engine can answer conjunctive
(BGP) queries directly over the quads DataFrame it just produced: every
triple pattern is a filtered projection of the quads table, shared
variables become equi-join keys, and Catalyst/AQE pick the physical join
strategy (broadcast for selective patterns, shuffled hash otherwise) at
runtime — exactly the worst-case-optimal concern triple stores hand-tune,
delegated to the optimizer.

Supported grammar (deliberately the well-defined core):

    SELECT [DISTINCT] ?v1 ?v2 ... WHERE { tp ( . tp )* flt* } [LIMIT n]
    tp   := term term term
    term := ?var | <uri> | "literal" | "literal"@lang
            | <uri>+                (predicate position only)
    flt  := FILTER ( atom cmp atom ) | FILTER ( regex(?var, "pat" [, "i"]) )
    atom := ?var | number | "string" ; cmp := = | != | < | <= | > | >=

``<p>+`` is SPARQL 1.1 property-path ``OneOrMore``: it compiles to
``graph.reachability`` (repeated-squaring transitive closure) over the
p-labelled subgraph. FILTERs apply conjunctively over the joined result
— expressed as Catalyst predicates, so the optimizer pushes them below
the joins (and into the scans) whenever legal. A comparison against a
numeric literal coerces the variable to double (SPARQL numeric-order
semantics); var-to-var and string comparisons stay lexicographic.

Semantics: bag (multiset) joins per the SPARQL algebra; ``DISTINCT``
projects to set semantics. Terms are matched against the quads columns
(subj / pred / obj; ``@lang`` additionally constrains ``lang``).

Scale shape: each pattern scan carries its constant filters down to the
parquet scan (Catalyst pushdown); the same quads DataFrame is referenced
once per pattern, so a cached/bucketed quads table makes every pattern a
local scan. No collect; no driver-side joins.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN = re.compile(
    r"\?[A-Za-z_]\w*"              # ?var
    r"|<[^<>\s]+>\+?"              # <uri> / <uri>+
    r'|"(?:[^"\\]|\\.)*"(?:@[\w-]+)?'  # "literal"(@lang)
)
_HEAD = re.compile(
    r"^\s*SELECT\s+(?P<distinct>DISTINCT\s+)?(?P<vars>.*?)\s+"
    r"WHERE\s*\{(?P<body>.*)\}\s*(?:LIMIT\s+(?P<limit>\d+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)


@dataclass(frozen=True)
class Term:
    kind: str  # 'var' | 'uri' | 'path' | 'lit'
    value: str
    lang: str | None = None


def _parse_term(tok: str) -> Term:
    if tok.startswith("?"):
        return Term("var", tok[1:])
    if tok.startswith("<"):
        if tok.endswith("+"):
            return Term("path", tok[1:-2])
        return Term("uri", tok[1:-1])
    body, _, lang = tok.rpartition('"')
    lit = tok[1: len(tok) - len(lang) - 1] if lang else tok[1:-1]
    lit = lit.replace('\\"', '"').replace("\\\\", "\\")
    return Term("lit", lit, lang.lstrip("@") or None)


_NUM = re.compile(r"^-?\d+(\.\d+)?$")
_CMP = re.compile(
    r'^\s*(?P<l>\?\w+|-?[\d.]+|"(?:[^"\\]|\\.)*")\s*'
    r"(?P<op>=|!=|<=|>=|<|>)\s*"
    r'(?P<r>\?\w+|-?[\d.]+|"(?:[^"\\]|\\.)*")\s*$'
)
_RX = re.compile(
    r'^\s*regex\s*\(\s*\?(?P<v>\w+)\s*,\s*"(?P<pat>(?:[^"\\]|\\.)*)"'
    r'\s*(?:,\s*"(?P<flags>[a-z]*)")?\s*\)\s*$',
    re.IGNORECASE,
)


def _extract_filters(body: str) -> tuple[str, list[str]]:
    """Strip FILTER(...) clauses (paren-balanced) out of the WHERE body."""
    filters: list[str] = []
    out: list[str] = []
    i = 0
    for m in re.finditer(r"\bFILTER\s*\(", body, re.IGNORECASE):
        if m.start() < i:
            continue
        out.append(body[i: m.start()])
        depth, j = 1, m.end()
        while j < len(body) and depth:
            depth += {"(": 1, ")": -1}.get(body[j], 0)
            j += 1
        if depth:
            raise ValueError(f"unbalanced FILTER parens in {body!r}")
        filters.append(body[m.end(): j - 1])
        i = j
    out.append(body[i:])
    return " ".join(out), filters


def parse_bgp(query: str):
    """→ (select_vars, distinct, [(s, p, o) Term triples], filters, limit)."""
    m = _HEAD.match(query)
    if not m:
        raise ValueError(f"unparseable BGP query: {query!r}")
    sel = re.findall(r"\?([A-Za-z_]\w*)", m.group("vars"))
    if not sel:
        raise ValueError("SELECT needs at least one ?var")
    body, filters = _extract_filters(m.group("body"))
    toks = _TOKEN.findall(body)
    if not toks or len(toks) % 3:
        raise ValueError(f"WHERE body is not whole triple patterns: {toks}")
    pats = [tuple(_parse_term(t) for t in toks[i: i + 3]) for i in range(0, len(toks), 3)]
    for s, p, o in pats:
        if s.kind in ("lit", "path") or p.kind == "lit" or o.kind == "path":
            raise ValueError(f"unsupported term position in pattern {(s, p, o)}")
    for f in filters:
        if not (_CMP.match(f) or _RX.match(f)):
            raise ValueError(f"unsupported FILTER expression: {f!r}")
    return sel, bool(m.group("distinct")), pats, filters, (
        int(m.group("limit")) if m.group("limit") else None
    )


def _filter_condition(expr: str, bound: set[str]):
    """One FILTER body → a Catalyst boolean Column over bound variables."""
    rx = _RX.match(expr)
    if rx:
        if rx.group("v") not in bound:
            raise ValueError(f"FILTER var ?{rx.group('v')} not bound")
        pat = rx.group("pat")
        if "i" in (rx.group("flags") or ""):
            pat = "(?i)" + pat
        return F.col(rx.group("v")).rlike(pat)

    m = _CMP.match(expr)
    assert m, expr  # parse_bgp validated

    def atom(tok: str):
        if tok.startswith("?"):
            if tok[1:] not in bound:
                raise ValueError(f"FILTER var {tok} not bound")
            return ("var", F.col(tok[1:]))
        if _NUM.match(tok):
            return ("num", F.lit(float(tok) if "." in tok else int(tok)))
        return ("str", F.lit(tok[1:-1].replace('\\"', '"').replace("\\\\", "\\")))

    (lk, lc), (rk, rc) = atom(m.group("l")), atom(m.group("r"))
    if "num" in (lk, rk):  # SPARQL numeric order: coerce vars to double
        lc = lc.cast("double") if lk == "var" else lc
        rc = rc.cast("double") if rk == "var" else rc
    op = m.group("op")
    return {
        "=": lc == rc, "!=": lc != rc, "<": lc < rc,
        "<=": lc <= rc, ">": lc > rc, ">=": lc >= rc,
    }[op]


def _pattern_df(quads: DataFrame, s: Term, p: Term, o: Term) -> DataFrame:
    """One triple pattern → DataFrame whose columns are its variables."""
    if p.kind == "path":
        from ..operators.graph import reachability

        base = reachability(
            quads.filter(F.col("pred") == p.value)
            .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        ).select(
            F.col("src").alias("_s"),
            F.col("dst").alias("_o"),
            F.lit(None).cast("string").alias("_lang"),
        )
        bind = {"_s": s, "_o": o}
    else:
        base = quads.select(
            F.col("subj").alias("_s"),
            F.col("pred").alias("_p"),
            F.col("obj").alias("_o"),
            F.col("lang").alias("_lang"),
        )
        bind = {"_s": s, "_p": p, "_o": o}

    rename: dict[str, str] = {}
    for col, term in bind.items():
        if term.kind == "var":
            if term.value in rename.values():  # repeated var inside one pattern
                prev = next(c for c, v in rename.items() if v == term.value)
                base = base.filter(F.col(col) == F.col(prev))
            else:
                rename[col] = term.value
        else:
            base = base.filter(F.col(col) == term.value)
            if term.kind == "lit" and term.lang is not None:
                base = base.filter(F.col("_lang") == term.lang)
    return base.select(*[F.col(c).alias(v) for c, v in rename.items()])


def bgp_query(quads: DataFrame, query: str) -> DataFrame:
    """Answer a BGP query over a quads DataFrame (subj/pred/obj/lang cols).

    Join order is pattern order as written (selective patterns first is
    the usual authoring convention); AQE re-plans sizes at runtime.
    Patterns sharing no variable with the accumulated result cross-join —
    legal SPARQL, and flagged to the author by the plan itself.
    """
    sel, distinct, pats, filters, limit = parse_bgp(query)
    result: DataFrame | None = None
    for s, p, o in pats:
        df = _pattern_df(quads, s, p, o)
        if result is None:
            result = df
        else:
            shared = [c for c in df.columns if c in result.columns]
            result = result.join(df, shared) if shared else result.crossJoin(df)
    assert result is not None
    bound = set(result.columns)
    for f in filters:
        result = result.filter(_filter_condition(f, bound))
    missing = [v for v in sel if v not in result.columns]
    if missing:
        raise ValueError(f"SELECT vars not bound by any pattern: {missing}")
    out = result.select(*sel)
    if distinct:
        out = out.distinct()
    if limit is not None:
        out = out.limit(limit)
    return out
