"""SPARQL queries compiled to DataFrame plans over the extracted quads.

The reference emits triples and stops — querying them means loading a
separate triple store. A Spark-native KG engine can answer SPARQL
queries directly over the quads DataFrame it just produced: every
triple pattern is a filtered projection of the quads table, shared
variables become equi-join keys, and Catalyst/AQE pick the physical join
strategy (broadcast for selective patterns, shuffled hash otherwise) at
runtime — exactly the worst-case-optimal concern triple stores hand-tune,
delegated to the optimizer.

Supported grammar (deliberately the well-defined core):

    SELECT [DISTINCT] item+ WHERE { group ( UNION { group' } )* }
        [GROUP BY ?v+] [ORDER BY ord+] [LIMIT n]
    item  := ?var | ( AGG ( [DISTINCT] ?var | * ) AS ?alias )
    AGG   := COUNT | SUM | AVG | MIN | MAX
    group := ( tp . | flt | OPTIONAL { group } | VALUES ?v { const+ } )+
    tp    := term term term
    term  := ?var | <uri> | "literal" | "literal"@lang
             | path                 (predicate position only)
    path  := pseq ( '|' pseq )* ; pseq := pstep ( '/' pstep )*
    pstep := '^'? <uri> ('+' | '*')?
    flt   := FILTER ( atom cmp atom ) | FILTER ( regex(?var, "pat" [, "i"]) )
    atom  := ?var | number | "string" ; cmp := = | != | < | <= | > | >=
    ord   := ?var | ASC(?var) | DESC(?var)

How each construct maps to the DataFrame algebra:

* property paths — ``<p>+`` (OneOrMore) and ``<p>*`` (ZeroOrMore)
  compile to ``graph.reachability`` (repeated-squaring transitive
  closure) over the p-labelled subgraph ('*' additionally unions the
  identity relation over all graph terms, per spec); ``^<p>`` (inverse)
  swaps src/dst; ``<a>/<b>`` (sequence) joins through a hidden mid
  variable; ``<a>|<b>`` (alternative) unions the pair sets.
* ``FILTER`` — a Catalyst predicate; the optimizer pushes it below the
  joins (and into the scans) whenever legal. Comparison against a
  numeric literal coerces the variable to double (SPARQL numeric-order
  semantics); var-to-var and string comparisons stay lexicographic.
* ``OPTIONAL { … }`` — SPARQL left-join: the optional group compiles to
  its own join tree, then LEFT OUTER joins the required part on the
  shared variables; unmatched rows carry NULL (SPARQL "unbound").
* ``{ … } UNION { … }`` — each branch compiles independently;
  ``unionByName(allowMissingColumns=True)`` NULL-fills variables bound
  in only one branch (SPARQL bag union with partial bindings).
* ``VALUES ?v { … }`` — an inline broadcast relation equi-joined on the
  variable; Catalyst turns it into a broadcast hash join / IN-filter.
* aggregates + ``GROUP BY`` — ``df.groupBy(keys).agg(…)``; map-side
  partial aggregation comes free. SUM/AVG coerce to double (the quads
  object column is lexical); COUNT/MIN/MAX operate on the lexical form.
* ``ORDER BY`` + ``LIMIT`` — global sort is a TakeOrderedAndProject when
  LIMIT is present (per-partition top-n, no full sort shuffle).

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
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN = re.compile(
    r"\?[A-Za-z_]\w*"              # ?var
    # property-path expression (predicate position): ^?<uri>[+*]? steps
    # joined by / (sequence) or | (alternative); plain <uri> and <uri>+
    # are the degenerate cases
    r"|\^?<[^<>\s]+>[+*]?(?:[/|]\^?<[^<>\s]+>[+*]?)*"
    r'|"(?:[^"\\]|\\.)*"(?:@[\w-]+)?'  # "literal"(@lang)
)
_SIMPLE_URI = re.compile(r"^<[^<>\s]+>$")
_SIMPLE_PLUS = re.compile(r"^<[^<>\s]+>\+$")
_HEAD = re.compile(
    r"^\s*SELECT\s+(?P<distinct>DISTINCT\s+)?(?P<vars>.*?)\s+WHERE\s*(?=\{)",
    re.IGNORECASE | re.DOTALL,
)
_TAIL = re.compile(
    r"^\s*(?:GROUP\s+BY\s+(?P<groupby>(?:\?\w+\s*)+))?"
    r"\s*(?:ORDER\s+BY\s+(?P<orderby>(?:(?:ASC|DESC)\s*\(\s*\?\w+\s*\)|\?\w+)"
    r"(?:\s+(?:(?:ASC|DESC)\s*\(\s*\?\w+\s*\)|\?\w+))*))?"
    r"\s*(?:LIMIT\s+(?P<limit>\d+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_SEL_ITEM = re.compile(
    r"\?(?P<var>[A-Za-z_]\w*)"
    r"|\(\s*(?P<agg>COUNT|SUM|AVG|MIN|MAX)\s*\(\s*(?P<dist>DISTINCT\s+)?"
    r"(?:\?(?P<arg>\w+)|(?P<star>\*))\s*\)\s+AS\s+\?(?P<alias>\w+)\s*\)",
    re.IGNORECASE,
)
_ORD_ITEM = re.compile(
    r"(?:(?P<dir>ASC|DESC)\s*\(\s*\?(?P<pv>\w+)\s*\))|\?(?P<v>\w+)",
    re.IGNORECASE,
)


@dataclass(frozen=True)
class Term:
    kind: str  # 'var' | 'uri' | 'path' | 'lit'
    value: str
    lang: str | None = None


@dataclass(frozen=True)
class SelItem:
    name: str               # output column name
    agg: str | None = None  # 'count' | 'sum' | 'avg' | 'min' | 'max'
    arg: str | None = None  # source var; None with agg='count' means *
    distinct: bool = False


@dataclass
class Group:
    triples: list = field(default_factory=list)
    filters: list = field(default_factory=list)
    optionals: list = field(default_factory=list)   # list[Group]
    values: list = field(default_factory=list)      # list[(var, [Term])]


def _parse_term(tok: str) -> Term:
    if tok.startswith("?"):
        return Term("var", tok[1:])
    if tok.startswith("<") or tok.startswith("^"):
        if _SIMPLE_URI.match(tok):
            return Term("uri", tok[1:-1])
        if _SIMPLE_PLUS.match(tok):
            return Term("path", tok[1:-2])
        return Term("pathx", tok)  # compound path expression, parsed later
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


def _balanced(text: str, start: int) -> int:
    """text[start] == '{' → index just past the matching '}'."""
    depth = 0
    for j in range(start, len(text)):
        depth += {"{": 1, "}": -1}.get(text[j], 0)
        if depth == 0:
            return j + 1
    raise ValueError(f"unbalanced braces in {text[start:start + 40]!r}…")


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


def _extract_blocks(body: str, opener: re.Pattern) -> tuple[str, list]:
    """Strip ``opener … { balanced }`` blocks; return (rest, [(match, inner)])."""
    blocks, out, i = [], [], 0
    for m in opener.finditer(body):
        if m.start() < i:
            continue  # inside a previously-consumed block
        out.append(body[i: m.start()])
        end = _balanced(body, m.end() - 1)
        blocks.append((m, body[m.end(): end - 1]))
        i = end
    out.append(body[i:])
    return " ".join(out), blocks


_OPTIONAL_OPEN = re.compile(r"\bOPTIONAL\s*(\{)", re.IGNORECASE)
_VALUES_OPEN = re.compile(r"\bVALUES\s+\?(?P<var>\w+)\s*(\{)", re.IGNORECASE)


def _parse_triples(text: str):
    toks = _TOKEN.findall(text)
    if len(toks) % 3:
        raise ValueError(f"WHERE body is not whole triple patterns: {toks}")
    pats = [
        tuple(_parse_term(t) for t in toks[i: i + 3])
        for i in range(0, len(toks), 3)
    ]
    for s, p, o in pats:
        if (s.kind in ("lit", "path", "pathx") or p.kind == "lit"
                or o.kind in ("path", "pathx")):
            raise ValueError(f"unsupported term position in pattern {(s, p, o)}")
    return pats


def _parse_group(body: str) -> Group:
    g = Group()
    body, opts = _extract_blocks(body, _OPTIONAL_OPEN)
    g.optionals = [_parse_group(inner) for _, inner in opts]
    body, vals = _extract_blocks(body, _VALUES_OPEN)
    for m, inner in vals:
        terms = [_parse_term(t) for t in _TOKEN.findall(inner)]
        if not terms or any(t.kind not in ("uri", "lit") for t in terms):
            raise ValueError(f"VALUES accepts only constants: {inner!r}")
        g.values.append((m.group("var"), terms))
    body, g.filters = _extract_filters(body)
    for f in g.filters:
        if not (_CMP.match(f) or _RX.match(f)):
            raise ValueError(f"unsupported FILTER expression: {f!r}")
    g.triples = _parse_triples(body)
    if not g.triples and not g.values:
        raise ValueError("empty group pattern")
    return g


def _parse_union(body: str) -> list[Group]:
    """``{ g } UNION { g' } …`` at the top level, else one plain group."""
    stripped = body.strip()
    if not stripped.startswith("{"):
        return [_parse_group(body)]
    groups, i = [], 0
    text = stripped
    while True:
        if not text[i:].lstrip().startswith("{"):
            raise ValueError(f"expected '{{' in UNION body at {text[i:i+30]!r}")
        start = i + (len(text[i:]) - len(text[i:].lstrip()))
        end = _balanced(text, start)
        groups.append(_parse_group(text[start + 1: end - 1]))
        rest = text[end:].strip()
        if not rest:
            return groups
        m = re.match(r"UNION\b", rest, re.IGNORECASE)
        if not m:
            raise ValueError(f"expected UNION, got {rest[:30]!r}")
        i = end + (len(text[end:]) - len(text[end:].lstrip())) + m.end()


def _parse_select(head: str) -> list[SelItem]:
    items, pos = [], 0
    for m in _SEL_ITEM.finditer(head):
        if head[pos: m.start()].strip():
            raise ValueError(f"bad SELECT clause near {head[pos:m.start()]!r}")
        pos = m.end()
        if m.group("var"):
            items.append(SelItem(m.group("var")))
        else:
            items.append(SelItem(
                m.group("alias"),
                agg=m.group("agg").lower(),
                arg=m.group("arg"),
                distinct=bool(m.group("dist")),
            ))
    if head[pos:].strip() or not items:
        raise ValueError(f"bad SELECT clause: {head!r}")
    for it in items:
        if it.agg is None and it.arg is None and it.name is None:
            raise ValueError("SELECT needs at least one ?var")
        if it.agg and it.arg is None and it.agg != "count":
            raise ValueError(f"{it.agg.upper()}(*) is not defined")
    return items


@dataclass(frozen=True)
class ParsedQuery:
    select: tuple
    distinct: bool
    groups: tuple          # UNION branches, each a Group
    group_by: tuple
    order_by: tuple        # (var, desc) pairs
    limit: int | None


def parse_query(query: str) -> ParsedQuery:
    m = _HEAD.match(query)
    if not m:
        raise ValueError(f"unparseable BGP query: {query!r}")
    select = _parse_select(m.group("vars"))
    brace = query.index("{", m.end() - 1)
    end = _balanced(query, brace)
    body, tail = query[brace + 1: end - 1], query[end:]
    t = _TAIL.match(tail)
    if not t:
        raise ValueError(f"unparseable query tail: {tail!r}")
    group_by = tuple(re.findall(r"\?(\w+)", t.group("groupby") or ""))
    order_by = tuple(
        (om.group("pv") or om.group("v"),
         (om.group("dir") or "").upper() == "DESC")
        for om in _ORD_ITEM.finditer(t.group("orderby") or "")
    )
    return ParsedQuery(
        select=tuple(select),
        distinct=bool(m.group("distinct")),
        groups=tuple(_parse_union(body)),
        group_by=group_by,
        order_by=order_by,
        limit=int(t.group("limit")) if t.group("limit") else None,
    )


def parse_bgp(query: str):
    """Legacy view: → (select_vars, distinct, [(s,p,o)], filters, limit).

    Only valid for the single-group conjunctive fragment; extended
    constructs (UNION/OPTIONAL/VALUES/aggregates/ORDER BY) raise — use
    :func:`parse_query` / :func:`bgp_query` for those.
    """
    q = parse_query(query)
    if (len(q.groups) != 1 or q.groups[0].optionals or q.groups[0].values
            or q.group_by or q.order_by
            or any(it.agg for it in q.select)):
        raise ValueError("extended query: use parse_query()")
    g = q.groups[0]
    return ([it.name for it in q.select], q.distinct, g.triples,
            g.filters, q.limit)


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
    assert m, expr  # parse validated

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


# --- SPARQL 1.1 property-path algebra -------------------------------------
#
# alternative := sequence ( '|' sequence )*        (union)
# sequence    := step ( '/' step )*                (join through a mid var)
# step        := '^'? <uri> ('+' | '*')?           (inverse = swap src/dst;
#                + = reachability closure; * = closure ∪ zero-length)
#
# Zero-length semantics per the spec: ``?s <p>* ?o`` relates every graph
# term to itself, so '*' unions the identity relation over all subjects
# and objects — a distinct over the quads, itself a one-shuffle
# aggregation, NOT an all-pairs product.

_PATH_STEP = re.compile(r"(?P<inv>\^)?<(?P<uri>[^<>\s]+)>(?P<quant>[+*])?")


def _split_path(expr: str, sep: str) -> list[str]:
    """Split on ``sep`` outside ``<…>`` (IRIs may contain '|' or '/')."""
    parts, depth, cur = [], 0, []
    for ch in expr:
        depth += {"<": 1, ">": -1}.get(ch, 0)
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _path_pairs(quads: DataFrame, expr: str) -> DataFrame:
    """Path expression → DataFrame of (src, dst) pairs it relates."""
    from ..operators.graph import reachability

    alts = _split_path(expr, "|")
    if len(alts) > 1:
        out = _path_pairs(quads, alts[0])
        for a in alts[1:]:
            out = out.unionByName(_path_pairs(quads, a))
        return out

    seq = _split_path(expr, "/")
    if len(seq) > 1:
        out = _path_pairs(quads, seq[0])
        for s in seq[1:]:
            nxt = _path_pairs(quads, s)
            out = (
                out.withColumnRenamed("dst", "_mid")
                .join(nxt.withColumnRenamed("src", "_mid"), "_mid")
                .select("src", "dst")
            )
        return out

    m = _PATH_STEP.fullmatch(expr.strip())
    if not m:
        raise ValueError(f"unparseable path step: {expr!r}")
    pairs = quads.filter(F.col("pred") == m.group("uri")).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    if m.group("inv"):
        pairs = pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    quant = m.group("quant")
    if quant in ("+", "*"):
        pairs = reachability(pairs)
    if quant == "*":
        nodes = (
            quads.select(F.col("subj").alias("n"))
            .unionByName(quads.select(F.col("obj").alias("n")))
            .distinct()
        )
        pairs = pairs.unionByName(
            nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"))
        ).distinct()
    return pairs


def _pattern_df(quads: DataFrame, s: Term, p: Term, o: Term) -> DataFrame:
    """One triple pattern → DataFrame whose columns are its variables."""
    if p.kind in ("path", "pathx"):
        expr = f"<{p.value}>+" if p.kind == "path" else p.value
        base = _path_pairs(quads, expr).select(
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


def _compile_group(quads: DataFrame, g: Group) -> DataFrame:
    """One group pattern → DataFrame of its variable bindings."""
    result: DataFrame | None = None

    def merge(acc, df):
        if acc is None:
            return df
        shared = [c for c in df.columns if c in acc.columns]
        return acc.join(df, shared) if shared else acc.crossJoin(df)

    for s, p, o in g.triples:
        result = merge(result, _pattern_df(quads, s, p, o))
    for var, terms in g.values:
        inline = quads.sparkSession.createDataFrame(
            [(t.value,) for t in terms], f"{var} string"
        ).distinct()
        result = merge(result, F.broadcast(inline))
    assert result is not None  # parse guarantees triples or values
    bound = set(result.columns)
    for f in g.filters:
        result = result.filter(_filter_condition(f, bound))
    for opt in g.optionals:
        odf = _compile_group(quads, opt)
        shared = [c for c in odf.columns if c in result.columns]
        if not shared:
            raise ValueError(
                "OPTIONAL group shares no variable with the required pattern"
            )
        result = result.join(odf, shared, "left")
    return result


_AGG_FN = {
    "count": lambda c, d: (F.countDistinct(c) if d else F.count(c))
    if c is not None else F.count(F.lit(1)),
    "sum": lambda c, d: (F.sum_distinct if d else F.sum)(c.cast("double")),
    "avg": lambda c, d: F.avg(c.cast("double")),
    "min": lambda c, d: F.min(c),
    "max": lambda c, d: F.max(c),
}


def bgp_query(quads: DataFrame, query: str) -> DataFrame:
    """Answer a SPARQL query over a quads DataFrame (subj/pred/obj/lang).

    Join order is pattern order as written (selective patterns first is
    the usual authoring convention); AQE re-plans sizes at runtime.
    Patterns sharing no variable with the accumulated result cross-join —
    legal SPARQL, and flagged to the author by the plan itself.
    """
    q = parse_query(query)
    branches = [_compile_group(quads, g) for g in q.groups]
    result = branches[0]
    for b in branches[1:]:
        result = result.unionByName(b, allowMissingColumns=True)

    plain = [it for it in q.select if it.agg is None]
    aggs = [it for it in q.select if it.agg is not None]
    missing = [v for v in
               [it.name for it in plain]
               + [it.arg for it in aggs if it.arg]
               + list(q.group_by)
               if v not in result.columns]
    if missing:
        raise ValueError(f"SELECT vars not bound by any pattern: {missing}")

    if aggs or q.group_by:
        keys = list(q.group_by) or [it.name for it in plain]
        stray = [it.name for it in plain if it.name not in keys]
        if stray:
            raise ValueError(f"non-grouped SELECT vars {stray} need GROUP BY")
        agg_cols = [
            _AGG_FN[it.agg](F.col(it.arg) if it.arg else None, it.distinct)
            .alias(it.name)
            for it in aggs
        ]
        result = (result.groupBy(*keys).agg(*agg_cols) if keys
                  else result.agg(*agg_cols))

    out = result.select(*[it.name for it in q.select])
    if q.distinct:
        out = out.distinct()
    if q.order_by:
        bad = [v for v, _ in q.order_by if v not in out.columns]
        if bad:
            raise ValueError(f"ORDER BY vars not in SELECT: {bad}")
        out = out.orderBy(
            *[F.col(v).desc() if desc else F.col(v).asc()
              for v, desc in q.order_by]
        )
    if q.limit is not None:
        out = out.limit(q.limit)
    return out


# ---------------------------------------------------------------------------
# CONSTRUCT and ASK query forms
# ---------------------------------------------------------------------------

_CONSTRUCT_HEAD = re.compile(r"^\s*CONSTRUCT\s*(?=\{)", re.IGNORECASE)
_ASK_HEAD = re.compile(r"^\s*ASK\s*(?:WHERE\s*)?(?=\{)", re.IGNORECASE)
_WHERE_KW = re.compile(r"\s*WHERE\s*(?=\{)", re.IGNORECASE)


def _parse_where_tail(query: str, pos: int):
    """``{ body } [LIMIT n]`` at ``pos`` → (groups, limit)."""
    end = _balanced(query, query.index("{", pos))
    tail = query[end:]
    t = re.match(r"^\s*(?:LIMIT\s+(?P<limit>\d+))?\s*$", tail, re.IGNORECASE)
    if not t:
        raise ValueError(f"unparseable query tail: {tail!r}")
    groups = _parse_union(query[query.index("{", pos) + 1: end - 1])
    return groups, (int(t.group("limit")) if t.group("limit") else None)


def construct_query(quads: DataFrame, query: str) -> DataFrame:
    """``CONSTRUCT { tp+ } WHERE { … } [LIMIT n]`` → new triples.

    The WHERE part accepts everything :func:`bgp_query` does in its body
    (joins, paths, FILTER, OPTIONAL, UNION, VALUES). Each template triple
    is instantiated once per solution; instantiations with an unbound
    (NULL) variable are skipped per the SPARQL spec, and the result is a
    distinct graph (set semantics). Returns ``subj/pred/obj/lang``
    columns composable with :func:`bgp_query` and the RDF sinks; a
    variable in object position carries no language tag (the binding
    representation is lexical), so ``lang`` is non-NULL only for
    constant ``"lit"@lang`` template objects.
    """
    m = _CONSTRUCT_HEAD.match(query)
    if not m:
        raise ValueError(f"not a CONSTRUCT query: {query!r}")
    tpl_start = query.index("{", m.end())
    tpl_end = _balanced(query, tpl_start)
    template = _parse_triples(query[tpl_start + 1: tpl_end - 1])
    if not template:
        raise ValueError("empty CONSTRUCT template")
    w = _WHERE_KW.match(query, tpl_end)
    if not w:
        raise ValueError("CONSTRUCT needs a WHERE block")
    groups, limit = _parse_where_tail(query, w.end())

    bindings = _compile_group(quads, groups[0])
    for g in groups[1:]:
        bindings = bindings.unionByName(
            _compile_group(quads, g), allowMissingColumns=True
        )
    if limit is not None:
        bindings = bindings.limit(limit)

    def term_col(t: Term):
        if t.kind == "var":
            if t.value not in bindings.columns:
                raise ValueError(f"template var ?{t.value} not bound in WHERE")
            return F.col(t.value)
        return F.lit(t.value)

    parts = []
    for s, p, o in template:
        used = [t.value for t in (s, p, o) if t.kind == "var"]
        row = bindings
        for v in used:
            if v not in bindings.columns:
                raise ValueError(f"template var ?{v} not bound in WHERE")
            row = row.filter(F.col(v).isNotNull())
        parts.append(row.select(
            term_col(s).alias("subj"),
            term_col(p).alias("pred"),
            term_col(o).alias("obj"),
            (F.lit(o.lang) if o.kind == "lit" and o.lang is not None
             else F.lit(None)).cast("string").alias("lang"),
        ))
    out = parts[0]
    for p_df in parts[1:]:
        out = out.unionByName(p_df)
    return out.distinct()


def ask_query(quads: DataFrame, query: str) -> DataFrame:
    """``ASK [WHERE] { … }`` → a 1-row DataFrame with boolean ``ask``.

    Compiles the body like :func:`bgp_query` and reduces to "does any
    solution exist"; a LIMIT-1 guard above the aggregation lets Spark
    stop scanning at the first match.
    """
    m = _ASK_HEAD.match(query)
    if not m:
        raise ValueError(f"not an ASK query: {query!r}")
    groups, limit = _parse_where_tail(query, m.end())
    if limit is not None:
        raise ValueError("LIMIT is meaningless on ASK")
    result = _compile_group(quads, groups[0])
    for g in groups[1:]:
        result = result.unionByName(
            _compile_group(quads, g), allowMissingColumns=True
        )
    return result.limit(1).agg((F.count(F.lit(1)) > 0).alias("ask"))
