"""Structured-data extraction from raw web HTML: schema.org JSON-LD
blocks → RDF triples.

The reference framework consumes curated wiki dumps whose structure is
the wikitext itself (reference: extraction/src/main/scala/.../
WikiParser + the extractor suite it feeds); a web-crawl corpus carries
its machine-readable facts in embedded ``<script
type="application/ld+json">`` blocks instead. This operator is the
crawl-side analog of the wikitext extractor family: one scan over the
HTML column, JVM-side block isolation, Arrow-batched JSON flattening,
one explode — the same zero-shuffle shape as
``operators/extractors.extract``.

Execution shape (100 TB-safe):

* the ``<script …>`` block scan is a Catalyst ``regexp_extract_all`` —
  whole-stage-codegen string work, no Python touches pages that carry
  no JSON-LD (the common case: filter on ``size(blocks) > 0`` first);
* JSON parsing + flattening is a vectorized ``pandas_udf`` over the
  (much smaller) exploded block set — Arrow batches, never per-row
  Python over the full corpus;
* output is (id, subj, pred, obj, obj_kind) quintuples; no shuffle is
  introduced — downstream dedup/sinks decide their own partitioning.

Flattening rules (deterministic, documented subset of JSON-LD 1.1
expansion — enough for the schema.org payloads crawls actually carry):

* each block must parse as a JSON object or a JSON array of objects;
  anything else (or invalid JSON) is skipped silently — crawl data is
  hostile, a bad block must never fail the job;
* a node's subject is its ``@id`` (kind ``uri``); a node without
  ``@id`` gets the deterministic blank label ``_:b{id}_{block}_{seq}``
  where ``seq`` is the node's pre-order visit index among bnode-labeled
  nodes in that block (kind ``bnode``);
* ``@type`` (string or list) emits rdf:type triples with kind ``uri``;
* every other non-``@`` key emits one triple per value: JSON strings
  stay literals verbatim; numbers use their Python str() lexical form;
  booleans map to ``true``/``false``; ``null`` is skipped; nested
  objects recurse and the parent links to the child's subject; lists
  distribute over their elements;
* ``@graph`` hoists its member objects to top-level nodes (the common
  "one block, many nodes" publisher layout);
* keys beginning with ``@`` other than ``@id``/``@type``/``@graph``
  (``@context`` etc.) are ignored — no remote context resolution on a
  cluster.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                               StructField, StructType)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# (?is) — case-insensitive, dot-matches-newline; lazy body up to the
# first closing tag. Java-regex only (JVM side); the gate's oracle does
# not re-run this regex — it reconstructs expected triples closed-form.
JSONLD_BLOCK_RE = (
    r"(?is)<script[^>]*type\s*=\s*[\"']application/ld\+json[\"'][^>]*>"
    r"(.*?)</script>"
)

def _html_str(df: DataFrame, html_col: str):
    """The crawl schema carries ``html`` as binary (BASELINE input_hint);
    accept both binary and string columns. The conversion is a CAST, not
    ``decode(…, 'UTF-8')``: under ANSI mode (this repo's default session)
    decode THROWS on the first malformed byte — one mojibake page would
    fail the whole job — while the cast wraps the bytes tolerantly and
    the regex scans simply don't match the damaged spans."""
    from pyspark.sql.types import BinaryType

    c = F.col(html_col)
    if isinstance(df.schema[html_col].dataType, BinaryType):
        c = c.cast("string")
    return c


def _check_keep_cols(keep_cols, reserved) -> None:
    """Fail fast on silent duplicate output names: a kept column that
    collides with an extractor output column would produce an
    ambiguous-reference DataFrame downstream."""
    bad = sorted(set(keep_cols) & set(reserved))
    if bad:
        raise ValueError(
            f"keep_cols collide with extractor output columns: {bad}; "
            f"rename them before extraction"
        )


_TRIPLE = StructType([
    StructField("subj", StringType(), False),
    StructField("pred", StringType(), False),
    StructField("obj", StringType(), False),
    StructField("obj_kind", StringType(), False),
])


def _scalar_lexical(v) -> str | None:
    """JSON scalar → literal lexical form (None = skip)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _iter_values(val):
    """Flatten arbitrarily nested JSON arrays to their leaf values —
    schema.org payloads nest lists (geo polygons, itemListElement
    groupings); each leaf distributes into its own triple instead of
    leaking a Python list repr as a 'literal'."""
    if isinstance(val, list):
        for x in val:
            yield from _iter_values(x)
    else:
        yield val


def _flatten_block(raw: str, row_id, block_idx: int) -> list[tuple]:
    """Never raises: crawl data is hostile and a bad block must never
    fail the job — the whole parse+walk is guarded, not just the parse
    (a block that json.loads accepts can still blow the recursion limit
    in the Python walk, whose frames are bigger than the C scanner's)."""
    try:
        return _flatten_block_unsafe(raw, row_id, block_idx)
    except (ValueError, TypeError, RecursionError):
        return []


def _flatten_block_unsafe(raw: str, row_id, block_idx: int) -> list[tuple]:
    data = json.loads(raw)
    if isinstance(data, dict):
        nodes = [data]
    elif isinstance(data, list):
        nodes = [n for n in data if isinstance(n, dict)]
    else:
        return []

    # hoist @graph members to top-level nodes (index loop: the list
    # grows while we scan it, so nested @graph also unrolls)
    i = 0
    while i < len(nodes):
        g = nodes[i].get("@graph")
        if isinstance(g, list):
            nodes.extend(x for x in g if isinstance(x, dict))
        i += 1

    out: list[tuple] = []
    seq = [0]  # pre-order bnode counter for this block

    def subject_of(node: dict) -> tuple[str, str]:
        nid = node.get("@id")
        if isinstance(nid, str) and nid:
            return nid, "uri"
        label = f"_:b{row_id}_{block_idx}_{seq[0]}"
        seq[0] += 1
        return label, "bnode"

    def walk(node: dict, subj: str) -> None:
        types = node.get("@type")
        if isinstance(types, str):
            types = [types]
        if isinstance(types, list):
            for t in types:
                if isinstance(t, str):
                    out.append((subj, RDF_TYPE, t, "uri"))
        for key, val in node.items():
            if key.startswith("@"):
                continue
            for v in _iter_values(val):
                if isinstance(v, dict):
                    child, kind = subject_of(v)
                    out.append((subj, key, child, kind))
                    walk(v, child)
                else:
                    lex = _scalar_lexical(v)
                    if lex is not None:
                        out.append((subj, key, lex, "literal"))

    for node in nodes:
        subj, _ = subject_of(node)
        walk(node, subj)
    return out


def _scan_page_blocks(blocks, rid, emit_roots: bool) -> list[tuple]:
    """All triples of one page's JSON-LD blocks, in (block, pre-order)
    document order — bnode labels keep the per-block ``_:b{id}_{block}_
    {seq}`` scheme. With ``emit_roots``, appends one MARKER row per root
    subject: a subject never referenced as a uri/bnode object anywhere
    on the page (nested nodes are always objects of their parent link,
    so this is exactly the set of independently-published entities).
    Marker layout: (root_subj, "__root__", root_kind, "root") — the
    ``obj_kind='root'`` sentinel cannot collide with real triples, whose
    kind domain is {uri, literal, bnode}. Computing roots HERE, page-
    locally in the same Python pass that parsed the blocks, is what lets
    the composite stay shuffle-free: the former DataFrame derivation
    (distinct + left-anti self-join over the triple set) re-keyed
    millions of rows through two exchanges to answer a question each
    page can answer about itself in O(page) memory."""
    out: list[tuple] = []
    for bidx, raw in enumerate(blocks):
        out.extend(_flatten_block(raw, rid, bidx))
    if emit_roots:
        append_root_markers(out)
    return out


def append_root_markers(out: list) -> None:
    """Append one (root_subj, "__root__", root_kind, "root") marker per
    root subject of a page's triple list, in first-appearance order —
    shared by the JSON-LD and microdata channels (see
    :func:`_scan_page_blocks` for the root definition and why this is
    computed page-locally)."""
    objs = {o for (_s, _p, o, k) in out if k in ("uri", "bnode")}
    seen: set = set()
    for s, _p, _o, _k in list(out):
        if s not in objs and s not in seen:
            seen.add(s)
            kind = "bnode" if s.startswith("_:") else "uri"
            out.append((s, "__root__", kind, "root"))


def extract_jsonld(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "page_id",
    keep_cols: tuple = (),
    emit_roots: bool = False,
) -> DataFrame:
    """(id, subj, pred, obj, obj_kind[, *keep_cols]) triples from every
    JSON-LD block embedded in ``html_col`` — ``keep_cols`` pass through
    so composites attach page attributes without a join-back.

    Block isolation runs JVM-side (``regexp_extract_all`` in whole-stage
    codegen); pages with no block are dropped before any Python runs,
    so at crawl scale the Arrow transfer carries only the JSON payloads
    (typically <1% of page bytes) — the html column itself never crosses
    into Python. One vectorized UDF call per PAGE (not per block), one
    explode, zero shuffles.

    ``emit_roots=True`` appends the page-local root markers described in
    :func:`_scan_page_blocks`; :func:`web_page_triples` rewrites them to
    provenance edges in the same projection that consumes the triples.
    """
    _check_keep_cols(keep_cols, ("id", "subj", "pred", "obj", "obj_kind"))
    blocks = (
        df.select(
            F.col(id_col).alias("id"), *keep_cols,
            F.regexp_extract_all(_html_str(df, html_col),
                                 F.lit(JSONLD_BLOCK_RE), F.lit(1))
            .alias("_blocks"),
        )
        .filter(F.size("_blocks") > 0)
    )

    @F.pandas_udf(ArrayType(_TRIPLE))
    def flatten(blks: pd.Series, rid: pd.Series) -> pd.Series:
        return pd.Series([
            _scan_page_blocks(b, i, emit_roots)
            for b, i in zip(blks, rid)
        ])

    return (
        blocks.select("id", *keep_cols,
                      F.explode(flatten("_blocks", "id")).alias("_t"))
        .select("id", "_t.subj", "_t.pred", "_t.obj", "_t.obj_kind",
                *keep_cols)
    )


# ---------------------------------------------------------------------------
# pure-Catalyst HTML extractors: outlinks and Open Graph metadata
# ---------------------------------------------------------------------------
# Both regexes stick to the Java-regex ∩ RE2 subset (no lookaround, no
# backrefs) so driver gates can hash-verify the exact semantics against
# DuckDB. Two regexp_extract_all calls with the SAME pattern but
# different group indexes yield index-aligned arrays (the match sequence
# is identical), so arrays_zip pairs attribute and body without Python.

HTML_A_RE = r"(?is)<a\s[^>]*href\s*=\s*[\"']([^\"']+)[\"'][^>]*>(.*?)</a>"
# <meta …> carries its key in property= (Open Graph) or name= (classic),
# and attribute order varies in the wild: match both orders separately.
# Attribute names need a LEFT BOUNDARY — `[^>]*name` alone also matches
# the tail of data-name/aria-name and `[^>]*content` the tail of
# data-content, injecting spurious pairs (code-review r5 #5). No
# lookbehind in the Java∩RE2 subset, so the boundary is an explicit
# separator char: the attr is either first after `<meta\s` (optional
# group empty) or preceded by whitespace/quote.
META_KC_RE = (r"(?is)<meta\s(?:[^>]*[\s\"'])?(?:property|name)"
              r"\s*=\s*[\"']([^\"']+)[\"']"
              r"[^>]*[\s\"']content\s*=\s*[\"']([^\"']*)[\"']")
META_CK_RE = (r"(?is)<meta\s(?:[^>]*[\s\"'])?content"
              r"\s*=\s*[\"']([^\"']*)[\"']"
              r"[^>]*[\s\"'](?:property|name)\s*=\s*[\"']([^\"']+)[\"']")
TAG_STRIP_RE = r"<[^>]+>"


def extract_html_links(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "page_id",
    keep_cols: tuple = (),
) -> DataFrame:
    """(id, href, anchor) for every ``<a href=…>…</a>`` in ``html_col`` —
    the crawl-side analog of the reference's PageLinksExtractor (its
    input carries links as wikitext ``[[…]]``; a crawl carries them as
    anchors). Anchor text is inner-tag-stripped and trimmed. One scan,
    whole-stage codegen end to end, one explode, zero shuffles — link
    graphs at crawl scale are built by feeding this into
    operators/graph.py, which owns its own partitioning."""
    _check_keep_cols(keep_cols, ("id", "href", "anchor"))
    h = F.coalesce(_html_str(df, html_col), F.lit(""))
    pairs = F.arrays_zip(
        F.regexp_extract_all(h, F.lit(HTML_A_RE), F.lit(1)),
        F.regexp_extract_all(h, F.lit(HTML_A_RE), F.lit(2)),
    )
    return (
        df.select(F.col(id_col).alias("id"), *keep_cols,
                  F.explode(pairs).alias("_p"))
        .select(
            "id",
            F.col("_p.0").alias("href"),
            F.trim(
                F.regexp_replace(F.col("_p.1"), TAG_STRIP_RE, "")
            ).alias("anchor"),
            *keep_cols,
        )
    )


def extract_meta_tags(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "page_id",
    keep_cols: tuple = (),
) -> DataFrame:
    """(id, key, content) for every ``<meta property=…/name=… content=…>``
    tag — Open Graph / twitter-card / description metadata, the page-level
    facts (title, type, canonical image, locale) a webtext KG attaches to
    the page node itself. Handles both attribute orders; one scan, zero
    Python, zero shuffles."""
    _check_keep_cols(keep_cols, ("id", "key", "content"))
    h = F.coalesce(_html_str(df, html_col), F.lit(""))
    kc = F.arrays_zip(
        F.regexp_extract_all(h, F.lit(META_KC_RE), F.lit(1)),
        F.regexp_extract_all(h, F.lit(META_KC_RE), F.lit(2)),
    )
    ck = F.arrays_zip(
        F.regexp_extract_all(h, F.lit(META_CK_RE), F.lit(2)),
        F.regexp_extract_all(h, F.lit(META_CK_RE), F.lit(1)),
    )
    return (
        df.select(
            F.col(id_col).alias("id"), *keep_cols,
            F.explode(F.concat(kc, ck)).alias("_p"),
        )
        .select("id", F.col("_p.0").alias("key"),
                F.col("_p.1").alias("content"), *keep_cols)
    )


def web_page_triples(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    id_col: str = "page_id",
    tables: bool = True,
) -> DataFrame:
    """The full crawl-page → KG step: one (id, subj, pred, obj, obj_kind)
    triple set combining every embedded-structured-data channel this
    module extracts —

    * ``(page, links_to, href)`` for each ``<a href>`` outlink,
    * ``(page, <meta key>, content)`` for each Open Graph / name= tag,
    * the JSON-LD entity triples verbatim (their own @id/bnode subjects),
    * the HTML5 microdata entity triples (itemscope/itemprop —
      ``operators/microdata``; its ``_:m…`` bnode labels are disjoint
      from JSON-LD's ``_:b…`` by construction),
    * the RDFa-lite entity triples (vocab/typeof/property —
      ``operators/rdfa``; generated ``_:r…`` bnode labels, disjoint
      from both),
    * ``(page, has_entity, <root>)`` anchoring each root JSON-LD node /
      top-level microdata scope / root RDFa subject to the page that
      published it — the provenance edge a downstream sameAs/linking
      pass joins on,
    * (``tables=True``, default) the WebTables channel — row-key facts
      from ``<th>``-headed relational tables plus one
      ``(page, mentions, key)`` edge per distinct key per page
      (:func:`_table_channel`; keys are surface-form mentions, the
      entity-linking input, not resolved nodes).

    The page node is ``url_col``, attached via the extractors'
    ``keep_cols`` passthrough (no join-back). Every channel is a
    shuffle-free scan+project, and the whole composite has exactly TWO
    Python stages: the JSON-LD flatten (which ships only the extracted
    script blocks through Arrow) and the fused microdata+RDFa scanner
    (:func:`extract_entity_markup` — one html transfer for both
    syntaxes; running them as separate channels re-ships the full html
    column and measurably caps multi-core scaling). Entity channels
    compute their page-local root markers INSIDE their scan UDFs
    (``emit_roots=True`` → :func:`append_root_markers`) and ONE
    projection per channel — the sole consumer of each UDF output —
    rewrites each ``obj_kind='root'`` marker to its
    ``(url, has_entity, root)`` provenance edge. Zero shuffles, zero checkpoints, nothing consumes
    a Python stage twice. An earlier revision derived roots
    relationally (eager localCheckpoint + distinct + left-anti
    self-join over the triple set); the checkpoint barrier plus two
    entity-keyed exchanges capped the composite's multi-core scaling at
    ~0.4 while every individual channel scaled ≥0.8 — a page can answer
    "which of my subjects are roots" in O(page) memory, so no
    corpus-wide exchange should exist. (A fully fused single-scan
    variant building per-channel struct arrays with ``F.transform`` was
    also tried and rejected: higher-order array functions are
    CodegenFallback — interpreted per row — and cost more than the
    extra codegen'd scans they save.)
    """
    links = extract_html_links(
        df, html_col=html_col, id_col=id_col, keep_cols=(url_col,)
    ).select(
        "id", F.col(url_col).alias("subj"), F.lit("links_to").alias("pred"),
        F.col("href").alias("obj"), F.lit("uri").alias("obj_kind"),
    )
    metas = extract_meta_tags(
        df, html_col=html_col, id_col=id_col, keep_cols=(url_col,)
    ).select(
        "id", F.col(url_col).alias("subj"), F.col("key").alias("pred"),
        F.col("content").alias("obj"), F.lit("literal").alias("obj_kind"),
    )
    entities = _rewrite_root_markers(
        extract_jsonld(df, html_col=html_col, id_col=id_col,
                       keep_cols=(url_col,), emit_roots=True),
        url_col,
    )
    markup = _rewrite_root_markers(
        extract_entity_markup(df, html_col=html_col, id_col=id_col,
                              keep_cols=(url_col,), emit_roots=True),
        url_col,
    )
    out = (links.unionByName(metas).unionByName(entities)
           .unionByName(markup))
    if tables:
        out = out.unionByName(_table_channel(df, html_col, id_col, url_col))
    return out


def _table_channel(df: DataFrame, html_col: str, id_col: str,
                   url_col: str) -> DataFrame:
    """The WebTables face of ``web_page_triples``: row-key facts from
    ``<th>``-headed tables plus one ``(url, mentions, key)`` provenance
    edge per distinct key per page. Table row keys are surface-form
    MENTIONS (``obj_kind='mention'``), not resolved entities — the
    linking / NIL-clustering passes consume them, in contrast to the
    JSON-LD/microdata/RDFa channels whose subjects are self-identified
    uri/bnode nodes. Single consumer of the cell-scan UDF (marker rows
    rewritten in the same projection), zero added shuffles; pages
    without ``<table`` never reach the Python stage."""
    cells = html_table_cells(df, html_col=html_col, id_col=id_col,
                             keep_cols=(url_col,), emit_keys=True)
    is_key = F.col("col") == -1
    return (
        cells.filter(is_key | ((F.col("col") > 0) & (F.col("row_key") != "")
                               & ~F.col("header").rlike(r"^col\d+$")))
        .select(
            "id",
            F.when(is_key, F.col(url_col))
            .otherwise(F.col("row_key")).alias("subj"),
            F.when(is_key, F.lit("mentions"))
            .otherwise(F.col("header")).alias("pred"),
            F.when(is_key, F.col("row_key"))
            .otherwise(F.col("value")).alias("obj"),
            F.when(is_key, F.lit("mention"))
            .otherwise(F.lit("literal")).alias("obj_kind"),
        )
    )


def extract_entity_markup(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "page_id",
    keep_cols: tuple = (),
    emit_roots: bool = False,
) -> DataFrame:
    """Microdata AND RDFa triples in ONE Python stage — the fused
    attribute-markup channel ``web_page_triples`` uses.

    The standalone operators (operators/microdata.extract_microdata,
    operators/rdfa.extract_rdfa) each ship the FULL html column through
    Arrow; on a page corpus that transfer — not the scan — dominates the
    Python stage, so running them as separate channels pays it twice
    plus a second scan stage and worker-pool round. This fusion sends
    html once behind the union of the two prefilters and gates each
    scanner per page with a plain substring/regex test (cheap against
    the transfer it avoids). Root markers (``emit_roots``) are computed
    over the COMBINED per-page triple list, which is strictly more
    precise provenance: an entity referenced as an object by EITHER
    syntax on the page is not a root. Bnode labels stay disjoint
    (``_:m…`` vs ``_:r…``), so the two scanners cannot collide."""
    import re as _re

    from .microdata import _scan_page as _md_scan
    from .rdfa import _PREFILTER_RE, _scan_page as _rdfa_scan

    _check_keep_cols(keep_cols, ("id", "subj", "pred", "obj", "obj_kind"))
    h = F.coalesce(_html_str(df, html_col), F.lit(""))
    marked = df.select(
        F.col(id_col).alias("id"), *keep_cols, h.alias("_h")
    ).filter(
        # case-insensitive gates: HTML attr names are case-insensitive
        # and both scanners lowercase them (code-review r5 #8)
        (F.instr(F.lower("_h"), "itemscope") > 0)
        | F.col("_h").rlike(_PREFILTER_RE)
    )
    rdfa_mark = _re.compile(_PREFILTER_RE)
    md_mark = _re.compile(r"(?i)itemscope")

    @F.pandas_udf(ArrayType(_TRIPLE))
    def scan(html: pd.Series, rid: pd.Series) -> pd.Series:
        out = []
        for x, i in zip(html, rid):
            t: list = []
            if x:
                if md_mark.search(x):
                    t.extend(_md_scan(x, i))
                if rdfa_mark.search(x):
                    t.extend(_rdfa_scan(x, i))
                if emit_roots and t:
                    try:
                        append_root_markers(t)
                    except (ValueError, TypeError, MemoryError):
                        pass
            out.append(t)
        return pd.Series(out)

    return (
        marked.select("id", *keep_cols,
                      F.explode(scan("_h", "id")).alias("_t"))
        .select("id", "_t.subj", "_t.pred", "_t.obj", "_t.obj_kind",
                *keep_cols)
    )


def _rewrite_root_markers(ents: DataFrame, url_col: str) -> DataFrame:
    """One projection turning each ``obj_kind='root'`` marker row into
    its ``(url, has_entity, root, kind)`` provenance edge while passing
    ordinary triples through — the single consumer of an entity-channel
    UDF output (marker layout per :func:`append_root_markers`: subj =
    root, obj = the root's own uri/bnode kind)."""
    is_root = F.col("obj_kind") == "root"
    return ents.select(
        "id",
        F.when(is_root, F.col(url_col)).otherwise(F.col("subj"))
        .alias("subj"),
        F.when(is_root, F.lit("has_entity")).otherwise(F.col("pred"))
        .alias("pred"),
        F.when(is_root, F.col("subj")).otherwise(F.col("obj")).alias("obj"),
        F.when(is_root, F.col("obj")).otherwise(F.col("obj_kind"))
        .alias("obj_kind"),
    )


# ---------------------------------------------------------------------------
# pure-Catalyst HTML extractors: tables and main-content (boilerplate) blocks
# ---------------------------------------------------------------------------
# Same regex discipline as the link/meta extractors above: Java-regex ∩
# RE2 (no lookaround, no backrefs in MATCH patterns) so DuckDB oracles
# re-run the exact semantics. Nested <table> is a documented subset
# limitation: the lazy body stops at the first </table> (crawl layout
# tables nest rarely; a DOM build is not worth leaving codegen for).

TABLE_RE = r"(?is)<table[^>]*>(.*?)</table>"
TR_RE = r"(?is)<tr[^>]*>(.*?)</tr>"
CELL_RE = r"(?is)<t([dh])[^>]*>(.*?)</t[dh]\s*>"
# block-level boundaries for main_content: split, don't match bodies
BLOCK_SPLIT_RE = (r"(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|table|tr|td|th|"
                  r"section|article|aside|nav|header|footer|blockquote|"
                  r"pre|figure)\b[^>]*>")


def extract_tables(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "page_id",
    keep_cols: tuple = (),
) -> DataFrame:
    """(id, table_idx, row_idx, col_idx, is_header, cell) for every
    ``<td>``/``<th>`` cell of every ``<table>`` in ``html_col`` — the
    relational facts web pages publish as HTML tables, in the cell-grid
    form a downstream table-to-triples or table-QA stage consumes.

    Three nested posexplodes over three ``regexp_extract_all`` levels —
    whole-stage codegen end to end, zero Python, zero shuffles; indices
    are 0-based document order at each level. ``is_header`` is true for
    ``<th>`` cells: the tag letter and the body come from two capture
    groups of the SAME pattern, so the arrays are index-aligned and
    ``arrays_zip`` pairs them without re-matching. Cell text is
    inner-tag-stripped and trimmed (colspan/rowspan attributes are
    dropped with their tags — grid positions are source order, not
    rendered geometry; documented subset)."""
    _check_keep_cols(keep_cols, ("id", "table_idx", "row_idx", "col_idx",
                                 "is_header", "cell"))
    h = F.coalesce(_html_str(df, html_col), F.lit(""))
    cells = F.arrays_zip(
        F.regexp_extract_all(F.col("_row"), F.lit(CELL_RE), F.lit(1)),
        F.regexp_extract_all(F.col("_row"), F.lit(CELL_RE), F.lit(2)),
    )
    return (
        df.select(F.col(id_col).alias("id"), *keep_cols,
                  F.posexplode(F.regexp_extract_all(h, F.lit(TABLE_RE),
                                                    F.lit(1)))
                  .alias("table_idx", "_tbl"))
        .select("id", *keep_cols, "table_idx",
                F.posexplode(F.regexp_extract_all(F.col("_tbl"),
                                                  F.lit(TR_RE), F.lit(1)))
                .alias("row_idx", "_row"))
        .select("id", *keep_cols, "table_idx", "row_idx",
                F.posexplode(cells).alias("col_idx", "_c"))
        .select(
            "id", "table_idx", "row_idx", "col_idx",
            # lower(): CELL_RE matches (?i) but the capture keeps the
            # page's case — '<TH>' captures 'H' (code-review r5 wave-3 #2)
            (F.lower(F.col("_c.0")) == "h").alias("is_header"),
            F.trim(F.regexp_replace(F.col("_c.1"), TAG_STRIP_RE, ""))
            .alias("cell"),
            *keep_cols,
        )
    )


def main_content(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "page_id",
    keep_cols: tuple = (),
    min_chars: int = 30,
    max_link_density: float = 0.4,
) -> DataFrame:
    """Boilerplate segmentation: split ``html_col`` at block-level tag
    boundaries and score each block, the jusText/Boilerpipe-style
    shallow-text-features heuristic (Kohlschütter et al., WSDM 2010 —
    public algorithm; implemented from the paper's feature definitions,
    not any codebase). A block is ``kept`` (main content) when its
    stripped text has ≥ ``min_chars`` characters AND the fraction of
    those characters inside ``<a>`` anchors is ≤ ``max_link_density`` —
    short and link-dense blocks are navigation/footer chrome.

    Returns (id, block_idx, text, n_chars, link_density, kept) for every
    non-empty block; callers filter on ``kept`` (the full scored set is
    returned so curation can audit what was dropped). One scan: split →
    posexplode → per-block codegen expressions; the anchor-character sum
    is ``aggregate`` over ``regexp_extract_all`` — all JVM-side, zero
    Python, zero shuffles. ``link_density`` is clamped to 1.0: anchor
    bodies keep inline-tag text that block text stripping also keeps, so
    the ratio is exact, but a malformed page where the anchor regex
    matches MORE text than the block (unterminated ``<a``) must not
    produce >1 densities."""
    _check_keep_cols(keep_cols, ("id", "block_idx", "text", "n_chars",
                                 "link_density", "kept"))
    h = F.coalesce(_html_str(df, html_col), F.lit(""))
    text = F.trim(F.regexp_replace(F.col("_blk"), TAG_STRIP_RE, ""))
    link_chars = F.aggregate(
        F.transform(
            F.regexp_extract_all(F.col("_blk"), F.lit(HTML_A_RE), F.lit(2)),
            lambda a: F.length(F.trim(F.regexp_replace(a, TAG_STRIP_RE,
                                                       ""))),
        ),
        F.lit(0), lambda acc, x: acc + x,
    )
    return (
        df.select(F.col(id_col).alias("id"), *keep_cols,
                  F.posexplode(F.split(h, BLOCK_SPLIT_RE))
                  .alias("block_idx", "_blk"))
        .select("id", *keep_cols, "block_idx", text.alias("text"),
                link_chars.alias("_lc"))
        .filter(F.length("text") > 0)
        .select(
            "id", "block_idx", "text",
            F.length("text").alias("n_chars"),
            F.least(
                F.lit(1.0),
                F.col("_lc").cast("double") / F.length("text"),
            ).alias("link_density"),
            *keep_cols,
        )
        .withColumn(
            "kept",
            (F.col("n_chars") >= min_chars)
            & (F.col("link_density") <= max_link_density),
        )
    )


# ---------------------------------------------------------------------------
# pure-Catalyst HTML extractors: <link rel=…> relations and table→triples
# ---------------------------------------------------------------------------

# whole <link …> tags first; the per-tag attributes are then pulled with
# scalar regexp_extract AFTER the explode — attribute ORDER in the wild
# is arbitrary, and matching three attributes order-independently in one
# pattern needs 6 alternations, while per-attribute extraction over the
# (already tiny) exploded tag rows stays in whole-stage codegen.
LINK_TAG_RE = r"(?is)<link\s[^>]*>"
REL_ATTR_RE = r"""(?is)\brel\s*=\s*["']([^"']+)["']"""
HREF_ATTR_RE = r"""(?is)\bhref\s*=\s*["']([^"']+)["']"""
HREFLANG_ATTR_RE = r"""(?is)\bhreflang\s*=\s*["']([^"']+)["']"""


def extract_link_rels(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "page_id",
    keep_cols: tuple = (),
) -> DataFrame:
    """(id, rel, href, hreflang) for every ``<link rel=… href=…>`` tag —
    rel=canonical is the page's self-asserted canonical URL (the input
    ``operators/scrub.latest_capture``'s recrawl collapse keys on), and
    rel=alternate + hreflang is the crawl-side analog of the reference's
    InterLanguageLinksExtractor (reference: extraction/src/main/scala/
    org/dbpedia/extraction/mappings/InterLanguageLinksExtractor.scala —
    wiki dumps publish language editions as [[de:…]] links; web pages
    publish them as hreflang alternates).

    ``rel`` and ``hreflang`` are lower-cased (HTML attribute values are
    case-insensitive for these enumerated types); ``rel`` may be
    multi-valued ("alternate nofollow") and is returned verbatim after
    casing — callers filter with ``contains``. Tags without both a rel
    and an href are dropped. One scan, one explode, scalar
    ``regexp_extract`` per attribute after the explode: whole-stage
    codegen end to end, zero Python, zero shuffles."""
    _check_keep_cols(keep_cols, ("id", "rel", "href", "hreflang"))
    h = F.coalesce(_html_str(df, html_col), F.lit(""))
    tag = F.col("_tag")
    return (
        df.select(F.col(id_col).alias("id"), *keep_cols,
                  F.explode(F.regexp_extract_all(h, F.lit(LINK_TAG_RE),
                                                 F.lit(0))).alias("_tag"))
        .select(
            "id",
            F.lower(F.regexp_extract(tag, REL_ATTR_RE, 1)).alias("rel"),
            F.regexp_extract(tag, HREF_ATTR_RE, 1).alias("href"),
            F.lower(F.regexp_extract(tag, HREFLANG_ATTR_RE, 1))
            .alias("hreflang"),
            *keep_cols,
        )
        .filter((F.col("rel") != "") & (F.col("href") != ""))
    )


def table_triples(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    id_col: str = "page_id",
) -> DataFrame:
    """Header-keyed HTML tables → (id, subj, pred, obj) triples: the
    crawl-side analog of the reference's InfoboxExtractor (reference:
    extraction/src/main/scala/org/dbpedia/extraction/mappings/
    InfoboxExtractor.scala — wikitext key/value rows → properties; a web
    page publishes the same relational facts as header-rowed tables).

    Subset rule (deterministic, oracle-checkable): a table participates
    iff its FIRST row consists of ``<th>`` cells only (≥1 cell, no
    ``<td>``); every later row becomes one entity
    ``{url}#table{t}-row{r}`` with one triple per cell, predicate = the
    tag-stripped header of that column. Cells beyond the header width
    are dropped (ragged bodies), as are empty predicates. Nested tables
    share :data:`TABLE_RE`'s documented first-``</table>`` limitation.

    Shape: posexplode tables → posexplode body rows → posexplode cells,
    each level a ``regexp_extract_all`` in whole-stage codegen; the raw
    header array rides along and the predicate is resolved per OUTPUT
    row with scalar ``element_at`` + tag-strip (no higher-order
    functions — they are CodegenFallback). Zero Python, zero shuffles.
    """
    h = F.coalesce(_html_str(df, html_col), F.lit(""))
    rows_of = lambda c: F.regexp_extract_all(c, F.lit(TR_RE), F.lit(1))  # noqa: E731
    # try_element_at: a <table> block with zero <tr> rows yields an empty
    # _rows array, and plain element_at on it THROWS under ANSI mode (the
    # Spark 4 default) — one hostile page must never fail the job
    # (code-review r5 #2); the NULL propagates into _hdr_cells and the
    # hdr_ok filter drops the table.
    hdr = F.try_element_at(F.col("_rows"), F.lit(1))
    hdr_ok = (
        (F.size(F.col("_hdr_cells")) > 0)
        # a first row is a pure header iff every cell tag letter is 'h';
        # lower() the captures — '<TD>' captures 'D' and would dodge the
        # 'd' test, misclassifying a data row as a header (code-review
        # r5 wave-3 #2)
        & ~F.array_contains(
            F.transform(
                F.regexp_extract_all(hdr, F.lit(CELL_RE), F.lit(1)),
                F.lower,
            ),
            "d",
        )
    )
    pred_raw = F.element_at(F.col("_hdrs"), F.col("col_idx") + 1)
    return (
        df.select(F.col(id_col).alias("id"), F.col(url_col).alias("_u"),
                  F.posexplode(F.regexp_extract_all(h, F.lit(TABLE_RE),
                                                    F.lit(1)))
                  .alias("table_idx", "_tbl"))
        .select("id", "_u", "table_idx", rows_of(F.col("_tbl")).alias("_rows"))
        .withColumn("_hdr_cells",
                    F.regexp_extract_all(hdr, F.lit(CELL_RE), F.lit(2)))
        .filter(hdr_ok)
        .select("id", "_u", "table_idx", F.col("_hdr_cells").alias("_hdrs"),
                F.posexplode(
                    F.slice(F.col("_rows"), 2,
                            F.greatest(F.size("_rows") - 1, F.lit(0))))
                .alias("_ridx", "_row"))
        .select("id", "_u", "table_idx", "_hdrs",
                (F.col("_ridx") + 1).alias("row_idx"),
                F.posexplode(F.regexp_extract_all(F.col("_row"),
                                                  F.lit(CELL_RE), F.lit(2)))
                .alias("col_idx", "_cell"))
        .filter(F.col("col_idx") < F.size("_hdrs"))
        .select(
            "id",
            F.concat(F.col("_u"), F.lit("#table"), F.col("table_idx"),
                     F.lit("-row"), F.col("row_idx")).alias("subj"),
            F.trim(F.regexp_replace(pred_raw, TAG_STRIP_RE, ""))
            .alias("pred"),
            F.trim(F.regexp_replace(F.col("_cell"), TAG_STRIP_RE, ""))
            .alias("obj"),
        )
        .filter(F.col("pred") != "")
    )


# ---------------------------------------------------------------------------
# Link analytics over the crawl link channel.
# ---------------------------------------------------------------------------

HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"


def host_graph(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    id_col: str = "page_id",
) -> DataFrame:
    """(src_host, dst_host, n_links) — the host-level link graph of a
    crawl, the input of the domain-granularity rank/spam passes (the
    reference aggregates the page graph the same way for its
    PageLinks post-processing — reference: extraction/src/main/scala/
    org/dbpedia/extraction/mappings/PageLinksExtractor.scala semantics,
    host-rolled). One scan + one explode (extract_html_links) feeding
    ONE hash aggregation: Catalyst plans a map-side partial count before
    the exchange, so shuffle volume is O(distinct host pairs), not
    O(links) — the 100 TB shape. Relative hrefs (no scheme) roll into
    the page's own host (intra-site links)."""
    links = extract_html_links(
        df, html_col=html_col, id_col=id_col, keep_cols=(url_col,)
    )
    src = F.regexp_extract(F.col(url_col), HOST_RE, 1)
    # protocol-relative links ('//other.com/x') name a CROSS-host target
    # even though HOST_RE (scheme-anchored) misses them; without this
    # branch they rolled into the page's own host as phantom self-edges
    # (code-review r5 wave-3 #8)
    dst_proto_rel = F.regexp_extract(F.col("href"), r"^//([^/?#]+)", 1)
    dst_abs = F.regexp_extract(F.col("href"), HOST_RE, 1)
    dst = (
        F.when(dst_abs != "", dst_abs)
        .when(dst_proto_rel != "", dst_proto_rel)
        .otherwise(src)
    )
    return (
        links.select(src.alias("src_host"), dst.alias("dst_host"))
        .filter(F.col("src_host") != "")
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def anchor_text_index(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "page_id",
    k: int = 3,
) -> DataFrame:
    """(href, anchor, n, rank) — the top-``k`` anchor texts per link
    target across the crawl, the web-side analog of the wiki anchor
    priors (operators/linking.anchor_priors): what the web CALLS a URL
    is the strongest naming signal for entity linking. Empty anchors
    (image links) are dropped. Two-stage: ONE hash aggregation over
    (href, anchor) with map-side partial counts, then a window ranked
    (n desc, anchor asc — deterministic ties) partitioned by href over
    the already-aggregated pair set, whose cardinality is
    O(distinct pairs) — both exchanges are post-reduction, never
    O(links). Hot targets (a URL the whole crawl links to) are a single
    reduced row per distinct anchor by the time they reach the window,
    so target-skew never concentrates raw link volume on one task."""
    links = extract_html_links(df, html_col=html_col, id_col=id_col)
    pairs = (
        links.filter(F.col("anchor") != "")
        .groupBy("href", "anchor")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("href").orderBy(
        F.col("n").desc(), F.col("anchor").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def corpus_from_crawl(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    id_col: str = "page_id",
    sep: str = "\n\n",
    min_chars: int = 30,
    max_link_density: float = 0.4,
) -> DataFrame:
    """(doc_id, url, text, n_chars, n_blocks): the crawl → TRAINING-
    CORPUS bridge — :func:`main_content`'s kept blocks reassembled in
    document order into the ``documents`` schema the curation stack
    consumes (``plans/curate.CurationPipeline``: hygiene → gopher →
    dedup → pack), the way the wiki path's AbstractExtractor feeds text
    datasets (reference: extraction/src/main/scala/org/dbpedia/
    extraction/mappings/ — page markup in, publishable text out).

    Pages with ZERO kept blocks (pure chrome) are DROPPED — a document
    with no main content has nothing to train on, and emitting empty
    rows would poison downstream length statistics.

    Shape: the segmentation is the same zero-shuffle scan
    ``main_content`` runs; the only added shuffle is the per-page
    reassembly groupBy (map-side combined collect_list over the few
    kept blocks a page has)."""
    blocks = main_content(
        df, html_col=html_col, id_col=id_col, keep_cols=(url_col,),
        min_chars=min_chars, max_link_density=max_link_density,
    )
    rebuilt = (
        blocks.filter(F.col("kept"))
        .groupBy("id")
        .agg(
            F.min(url_col).alias("url"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("block_idx", "text"))
                    ),
                    lambda s: s["text"],
                ),
                sep,
            ).alias("text"),
            F.count("*").alias("n_blocks"),
        )
    )
    return rebuilt.select(
        F.col("id").alias("doc_id"), "url", "text",
        F.length("text").alias("n_chars"),
        F.col("n_blocks").cast("int").alias("n_blocks"),
    )


# ---------------------------------------------------------------------------
# HTML tables → relational cells → WebTables-style triples
# ---------------------------------------------------------------------------
# The web's third machine-readable fact channel after JSON-LD and
# microdata/RDFa: relational <table> markup (Cafarella et al.,
# "WebTables: Exploring the Power of Tables on the Web", VLDB 2008 —
# attribute-name headers + an entity key column make each data row a
# bundle of (subj, pred, obj) facts). The reference's counterpart is the
# infobox extractor (reference: dump-extraction-framework's
# InfoboxExtractor consumes wikitext {{…}} key/value templates); a crawl
# corpus carries the same facts as <th>-headed tables.
#
# Parsing subset (deterministic, documented):
# * table blocks are isolated JVM-side with a lazy (?is)<table…>…</table>
#   regex — NESTED tables mis-split (outer block truncates at the inner
#   close tag); crawl-majority flat tables parse exactly, and a
#   mis-split block degrades to fewer rows, never a job failure;
# * rows split on <tr…>, cells on <th…>/<td…>; inner markup is
#   tag-stripped and trimmed; the five standard entities (&amp; &lt;
#   &gt; &quot; &#39;) and &nbsp; are decoded;
# * the header row is the FIRST row iff it contains a <th>; its cell
#   texts name the columns. Tables without a <th> first row get
#   positional headers col0, col1, …; data rows longer than the header
#   list also fall back to positional names for the overflow cells;
# * every data cell is emitted with its row's KEY (the col-0 cell text)
#   attached — computed page-locally in the same pandas batch that
#   parsed the table, so :func:`html_table_triples` is a pure
#   projection with ZERO added shuffles (the former design, a
#   key-cell⋈value-cell self-join on (id, tbl, row), re-keyed every
#   cell through an exchange to answer a question each row answers
#   about itself).

# one source of truth for table isolation and tag stripping: the
# Catalyst path (extract_tables/table_triples) and this pandas path
# must not drift apart (code-review r5 #10)
TABLE_BLOCK_RE = TABLE_RE

_CELL = StructType([
    StructField("tbl", IntegerType(), False),
    StructField("row", IntegerType(), False),
    StructField("col", IntegerType(), False),
    StructField("header", StringType(), False),
    StructField("value", StringType(), False),
    StructField("row_key", StringType(), False),
])

_ROW_SPLIT_RE = re.compile(r"(?is)<tr[^>]*>")
_CELL_RE = re.compile(r"(?is)<(t[hd])[^>]*>(.*?)</t[hd]\s*>")
_TAG_RE = re.compile(TAG_STRIP_RE)  # same pattern as the Catalyst path
_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"))


def _cell_text(raw: str) -> str:
    """Inner markup stripped, standard entities decoded, trimmed.
    &amp; decodes LAST so markup produced by double-escaping stays
    inert (the same order DuckDB's chained replace() oracle uses)."""
    s = _TAG_RE.sub("", raw)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return s.strip()


def _parse_tables(blocks: list, emit_keys: bool = False) -> list[tuple]:
    """One page's table blocks → cell tuples (see module comment for
    the parsing subset). Never raises — hostile markup degrades to
    fewer cells, never a job failure.

    ``emit_keys=True`` additionally emits ONE marker tuple
    ``(tbl, row, -1, "", "", key)`` at the first page-level occurrence
    of each non-empty row key of a ``<th>``-headed table — the
    page-local dedup that lets :func:`web_page_triples` attach one
    mention edge per distinct key without any corpus-wide exchange
    (same design as the entity channels' ``emit_roots`` markers)."""
    out: list[tuple] = []
    seen_keys: set = set()
    for tidx, block in enumerate(blocks):
        try:
            rows = []
            for chunk in _ROW_SPLIT_RE.split(block)[1:]:
                cells = _CELL_RE.findall(chunk)
                if cells:
                    rows.append(cells)
            if not rows:
                continue
            headers: list[str] = []
            if any(tag.lower() == "th" for tag, _ in rows[0]):
                headers = [_cell_text(body) for _, body in rows[0]]
                rows = rows[1:]
            for ridx, cells in enumerate(rows):
                texts = [_cell_text(body) for _, body in cells]
                key = texts[0] if texts else ""
                if (emit_keys and headers and key
                        and key not in seen_keys):
                    seen_keys.add(key)
                    out.append((tidx, ridx, -1, "", "", key))
                for cidx, text in enumerate(texts):
                    header = (headers[cidx] if cidx < len(headers)
                              else f"col{cidx}")
                    out.append((tidx, ridx, cidx, header, text, key))
        except (ValueError, TypeError, RecursionError):
            continue
    return out


def html_table_cells(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "page_id",
    keep_cols: tuple = (),
    emit_keys: bool = False,
) -> DataFrame:
    """(id, tbl, row, col, header, value, row_key) for every data cell
    of every ``<table>`` in ``html_col`` — the relational face of the
    WebTables channel (feed it to table-QA / schema-matching pipelines;
    :func:`html_table_triples` is the KG face).

    Shape: block isolation is a Catalyst ``regexp_extract_all`` (pages
    without ``<table`` never reach Python), the parse is one vectorized
    pandas UDF per page, one explode, ZERO shuffles. ``row`` counts
    data rows only (header row excluded), 0-based per table.

    ``emit_keys=True`` interleaves marker rows (``col = -1``, empty
    header/value) carrying each page's distinct ``<th>``-table row keys
    — consumed by :func:`web_page_triples`'s mention rewrite; plain
    relational callers keep the default."""
    _check_keep_cols(
        keep_cols, ("id", "tbl", "row", "col", "header", "value", "row_key"))
    blocks = (
        df.select(
            F.col(id_col).alias("id"), *keep_cols,
            F.regexp_extract_all(_html_str(df, html_col),
                                 F.lit(TABLE_BLOCK_RE), F.lit(1))
            .alias("_blocks"),
        )
        .filter(F.size("_blocks") > 0)
    )

    @F.pandas_udf(ArrayType(_CELL))
    def parse(blks: pd.Series) -> pd.Series:
        return pd.Series([_parse_tables(b, emit_keys=emit_keys)
                          for b in blks])

    return (
        blocks.select("id", *keep_cols, F.explode(parse("_blocks")).alias("_c"))
        .select("id", "_c.tbl", "_c.row", "_c.col", "_c.header", "_c.value",
                "_c.row_key", *keep_cols)
    )


def html_table_triples(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "page_id",
    keep_cols: tuple = (),
) -> DataFrame:
    """WebTables-style facts: each data row of a ``<th>``-headed table
    reads as (row-key entity, column header, cell value) — the crawl
    analog of the reference's InfoboxExtractor template facts
    (reference: extraction/…/InfoboxExtractor consumes wikitext {{…}}
    key/value pairs; the web publishes the same facts as tables).

    Pure projection over :func:`html_table_cells` — the row key rides
    on every cell, so NO join/shuffle is added. Emits only cells from
    header-named columns (positional ``col{j}`` headers carry no
    predicate semantics) with col > 0 and a non-empty key."""
    cells = html_table_cells(df, html_col=html_col, id_col=id_col,
                             keep_cols=keep_cols)
    return (
        cells.filter((F.col("col") > 0) & (F.col("row_key") != "")
                     & ~F.col("header").rlike(r"^col\d+$"))
        .select("id", F.col("row_key").alias("subj"),
                F.col("header").alias("pred"), F.col("value").alias("obj"),
                "tbl", "row", *keep_cols)
    )


# ---------------------------------------------------------------------------
# WebTables analysis: column profiles, subject detection, typed facts
# ---------------------------------------------------------------------------
# The ACSDb-style layer over the raw cell scan (Cafarella et al., VLDB
# 2008 §3: per-column statistics → subject-column detection → schema
# statistics). The reference's analog is the infobox extractor's
# datatype guessing (InfoboxExtractor int/double/date/unit rules) —
# typed_table_facts applies the SAME rule table (schema.UNIT_DATATYPES)
# to table cell values so both fact channels publish comparable typed
# literals.

_NUMERIC_CELL_RE = r"^-?[0-9][0-9,]*(\.[0-9]+)?$"
_POSITIONAL_HEADER_RE = r"^col\d+$"


def table_column_profile(cells: DataFrame, id_col: str = "id") -> DataFrame:
    """Per (page, table, column) statistics over a
    :func:`html_table_cells` scan: cell count, non-empty count, numeric
    count (int/double lexicals, comma grouping allowed), distinct
    count. The WebTables column profile feeding subject detection and
    schema matching.

    Shape: ONE hash aggregate on (id, tbl, col, header) — header is
    constant within a column so keying on it adds no groups; partial
    (map-side) aggregation applies, so the exchange carries one row per
    column, not per cell."""
    v = F.col("value")
    return cells.groupBy(id_col, "tbl", "col", "header").agg(
        F.count("*").alias("n_cells"),
        F.sum((v != "").cast("long")).alias("n_nonempty"),
        F.sum(v.rlike(_NUMERIC_CELL_RE).cast("long")).alias("n_numeric"),
        F.countDistinct(v).alias("n_distinct"),
    )


def table_subject_columns(
    profile: DataFrame,
    id_col: str = "id",
    max_numeric_ratio: float = 0.5,
) -> DataFrame:
    """Subject-column detection (WebTables §4.1: the entity column is a
    mostly-distinct, mostly-non-numeric named column — often but NOT
    always the leftmost). Among header-named columns with
    ``n_numeric <= max_numeric_ratio * n_cells``, picks per (page,
    table) the highest distinct ratio, ties to the lower column index.

    Shape: a row_number window on (id, tbl) over the column-sized
    profile — the exchange moves one row per column."""
    cand = profile.filter(
        ~F.col("header").rlike(_POSITIONAL_HEADER_RE)
        & (F.col("n_numeric")
           <= F.lit(max_numeric_ratio) * F.col("n_cells"))
    )
    w = Window.partitionBy(id_col, "tbl").orderBy(
        (F.col("n_distinct").cast("double") / F.col("n_cells")).desc(),
        F.col("col").asc(),
    )
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(id_col, "tbl", F.col("col").alias("key_col"),
                F.col("header").alias("key_header"))
    )


def table_entity_facts(cells: DataFrame, id_col: str = "id",
                       max_numeric_ratio: float = 0.5) -> DataFrame:
    """Row-key facts with a DETECTED subject column:
    (page, tbl, row, subj, pred, obj) where subj is the row's value in
    the table's detected entity column — upgrades
    :func:`html_table_triples` (which assumes column 0 keys) for
    rank-first / id-first tables.

    Shape: profile agg (column-sized) → two equi-joins back to the cell
    scan on (id, tbl) then (id, tbl, row). Both joins key on compact
    scalars; at crawl scale AQE broadcast-promotes the column-sized
    subject map, leaving one cell-sized exchange."""
    # three consumers (the column profile, the key projection, the final
    # fact join) — un-pinned, each re-ran the Arrow table-parse pass
    # (plan audit: the parse UDF executed 3× in the gate); one lazy
    # materialization of the cell table instead
    cells = cells.localCheckpoint(eager=False)
    subj_cols = table_subject_columns(
        table_column_profile(cells, id_col=id_col), id_col=id_col,
        max_numeric_ratio=max_numeric_ratio)
    keys = (
        cells.join(subj_cols, on=[id_col, "tbl"])
        .filter((F.col("col") == F.col("key_col")) & (F.col("value") != ""))
        .select(id_col, "tbl", "row", F.col("value").alias("subj"),
                "key_col")
    )
    return (
        cells.filter(~F.col("header").rlike(_POSITIONAL_HEADER_RE))
        .join(keys, on=[id_col, "tbl", "row"])
        .filter(F.col("col") != F.col("key_col"))
        .select(id_col, "tbl", "row", "subj",
                F.col("header").alias("pred"), F.col("value").alias("obj"))
    )


def typed_table_facts(facts: DataFrame, value_col: str = "obj") -> DataFrame:
    """Datatype guessing over table fact objects — the infobox
    extractor's rule table applied to the WebTables channel (reference:
    InfoboxExtractor's int/double/date/unit value guessing; same
    regexes, same ``schema.UNIT_DATATYPES`` suffix map, so both
    channels' typed literals fuse cleanly).

    Replaces ``value_col`` with its canonical lexical (comma grouping
    stripped from numerics, the unit suffix split off) and adds a
    ``datatype`` URI column: xsd:integer / xsd:double / xsd:date / a
    unit datatype / xsd:string. Pure Catalyst projection — zero
    shuffles, no Python."""
    from ..schema import XSD_DATE, XSD_DOUBLE, XSD_INTEGER, XSD_STRING
    from .extractors import (_DATE_RE, _DBL_RE, _INT_RE, _UNIT_RE,
                             _unit_datatype)

    v = F.col(value_col)
    lex = (
        F.when(v.rlike(_INT_RE) | v.rlike(_DBL_RE),
               F.regexp_replace(v, ",", ""))
        .when(v.rlike(_UNIT_RE),
              F.regexp_replace(F.regexp_extract(v, _UNIT_RE, 1), ",", ""))
        .otherwise(v)
    )
    dt = (
        F.when(v.rlike(_INT_RE), F.lit(XSD_INTEGER))
        .when(v.rlike(_DBL_RE), F.lit(XSD_DOUBLE))
        .when(v.rlike(_DATE_RE), F.lit(XSD_DATE))
        .when(v.rlike(_UNIT_RE),
              _unit_datatype(F.regexp_extract(v, _UNIT_RE, 2)))
        .otherwise(F.lit(XSD_STRING))
    )
    others = [c for c in facts.columns if c != value_col]
    return facts.select(*others, lex.alias(value_col),
                        dt.alias("datatype"))
