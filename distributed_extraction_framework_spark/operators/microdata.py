"""HTML5 microdata extraction: ``itemscope``/``itemtype``/``itemprop``
markup → RDF triples.

The third embedded-structured-data channel of a web crawl, alongside
JSON-LD (operators/structured_data.extract_jsonld) and the flat
``<meta>`` tags (extract_meta_tags). The reference framework's analog is
the template/infobox extractor family (reference: extraction/src/main/
scala/org/dbpedia/extraction/mappings/InfoboxExtractor.scala — wikitext
key/value structure → triples); a crawl page carries the same
machine-readable key/value structure as microdata attributes scattered
through the element tree, so extraction is a single linear pass over the
tag stream with an element stack — the WHATWG microdata model, reduced
to the deterministic subset below.

Execution shape (100 TB-safe):

* a Catalyst ``contains(html, 'itemscope')`` prefilter runs JVM-side in
  whole-stage codegen, so Python never touches pages without microdata
  (the common case — the Arrow transfer carries only marked-up pages);
* the scan itself is a vectorized ``pandas_udf`` (Arrow batches) doing
  ONE forward pass per page — no DOM build, no backtracking; memory is
  O(open-element depth), not O(page bytes);
* output is the same (id, subj, pred, obj, obj_kind) quintuple shape as
  extract_jsonld, so fusion/canonicalization layers downstream are
  channel-agnostic. Zero shuffles introduced.

Documented subset of the WHATWG microdata-to-RDF algorithm:

* an ``itemscope`` element creates a node: subject = its ``itemid``
  value (kind ``uri``) if present, else the deterministic blank label
  ``_:m{id}_{seq}`` with ``seq`` the document-order index of
  itemid-less scopes on that page (kind ``bnode``);
* ``itemtype`` (space-separated) emits one rdf:type triple per type;
* an element carrying BOTH ``itemprop`` and ``itemscope`` links the
  nearest enclosing scope to the new node — one triple per
  space-separated property name;
* ``itemprop`` without ``itemscope`` takes its value from, in order:
  a ``content`` attribute (literal); the tag's URL attribute (``href``
  on a/link/area, ``src`` on img/audio/video/iframe/embed/source,
  ``data`` on object — kind ``uri``); ``datetime`` on time (literal);
  otherwise the element's text content with runs of whitespace
  collapsed to single spaces and trimmed (literal). Void/self-closed
  elements with none of these yield the empty literal;
* text content excludes ``<script>``/``<style>`` bodies and comments
  (stripped before the scan — they are not rendered text);
* ``itemprop`` outside any open scope is ignored (no subject to attach
  to), as are ``itemref`` graphs (cross-tree references need the full
  DOM and are vanishingly rare in crawl data — documented limitation);
* unclosed elements are implicitly closed at end-of-document; stray
  closing tags with no matching open element are ignored. Crawl HTML
  is hostile: nothing in this scan can raise.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from .structured_data import (RDF_TYPE, _TRIPLE, _check_keep_cols,
                              _html_str, append_root_markers)

# quote-aware tag tokenizer: '>' inside a quoted attribute value does
# not terminate the tag. Group 1 = '/' for closing tags, 2 = name,
# 3 = attribute span, 4 = '/' for self-closing.
_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9:-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*?)(/?)>",
    re.S,
)
_ATTR_RE = re.compile(
    r"([a-zA-Z_][-a-zA-Z0-9_:.]*)"
    r"(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s\"'>]+)))?",
    re.S,
)
_STRIP_RE = re.compile(r"(?is)<(script|style)\b.*?</\1\s*>|<!--.*?-->")
_WS_RE = re.compile(r"\s+")

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr"
    .split()
)
_URL_ATTR = {
    "a": "href", "link": "href", "area": "href",
    "img": "src", "audio": "src", "video": "src",
    "iframe": "src", "embed": "src", "source": "src",
    "object": "data",
}


def _parse_attrs(span: str) -> dict:
    """Attribute span → {lower-name: value}; bare attributes (itemscope)
    map to ''. First occurrence wins, as in an HTML parser."""
    out: dict = {}
    for m in _ATTR_RE.finditer(span):
        name = m.group(1).lower()
        if name not in out:
            v = m.group(2)
            if v is None:
                v = m.group(3)
            if v is None:
                v = m.group(4)
            out[name] = v if v is not None else ""
    return out


def _scan_page(html: str, rid, emit_roots: bool = False) -> list[tuple]:
    """One forward pass; returns (subj, pred, obj, obj_kind) in document
    order. Never raises — see module docstring. ``emit_roots`` appends
    the page-local root markers shared with the JSON-LD channel
    (structured_data.append_root_markers): top-level scopes are roots,
    nested scopes are objects of their parent link and therefore are
    not."""
    try:
        out = _scan_page_unsafe(html, rid)
    except (ValueError, TypeError, RecursionError, MemoryError):
        return []
    if emit_roots:
        try:
            append_root_markers(out)
        except (ValueError, TypeError, MemoryError):
            pass
    return out


def _scan_page_unsafe(html: str, rid) -> list[tuple]:
    html = _STRIP_RE.sub("", html or "")
    out: list[tuple] = []
    # stack frames: [tag, scope_subj_or_None, capture_or_None]
    # capture: [parent_subj, (prop, ...), [text chunks]]
    stack: list[list] = []
    scopes: list[str] = []          # enclosing itemscope subjects
    captures: list[list] = []       # open text captures (nested ok)
    seq = 0                         # bnode counter, document order
    pos = 0

    def close_frame(frame: list) -> None:
        if frame[2] is not None:
            parent, props, chunks = frame[2]
            text = _WS_RE.sub(" ", "".join(chunks)).strip()
            for p in props:
                out.append((parent, p, text, "literal"))
            # remove by IDENTITY: list.remove compares by value, and two
            # nested captures can be equal while both buffers are empty —
            # removing the wrong one would misroute later text chunks
            for j in range(len(captures) - 1, -1, -1):
                if captures[j] is frame[2]:
                    del captures[j]
                    break
        if frame[1] is not None:
            scopes.pop()

    for m in _TAG_RE.finditer(html):
        if m.start() > pos and captures:
            chunk = html[pos:m.start()]
            for cap in captures:
                cap[2].append(chunk)
        pos = m.end()
        closing, tag, span, self_end = m.groups()
        tag = tag.lower()
        if closing:
            # pop to the matching open tag, implicitly closing inner
            # frames; ignore a close with no matching open
            for i in range(len(stack) - 1, -1, -1):
                if stack[i][0] == tag:
                    while len(stack) > i:
                        close_frame(stack.pop())
                    break
            continue

        attrs = _parse_attrs(span)
        self_close = bool(self_end) or tag in _VOID_TAGS
        node_subj = None
        capture = None
        if "itemscope" in attrs:
            itemid = attrs.get("itemid", "")
            if itemid:
                node_subj, kind = itemid, "uri"
            else:
                node_subj, kind = f"_:m{rid}_{seq}", "bnode"
                seq += 1
            props = attrs.get("itemprop", "").split()
            if props and scopes:
                for p in props:
                    out.append((scopes[-1], p, node_subj, kind))
            for t in attrs.get("itemtype", "").split():
                out.append((node_subj, RDF_TYPE, t, "uri"))
        elif "itemprop" in attrs and scopes:
            props = tuple(attrs["itemprop"].split())
            if props:
                parent = scopes[-1]
                url_attr = _URL_ATTR.get(tag)
                if "content" in attrs:
                    val, kind = attrs["content"], "literal"
                elif url_attr and url_attr in attrs:
                    val, kind = attrs[url_attr], "uri"
                elif tag == "time" and "datetime" in attrs:
                    val, kind = attrs["datetime"], "literal"
                elif self_close:
                    val, kind = "", "literal"
                else:
                    val = None
                    capture = [parent, props, []]
                    captures.append(capture)
                if val is not None:
                    for p in props:
                        out.append((parent, p, val, kind))

        if not self_close:
            stack.append([tag, node_subj, capture])
            if node_subj is not None:
                scopes.append(node_subj)
        # a self-closed itemscope is a childless node: triples above
        # already emitted; nothing to push

    if pos < len(html) and captures:
        # trailing text after the last tag (unclosed element at EOF)
        tail = html[pos:]
        for cap in captures:
            cap[2].append(tail)
    while stack:  # implicit close at end of document
        close_frame(stack.pop())
    return out


def extract_microdata(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "page_id",
    keep_cols: tuple = (),
    emit_roots: bool = False,
) -> DataFrame:
    """(id, subj, pred, obj, obj_kind[, *keep_cols]) triples from HTML5
    microdata markup in ``html_col``. See module docstring for the
    extraction subset and the scale shape. ``emit_roots=True`` appends
    page-local root markers (structured_data.append_root_markers) that
    ``web_page_triples`` rewrites to has_entity provenance edges."""
    _check_keep_cols(keep_cols, ("id", "subj", "pred", "obj", "obj_kind"))
    h = F.coalesce(_html_str(df, html_col), F.lit(""))
    # lower() first: attribute names are case-insensitive in HTML and
    # _parse_attrs lowercases them, so the prefilter must not drop
    # <DIV ITEMSCOPE ...> pages (code-review r5 #8)
    marked = df.select(
        F.col(id_col).alias("id"), *keep_cols, h.alias("_h")
    ).filter(F.instr(F.lower("_h"), "itemscope") > 0)

    @F.pandas_udf(ArrayType(_TRIPLE))
    def scan(html: pd.Series, rid: pd.Series) -> pd.Series:
        return pd.Series(
            [_scan_page(x, i, emit_roots) for x, i in zip(html, rid)]
        )

    return (
        marked.select("id", *keep_cols,
                      F.explode(scan("_h", "id")).alias("_t"))
        .select("id", "_t.subj", "_t.pred", "_t.obj", "_t.obj_kind",
                *keep_cols)
    )
