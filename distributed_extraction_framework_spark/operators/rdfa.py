"""RDFa-lite extraction: ``vocab``/``prefix``/``typeof``/``property``/
``about``/``resource`` markup → RDF triples.

The fourth embedded-structured-data channel of a web crawl, alongside
JSON-LD (operators/structured_data.extract_jsonld), HTML5 microdata
(operators/microdata) and flat ``<meta>`` tags (extract_meta_tags) —
schema.org and Open Graph publishers split roughly across the four. The
reference framework's analog is again the template/infobox extractor
family (reference: extraction/src/main/scala/org/dbpedia/extraction/
mappings/InfoboxExtractor.scala — structured key/value markup →
triples); RDFa carries the key/value structure as host-language
attributes, so extraction is the same single linear pass over the tag
stream with an element stack that operators/microdata uses — the W3C
RDFa-lite 1.1 processing model, reduced to the deterministic subset
below.

Execution shape (100 TB-safe) — identical to the microdata channel:

* a Catalyst ``rlike`` prefilter (pattern compiled once, whole-stage
  codegen) keeps Python away from pages without RDFa subject markers;
* the scan is a vectorized ``pandas_udf`` (Arrow batches) doing ONE
  forward pass per page — no DOM, no backtracking, memory O(depth);
* output is the shared (id, subj, pred, obj, obj_kind) quintuple, so
  fusion/canonicalization downstream is channel-agnostic. Zero shuffles.

Documented subset of the RDFa-lite 1.1 algorithm:

* ``vocab`` sets the in-scope vocabulary for the element and its
  descendants; a bare term in ``typeof``/``property`` resolves to
  ``vocab + term`` when a vocab is in scope, else is kept verbatim;
* ``prefix="pfx: iri …"`` adds CURIE mappings for the subtree; a
  ``pfx:local`` token resolves through the innermost mapping. Tokens
  containing ``://`` (absolute IRIs) are always kept verbatim;
* ``about`` establishes a new subject for the element and descendants
  (kind ``uri``, or ``bnode`` when written ``_:…``); ``typeof`` on the
  element types THAT subject, and ``property`` on the same element
  attaches its value (resource/href/src/content/text, in that order of
  preference) to that subject — RDFa 1.1 core, not a parent link;
* ``typeof`` without ``about``/``property`` establishes a new subject:
  ``resource`` value if present, else the deterministic blank label
  ``_:r{id}_{seq}`` (``seq`` = document-order index of generated
  nodes). One rdf:type triple per space-separated type token;
* ``property`` WITHOUT ``typeof`` emits, from the nearest enclosing
  subject: a ``resource`` object (uri) if present, else the tag's URL
  attribute (``href``/``src`` — uri), else a ``content`` attribute
  (literal), else the element's text content with whitespace collapsed
  (literal), excluding ``<script>``/``<style>`` bodies and comments;
* ``property`` WITH ``typeof`` (and no ``about``) is object chaining:
  a new node (``resource`` or generated bnode) becomes the object of
  the property AND the subject for descendants, and gets the rdf:type
  triples;
* ``property`` outside any established subject is ignored — document-
  level ``<meta property=…>`` (the og: family) is owned by the
  extract_meta_tags channel, which keys it to the page node;
* ``itemref``-style cross-tree features RDFa lacks anyway; unclosed
  elements close at end-of-document; stray closing tags are ignored.
  Crawl HTML is hostile: nothing in this scan can raise.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from .microdata import _STRIP_RE, _TAG_RE, _VOID_TAGS, _WS_RE, _parse_attrs
from .structured_data import (RDF_TYPE, _TRIPLE, _check_keep_cols,
                              _html_str, append_root_markers)

# subject-establishing markers; attribute values never contain an
# unescaped quote, so requiring a preceding separator keeps prose
# containing the word "about" out of the Python stage
# (?i): HTML attribute names are case-insensitive and the scanner
# lowercases them — a case-sensitive prefilter silently dropped pages
# with TYPEOF=/About= markup the scanner handles (code-review r5 #8)
_PREFILTER_RE = r"""(?i)[\s"'](typeof|about)\s*="""

_URL_ATTRS = ("href", "src")


def _scan_page(html: str, rid, emit_roots: bool = False) -> list[tuple]:
    """One forward pass; (subj, pred, obj, obj_kind) in document order.
    Never raises — see module docstring. ``emit_roots`` appends the
    page-local root markers shared with the JSON-LD/microdata channels
    (structured_data.append_root_markers)."""
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


def _resolve(token: str, vocab: str, prefixes: dict) -> str:
    """Term/CURIE resolution per the documented subset."""
    if "://" in token:
        return token
    if ":" in token:
        pfx, local = token.split(":", 1)
        base = prefixes.get(pfx)
        return base + local if base is not None else token
    return vocab + token if vocab else token


def _scan_page_unsafe(html: str, rid) -> list[tuple]:
    html = _STRIP_RE.sub("", html or "")
    out: list[tuple] = []
    # stack frames: [tag, pushed_subject(bool), capture_or_None,
    #                saved_vocab_or_None, saved_prefixes_or_None]
    stack: list[list] = []
    subjects: list[str] = []        # enclosing subject context
    captures: list[list] = []       # open text captures (nested ok)
    vocab = ""                      # in-scope @vocab
    prefixes: dict = {}             # in-scope CURIE map
    seq = 0                         # generated-bnode counter
    pos = 0

    def close_frame(frame: list) -> None:
        nonlocal vocab, prefixes
        if frame[2] is not None:
            parent, props, chunks = frame[2]
            text = _WS_RE.sub(" ", "".join(chunks)).strip()
            for p in props:
                out.append((parent, p, text, "literal"))
            # remove by identity (two empty captures compare equal)
            for j in range(len(captures) - 1, -1, -1):
                if captures[j] is frame[2]:
                    del captures[j]
                    break
        if frame[1]:
            subjects.pop()
        if frame[3] is not None:
            vocab = frame[3]
        if frame[4] is not None:
            prefixes = frame[4]

    for m in _TAG_RE.finditer(html):
        if m.start() > pos and captures:
            chunk = html[pos:m.start()]
            for cap in captures:
                cap[2].append(chunk)
        pos = m.end()
        closing, tag, span, self_end = m.groups()
        tag = tag.lower()
        if closing:
            for i in range(len(stack) - 1, -1, -1):
                if stack[i][0] == tag:
                    while len(stack) > i:
                        close_frame(stack.pop())
                    break
            continue

        attrs = _parse_attrs(span)
        self_close = bool(self_end) or tag in _VOID_TAGS

        saved_vocab = None
        if "vocab" in attrs:
            saved_vocab, vocab = vocab, attrs["vocab"]
        saved_prefixes = None
        if "prefix" in attrs:
            saved_prefixes = prefixes
            prefixes = dict(prefixes)
            toks = attrs["prefix"].split()
            for i in range(0, len(toks) - 1, 2):
                if toks[i].endswith(":"):
                    prefixes[toks[i][:-1]] = toks[i + 1]

        types = [_resolve(t, vocab, prefixes)
                 for t in attrs.get("typeof", "").split()]
        props = [_resolve(p, vocab, prefixes)
                 for p in attrs.get("property", "").split()]
        about = attrs.get("about")
        resource = attrs.get("resource")
        url_val = next((attrs[a] for a in _URL_ATTRS if attrs.get(a)), None)

        def kind_of(ref: str) -> str:
            return "bnode" if ref.startswith("_:") else "uri"

        new_subj = None
        capture = None
        if about is not None and about != "":
            # @about sets the subject for the element AND its own
            # @property values (RDFa 1.1 core), not a parent link
            new_subj = about
            for t in types:
                out.append((new_subj, RDF_TYPE, t, "uri"))
            if props:
                if resource:
                    val, kind = resource, kind_of(resource)
                elif url_val is not None:
                    val, kind = url_val, "uri"
                elif "content" in attrs:
                    val, kind = attrs["content"], "literal"
                elif self_close:
                    val, kind = "", "literal"
                else:
                    val = None
                    capture = [new_subj, tuple(props), []]
                    captures.append(capture)
                if val is not None:
                    for p in props:
                        out.append((new_subj, p, val, kind))
        elif types and props:
            # object chaining: new node is the property's object AND the
            # subject for descendants
            if resource:
                new_subj = resource
            else:
                new_subj = f"_:r{rid}_{seq}"
                seq += 1
            if subjects:
                for p in props:
                    out.append((subjects[-1], p, new_subj, kind_of(new_subj)))
            for t in types:
                out.append((new_subj, RDF_TYPE, t, "uri"))
        elif types:
            if resource:
                new_subj = resource
            else:
                new_subj = f"_:r{rid}_{seq}"
                seq += 1
            for t in types:
                out.append((new_subj, RDF_TYPE, t, "uri"))
        elif props and subjects:
            parent = subjects[-1]
            if resource:
                val, kind = resource, kind_of(resource)
            elif url_val is not None:
                val, kind = url_val, "uri"
            elif "content" in attrs:
                val, kind = attrs["content"], "literal"
            elif self_close:
                val, kind = "", "literal"
            else:
                val = None
                capture = [parent, tuple(props), []]
                captures.append(capture)
            if val is not None:
                for p in props:
                    out.append((parent, p, val, kind))

        if not self_close:
            stack.append([tag, new_subj is not None, capture,
                          saved_vocab, saved_prefixes])
            if new_subj is not None:
                subjects.append(new_subj)
        else:
            # context attrs on a void element scope nothing; restore
            if saved_vocab is not None:
                vocab = saved_vocab
            if saved_prefixes is not None:
                prefixes = saved_prefixes

    if pos < len(html) and captures:
        tail = html[pos:]
        for cap in captures:
            cap[2].append(tail)
    while stack:
        close_frame(stack.pop())
    return out


def extract_rdfa(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "page_id",
    keep_cols: tuple = (),
    emit_roots: bool = False,
) -> DataFrame:
    """(id, subj, pred, obj, obj_kind[, *keep_cols]) triples from
    RDFa-lite markup in ``html_col``. See module docstring for the
    extraction subset and the scale shape. ``emit_roots=True`` appends
    page-local root markers (structured_data.append_root_markers) that
    ``web_page_triples`` rewrites to has_entity provenance edges."""
    _check_keep_cols(keep_cols, ("id", "subj", "pred", "obj", "obj_kind"))
    h = F.coalesce(_html_str(df, html_col), F.lit(""))
    marked = df.select(
        F.col(id_col).alias("id"), *keep_cols, h.alias("_h")
    ).filter(F.col("_h").rlike(_PREFILTER_RE))

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
