"""Sequential pure-Python reference extractor (the oracle).

Plays the role of the upstream *sequential* extraction in the reference's
differential golden test (run-extraction-test:11-30): the same published
extraction semantics, implemented independently of the Spark expressions,
run single-process on the driver. tests/test_extractors.py diffs the two
outputs order-insensitively per dataset and asserts P/R ≥ 0.95
(BASELINE.json metric).

Only the brace-balanced template kernels (parse_infoboxes / parse_coords)
are shared with the Spark side — balancing braces twice independently
buys nothing; everything else (regex application, normalization,
datatype guessing, namespace routing, per-page dedup) is re-implemented
here in plain Python.
"""

from __future__ import annotations

import hashlib
import re
from decimal import ROUND_HALF_UP, Decimal

from ..functions.wikitext import (
    BARE_EXTERNAL_PATTERN,
    BRACKET_EXTERNAL_PATTERN,
    INTERNAL_LINK_PATTERN,
    REDIRECT_PATTERN,
    TEMPLATE_NAME_PATTERN,
    parse_coords,
    parse_infoboxes,
)
from .. import schema as S

Quad = tuple  # (dataset, subj, pred, obj, lang, datatype, context)

# same generated longest-suffix-first alternation as the engine
# (operators/extractors._UNIT_RE) — the two implementations must never
# drift (they did when the unit table widened; code-review r4)
_UNIT_VALUE_RE = re.compile(
    r"^(-?[0-9][0-9,]*(?:\.[0-9]+)?) ("
    + "|".join(re.escape(u) for u in sorted(S.UNIT_DATATYPES, key=len, reverse=True))
    + r")$"
)
_ILINK_RE = re.compile(INTERNAL_LINK_PATTERN)
_BRACKET_RE = re.compile(BRACKET_EXTERNAL_PATTERN)
_BARE_RE = re.compile(BARE_EXTERNAL_PATTERN)
_TMPL_RE = re.compile(TEMPLATE_NAME_PATTERN)
_REDIR_RE = re.compile(REDIRECT_PATTERN)
_ILANG_RE = re.compile(r"^[a-z]{2,3}:")


def _ucfirst(s: str) -> str:
    return s[:1].upper() + s[1:] if s else s


def _base_norm(s: str) -> str:
    s = s.strip()
    s = re.sub(r"#.*$", "", s)
    return s.strip().replace(" ", "_")


def _res(lang: str, title: str) -> str:
    return S.resource_prefix(lang) + title


def _fmt6(v: float) -> str:
    # matches Spark's format_number(v, 6): HALF_UP on the exact double
    return str(Decimal(v).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def extract_page(page: dict) -> set[Quad]:
    """All quads for one page row (url, warc_ts, html, text, lang)."""
    url, ts, text, lang = page["url"], page["warc_ts"], page["text"] or "", page["lang"]
    title = url.split("/wiki/", 1)[1]
    if title.startswith("Category:"):
        ns = S.NS_CATEGORY
    elif title.startswith("Template:"):
        ns = S.NS_TEMPLATE
    elif title.startswith("File:"):
        ns = S.NS_FILE
    else:
        ns = S.NS_MAIN
    local_title = title.split(":", 1)[1] if ns != S.NS_MAIN else title
    ts_s = ts.strftime("%Y-%m-%dT%H:%M:%S")
    page_id = int(hashlib.md5(url.encode("utf-8")).hexdigest()[:8], 16)
    rev_id = int(hashlib.md5((url + "#" + ts_s).encode("utf-8")).hexdigest()[:8], 16)
    subj = _res(lang, title)
    ctx = f"{url}#ts={ts_s}"

    quads: set[Quad] = set()

    def emit(dataset, s, p, o, lg=None, dt=None):
        quads.add((dataset, s, p, o, lg, dt, ctx))

    # shared intermediates
    ilinks = [_base_norm(m.split("|", 1)[0]) for m in _ILINK_RE.findall(text)]
    redirect_m = _REDIR_RE.match(text)
    tmpl_names = [_ucfirst(_base_norm(t)) for t in _TMPL_RE.findall(text)]

    # projections
    emit("page_ids", subj, S.DBO_WIKI_PAGE_ID, str(page_id), None, S.XSD_INTEGER)
    emit("revision_ids", subj, S.DBO_WIKI_REVISION_ID, str(rev_id), None, S.XSD_INTEGER)
    emit("revision_uris", subj, S.PROV_DERIVED_FROM, ctx)

    if ns == S.NS_MAIN:
        emit("labels", subj, S.RDFS_LABEL, local_title.replace("_", " "),
             lang, S.RDF_LANGSTRING)
        emit("wikipedia_links", subj, S.FOAF_IS_PRIMARY_TOPIC_OF, url)
        emit("wikipedia_links", url, S.FOAF_PRIMARY_TOPIC, subj)
        emit("wikipedia_links", url, S.RDF_TYPE, S.FOAF_DOCUMENT)

    if redirect_m:
        target = _ucfirst(_base_norm(redirect_m.group(1)))
        emit("redirects", subj, S.DBO_WIKI_REDIRECTS, _res(lang, target))

    if ns == S.NS_CATEGORY:
        emit("category_labels", subj, S.RDFS_LABEL, local_title.replace("_", " "),
             lang, S.RDF_LANGSTRING)
        emit("skos_categories", subj, S.RDF_TYPE, S.SKOS_CONCEPT)
        emit("skos_categories", subj, S.SKOS_PREFLABEL,
             local_title.replace("_", " "), lang, S.RDF_LANGSTRING)
        for t in ilinks:
            if t.startswith("Category:"):
                emit("skos_categories", subj, S.SKOS_BROADER, _res(lang, _ucfirst(t)))

    if ns == S.NS_MAIN:
        for t in ilinks:
            if t.startswith("Category:"):
                emit("article_categories", subj, S.DCT_SUBJECT, _res(lang, _ucfirst(t)))
            elif _ILANG_RE.match(t):
                l2, _, rest = t.partition(":")
                emit("interlanguage_links", subj, S.OWL_SAMEAS, _res(l2, _ucfirst(rest)))
            elif t and not redirect_m:
                emit("page_links", subj, S.DBO_WIKI_LINK, _res(lang, _ucfirst(t)))

        for u in dict.fromkeys(
            _BRACKET_RE.findall(text) + _BARE_RE.findall(text)
        ):
            emit("external_links", subj, S.DBO_WIKI_EXTERNAL_LINK, u)

        for t in dict.fromkeys(tmpl_names):
            emit("article_templates", subj, S.DBO_WIKI_USES_TEMPLATE,
                 _res(lang, "Template:" + t))

        for (la, lo) in parse_coords(text):
            emit("geo_coordinates", subj, S.GEO_LAT, _fmt6(la), None, S.XSD_FLOAT)
            emit("geo_coordinates", subj, S.GEO_LONG, _fmt6(lo), None, S.XSD_FLOAT)
            emit("geo_coordinates", subj, S.GEORSS_POINT, f"{_fmt6(la)} {_fmt6(lo)}")

        for (_tmpl, key, value) in parse_infoboxes(text):
            k = key.strip().replace(" ", "_")
            pred = S.PROPERTY + k
            v = value.strip()
            mlink = re.match(r"^\[\[([^\[\]|]+)(\|[^\[\]]*)?\]\]$", v)
            munit = _UNIT_VALUE_RE.match(v)
            if re.match(r"^-?[0-9][0-9,]*$", v):
                emit("infobox_properties", subj, pred, v.replace(",", ""),
                     None, S.XSD_INTEGER)
            elif re.match(r"^-?[0-9][0-9,]*\.[0-9]+$", v):
                emit("infobox_properties", subj, pred, v.replace(",", ""),
                     None, S.XSD_DOUBLE)
            elif re.match(r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$", v):
                emit("infobox_properties", subj, pred, v, None, S.XSD_DATE)
            elif munit:
                emit("infobox_properties", subj, pred,
                     munit.group(1).replace(",", ""), None,
                     S.UNIT_DATATYPES[munit.group(2)])
            elif mlink:
                emit("infobox_properties", subj, pred,
                     _res(lang, _ucfirst(_base_norm(mlink.group(1)))))
            elif re.match(r"^https?://\S+$", v):
                emit("infobox_properties", subj, pred, v)
            else:
                emit("infobox_properties", subj, pred, v, lang, S.RDF_LANGSTRING)

        # abstract: markup-stripped first paragraph
        t = re.sub(r"\{\{[^{}]*\}\}", "", text)
        t = re.sub(r"\{\{[^{}]*\}\}", "", t)
        t = re.sub(r"\[\[Category:[^\[\]]*\]\]", "", t)
        t = re.sub(r"\[\[[^\[\]|]*\|([^\[\]]*)\]\]", r"\1", t)
        t = re.sub(r"\[\[([^\[\]]*)\]\]", r"\1", t)
        t = t.replace("'''", "")
        first_para = t.split("\n\n", 1)[0].strip()
        if first_para and not redirect_m:
            emit("abstracts", subj, S.DBO_ABSTRACT, first_para,
                 lang, S.RDF_LANGSTRING)

        if "Disambiguation" in tmpl_names:
            for t2 in ilinks:
                if t2 and not t2.startswith("Category:") and not _ILANG_RE.match(t2):
                    emit("disambiguations", subj, S.DBO_WIKI_DISAMBIGUATES,
                         _res(lang, _ucfirst(t2)))

    return quads


def extract_corpus(pages: list[dict]) -> set[Quad]:
    """Sequential extraction over a page list (namespace-gated like the
    distributed job: DistConfigLoader.scala:105-112)."""
    out: set[Quad] = set()
    for p in pages:
        out |= extract_page(p)
    return out
