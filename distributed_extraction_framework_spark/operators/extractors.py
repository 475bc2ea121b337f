"""The extractor suite — reference §2.2 re-expressed as ONE fused Catalyst pass.

Architecture (vs the reference's `rdd.map(CompositeParseExtractor)`,
DistExtractionJob.scala:39-58): every extractor is a function
``enriched DataFrame → Column[array<quad>]``. ``extract()`` concatenates
all those arrays in a single ``select``, applies the reference's *per-page*
dedup (``array_distinct`` — DistDeduplicatingWriterDestination.scala:26-40,
dedup is within a page, NOT global, so it costs zero shuffles), and
explodes once.

The result is the same physical shape as the reference's hand-fused
pipeline: **one scan → one projection stage → no shuffle**, except the
regex/link extraction runs JVM-side inside whole-stage codegen and only
the brace-balanced template parse crosses into Python (one Arrow batch
pass — functions/wikitext.py).

At 100 TB this matters: a per-extractor union would re-scan `text`
(the fat column) once per extractor; the fused form reads it exactly once.
"""

from __future__ import annotations

import re as _re
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import schema as S
from ..functions import wikitext as W

# --------------------------------------------------------------------------
# column helpers
# --------------------------------------------------------------------------

def ucfirst(c: Column) -> Column:
    return F.concat(F.upper(F.substring(c, 1, 1)), F.substr(c, F.lit(2)))


def base_norm(c: Column) -> Column:
    """MediaWiki-style link-target normalization (pre-capitalization):
    trim → strip #fragment → trim → spaces→underscores."""
    c = F.trim(c)
    c = F.regexp_replace(c, r"#.*$", "")
    c = F.trim(c)
    return F.regexp_replace(c, r" ", "_")


def resource_uri(lang: Column, title: Column) -> Column:
    """Language-localized resource URI (reference: subject URI scheme,
    SURVEY.md §2.2 — `http://{lang.}host/resource/{Title}`)."""
    host = F.when(lang == "en", F.lit(S.RESOURCE_HOST)).otherwise(
        F.concat(lang, F.lit("." + S.RESOURCE_HOST))
    )
    return F.concat(F.lit("http://"), host, F.lit("/resource/"), title)


def _s(v) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


def _null_str() -> Column:
    return F.lit(None).cast("string")


def quad(dataset, subj, pred, obj, lang=None, datatype=None, context=None) -> Column:
    """A quad struct with canonical field names (schema.QUAD_COLS)."""
    return F.struct(
        _s(dataset).alias("dataset"),
        _s(subj).alias("subj"),
        _s(pred).alias("pred"),
        _s(obj).alias("obj"),
        (_null_str() if lang is None else _s(lang)).alias("lang"),
        (_null_str() if datatype is None else _s(datatype)).alias("datatype"),
        (_null_str() if context is None else _s(context)).alias("context"),
    )


def _empty_quads() -> Column:
    return F.expr(f"CAST(array() AS array<{S.QUAD_STRUCT_DDL}>)")


def guard(cond: Column, arr: Column) -> Column:
    """arr if cond else [] — per-row extractor gating without a filter node
    (keeps everything in the single fused projection)."""
    return F.when(cond, arr).otherwise(_empty_quads())


# --------------------------------------------------------------------------
# page preparation (derived columns — reference WikiTitle decode,
# WikiTitleSerializer.scala:14-21, and the namespace enum)
# --------------------------------------------------------------------------

def prepare_pages(pages: DataFrame) -> DataFrame:
    """Derive title / ns / ids / subject URI / provenance context.

    All Catalyst expressions — stays inside whole-stage codegen. ``page_id``
    / ``rev_id`` are deterministic md5-prefix ints (the reference carries
    dump ids; a crawl corpus has none, so ids derive from the row key —
    first 8 hex chars of md5, a 32-bit id space like the reference's).
    """
    def _hex_id(b: Column) -> Column:
        return F.conv(F.substring(F.md5(b), 1, 8), 16, 10).cast("long")

    title = F.regexp_extract(F.col("url"), r"/wiki/(.+)$", 1)
    # ISO-8601 'T' form: the timestamp lands inside the provenance IRI,
    # and IRIs must not contain spaces (N-Quads/TriG parseability)
    ts_s = F.date_format(F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss")
    df = (
        # null text must not null-propagate into the quad arrays (a page with
        # no payload still emits its projection datasets — page_ids etc.)
        pages.withColumn("text", F.coalesce(F.col("text"), F.lit("")))
        .withColumn("title", title)
        .withColumn(
            "ns",
            F.when(F.col("title").startswith("Category:"), F.lit(S.NS_CATEGORY))
            .when(F.col("title").startswith("Template:"), F.lit(S.NS_TEMPLATE))
            .when(F.col("title").startswith("File:"), F.lit(S.NS_FILE))
            .otherwise(F.lit(S.NS_MAIN)),
        )
        .withColumn("page_id", _hex_id(F.encode(F.col("url"), "utf-8")))
        .withColumn(
            "rev_id",
            _hex_id(F.encode(F.concat(F.col("url"), F.lit("#"), ts_s), "utf-8")),
        )
        # page-constant URI prefix, hoisted so the per-link lambdas (which
        # run interpreted — higher-order functions are CodegenFallback) do a
        # plain concat instead of re-evaluating the lang CASE per element
        .withColumn(
            "_res_prefix",
            F.concat(
                F.lit("http://"),
                F.when(F.col("lang") == "en", F.lit(S.RESOURCE_HOST)).otherwise(
                    F.concat(F.col("lang"), F.lit("." + S.RESOURCE_HOST))
                ),
                F.lit("/resource/"),
            ),
        )
        .withColumn("subj", F.concat(F.col("_res_prefix"), F.col("title")))
        .withColumn("context", F.concat(F.col("url"), F.lit("#ts="), ts_s))
        .withColumn(
            "local_title",
            F.when(
                F.col("ns") != S.NS_MAIN,
                F.substr(F.col("title"), F.instr(F.col("title"), ":") + F.lit(1)),
            ).otherwise(F.col("title")),
        )
    )
    return df


def enrich_pages(
    prepared: DataFrame,
    with_parse: bool = True,
    parse_deterministic: bool = True,
) -> DataFrame:
    """Add the shared extraction intermediates, computed ONCE per page:
    internal-link targets, external links, template names, redirect target,
    and (optionally) the pandas-UDF structural parse.
    ``parse_deterministic=False``: see wikitext.make_parse_page_udf —
    for callers whose plans explode ``parsed`` directly."""
    df = (
        prepared.withColumn(
            "ilinks",
            F.transform(
                F.regexp_extract_all("text", F.lit(W.INTERNAL_LINK_PATTERN), F.lit(1)),
                # substring_index, NOT split_part: Spark 4's collation-aware
                # split_part routes through String.split with a quoted
                # pattern, compiling a java.util.regex.Pattern PER ROW —
                # measured 9× slower single-threaded, and the allocation
                # storm collapses multi-core scaling (GC contention). The
                # two agree for field 1: leftmost-delimiter prefix, whole
                # string when the delimiter is absent.
                lambda x: base_norm(F.substring_index(x, "|", 1)),
            ),
        )
        .withColumn(
            "elinks",
            F.concat(
                F.regexp_extract_all("text", F.lit(W.BRACKET_EXTERNAL_PATTERN), F.lit(1)),
                F.regexp_extract_all("text", F.lit(W.BARE_EXTERNAL_PATTERN), F.lit(1)),
            ),
        )
        .withColumn(
            "tmpl_names",
            F.transform(
                F.regexp_extract_all("text", F.lit(W.TEMPLATE_NAME_PATTERN), F.lit(1)),
                lambda x: ucfirst(base_norm(x)),
            ),
        )
        .withColumn(
            "redirect_target",
            F.regexp_extract("text", W.REDIRECT_PATTERN, 1),
        )
    )
    if with_parse:
        df = df.withColumn(
            "parsed",
            W.make_parse_page_udf(deterministic=parse_deterministic)(
                F.col("text")
            ),
        )
    return df


# --------------------------------------------------------------------------
# the extractor suite — each returns Column[array<quad>] over enriched pages
# --------------------------------------------------------------------------
_c = F.col


def labels(e) -> Column:
    """LabelExtractor — rdfs:label ← title (lang-tagged). Main ns."""
    q = F.array(
        quad("labels", _c("subj"), S.RDFS_LABEL,
             F.regexp_replace(_c("local_title"), "_", " "),
             lang=_c("lang"), datatype=S.RDF_LANGSTRING, context=_c("context"))
    )
    return guard(_c("ns") == S.NS_MAIN, q)


def category_labels(e) -> Column:
    """CategoryLabelExtractor — rdfs:label for Category-ns pages."""
    q = F.array(
        quad("category_labels", _c("subj"), S.RDFS_LABEL,
             F.regexp_replace(_c("local_title"), "_", " "),
             lang=_c("lang"), datatype=S.RDF_LANGSTRING, context=_c("context"))
    )
    return guard(_c("ns") == S.NS_CATEGORY, q)


def page_ids(e) -> Column:
    """PageIdExtractor — dbo:wikiPageID (xsd:integer)."""
    return F.array(
        quad("page_ids", _c("subj"), S.DBO_WIKI_PAGE_ID,
             _c("page_id").cast("string"), datatype=S.XSD_INTEGER,
             context=_c("context"))
    )


def revision_ids(e) -> Column:
    """RevisionIdExtractor — dbo:wikiPageRevisionID (xsd:integer)."""
    return F.array(
        quad("revision_ids", _c("subj"), S.DBO_WIKI_REVISION_ID,
             _c("rev_id").cast("string"), datatype=S.XSD_INTEGER,
             context=_c("context"))
    )


def revision_uris(e) -> Column:
    """ProvenanceExtractor — prov:wasDerivedFrom ← crawl snapshot URI."""
    return F.array(
        quad("revision_uris", _c("subj"), S.PROV_DERIVED_FROM, _c("context"),
             context=_c("context"))
    )


def wikipedia_links(e) -> Column:
    """ArticlePageExtractor — foaf:isPrimaryTopicOf / primaryTopic /
    rdf:type foaf:Document. Main ns."""
    q = F.array(
        quad("wikipedia_links", _c("subj"), S.FOAF_IS_PRIMARY_TOPIC_OF,
             _c("url"), context=_c("context")),
        quad("wikipedia_links", _c("url"), S.FOAF_PRIMARY_TOPIC, _c("subj"),
             context=_c("context")),
        quad("wikipedia_links", _c("url"), S.RDF_TYPE, S.FOAF_DOCUMENT,
             context=_c("context")),
    )
    return guard(_c("ns") == S.NS_MAIN, q)


def redirects(e) -> Column:
    """RedirectExtractor — dbo:wikiPageRedirects ← redirect target
    (reference regex semantics: DistRedirects.scala:155-170)."""
    tgt = ucfirst(base_norm(_c("redirect_target")))
    q = F.array(
        quad("redirects", _c("subj"), S.DBO_WIKI_REDIRECTS,
             F.concat(_c("_res_prefix"), tgt), context=_c("context"))
    )
    return guard(_c("redirect_target") != "", q)


def _is_category(t: Column) -> Column:
    return t.startswith("Category:")


def _is_interlanguage(t: Column) -> Column:
    return t.rlike(W.INTERLANGUAGE_PREFIX)


def _uri_quads(dataset: str, pred, tgts: Column, uri) -> Column:
    """Targets → DISTINCT object URIs → quads. Dedup happens on the URI
    STRING (hash-based, O(k)) before the struct is built: within one
    extractor every quad field except obj is page-constant, so obj-dedup ≡
    struct-dedup — and array_distinct over array<struct> is brute-force
    O(k²) equality (no hash support for struct elements), which at a
    10^5-link hub page means 10^10 comparisons in ONE task (measured:
    ~15 min/page; the string dedup makes it linear)."""
    return F.transform(
        F.array_distinct(F.transform(tgts, uri)),
        lambda u: quad(dataset, _c("subj"), pred, u, context=_c("context")),
    )


def article_categories(e) -> Column:
    """ArticleCategoriesExtractor — dcterms:subject ← [[Category:X]]. Main ns."""
    cats = F.filter(_c("ilinks"), _is_category)
    q = _uri_quads(
        "article_categories", S.DCT_SUBJECT, cats,
        lambda t: F.concat(_c("_res_prefix"), ucfirst(t)),
    )
    return guard(_c("ns") == S.NS_MAIN, q)


def skos_categories(e) -> Column:
    """SkosCategoriesExtractor — Category pages: skos:Concept type,
    prefLabel, broader ← parent categories."""
    parents = F.filter(_c("ilinks"), _is_category)
    base = F.array(
        quad("skos_categories", _c("subj"), S.RDF_TYPE, S.SKOS_CONCEPT,
             context=_c("context")),
        quad("skos_categories", _c("subj"), S.SKOS_PREFLABEL,
             F.regexp_replace(_c("local_title"), "_", " "),
             lang=_c("lang"), datatype=S.RDF_LANGSTRING, context=_c("context")),
    )
    broader = _uri_quads(
        "skos_categories", S.SKOS_BROADER, parents,
        lambda t: F.concat(_c("_res_prefix"), ucfirst(t)),
    )
    return guard(_c("ns") == S.NS_CATEGORY, F.concat(base, broader))


def page_links(e) -> Column:
    """PageLinksExtractor — dbo:wikiPageWikiLink ← every internal link
    (excluding category + interlanguage routes). Main ns. The highest
    fan-out extractor."""
    tgts = F.filter(
        _c("ilinks"),
        lambda t: (~_is_category(t)) & (~_is_interlanguage(t)) & (F.length(t) > 0),
    )
    q = _uri_quads(
        "page_links", S.DBO_WIKI_LINK, tgts,
        lambda t: F.concat(_c("_res_prefix"), ucfirst(t)),
    )
    return guard((_c("ns") == S.NS_MAIN) & (_c("redirect_target") == ""), q)


def external_links(e) -> Column:
    """ExternalLinksExtractor — dbo:wikiPageExternalLink ← external URLs."""
    q = F.transform(
        F.array_distinct(_c("elinks")),
        lambda u: quad("external_links", _c("subj"), S.DBO_WIKI_EXTERNAL_LINK,
                       u, context=_c("context")),
    )
    return guard(_c("ns") == S.NS_MAIN, q)


def interlanguage_links(e) -> Column:
    """InterLanguageLinksExtractor — owl:sameAs ← [[de:Titel]] links."""
    tgts = F.filter(_c("ilinks"), _is_interlanguage)
    q = _uri_quads(
        "interlanguage_links", S.OWL_SAMEAS, tgts,
        # substring_index forms of split_part(t,":",1/2) — split_part
        # Pattern.compiles per row (see enrich_pages). Field 2 ≡
        # everything between the 1st and 2nd ":" when a ":" exists,
        # else split_part's out-of-range '' (interlanguage targets are
        # pre-filtered to contain ":", but the guard keeps exact parity).
        lambda t: resource_uri(
            F.substring_index(t, ":", 1),
            ucfirst(
                F.when(
                    t.contains(":"),
                    F.substring_index(F.substring_index(t, ":", 2), ":", -1),
                ).otherwise(F.lit(""))
            ),
        ),
    )
    return guard(_c("ns") == S.NS_MAIN, q)


def article_templates(e) -> Column:
    """ArticleTemplatesExtractor — dbo:wikiPageUsesTemplate ← every
    transcluded template (incl. nested)."""
    q = F.transform(
        F.array_distinct(_c("tmpl_names")),
        lambda t: quad("article_templates", _c("subj"), S.DBO_WIKI_USES_TEMPLATE,
                       F.concat(_c("_res_prefix"), F.lit("Template:"), t),
                       context=_c("context")),
    )
    return guard(_c("ns") == S.NS_MAIN, q)


def geo_coordinates(e) -> Column:
    """GeoExtractor — geo:lat / geo:long / georss:point ← {{Coord}} templates
    (parsed in the vectorized pandas pass; DMS→decimal in the kernel)."""
    def fmt(d: Column) -> Column:
        return F.format_number(d, 6)

    # struct-level dedup (duplicate {{Coord}}s): O(k²) is fine here —
    # k = coords per page, a handful at most
    q = F.array_distinct(
        F.flatten(
            F.transform(
                _c("parsed.coords"),
                lambda co: F.array(
                    quad("geo_coordinates", _c("subj"), S.GEO_LAT,
                         fmt(co["lat"]), datatype=S.XSD_FLOAT, context=_c("context")),
                    quad("geo_coordinates", _c("subj"), S.GEO_LONG,
                         fmt(co["lon"]), datatype=S.XSD_FLOAT, context=_c("context")),
                    quad("geo_coordinates", _c("subj"), S.GEORSS_POINT,
                         F.concat(fmt(co["lat"]), F.lit(" "), fmt(co["lon"])),
                         context=_c("context")),
                ),
            )
        )
    )
    return guard(_c("ns") == S.NS_MAIN, q)


_INT_RE = r"^-?[0-9][0-9,]*$"
_DBL_RE = r"^-?[0-9][0-9,]*\.[0-9]+$"
_DATE_RE = r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
# alternation generated from schema.UNIT_DATATYPES, longest suffix first so
# 'km2' wins over 'km', 'mph' over 'm', … (regex alternation is first-match)
_UNIT_ALT = "|".join(
    _re.escape(u) for u in sorted(S.UNIT_DATATYPES, key=len, reverse=True)
)
_UNIT_RE = rf"^(-?[0-9][0-9,]*(?:\.[0-9]+)?) ({_UNIT_ALT})$"
_LINK_VALUE_RE = r"^\[\[([^\[\]|]+)(\|[^\[\]]*)?\]\]$"
_URL_VALUE_RE = r"^https?://\S+$"


_UNIT_MAP = None


def _unit_datatype(unit: Column) -> Column:
    # ONE map lookup instead of a 27-deep WHEN chain: the chain inlined its
    # ``unit`` argument (a regexp_extract over the 27-suffix alternation)
    # into every branch, so a matching value could pay the extract up to
    # 27 times; element_at evaluates the key expression exactly once
    global _UNIT_MAP
    if _UNIT_MAP is None:
        _UNIT_MAP = F.create_map(
            *[x for s, dt in S.UNIT_DATATYPES.items()
              for x in (F.lit(s), F.lit(dt))]
        )
    return F.try_element_at(_UNIT_MAP, unit)


def infobox_properties(e) -> Column:
    """InfoboxExtractor — dbp:{key} ← raw infobox key/values with datatype
    guessing (numeric comma-stripping, link→resource, url→resource)."""
    def mk(kv: Column) -> Column:
        key = F.regexp_replace(F.trim(kv["key"]), " ", "_")
        val = F.trim(kv["value"])
        pred = F.concat(F.lit(S.PROPERTY), key)
        link_t = F.regexp_extract(val, _LINK_VALUE_RE, 1)
        return (
            F.when(
                val.rlike(_INT_RE),
                quad("infobox_properties", _c("subj"), pred,
                     F.regexp_replace(val, ",", ""), datatype=S.XSD_INTEGER,
                     context=_c("context")),
            )
            .when(
                val.rlike(_DBL_RE),
                quad("infobox_properties", _c("subj"), pred,
                     F.regexp_replace(val, ",", ""), datatype=S.XSD_DOUBLE,
                     context=_c("context")),
            )
            .when(
                val.rlike(_DATE_RE),
                quad("infobox_properties", _c("subj"), pred, val,
                     datatype=S.XSD_DATE, context=_c("context")),
            )
            .when(
                val.rlike(_UNIT_RE),
                quad(
                    "infobox_properties", _c("subj"), pred,
                    F.regexp_replace(F.regexp_extract(val, _UNIT_RE, 1), ",", ""),
                    datatype=_unit_datatype(F.regexp_extract(val, _UNIT_RE, 2)),
                    context=_c("context"),
                ),
            )
            .when(
                link_t != "",
                quad("infobox_properties", _c("subj"), pred,
                     F.concat(_c("_res_prefix"), ucfirst(base_norm(link_t))),
                     context=_c("context")),
            )
            .when(
                val.rlike(_URL_VALUE_RE),
                quad("infobox_properties", _c("subj"), pred, val,
                     context=_c("context")),
            )
            .otherwise(
                quad("infobox_properties", _c("subj"), pred, val,
                     lang=_c("lang"), datatype=S.RDF_LANGSTRING,
                     context=_c("context"))
            )
        )

    # struct-level dedup (same key=value in two infoboxes): k ≤ dozens
    q = F.array_distinct(F.transform(_c("parsed.infobox"), mk))
    return guard(_c("ns") == S.NS_MAIN, q)


def abstracts(e) -> Column:
    """AbstractExtractor (published semantics, markup-stripped first
    paragraph) — dbo:abstract, lang-tagged. Main ns, non-redirect."""
    t = _c("text")
    # drop templates (2 passes handle one nesting level), category links,
    # then render links to their anchor/target and strip bold markers
    t = F.regexp_replace(t, r"\{\{[^{}]*\}\}", "")
    t = F.regexp_replace(t, r"\{\{[^{}]*\}\}", "")
    t = F.regexp_replace(t, r"\[\[Category:[^\[\]]*\]\]", "")
    t = F.regexp_replace(t, r"\[\[[^\[\]|]*\|([^\[\]]*)\]\]", r"$1")
    t = F.regexp_replace(t, r"\[\[([^\[\]]*)\]\]", r"$1")
    t = F.regexp_replace(t, r"'''", "")
    # substring_index ≡ split_part(t,"\n\n",1) without the per-row
    # Pattern.compile of Spark 4's split_part (see enrich_pages).
    # NB: full-whitespace trim (tabs/newlines too) — F.trim strips ONLY
    # 0x20, which left '\t'-led abstracts diverging from the reference's
    # strip() semantics (caught by the bench P/R differential at 2k pages)
    fp = F.substring_index(t, "\n\n", 1)
    first_para = F.regexp_replace(
        F.regexp_replace(fp, r"^\s+", ""), r"\s+$", ""
    )
    # the non-empty guard filters the BUILT array on its obj field rather
    # than testing length(first_para) in the guard condition: the guard
    # form evaluated the whole 7-regex chain TWICE per page (once for the
    # CASE condition, once in the projection — Generate is outside
    # whole-stage codegen, so no subexpression elimination; plan-verified),
    # and this chain over the full text is the single most expensive
    # Catalyst expression in the fused extraction
    q = F.filter(
        F.array(
            quad("abstracts", _c("subj"), S.DBO_ABSTRACT, first_para,
                 lang=_c("lang"), datatype=S.RDF_LANGSTRING,
                 context=_c("context"))
        ),
        lambda s: F.length(s["obj"]) > 0,
    )
    return guard(
        (_c("ns") == S.NS_MAIN) & (_c("redirect_target") == ""),
        q,
    )


def disambiguations(e) -> Column:
    """DisambiguationExtractor — dbo:wikiPageDisambiguates ← each link on a
    {{Disambiguation}} page. A broadcast side-set of dab page ids
    (operators/disambiguations.py, reference DistDisambiguations) extends
    the template trigger when extract() receives one."""
    is_dab = F.array_contains(_c("tmpl_names"), "Disambiguation")
    if "_dab" in e.columns:
        is_dab = is_dab | F.coalesce(_c("_dab"), F.lit(False))
    tgts = F.filter(
        _c("ilinks"),
        lambda t: (~_is_category(t)) & (~_is_interlanguage(t)) & (F.length(t) > 0),
    )
    q = _uri_quads(
        "disambiguations", S.DBO_WIKI_DISAMBIGUATES, tgts,
        lambda t: F.concat(_c("_res_prefix"), ucfirst(t)),
    )
    return guard((_c("ns") == S.NS_MAIN) & is_dab, q)


# name → (extractor fn, needs pandas parse pass)
EXTRACTORS: dict[str, tuple[Callable[[DataFrame], Column], bool]] = {
    "labels": (labels, False),
    "category_labels": (category_labels, False),
    "page_ids": (page_ids, False),
    "revision_ids": (revision_ids, False),
    "revision_uris": (revision_uris, False),
    "wikipedia_links": (wikipedia_links, False),
    "redirects": (redirects, False),
    "article_categories": (article_categories, False),
    "skos_categories": (skos_categories, False),
    "page_links": (page_links, False),
    "external_links": (external_links, False),
    "interlanguage_links": (interlanguage_links, False),
    "article_templates": (article_templates, False),
    "geo_coordinates": (geo_coordinates, True),
    "infobox_properties": (infobox_properties, True),
    "abstracts": (abstracts, False),
    "disambiguations": (disambiguations, False),
}


def extract(
    pages: DataFrame,
    extractors: list[str] | None = None,
    namespaces: tuple[int, ...] = S.EXTRACTION_NAMESPACES,
    disambiguations_df: DataFrame | None = None,
) -> DataFrame:
    """Run the (selected) extractor suite in one fused pass → quads.

    Physical plan: parquet scan → filter(ns) → single projection (all
    regex extraction + the one pandas parse) → explode → that's it.
    Zero shuffles, matching the reference's single-stage main job
    (SURVEY.md §4 'operator fusion').

    ``disambiguations_df`` (page_id rows) is the reference's
    DistDisambiguations side set: broadcast marker-joined (map-side, the
    fused plan stays shuffle-free) and consumed by the disambiguations
    extractor.
    """
    names = list(EXTRACTORS) if extractors is None else list(extractors)
    needs_parse = any(EXTRACTORS[n][1] for n in names)
    e = enrich_pages(prepare_pages(pages), with_parse=needs_parse)
    e = e.filter(F.col("ns").isin(*namespaces))
    if disambiguations_df is not None:
        marker = F.broadcast(
            disambiguations_df.select("page_id").distinct()
            .withColumn("_dab", F.lit(True))
        )
        e = e.join(marker, "page_id", "left")
    arrays = [EXTRACTORS[n][0](e) for n in names]
    # NO global struct-level array_distinct here: per-page dedup (D1,
    # reference semantics) is guaranteed per-extractor — the fan-out
    # extractors dedup on the object-URI string (hash-based O(k), see
    # _uri_quads; struct dedup is brute-force O(k²) and takes ~15 min on
    # one 10^5-link hub page), the struct-array extractors (geo/infobox)
    # dedup their own tiny arrays, and cross-extractor duplicates are
    # impossible because every extractor tags a distinct dataset.
    all_quads = F.concat(*arrays) if len(arrays) > 1 else arrays[0]
    return e.select(F.explode(all_quads).alias("q")).select("q.*")


def extractor_df(pages: DataFrame, name: str) -> DataFrame:
    """Single extractor as a standalone quads DataFrame (tests / queries)."""
    return extract(pages, extractors=[name])
