"""Crawl-index operators: SURT keys, CDX records, canonical/hreflang
collapse, pagination chains, and per-host politeness scheduling.

The web-archive bookkeeping layer of a Common-Crawl-style pipeline — the
crawl-side analog of the reference's dump bookkeeping (reference:
download/src/main/scala/org/dbpedia/extraction/dump/download/
DumpDownload.scala resolves WHAT exists before any payload work;
core/src/main/scala/org/dbpedia/extraction/util/Finder.scala locates a
dump file by (lang, date) the way a CDX index locates a capture by
(surt, ts)).

Everything here is pure Catalyst — whole-stage codegen scans, zero
Python; the only shuffles are the irreducible keyed ones
(:func:`fetch_schedule`'s per-host window, :func:`canonical_clusters`'
groupBy, :func:`pagination_chains`' chain-sized closure,
:func:`recrawl_diff`'s co-partitioned set-diff join, and
:func:`frontier_novel`'s tier-2 anti-join over the bucket-filter
survivors only) and each is on a key whose group size is bounded by a
single host/chain/URL, not the corpus. Regexes stay in the Java∩RE2 subset (no lookaround, no pattern
backrefs) so DuckDB oracles can replay identical semantics.

Scale notes (10^12 pages):

* :func:`surt_key` / :func:`cdx_index` are stateless projections —
  cost scales with bytes scanned, no shuffle.
* :func:`write_cdx` range-partitions on the SURT key before the
  per-file sort, so the output is globally ordered across lexically
  ordered part files — the property CDX binary-search lookup needs —
  with one repartitionByRange exchange (AQE splits hot key ranges).
* :func:`canonical_collapse` is per-page; :func:`canonical_clusters`
  groups on the canonical URL — a skewed canonical target (one URL
  asserted by millions of pages) is a single hot GROUP BY key, which
  map-side partial aggregation absorbs (count/min are algebraic).
* :func:`fetch_schedule`'s window partitions by host; a giant host is
  one partition but the window functions are single-pass, and
  ``max_per_host`` bounds emitted rows per host.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from .redirects import transitive_closure
from .scrub import TRACKING_PARAM_RE  # noqa: F401  (re-export for callers)
from .scrub import normalized_hostport as _normalized_hostport
from .scrub import surviving_query_params as _surviving_query_params
from .structured_data import HREF_ATTR_RE, LINK_TAG_RE, _html_str

# rel values are matched as the WHOLE single-valued attribute for
# canonical/next (the multi-valued forms are vanishingly rare for these
# and ambiguous), but as a word within the attribute for alternate
# (where "alternate nofollow" is common).
REL_CANONICAL_RE = r"""(?is)\brel\s*=\s*["']canonical["']"""
REL_NEXT_RE = r"""(?is)\brel\s*=\s*["']next["']"""
REL_ALTERNATE_WORD_RE = r"""(?is)\brel\s*=\s*["'][^"']*\balternate\b[^"']*["']"""
HREFLANG_PRESENT_RE = r"""(?is)\bhreflang\s*=\s*["'][^"']+["']"""

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_ORIGIN_RE = r"^(https?://[^/?#]+)"


# ---------------------------------------------------------------------------
# SURT + CDX
# ---------------------------------------------------------------------------

def surt_key(url: Column) -> Column:
    """Sort-friendly URI Reordering Transform of a URL, as one Catalyst
    expression tree: ``https://www.a.example.com:443/P?b=2&a=1#f`` →
    ``com,example,a)/P?a=1&b=2``.

    1. fragment stripped, scheme dropped (captures of the same page over
       http/https collate together — the point of SURT);
    2. host lowercased, leading ``www.`` label dropped, scheme-default
       port dropped (``:80`` http, ``:443`` https; other ports kept,
       appended after the reversed host);
    3. host labels REVERSED and comma-joined, then ``)`` — so all of a
       registrable domain's subdomains are one contiguous key range;
    4. path kept verbatim (case-significant per RFC 3986), empty → ``/``;
    5. query params: tracking params dropped (same
       :data:`~distributed_extraction_framework_spark.operators.scrub.TRACKING_PARAM_RE`
       set as ``canonical_url``), survivors SORTED bytewise, ``?``
       dropped when none survive.

    Deterministic and idempotent on its own output domain. URLs without
    a scheme are treated as scheme-relative (the whole string is
    authority+path), which keeps the transform total.
    """
    u = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    # shared normalization with scrub.canonical_url — ONE source of
    # truth for page identity (code-review r5 wave-3 #10); userinfo
    # dropping also keeps a numeric password from being mistaken for a
    # port by the split below
    hostport = _normalized_hostport(scheme, rest)
    host = F.regexp_extract(hostport, r"^([^:]*)", 1)
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    keyhost = F.concat(
        rev,
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
    )
    pathq = F.regexp_replace(rest, r"^[^/?]+", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    qs = F.array_join(_surviving_query_params(query), "&")
    return F.concat(
        keyhost, F.lit(")"), path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def cdx_index(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
    status_col: str | None = None,
    mime_col: str | None = None,
) -> DataFrame:
    """One CDX-style record per capture: ``(surt, ts, url, mime, status,
    digest, length)`` — the web-archive lookup index (CDX[J] file
    semantics: captures keyed by (SURT, 14-digit timestamp) with a
    payload digest for revisit detection).

    * ``ts`` — ``yyyyMMddHHmmss`` (the CDX timestamp form);
    * ``mime`` — ``mime_col`` verbatim when given, else sniffed: payload
      whose first non-space byte is ``<`` → ``text/html``, else
      ``text/plain`` (deterministic, oracle-checkable; a real crawl
      carries the WARC Content-Type and passes ``mime_col``);
    * ``status`` — ``status_col`` or 200;
    * ``digest`` — md5 hex of the payload bytes (the revisit/dedup key;
      CDX files commonly carry sha1-b32 — md5 is the same role with an
      engine-portable function);
    * ``length`` — payload byte length.

    Stateless projection: zero shuffles, whole-stage codegen.
    """
    h = F.coalesce(_html_str(df, html_col), F.lit(""))
    # digest/length over the RAW bytes when the payload column is
    # binary (a lossy utf-8 cast would collapse distinct payloads);
    # string payloads hash their utf-8 encoding
    from pyspark.sql.types import BinaryType

    if isinstance(df.schema[html_col].dataType, BinaryType):
        raw = F.coalesce(F.col(html_col), F.lit(b""))
    else:
        raw = h
    mime = (
        F.col(mime_col)
        if mime_col
        else F.when(
            F.substring(F.ltrim(h), 1, 1) == "<", F.lit("text/html")
        ).otherwise(F.lit("text/plain"))
    )
    # try_cast: the standard CDX placeholder status '-' (or any garbage
    # status string) must degrade to NULL, not throw under ANSI mode
    # (code-review r5 wave-3 #4)
    status = (
        F.col(status_col).try_cast("int") if status_col else F.lit(200)
    )
    return df.select(
        surt_key(F.col(url_col)).alias("surt"),
        F.date_format(F.col(ts_col), "yyyyMMddHHmmss").alias("ts"),
        F.col(url_col).alias("url"),
        mime.alias("mime"),
        status.alias("status"),
        F.md5(raw).alias("digest"),
        F.octet_length(raw).cast("bigint").alias("length"),
    )


def write_cdx(cdx: DataFrame, path: str, num_files: int = 32) -> None:
    """Materialize a CDX DataFrame as space-separated text, globally
    ordered by ``(surt, ts)`` across lexically ordered part files — the
    property CDX binary-search lookup requires. One
    ``repartitionByRange`` exchange (boundaries sampled; AQE splits hot
    SURT ranges), then a spillable per-file sort."""
    (
        cdx.repartitionByRange(num_files, "surt", "ts")
        .sortWithinPartitions("surt", "ts")
        .select(
            # concat_ws SKIPS nulls — a null field would shift every
            # later column and corrupt fixed-position CDX parsing, so
            # null fields take the CDX '-' placeholder (code-review r5
            # wave-3 #7)
            F.concat_ws(
                " ",
                *[F.coalesce(c.cast("string"), F.lit("-")) for c in (
                    F.col("surt"), F.col("ts"), F.col("url"),
                    F.col("mime"), F.col("status"), F.col("digest"),
                    F.col("length"),
                )],
            ).alias("value")
        )
        .write.mode("overwrite")
        .text(path)
    )


# ---------------------------------------------------------------------------
# rel=canonical collapse
# ---------------------------------------------------------------------------

def _first_tag_href(h: Column, rel_re: str) -> Column:
    """href of the FIRST <link> tag matching ``rel_re`` (null if none) —
    per-page array ops over the handful of link tags a page carries."""
    tags = F.regexp_extract_all(h, F.lit(LINK_TAG_RE), F.lit(0))
    tag = F.get(F.filter(tags, lambda t: t.rlike(rel_re)), 0)
    href = F.regexp_extract(F.coalesce(tag, F.lit("")), HREF_ATTR_RE, 1)
    return F.nullif(href, F.lit(""))


def _resolve_href(href: Column, base_url: Column) -> Column:
    """Absolute http(s) hrefs pass through; root-relative (``/…``)
    resolve against the base URL's origin; anything else (protocol-
    relative, dotted-relative, non-http schemes) → null — the caller
    falls back. Deterministic subset of RFC 3986 §5 resolution; full
    dot-segment merging is out of scope (crawl-quality canonical/next
    links are overwhelmingly absolute or root-relative)."""
    origin = F.regexp_extract(base_url, _ORIGIN_RE, 1)
    return (
        F.when(href.rlike(r"^https?://"), href)
        .when(
            href.startswith("/") & ~href.startswith("//") & (origin != ""),
            F.concat(origin, href),
        )
    )


def canonical_collapse(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    id_col: str = "page_id",
) -> DataFrame:
    """(id, url, canonical, is_self): each page's self-asserted
    canonical URL — the first ``<link rel="canonical">`` href (absolute
    or root-relative-resolved; missing/unresolvable → the page's own
    URL). The crawl-side analog of the reference's redirect resolution
    (reference: core/src/main/scala/org/dbpedia/extraction/transform/
    Quad.scala subjects are post-redirect; a crawl corpus's "redirects"
    include rel=canonical assertions): downstream KG stages key on
    ``canonical`` instead of ``url`` to collapse print/mobile/tracking
    variants. Stateless projection, zero shuffles."""
    h = F.coalesce(_html_str(df, html_col), F.lit(""))
    url = F.col(url_col)
    resolved = _resolve_href(
        _first_tag_href(h, REL_CANONICAL_RE), url
    )
    canonical = F.coalesce(resolved, url)
    return df.select(
        F.col(id_col).alias("id"),
        url.alias("url"),
        canonical.alias("canonical"),
        (canonical == url).alias("is_self"),
    )


def canonical_clusters(collapsed: DataFrame) -> DataFrame:
    """(canonical, keeper_url, n_members) over :func:`canonical_collapse`
    output — the dedup decision table (keeper = min url,
    deterministic). One map-side-combined groupBy on the canonical key;
    a hot canonical target is absorbed by partial aggregation."""
    return (
        collapsed.groupBy("canonical")
        .agg(
            F.min("url").alias("keeper_url"),
            F.count("*").alias("n_members"),
        )
    )


# ---------------------------------------------------------------------------
# hreflang alternate clusters
# ---------------------------------------------------------------------------

def hreflang_clusters(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    id_col: str = "page_id",
) -> DataFrame:
    """(id, url, cluster_id, n_alternates): language-edition clustering
    from ``rel=alternate hreflang`` links — the crawl-side analog of the
    reference's InterLanguageLinksExtractor sameAs graph (reference:
    extraction/src/main/scala/org/dbpedia/extraction/mappings/
    InterLanguageLinksExtractor.scala).

    ``cluster_id`` = the bytewise-least member of the page's declared
    alternate set (its own URL included) — under the hreflang contract
    (every member lists the full set) all members compute the SAME id
    with zero shuffles, no connected-components iteration. Pages whose
    declarations disagree split into per-declaration clusters;
    :func:`hreflang_reciprocity` surfaces those. Stateless projection.
    """
    h = F.coalesce(_html_str(df, html_col), F.lit(""))
    tags = F.regexp_extract_all(h, F.lit(LINK_TAG_RE), F.lit(0))
    alt = F.filter(
        tags,
        lambda t: t.rlike(REL_ALTERNATE_WORD_RE)
        & t.rlike(HREFLANG_PRESENT_RE),
    )
    url = F.col(url_col)
    # resolve against the page URL before clustering: a RAW relative
    # alternate ('/de/') is identical text on unrelated hosts and would
    # merge their clusters (code-review r5 wave-3 #3); unresolvable
    # hrefs (protocol-relative, dotted) drop — same _resolve_href subset
    # as canonical/next links
    hrefs = F.filter(
        F.transform(
            alt,
            lambda t: _resolve_href(
                F.regexp_extract(t, HREF_ATTR_RE, 1), url
            ),
        ),
        lambda x: x.isNotNull() & (x != ""),
    )
    return df.select(
        F.col(id_col).alias("id"),
        url.alias("url"),
        F.least(F.array_min(hrefs), url).alias("cluster_id"),
        F.size(hrefs).alias("n_alternates"),
    )


def hreflang_edges(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(url, hreflang, href) — one row per declared alternate; ``href``
    is resolved against the page URL (root-relative alternates would
    otherwise never match in :func:`hreflang_reciprocity`'s equi-join —
    code-review r5 wave-3 #3); unresolvable hrefs drop."""
    h = F.coalesce(_html_str(df, html_col), F.lit(""))
    tag = F.col("_tag")
    return (
        df.select(
            F.col(url_col).alias("url"),
            F.explode(
                F.regexp_extract_all(h, F.lit(LINK_TAG_RE), F.lit(0))
            ).alias("_tag"),
        )
        .filter(
            tag.rlike(REL_ALTERNATE_WORD_RE)
            & tag.rlike(HREFLANG_PRESENT_RE)
        )
        .select(
            "url",
            F.lower(
                F.regexp_extract(
                    tag, r"""(?is)\bhreflang\s*=\s*["']([^"']+)["']""", 1
                )
            ).alias("hreflang"),
            _resolve_href(
                F.regexp_extract(tag, HREF_ATTR_RE, 1), F.col("url")
            ).alias("href"),
        )
        .filter(F.col("href").isNotNull() & (F.col("href") != ""))
    )


def hreflang_reciprocity(edges: DataFrame) -> DataFrame:
    """Non-reciprocal hreflang declarations: (url, href) pairs where the
    target page does not declare the source back — the standard hreflang
    QA check (search engines ignore one-sided annotations). One
    self-anti-join on the (bounded-per-page) edge set; self-referential
    rows are trivially reciprocal and excluded."""
    fwd = edges.select("url", "href").filter(F.col("url") != F.col("href"))
    rev = fwd.select(
        F.col("href").alias("url"), F.col("url").alias("href")
    )
    return fwd.join(rev, ["url", "href"], "left_anti")


# ---------------------------------------------------------------------------
# pagination chains
# ---------------------------------------------------------------------------

def pagination_chains(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(chain_id, url): group multi-page documents by following
    ``rel=next`` links; ``chain_id`` is the chain's head (the page no
    other page points next-to). The crawl analog of the reference's
    multistream page reassembly (reference: core/src/main/scala/org/
    dbpedia/extraction/sources/XMLSource.scala stitches one logical
    article from dump stream fragments) — downstream text ops
    concatenate members per chain_id before quality scoring so
    paginated articles aren't judged page-by-page.

    Mechanics: first rel=next href per page (absolute or root-relative)
    → next edges; REVERSED edges feed the same pointer-doubling closure
    the redirect resolver uses (each member chases predecessors to the
    head in O(log chain_len) rounds; cyclic "chains" drop, exactly like
    redirect cycles). The closure runs on the chain table (≪ corpus) —
    the corpus itself is touched by one scan. Pages in no chain are
    their own chain head and are NOT emitted (callers union them back
    trivially); assumes ≤1 incoming next per page (true of real
    pagination; a fork would duplicate membership rows).
    """
    h = F.coalesce(_html_str(df, html_col), F.lit(""))
    url = F.col(url_col)
    nxt = _resolve_href(_first_tag_href(h, REL_NEXT_RE), url)
    edges = (
        df.select(url.alias("src"), nxt.alias("dst"))
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
    )
    prev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    closure = transitive_closure(prev)  # member -> head
    heads = (
        closure.select(F.col("dst").alias("chain_id"))
        .distinct()
        .select("chain_id", F.col("chain_id").alias("url"))
    )
    members = closure.select(
        F.col("dst").alias("chain_id"), F.col("src").alias("url")
    )
    return members.unionByName(heads)


# ---------------------------------------------------------------------------
# per-host politeness scheduling
# ---------------------------------------------------------------------------

def fetch_schedule(
    frontier: DataFrame,
    delays: DataFrame | None = None,
    url_col: str = "url",
    priority_col: str | None = None,
    default_delay: float = 1.0,
    max_per_host: int | None = None,
) -> DataFrame:
    """(url, host, slot, scheduled_at): assign every frontier URL a
    per-host fetch slot honoring crawl-delay politeness — the scheduling
    the reference's download module does with a mutex per wiki
    (reference: download/src/main/scala/org/dbpedia/extraction/dump/
    download/DumpDownload.scala downloads one dump per language serially),
    generalized to per-host serial slots over a distributed frontier.

    * ``host`` — lowercased authority of the URL;
    * ``slot`` — 0-based rank within the host, highest ``priority_col``
      first (URL as the deterministic tiebreak; pure URL order when no
      priority column);
    * ``scheduled_at`` — ``slot × crawl_delay(host)`` seconds from the
      host's first fetch (``delays`` is the per-host ``(host,
      crawl_delay)`` table from ``parse_robots``; missing hosts use
      ``default_delay``);
    * ``max_per_host`` — optional per-cycle cap (the crawl-budget
      analog of ``curation.domain_cap``).

    One window shuffle partitioned by host — the irreducible politeness
    key; the window functions are single-pass so a mega-host costs one
    linear partition, and the cap bounds what it emits. ``delays`` is
    host-cardinality → broadcast."""
    # politeness keys on the PHYSICAL host: strip userinfo and the
    # scheme-default port like surt_key/canonical_url, or
    # 'user@example.com' and 'example.com:443' get independent slot
    # sequences (three parallel t=0 fetches against one box) and miss
    # the robots-derived delays join (code-review r5 wave-3 #5)
    scheme = F.lower(F.regexp_extract(F.col(url_col), _SCHEME_RE, 1))
    host = F.lower(
        F.regexp_extract(F.col(url_col), _SCHEME_RE + r"([^/?#]+)", 2)
    )
    host = F.regexp_replace(host, r"^[^@]*@", "")
    host = F.when(
        scheme == "http", F.regexp_replace(host, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    if priority_col is not None:
        df = frontier.select(
            F.col(url_col).alias("url"), F.col(priority_col).alias("_prio")
        ).withColumn("host", host)
        order = [F.desc_nulls_last("_prio"), F.asc("url")]
    else:
        df = frontier.select(F.col(url_col).alias("url")).withColumn(
            "host", host
        )
        order = [F.asc("url")]
    w = Window.partitionBy("host").orderBy(*order)
    df = df.withColumn("_rn", F.row_number().over(w))
    if max_per_host is not None:
        # filter on the RAW row_number attribute, not a derived
        # arithmetic column: Spark's InferWindowGroupLimit rule matches
        # ``rank-like <= k`` directly over the window expression and
        # pushes a per-group top-k limit BELOW the window sort (and into
        # the shuffle's map side), so a mega-host partition stops paying
        # for rows past the cap (VERDICT r5 #2; plan-asserted in
        # tests/test_webarchive.py). ``slot`` derives after.
        df = df.filter(F.col("_rn") <= max_per_host)
    df = df.withColumn("slot", (F.col("_rn") - 1).cast("bigint")).drop("_rn")
    if delays is not None:
        df = df.join(F.broadcast(delays), "host", "left")
        delay = F.coalesce(F.col("crawl_delay"), F.lit(float(default_delay)))
    else:
        delay = F.lit(float(default_delay))
    df = df.withColumn("scheduled_at", F.col("slot") * delay)
    return df.select("url", "host", "slot", "scheduled_at")


# ---------------------------------------------------------------------------
# recrawl diff + frontier novelty
# ---------------------------------------------------------------------------

def recrawl_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    digest_col: str = "digest",
) -> DataFrame:
    """(key, change, old_digest, new_digest): classify every URL across
    two crawl snapshots as ``added`` / ``removed`` / ``changed`` /
    ``unchanged`` by payload digest — CDX revisit detection across
    crawls, and the crawl-side analog of the wiki incremental extract
    (operators/delta.quad_diff diffs the EMITTED triples of two dumps;
    this diffs the CAPTURES so only changed pages re-enter extraction).

    One full-outer equi-join on the capture key: both sides shuffle on
    the same key (co-partitioned — one exchange each, no residual), and
    at 10^12 captures the join is the minimal possible data movement
    for a set diff. Inputs must be 1 row per key (use
    ``scrub.latest_capture`` first on multi-capture snapshots)."""
    o = old.select(F.col(key_col).alias("key"),
                   F.col(digest_col).alias("old_digest"))
    n = new.select(F.col(key_col).alias("key"),
                   F.col(digest_col).alias("new_digest"))
    j = o.join(n, "key", "full_outer")
    change = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") == F.col("new_digest"),
              F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("key", change.alias("change"), "old_digest",
                    "new_digest")


def frontier_novel(
    frontier: DataFrame,
    seen: DataFrame,
    url_col: str = "url",
    filter_buckets: int = 1 << 22,
) -> DataFrame:
    """Frontier rows whose URL is NOT in ``seen`` — EXACT semantics with
    a probabilistic pre-filter doing the heavy lifting (the only
    workable shape when ``seen`` is 10^12 URLs and the frontier
    re-discovers almost all of them every cycle).

    Tier 1 is a single-hash Bloom-style bucket filter built as plain
    DataFrames (Spark's ``bloom_filter_agg`` is not SQL-registered, and
    a distinct-bucket table gets the same no-false-negative guarantee
    inside Catalyst): ``distinct(xxhash64(url) % filter_buckets)`` over
    ``seen`` — AT MOST ``filter_buckets`` longs regardless of history
    size (map-side partial distinct bounds the shuffle the same way) —
    broadcasts to the frontier scan, and URLs whose bucket is absent
    are DEFINITELY novel: they pass through a map-only anti-join
    without ever shuffling. Tier 2 confirms the bucket-hit survivors
    (≈ fpp · |frontier| + |truly seen ∩ frontier|, with
    fpp ≈ |seen|/filter_buckets for a k=1 filter) by an exact left-anti
    equi-join — the only place frontier rows shuffle.

    The result is exact for ANY ``filter_buckets``; sizing only moves
    rows between tiers. The frontier is scanned twice (once per tier)
    — at crawl scale that is the winning trade against shuffling the
    entire frontier, and callers looping per-cycle can ``.persist()``
    the frontier first. At extreme history size, shard ``seen`` and
    intersect bucket tables per shard; each stays broadcast-sized.
    """
    m = int(filter_buckets)
    b = F.pmod(F.xxhash64(F.col(url_col)), F.lit(m))
    buckets = seen.select(b.alias("_b")).distinct()
    tagged = frontier.withColumn("_b", b)
    sure = tagged.join(F.broadcast(buckets), "_b", "left_anti").drop("_b")
    maybe = tagged.join(F.broadcast(buckets), "_b", "left_semi").drop("_b")
    confirmed = maybe.join(
        seen.select(F.col(url_col).alias(url_col)), url_col, "left_anti"
    )
    return sure.unionByName(confirmed)


def expand_frontier(
    pages: DataFrame,
    seen: DataFrame | None = None,
    url_col: str = "url",
    html_col: str = "html",
    filter_buckets: int = 1 << 22,
    scheme_re: str = r"^https?://",
) -> DataFrame:
    """(url, n_sources): the NEXT crawl cycle's frontier from this
    cycle's fetched pages — the step that closes the crawler loop
    (frontier → robots admission → politeness schedule → fetch →
    extract → HERE → next frontier), the role the reference's download
    module's link-following plays for dump mirrors (reference:
    download/src/main/scala/org/dbpedia/extraction/dump/download/
    DumpDownload.scala resolves the next fetchables from listing pages).

    * outlinks from :func:`~distributed_extraction_framework_spark.operators.structured_data.extract_html_links`
      (one scan);
    * hrefs resolve like the canonical/next logic: ``scheme_re``
      matches pass through, root-relative resolves against the source
      page's origin (http(s) only), the rest drop;
    * URLs canonicalize
      (:func:`~distributed_extraction_framework_spark.operators.scrub.canonical_url`
      — fragment/tracking-param variants collapse BEFORE the dedup, so
      the frontier never carries duplicate work);
    * within-cycle dedup = one groupBy on the canonical URL whose
      ``count_distinct(source)`` comes free as ``n_sources`` — a ready
      priority signal for :func:`fetch_schedule` (more discovering
      pages ≈ more important);
    * already-crawled URLs drop via :func:`frontier_novel`'s
      bucket-prefiltered EXACT anti-join when ``seen`` is given.
    """
    from .scrub import canonical_url
    from .structured_data import extract_html_links

    links = extract_html_links(pages, html_col=html_col, id_col=url_col)
    href = F.col("href")
    src = F.col("id")
    origin = F.regexp_extract(src, _ORIGIN_RE, 1)
    resolved = (
        F.when(href.rlike(scheme_re), href)
        .when(
            href.startswith("/") & ~href.startswith("//") & (origin != ""),
            F.concat(origin, href),
        )
    )
    cand = (
        links.select(resolved.alias("_u"), src.alias("_src"))
        .filter(F.col("_u").isNotNull())
        .select(canonical_url(F.col("_u")).alias("url"), "_src")
    )
    out = cand.groupBy("url").agg(
        F.count_distinct("_src").alias("n_sources")
    )
    if seen is not None:
        out = frontier_novel(out, seen, url_col="url",
                             filter_buckets=filter_buckets)
    return out
