"""Crawl-frontier metadata: sitemap XML and robots.txt parsing.

The discovery side of a Common-Crawl-style pipeline — which URLs exist
(sitemaps) and which may be fetched (robots) — feeding the distributed
fetch stage (sources/fetch.py) the way the reference's download module
feeds its extraction launcher (reference: download/src/main/scala/org/
dbpedia/extraction/dump/download/DumpDownload.scala semantics: an
allow-listed URL frontier resolved before any payload work).

Both parsers are pure Catalyst — whole-stage codegen, one narrow stage,
zero Python — in the Java-regex ∩ RE2 subset (no lookaround, no pattern
backrefs) so DuckDB oracles can re-run IDENTICAL expressions:

* :func:`parse_sitemaps` — ``<url>``/``<sitemap>`` blocks via
  ``regexp_extract_all`` (two patterns, not a backreferenced one — RE2
  has no backrefs), per-block ``<loc>``/``<lastmod>``/``<changefreq>``/
  ``<priority>`` field pulls; handles both urlsets and sitemap indexes
  in one pass, ``is_index`` distinguishing them.
* :func:`parse_robots` — the robots.txt group model (RFC 9309 reduced):
  a group = one or more consecutive ``User-agent`` lines followed by
  rule lines; every rule belongs to EVERY agent of its group. Group
  boundaries are computed with one pass of per-file window functions
  (a ``lag``-based group counter + a running sum); robots files are
  KB-sized, so the per-file window partition is trivially bounded —
  the frontier table itself can still be billions of rows, and the
  window key (file id) is the natural partitioning. ``Sitemap:`` lines
  are global (agent ``*``-independent per the RFC) and surface with
  ``directive='sitemap'`` and a null agent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_URL_BLOCK_RE = r"(?is)<url>(.*?)</url>"
_IDX_BLOCK_RE = r"(?is)<sitemap>(.*?)</sitemap>"
_LOC_RE = r"(?is)<loc>\s*([^<\s]+)\s*</loc>"
_LASTMOD_RE = r"(?is)<lastmod>\s*([^<\s]+)\s*</lastmod>"
_FREQ_RE = r"(?is)<changefreq>\s*([^<\s]+)\s*</changefreq>"
_PRIO_RE = r"(?is)<priority>\s*([^<\s]+)\s*</priority>"


def parse_sitemaps(
    df: DataFrame,
    xml_col: str = "xml",
    id_col: str = "page_id",
) -> DataFrame:
    """(id, loc, lastmod, changefreq, priority, is_index) — one row per
    ``<url>`` or ``<sitemap>`` entry. ``lastmod`` stays a string (the
    spec allows date-only AND full W3C datetimes; the caller picks the
    cast). Entries without a ``<loc>`` are dropped."""
    x = F.coalesce(F.col(xml_col).cast("string"), F.lit(""))

    def blocks(pattern: str, is_index: bool) -> DataFrame:
        b = F.col("_b")
        return (
            df.select(
                F.col(id_col).alias("id"),
                F.explode(
                    F.regexp_extract_all(x, F.lit(pattern), F.lit(1))
                ).alias("_b"),
            )
            .select(
                "id",
                F.regexp_extract(b, _LOC_RE, 1).alias("loc"),
                F.nullif(F.regexp_extract(b, _LASTMOD_RE, 1), F.lit(""))
                .alias("lastmod"),
                F.nullif(F.regexp_extract(b, _FREQ_RE, 1), F.lit(""))
                .alias("changefreq"),
                F.nullif(F.regexp_extract(b, _PRIO_RE, 1), F.lit(""))
                .cast("double").alias("priority"),
                F.lit(is_index).alias("is_index"),
            )
            .filter(F.col("loc") != "")
        )

    return blocks(_URL_BLOCK_RE, False).unionByName(
        blocks(_IDX_BLOCK_RE, True)
    )


_UA_RE = r"(?i)^user-agent:\s*(\S+)"
_RULE_RE = r"(?i)^(allow|disallow|crawl-delay):\s*(\S*)"
_SITEMAP_RE = r"(?i)^sitemap:\s*(\S+)"


def parse_robots(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "page_id",
) -> DataFrame:
    """(id, agent, directive, value) — one row per (group agent, rule)
    pair plus group-independent ``sitemap`` rows (agent null). Comments
    (``#`` to end of line) and blank lines are stripped; directives and
    agent names lower-cased; rule values (paths) kept verbatim."""
    line_raw = F.col("_l")
    line = F.trim(F.regexp_replace(line_raw, r"#.*$", ""))
    lines = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.coalesce(
                F.col(text_col).cast("string"), F.lit("")), r"\r?\n"))
            .alias("pos", "_l"),
        )
        .select(
            "id", "pos",
            F.lower(F.regexp_extract(line, _UA_RE, 1)).alias("agent"),
            F.lower(F.regexp_extract(line, _RULE_RE, 1)).alias("directive"),
            F.regexp_extract(line, _RULE_RE, 2).alias("value"),
            F.regexp_extract(line, _SITEMAP_RE, 1).alias("sitemap"),
        )
        .filter((F.col("agent") != "") | (F.col("directive") != "")
                | (F.col("sitemap") != ""))
    )
    w = Window.partitionBy("id").orderBy("pos")
    is_ua = F.col("agent") != ""
    # a group starts at a UA line NOT preceded by another UA line
    grouped = lines.withColumn(
        "grp",
        F.sum(
            (is_ua & ~F.lag(is_ua, 1, False).over(w)).cast("int")
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    agents = (
        grouped.filter(is_ua)
        .select("id", "grp", F.col("agent").alias("g_agent"))
    )
    rules = grouped.filter(F.col("directive") != "").select(
        "id", "grp", "directive", "value"
    )
    sitemaps = (
        grouped.filter(F.col("sitemap") != "")
        .select(
            "id", F.lit(None).cast("string").alias("agent"),
            F.lit("sitemap").alias("directive"),
            F.col("sitemap").alias("value"),
        )
    )
    return (
        rules.join(agents, ["id", "grp"])
        .select("id", F.col("g_agent").alias("agent"), "directive", "value")
        .unionByName(sitemaps)
    )


def robots_admission(
    frontier: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """(url, allowed, rule_path) — fetch admission for a URL frontier
    against a parsed rules table (:func:`parse_robots` output plus a
    ``host`` column), RFC 9309 evaluation reduced to the prefix subset:

    * the applicable group is the requested ``agent``'s if that host
      has one, else the ``*`` group (exact-name-else-star — the RFC's
      longest-agent-substring refinement is a documented simplification);
    * among matching rules the LONGEST path prefix wins; ``allow``
      beats ``disallow`` on equal length; no matching rule → allowed
      (and for hosts with no rules at all — the left join's null arm);
    * rule paths are literal prefixes (the original robots.txt model;
      the ``*``/``$`` wildcard extension is out of scope — translating
      per-rule wildcards to a regex column would Pattern.compile per
      JOINED ROW, the Spark 4 ``split_part`` trap).

    Scale shape: one aggregation over the RULES table (host-keyed,
    tiny next to the frontier) picks each host's group, one equi-join
    on host fans rules onto frontier URLs (rules-per-host is bounded
    by robots.txt size, so the fan-out is a small constant), and one
    ``max(struct(...))`` argmax per URL collapses it — map-side
    partial agg, no window, frontier never self-joins."""
    # parse_robots lowercases stored agent names; match case-insensitively
    # or agent='MyBot' silently falls back to the '*' group (code-review
    # r5 wave-3 #6)
    agent = agent.lower()
    # physical-host identity, like fetch_schedule/surt_key: lowercase,
    # strip userinfo and the scheme-default port — or
    # 'https://user@example.com/...' silently dodges example.com's rules
    # by never matching the rules join (found driving the verify pass
    # after code-review r5 wave-3 #5)
    scheme_c = F.lower(
        F.regexp_extract(F.col(url_col), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    host = F.lower(F.regexp_extract(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1
    ))
    host = F.regexp_replace(host, r"^[^@]*@", "")
    host = F.when(
        scheme_c == "http", F.regexp_replace(host, r":80$", "")
    ).when(
        scheme_c == "https", F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    path0 = F.regexp_extract(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1
    )
    urls = frontier.select(
        F.col(url_col).alias("url"), host.alias("_host"),
        F.when(path0 == "", "/").otherwise(path0).alias("_path"),
    )
    r = rules.filter(F.col("directive").isin("allow", "disallow")).select(
        F.col("host").alias("_host"), "agent", "directive",
        F.col("value").alias("rule_path"),
    )
    w_specific = r.groupBy("_host").agg(
        F.max((F.col("agent") == agent).cast("int")).alias("_has_specific")
    )
    grp = (
        r.join(F.broadcast(w_specific), "_host")
        .filter(
            (F.col("agent") == agent)
            | ((F.col("_has_specific") == 0) & (F.col("agent") == "*"))
        )
        .select("_host", "directive", "rule_path")
    )
    joined = urls.join(grp, "_host", "left").withColumn(
        "_match",
        # RFC 9309: an EMPTY-value rule matches NO path — the ubiquitous
        # permissive idiom "Disallow:" (empty) means allow-all, and
        # treating it as match-all blocked entire hosts (code-review r5
        # wave-3 #1). startswith('') is true for every path, so the
        # emptiness test must EXCLUDE, not short-circuit to match.
        F.col("rule_path").isNotNull() & (F.col("rule_path") != "")
        & F.col("_path").startswith(F.col("rule_path")),
    )
    best = (
        joined.groupBy("url")
        .agg(
            F.max(
                F.when(
                    F.col("_match"),
                    F.struct(
                        F.length("rule_path").alias("l"),
                        (F.col("directive") == "allow").cast("int")
                        .alias("a"),
                        F.col("rule_path").alias("p"),
                    ),
                )
            ).alias("_best")
        )
    )
    return best.select(
        "url",
        F.coalesce(F.col("_best.a") == 1, F.lit(True)).alias("allowed"),
        F.col("_best.p").alias("rule_path"),
    )


def crawl_delays(rules: DataFrame, agent: str = "*") -> DataFrame:
    """(host, crawl_delay) — the effective ``Crawl-delay`` per host for
    the requested agent, completing the robots → politeness path
    (:func:`parse_robots` → here → ``operators.webarchive.
    fetch_schedule``'s ``delays`` input).

    Group choice mirrors :func:`robots_admission`: the exact-name
    agent's group shadows ``*``. Non-numeric values drop (``try_cast``
    — a hostile robots.txt must not kill the job under ANSI mode);
    several delay lines in the winning group collapse to the MAX
    (conservative: the politest reading). ``rules`` is the parse output
    plus a ``host`` column; everything here is host-cardinality — one
    broadcast of the has-specific flags and one map-side-combined max.
    """
    agent = agent.lower()  # stored agent names are lowercased (wave-3 #6)
    r = (
        rules.filter(F.col("directive") == "crawl-delay")
        .select(
            "host", "agent",
            F.expr("try_cast(value AS double)").alias("_d"),
        )
        .filter(F.col("_d").isNotNull())
    )
    has_specific = r.groupBy("host").agg(
        F.max((F.col("agent") == agent).cast("int")).alias("_has_specific")
    )
    grp = (
        r.join(F.broadcast(has_specific), "host")
        .filter(
            (F.col("agent") == agent)
            | ((F.col("_has_specific") == 0) & (F.col("agent") == "*"))
        )
    )
    return grp.groupBy("host").agg(F.max("_d").alias("crawl_delay"))
