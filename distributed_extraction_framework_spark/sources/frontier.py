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
