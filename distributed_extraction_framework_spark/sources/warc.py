"""WARC / WET ingestion — Common-Crawl-style web-archive records → the
pages schema ``(url, warc_ts, html, text, lang)``.

The reference's splittable-ingest capability (reference: extraction/src/
main/scala/org/dbpedia/extraction/spark/io/DBpediaWikiPageInputFormat
.scala + ByteMatcher.scala — byte-level record scanning so ONE large
dump file splits across workers) applied to the web-archive container
formats instead of MediaWiki XML: the same Spark-native move as
sources/rawdump.py. ``lineSep="WARC/1.0\\r\\n"`` makes each input split
of the text datasource yield whole records (the datasource handles
records straddling split boundaries — exactly what ByteMatcher did
manually); all field/payload extraction is then Catalyst regex over the
record fragment — no custom Hadoop classes, one narrow stage, zero
shuffles, predicate-pushdown-friendly.

Record-type handling:

* ``conversion`` records (WET files — extracted text) → ``text`` is the
  record block, ``html`` null, ``lang`` from the
  ``WARC-Identified-Content-Language`` header when present (first tag);
* ``response`` records (WARC files) → the block is an HTTP message:
  ``html`` = the bytes after the HTTP header section (cast to binary),
  ``text`` null, plus ``http_status`` and ``http_location`` pulled from
  the header section only — :func:`web_redirects` turns the 3xx subset
  into (src, dst) pairs for ``redirects.transitive_closure``;
* ``warcinfo``/``request``/``metadata`` records are filtered out
  JVM-side before any payload work.

Documented limitations (same class as the reference's ByteMatcher):

* record boundaries are recognized by the version marker, not by
  walking ``Content-Length`` — a payload that itself embeds a verbatim
  ``WARC/1.0\\r\\n`` sequence (an archived WARC inside a WARC) splits
  early. Common Crawl WET/WARC payloads are HTML/text and do not;
* the text datasource decodes UTF-8; binary payloads with invalid
  UTF-8 runs survive (Spark replaces, never throws outside ANSI casts)
  but are not byte-exact — WET text records, the crawl-pipeline input
  this engine consumes, are UTF-8 by spec. Gzip variants decompress
  transparently via the Hadoop codec, but per-record-gzip Common Crawl
  files are one stream to the codec — many files parallelize, one file
  does not (noted in sources/rawdump.py for bz2 likewise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MARKER = "WARC/1.0\r\n"
# (?s) so payloads span lines; leftmost match = FIRST blank line, i.e.
# the end of the WARC header section
_BLOCK_RE = r"(?s)\r\n\r\n(.*)$"


def _header(frag, name: str):
    return F.regexp_extract(frag, rf"(?m)^{name}:\s*(\S+)", 1)


def parse_warc_fragments(df: DataFrame, col: str = "value") -> DataFrame:
    """Record fragments (everything between version markers) → the pages
    schema. Pure Catalyst: regex header pulls + payload slicing, one
    projection, whole-stage codegen end to end."""
    frag = F.col(col)
    rtype = _header(frag, "WARC-Type")
    block = F.regexp_replace(
        F.regexp_extract(frag, _BLOCK_RE, 1), r"(\r\n)+$", ""
    )
    # response blocks are HTTP messages: payload follows the HTTP
    # header section's blank line; status/Location come from the header
    # section ONLY (substring_index, so a payload echoing "Location:"
    # can't leak into the column)
    http_payload = F.regexp_extract(block, _BLOCK_RE, 1)
    http_head = F.substring_index(block, "\r\n\r\n", 1)
    status = F.nullif(
        F.regexp_extract(http_head, r"^HTTP/[0-9.]+\s+(\d{3})", 1), F.lit("")
    ).cast("int")
    location = F.nullif(
        F.regexp_extract(http_head, r"(?im)^location:\s*(\S+)", 1),
        F.lit(""),
    )
    lang = _header(frag, "WARC-Identified-Content-Language")
    return (
        df.filter(rtype.isin("response", "conversion"))
        .select(
            _header(frag, "WARC-Target-URI").alias("url"),
            # try_to_timestamp: a malformed or missing WARC-Date must
            # degrade to NULL, not throw under ANSI mode — crawl
            # archives are hostile input (code-review r5 #3)
            F.try_to_timestamp(
                _header(frag, "WARC-Date"), F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")
            ).alias("warc_ts"),
            F.when(rtype == "response", http_payload.cast("binary"))
            .alias("html"),
            F.when(rtype == "conversion", block).alias("text"),
            F.when(lang != "", F.substring_index(lang, ",", 1))
            .alias("lang"),
            rtype.alias("record_type"),
            F.when(rtype == "response", status).alias("http_status"),
            F.when(rtype == "response", location).alias("http_location"),
        )
        .filter(F.col("url") != "")
    )


def web_redirects(parsed: DataFrame) -> DataFrame:
    """(src, dst) HTTP redirect pairs from parsed response records — the
    crawl-side analog of the reference's wiki-redirect harvest
    (reference: extraction/src/main/scala/org/dbpedia/extraction/
    mappings/RedirectExtractor.scala semantics over 3xx + Location
    instead of #REDIRECT wikitext). Feed the result straight into
    ``operators.redirects.transitive_closure`` to resolve chains and
    drop cycles; ``canonicalize``/``scrub.latest_capture`` then collapse
    the crawl onto final targets. Pure projection — no shuffle here;
    the closure owns its own join strategy."""
    return (
        parsed.filter(
            (F.col("http_status").between(300, 399))
            & F.col("http_location").isNotNull()
        )
        .select(F.col("url").alias("src"),
                F.col("http_location").alias("dst"))
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC/WET files at ``path`` into the pages schema (+ a
    ``record_type`` column). Split-parallel within a file for
    uncompressed/bz2 inputs; see module docstring for codec notes."""
    raw = spark.read.option("lineSep", _MARKER).text(path)
    return parse_warc_fragments(raw)


def render_warc(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    lang_col: str | None = "lang",
) -> DataFrame:
    """Render pages as WET-style ``conversion`` records — one ``record``
    string per row, newline-safe for a text sink. The exact inverse of
    :func:`parse_warc_fragments` for conversion records; the
    ``warc_roundtrip`` driver gate closes render → parse."""
    ts = F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    body = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    lang_hdr = (
        F.when(
            F.coalesce(F.col(lang_col), F.lit("")) != "",
            F.concat(F.lit("WARC-Identified-Content-Language: "),
                     F.col(lang_col), F.lit("\r\n")),
        ).otherwise(F.lit(""))
        if lang_col is not None
        else F.lit("")
    )
    return pages.select(
        F.concat(
            F.lit(_MARKER),
            F.lit("WARC-Type: conversion\r\n"),
            F.lit("WARC-Target-URI: "), F.col(url_col), F.lit("\r\n"),
            F.lit("WARC-Date: "), ts, F.lit("\r\n"),
            lang_hdr,
            F.lit("Content-Length: "),
            F.length(body.cast("binary")).cast("string"),
            F.lit("\r\n\r\n"),
            body,
            F.lit("\r\n\r\n"),
        ).alias("record")
    )


def write_warc_file(records: list[str], path: str) -> None:
    """Test helper: concatenate rendered record strings into one WARC
    file on local disk (records already carry their separators)."""
    with open(path, "w", encoding="utf-8") as f:
        for r in records:
            f.write(r)
