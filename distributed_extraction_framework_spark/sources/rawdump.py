"""Raw MediaWiki-XML dump ingestion — the reference's splittable
InputFormat capability (DBpediaWikiPageInputFormat.scala:22-117 +
ByteMatcher.scala), Spark-native.

The reference hand-rolls byte-level ``<page>``…``</page>`` scanning so one
bz2 dump splits across workers. Spark's text source already does
record-split-parallel reads given a record delimiter: ``lineSep=</page>``
makes each input split yield whole page fragments (the datasource handles
records straddling split boundaries — exactly what ByteMatcher did
manually). Field extraction is then plain Catalyst regex — no custom
Hadoop classes, no Writables.

Compression note: .bz2/.gz dumps decompress transparently; like the
reference, only splittable codecs (bz2 BYBLOCK) parallelize within one
file — many files parallelize regardless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_mediawiki_dump(
    spark: SparkSession,
    path: str,
    base_url: str = "https://en.pages.example.org/wiki/",
    lang: str = "en",
) -> DataFrame:
    """Parse a MediaWiki ``pages-articles`` XML dump into the pages schema
    (url, warc_ts, html, text, lang).

    One narrow stage: delimiter-split text scan → regex field extraction.
    """
    raw = spark.read.option("lineSep", "</page>").text(path)
    frag = F.col("value")
    title = F.regexp_extract(frag, r"<title>([^<]*)</title>", 1)
    ts = F.regexp_extract(frag, r"<timestamp>([^<]*)</timestamp>", 1)
    body = F.regexp_extract(
        frag, r'(?s)<text[^>]*>(.*?)</text>', 1
    )
    # minimal XML entity decode (the dump escapes these in text)
    text = body
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&amp;", "&")):
        text = F.regexp_replace(text, ent, ch)
    return (
        raw.filter(frag.contains("<title>"))
        .select(
            F.concat(
                F.lit(base_url), F.regexp_replace(title, " ", "_")
            ).alias("url"),
            # try_to_timestamp: plain to_timestamp THROWS on a malformed
            # dump timestamp under ANSI mode before coalesce can apply
            # the default (code-review r5 #3)
            F.coalesce(
                F.try_to_timestamp(ts, F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
            ).alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"),
            text.alias("text"),
            F.lit(lang).alias("lang"),
        )
        .filter(F.col("url") != F.lit(base_url))
    )


def write_mediawiki_dump(pages_texts: list[tuple[str, str, str]], path: str) -> None:
    """Test helper: render (title, timestamp, text) triples as a minimal
    pages-articles XML dump file."""
    def esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            .replace('"', "&quot;")
        )

    parts = ["<mediawiki>", "<siteinfo><sitename>test</sitename></siteinfo>"]
    for title, ts, text in pages_texts:
        parts.append(
            "<page>"
            f"<title>{esc(title)}</title>"
            "<ns>0</ns>"
            f"<revision><timestamp>{ts}</timestamp>"
            f"<text bytes=\"{len(text)}\">{esc(text)}</text></revision>"
            "</page>"
        )
    parts.append("</mediawiki>")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(parts))
