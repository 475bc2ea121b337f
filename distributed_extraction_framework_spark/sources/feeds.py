"""Feed ingestion: RSS 2.0 ``<item>`` and Atom ``<entry>`` parsing.

The third frontier-discovery source next to sitemaps and robots
(sources/frontier.py) — feeds are how freshness-sensitive crawls find
new URLs between sitemap publishes, the role the reference's download
module's dump-date listing plays for wiki dumps (reference: download/
src/main/scala/org/dbpedia/extraction/dump/download/DumpDownload.scala:
enumerate what is newly published, then fetch).

Pure Catalyst, same discipline as ``parse_sitemaps``: block extraction
with ``regexp_extract_all`` (one pattern per syntax — RE2-subset, no
backrefs), scalar per-field pulls after the explode, CDATA unwrapped
with two anchored ``regexp_replace`` calls (prefix and suffix
separately — pattern backreferences differ between Java ``$1`` and RE2
``\\1``, so none are used). Zero Python, zero shuffles; feed files are
KB-sized so per-row work is trivially bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

_ITEM_RE = r"(?is)<item\b[^>]*>(.*?)</item>"
_ENTRY_RE = r"(?is)<entry\b[^>]*>(.*?)</entry>"
_TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"
# RSS <link> carries the URL as TEXT; Atom <link> carries it as an href
# attribute (and is usually self-closing).
# RSS capture is (.*?) not [^<]+ — a CDATA-wrapped link starts with '<'
# and would silently drop the entry (code-review r5 wave-4 #5); _unwrap
# strips the wrapper after extraction.
_RSS_LINK_RE = r"(?is)<link[^>]*>(.*?)</link>"
# Atom: the entry URL is the link with rel="alternate" — or no rel at
# all (the spec default). Taking the FIRST href regardless of rel
# returned rel="replies"/"self" URLs on Blogger-style feeds
# (code-review r5 wave-4 #6), so link TAGS are filtered by rel first.
_ATOM_LINK_TAG_RE = r"(?is)<link\b[^>]*>"
_ATOM_REL_RE = r"""(?is)\brel\s*=\s*["']([^"']*)["']"""
_HREF_RE = r"""(?is)\bhref\s*=\s*["']([^"']+)["']"""
_GUID_RE = r"(?is)<guid[^>]*>(.*?)</guid>"
_ATOM_ID_RE = r"(?is)<id[^>]*>(.*?)</id>"
_PUBDATE_RE = r"(?is)<pubdate[^>]*>(.*?)</pubdate>"
_UPDATED_RE = r"(?is)<updated[^>]*>(.*?)</updated>"


def _unwrap(v: Column) -> Column:
    """Trim + strip a CDATA wrapper (prefix and suffix replaced
    separately — no pattern backrefs, engine-portable)."""
    v = F.regexp_replace(v, r"(?is)^\s*<!\[CDATA\[", "")
    v = F.regexp_replace(v, r"(?is)\]\]>\s*$", "")
    return F.trim(v)


def parse_feeds(
    df: DataFrame,
    xml_col: str = "xml",
    id_col: str = "feed_id",
) -> DataFrame:
    """(id, kind, entry_idx, title, link, entry_id, ts_raw) — one row
    per RSS ``<item>`` / Atom ``<entry>`` that carries a link (the
    frontier use-case: an entry without a URL cannot be fetched).

    * ``kind`` — ``rss`` or ``atom`` (by block syntax; a file mixing
      both yields both);
    * ``entry_idx`` — 0-based document-order position of the block
      within the feed, per kind (link-less blocks still occupy their
      index — the position is stable across polls that toggle a link);
    * ``entry_id`` — ``<guid>`` (RSS) / ``<id>`` (Atom), null if absent
      — the dedup key across polls;
    * ``ts_raw`` — ``<pubDate>`` / ``<updated>`` verbatim (RFC 822 vs
      RFC 3339; the caller picks the cast, as with sitemap lastmod).

    Titles and ids are CDATA-unwrapped and trimmed.
    """
    x = F.coalesce(F.col(xml_col).cast("string"), F.lit(""))

    def blocks(
        pattern: str, kind: str, id_re: str, ts_re: str
    ) -> DataFrame:
        b = F.col("_b")
        if kind == "rss":
            link = _unwrap(F.regexp_extract(b, _RSS_LINK_RE, 1))
        else:
            cand = F.filter(
                F.regexp_extract_all(b, F.lit(_ATOM_LINK_TAG_RE), F.lit(0)),
                lambda t: F.lower(F.regexp_extract(t, _ATOM_REL_RE, 1))
                .isin("alternate", ""),
            )
            # try_element_at: an entry with only rel="self"/"replies"
            # links has an EMPTY candidate array, and plain element_at
            # throws under ANSI mode
            link = F.regexp_extract(
                F.coalesce(F.try_element_at(cand, F.lit(1)), F.lit("")),
                _HREF_RE, 1,
            )
        rows = (
            df.select(
                F.col(id_col).alias("id"),
                F.posexplode(
                    F.regexp_extract_all(x, F.lit(pattern), F.lit(1))
                ).alias("_pos", "_b"),
            )
            .select(
                "id",
                F.col("_pos"),
                _unwrap(F.regexp_extract(b, _TITLE_RE, 1)).alias("title"),
                link.alias("link"),
                F.nullif(
                    _unwrap(F.regexp_extract(b, id_re, 1)), F.lit("")
                ).alias("entry_id"),
                F.nullif(
                    F.trim(F.regexp_extract(b, ts_re, 1)), F.lit("")
                ).alias("ts_raw"),
            )
            .filter(F.col("link") != "")
        )
        return rows.select(
            "id",
            F.lit(kind).alias("kind"),
            F.col("_pos").alias("entry_idx"),
            "title", "link", "entry_id", "ts_raw",
        )

    return blocks(_ITEM_RE, "rss", _GUID_RE, _PUBDATE_RE).unionByName(
        blocks(_ENTRY_RE, "atom", _ATOM_ID_RE, _UPDATED_RE)
    )
