"""Content hygiene for web-scale training corpora: PII detection /
scrubbing and URL canonicalization + dedup.

Standard pre-training curation passes (the C4 / Dolma / RefinedWeb
toolbox) the reference never needed — its input was curated dumps; a
crawl corpus is not. Everything is pure Catalyst (regex + array
expressions inside whole-stage codegen, zero Python, zero shuffles for
the per-document ops; url_dedup adds the one irreducible groupBy on the
canonical key) — except :func:`normalize_unicode`, whose NFC/NFKC step
has no Catalyst equivalent and runs as an Arrow-batched pandas UDF.

Regex portability: every pattern sticks to the syntax subset shared by
Java regex (Spark) and RE2 (DuckDB) — character classes, bounded repeats,
non-capturing groups, ``\\b`` — so the driver gates can hash-verify the
exact same semantics against a DuckDB oracle. No lookaround, no
backreferences.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
# international +E.164-ish, or NANP-style ddd-ddd-dddd
PHONE_RE = r"\+[0-9]{7,15}\b|\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"

_PII = (("email", EMAIL_RE, "<EMAIL>"),
        ("ipv4", IPV4_RE, "<IP>"),
        ("phone", PHONE_RE, "<PHONE>"))


def _pii_counts(t: Column) -> list[Column]:
    """One ``size(regexp_extract_all)`` count column per PII pattern —
    THE single definition of the count semantics (the gates' DuckDB
    oracle mirrors it; pii_stats and pii_report both compose it)."""
    return [
        F.size(F.regexp_extract_all(t, F.lit(rx), F.lit(0))).alias(f"n_{name}")
        for name, rx, _ in _PII
    ]


def _pii_flag(t: Column) -> Column:
    flag = None
    for _, rx, _ in _PII:
        c = F.size(F.regexp_extract_all(t, F.lit(rx), F.lit(0))) > 0
        flag = c if flag is None else (flag | c)
    return flag


def _pii_scrubbed(t: Column) -> Column:
    """Placeholder replacement IN ORDER: emails first (their local parts
    contain dots/digits the later patterns must not see), then IPv4,
    then phones. Same order in the DuckDB oracle."""
    for _, rx, repl in _PII:
        t = F.regexp_replace(t, rx, repl)
    return t


def pii_stats(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(id, n_email, n_ipv4, n_phone, has_pii) — per-document PII counts.

    One projection over the scan; counts are ``size(regexp_extract_all)``
    so the plan stays shuffle-free and the filter (``has_pii``) pushes to
    the read when used as a predicate.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    out = df.select(F.col(id_col).alias("id"), *_pii_counts(t))
    flag = None
    for name, _, _ in _PII:
        c = F.col(f"n_{name}") > 0
        flag = c if flag is None else (flag | c)
    return out.withColumn("has_pii", flag)


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str | None = None) -> DataFrame:
    """Replace PII spans with typed placeholders (see _pii_scrubbed for
    the ordering contract)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    return df.withColumn(out_col or text_col, _pii_scrubbed(t))


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

# tracking params dropped by every major canonicalizer
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)="


def normalized_hostport(scheme: Column, rest: Column) -> Column:
    """Shared host/port normalization (ONE source of truth for page
    identity — :func:`canonical_url` here and ``webarchive.surt_key``
    both call this, after a drift already had to be patched in both
    copies; code-review r5 wave-3 #10): lowercase, drop userinfo
    (RFC 3986 §3.2.1), drop a leading ``www.`` label, drop the scheme's
    default port. ``rest`` is the URL with the scheme prefix removed."""
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1))
    hostport = F.regexp_replace(hostport, r"^[^@]*@", "")
    hostport = F.regexp_replace(hostport, r"^www\.", "")
    return F.when(
        scheme == "http", F.regexp_replace(hostport, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)


def surviving_query_params(query: Column) -> Column:
    """Query-string params minus the tracking set, SORTED bytewise —
    the shared param normalization of :func:`canonical_url` and
    ``webarchive.surt_key``."""
    return F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL, as one Catalyst expression tree:

    1. strip the fragment;
    2. lowercase the scheme and the host;
    2b. drop userinfo (RFC 3986 §3.2.1 — ``user@host`` names the same
        resource as ``host``; also keeps :func:`~distributed_extraction_framework_spark.
        operators.webarchive.surt_key` and this function agreeing on
        page identity, code-review r5 #7);
    3. drop a leading ``www.`` label;
    4. drop the scheme's default port (``:80`` http, ``:443`` https);
    5. drop tracking query params (utm_*, gclid, fbclid, ref), SORT the
       survivors bytewise, and drop the ``?`` when none survive;
    6. empty path → ``/``.

    Deterministic and idempotent: canonical_url(canonical_url(u)) = u.
    """
    u = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = normalized_hostport(scheme, rest)
    pathq = F.regexp_replace(rest, r"^[^/?]+", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    qs = F.array_join(surviving_query_params(query), "&")
    return F.concat(
        scheme, F.lit("://"), hostport, path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """(canonical_url, keeper_id, n_variants): group documents by the
    canonical form of their URL; the keeper is the MIN id (deterministic).
    One map-side-combined groupBy on the canonical key — the only shuffle,
    and AQE handles hot canonical hosts."""
    return (
        df.select(
            canonical_url(F.col(url_col)).alias("canonical_url"),
            F.col(id_col).alias("id"),
        )
        .groupBy("canonical_url")
        .agg(
            F.min("id").alias("keeper_id"),
            F.count("*").alias("n_variants"),
        )
    )


def pii_report(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(id, n_email, n_ipv4, n_phone, has_pii, scrub_md5) in ONE stateless
    projection — no join, no aggregation, so the same plan runs UNCHANGED
    under readStream (the stream_pii driver gate) and stays shuffle-free
    in batch."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    return df.select(
        F.col(id_col).alias("id"),
        *_pii_counts(t),
        _pii_flag(t).alias("has_pii"),
        F.md5(F.encode(_pii_scrubbed(t), "utf-8")).alias("scrub_md5"),
    )


# ---------------------------------------------------------------------------
# Unicode normalization
# ---------------------------------------------------------------------------

def normalize_unicode(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
) -> DataFrame:
    """Canonical Unicode normalization + mojibake diagnostics — the first
    pass of every crawl-text pipeline (mixed encoders emit NFC and NFD
    forms of the same grapheme; exact dedup, tokenizers and sort orders
    all disagree on un-normalized text).

    * ``text_col`` is rewritten to its ``form`` (default NFC) normal
      form via a vectorized pandas UDF (``unicodedata`` has no Catalyst
      equivalent; the Arrow batch transfer carries only the text
      column);
    * ``was_changed`` marks rows the normalization actually rewrote —
      at crawl scale ~99% of docs are already NFC, so downstream stages
      can cheaply count/route the exceptions;
    * ``n_replacement`` counts U+FFFD replacement characters (decoder
      damage already baked into the input: the bytes are gone, flag the
      row) — pure Catalyst, and the piece the DuckDB oracle re-computes
      alongside ``nfc_normalize``.

    Zero shuffles; one projection.
    """
    import unicodedata

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: unicodedata.normalize(form, t) if t is not None else None
        )

    t = F.coalesce(F.col(text_col), F.lit(""))
    normalized = _norm(t)
    # column-preserving: every non-text input column passes through so
    # the op drops into a pipeline without a re-join (plans/curate.py)
    passthrough = [c for c in df.columns if c != text_col]
    return df.select(
        *passthrough,
        normalized.alias(text_col),
        (normalized != t).alias("was_changed"),
        (F.length(t) - F.length(F.regexp_replace(t, "\\ufffd", ""))).alias(
            "n_replacement"
        ),
    )


def latest_capture(df: DataFrame, url_col: str = "url",
                   ts_col: str = "warc_ts",
                   id_col: str = "doc_id") -> DataFrame:
    """Collapse recrawls: keep the NEWEST capture per canonical URL —
    the snapshot-merge step every Common-Crawl-style corpus needs before
    dedup (the same page is fetched in many crawls; training on all of
    them is duplication, training on the oldest is staleness).

    ``(canonical_url, keeper_id, keeper_ts, n_captures)`` with the
    keeper = max capture timestamp, ties broken by MIN id — fully
    deterministic. Numeric ids (the common case) take the fast path: a
    ``max(struct(ts, -id))`` argmax inside the one canonical-key groupBy
    (map-side partial agg, no window, no second exchange). String ids
    (WARC record UUIDs, hex digests) can't be negated, so they take a
    two-aggregate path with the same semantics: max-ts per key, then the
    min id among that key's max-ts captures — still groupBys only, still
    map-side combinable, one extra exchange instead of wrong results.
    AQE handles hot canonical hosts the same way url_dedup's groupBy
    does."""
    from pyspark.sql.types import NumericType

    c = df.select(
        canonical_url(F.col(url_col)).alias("canonical_url"),
        F.col(id_col).alias("id"),
        F.col(ts_col).alias("ts"),
    )
    if isinstance(df.schema[id_col].dataType, NumericType):
        return (
            c.groupBy("canonical_url")
            .agg(
                F.max(F.struct(F.col("ts").alias("ts"),
                               (-F.col("id")).alias("nid"))).alias("_m"),
                F.count("*").alias("n_captures"),
            )
            .select(
                "canonical_url",
                (-F.col("_m.nid")).alias("keeper_id"),
                F.col("_m.ts").alias("keeper_ts"),
                "n_captures",
            )
        )
    tops = c.groupBy("canonical_url").agg(
        F.max("ts").alias("keeper_ts"), F.count("*").alias("n_captures")
    )
    return (
        c.join(tops, ["canonical_url"])
        .filter(F.col("ts") == F.col("keeper_ts"))
        .groupBy("canonical_url", "keeper_ts", "n_captures")
        .agg(F.min("id").alias("keeper_id"))
        .select("canonical_url", "keeper_id", "keeper_ts", "n_captures")
    )
