"""Content-hygiene ops: PII scrub, URL canonicalization, paragraph dedup."""

from __future__ import annotations

import pyspark.sql.functions as F

from distributed_extraction_framework_spark.operators.dedup import paragraph_dedup
from distributed_extraction_framework_spark.operators.scrub import (
    canonical_url,
    pii_stats,
    scrub_pii,
    url_dedup,
)


def test_pii_stats_and_scrub(spark):
    rows = [
        (0, "mail me at a.b+c@Example.co.uk or 192.168.0.1 now"),
        (1, "call +4915123456789 or 415-555-0100 thanks"),
        (2, "clean text, no pii at all; version 1.2 is not an ip"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["id"]: r for r in pii_stats(df).collect()}
    assert (got[0]["n_email"], got[0]["n_ipv4"], got[0]["n_phone"]) == (1, 1, 0)
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (0, 0, 2)
    assert got[2]["has_pii"] is False and got[3]["has_pii"] is False

    s = {r["doc_id"]: r["text"] for r in scrub_pii(df).collect()}
    assert s[0] == "mail me at <EMAIL> or <IP> now"
    assert s[1] == "call <PHONE> or <PHONE> thanks"
    assert s[2] == rows[2][1]  # untouched
    assert s[3] == ""


def test_canonical_url_rules_and_idempotence(spark):
    cases = [
        ("HTTP://WWW.Example.COM:80/A/b?utm_source=x&b=2&a=1#frag",
         "http://example.com/A/b?a=1&b=2"),
        ("https://Example.com:443", "https://example.com/"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        ("http://example.com/?gclid=1&ref=h", "http://example.com/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]
    # idempotent: canonicalizing the canonical form is a no-op
    df2 = spark.createDataFrame([(c,) for c in got], ["url"])
    again = [r["c"] for r in df2.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert again == got


def test_url_dedup_groups_variants(spark):
    rows = [
        (0, "http://www.site.com/p?utm_source=a"),
        (1, "HTTP://SITE.com:80/p"),
        (2, "http://site.com/p#x"),
        (3, "http://site.com/q"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    got = {r["canonical_url"]: r for r in url_dedup(df).collect()}
    assert got["http://site.com/p"]["keeper_id"] == 0
    assert got["http://site.com/p"]["n_variants"] == 3
    assert got["http://site.com/q"]["n_variants"] == 1


def test_paragraph_dedup_keeps_first_occurrence(spark):
    rows = [
        (0, "alpha one\n\nshared block\n\nbeta zero"),
        (1, "shared block\n\ngamma unique"),
        (2, "  shared block \n\n\n\nalpha one"),  # trims + empty para dropped
        (3, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["id"]: r for r in paragraph_dedup(df).collect()}
    assert got[0]["text"] == rows[0][1] and got[0]["n_kept"] == 3
    assert got[1]["text"] == "gamma unique"
    assert (got[1]["n_paras"], got[1]["n_kept"]) == (2, 1)
    assert got[2]["text"] == "" and got[2]["n_paras"] == 2 and got[2]["n_kept"] == 0
    assert got[3]["text"] == "" and got[3]["n_paras"] == 0


def test_paragraph_dedup_literal_separator(spark):
    """sep is a LITERAL, not a regex: '. ' must not split on any-char."""
    rows = [(0, "alpha one. beta two. alpha one"), (1, "alpha one. gamma")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["id"]: r for r in paragraph_dedup(df, sep=". ").collect()}
    # doc 0: 'alpha one' repeats within the doc -> second occurrence dropped;
    # doc 1's 'alpha one' was already seen in doc 0 -> only 'gamma' survives.
    # NB the trailing paragraph 'alpha one' (no '. ' suffix) equals the
    # first after trim, hence the within-doc dedup.
    assert got[0]["text"] == "alpha one. beta two"
    assert (got[0]["n_paras"], got[0]["n_kept"]) == (3, 2)
    assert got[1]["text"] == "gamma" and got[1]["n_kept"] == 1


def test_latest_capture_keeper_and_ties(spark):
    from datetime import datetime

    from distributed_extraction_framework_spark.operators.scrub import (
        latest_capture,
    )

    t = datetime(2024, 1, 1, 0, 0, 0)
    t2 = datetime(2024, 1, 2, 0, 0, 0)
    rows = [
        (0, "HTTP://WWW.Example.COM:80/a", t),
        (1, "http://example.com/a", t2),      # same canonical, newer → keeper
        (2, "http://example.com/a?utm_source=x", t2),  # ts tie → min id wins
        (3, "https://other.com/b", t),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "warc_ts"])
    got = {r["canonical_url"]: r for r in latest_capture(df).collect()}
    a = got["http://example.com/a"]
    assert a["keeper_id"] == 1 and a["n_captures"] == 3
    assert a["keeper_ts"] == t2
    assert got["https://other.com/b"]["keeper_id"] == 3


def test_latest_capture_string_ids(spark):
    """WARC-style string record ids take the two-aggregate path — same
    keeper semantics (max ts, ties -> min id), no numeric negation."""
    from datetime import datetime

    from distributed_extraction_framework_spark.operators.scrub import (
        latest_capture,
    )

    t, t2 = datetime(2024, 1, 1), datetime(2024, 1, 2)
    rows = [
        ("w-b", "http://example.com/a", t2),
        ("w-a", "http://example.com/a?utm_source=x", t2),  # tie → min id
        ("w-c", "HTTP://WWW.Example.COM:80/a", t),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "warc_ts"])
    got = latest_capture(df).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["keeper_id"], r["keeper_ts"], r["n_captures"]) == ("w-a", t2, 3)
