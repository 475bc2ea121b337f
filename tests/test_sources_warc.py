"""WARC/WET ingestion (sources/warc.py): split-parallel record scan,
response vs conversion payload handling, render→parse roundtrip."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_extraction_framework_spark.sources.warc import (
    parse_warc_fragments,
    read_warc,
    render_warc,
    write_warc_file,
)

_INFO = "WARC/1.0\r\nWARC-Type: warcinfo\r\n\r\nsoftware: test\r\n\r\n"
_REQ = ("WARC/1.0\r\nWARC-Type: request\r\n"
        "WARC-Target-URI: https://w/req\r\n\r\nGET / HTTP/1.1\r\n\r\n")


def _wet(url, ts, text, lang=None):
    lang_hdr = (
        f"WARC-Identified-Content-Language: {lang}\r\n" if lang else ""
    )
    return (
        f"WARC/1.0\r\nWARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\nWARC-Date: {ts}\r\n{lang_hdr}"
        f"Content-Length: {len(text.encode())}\r\n\r\n{text}\r\n\r\n"
    )


def _response(url, ts, body):
    http = f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n{body}"
    return (
        f"WARC/1.0\r\nWARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\nWARC-Date: {ts}\r\n"
        f"Content-Length: {len(http.encode())}\r\n\r\n{http}\r\n\r\n"
    )


def test_read_warc_mixed_records(spark, tmp_path):
    path = str(tmp_path / "mixed.warc")
    write_warc_file(
        [
            _INFO,
            _wet("https://w/1", "2024-01-01T00:00:01Z",
                 "hello extracted text", "en,de"),
            _response("https://w/2", "2024-01-01T00:00:02Z",
                      "<html><body>raw</body></html>"),
            _REQ,
            _wet("https://w/3", "2024-01-01T00:00:03Z", "dernier", "fr"),
        ],
        path,
    )
    got = {r["url"]: r for r in read_warc(spark, path).collect()}
    # warcinfo/request records filtered JVM-side
    assert set(got) == {"https://w/1", "https://w/2", "https://w/3"}
    r1 = got["https://w/1"]
    assert r1["text"] == "hello extracted text"
    assert r1["lang"] == "en"          # first tag of the header list
    assert r1["html"] is None
    assert str(r1["warc_ts"]) == "2024-01-01 00:00:01"
    r2 = got["https://w/2"]
    # response payload = bytes AFTER the HTTP header section
    assert bytes(r2["html"]) == b"<html><body>raw</body></html>"
    assert r2["text"] is None and r2["record_type"] == "response"
    assert got["https://w/3"]["lang"] == "fr"


def test_read_warc_malformed_date_degrades_to_null(spark, tmp_path):
    """A corrupt or missing WARC-Date must yield warc_ts NULL, not an
    ANSI CANNOT_PARSE_TIMESTAMP job failure (code-review r5 #3)."""
    path = str(tmp_path / "baddate.warc")
    write_warc_file(
        [
            _wet("https://w/ok", "2024-01-01T00:00:01Z", "fine"),
            _wet("https://w/bad", "not-a-date", "still extracted"),
        ],
        path,
    )
    got = {r["url"]: r for r in read_warc(spark, path).collect()}
    assert str(got["https://w/ok"]["warc_ts"]) == "2024-01-01 00:00:01"
    assert got["https://w/bad"]["warc_ts"] is None
    assert got["https://w/bad"]["text"] == "still extracted"


def test_read_warc_split_straddling(spark, tmp_path):
    # many records + a tiny maxPartitionBytes force records to straddle
    # input splits; the lineSep datasource must still yield whole records
    path = str(tmp_path / "big.wet")
    recs = [
        _wet(f"https://w/{i}", "2024-01-01T00:00:00Z",
             f"document {i} body " + "x" * 200)
        for i in range(300)
    ]
    write_warc_file(recs, path)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
    try:
        df = spark.read.option("lineSep", "WARC/1.0\r\n").text(path)
        out = parse_warc_fragments(df)
        assert out.rdd.getNumPartitions() > 1   # the scan actually split
        rows = out.collect()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert len(rows) == 300
    assert {r["url"] for r in rows} == {f"https://w/{i}" for i in range(300)}
    assert all(r["text"] == f"document {i} body " + "x" * 200
               for i, r in ((int(r["url"].rsplit("/", 1)[1]), r)
                            for r in rows))


def test_render_parse_roundtrip(spark):
    pages = spark.createDataFrame(
        [("https://a/1", "2024-06-01 10:20:30", "some text", "en"),
         ("https://a/2", "2024-06-01 10:20:31", "", None)],
        ["url", "ts", "text", "lang"],
    ).select("url", F.col("ts").cast("timestamp").alias("warc_ts"),
             "text", "lang")
    back = parse_warc_fragments(render_warc(pages), "record")
    got = {r["url"]: r for r in back.collect()}
    assert got["https://a/1"]["text"] == "some text"
    assert got["https://a/1"]["lang"] == "en"
    assert str(got["https://a/1"]["warc_ts"]) == "2024-06-01 10:20:30"
    assert got["https://a/2"]["text"] == "" and got["https://a/2"]["lang"] is None
    # the whole parse is one codegen'd projection — no exchange, no Python
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_http_status_location_and_web_redirects(spark, tmp_path):
    from distributed_extraction_framework_spark.sources.warc import (
        web_redirects,
    )

    def _resp(url, status_line, extra_hdrs, body):
        http = f"HTTP/1.1 {status_line}\r\n{extra_hdrs}\r\n{body}"
        return (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\nWARC-Date: 2024-01-01T00:00:00Z"
            f"\r\n\r\n{http}\r\n\r\n"
        )

    path = str(tmp_path / "r.warc")
    write_warc_file(
        [
            _resp("https://r/1", "301 Moved Permanently",
                  "Location: https://r/2\r\n", ""),
            _resp("https://r/2", "302 Found",
                  "location: https://r/3\r\n", ""),   # lower-case header
            # payload echoing "Location:" must NOT leak into the column
            _resp("https://r/3", "200 OK", "Server: t\r\n",
                  "Location: https://bogus/"),
            _wet("https://r/4", "2024-01-01T00:00:00Z", "text"),
        ],
        path,
    )
    got = {r["url"]: r for r in read_warc(spark, path).collect()}
    assert got["https://r/1"]["http_status"] == 301
    assert got["https://r/1"]["http_location"] == "https://r/2"
    assert got["https://r/2"]["http_status"] == 302
    assert got["https://r/2"]["http_location"] == "https://r/3"
    assert got["https://r/3"]["http_status"] == 200
    assert got["https://r/3"]["http_location"] is None
    assert got["https://r/4"]["http_status"] is None  # conversion record
    pairs = {(r["src"], r["dst"])
             for r in web_redirects(read_warc(spark, path)).collect()}
    assert pairs == {("https://r/1", "https://r/2"),
                     ("https://r/2", "https://r/3")}
