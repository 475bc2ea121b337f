"""Distributed fetch stage (reference download-module parity) against a
local in-process HTTP fixture mirror."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from distributed_extraction_framework_spark.sources.fetch import (
    fetch_urls,
    fetched_to_pages,
    refetch_failures,
)


def _page_html(markup: str) -> bytes:
    esc = markup.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    return (
        '<html><head><title>t</title></head><body>'
        f'<pre data-kind="source">{esc}</pre></body></html>'
    ).encode()


@pytest.fixture(scope="module")
def mirror():
    """Local fixture mirror: /page/N (ok), /flaky/N (5xx for the first two
    hits of each path, then ok), /missing (404)."""
    hits: dict[str, int] = {}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path.startswith("/page/"):
                n = self.path.rsplit("/", 1)[1]
                body = _page_html(f"'''Page {n}''' links [[Target_{n}]].")
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path.startswith("/flaky/"):
                with lock:
                    hits[self.path] = hits.get(self.path, 0) + 1
                    n_hits = hits[self.path]
                if n_hits <= 2:
                    self.send_error(503)
                else:
                    body = _page_html("'''Flaky''' recovered [[Okay]].")
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
            else:
                self.send_error(404)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_ok_retry_and_permanent_failure(spark, mirror):
    urls = spark.createDataFrame(
        [(f"http://{mirror}/page/{i}",) for i in range(5)]
        + [(f"http://{mirror}/flaky/a",), (f"http://{mirror}/missing",)],
        ["url"],
    )
    rows = {r["url"].rsplit("/", 2)[-2] + "/" + r["url"].rsplit("/", 1)[-1]: r
            for r in fetch_urls(urls, timeout_s=5, max_retries=3,
                                backoff_s=0.01).collect()}

    for i in range(5):
        r = rows[f"page/{i}"]
        assert r["status"] == "ok" and r["http_code"] == 200
        assert bytes(r["payload"]) == _page_html(
            f"'''Page {i}''' links [[Target_{i}]].")
        assert r["attempts"] == 1 and r["n_bytes"] == len(bytes(r["payload"]))

    # flaky: two 503s then success — the in-task re-queue
    fl = rows["flaky/a"]
    assert fl["status"] == "ok" and fl["attempts"] == 3

    # 404 is permanent: fail fast, no retries burned
    miss = rows["/missing"] if "/missing" in rows else rows["mirror/missing"] \
        if "mirror/missing" in rows else next(
            r for r in rows.values() if r["url"].endswith("/missing"))
    assert miss["status"] == "error" and miss["http_code"] == 404
    assert miss["attempts"] == 1 and miss["payload"] is None


def test_refetch_failures_requeues_only_errors(spark, mirror):
    """The reference's progress-timeout re-queue: a second pass retries
    exactly the failed rows; the flaky endpoint (down for its first two
    hits) fails a 1-retry first pass, then succeeds on the re-queue."""
    urls = spark.createDataFrame(
        [(f"http://{mirror}/page/77",), (f"http://{mirror}/flaky/requeue",)],
        ["url"],
    )
    first = fetch_urls(urls, timeout_s=5, max_retries=1, backoff_s=0.01) \
        .localCheckpoint(eager=True)
    st = {r["url"].rsplit("/", 1)[-1]: r["status"] for r in first.collect()}
    assert st == {"77": "ok", "requeue": "error"}

    again = refetch_failures(first, timeout_s=5, max_retries=3, backoff_s=0.01)
    st2 = {r["url"].rsplit("/", 1)[-1]: (r["status"], r["attempts"])
           for r in again.collect()}
    assert st2["77"] == ("ok", 1)  # not re-fetched (kept from pass 1)
    assert st2["requeue"][0] == "ok"


def test_fetch_serializes_per_host(spark, mirror):
    """Per-mirror cap: one host's URLs land in ONE partition (sequential,
    politeness-delayed) — 127.0.0.1 and localhost count as two mirrors."""
    port = mirror.rsplit(":", 1)[1]
    urls = spark.createDataFrame(
        [(f"http://127.0.0.1:{port}/page/{i}",) for i in range(4)]
        + [(f"http://localhost:{port}/page/{i}",) for i in range(4)],
        ["url"],
    )
    fetched = fetch_urls(urls, timeout_s=5).withColumn(
        "pid", F.spark_partition_id()
    )
    per_host = (
        fetched.groupBy("host")
        .agg(F.countDistinct("pid").alias("n_pids"))
        .collect()
    )
    assert len(per_host) == 2
    assert all(r["n_pids"] == 1 for r in per_host)


def test_fetched_to_pages_feeds_the_extractor(spark, mirror):
    from distributed_extraction_framework_spark.operators.extractors import extract

    urls = spark.createDataFrame(
        [(f"http://{mirror}/page/{i}",) for i in range(3)], ["url"]
    )
    pages = fetched_to_pages(fetch_urls(urls, timeout_s=5))
    rows = pages.collect()
    assert len(rows) == 3
    assert all(r["text"].startswith("'''Page ") for r in rows)
    quads = extract(pages, extractors=["page_links"])
    objs = {r["obj"].rsplit("/", 1)[1] for r in quads.collect()}
    assert {"Target_0", "Target_1", "Target_2"} <= objs


def test_fetched_to_pages_lang_allowlist(spark, mirror):
    """'www.'/'api.' host labels must NOT become languages (code-review r4):
    only labels in the known-language set map; everything else falls back."""
    from distributed_extraction_framework_spark.sources.fetch import FETCH_SCHEMA

    rows = [
        ("http://www.example.org/x", "www.example.org", "ok", 200, 1, 1, 3,
         bytearray(b"<pre data-kind=\"source\">a</pre>"), None),
        ("http://de.example.org/x", "de.example.org", "ok", 200, 1, 1, 3,
         bytearray(b"<pre data-kind=\"source\">b</pre>"), None),
        ("http://cdn.example.org/x", "cdn.example.org", "ok", 200, 1, 1, 3,
         bytearray(b"<pre data-kind=\"source\">c</pre>"), None),
    ]
    fetched = spark.createDataFrame(rows, FETCH_SCHEMA)
    langs = {r["url"].split("//")[1].split(".")[0]: r["lang"]
             for r in fetched_to_pages(fetched).collect()}
    assert langs == {"www": "en", "de": "de", "cdn": "en"}
