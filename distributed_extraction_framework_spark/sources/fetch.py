"""Distributed URL-list → pages fetch stage — the reference's download
module re-expressed Spark-native.

Reference analog: the ``download/`` module (DistDownload.scala:26-78 — an
Akka master/worker pull queue over dump URLs; actors/Master.scala:21-100 —
per-mirror connection caps and progress-timeout re-queuing; 1,516 LoC of
actor plumbing). On Spark the work queue IS the scheduler, so the same
behavior collapses to a dataflow:

* **work distribution** — the URL list is a DataFrame; tasks pull
  partitions exactly like the reference's workers pulled URLs;
* **per-mirror caps** — URLs repartition BY HOST: one host's URLs land in
  one partition and are fetched sequentially by one task (connection cap
  of 1 per host per job; ``politeness_s`` inserts the crawl delay). Spread
  a single huge mirror across tasks by raising ``splits_per_host``;
* **progress-timeout re-queue** — a per-URL socket timeout plus bounded
  in-task retries with exponential backoff (5xx and transport errors
  retry; 4xx is permanent and fails fast). URLs still failing emit
  ``status='error'`` rows; ``refetch_failures`` re-runs exactly those —
  the re-queue made idempotent and resumable instead of actor state;
* **lineage** — every row carries (attempts, wall_ms, http_code, n_bytes,
  error), matching the pipeline's lineage contract.

At fleet scale the fetch is embarrassingly parallel and bounded by the
mirrors, not the cluster; the repartition-by-host shuffle moves only URL
strings (bytes move straight from mirror to executor-local output).
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FETCH_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("host", StringType(), True),
        StructField("status", StringType(), False),  # ok | error
        StructField("http_code", IntegerType(), True),
        StructField("attempts", IntegerType(), False),
        StructField("wall_ms", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("payload", BinaryType(), True),
        StructField("error", StringType(), True),
    ]
)

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/]+)"


def fetch_urls(
    urls: DataFrame,
    url_col: str = "url",
    timeout_s: float = 20.0,
    max_retries: int = 3,
    backoff_s: float = 0.2,
    politeness_s: float = 0.0,
    splits_per_host: int = 1,
    max_bytes: int | None = None,
) -> DataFrame:
    """(FETCH_SCHEMA rows) — fetch every URL with per-host serialization.

    ``splits_per_host > 1`` relaxes the per-mirror cap: a host's URLs hash
    over that many partitions (the reference's configurable per-mirror
    connection count). ``max_bytes`` truncates oversized payloads (a
    defensive cap for 100 TB runs; truncated rows still report the real
    ``n_bytes`` read).
    """
    host = F.regexp_extract(F.col(url_col), _HOST_RE, 1)
    work = urls.select(F.col(url_col).alias("url")).withColumn("host", host)
    if splits_per_host > 1:
        work = work.withColumn(
            "_split", F.pmod(F.xxhash64("url"), F.lit(splits_per_host))
        ).repartition("host", "_split").drop("_split")
    else:
        work = work.repartition("host")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import urllib.error
        import urllib.request

        def one(u: str, h: str):
            t0 = time.time()
            code = None
            payload = None
            err = None
            attempt = 0
            for attempt in range(1, max_retries + 1):
                try:
                    with urllib.request.urlopen(u, timeout=timeout_s) as r:
                        payload = (r.read(max_bytes) if max_bytes is not None
                                   else r.read())
                        code = r.status
                        err = None
                    break
                except urllib.error.HTTPError as e:
                    code, err = e.code, f"HTTP {e.code}"
                    if not 500 <= e.code < 600:
                        break  # 4xx: permanent, no retry (reference: skip)
                except Exception as e:  # timeout / transport — retryable
                    err = f"{type(e).__name__}: {e}"
                if attempt < max_retries:
                    time.sleep(backoff_s * (2 ** (attempt - 1)))
            if politeness_s:
                time.sleep(politeness_s)
            wall = int((time.time() - t0) * 1000)
            ok = payload is not None
            return (
                u, h, "ok" if ok else "error", code, attempt, wall,
                len(payload) if ok else None,
                bytearray(payload) if ok else None,
                None if ok else err,
            )

        for pdf in batches:
            rows = [one(u, h) for u, h in zip(pdf["url"], pdf["host"])]
            yield pd.DataFrame(rows, columns=list(FETCH_SCHEMA.names))

    return work.mapInPandas(run, FETCH_SCHEMA)


def refetch_failures(fetched: DataFrame, **kwargs) -> DataFrame:
    """The reference's re-queue pass: keep the ok rows, re-fetch exactly
    the error rows (idempotent — run until the error set is empty or
    accepted)."""
    ok = fetched.filter(F.col("status") == "ok")
    retry = fetched.filter(F.col("status") == "error").select("url")
    return ok.unionByName(fetch_urls(retry, **kwargs))


# the configured wiki-language set (the reference drives downloads off an
# explicit language list — download config `languages=`); a bare 2-3 letter
# host label is NOT enough ('www.', 'api.', 'cdn.' would become languages)
DEFAULT_LANGS = frozenset(
    "en de fr es it nl pt ru ja zh pl sv ar ko cs fi no tr uk hu da el he "
    "id ro th vi fa ca bg hr lt lv et sk sl sr ms".split()
)


def fetched_to_pages(
    fetched: DataFrame,
    lang_default: str = "en",
    known_langs: frozenset = DEFAULT_LANGS,
) -> DataFrame:
    """ok fetch rows → the engine's pages shape: ``text`` derived from the
    payload through the html→text kernel (functions/wikitext.py), lang
    from the url host's leading label ONLY when it is in ``known_langs``
    (so ``www.`` / ``api.`` hosts fall back to ``lang_default`` instead of
    becoming phantom languages — code-review r4).

    The fetch stage writes payloads once; this projection is a plain
    map — chain it straight into ``Pipeline.run``.
    """
    from ..functions.wikitext import make_html_to_text_udf

    decode = make_html_to_text_udf()
    label = F.regexp_extract("url", r"^https?://([a-z]{2,3})\.", 1)
    lang = F.when(
        label.isin(*sorted(known_langs)), label
    ).otherwise(F.lit(lang_default))
    return (
        fetched.filter(F.col("status") == "ok")
        .select(
            "url",
            F.lit(None).cast("timestamp").alias("warc_ts"),
            F.col("payload").alias("html"),
            decode(F.col("payload")).alias("text"),
            lang.alias("lang"),
        )
    )
