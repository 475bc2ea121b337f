"""Structured-streaming operators.

The reference is batch-only (SURVEY.md §2.3: resumability via marker files,
no state stores); a Common-Crawl-scale KG pipeline additionally needs
incremental ingestion. Three streaming shapes:

* ``windowed_event_counts`` — watermarked tumbling-window aggregation over
  an events stream (late data handled by the watermark);
* ``sessionize`` — session windows (gap-based), batch AND streaming form;
* ``stream_extract`` — the extractor suite applied to a pages STREAM:
  the fused extraction pass is stateless/narrow, so the same ``extract()``
  plan runs under ``readStream`` unchanged — this is the payoff of keeping
  the pipeline shuffle-free;
* ``running_counts_stateful`` — applyInPandasWithState custom stateful
  operator (per-key running aggregates with timeout).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str, max_files: int = 1) -> DataFrame:
    return (
        spark.readStream.format("parquet")
        .schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .load(path)
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked (sliding) window counts + sums per event_type."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type", "n_events", "sum_value",
        )
    )


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessions per user (works in batch and streaming)."""
    return (
        events.withWatermark("ts", gap)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "user_id", "n_events", "sum_value",
        )
    )


RUNNING_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_total", LongType()),
        StructField("sum_total", DoubleType()),
    ]
)
_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("s", DoubleType())]
)


def running_counts_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-event_type running totals via
    applyInPandasWithState (processing-time timeout disabled)."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += int(len(pdf))
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n_total": [n], "sum_total": [s]}
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_extract(spark: SparkSession, pages_path: str, extractors=None) -> DataFrame:
    """The fused extractor suite over a pages STREAM — identical plan, no
    state, so it slots under readStream unchanged."""
    from ..operators.extractors import extract
    from ..schema import PAGES_SCHEMA

    stream = (
        spark.readStream.format("parquet")
        .schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(pages_path)
    )
    return extract(stream, extractors=extractors)


DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def read_document_stream(
    spark: SparkSession, path: str, max_files: int = 1
) -> DataFrame:
    return (
        spark.readStream.format("parquet")
        .schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .load(path)
    )


def stream_exact_dedup(docs: DataFrame) -> DataFrame:
    """Streaming exact dedup: per content-digest canonical (min doc_id) as
    a stateful aggregation in update mode.

    The state store keys on the 32-char md5, never the body, and the
    running ``min(doc_id)`` makes the result ORDER-INDEPENDENT across
    micro-batches — the stream converges to exactly the batch
    ``exact_dedup`` answer no matter how arrivals interleave (which is why
    the driver gates it against the SAME batch oracle). At 100 TB pair
    this with a watermark on an event-time column to bound state
    (``dropDuplicatesWithinWatermark`` semantics); unbounded keys here
    mirror the batch contract."""
    digest = F.md5(F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8"))
    return (
        docs.withColumn("digest", digest)
        .groupBy("digest")
        .agg(F.min("doc_id").alias("doc_id"))
    )


def stream_hll_registers(
    df: DataFrame, key_col: str, p: int = 12, group_cols=None
) -> DataFrame:
    """Streaming HyperLogLog: the batch ``hll_registers`` plan (ONE
    groupBy-max) is a monotone aggregation, so it runs under readStream
    unchanged — state is m = 2^p rows per group FOREVER, regardless of
    how many keys stream past, and ``max`` makes the result order-
    independent across micro-batches: the stream converges to exactly
    the batch register table (driver-gated against the SAME oracle).
    This is the streaming cardinality answer at ingest scale: distinct
    URLs/entities per hour without keeping the key set in the store."""
    from ..operators.sketches import hll_registers

    return hll_registers(df, key_col, p=p, group_cols=group_cols)


def windowed_hll_registers(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "1 hour",
    p: int = 12,
    group_cols=None,
    watermark: str | None = None,
) -> DataFrame:
    """Per-time-window HLL register table → ``(win_start, win_end,
    *group_cols, register, rho)`` — "distinct users per hour" at ingest
    scale with state bounded at windows × groups × 2^p rows, never the
    key set. Works in batch AND under readStream (pass ``watermark`` to
    let closed windows evict); monotone max keeps micro-batch order
    irrelevant within a window, exactly like :func:`stream_hll_registers`.
    Feed ``operators.sketches.hll_estimate`` with
    group_cols=["win_start", "win_end", ...] for the per-window curve."""
    from ..operators.sketches import _hll_register_rho

    if watermark:
        df = df.withWatermark(ts_col, watermark)
    register, rho = _hll_register_rho(F.col(key_col), p)
    group_cols = list(group_cols or [])
    return (
        df.select(
            F.window(ts_col, window).alias("win"),
            *group_cols,
            register.alias("register"),
            rho.alias("rho"),
        )
        .groupBy("win", *group_cols, "register")
        .agg(F.max("rho").alias("rho"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *group_cols, "register", "rho",
        )
    )


def run_to_memory(df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming query to completion against current files
    (test/smoke harness: memory sink + processAllAvailable)."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q


def stream_to_parquet(df: DataFrame, out_path: str, checkpoint: str):
    """Exactly-once incremental sink: parquet + checkpointLocation.

    Restarting with the same checkpoint resumes from the last committed
    source offsets — already-processed input files are never re-emitted
    (the streaming analog of the pipeline's snapshot resume; tested by a
    stop/add-files/restart round in tests/test_streaming.py)."""
    return (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .start()
    )


CRAWL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("url", StringType()),
        StructField("html", StringType()),
    ]
)


def stream_web_triples(spark: SparkSession, pages_path: str) -> DataFrame:
    """The crawl-page → KG composite over a pages STREAM. Every channel
    of ``web_page_triples`` is a stateless scan+project (the pandas-UDF
    scanners included), so the identical plan slots under ``readStream``
    unchanged — streaming parity for the webtext path, mirroring
    :func:`stream_extract` for the wiki path."""
    from ..operators.structured_data import web_page_triples

    stream = (
        spark.readStream.format("parquet")
        .schema(CRAWL_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(pages_path)
    )
    return web_page_triples(stream, id_col="doc_id")
