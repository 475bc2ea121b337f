"""Structured streaming: windowed aggregation, sessionization, stateful
running counts, and the extractor suite over a pages stream."""

import pytest
from pyspark.sql import functions as F

from distributed_extraction_framework_spark.streaming import events as E


@pytest.fixture(scope="module")
def events_path(tmp_path_factory):
    # the streaming file source needs a DIRECTORY; the driver testdata is a
    # single parquet file — stage it into one
    d = tmp_path_factory.mktemp("events_src")
    import shutil

    shutil.copy("/root/testdata/sf0.001/events.parquet", d / "part-0.parquet")
    return str(d)


def test_windowed_counts_stream_matches_batch(spark, events_path):
    stream = E.read_event_stream(spark, events_path)
    agg = E.windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    E.run_to_memory(agg, "win_counts", output_mode="append")
    got = spark.sql(
        "select event_type, sum(n_events) n from win_counts group by event_type"
    ).collect()
    batch = (
        spark.read.parquet(events_path)
        .groupBy("event_type").count().collect()
    )
    want = {r["event_type"]: r["count"] for r in batch}
    got_m = {r["event_type"]: r["n"] for r in got}
    # append mode only emits windows the watermark closed; every emitted
    # count must match the batch truth and most types must appear
    for k, v in got_m.items():
        assert v <= want[k]
    assert len(got_m) >= max(len(want) - 1, 1)


def test_sessionize_batch(spark, events_path):
    ev = spark.read.parquet(events_path)
    sess = E.sessionize(ev, gap="30 minutes")
    rows = sess.collect()
    assert rows
    assert all(r["sess_end"] >= r["sess_start"] for r in rows)
    assert sum(r["n_events"] for r in rows) == ev.count()


def test_stateful_running_counts(spark, events_path):
    stream = E.read_event_stream(spark, events_path)
    rc = E.running_counts_stateful(stream)
    E.run_to_memory(rc, "running", output_mode="update")
    got = spark.sql(
        "select event_type, max(n_total) n from running group by event_type"
    ).collect()
    want = {
        r["event_type"]: r["count"]
        for r in spark.read.parquet(events_path)
        .groupBy("event_type").count().collect()
    }
    for r in got:
        assert r["n"] == want[r["event_type"]]


def test_stream_extract(spark, pages_df, tmp_path):
    src = str(tmp_path / "pages_stream")
    pages_df.write.mode("overwrite").parquet(src)
    quads = E.stream_extract(spark, src, extractors=["labels", "page_links"])
    assert quads.isStreaming
    E.run_to_memory(quads, "stream_quads", output_mode="append")
    got = spark.sql("select count(*) n from stream_quads").collect()[0]["n"]
    from distributed_extraction_framework_spark.operators.extractors import extract

    want = extract(pages_df, extractors=["labels", "page_links"]).count()
    assert got == want


def test_stream_checkpoint_restart_exactly_once(spark, pages_df, tmp_path):
    """Kill the stream, add new input, restart with the SAME checkpoint:
    only the new files process; nothing re-emits (exactly-once resume)."""
    import shutil

    src = str(tmp_path / "src")
    stage = str(tmp_path / "stage")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages_df.write.mode("overwrite").parquet(stage)
    import glob
    import os

    files = sorted(glob.glob(stage + "/part-*"))
    assert len(files) >= 2
    os.makedirs(src)
    shutil.copy(files[0], src + "/a.parquet")

    def run_once():
        q = E.stream_to_parquet(
            E.stream_extract(spark, src, extractors=["labels"]), out, ckpt
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    # second half arrives; restart from the same checkpoint
    for f in files[1:]:
        shutil.copy(f, src + "/" + os.path.basename(f) + ".parquet")
    run_once()
    got = spark.read.parquet(out)
    from distributed_extraction_framework_spark.operators.extractors import extract

    want = extract(spark.read.parquet(src), extractors=["labels"])
    assert got.count() == want.count() > n1
    # no duplicates: every (subj, obj) appears exactly once per page
    assert got.distinct().count() == want.distinct().count()
