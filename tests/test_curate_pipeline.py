"""Curation DAG: stage semantics, lineage ledger, resume, optional stages."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from distributed_extraction_framework_spark.plans.curate import (
    CurationConfig,
    CurationPipeline,
)


@pytest.fixture()
def corpus(spark):
    rows = []
    for i in range(40):
        # 35+ distinct tokens → passes the gopher gate below
        body = " ".join(f"tok{i}w{j}" for j in range(40))
        rows.append((i, body))
    rows.append((100, rows[0][1]))          # exact duplicate of doc 0
    rows.append((101, "too short"))         # gopher drop
    rows.append((102, "café " + rows[1][1]))  # NFD: hygiene rewrites
    rows.append((103, "mail a@b.co " + rows[2][1]))  # PII: hygiene scrubs
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_curation_pipeline_stages_and_resume(spark, corpus, tmp_path):
    cfg = CurationConfig(
        warehouse=str(tmp_path / "wh"),
        gopher=dict(min_tokens=5, min_distinct_ratio=0.3,
                    max_top_bigram_frac=0.5),
    )
    out = CurationPipeline(spark, cfg).run(corpus)

    hyg = {r["doc_id"]: r for r in out["docs_hygiene"].collect()}
    assert len(hyg) == 44
    assert hyg[102]["was_changed"] is True          # NFD composed
    assert "café" in hyg[102]["text"]
    assert hyg[103]["text"].startswith("mail <EMAIL>")  # scrubbed
    assert hyg[0]["was_changed"] is False

    adm = {r["doc_id"] for r in out["docs_admitted"].collect()}
    assert 101 not in adm and 0 in adm and 100 in adm

    uniq = {r["doc_id"] for r in out["docs_unique"].collect()}
    assert 0 in uniq and 100 not in uniq            # min-id survivor

    # second run with the same warehouse resumes every stage
    p2 = CurationPipeline(spark, cfg)
    out2 = p2.run(corpus)
    assert p2._fresh == set()
    assert out2["docs_unique"].count() == len(uniq)
    lin = spark.read.parquet(cfg.warehouse + "/lineage")
    assert lin.select("run_id").distinct().count() == 1


def test_curation_pipeline_optional_stages(spark, corpus, tmp_path):
    cfg = CurationConfig(
        warehouse=str(tmp_path / "wh2"),
        gopher=None,                 # admission disabled
        fuzzy=True,
        pack_seq_len=64,
    )
    out = CurationPipeline(spark, cfg).run(corpus)
    assert "docs_admitted" not in out
    # near-dup clusters collapse to one survivor; packing emits bins
    assert out["docs_neardup_free"].count() <= out["docs_unique"].count()
    packed = out["docs_packed"]
    assert packed.count() > 0
    assert {"bucket", "bin_id"} <= set(packed.columns)
    # resumable: stage directories committed
    import os

    assert os.path.exists(cfg.warehouse + "/docs_packed/_SUCCESS")


def test_curation_resume_rebuilds_on_config_change(spark, corpus, tmp_path):
    """Resume is keyed on (input, CONFIG): tightening a threshold against
    an existing warehouse must rebuild, never return stale snapshots."""
    wh = str(tmp_path / "wh3")
    loose = CurationConfig(warehouse=wh, gopher=dict(min_tokens=5))
    CurationPipeline(spark, loose).run(corpus)
    strict = CurationConfig(warehouse=wh, gopher=dict(min_tokens=10_000))
    p2 = CurationPipeline(spark, strict)
    out2 = p2.run(corpus)
    assert "docs_admitted" in p2._fresh          # rebuilt, not resumed
    assert out2["docs_admitted"].count() == 0    # new threshold applied


def test_crawl_to_training_corpus_end_to_end(spark, tmp_path):
    """The full webtext TRAINING path: crawl html in -> main-content
    reassembly (corpus_from_crawl) -> CurationPipeline (hygiene ->
    exact dedup -> pack) -> packed sequences out, one resumable run."""
    from pyspark.sql import functions as F

    from distributed_extraction_framework_spark.operators.structured_data import (  # noqa: E501
        corpus_from_crawl,
    )
    from distributed_extraction_framework_spark.plans.curate import (
        CurationConfig,
        CurationPipeline,
    )

    body = ("This is a long and perfectly reasonable paragraph of "
            "running text that should survive content segmentation.")
    pages = spark.createDataFrame(
        [(i,
          f"https://c/{i}",
          f"<div>{body} Variant {i % 3}.</div>"
          '<div><a href="/nav">menu menu</a></div><p>x</p>')
         for i in range(9)],
        "page_id long, url string, html string",
    )
    corpus = corpus_from_crawl(pages)
    assert corpus.count() == 9
    cfg = CurationConfig(warehouse=str(tmp_path / "wh"), scrub=False,
                         gopher=None, pack_seq_len=64)
    out = CurationPipeline(spark, cfg).run(corpus)
    # 9 pages -> 3 distinct texts after the exact-dedup stage
    assert out["docs_unique"].count() == 3
    assert "docs_packed" in out and out["docs_packed"].count() >= 1
    # resume: second run adds no lineage runs
    CurationPipeline(spark, cfg).run(corpus)
    lin = spark.read.parquet(str(tmp_path / "wh") + "/lineage")
    runs = lin.groupBy("stage").agg(
        F.countDistinct("run_id").alias("n")).collect()
    assert all(r["n"] == 1 for r in runs)
