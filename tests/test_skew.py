"""Skew-adversarial guard proofs (VERDICT r4 #4; north_rule: "skew
handled explicitly").

The benign synthetic corpus never stresses the skew guards, so every one
of them could silently rot. This suite runs them against a corpus that is
adversarial BY CONSTRUCTION (sources/synth.py zipf fixtures):

* one head surface mentioned by every page with ~10^2 candidate entities
  → the salted (surface, salt) linking join must spread the hot key's
  join output over every reducer (unsalted: ONE reducer owns 100% of it)
  AND preserve results exactly;
* one stop-phrase shared by EVERY document → the ngram_jaccard df-cap
  must keep the self-join key mass bounded (the hot gram alone would
  contribute |corpus|² candidate rows);
* one near-identical cluster → every LSH band hashes the whole cluster
  into ONE bucket; AQE's skew-join split must engage on that join;
* one hub page with 10^5 distinct links → the fused extractor's per-page
  array ops must absorb a row ~10^3× the median (row-local work — there
  is no shuffle key to salt; the guard is that nothing buffers the whole
  corpus per task).

All assertions are on plans / row distributions / exact results — never
wall-time: this host's noisy-neighbor swings (3-4× between phases) would
make timing assertions flaky, and reducer row ownership is the quantity
that BECOMES wall-time at 1000 executors.
"""

from __future__ import annotations

from contextlib import contextmanager

import pyspark.sql.functions as F
import pytest

from distributed_extraction_framework_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from distributed_extraction_framework_spark.operators.extractors import extract
from distributed_extraction_framework_spark.operators.linking import score_candidates
from distributed_extraction_framework_spark.schema import PAGES_SCHEMA
from distributed_extraction_framework_spark.sources.synth import (
    ZIPF_STOP,
    hub_page,
    local_pages,
    synth_zipf_docs,
)


@contextmanager
def _confs(spark, **kv):
    """Set runtime confs, restore on exit (keys use __ for dots)."""
    keys = {k.replace("__", "."): v for k, v in kv.items()}
    old = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k, v in keys.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# the head surface is derived from the row id (id-dependent expression,
# never a foldable literal — a literal join key lets Catalyst constant-
# propagate the equi-join away, which a real dictionary column can't)
def _head():
    return F.when(F.col("id") >= 0, F.lit("zipf head")).otherwise(F.lit("-"))


def _head_mentions(spark, n_pages: int, n_parts: int = 8):
    return spark.range(n_pages, numPartitions=n_parts).select(
        F.concat(F.lit("https://p/"), F.col("id")).alias("page"),
        # 1% tail surfaces, 99% the zipf head — the adversarial shape
        F.when(F.col("id") % 100 == 1, F.concat(F.lit("tail "), F.col("id")))
        .otherwise(_head())
        .alias("surface"),
        F.lit(2).cast("long").alias("n_mentions"),
    )


def _head_candidates(spark, n_cand: int):
    return spark.range(n_cand).select(
        _head().alias("surface"),
        F.concat(F.lit("E"), F.col("id")).alias("entity"),
        (F.lit(1.0) / n_cand).alias("prior"),
    )


# --------------------------------------------------------------------------
# guard 1: salted linking join
# --------------------------------------------------------------------------

def test_salted_join_spreads_head_surface_over_reducers(spark):
    """ONE surface key owning the whole shuffle: unsalted, 100% of the
    |mentions|×|candidates| join output flows through ONE reducer task —
    at cluster scale that single straggler IS the job's wall-clock.
    Salted over R buckets the head key's load spreads across every
    reducer. Asserted on the per-reducer row distribution measured with
    spark_partition_id() directly on the join output (deterministic —
    this host's 3-4× noisy-neighbor swings make wall-time comparisons at
    test scale meaningless, and on a 4-core local JVM the 1M-row reduce
    stage is bandwidth-bound anyway; reducer row ownership is the
    quantity that becomes wall-time at 1000 executors)."""
    R = 32
    n_pages, n_cand = 20_000, 50  # 1M join-output rows, ONE key

    with _confs(
        spark,
        spark__sql__autoBroadcastJoinThreshold="-1",
        spark__sql__adaptive__autoBroadcastJoinThreshold="-1",
        spark__sql__adaptive__skewJoin__enabled="false",  # isolate the explicit guard
        spark__sql__adaptive__coalescePartitions__enabled="false",
    ):
        m = _head_mentions(spark, n_pages)
        c = _head_candidates(spark, n_cand)
        m_salt = m.withColumn(
            "salt", F.pmod(F.xxhash64("page"), F.lit(R)).cast("int")
        )
        c_salt = c.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(R - 1)))
        )

        def reducer_loads(j):
            rows = (
                j.select(F.spark_partition_id().alias("pid"))
                .groupBy("pid")
                .count()
                .collect()
            )
            return sorted(r["count"] for r in rows)

        unsalted = reducer_loads(m.join(c, ["surface"]))
        salted = reducer_loads(m_salt.join(c_salt, ["surface", "salt"]))

    total = (n_pages - n_pages // 100) * n_cand  # head mentions × candidates
    assert unsalted == [total], "unsalted: ONE reducer owns the whole join"
    assert sum(salted) == total
    n_red = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert len(salted) >= n_red - 1, "salting must engage (almost) every reducer"
    # worst reducer owns ≤ ~2× the fair share instead of 100%
    assert max(salted) <= 2.5 * total / n_red, f"salted loads: {salted}"


def test_score_candidates_salted_plan_and_parity(spark):
    """The REAL operator: its salted plan joins on (surface, salt), and
    salting changes the physical distribution only — results are
    bit-identical to the broadcast (unsalted) path."""
    m = _head_mentions(spark, 300, n_parts=2)
    c = _head_candidates(spark, 20)

    salted = score_candidates(m, c, salt_buckets=8)
    plan = salted._jdf.queryExecution().optimizedPlan().toString()
    assert "salt" in plan, "salted path must join on the salt key"

    broadcast = score_candidates(m, c, salt_buckets=1)
    key = lambda r: (r["page"], r["surface"], r["entity"])  # noqa: E731
    assert sorted(map(key, salted.collect())) == sorted(
        map(key, broadcast.collect())
    )


# --------------------------------------------------------------------------
# guard 2: df-cap bounds ngram_jaccard
# --------------------------------------------------------------------------

def test_df_cap_bounds_ngram_jaccard(spark):
    """Every doc shares the stop-phrase; its grams have df = |corpus|, so
    UNCAPPED the self-join would produce ≥ |corpus|² candidate rows per
    hot gram. With max_df the hot grams never reach the join, and the 10
    genuine twin pairs (pair-private grams, df=2) are still found."""
    n, n_twins, cap = 3000, 10, 50
    docs = synth_zipf_docs(spark, n, cluster_size=0, n_twins=n_twins).cache()

    res = ngram_jaccard_pairs(docs, n=3, threshold=0.5, max_df=cap)
    pairs = sorted((r["id_a"], r["id_b"]) for r in res.collect())
    expect = sorted(
        (f"d{n - 2 * n_twins + 2 * k:06d}", f"d{n - 2 * n_twins + 2 * k + 1:06d}")
        for k in range(n_twins)
    )
    assert pairs == expect, "df-cap must not lose the genuine twin pairs"

    # quantitative bound: candidate-row mass = Σ df² per gram that reaches
    # the self-join. The cap turns an Ω(|corpus|²)-per-hot-gram join into
    # a corpus-linear one.
    words = F.split(F.trim(F.col("text")), r"\s+")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(words) - 3, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, 3)),
        )
    )
    dfreq = (
        docs.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("df"))
    )
    mass = dfreq.agg(
        F.sum(F.col("df") * F.col("df")).alias("uncapped"),
        F.sum(
            F.when(F.col("df") <= cap, F.col("df") * F.col("df")).otherwise(0)
        ).alias("capped"),
    ).collect()[0]
    assert mass["uncapped"] > 50_000_000  # hot grams: ≥8 grams × 3000²
    assert mass["capped"] < 1_000_000  # bounded: ~n·grams_per_doc
    # the stop-phrase grams are exactly the ones the cap removes
    hot = dfreq.filter(F.col("df") > cap).select("gram").collect()
    assert hot and all(
        g["gram"] in ZIPF_STOP or " ".join(g["gram"].split()[:2]) in ZIPF_STOP
        for g in hot
    )
    docs.unpersist()


# --------------------------------------------------------------------------
# guard 3: AQE splits the LSH hot bucket
# --------------------------------------------------------------------------

def test_aqe_splits_lsh_hot_bucket(spark):
    """A 500-doc near-identical cluster lands in the SAME bucket in every
    band — 16 hot join keys whose join output is |cluster|² per band. With
    AQE skew-join on, the executed plan must show the skew-split reader
    (SortMergeJoin(skew=true) / AQEShuffleRead skewed), and the pairs must
    still come out exact.

    Threshold scaling: skew detection reads COMPRESSED map-output bytes,
    and identical signatures compress ~100×, so at toy scale the hot
    partitions are KBs (production: a 10^4-doc hot bucket is GBs against
    the 256 MB default threshold — detection needs no tuning there). The
    thresholds here scale that detection to the fixture, they don't force
    the split: with 16 hot keys over 32 reducers the median partition is
    near-empty and the hot ones exceed factor×median honestly."""
    cluster, n = 500, 520
    docs = synth_zipf_docs(spark, n, cluster_size=cluster, n_twins=0).cache()
    docs.count()

    with _confs(
        spark,
        spark__sql__shuffle__partitions="32",
        spark__sql__autoBroadcastJoinThreshold="-1",
        spark__sql__adaptive__autoBroadcastJoinThreshold="-1",
        spark__sql__adaptive__skewJoin__enabled="true",
        spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes="2k",
        spark__sql__adaptive__skewJoin__skewedPartitionFactor="2",
        spark__sql__adaptive__advisoryPartitionSizeInBytes="1k",
        spark__sql__adaptive__coalescePartitions__enabled="false",
    ):
        pairs = minhash_lsh_pairs(
            docs, num_hashes=64, bands=16, threshold=0.8
        )
        rows = pairs.collect()
        plan = pairs._jdf.queryExecution().executedPlan().toString()

    assert "skew=true" in plan or "skewed" in plan.lower(), (
        "AQE must split the hot LSH bucket:\n" + plan[:2000]
    )
    # all pairs are within the cluster, and the cluster is (near-)fully found
    in_cluster = lambda d: int(d[1:]) < cluster  # noqa: E731
    assert rows and all(in_cluster(r["id_a"]) and in_cluster(r["id_b"]) for r in rows)
    assert len(rows) > 0.9 * (cluster * (cluster - 1) / 2)
    docs.unpersist()


# --------------------------------------------------------------------------
# guard 4: heavy-row extraction (hub page)
# --------------------------------------------------------------------------

def test_hub_page_extraction_absorbs_heavy_row(spark):
    """One page with 10^5 distinct links among 50 median pages: the fused
    per-page array pipeline (split → filter → transform → array_distinct →
    explode) is row-local, so the heavy row costs O(its own size) and
    cannot OOM a task by cross-row buffering."""
    n_links = 100_000
    rows = [hub_page(n_links)] + local_pages(50)
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    quads = extract(pages, extractors=["page_links"])
    hub_links = quads.filter(F.col("subj").contains("Hub_Article")).count()
    assert hub_links == n_links
