"""Property tests for the mergeable-sketch toolbox (operators/sketches.py).

The driver gates (hll_registers … anf_ball2) already hash-verify the
sketch STATES against SQL recomputation; these tests pin the sketch
GUARANTEES — estimator accuracy, no-false-negative membership,
upper-bound counting, merge = rebuild, weighted-inclusion bias — and the
plan shapes (partial-agg exchange counts, broadcast-only probes) that
make the sketches 100 TB-safe.
"""

import math

import pytest
from pyspark.sql import functions as F

from distributed_extraction_framework_spark.operators import sketches as SK


@pytest.fixture(scope="module")
def keys10k(spark):
    return spark.range(10_000).select(
        F.concat(F.lit("key_"), F.col("id")).alias("k"),
        (F.col("id") % 7).alias("g"),
    )


# ---------------------------------------------------------------- HLL ----


def test_hll_estimate_accuracy_10k(spark, keys10k):
    regs = SK.hll_registers(keys10k, "k", p=12)
    est = SK.hll_estimate(regs, p=12).collect()[0]["est"]
    # standard error ~ 1.04/sqrt(4096) = 1.6%; allow 4 sigma
    assert abs(est - 10_000) / 10_000 < 0.065


def test_hll_small_range_linear_counting(spark):
    df = spark.range(30).select(F.col("id").cast("string").alias("k"))
    est = SK.hll_estimate(SK.hll_registers(df, "k", p=12), p=12).collect()[0]["est"]
    assert abs(est - 30) < 2  # LC is near-exact far below m


def test_hll_merge_equals_rebuild(spark, keys10k):
    a = keys10k.where(F.col("g") < 3)
    b = keys10k.where(F.col("g") >= 3)
    merged = SK.hll_merge(
        SK.hll_registers(a, "k", p=8), SK.hll_registers(b, "k", p=8)
    )
    rebuilt = SK.hll_registers(keys10k, "k", p=8)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )


def test_hll_registers_single_exchange(spark, keys10k):
    plan = SK.hll_registers(keys10k, "k", p=8)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # map-side partial agg, one shuffle
    assert "partial_max" in plan or "HashAggregate" in plan


def test_hll_grouped_bounds(spark, keys10k):
    regs = SK.hll_registers(keys10k, "k", p=6, group_cols=["g"])
    per_g = regs.groupBy("g").count().collect()
    assert all(r["count"] <= 64 for r in per_g)  # <= m rows per group


# ---------------------------------------------------------- Count-Min ----


def test_count_min_upper_bound_and_tightness(spark):
    # zipf-ish: key i appears (100 - i) times
    df = spark.range(100).select(
        F.explode(F.sequence(F.lit(1), 100 - F.col("id"))).alias("rep"),
        F.concat(F.lit("t"), F.col("id")).alias("k"),
    )
    truth = {r["k"]: r["c"] for r in df.groupBy("k").agg(F.count("*").alias("c")).collect()}
    sk = SK.count_min_sketch(df, "k", depth=4, width=512)
    keys = spark.createDataFrame([(k,) for k in truth], ["k"])
    est = {r["k"]: r["est"] for r in SK.count_min_lookup(sk, keys, "k", 4, 512).collect()}
    n = sum(truth.values())
    for k, t in truth.items():
        assert est[k] >= t  # CM never underestimates
        assert est[k] <= t + (math.e / 512) * n * 4  # way looser than w.h.p. bound


def test_count_min_weighted(spark):
    df = spark.createDataFrame([("a", 5), ("a", 7), ("b", 1)], ["k", "w"])
    sk = SK.count_min_sketch(df, "k", depth=2, width=64, weight_col="w")
    keys = spark.createDataFrame([("a",), ("b",)], ["k"])
    est = {r["k"]: r["est"] for r in SK.count_min_lookup(sk, keys, "k", 2, 64).collect()}
    assert est["a"] == 12 and est["b"] >= 1


# --------------------------------------------------------------- Bloom ----


def test_bloom_no_false_negatives_and_fp_rate(spark):
    members = spark.range(500).select(F.concat(F.lit("m"), F.col("id")).alias("k"))
    others = spark.range(500, 5_500).select(F.concat(F.lit("m"), F.col("id")).alias("k"))
    bloom = SK.bloom_build(members, "k", m_bits=1 << 14, k=3)
    assert SK.bloom_probe(members, "k", bloom, m_bits=1 << 14, k=3).count() == 500
    fp = SK.bloom_probe(others, "k", bloom, m_bits=1 << 14, k=3).count()
    # (1 - e^{-3*500/16384})^3 ~ 6.4e-4 -> expect ~3; allow generous slack
    assert fp <= 40


def test_bloom_probe_no_shuffle(spark):
    members = spark.range(100).select(F.col("id").cast("string").alias("k"))
    bloom = SK.bloom_build(members, "k", m_bits=4096, k=3)
    probe = SK.bloom_probe(
        spark.range(1000).select(F.col("id").cast("string").alias("k")),
        "k", bloom, m_bits=4096, k=3,
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # the fat side must not shuffle: the checkpointed filter leaves only
    # broadcast exchanges in the probe plan
    import re
    for m in re.finditer(r"Exchange [^\n]*", plan):
        assert "Broadcast" in m.group(0), plan


# ----------------------------------------------------------------- KMV ----


def test_kmv_estimate_accuracy(spark):
    df = spark.range(20_000).select(F.concat(F.lit("v"), F.col("id")).alias("k"))
    est = SK.kmv_estimate(SK.kmv_sketch(df, "k", k=512), k=512).collect()[0]
    assert est["n_seen"] == 512
    # relative error ~ 1/sqrt(k-2) ~ 4.4%; allow 4 sigma
    assert abs(est["est"] - 20_000) / 20_000 < 0.18


def test_kmv_exact_below_k(spark):
    df = spark.range(50).select(F.col("id").cast("string").alias("k"))
    est = SK.kmv_estimate(SK.kmv_sketch(df, "k", k=256), k=256).collect()[0]
    assert est["n_seen"] == 50 and est["est"] == 50.0


def test_kmv_jaccard_identical_and_disjoint(spark):
    a = spark.range(1000).select(F.concat(F.lit("x"), F.col("id")).alias("k"))
    b = spark.range(1000, 2000).select(F.concat(F.lit("x"), F.col("id")).alias("k"))
    sa, sb = SK.kmv_sketch(a, "k", k=128), SK.kmv_sketch(b, "k", k=128)
    same = SK.kmv_jaccard(sa, sa, k=128).collect()[0]
    assert same["jaccard_est"] == 1.0
    disj = SK.kmv_jaccard(sa, sb, k=128).collect()[0]
    assert disj["jaccard_est"] == 0.0


def test_kmv_jaccard_half_overlap(spark):
    a = spark.range(0, 2000).select(F.concat(F.lit("x"), F.col("id")).alias("k"))
    b = spark.range(1000, 3000).select(F.concat(F.lit("x"), F.col("id")).alias("k"))
    j = SK.kmv_jaccard(
        SK.kmv_sketch(a, "k", k=256), SK.kmv_sketch(b, "k", k=256), k=256
    ).collect()[0]["jaccard_est"]
    assert abs(j - 1 / 3) < 0.12  # true J = 1000/3000


# -------------------------------------------------------- weighted A-ES ----


def test_weighted_sample_bias(spark):
    # two strata: weight 100 vs weight 1, equal counts; the heavy
    # stratum must dominate a 100-row sample
    df = spark.range(2000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 1000, 100.0).otherwise(1.0).alias("w"),
    )
    got = SK.weighted_sample(df, "k", "w", 100).collect()
    heavy = sum(1 for r in got if r["k"] < 1000)
    assert len(got) == 100 and heavy >= 85


def test_weighted_sample_deterministic_and_zero_weight(spark):
    df = spark.range(100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, 1.0).otherwise(0.0).alias("w"),
    )
    s1 = sorted(r["k"] for r in SK.weighted_sample(df, "k", "w", 20).collect())
    s2 = sorted(
        r["k"] for r in SK.weighted_sample(df.repartition(7), "k", "w", 20).collect()
    )
    assert s1 == s2  # partitioning-independent
    assert all(k % 2 == 0 for k in s1)  # zero-weight rows never sample


# ----------------------------------------------------------------- ANF ----


def test_anf_registers_match_exact_ball(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "e"), ("e", "f"), ("x", "y")],
        ["src", "dst"],
    )
    got = sorted(map(tuple, SK.anf_registers(edges, rounds=2, p=4).collect()))
    balls = {  # exact 2-hop out-balls (self included)
        "a": {"a", "b", "e", "c", "f"}, "b": {"b", "c", "d"},
        "c": {"c", "d"}, "d": {"d"}, "e": {"e", "f"}, "f": {"f"},
        "x": {"x", "y"}, "y": {"y"},
    }
    rows = []
    for node, members in balls.items():
        mdf = spark.createDataFrame([(m,) for m in members], ["node"])
        rows += [
            (node, r["register"], r["rho"])
            for r in SK.hll_registers(mdf, "node", p=4).collect()
        ]
    assert got == sorted(rows)


def test_anf_rounds_zero_is_self(spark):
    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    regs = SK.anf_registers(edges, rounds=0, p=4)
    assert regs.groupBy("node").count().agg(F.max("count")).collect()[0][0] == 1


# ------------------------------------------------- histogram quantiles ----


def test_histogram_quantiles_accuracy(spark):
    df = spark.range(10_000).select((F.col("id") * 1.0).alias("v"))
    got = {r["q"]: r["value"] for r in SK.histogram_quantiles(
        df, "v", qs=[0.25, 0.5, 0.9], bins=1000).collect()}
    # error bound: range/bins = 9999/1000 ~ 10
    for q, v in got.items():
        assert abs(v - q * 9999) <= 9999 / 1000 + 1e-6


def test_histogram_quantiles_constant_and_errors(spark):
    df = spark.range(10).select(F.lit(7.5).alias("v"))
    got = SK.histogram_quantiles(df, "v", qs=[0.5], bins=16).collect()
    assert got[0]["value"] == 7.5
    with pytest.raises(ValueError):
        SK.histogram_quantiles(df, "v", qs=[0.0])
    with pytest.raises(ValueError):
        SK.histogram_quantiles(df.where("v > 100"), "v", qs=[0.5])


# ------------------------------------ neighborhood fn / eff. diameter ----


def test_neighborhood_function_monotone_and_saturates(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], ["src", "dst"]
    )
    nf = {r["t"]: r["nf"] for r in SK.neighborhood_function(edges, 5, p=6).collect()}
    assert all(nf[t] <= nf[t + 1] + 1e-9 for t in range(5))
    assert nf[4] == nf[5]  # path diameter 4: saturated


def test_effective_diameter_interpolation():
    nf = [(0, 10.0), (1, 40.0), (2, 100.0), (3, 100.0)]
    d = SK.effective_diameter(nf, fraction=0.9)
    assert 1.0 < d < 2.0  # target 90 lands inside the (1, 2] step
    assert SK.effective_diameter(nf, fraction=0.1) == 0.0


# ------------------------------------------------------- streaming HLL ----


def test_stream_hll_matches_batch(spark, tmp_path):
    from distributed_extraction_framework_spark.streaming import events as STR

    df = spark.range(2_000).select(
        F.col("id").alias("event_id"),
        F.current_timestamp().alias("ts"),
        (F.col("id") % 137).alias("user_id"),
        F.concat(F.lit("t"), F.col("id") % 3).alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    d = str(tmp_path / "ev")
    df.repartition(5).write.parquet(d)
    stream = STR.read_event_stream(spark, d)
    regs = STR.stream_hll_registers(stream, "user_id", p=6, group_cols=["event_type"])
    STR.run_to_memory(regs, "t_stream_hll", output_mode="complete")
    got = sorted(map(tuple, spark.table("t_stream_hll").collect()))
    batch = sorted(map(tuple, SK.hll_registers(
        spark.read.parquet(d), "user_id", p=6, group_cols=["event_type"]).collect()))
    assert got == batch


# -------------------------------------------------------------- Z-order ----


def test_zorder_key_known_values(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)], ["x", "y"])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", SK.zorder_key([F.col("x"), F.col("y")], bits=4).alias("z")
        ).collect()
    }
    # interleave: x lanes at even bits, y lanes at odd bits
    assert got[(0, 0)] == 0 and got[(1, 0)] == 1 and got[(0, 1)] == 2
    # x=3 (0b011), y=5 (0b101) -> bits: x0=1,y0=1,x1=1,y1=0,x2=0,y2=1
    assert got[(3, 5)] == 0b100111


def test_cluster_by_zorder_bounds_both_dims(spark):
    # 64x64 grid; 16 range partitions of the Morton key = 16x16 tiles,
    # so BOTH dims stay narrow per partition; a linear x-sort leaves the
    # full y range (63) in every partition.
    grid = spark.range(4096).select(
        (F.col("id") % 64).alias("x"), F.floor(F.col("id") / 64).alias("y")
    )
    clustered = SK.cluster_by_zorder(grid, ["x", "y"], bits=6, partitions=16)
    spans = (
        clustered.groupBy(F.spark_partition_id().alias("pid"))
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    assert len(spans) == 16
    assert all(r["sx"] <= 31 and r["sy"] <= 31 for r in spans)


def test_zorder_validation():
    with pytest.raises(ValueError):
        SK.zorder_key([], bits=4)
    with pytest.raises(ValueError):
        SK.zorder_key([F.lit(1), F.lit(2)], bits=32)  # 64 > 62


def test_windowed_hll_stream_matches_batch(spark, tmp_path):
    from distributed_extraction_framework_spark.streaming import events as STR

    df = spark.range(3_000).select(
        F.col("id").alias("event_id"),
        (F.lit("2024-03-01 00:00:00").cast("timestamp")
         + F.make_interval(mins=(F.col("id") % 300).cast("int"))).alias("ts"),
        (F.col("id") % 97).alias("user_id"),
        F.concat(F.lit("t"), F.col("id") % 2).alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    d = str(tmp_path / "ev")
    df.repartition(6).write.parquet(d)
    stream = STR.read_event_stream(spark, d)
    regs = STR.windowed_hll_registers(
        stream, "ts", "user_id", window="1 hour", p=6,
        group_cols=["event_type"], watermark="2 hours",
    )
    STR.run_to_memory(regs, "t_win_hll", output_mode="complete")
    got = sorted(map(tuple, spark.table("t_win_hll").collect()))
    batch = sorted(map(tuple, STR.windowed_hll_registers(
        spark.read.parquet(d), "ts", "user_id", window="1 hour", p=6,
        group_cols=["event_type"]).collect()))
    assert got == batch and len(got) > 0


def test_count_min_join_size(spark):
    # a: key i of 100 appears i+1 times; b: every key once ->
    # true join size = sum(i+1) = 5050
    a = spark.range(100).select(
        F.explode(F.sequence(F.lit(0), F.col("id"))).alias("rep"),
        F.concat(F.lit("k"), F.col("id")).alias("k"),
    )
    b = spark.range(100).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    ska = SK.count_min_sketch(a, "k", depth=4, width=1024)
    skb = SK.count_min_sketch(b, "k", depth=4, width=1024)
    est = SK.count_min_join_size(ska, skb, depth=4).collect()[0]["est"]
    assert est >= 5050  # inner product never underestimates
    assert est <= 5050 + (5050 * 100) // 1024  # loose eps*Na*Nb slack


def test_count_min_join_size_disjoint_is_zero(spark):
    """Sparse sketch cells: a row with no overlapping cells has dot 0
    and the min must see it — disjoint key sets estimate 0, not NULL
    (code-review r5 #6)."""
    a = spark.range(50).select(F.concat(F.lit("a"), F.col("id")).alias("k"))
    b = spark.range(50).select(F.concat(F.lit("b"), F.col("id")).alias("k"))
    ska = SK.count_min_sketch(a, "k", depth=4, width=1 << 20)
    skb = SK.count_min_sketch(b, "k", depth=4, width=1 << 20)
    est = SK.count_min_join_size(ska, skb, depth=4).collect()[0]["est"]
    # width >> n^2 makes cross-key collisions vanishingly unlikely, so
    # at least one of the 4 rows has an exact-zero dot product
    assert est == 0
