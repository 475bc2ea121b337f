"""Deterministic, portable sampling and dataset splits.

Training-data pipelines need samples and train/val/test splits that are
(a) reproducible run-to-run, (b) stable under repartitioning and engine
changes, and (c) assignable from the row KEY alone so late-arriving rows
of the same entity land in the same split. Spark's ``df.sample`` /
``randomSplit`` are none of these (partition-RNG based); the standard
fix is a salted cryptographic hash bucket on the key — the same
``md5`` first-8-hex-chars integer this repo already uses for page ids
(operators/extractors.prepare_pages), so every function here is exactly
reproducible in the DuckDB oracle and in any engine with md5.

All pure Catalyst expressions: a sample/split is a FILTER, pushed into
the scan — sampling 1% of 100 TB reads the column needed for the key
plus whatever survives projection pruning, and never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^32 buckets: the md5-prefix integer space
_BUCKETS = float(1 << 32)


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform [0, 1) double from md5(salt ‖ key) — the first 8 hex chars
    as a 32-bit integer over 2^32. Portable: DuckDB spells it
    ``cast('0x' || substr(md5(salt || key), 1, 8) as bigint) / 2^32``."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    return h / F.lit(_BUCKETS)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep rows whose hash bucket falls below ``fraction``.

    Key-stable: the same key is in or out regardless of partitioning,
    row order, engine, or run; different ``salt`` values draw
    independent samples. A plain filter — no shuffle, no RNG state.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1]: {fraction}")
    return df.filter(hash_bucket(F.col(key_col), salt) < fraction)


def split_column(
    key: Column, weights: dict[str, float], salt: str = ""
) -> Column:
    """Label column assigning each key to one split by cumulative weight
    intervals over the hash bucket (insertion order of ``weights``)."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = hash_bucket(key, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < acc
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Add a deterministic split label (default 80/10/10
    train/val/test). Same key → same split, forever and on any engine —
    the leakage-safety property ``randomSplit`` cannot give you."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn(
        out_col, split_column(F.col(key_col), weights, salt)
    )


def per_key_cap(
    df: DataFrame, key_col: str, n: int, id_col: str, salt: str = ""
) -> DataFrame:
    """Keep at most ``n`` rows per ``key_col``, chosen deterministically:
    the ``n`` rows whose ``md5(salt ‖ id)`` sorts lowest (a per-key
    uniform sample, stable across runs/engines/partitionings).

    The standard per-domain cap of web-corpus curation (no host may
    dominate the training mix). The ``row_number() <= n`` predicate is
    rank-limit-pushed below the exchange by Catalyst (WindowGroupLimit,
    plan-asserted in tests) — each map task forwards at most ``n`` rows
    per key it sees, so the shuffle carries O(tasks · n) rows per key
    instead of the key's full population; a 100M-page domain capped at
    10k ships 10k rows per upstream task, not 100M.
    """
    if n < 1:
        raise ValueError(f"cap must be >= 1: {n}")
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(key_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def dense_index(df: DataFrame, col: str, partitions: int = 64) -> DataFrame:
    """Contiguous 0-based index over the distinct values of ``col``,
    ordered lexicographically → ``(col, idx)``.

    Equivalent to ``row_number() OVER (ORDER BY col) - 1`` but WITHOUT
    the global single-reducer window: range-repartition by the value,
    number rows inside each range partition (the window key is the
    partition id, so the P reducers run in parallel), and add per-
    partition prefix-sum offsets (a P-row driver payload). Result is
    bit-identical to the global window because range partitions tile
    the value order.

    The pid↔content assignment is PINNED with an eager
    ``localCheckpoint`` before anything is collected: RangePartitioner
    samples its boundaries with a per-RDD seed, so re-executing the
    un-materialized plan in a second job (the counts collect vs the
    windowed consumer) can land rows in different partitions and break
    the prefix sums. Checkpointing once makes both jobs read the same
    physical partitions.
    """
    from pyspark.sql import Window

    vals = df.select(F.col(col)).distinct().repartitionByRange(partitions, col)
    with_pid = vals.withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint(eager=True)
    counts = {
        r["__pid"]: r["cnt"]
        for r in with_pid.groupBy("__pid").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_col = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )[F.col("__pid")]
    w = Window.partitionBy("__pid").orderBy(col)
    return (
        with_pid.withColumn(
            "idx", (F.row_number().over(w) - 1 + off_col).cast("long")
        )
        .drop("__pid")
    )


def negative_samples(
    triples: DataFrame,
    k: int = 2,
    salt: str = "",
    s_col: str = "src",
    o_col: str = "dst",
    index_partitions: int = 64,
) -> DataFrame:
    """Deterministic corrupted-tail negatives for KG-embedding training
    (the TransE/"filtered setting" protocol) → ``(src, dst, neg_i,
    neg_dst)``: for each positive edge and draw ``i < k``, replace the
    tail with the entity whose dense index is
    ``md5(salt ‖ src|dst|i) mod n_entities``, then drop draws that
    collide with a true edge (the filtered setting).

    Everything is key-determined (same negatives on any engine/cluster/
    run — md5 arithmetic identical to the DuckDB oracle). Scale shape:
    the entity vocabulary gets a :func:`dense_index` (parallel, no
    global window); negatives materialize via one equi-join index →
    entity and one left-anti join against the positive edge set; the
    k-way fan-out is a ``sequence``+``explode``, no Python.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    # distinct edge set materialized ONCE (lazy): three consumers below
    # (entity vocabulary, the drawn fan-out, the filtered-setting
    # positive set) would each re-run the upstream plan — a whole
    # extraction pass when the triples come straight from extract()
    edges = (
        triples.select(s_col, o_col).distinct().localCheckpoint(eager=False)
    )
    ents = dense_index(
        edges.select(F.col(s_col).alias("u"))
        .union(edges.select(F.col(o_col).alias("u")))
        .distinct(),
        "u",
        partitions=index_partitions,
    )
    n_ents = ents.count()
    parts = [F.col(s_col), F.col(o_col), F.col("neg_i").cast("string")]
    if salt:
        parts.insert(0, F.lit(salt))
    draw_hash = F.conv(
        F.substring(F.md5(F.concat_ws("|", *parts)), 1, 8), 16, 10
    ).cast("long")
    drawn = (
        edges
        .withColumn(
            "neg_i",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"), F.lit(k - 1).cast("long")
                )
            ),
        )
        .withColumn("__ni", draw_hash % F.lit(n_ents))
    )
    with_neg = (
        drawn.join(ents, drawn["__ni"] == ents["idx"])
        .select(s_col, o_col, "neg_i", F.col("u").alias("neg_dst"))
    )
    pos = edges.select(
        F.col(s_col).alias("__ps"), F.col(o_col).alias("__po")
    )
    return with_neg.join(
        pos,
        (F.col(s_col) == F.col("__ps")) & (F.col("neg_dst") == F.col("__po")),
        "left_anti",
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float],
    key_col: str,
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-group deterministic sampling — the training-mixture step
    ("webtext 0.8, wiki 1.0, code 0.5"): keep a row iff its hash bucket
    falls below its group's fraction. Groups absent from ``fractions``
    get ``default_fraction`` (0 = drop).

    One Catalyst filter (the fraction map folds to a CASE expression) —
    pushed into the scan, no shuffle, key-stable like
    :func:`deterministic_sample`.
    """
    for g, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {g!r} must be in [0, 1]: {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(
            f"default_fraction must be in [0, 1]: {default_fraction}"
        )
    frac = F.lit(float(default_fraction))
    expr = None
    for g, f in sorted(fractions.items()):
        cond = F.col(group_col) == g
        expr = (
            F.when(cond, F.lit(float(f)))
            if expr is None
            else expr.when(cond, F.lit(float(f)))
        )
    frac = frac if expr is None else expr.otherwise(frac)
    return df.filter(hash_bucket(F.col(key_col), salt) < frac)


def pack_documents(
    docs: DataFrame,
    capacity: int,
    key_col: str = "doc_id",
    size_col: str = "n_tokens",
    buckets: int = 1024,
    salt: str = "",
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pretraining
    batcher): lay documents end to end and cut every ``capacity``
    tokens → ``(key, bucket, bin_id, offset)`` where ``offset`` is the
    document's start position inside its bin.

    A single global concatenation order would be one reducer; instead
    documents are first hash-assigned to ``buckets`` streams (key-
    deterministic md5 bucket, same arithmetic as
    :func:`deterministic_sample`), and the running-sum window runs PER
    BUCKET — 1024 independent reducers, each seeing corpus/1024 rows.
    Within a bucket the order is (md5(key), key): stable, engine-
    independent, and oracle-reproducible. Bins are
    ``floor(preceding_tokens / capacity)`` — documents straddling a cut
    belong to the bin their first token lands in (the consumer splits
    them, as concat-packing always does).
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1: {capacity}")
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    bucket = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(buckets)
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col("__h").asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    preceding = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return (
        docs.select(
            key_col,
            size_col,
            bucket.alias("bucket"),
            h.alias("__h"),
        )
        .withColumn("__pre", preceding)
        .select(
            key_col,
            "bucket",
            F.floor(F.col("__pre") / capacity).alias("bin_id"),
            (F.col("__pre") % capacity).alias("offset"),
        )
    )
