"""Similarity search over embedding columns (array<float>).

Two tiers, as a scale ladder:

* ``cosine_topk_bruteforce`` — exact: broadcast the (small) query side,
  JVM-side dot products via ``zip_with``/``aggregate``, window top-k.
  The baseline and the verifier for the approximate path.
* ``lsh_topk`` — random-hyperplane LSH: sign-bit sketches bucket the
  corpus; only same-bucket (or near-bucket) pairs get exact scoring.
  Hyperplanes are deterministic (seeded) and broadcast as literals.
* ``ivf_topk`` — IVF-style coarse quantizer: k deterministic centroids,
  assign each vector to nearest centroid (broadcast centroid join),
  search only within the probe cells.

Everything but the (optional) numpy centroid refresh is Catalyst; the dot
product is ``aggregate(zip_with(a, b, *), sum)`` inside codegen — no
Python in the scoring loop.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rank_rounded: bool = False,
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast queries × corpus scan.

    Scale shape: corpus is the big side (scanned once, partition-parallel),
    queries broadcast. O(|Q|·|C|) multiply-adds all inside codegen, and the
    ``rank <= k`` filter compiles to a PARTIAL ``WindowGroupLimit`` below
    the exchange (Catalyst's window-group-limit pushdown), so each map
    partition ships only its per-query top-k — the merge shuffle is
    O(|Q|·P·k), never the full cross product (asserted in
    tests/test_plans.py). For raw scoring throughput see
    ``cosine_topk_gemm``.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("cv")))
    )
    w = _topk_window(rank_rounded)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def cosine_topk_gemm(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Throughput kernel for exact top-k: the query block is collected to a
    row-normalized float64 matrix and broadcast; one ``mapInPandas`` scan of
    the corpus computes all cosines per Arrow batch with a single GEMM
    (np.matmul — orders of magnitude over per-row fold) and emits only the
    per-batch top-k; a window merges the ≤|Q|·k-per-batch survivors.

    Returns the same top-k SET as the codegen forms (tested); the cos
    doubles can differ in the last ulp from fold-order scoring because GEMM
    sums blockwise, so hash-gates should round or use the fold-order forms.
    """
    spark = corpus.sparkSession
    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    qm = np.array([r[vec_col] for r in qrows], dtype=np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((qids, qm))

    def score(batches):
        import pandas as pd

        ids, qmat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cm = np.array(list(pdf[vec_col]), dtype=np.float64)
            cm /= np.linalg.norm(cm, axis=1, keepdims=True)
            sims = qmat @ cm.T  # (|Q|, B)
            nids = pdf[id_col].to_numpy(dtype=np.int64)
            sims[ids[:, None] == nids[None, :]] = -np.inf  # self-pairs
            kk = min(k, sims.shape[1])
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            out_q = np.repeat(ids, kk)
            out_n = nids[top.ravel()]
            out_c = np.take_along_axis(sims, top, axis=1).ravel()
            keep = out_c > -np.inf
            yield pd.DataFrame(
                {"query_id": out_q[keep], "neighbor_id": out_n[keep],
                 "cos": out_c[keep]}
            )

    pruned = corpus.select(id_col, vec_col).mapInPandas(
        score, schema="query_id long, neighbor_id long, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _topk_window(rounded: bool):
    """Top-k ranking window. ``rounded=True`` ranks on (round(cos, 6) desc,
    neighbor_id asc) — the exact key the SQL oracles rank on — so a near-tie
    within 1e-6 at the rank-k boundary (or a fold-order ulp difference) cuts
    identically in both engines instead of making the hash gate flaky."""
    key = F.round("cos", 6) if rounded else F.col("cos")
    return Window.partitionBy("query_id").orderBy(F.desc(key), F.asc("neighbor_id"))


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def _hyperplanes_portable(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """md5-derived uniform[-1,1] hyperplanes: w(p,d) = (md5_32("s:p:d") mod
    2001 - 1000)/1000. Symmetric entries give unbiased sign sketches, and a
    SQL oracle can recompute the identical weights — which is what lets the
    driver gate hash-verify the LSH bucket assignment end to end."""
    import hashlib

    return [
        [
            (
                int(hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[:8], 16)
                % 2001
                - 1000
            )
            / 1000.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def add_lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    vec_col: str = "embedding",
    seed: int = 42,
    out_col: str = "bucket",
    portable: bool = False,
) -> DataFrame:
    """Sign-bit random-projection bucket id (deterministic hyperplanes)."""
    planes = (_hyperplanes_portable if portable else _hyperplanes)(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(F.col(vec_col), plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + (bit.cast("long") * F.lit(1 << i))
    return df.withColumn(out_col, bucket)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    portable: bool = False,
    rank_rounded: bool = False,
) -> DataFrame:
    """Approximate top-k: exact scoring restricted to pairs colliding in ANY
    of ``n_tables`` independent sign-sketch tables.

    Per table the candidate count drops ~2^n_planes-fold; multi-table
    union restores recall (1-(1-p^r)^L curve). The join key is
    (table, bucket) — a plain shuffle equi-join AQE can rebalance.
    ``portable=True`` uses md5-derived hyperplanes a SQL oracle can
    recompute (same recall curve; uniform instead of gaussian entries).
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))

    def with_keys(df: DataFrame, vec: str) -> DataFrame:
        out = df
        for t in range(n_tables):
            out = add_lsh_bucket(
                out, dim, n_planes, vec, seed + 1000 * t, f"_b{t}", portable
            )
        keys = F.array(
            *[
                F.struct(F.lit(t).alias("table"), F.col(f"_b{t}").alias("bucket"))
                for t in range(n_tables)
            ]
        )
        return out.withColumn("key", F.explode(keys)).select(
            *df.columns, "key.table", "key.bucket"
        )

    cands = (
        with_keys(q, "qv")
        .join(with_keys(c, "cv"), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.withColumn("cos", cosine(F.col("qv"), F.col("cv")))
    w = _topk_window(rank_rounded)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _assign_cells(
    df: DataFrame, vec: str, cents: list, n: int, rounded: bool = False
) -> DataFrame:
    """Append ``cell`` = the ``n`` nearest centroids per row, with ZERO
    shuffle: the centroids are broadcast as plan literals, the per-row
    (score, cell) array is sorted and sliced inside codegen — a narrow
    map-only projection (the previous window-based argmin shuffled the
    whole corpus by row key). ``rounded=True`` ranks cells on
    round(cos, 6) — the key a SQL oracle ranks on (see _topk_window)."""
    def _score(c: Column) -> Column:
        return F.round(c, 6) if rounded else c

    scored = F.array(
        *[
            F.struct(
                _score(
                    cosine(F.col(vec), F.array(*[F.lit(float(x)) for x in cvec]))
                ).alias("s"),
                F.lit(int(cell)).alias("cell"),
            )
            for cell, cvec in cents
        ]
    )
    best = F.slice(
        F.array_sort(
            scored,
            lambda x, y: F.when(x["s"] > y["s"], F.lit(-1))
            .when(x["s"] < y["s"], F.lit(1))
            .otherwise(
                F.when(x["cell"] < y["cell"], F.lit(-1)).otherwise(F.lit(1))
            ),
        ),
        1,
        n,
    )
    return df.withColumn("cell", F.explode(F.transform(best, lambda s: s["cell"])))


def kmeans_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Spherical k-means (Lloyd) coarse-quantizer training, Spark-native:
    init = first ``n_cells`` vectors (TakeOrdered — heap, not a full sort);
    each round assigns with the zero-shuffle literal projection and
    re-centers via posexplode + per-(cell, dim) partial-aggregated avg —
    the only shuffle per round carries n_cells × dim partial sums per map
    partition, never the vectors. Returns [(cell, centroid)] (bounded:
    n_cells × dim doubles — the same collect contract as a broadcast dim
    table)."""
    base = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    cents = [
        (i, list(r["v"]))
        for i, r in enumerate(base.orderBy("id").limit(n_cells).collect())
    ]
    for _ in range(iterations):
        assigned = _assign_cells(base, "v", cents, 1)
        means = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("centroid")
            )
        )
        new = {r["cell"]: list(r["centroid"]) for r in means.collect()}
        cents = [(c, new.get(c, v)) for c, v in cents]  # empty cells persist
    return cents


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iterations: int = 0,
    rank_rounded: bool = False,
    assign_rounded: bool = False,
) -> DataFrame:
    """IVF coarse search: deterministic-sample centroids, optionally
    refined by ``train_iterations`` spherical k-means rounds; corpus and
    queries assign to cells via the zero-shuffle literal projection;
    queries probe their ``n_probe`` nearest cells.

    At 100 TB the assign pass is map-only over the corpus scan; the
    per-cell search shuffles only cell-local candidates.
    """
    if train_iterations > 0:
        cents = kmeans_centroids(
            corpus, n_cells, train_iterations, id_col, vec_col
        )
    else:
        cents = [
            (i, list(r[vec_col]))
            for i, r in enumerate(
                corpus.orderBy(F.col(id_col)).limit(n_cells).collect()
            )
        ]

    c = _assign_cells(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        "cv", cents, 1, rounded=assign_rounded,
    )
    q = _assign_cells(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        "qv", cents, n_probe, rounded=assign_rounded,
    )
    scored = (
        q.join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("cv")))
    )
    w = _topk_window(rank_rounded)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def near_duplicates_by_embedding(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold (multi-table LSH).

    At cosine ≥ 0.95 the per-plane collision probability is
    1 - arccos(0.95)/π ≈ 0.90, so 8 planes × 6 tables recalls ≈ 99% of
    true near-dups while pruning the quadratic pair space.
    """
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    keyed = base
    for t in range(n_tables):
        keyed = add_lsh_bucket(keyed, dim, n_planes, "v", 42 + 1000 * t, f"_b{t}")
    keys = F.array(
        *[
            F.struct(F.lit(t).alias("table"), F.col(f"_b{t}").alias("bucket"))
            for t in range(n_tables)
        ]
    )
    b = keyed.withColumn("key", F.explode(keys)).select(
        "id", "v", "key.table", "key.bucket"
    )
    return (
        b.alias("a")
        .join(b.alias("b"), ["table", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.v").alias("va"), F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
