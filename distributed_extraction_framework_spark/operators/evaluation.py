"""Ranking-metric evaluation for KG link prediction (and any scored
retrieval): MRR and Hits@k over a scored candidate table.

Closes the loop that :func:`operators.sampling.negative_samples` opens —
after a model scores (query, candidate) pairs under the filtered-setting
protocol (Bordes et al. 2013, public), this computes the standard
evaluation table without ever materializing a per-query sort.

Scale shape: the naive formulation windows ``rank() OVER (PARTITION BY
query ORDER BY score DESC)`` and keeps one row — a full sort of every
candidate list just to find one element's position. Here rank is a
COUNT, not a sort position: join each query's single true row back and
count strictly-better candidates (deterministic total order: higher
score wins, ties to the lexicographically smaller candidate — engine-
and parallelism-invariant). One vocabulary-of-queries-sized equi-join +
one groupBy; both shuffle on the query key, no window, no sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def linkpred_ranks(
    scored: DataFrame,
    query_col: str = "query",
    cand_col: str = "cand",
    score_col: str = "score",
    label_col: str = "is_true",
) -> DataFrame:
    """Per-query rank of the true candidate → ``(query, rank)``.

    Expects EXACTLY ONE true row per query (the link-prediction
    protocol); queries with zero true rows drop out, queries with
    several would get the rank of their best-ranked true row counted
    against all true siblings — callers wanting multi-label metrics
    should explode to one query per true row first.

    rank = 1 + #{candidates beating the true one}, where "beats" is
    (score >, or score == and cand-string <) — a deterministic total
    order, so ranks are identical at any parallelism.
    """
    q, c, s = F.col(query_col), F.col(cand_col), F.col(score_col)
    truth = (
        scored.filter(F.col(label_col))
        .groupBy(q.alias("__q"))
        .agg(
            F.max(
                F.struct(s.alias("s"), c.cast("string").alias("c"))
            ).alias("__t")
        )
        .select("__q", F.col("__t.s").alias("__ts"),
                F.col("__t.c").alias("__tc"))
    )
    beats = (s > F.col("__ts")) | (
        (s == F.col("__ts")) & (c.cast("string") < F.col("__tc"))
    )
    return (
        scored.join(truth, q == F.col("__q"))
        .groupBy(q.alias(query_col))
        .agg(
            (F.lit(1) + F.sum(beats.cast("long"))).alias("rank")
        )
    )


def ranking_metrics(
    scored: DataFrame,
    ks: tuple[int, ...] = (1, 3, 10),
    query_col: str = "query",
    cand_col: str = "cand",
    score_col: str = "score",
    label_col: str = "is_true",
) -> DataFrame:
    """One-row evaluation summary → ``(n_queries, mrr, hits_1, hits_3,
    hits_10, …)`` (one ``hits_k`` column per requested k, 6 dp).
    MRR = mean(1/rank); Hits@k = fraction of queries with rank ≤ k."""
    ranks = linkpred_ranks(scored, query_col, cand_col, score_col,
                           label_col)
    aggs = [
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg(F.lit(1.0) / F.col("rank")), 6).alias("mrr"),
    ]
    for k in ks:
        aggs.append(
            F.round(
                F.avg((F.col("rank") <= k).cast("double")), 6
            ).alias(f"hits_{k}")
        )
    return ranks.agg(*aggs)
