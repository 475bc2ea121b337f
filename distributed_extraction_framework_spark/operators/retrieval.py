"""Lexical retrieval over the documents table: TF-IDF / BM25 scoring.

A training-data pipeline needs keyword retrieval for corpus curation
(targeted subset selection, decontamination probes, quality audits) long
before any embedding index exists. This is the classic two-aggregation
dataflow, kept fully declarative so Catalyst fuses and pushes:

* :func:`tokenize` — one narrow projection: lowercase → regex token
  extraction → explode. No Python in the loop.
* :func:`term_stats` — per-(doc, term) frequencies (one groupBy) and the
  corpus document frequencies (a second groupBy over the first's
  output, i.e. map-side partial-agg friendly).
* :func:`bm25_scores` — Okapi BM25 (Robertson et al., TREC-3) for a
  query string: the per-term postings are filtered to the query's terms
  FIRST (predicate pushdown makes the big groupBy operate on a sliver of
  the corpus), then scored and summed per document. The corpus-level
  scalars (N, avgdl) join in as a broadcast 1-row aggregate — no
  ``collect`` of corpus statistics through the driver.

Scale shape: two shuffles over the tokenized corpus (doc-term, then
term), both high-cardinality keys; the query-term filter reduces the
scoring join to |query terms| postings lists; the final per-doc sum
reuses the doc key. IDF uses the +1-smoothed Robertson form
``ln(1 + (N - df + 0.5) / (df + 0.5))`` (non-negative for df → N).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"


def tokenize(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(id_col, token)`` rows — lowercased ``[a-z0-9]+`` runs, one
    narrow projection (the same contract as the DuckDB oracle's
    ``regexp_extract_all``)."""
    return docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(f"({TOKEN_RE})"), 1
            )
        ).alias("token"),
    )


def term_stats(tokens: DataFrame, id_col: str = "doc_id"):
    """(tf, df) from a token table.

    ``tf``: one row per (doc, token) with the in-doc count and the doc
    length; ``df``: one row per token with its document frequency —
    computed FROM tf (already one row per doc-token pair), so the df
    aggregation is a plain count, not a countDistinct.
    """
    tf = tokens.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    doclen = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    return tf.join(doclen, id_col), df


def bm25_scores(
    docs: DataFrame,
    query: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int | None = 4,
) -> DataFrame:
    """BM25 score per document matching ≥1 query term → ``(id_col,
    score)``.

    Duplicate query terms count once (standard bag-of-words query with
    unit weights). ``round_to`` rounds the final sum (hash-stable across
    engines); pass None for raw doubles.
    """
    q_terms = sorted(set(re.findall(TOKEN_RE, query.lower())))
    if not q_terms:
        raise ValueError(f"query has no {TOKEN_RE!r} terms: {query!r}")
    tokens = tokenize(docs, text_col, id_col)
    # filter to query terms BEFORE the heavy aggregations: tf/df shuffle
    # only the matching slice. doclen/N/avgdl need the full corpus, but
    # they're one narrow count per doc + a 1-row global.
    tf = (
        tokens.filter(F.col("token").isin(q_terms))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    doclen = tokens.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df), "token")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), (idf * tf_part).alias("term_score"))
    )
    total = scored.groupBy(id_col).agg(F.sum("term_score").alias("score"))
    if round_to is not None:
        total = total.select(
            id_col, F.round(F.col("score"), round_to).alias("score")
        )
    return total


def tfidf_vectors(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Sparse TF-IDF weights ``(id_col, token, weight)`` — ltc-style
    ``tf × ln(N / df)`` with raw tf; feed to downstream cosine scoring
    or feature hashing."""
    tf, df = term_stats(tokenize(docs, text_col, id_col), id_col)
    n_docs = tf.select(id_col).distinct().agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col), F.col("token"),
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
            .alias("weight"),
        )
    )


def tfidf_keywords(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 4,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document → ``(id_col, token, tfidf)``
    — the standard document-tagging/keyword pass.

    ``tfidf = tf · ln(N / df)`` with ``N`` = documents containing ≥1
    token (a 1-row broadcast). Ranking happens on the ROUNDED score with
    token as tie-break, so the per-document top-k is bit-stable across
    engines and partitionings. The ``row_number() <= k`` predicate gets
    Catalyst's WindowGroupLimit partial pushdown (each map task forwards
    at most k rows per document), and the window key ``id_col`` is a
    prefix of the tf groupBy key — no extra full shuffle.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    tf, df = term_stats(tokenize(docs, text_col, id_col), id_col)
    n_docs = F.broadcast(
        tf.select(F.countDistinct(id_col).alias("n_docs"))
    )
    scored = (
        tf.join(df, "token")
        .crossJoin(n_docs)
        .select(
            id_col,
            "token",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")),
                round_to,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
