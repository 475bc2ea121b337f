"""Corpus curation: benchmark decontamination + repetition diagnostics.

Two standard pre-training hygiene passes, both pure Catalyst (no Python
in the hot path):

* :func:`ngram_collisions` — n-gram overlap between the training corpus
  and a benchmark/eval set ("decontamination": the GPT-3 appendix-C /
  PaLM method — flag a training document if any word n-gram also occurs
  in an eval document). The eval side is tiny by construction, so its
  distinct shingles broadcast and the whole pass is ONE corpus scan +
  a broadcast semi-ish join; per-doc collision counts reuse the doc key.
* :func:`repetition_stats` — per-document repetition diagnostics in the
  style of the Gopher quality rules (Rae et al. 2021 §A1.1): distinct
  token ratio, most-frequent-token fraction, most-frequent-bigram
  fraction. Excessively repetitious documents are generation-loop junk.

Shingling itself is an array expression (``transform`` over a
``sequence`` of offsets on the tokenized array) — stays in whole-stage
codegen, no explode until the shingles are needed as rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .retrieval import TOKEN_RE


def _token_array(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(f"({TOKEN_RE})"), 1)


def shingle_array(text: Column, n: int) -> Column:
    """Word n-gram strings of ``text`` as an array Column (empty when the
    document has fewer than ``n`` tokens — short docs can't collide).

    The token array is LET-BOUND via a single-element ``transform`` so the
    ``regexp_extract_all`` tokenization runs once per row: capturing the
    raw expression in the per-offset lambda re-evaluates it per shingle
    position (interpreted HOF lambdas get no common-subexpression
    elimination — measured 8× wall on the sf0.1 documents table)."""

    def _build(toks: Column) -> Column:
        offsets = F.sequence(F.lit(1), F.size(toks) - (n - 1))
        return F.when(
            F.size(toks) >= n,
            F.transform(
                offsets, lambda i: F.concat_ws(" ", F.slice(toks, i, n))
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.get(F.transform(F.array(_token_array(text)), _build), 0)


def shingle_df(
    docs: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct ``(id_col, shingle)`` rows. The dedup is PER DOCUMENT, so
    it's an ``array_distinct`` inside the projection before the explode —
    a ``.distinct()`` after the explode would shuffle every (doc, n-gram)
    string of the corpus to establish a fact each row already knows."""
    return docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(shingle_array(F.col(text_col), n))
        ).alias("shingle"),
    )


def ngram_collisions(
    corpus: DataFrame,
    probes: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_parallelism: int | None = None,
) -> DataFrame:
    """Contaminated corpus documents → ``(id_col, n_collisions)``.

    ``n_collisions`` counts the DISTINCT corpus-doc shingles that also
    appear anywhere in ``probes`` (the benchmark set). Clean documents
    are absent — downstream either drops flagged docs or routes them to
    review. The probe shingle set is broadcast (eval sets are MBs, the
    corpus is the 100 TB side); the corpus is scanned once, its per-doc
    shingle dedup is an in-projection ``array_distinct`` (no shuffle),
    and only broadcast-join survivors reach the final groupBy.
    ``min_parallelism``: same small-split escape hatch as
    :func:`repetition_stats` (shingling is CPU-heavy per row).
    """
    corpus = _fan_out(corpus, min_parallelism)
    c = shingle_df(corpus, n, id_col, text_col)
    p = shingle_df(probes, n, id_col, text_col).select("shingle").distinct()
    return (
        c.join(F.broadcast(p), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_collisions"))
    )


def _fan_out(df: DataFrame, min_parallelism: int | None) -> DataFrame:
    """Small-split escape hatch for CPU-heavy projections: round-robin
    repartition when the input has fewer splits than requested. No-op on
    streaming inputs (micro-batch sizing governs there) and at corpus
    scale (plenty of splits; leave min_parallelism None)."""
    if not min_parallelism or df.isStreaming:
        return df
    if df.rdd.getNumPartitions() < min_parallelism:
        return df.repartition(min_parallelism)
    return df


def _max_multiplicity(arr: Column) -> Column:
    """Largest multiplicity of any element: the longest equal run in the
    sorted array, folded with ``aggregate`` — a pure codegen expression,
    no explode/groupBy. Assumes elements are non-empty strings (regex
    tokens are), so the "" seed never matches."""
    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(
        F.sort_array(arr),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        step,
        lambda acc: acc["best"],
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Per-document repetition diagnostics → ``(id_col, n_tokens,
    distinct_ratio, top_token_frac, top_bigram_frac)``.

    Every metric is per-document, so nothing ever shuffles: tokenize,
    build the bigram array, and fold top multiplicities with sorted-array
    run-length expressions (:func:`_max_multiplicity`) — ONE projection
    in whole-stage codegen, O(L log L) per doc, cost scales with bytes
    scanned. (The naive shape — explode + two groupBys — shuffles every
    token of a 100 TB corpus to compute doc-local facts.)
    Documents with no tokens are absent (nothing to diagnose).

    ``min_parallelism``: the projection is CPU-heavy per row, so when
    the INPUT has fewer splits than cores (small local files — a 100 TB
    table always has plenty), opt into one round-robin repartition to
    fan the compute out; leave None at scale.
    """
    docs = _fan_out(docs, min_parallelism)
    toks = _token_array(F.col(text_col))
    bigrams = shingle_array(F.col(text_col), 2)
    r = F.round
    n_tokens = F.size(toks)
    return (
        docs.select(
            F.col(id_col),
            n_tokens.cast("long").alias("n_tokens"),
            r(
                F.try_divide(F.size(F.array_distinct(toks)), n_tokens),
                round_to,
            ).alias("distinct_ratio"),
            r(
                F.try_divide(_max_multiplicity(toks), n_tokens), round_to
            ).alias("top_token_frac"),
            # a 1-token document has no bigrams: frac 0.0 (0/0 → null;
            # try_divide because ANSI mode raises on plain 0/0)
            F.coalesce(
                r(
                    F.try_divide(
                        _max_multiplicity(bigrams), F.size(bigrams)
                    ),
                    round_to,
                ),
                F.lit(0.0),
            ).alias("top_bigram_frac"),
        )
        .where(F.col("n_tokens") > 0)
    )


def gopher_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_distinct_ratio: float = 0.3,
    max_top_bigram_frac: float = 0.2,
    min_parallelism: int | None = None,
) -> DataFrame:
    """The composite keep/drop decision a curation pipeline actually
    runs (Gopher §A1.1-style rules over the repetition diagnostics) →
    ``(id_col, verdict)`` with verdict ∈ {keep, too_short, too_long,
    low_diversity, repetitive} — FIRST failing rule wins, in that order.

    ONE projection, no join, no shuffle: the diagnostics are inlined as
    the same sorted-array run-length expressions as
    :func:`repetition_stats` (rounded to the same 4 dp, so thresholds
    agree with the published stats) and the verdict is a CASE on top.
    Token-less documents get ``too_short``. Because the plan is a
    stateless projection it runs UNCHANGED under ``readStream`` —
    streaming corpus admission control for free.
    """
    docs = _fan_out(docs, min_parallelism)
    verdict = gopher_verdict(
        F.col(text_col), min_tokens=min_tokens, max_tokens=max_tokens,
        min_distinct_ratio=min_distinct_ratio,
        max_top_bigram_frac=max_top_bigram_frac,
    )
    return docs.select(F.col(id_col), verdict.alias("verdict"))


def gopher_verdict(
    text: Column,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_distinct_ratio: float = 0.3,
    max_top_bigram_frac: float = 0.2,
) -> Column:
    """The Gopher keep/drop verdict as a composable Column — THE single
    definition gopher_filter and the curation pipeline's admission stage
    both evaluate (the latter as a pushed-down filter predicate, no
    corpus self-join)."""
    toks = _token_array(text)
    bigrams = shingle_array(text, 2)
    n_tokens = F.coalesce(F.size(toks), F.lit(0))
    distinct_ratio = F.round(
        F.try_divide(F.size(F.array_distinct(toks)), n_tokens), 4
    )
    top_bigram_frac = F.coalesce(
        F.round(
            F.try_divide(_max_multiplicity(bigrams), F.size(bigrams)), 4
        ),
        F.lit(0.0),
    )
    return (
        F.when(n_tokens < min_tokens, "too_short")
        .when(n_tokens > max_tokens, "too_long")
        .when(distinct_ratio < min_distinct_ratio, "low_diversity")
        .when(top_bigram_frac > max_top_bigram_frac, "repetitive")
        .otherwise("keep")
    )


# --------------------------------------------------------------------------
# bigram language-model quality scoring (the CCNet / Wenzek et al. 2020
# perplexity-filter shape, with the corpus itself as the LM training set)
# --------------------------------------------------------------------------

def bigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_parallelism: int | None = None,
) -> DataFrame:
    """Per-document mean log-probability under an add-one-smoothed bigram
    LM estimated from the corpus itself — the standard "rank documents by
    LM fluency, drop the tail" curation pass (CCNet trains KenLM on a
    reference corpus; the self-trained form flags statistical outliers
    without external data, which is what a hermetic cluster job can do).

    ``P(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)`` with V = distinct
    unigram vocabulary; ``avg_logprob`` = mean ln P over the document's
    bigram instances. Low scores = token salad / boilerplate / wrong
    language; high scores = repetitive junk — both tails are cut in
    practice.

    Execution shape (100 TB-safe):

    * bigrams explode as (doc_id, w1, w2) rows — the only corpus-sized
      rows in flight are two words + an id, never the document body;
    * the text column is scanned twice for bigrams (count-building
      pass, scoring pass — the same probe/apply shape as the linking
      and decontamination operators) plus once more for the exact
      unigram vocabulary V; the context table c(w1 ·) is DERIVED from
      the bigram counts (a vocabulary-sized re-aggregation), NOT a
      corpus scan;
    * both count tables are vocabulary-sized (Zipf: ≪ corpus), joined
      back by equi-join — AQE broadcasts them when they fit, falls back
      to shuffle-hash when they don't;
    * V is a 1-row broadcast crossJoin (the repo's scalar pattern);
    * no all-pairs stage, no driver collect.

    Returns (id_col, n_bigrams, avg_logprob) for every input document;
    documents with fewer than 2 tokens get n_bigrams = 0 and a NULL
    score (nothing to measure — callers decide their fate).
    """
    docs = _fan_out(docs, min_parallelism)
    bg = docs.select(
        F.col(id_col), F.explode(shingle_array(F.col(text_col), 2)).alias("_bg")
    ).select(
        id_col,
        F.split("_bg", " ").getItem(0).alias("_w1"),
        F.split("_bg", " ").getItem(1).alias("_w2"),
    )
    c12 = bg.groupBy("_w1", "_w2").agg(F.count("*").alias("_c12"))
    # c(w1 ·) = Σ_w2 c(w1 w2): a vocabulary-sized re-aggregation of the
    # bigram table — NOT another pass over the corpus
    c1 = c12.groupBy("_w1").agg(F.sum("_c12").alias("_c1"))
    vocab = (
        docs.select(F.explode(_token_array(F.col(text_col))).alias("_tok"))
        .agg(F.count_distinct("_tok").alias("_v"))
    )
    scored = (
        bg.join(c12, ["_w1", "_w2"])
        .join(c1, ["_w1"])
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.avg(F.log((F.col("_c12") + 1.0) / (F.col("_c1") + F.col("_v")))),
                6,
            ).alias("avg_logprob"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, [id_col], "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "avg_logprob",
        )
    )
