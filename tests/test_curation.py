"""Decontamination n-gram collisions + Gopher-style repetition stats."""

import pytest
from pyspark.sql import functions as F

from distributed_extraction_framework_spark.operators.curation import (
    ngram_collisions,
    repetition_stats,
    shingle_array,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingle_array_edges(spark):
    df = spark.range(1).select(
        shingle_array(F.lit("The quick brown fox"), 2).alias("s2"),
        shingle_array(F.lit("one"), 2).alias("short"),
        shingle_array(F.lit(""), 2).alias("empty"),
    )
    row = df.collect()[0]
    assert row["s2"] == ["the quick", "quick brown", "brown fox"]
    assert row["short"] == [] and row["empty"] == []


def test_ngram_collisions_flags_contamination(spark):
    corpus = _docs(spark, [
        (1, "alpha beta gamma delta epsilon"),   # contains the probe 3-gram
        (2, "alpha beta gamma delta epsilon"),   # duplicate doc, also flagged
        (3, "zeta eta theta iota kappa"),        # clean
        (4, "beta gamma delta beta gamma delta x"),  # repeated shingle: counted once
    ])
    probes = _docs(spark, [(100, "xx beta gamma delta yy")])
    got = {(r["doc_id"], r["n_collisions"])
           for r in ngram_collisions(corpus, probes, n=3).collect()}
    assert got == {(1, 1), (2, 1), (4, 1)}
    # higher n: the probe has no 5-gram in common with anything
    assert ngram_collisions(corpus, probes, n=5).count() == 0


def test_repetition_stats_formulas(spark):
    docs = _docs(spark, [
        (1, "a a a a"),             # maximal repetition
        (2, "w x y z"),             # no repetition
        (3, "spam ham spam ham spam"),
        (4, "solo"),                # single token: no bigrams
        (5, ""),                    # no tokens: absent
    ])
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["n_tokens"] == 4 and got[1]["distinct_ratio"] == 0.25
    assert got[1]["top_token_frac"] == 1.0 and got[1]["top_bigram_frac"] == 1.0
    assert got[2]["distinct_ratio"] == 1.0 and got[2]["top_token_frac"] == 0.25
    assert got[2]["top_bigram_frac"] == pytest.approx(1 / 3, abs=1e-4)
    assert got[3]["top_token_frac"] == 0.6  # spam 3/5
    # "spam ham" bigram appears 2× of 4 bigrams
    assert got[3]["top_bigram_frac"] == 0.5
    assert got[4]["n_tokens"] == 1 and got[4]["top_bigram_frac"] == 0.0


def test_gopher_filter_verdict_order(spark):
    from distributed_extraction_framework_spark.operators.curation import (
        gopher_filter,
    )

    docs = _docs(spark, [
        (1, " ".join(f"w{i}" for i in range(60))),     # keep
        (2, "short doc"),                              # too_short
        (3, " ".join(["loop"] * 60)),                  # low_diversity (first hit)
        (4, ""),                                       # no tokens: too_short
        (5, " ".join(f"u{i % 40} x" for i in range(40))),  # repetitive bigrams
    ])
    got = {r["doc_id"]: r["verdict"] for r in gopher_filter(
        docs, min_tokens=50, min_distinct_ratio=0.3,
        max_top_bigram_frac=0.2,
    ).collect()}
    assert got[1] == "keep"
    assert got[2] == "too_short" and got[4] == "too_short"
    assert got[3] == "low_diversity"
    assert got[5] in ("keep", "repetitive", "low_diversity")
    assert len(got) == 5
