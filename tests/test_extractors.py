"""Differential golden test: distributed extraction vs the sequential
pure-Python oracle — the analog of the reference's run-extraction-test
(sorted, order-insensitive diff of all emitted triples; P/R ≥ 0.95 per
BASELINE.json)."""

import pytest

from distributed_extraction_framework_spark.operators.extractors import (
    EXTRACTORS,
    extract,
    extractor_df,
)
from distributed_extraction_framework_spark.oracle.pyref import extract_corpus


def _spark_quads(df) -> set[tuple]:
    return {
        (r["dataset"], r["subj"], r["pred"], r["obj"], r["lang"], r["datatype"], r["context"])
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def diff(spark, pages_df, pages_local):
    got = _spark_quads(extract(pages_df))
    want = extract_corpus(pages_local)
    return got, want


def _pr(got: set, want: set) -> tuple[float, float]:
    if not got or not want:
        return (1.0 if got == want else 0.0,) * 2
    tp = len(got & want)
    return tp / len(got), tp / len(want)


def test_corpus_pr(diff):
    got, want = diff
    p, r = _pr(got, want)
    assert p >= 0.95 and r >= 0.95, (
        f"P={p:.4f} R={r:.4f}; spark-only={list(got - want)[:5]} "
        f"oracle-only={list(want - got)[:5]}"
    )


@pytest.mark.parametrize("dataset", sorted(EXTRACTORS))
def test_per_dataset_pr(diff, dataset):
    got, want = diff
    g = {q for q in got if q[0] == dataset}
    w = {q for q in want if q[0] == dataset}
    assert w, f"oracle produced no {dataset} rows — fixture gap"
    p, r = _pr(g, w)
    assert p >= 0.95 and r >= 0.95, (
        f"{dataset}: P={p:.4f} R={r:.4f}; spark-only={list(g - w)[:3]} "
        f"oracle-only={list(w - g)[:3]}"
    )


def test_single_extractor_df_matches_suite(spark, pages_df, diff):
    got, _ = diff
    lone = _spark_quads(extractor_df(pages_df, "redirects"))
    assert lone == {q for q in got if q[0] == "redirects"}


def test_redirect_targets_resolve_to_resources(diff):
    got, _ = diff
    for q in got:
        if q[0] == "redirects":
            assert q[3].startswith("http://") and "/resource/" in q[3]


def test_extraction_plan_is_shuffle_free(spark, pages_df):
    """Reference parity (SURVEY.md §4): the main extraction job is a single
    stage — no Exchange may appear in the physical plan."""
    plan = extract(pages_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
