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


def test_disambiguation_side_set(spark, tmp_path):
    """Reference DistDisambiguations parity: a broadcast page-id side set
    marks disambiguation pages the template trigger misses, and the set
    load-or-computes through a parquet cache."""
    import datetime
    import hashlib

    from pyspark.sql import functions as F

    from distributed_extraction_framework_spark.operators.disambiguations import (
        compute_disambiguation_pages,
        load_disambiguations,
    )

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        ("https://en.pages.example.org/wiki/Tmpl_dab", ts, None,
         "'''Tmpl dab''' may refer to [[A]] or [[B]]. {{Disambiguation}}", "en"),
        ("https://en.pages.example.org/wiki/List_dab", ts, None,
         "'''List dab''' may refer to [[C]] or [[D]].", "en"),  # no template
        ("https://en.pages.example.org/wiki/Plain", ts, None,
         "'''Plain''' links [[E]].", "en"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )

    # harvest finds only the template page
    harvested = {r["page_id"] for r in compute_disambiguation_pages(pages).collect()}
    pid = lambda u: int(hashlib.md5(u.encode()).hexdigest()[:8], 16)  # noqa: E731
    assert harvested == {pid(rows[0][0])}

    # cache roundtrip (load-or-compute)
    cache = str(tmp_path / "dab_ids")
    d1 = load_disambiguations(spark, pages, cache)
    assert {r["page_id"] for r in d1.collect()} == harvested
    d2 = load_disambiguations(spark, pages, cache)  # second call: cache hit
    assert {r["page_id"] for r in d2.collect()} == harvested

    # external side set (dump-list analog) extends the template trigger
    side = spark.createDataFrame(
        [(pid(rows[0][0]),), (pid(rows[1][0]),)], "page_id long"
    )
    quads = extract(pages, extractors=["disambiguations"],
                    disambiguations_df=side)
    subs = {r["subj"] for r in quads.collect()}
    assert subs == {
        "http://kg.example.org/resource/Tmpl_dab",
        "http://kg.example.org/resource/List_dab",
    }
    # without the side set only the template page emits
    subs0 = {r["subj"] for r in extract(pages, extractors=["disambiguations"]).collect()}
    assert subs0 == {"http://kg.example.org/resource/Tmpl_dab"}
