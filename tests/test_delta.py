"""Snapshot diff + incremental extraction (operators/delta.py).

``delta_extract`` is checked against the ground truth it is defined by:
a full recompute ``quad_diff(extract(old), extract(new))``.
"""

from pyspark.sql import functions as F

from distributed_extraction_framework_spark.operators.delta import (
    delta_extract,
    quad_diff,
    touched_pages,
)
from distributed_extraction_framework_spark.operators.extractors import extract
from distributed_extraction_framework_spark.sources.synth import synth_pages


def _quads(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, lang string"
    )


def test_quad_diff_set_semantics(spark):
    old = _quads(spark, [
        ("a", "p", "1", None),
        ("a", "p", "1", None),          # in-snapshot duplicate collapses
        ("b", "p", "2", "en"),
        ("c", "p", "3", None),
    ])
    new = _quads(spark, [
        ("a", "p", "1", None),          # unchanged → absent from diff
        ("b", "p", "2", "de"),          # lang change → removed + added
        ("d", "p", "4", None),          # added
    ])
    got = {tuple(r) for r in quad_diff(old, new).collect()}
    assert got == {
        ("removed", "b", "p", "2", "en"),
        ("added", "b", "p", "2", "de"),
        ("removed", "c", "p", "3", None),
        ("added", "d", "p", "4", None),
    }
    # diff against self is empty
    assert quad_diff(old, old).count() == 0


def test_touched_pages_statuses(spark):
    old = spark.createDataFrame(
        [("u1", "t1"), ("u2", "t2"), ("u3", "t3"), ("u4", None)],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [("u1", "t1"), ("u2", "t2-changed"), ("u4", None), ("u5", "t5")],
        "url string, text string",
    )
    got = {tuple(r) for r in touched_pages(old, new).collect()}
    # u1 identical and u4 NULL==NULL (null-safe compare) → untouched
    assert got == {("u2", "changed"), ("u3", "removed"), ("u5", "added")}


def test_delta_extract_matches_full_recompute(spark):
    old = synth_pages(spark, 120, partitions=4).cache()
    # new snapshot: drop some pages, rewrite others, leave the rest
    new = (
        old.filter(F.crc32(F.col("url")) % 7 != 0)
        .withColumn(
            "text",
            F.when(
                F.crc32(F.col("url")) % 5 == 0,
                F.concat(F.col("text"), F.lit("\n\n[[Delta Page]] extra")),
            ).otherwise(F.col("text")),
        )
        .cache()
    )
    fast = delta_extract(old, new, extractors=["labels", "page_links"])
    full = quad_diff(
        extract(old, extractors=["labels", "page_links"]),
        extract(new, extractors=["labels", "page_links"]),
        key=("dataset", "subj", "pred", "obj", "lang", "datatype"),
    )
    fast_rows = {tuple(r) for r in fast.collect()}
    full_rows = {tuple(r) for r in full.collect()}
    assert fast_rows == full_rows
    # the perturbation really produced both kinds of change
    changes = {r[0] for r in fast_rows}
    assert changes == {"added", "removed"}


def test_delta_extract_no_change_is_empty(spark):
    pages = synth_pages(spark, 40, partitions=2).cache()
    assert delta_extract(pages, pages, extractors=["labels"]).count() == 0


def test_quad_diff_single_shuffle_plan(spark):
    old = _quads(spark, [("a", "p", "1", None)])
    new = _quads(spark, [("a", "p", "2", None)])
    plan = quad_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    # union + partial/final hash aggregate: exactly ONE exchange, vs the
    # four a double anti-join formulation would pay
    assert plan.count("Exchange") == 1


def test_quad_diff_datatype_in_default_key(spark):
    """Regression (ADVICE r4): a datatype-only change ("42"^^xsd:integer
    → "42"^^xsd:double) must surface under the DEFAULT key; snapshots
    lacking the datatype column still work (default adapts), and an
    explicit key remains strict."""
    import pytest
    from pyspark.errors import AnalysisException

    cols = "subj string, pred string, obj string, lang string, datatype string"
    old = spark.createDataFrame([("a", "p", "42", None, "xsd:integer")], cols)
    new = spark.createDataFrame([("a", "p", "42", None, "xsd:double")], cols)
    got = {tuple(r) for r in quad_diff(old, new).collect()}
    assert got == {
        ("removed", "a", "p", "42", None, "xsd:integer"),
        ("added", "a", "p", "42", None, "xsd:double"),
    }
    # default adapts when snapshots carry no datatype column
    nar = "subj string, pred string, obj string, lang string"
    old4 = spark.createDataFrame([("a", "p", "1", None)], nar)
    new4 = spark.createDataFrame([("a", "p", "2", None)], nar)
    assert quad_diff(old4, new4).count() == 2
    # explicit key is strict: missing column raises
    with pytest.raises(AnalysisException):
        quad_diff(old4, new4, key=("subj", "pred", "obj", "datatype")).collect()
