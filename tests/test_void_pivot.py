"""VoID per-dataset statistics + EAV->wide property pivot."""

import pytest

from distributed_extraction_framework_spark.plans.materialize import (
    pivot_properties,
    void_stats,
)

COLS = "dataset string, subj string, pred string, obj string, lang string, datatype string, context string"


@pytest.fixture()
def kg(spark):
    return spark.createDataFrame([
        ("labels", "s1", "p:label", "One", "en", None, "c"),
        ("labels", "s2", "p:label", "Two", "en", None, "c"),
        ("links", "s1", "p:link", "s2", None, None, "c"),
        ("links", "s1", "p:link", "s3", None, None, "c"),
        ("links", "s2", "p:link", "s3", None, None, "c"),
    ], COLS)


def test_void_stats_counts(spark, kg):
    got = {r["dataset"]: r for r in void_stats(kg).collect()}
    assert got["labels"]["n_triples"] == 2
    assert got["labels"]["n_distinct_subjects"] == 2
    assert got["links"]["n_triples"] == 3
    assert got["links"]["n_distinct_subjects"] == 2
    assert got["links"]["n_distinct_objects"] == 2
    assert got["links"]["n_predicates"] == 1
    # approx mode returns the same schema (values within HLL error)
    a = {r["dataset"]: r for r in void_stats(kg, approx=True).collect()}
    assert set(a) == {"labels", "links"}


def test_pivot_properties_min_semantics(spark, kg):
    wide = {r["subj"]: r for r in pivot_properties(kg, {
        "label": "p:label", "first_link": "p:link",
    }).collect()}
    assert wide["s1"]["label"] == "One"
    assert wide["s1"]["first_link"] == "s2"   # lexicographic min of s2,s3
    assert wide["s2"]["first_link"] == "s3"
    with pytest.raises(ValueError):
        pivot_properties(kg, {})
