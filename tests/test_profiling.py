"""KG profiling + taxonomy induction (operators/profiling.py, openie)."""

import pytest

from distributed_extraction_framework_spark.operators.openie import (
    taxonomy_from_isa,
)
from distributed_extraction_framework_spark.operators.profiling import (
    class_completeness,
    entity_summaries,
)


@pytest.fixture(scope="module")
def kg(spark):
    rows = [
        ("e1", "type", "City"), ("e2", "type", "City"), ("e3", "type", "City"),
        ("e4", "type", "River"),
        ("e1", "common", "x"), ("e2", "common", "y"), ("e3", "common", "z"),
        ("e4", "common", "w"),
        ("e1", "rare", "r1"),
        ("e1", "mid", "m1"), ("e2", "mid", "m2"),
        # duplicate must not change counts
        ("e1", "rare", "r1"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_entity_summaries_rank_rare_first(kg):
    out = entity_summaries(kg, k=2, type_pred="type").collect()
    by_subj = {}
    for r in sorted(out, key=lambda r: (r.subj, r.rank)):
        by_subj.setdefault(r.subj, []).append((r.pred, r.rank))
    # e1: rare (freq 1) beats mid (freq 2) beats common (freq 4)
    assert by_subj["e1"] == [("rare", 1), ("mid", 2)]
    assert by_subj["e2"] == [("mid", 1), ("common", 2)]
    # type arcs excluded, k respected
    assert all(r.pred != "type" and r.rank <= 2 for r in out)
    assert by_subj["e4"] == [("common", 1)]


def test_class_completeness(spark, kg):
    types = spark.createDataFrame(
        [("e1", "City"), ("e2", "City"), ("e3", "City"), ("e4", "River")],
        "inst string, cls string",
    )
    props = kg.filter("pred <> 'type'")
    out = {(r.cls, r.pred): r for r in class_completeness(types, props).collect()}
    assert out[("City", "common")].completeness == 1.0
    assert out[("City", "mid")].n_with_pred == 2
    assert out[("City", "mid")].completeness == round(2 / 3, 6)
    assert out[("City", "rare")].completeness == round(1 / 3, 6)
    assert out[("River", "common")].completeness == 1.0
    # predicates never observed on a class are absent, not 0.0 rows
    assert ("River", "rare") not in out


def test_taxonomy_from_isa(spark):
    pairs = spark.createDataFrame(
        [("Dog", "Animal"), ("Dog", "Animal"), ("Dog", "Pet"),
         ("Cat", "Pet"), ("Cat", "Animal"),   # tie -> 'Animal' (lexical)
         ("Oak", "Tree")],
        "hyponym string, hypernym string",
    )
    got = {r.node: r for r in taxonomy_from_isa(pairs).collect()}
    assert got["Dog"].parent == "Animal" and got["Dog"].weight == 2
    assert got["Dog"].n_parents == 2
    assert got["Cat"].parent == "Animal"    # weight tie, lexical break
    assert got["Oak"].parent == "Tree" and got["Oak"].n_parents == 1
    assert taxonomy_from_isa(pairs, min_weight=2).count() == 1
