"""Pattern-based open IE (operators/openie.py)."""

import pytest

from distributed_extraction_framework_spark.operators.openie import (
    copula_facts,
    hearst_hyponyms,
    mention_spans,
    nil_clusters,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "Tools such as Spark Engine, Duck Db and Flink Core were used."),
        (1, "Languages, including Scala and Python Lang, matter. "
            "Cities, especially New York, grow."),
        (2, "Spark Engine and other frameworks exist. Iron or other metals rust."),
        (3, "Spark Engine is a framework. Duck Db was the fastest engine here."),
        (4, "no capitals here, nothing such as anything matches."),
        (5, "Spark Engine appears again with Unknown Thing twice: Unknown Thing."),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hearst_such_as_list_split(docs):
    got = {(r.hyponym, r.hypernym, r.pattern)
           for r in hearst_hyponyms(docs).collect()}
    assert ("Spark Engine", "Tools", "such_as") in got
    assert ("Duck Db", "Tools", "such_as") in got
    assert ("Flink Core", "Tools", "such_as") in got


def test_hearst_including_especially_and_other(docs):
    got = {(r.hyponym, r.hypernym, r.pattern)
           for r in hearst_hyponyms(docs).collect()}
    assert ("Scala", "Languages", "including") in got
    assert ("Python Lang", "Languages", "including") in got
    assert ("New York", "Cities", "especially") in got
    assert ("Spark Engine", "frameworks", "and_other") in got
    assert ("Iron", "metals", "and_other") in got
    # the lowercase-only doc yields nothing
    assert not any(r.doc_id == 4 for r in hearst_hyponyms(docs).collect())


def test_copula_facts(docs):
    got = {(r.subj, r.obj) for r in copula_facts(docs).collect()}
    assert ("Spark Engine", "framework") in got
    assert ("Duck Db", "fastest engine") in got


def test_mention_spans_min_tokens(docs):
    m = {r.mention for r in mention_spans(docs, min_tokens=2).collect()}
    assert "Spark Engine" in m and "Unknown Thing" in m
    assert "Tools" not in m  # single token filtered
    m1 = {r.mention for r in mention_spans(docs, min_tokens=1).collect()}
    assert "Tools" in m1


def test_nil_clusters(spark, docs):
    kb = spark.createDataFrame(
        [("Spark Engine",), ("Duck Db",), ("New York",)], "label string"
    )
    got = {r.cluster: r for r in nil_clusters(docs, kb).collect()}
    assert "spark engine" not in got          # linked -> dropped
    assert got["unknown thing"].n_mentions == 2
    assert got["unknown thing"].n_docs == 1
    assert "flink core" in got and "python lang" in got


def test_copula_object_strips_trailing_function_word(spark):
    """'Paris is a city in France' must yield obj 'city', not 'city in'
    (code-review r5 wave-4 #9)."""
    df = spark.createDataFrame(
        [(1, "Paris is a city in France. Spark is a tool for data.")],
        "doc_id long, text string",
    )
    got = {(r.subj, r.obj) for r in copula_facts(df).collect()}
    assert ("Paris", "city") in got
    assert ("Spark", "tool") in got
    assert not any(o.endswith((" in", " for")) for _, o in got)
