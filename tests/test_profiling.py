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


def test_sdtype_infers_from_predicate_distributions(spark):
    from distributed_extraction_framework_spark.operators.profiling import (
        sdtype_infer,
    )

    # typed world: people have p:born, places have p:located
    quads = spark.createDataFrame(
        [
            ("alice", "p:born", "x1"), ("bob", "p:born", "x2"),
            ("paris", "p:located", "x3"), ("lyon", "p:located", "x4"),
            # untyped entity with a person-shaped predicate
            ("carol", "p:born", "x5"),
            # untyped entity with a place-shaped predicate
            ("nice", "p:located", "x6"),
        ],
        "subj string, pred string, obj string",
    )
    types = spark.createDataFrame(
        [("alice", "Person"), ("bob", "Person"),
         ("paris", "Place"), ("lyon", "Place")],
        "entity string, cls string",
    )
    got = {
        r["entity"]: (r["cls"], r["score"])
        for r in sdtype_infer(quads, types, use_inverse=False).collect()
    }
    assert got == {"carol": ("Person", 1.0), "nice": ("Place", 1.0)}


def test_sdtype_inverse_features_type_objects(spark):
    from distributed_extraction_framework_spark.operators.profiling import (
        sdtype_infer,
    )

    # whatever p:author points AT is a Person (learned from typed objs)
    quads = spark.createDataFrame(
        [("b1", "p:author", "alice"), ("b2", "p:author", "unknown")],
        "subj string, pred string, obj string",
    )
    types = spark.createDataFrame(
        [("alice", "Person")], "entity string, cls string"
    )
    got = {
        r["entity"]: r["cls"]
        for r in sdtype_infer(quads, types).collect()
    }
    assert got["unknown"] == "Person"


def test_sdtype_mixed_evidence_and_min_score(spark):
    from distributed_extraction_framework_spark.operators.profiling import (
        sdtype_infer,
    )

    quads = spark.createDataFrame(
        [
            ("a1", "p:only_a", "x"), ("a2", "p:only_a", "x"),
            ("b1", "p:only_b", "x"),
            # u has one A-predicate and one B-predicate -> A wins 0.5 vs 0.5
            # tie broken by class string (A < B)
            ("u", "p:only_a", "x"), ("u", "p:only_b", "x"),
        ],
        "subj string, pred string, obj string",
    )
    types = spark.createDataFrame(
        [("a1", "A"), ("a2", "A"), ("b1", "B")],
        "entity string, cls string",
    )
    rows = sdtype_infer(quads, types, use_inverse=False).collect()
    got = {r["entity"]: (r["cls"], r["score"]) for r in rows}
    assert got["u"] == ("A", 0.5)
    # min_score filters the weak winner out
    assert sdtype_infer(
        quads, types, use_inverse=False, min_score=0.6
    ).where("entity = 'u'").isEmpty()


def test_schema_graph_lift(spark):
    from distributed_extraction_framework_spark.operators.profiling import (
        schema_graph,
    )

    T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    E = "http://ex/e"
    rows = [
        # e1: typed C (twice-typed C+D — multi-type fan-out)
        (f"{E}1", T, "http://ex/C", None, None),
        (f"{E}1", T, "http://ex/D", None, None),
        (f"{E}2", T, "http://ex/C", None, None),
        # e3 untyped
        # resource edges
        (f"{E}1", "http://ex/p", f"{E}2", None, None),   # (C|D) -> C
        (f"{E}3", "http://ex/p", f"{E}1", None, None),   # untyped -> C|D
        (f"{E}2", "http://ex/p", f"{E}9", None, None),   # C -> untyped obj
        # literal strata
        (f"{E}2", "http://ex/n", "hi", "en", None),      # langString
        (f"{E}2", "http://ex/s", "4", None, "http://w3/int"),  # typed
        (f"{E}2", "http://ex/t", "bare", None, None),    # plain (non-URI)
    ]
    quads = spark.createDataFrame(
        rows, "subj string, pred string, obj string, lang string, datatype string"
    )
    got = {
        (r["src_cls"], r["pred"], r["dst_cls"]): (r["n_edges"], r["n_src"])
        for r in schema_graph(quads).collect()
    }
    assert got == {
        ("http://ex/C", "http://ex/p", "http://ex/C"): (1, 1),
        ("http://ex/D", "http://ex/p", "http://ex/C"): (1, 1),
        ("<untyped>", "http://ex/p", "http://ex/C"): (1, 1),
        ("<untyped>", "http://ex/p", "http://ex/D"): (1, 1),
        ("http://ex/C", "http://ex/p", "<untyped>"): (1, 1),
        ("http://ex/C", "http://ex/n", "<langString>"): (1, 1),
        ("http://ex/C", "http://ex/s", "http://w3/int"): (1, 1),
        ("http://ex/C", "http://ex/t", "<plain>"): (1, 1),
    }


def test_characteristic_sets(spark):
    from distributed_extraction_framework_spark.operators.profiling import (
        characteristic_sets,
    )

    quads = spark.createDataFrame(
        [
            ("s1", "p:name"), ("s1", "p:name"), ("s1", "p:size"),
            ("s2", "p:size"), ("s2", "p:name"),
            ("s3", "p:name"),
        ],
        "subj string, pred string",
    )
    got = {r["cs"]: (r["n_preds"], r["n_subjects"], r["n_triples"])
           for r in characteristic_sets(quads).collect()}
    # s1 and s2 share {name,size} (s1's repeated name is 3 triples, 2 preds)
    assert got == {"p:name|p:size": (2, 2, 5), "p:name": (1, 1, 1)}
