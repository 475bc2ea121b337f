"""OWL-lite entailment edge cases the driver gates' clean relation never
hits: literal-valued rows, cycles under TransitiveProperty, inverse rules
firing in both directions, already-asserted facts being subtracted."""

from pyspark.sql import functions as F

from distributed_extraction_framework_spark import schema as S
from distributed_extraction_framework_spark.operators.reasoning import (
    owl_entailment,
)

QS = "subj string, pred string, obj string, lang string, datatype string"


def _quads(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, None, None) for s, p, o in rows], QS
    )


def _got(df):
    return {(r["subj"], r["pred"], r["obj"]) for r in df.collect()}


def test_inverse_fires_both_directions_and_skips_asserted(spark):
    quads = _quads(spark, [
        ("a", "p:parentOf", "b"),
        ("b", "p:childOf", "a"),      # already asserted → not re-derived
        ("c", "p:childOf", "d"),
    ])
    inv = spark.createDataFrame(
        [("p:parentOf", "p:childOf")], "prop string, inv string"
    )
    assert _got(owl_entailment(quads, inverse=inv)) == {
        ("d", "p:parentOf", "c"),
    }


def test_symmetric_skips_literal_rows(spark):
    quads = spark.createDataFrame(
        [
            ("a", "p:near", "b", None, None),
            ("a", "p:near", "5 km", None, S.XSD_STRING),  # literal object
        ],
        QS,
    )
    sym = spark.createDataFrame([("p:near",)], "prop string")
    assert _got(owl_entailment(quads, symmetric=sym)) == {
        ("b", "p:near", "a"),
    }


def test_transitive_closure_terminates_on_cycles(spark):
    quads = _quads(spark, [
        ("a", "p:flows", "b"),
        ("b", "p:flows", "c"),
        ("c", "p:flows", "a"),   # 3-cycle
    ])
    tr = spark.createDataFrame([("p:flows",)], "prop string")
    got = _got(owl_entailment(quads, transitive=tr))
    # every ordered non-self pair except the three asserted edges
    assert got == {
        ("a", "p:flows", "c"),
        ("b", "p:flows", "a"),
        ("c", "p:flows", "b"),
    }


def test_functional_and_inverse_functional_sameas(spark):
    quads = _quads(spark, [
        ("s", "p:id", "x"),
        ("s", "p:id", "y"),
        ("u1", "p:mbox", "m"),
        ("u2", "p:mbox", "m"),
        ("u3", "p:mbox", "other"),
    ])
    fp = spark.createDataFrame([("p:id",)], "prop string")
    ifp = spark.createDataFrame([("p:mbox",)], "prop string")
    got = _got(owl_entailment(quads, functional=fp, inverse_functional=ifp))
    assert got == {
        ("x", S.OWL_SAMEAS, "y"),
        ("u1", S.OWL_SAMEAS, "u2"),
    }


def test_functional_sameas_requires_same_property(spark):
    """prp-fp joins on (subject, PROPERTY) — two different functional
    properties of one subject must NOT merge their values (code-review
    r5 #1: birthPlace=Paris + deathPlace=London must not derive
    sameAs(London, Paris)); same for prp-ifp on (object, property)."""
    quads = _quads(spark, [
        ("s", "p:birthPlace", "Paris"),
        ("s", "p:deathPlace", "London"),
        ("u1", "p:mbox", "m"),
        ("u2", "p:homepage", "m"),
    ])
    fp = spark.createDataFrame(
        [("p:birthPlace",), ("p:deathPlace",)], "prop string"
    )
    ifp = spark.createDataFrame(
        [("p:mbox",), ("p:homepage",)], "prop string"
    )
    got = _got(owl_entailment(quads, functional=fp, inverse_functional=ifp))
    assert got == set()


def test_equivalent_class_fires_both_ways(spark):
    rt = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    quads = _quads(spark, [
        ("a", rt, "c:Person"),
        ("b", rt, "c:Human"),
    ])
    eq = spark.createDataFrame([("c:Person", "c:Human")], "a string, b string")
    assert _got(owl_entailment(quads, equivalent_class=eq)) == {
        ("a", rt, "c:Human"),
        ("b", rt, "c:Person"),
    }


def test_owl_rules_are_broadcast_joins(spark):
    quads = _quads(spark, [("a", "p:near", "b")])
    sym = spark.createDataFrame([("p:near",)], "prop string")
    plan = (
        owl_entailment(quads, symmetric=sym)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
