"""Minimal-RDFS (ρdf) forward entailment."""

import pytest

from distributed_extraction_framework_spark.operators.reasoning import (
    RDF_TYPE,
    rdfs_entailment,
)

QCOLS = "subj string, pred string, obj string"


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_rdfs_rules_compose(spark):
    quads = _df(spark, [
        ("a", "p:capitalOf", "b"),
        ("c", RDF_TYPE, "City"),
    ], QCOLS)
    subprop = _df(spark, [("p:capitalOf", "p:locatedIn")], "src string, dst string")
    subclass = _df(spark, [("City", "Place"), ("Place", "Thing")],
                   "src string, dst string")
    domains = _df(spark, [("p:capitalOf", "City")], "prop string, cls string")
    ranges = _df(spark, [("p:capitalOf", "Country")], "prop string, cls string")
    got = {tuple(r) for r in rdfs_entailment(
        quads, subclass=subclass, subprop=subprop,
        domains=domains, ranges=ranges,
    ).collect()}
    assert ("a", "p:locatedIn", "b") in got          # rdfs7
    assert ("a", RDF_TYPE, "City") in got            # rdfs2
    assert ("b", RDF_TYPE, "Country") in got         # rdfs3
    # rdfs9 over the transitive subclass closure, incl. derived types
    assert ("a", RDF_TYPE, "Place") in got and ("a", RDF_TYPE, "Thing") in got
    assert ("c", RDF_TYPE, "Place") in got and ("c", RDF_TYPE, "Thing") in got
    # entailed-only: asserted facts never re-emitted
    assert ("c", RDF_TYPE, "City") not in got
    assert ("a", "p:capitalOf", "b") not in got


def test_rdfs_entailment_requires_ontology(spark):
    quads = _df(spark, [("a", "p", "b")], QCOLS)
    with pytest.raises(ValueError):
        rdfs_entailment(quads)


def test_rdfs3_skips_literal_objects(spark):
    """Regression (ADVICE r4): a property with a declared range that
    also carries literal values must not type its literals — a literal
    can never be the subject of rdf:type. Resource objects (datatype
    and lang both NULL) still get typed, including via rdfs7."""
    quads = _df(spark, [
        ("a", "p:knows", "b", None, None),           # resource object
        ("a", "p:knows", "forty-two", None, "en"),   # lang literal
        ("a", "p:knows", "42", "xsd:integer", None),  # typed literal
    ], "subj string, pred string, obj string, datatype string, lang string")
    ranges = _df(spark, [("p:knows", "Person"), ("p:friend", "Person")],
                 "prop string, cls string")
    subprop = _df(spark, [("p:knows", "p:friend")], "src string, dst string")
    got = {tuple(r) for r in rdfs_entailment(
        quads, ranges=ranges, subprop=subprop
    ).collect()}
    assert ("b", RDF_TYPE, "Person") in got
    assert ("forty-two", RDF_TYPE, "Person") not in got
    assert ("42", RDF_TYPE, "Person") not in got
    # rdfs7 still rewrites literal-valued triples (that's legal)
    assert ("a", "p:friend", "42") in got
    # quads without datatype/lang columns behave as before (all resources)
    bare = _df(spark, [("a", "p:knows", "x")], QCOLS)
    got2 = {tuple(r) for r in rdfs_entailment(bare, ranges=ranges).collect()}
    assert ("x", RDF_TYPE, "Person") in got2
