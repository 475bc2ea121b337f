"""SHACL-lite shape validation over the quad table."""

import pytest

from distributed_extraction_framework_spark.operators.validation import (
    Shape,
    validate_shapes,
)

COLS = "dataset string, subj string, pred string, obj string, lang string, datatype string, context string"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def _quads(spark, rows):
    return spark.createDataFrame(rows, COLS)


@pytest.fixture()
def kg(spark):
    return _quads(spark, [
        ("d", "s1", "p:id", "42", None, XSD_INT, "c"),
        ("d", "s1", "p:label", "One", "en", None, "c"),
        ("d", "s2", "p:id", "notanum", None, None, "c"),   # bad dt, bad pattern
        ("d", "s2", "p:label", "Two", "en", None, "c"),
        ("d", "s2", "p:label", "Zwei", "de", None, "c"),   # maxCount 1 breach
        ("d", "s3", "p:id", "7", None, XSD_INT, "c"),      # no label: minCount
        ("d", "s1", "p:link", "http://x.org/a", None, None, "c"),
        ("d", "s3", "p:link", "lit", "en", None, "c"),     # nodeKind IRI breach
    ])


def test_cardinality_shapes(spark, kg):
    v = validate_shapes(kg, [Shape(
        "label-card", pred="p:label", target_pred="p:id",
        min_count=1, max_count=1,
    )])
    got = {(r["rule"], r["subj"], r["detail"]) for r in v.collect()}
    assert got == {("minCount", "s3", "0"), ("maxCount", "s2", "2")}


def test_value_shapes(spark, kg):
    v = validate_shapes(kg, [
        Shape("id-dt", pred="p:id", datatype=XSD_INT, pattern="^[0-9]+$"),
        Shape("link-iri", pred="p:link", node_kind="IRI"),
    ])
    got = {(r["shape"], r["rule"], r["subj"]) for r in v.collect()}
    assert got == {
        ("id-dt", "datatype", "s2"),
        ("id-dt", "pattern", "s2"),
        ("link-iri", "nodeKind", "s3"),
    }


def test_conforming_kg_is_silent(spark, kg):
    assert validate_shapes(kg, [
        Shape("id-present", pred="p:id", target_pred="p:id", max_count=5),
    ]).count() == 0
    with pytest.raises(ValueError):
        validate_shapes(kg, [])
    with pytest.raises(ValueError):
        validate_shapes(kg, [Shape("empty", pred="p:id")])


def test_functional_properties(spark, kg):
    from distributed_extraction_framework_spark.operators.validation import (
        functional_properties,
    )

    got = {r["pred"]: r for r in functional_properties(kg, 0.99).collect()}
    # p:label: 2 subjects bear it (s3 has none); s2 is multi-valued
    assert got["p:label"]["n_subjects"] == 2
    assert got["p:label"]["n_multi"] == 1
    assert got["p:label"]["functional"] is False
    assert got["p:id"]["functional"] is True
    # a permissive threshold flips the verdict
    loose = {r["pred"]: r["functional"]
             for r in functional_properties(kg, 0.5).collect()}
    assert loose["p:label"] is True
    import pytest as _pt
    with _pt.raises(ValueError):
        functional_properties(kg, 0.0)


def test_numeric_outliers_catch_corruption_stratum(spark):
    from distributed_extraction_framework_spark.operators.validation import (
        numeric_outliers,
    )
    from pyspark.sql import functions as F

    xsd_d = "http://www.w3.org/2001/XMLSchema#double"
    # 200 well-behaved values ~ N-ish around 1000 (deterministic), 3
    # corrupted 100x, plus a zero-MAD predicate and a junk lexical form
    rows = []
    for i in range(200):
        v = 1000.0 + (i % 21) - 10  # 990..1010
        if i in (11, 97, 154):
            v *= 100
        rows.append((f"s{i}", "p:val", str(v), xsd_d))
    rows += [(f"c{i}", "p:const", "7.0", xsd_d) for i in range(10)]
    rows.append(("bad", "p:val", "not-a-number", xsd_d))
    quads = spark.createDataFrame(
        rows, "subj string, pred string, obj string, datatype string"
    ).withColumn("lang", F.lit(None).cast("string"))
    out = numeric_outliers(quads, k=3.5).collect()
    assert {r["subj"] for r in out} == {"s11", "s97", "s154"}
    assert all(r["pred"] == "p:val" and r["z"] > 3.5 for r in out)


def test_numeric_outliers_approx_tier_runs(spark):
    from distributed_extraction_framework_spark.operators.validation import (
        numeric_outliers,
    )
    from pyspark.sql import functions as F

    xsd_i = "http://www.w3.org/2001/XMLSchema#integer"
    rows = [(f"s{i}", "p:n", str(i % 10), xsd_i) for i in range(100)]
    rows.append(("hot", "p:n", "100000", xsd_i))
    quads = spark.createDataFrame(
        rows, "subj string, pred string, obj string, datatype string"
    ).withColumn("lang", F.lit(None).cast("string"))
    out = numeric_outliers(quads, k=3.5, approx=True).collect()
    assert {r["subj"] for r in out} == {"hot"}
