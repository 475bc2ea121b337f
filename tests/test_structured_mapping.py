"""Structured mapping constructs — the rest of the published mappings-wiki
language (CalculateMapping, CombineDateMapping, DateIntervalMapping,
GeocoordinatesMapping, IntermediateNodeMapping). Edge cases the driver
gates' clean synthetic corpus never hits: parse failures, impossible
dates, open intervals, half-missing coordinates."""

import datetime

from pyspark.sql import functions as F

from distributed_extraction_framework_spark import schema as S
from distributed_extraction_framework_spark.operators.mapping import (
    CALC_SCHEMA,
    COMBINE_DATE_SCHEMA,
    GEO_MAP_SCHEMA,
    INODE_SCHEMA,
    INTERVAL_SCHEMA,
    PROPERTY_MAP_SCHEMA,
    calculate_mapping,
    combine_date_mapping,
    date_interval_mapping,
    geocoordinates_mapping,
    intermediate_node_mapping,
    template_kv_arrays,
)

TS = datetime.datetime(2024, 1, 1)
RES = "http://kg.example.org/resource/"


def _pages(spark, bodies: dict[str, str]):
    rows = [
        (f"https://en.pages.example.org/wiki/{t}", TS, body, "en")
        for t, body in bodies.items()
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, lang string"
    )


def _arrays(spark, bodies):
    return template_kv_arrays(_pages(spark, bodies))


def _box(**kv) -> str:
    inner = " | ".join(f"{k} = {v}" for k, v in kv.items())
    return "{{Infobox station | " + inner + "}}"


def test_calculate_mapping_ops_and_parse_failures(spark):
    arrays = _arrays(
        spark,
        {
            "A": _box(population="100", area="4"),
            "B": _box(population="100", area="0"),       # divide-by-zero
            "C": _box(population="many", area="4"),      # non-numeric
            "D": _box(population="100"),                  # missing operand
        },
    )
    spec = spark.createDataFrame(
        [
            ("Infobox_station", "population", "area", "divide", "d:density"),
            ("Infobox_station", "population", "area", "add", "d:sum"),
        ],
        CALC_SCHEMA,
    )
    got = {
        (r["subj"], r["pred"]): float(r["obj"])
        for r in calculate_mapping(arrays, spec).collect()
    }
    assert got == {
        (RES + "A", "d:density"): 25.0,
        (RES + "A", "d:sum"): 104.0,
        (RES + "B", "d:sum"): 100.0,  # add survives, divide dropped
    }
    sample = calculate_mapping(arrays, spec).first()
    assert sample["dataset"] == "mappingbased_literals"
    assert sample["datatype"] == S.XSD_DOUBLE


def test_combine_date_mapping_drops_impossible_dates(spark):
    arrays = _arrays(
        spark,
        {
            "A": _box(day="5", month="3", year="1990"),
            "B": _box(day="31", month="2", year="1990"),  # Feb 31
            "C": _box(day="5", month="3"),                # year missing
        },
    )
    spec = spark.createDataFrame(
        [("Infobox_station", "day", "month", "year", "d:founded")],
        COMBINE_DATE_SCHEMA,
    )
    rows = combine_date_mapping(arrays, spec).collect()
    assert {(r["subj"], r["obj"]) for r in rows} == {(RES + "A", "1990-03-05")}
    assert rows[0]["datatype"] == S.XSD_DATE


def test_date_interval_mapping_dash_variants_and_open_end(spark):
    arrays = _arrays(
        spark,
        {
            "A": _box(term="1990-1995"),
            "B": _box(term="1990 – 1995"),   # spaced en-dash
            "C": _box(term="1990–"),          # open-ended
            "D": _box(term="1990–present"),   # textual open end
            "E": _box(term="sometime"),            # unparseable
        },
    )
    spec = spark.createDataFrame(
        [("Infobox_station", "term", "d:start", "d:end")], INTERVAL_SCHEMA
    )
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in date_interval_mapping(arrays, spec).collect()
    }
    assert got == {
        (RES + "A", "d:start", "1990"), (RES + "A", "d:end", "1995"),
        (RES + "B", "d:start", "1990"), (RES + "B", "d:end", "1995"),
        (RES + "C", "d:start", "1990"),
        (RES + "D", "d:start", "1990"),
    }


def test_geocoordinates_mapping_requires_both_halves(spark):
    arrays = _arrays(
        spark,
        {
            "A": _box(latitude="41.5", longitude="2.25"),
            "B": _box(latitude="41.5"),                      # lon missing
            "C": _box(latitude="north", longitude="2.25"),   # non-numeric
        },
    )
    spec = spark.createDataFrame(
        [("Infobox_station", "latitude", "longitude")], GEO_MAP_SCHEMA
    )
    rows = geocoordinates_mapping(arrays, spec).collect()
    got = {(r["pred"], r["obj"]) for r in rows}
    assert got == {
        (S.GEO_LAT, "41.5"),
        (S.GEO_LONG, "2.25"),
        (S.GEORSS_POINT, "41.5 2.25"),
    }
    assert {r["subj"] for r in rows} == {RES + "A"}


def test_intermediate_node_mapping_shapes(spark):
    arrays = _arrays(
        spark,
        {"A": _box(employer="[[Acme Corp|acme]]", start_year="1999")},
    )
    spec = spark.createDataFrame(
        [("Infobox_station", "CareerStation", "d:CareerStation", "d:career")],
        INODE_SCHEMA,
    )
    pmaps = spark.createDataFrame(
        [
            ("Infobox_station", "employer", "d:employer", "object"),
            ("Infobox_station", "start_year", "d:startYear", S.XSD + "gYear"),
        ],
        PROPERTY_MAP_SCHEMA,
    )
    node = RES + "A__CareerStation__1"
    got = {
        (r["dataset"], r["subj"], r["pred"], r["obj"])
        for r in intermediate_node_mapping(arrays, spec, pmaps).collect()
    }
    assert got == {
        ("mappingbased_objects", RES + "A", "d:career", node),
        ("instance_types", node, S.RDF_TYPE, "d:CareerStation"),
        ("mappingbased_objects", node, "d:employer", RES + "Acme_Corp"),
        ("mappingbased_literals", node, "d:startYear", "1999"),
    }


def test_structured_mappings_add_no_shuffle_beyond_arrays(spark):
    """The whole construct family costs exactly the ONE exchange the
    arrays groupBy pays — each construct is broadcast join + projection."""
    arrays = _arrays(spark, {"A": _box(population="1", area="2")})
    spec = spark.createDataFrame(
        [("Infobox_station", "population", "area", "add", "d:s")], CALC_SCHEMA
    )
    plan = calculate_mapping(arrays, spec)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # arrays groupBy pair, nothing else
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_normalize_unit_values_converts_and_passes_through(spark):
    from distributed_extraction_framework_spark.operators.literals import (
        normalize_unit_values,
    )

    dtn = S.DATATYPE_NS
    quads = spark.createDataFrame(
        [
            ("a", "p:len", "5", None, dtn + "kilometre"),
            ("a", "p:wt", "2.5", None, dtn + "pound"),
            ("a", "p:n", "7", None, S.XSD_INTEGER),       # not a unit
            ("a", "p:bad", "tall", None, dtn + "metre"),  # unparseable
            ("a", "p:lbl", "hi", "en", None),             # plain literal
        ],
        "subj string, pred string, obj string, lang string, datatype string",
    )
    got = {
        r["pred"]: (r["obj"], r["datatype"])
        for r in normalize_unit_values(quads).collect()
    }
    assert got["p:len"] == ("5000.0", dtn + "metre")
    assert got["p:wt"] == (str(2.5 * 0.45359237), dtn + "kilogram")
    # non-unit / unparseable / untyped rows unchanged
    assert got["p:n"] == ("7", S.XSD_INTEGER)
    assert got["p:bad"] == ("tall", dtn + "metre")
    assert got["p:lbl"] == ("hi", None)
