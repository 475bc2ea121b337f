"""Raw-dump ingestion (reference S1-S3 capability) + MappingExtractor."""

from pyspark.sql import functions as F

from distributed_extraction_framework_spark.operators.extractors import extract
from distributed_extraction_framework_spark.operators.mapping import (
    mapping_extract,
    mapping_tables,
)
from distributed_extraction_framework_spark.sources.rawdump import (
    read_mediawiki_dump,
    write_mediawiki_dump,
)


def test_rawdump_roundtrip(spark, tmp_path):
    fixture = [
        ("Alpha Page", "2016-04-07T12:00:00Z",
         "'''Alpha Page''' links [[Beta]] & <b>stuff</b>.\n[[Category:Things]]"),
        ("Beta", "2016-04-07T12:00:01Z", "#REDIRECT [[Alpha Page]]"),
        ("Gamma", "2016-04-07T12:00:02Z",
         "{{Infobox thing | population = 1,234 }} external [http://x.example/y z]"),
    ]
    dump = str(tmp_path / "dump.xml")
    write_mediawiki_dump(fixture, dump)
    pages = read_mediawiki_dump(spark, dump)
    rows = {r["url"].rsplit("/", 1)[1]: r for r in pages.collect()}
    assert set(rows) == {"Alpha_Page", "Beta", "Gamma"}
    # entity decoding restored the raw markup byte-for-byte
    assert rows["Alpha_Page"]["text"] == fixture[0][2]
    assert rows["Beta"]["text"] == "#REDIRECT [[Alpha Page]]"
    # and the extractor suite runs straight off the ingested dump
    quads = extract(pages)
    ds = {r["dataset"] for r in quads.collect()}
    assert {"labels", "page_links", "redirects", "article_categories",
            "infobox_properties", "external_links"} <= ds


def test_rawdump_is_distributed(spark, tmp_path):
    """Many pages in one dump must split across partitions on read."""
    fixture = [
        (f"Page_{i}", "2016-04-07T12:00:00Z", f"'''Page {i}''' [[Page_{(i+1) % 50}]]")
        for i in range(50)
    ]
    dump = str(tmp_path / "big.xml")
    write_mediawiki_dump(fixture, dump)
    pages = read_mediawiki_dump(spark, dump)
    assert pages.count() == 50


MAPPINGS_XML = """<?xml version="1.0" encoding="UTF-8"?>
<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.8/">
<page><title>Mapping en:Infobox settlement</title><ns>204</ns><id>1</id>
<revision><id>10</id><text>{{TemplateMapping
| mapToClass = Settlement
| mappings =
{{PropertyMapping | templateProperty = population | ontologyProperty = populationTotal}}
{{PropertyMapping | templateProperty = located in | ontologyProperty = isPartOf}}
{{PropertyMapping | templateProperty = motto | ontologyProperty = motto}}
}}</text></revision></page>
<page><title>Mapping en:Infobox company</title><ns>204</ns><id>2</id>
<revision><id>11</id><text>{{TemplateMapping
| mapToClass = Company
| mappings =
{{PropertyMapping | templateProperty = website | ontologyProperty = homepage}}
}}</text></revision></page>
<page><title>Mapping en:Infobox building</title><ns>204</ns><id>7</id>
<revision><id>16</id><text>{{ConditionalMapping
| cases =
{{Condition | templateProperty = type | operator = equals | value = church
  | mapping = {{TemplateMapping | mapToClass = Church
    | mappings = {{PropertyMapping | templateProperty = located in | ontologyProperty = isPartOf}} }} }}
{{Condition | templateProperty = height | operator = isSet
  | mapping = {{TemplateMapping | mapToClass = Skyscraper}} }}
{{Condition | operator = otherwise
  | mapping = {{TemplateMapping | mapToClass = Building}} }}
}}</text></revision></page>
</mediawiki>
"""

ONTOLOGY_XML = """<?xml version="1.0" encoding="UTF-8"?>
<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.8/">
<page><title>OntologyClass:Settlement</title><ns>200</ns><id>3</id>
<revision><id>12</id><text>{{Class
| labels = {{label|en|settlement}}
| rdfs:subClassOf = PopulatedPlace
}}</text></revision></page>
<page><title>OntologyProperty:populationTotal</title><ns>202</ns><id>4</id>
<revision><id>13</id><text>{{DatatypeProperty
| rdfs:label@en = population total
| rdfs:range = xsd:integer
}}</text></revision></page>
<page><title>OntologyProperty:isPartOf</title><ns>202</ns><id>5</id>
<revision><id>14</id><text>{{ObjectProperty
| rdfs:domain = Place
| rdfs:range = Place
}}</text></revision></page>
<page><title>OntologyProperty:homepage</title><ns>202</ns><id>6</id>
<revision><id>15</id><text>{{ObjectProperty
| rdfs:range = Document
}}</text></revision></page>
</mediawiki>
"""


def test_mappings_xml_loader(spark, tmp_path):
    """Reference parity: DistConfigLoader loads ontology.xml +
    Mapping_<lang>.xml (MediaWiki exports of {{TemplateMapping}} /
    {{PropertyMapping}} / {{ObjectProperty}} / {{DatatypeProperty}} pages)
    — same shapes parsed into the broadcastable mapping tables."""
    from distributed_extraction_framework_spark import schema as S
    from distributed_extraction_framework_spark.operators.mapping import (
        load_mappings_xml,
        parse_ontology_xml,
    )

    mp = tmp_path / "Mapping_en.xml"
    op = tmp_path / "ontology.xml"
    mp.write_text(MAPPINGS_XML)
    op.write_text(ONTOLOGY_XML)

    ranges = parse_ontology_xml(str(op))
    assert ranges == {
        "populationTotal": S.XSD_INTEGER,
        "isPartOf": "object",
        "homepage": "object",
    }

    tc, pm, cond = load_mappings_xml(spark, str(mp), str(op))
    tcs = {(r["template"], r["onto_class"]) for r in tc.collect()}
    # the ConditionalMapping page contributes NO unconditional class row
    assert tcs == {
        ("Infobox_settlement", S.ONTOLOGY + "Settlement"),
        ("Infobox_company", S.ONTOLOGY + "Company"),
    }
    crows = [(r["cond_order"], r["cond_key"], r["cond_op"], r["cond_value"],
              r["onto_class"])
             for r in cond.filter(F.col("template") == "Infobox_building")
             .orderBy("cond_order").collect()]
    assert crows == [
        (0, "type", "equals", "church", S.ONTOLOGY + "Church"),
        (1, "height", "isSet", "", S.ONTOLOGY + "Skyscraper"),
        (2, "", "otherwise", "", S.ONTOLOGY + "Building"),
    ]
    # per-case PropertyMappings merge onto the conditional template
    pms_all = {(r["template"], r["key"]) for r in pm.collect()}
    assert ("Infobox_building", "located_in") in pms_all
    pms = {(r["template"], r["key"], r["onto_pred"], r["range"]) for r in pm.collect()}
    assert ("Infobox_settlement", "population", S.ONTOLOGY + "populationTotal",
            S.XSD_INTEGER) in pms
    assert ("Infobox_settlement", "located_in", S.ONTOLOGY + "isPartOf",
            "object") in pms
    # unknown ontology property falls back to a plain literal
    assert ("Infobox_settlement", "motto", S.ONTOLOGY + "motto",
            S.XSD_STRING) in pms
    assert ("Infobox_company", "website", S.ONTOLOGY + "homepage",
            "object") in pms


def test_ontology_xml_loader_on_reference_file():
    """The loader digests the reference repo's REAL ontology.xml
    (/root/reference/ontology.xml, 2264 OntologyProperty pages)."""
    import os

    import pytest

    from distributed_extraction_framework_spark import schema as S
    from distributed_extraction_framework_spark.operators.mapping import (
        parse_ontology_xml,
    )

    path = "/root/reference/ontology.xml"
    if not os.path.exists(path):
        pytest.skip("reference ontology.xml not available")
    ranges = parse_ontology_xml(path)
    assert len(ranges) > 1000
    assert ranges.get("birthPlace") == "object"
    assert ranges.get("populationTotal", "").startswith(S.XSD)


def test_mapping_extractor(spark, pages_df):
    tc, pm = mapping_tables(spark)
    quads = mapping_extract(pages_df, tc, pm).cache()
    by_ds = {
        r["dataset"]: r["count"]
        for r in quads.groupBy("dataset").count().collect()
    }
    assert by_ds.get("instance_types", 0) > 0
    assert by_ds.get("mappingbased_objects", 0) > 0
    assert by_ds.get("mappingbased_literals", 0) > 0

    types = quads.filter(F.col("dataset") == "instance_types").collect()
    assert all(r["pred"].endswith("#type") for r in types)
    assert all(r["obj"].startswith("http://kg.example.org/ontology/") for r in types)

    lits = quads.filter(F.col("dataset") == "mappingbased_literals")
    pop = lits.filter(F.col("pred").endswith("populationTotal")).collect()
    assert pop and all(r["obj"].replace("-", "").isdigit() for r in pop)
    assert all(r["datatype"].endswith("integer") for r in pop)
    # comma-stripping applied (synth writes '12,345'-style populations)
    assert not any("," in r["obj"] for r in pop)

    objs = quads.filter(F.col("dataset") == "mappingbased_objects")
    located = objs.filter(F.col("pred").endswith("isPartOf")).collect()
    assert located and all("/resource/" in r["obj"] for r in located)


def test_mapping_plan_is_broadcast(spark, pages_df):
    tc, pm = mapping_tables(spark)
    plan = (
        mapping_extract(pages_df, tc, pm)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_conditional_mapping_dispatch(spark):
    """Published ConditionalMapping semantics: FIRST matching condition in
    listed order types the page; isSet/equals/contains/otherwise all
    exercised, plus units datatype guessing on the widened unit table."""
    from distributed_extraction_framework_spark import schema as S
    from distributed_extraction_framework_spark.operators.mapping import (
        CONDITION_SCHEMA,
        mapping_extract,
    )

    mk = "{{{{Infobox building | name = {n} {extra}}}}}"
    rows = [
        ("B1", mk.format(n="B1", extra="| type = Church ")),          # equals (ci)
        ("B2", mk.format(n="B2", extra="| height = 300 m ")),         # isSet
        ("B3", mk.format(n="B3", extra="| type = large chapel x ")),  # contains
        ("B4", mk.format(n="B4", extra="")),                          # otherwise
        # equals beats the later isSet: first match wins
        ("B5", mk.format(n="B5", extra="| type = church | height = 10 m ")),
    ]
    pages = spark.createDataFrame(
        [(f"https://en.pages.example.org/wiki/{t}", None, None, txt, "en")
         for t, txt in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    conds = spark.createDataFrame(
        [
            ("Infobox_building", 0, "type", "equals", "church", S.ONTOLOGY + "Church"),
            ("Infobox_building", 1, "height", "isSet", "", S.ONTOLOGY + "Skyscraper"),
            ("Infobox_building", 2, "type", "contains", "chapel", S.ONTOLOGY + "Chapel"),
            ("Infobox_building", 3, "", "otherwise", "", S.ONTOLOGY + "Building"),
        ],
        CONDITION_SCHEMA,
    )
    tc = spark.createDataFrame([("Infobox_other", S.ONTOLOGY + "Other")],
                               "template string, onto_class string")
    pm = spark.createDataFrame(
        [("Infobox_building", "height", S.ONTOLOGY + "height", S.XSD_DOUBLE)],
        "template string, key string, onto_pred string, range string",
    )
    quads = mapping_extract(pages, tc, pm, conditions=conds)
    types = {r["subj"].rsplit("/", 1)[1]: r["obj"].rsplit("/", 1)[1]
             for r in quads.filter(F.col("dataset") == "instance_types").collect()}
    assert types == {"B1": "Church", "B2": "Skyscraper", "B3": "Chapel",
                     "B4": "Building", "B5": "Church"}


def test_infobox_unit_datatypes_widened(spark):
    """The widened ParserUtils-style unit table: suffix-carrying values get
    the unit datatype URI and the numeric part as the object."""
    from distributed_extraction_framework_spark import schema as S

    cases = {
        "area": ("510.07 mi2", "squareMile", "510.07"),
        "speed": ("88 km/h", "kilometrePerHour", "88"),
        "mass": ("1,234 lb", "pound", "1234"),
        "depth": ("10 ft", "foot", "10"),
        "len": ("42 km", "kilometre", "42"),
        "dur": ("90 min", "minute", "90"),
    }
    box = " ".join(f"| {k} = {v[0]}" for k, v in cases.items())
    pages = spark.createDataFrame(
        [("https://en.pages.example.org/wiki/U1", None, None,
          "{{Infobox thing | name = U1 " + box + "}}", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    quads = extract(pages, extractors=["infobox_properties"])
    got = {r["pred"].rsplit("/", 1)[1]: (r["obj"], r["datatype"])
           for r in quads.collect()}
    for k, (_, unit_name, num) in cases.items():
        obj, dt = got[k]
        assert obj == num, (k, obj)
        assert dt == S.DATATYPE_NS + unit_name, (k, dt)


ONTOLOGY_CLASSES_XML = """<?xml version="1.0" encoding="UTF-8"?>
<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.8/">
<page><title>OntologyClass:Settlement</title><ns>200</ns><id>21</id>
<revision><id>31</id><text>{{Class
| rdfs:subClassOf = PopulatedPlace
}}</text></revision></page>
<page><title>OntologyClass:PopulatedPlace</title><ns>200</ns><id>22</id>
<revision><id>32</id><text>{{Class
| rdfs:subClassOf = Place
}}</text></revision></page>
<page><title>OntologyClass:Place</title><ns>200</ns><id>23</id>
<revision><id>33</id><text>{{Class
| rdfs:subClassOf = owl:Thing, schema:Place
}}</text></revision></page>
</mediawiki>
"""


def test_parse_ontology_classes(tmp_path):
    from distributed_extraction_framework_spark import schema as S
    from distributed_extraction_framework_spark.operators.mapping import (
        OWL_THING,
        parse_ontology_classes,
    )

    p = tmp_path / "ontology.xml"
    p.write_text(ONTOLOGY_CLASSES_XML)
    edges = set(parse_ontology_classes(str(p)))
    O = S.ONTOLOGY
    # external-vocabulary parent (schema:Place) skipped; owl:Thing mapped
    assert edges == {
        (O + "Settlement", O + "PopulatedPlace"),
        (O + "PopulatedPlace", O + "Place"),
        (O + "Place", OWL_THING),
    }


def test_instance_types_transitive(spark, tmp_path, pages_df):
    """The published instance-types-transitive dataset: every STRICT
    ancestor of the direct class, deduplicated across DAG paths."""
    from distributed_extraction_framework_spark import schema as S
    from distributed_extraction_framework_spark.operators.mapping import (
        OWL_THING,
        instance_types_transitive,
        mapping_extract,
        mapping_tables,
        subclass_edges,
    )

    p = tmp_path / "ontology.xml"
    p.write_text(ONTOLOGY_CLASSES_XML)
    O = S.ONTOLOGY
    edges = subclass_edges(
        spark,
        edges=[(O + "Settlement", O + "Locality"), (O + "Locality", O + "Place")],
        ontology_path=str(p),
    )

    tc, pm = mapping_tables(
        spark, template_classes=[("Infobox_settlement", O + "Settlement")]
    )
    quads = mapping_extract(pages_df, tc, pm)
    direct = quads.filter(F.col("dataset") == "instance_types")
    n_direct = direct.count()
    assert n_direct > 0

    tt = instance_types_transitive(quads, edges)
    rows = tt.collect()
    assert all(r["dataset"] == "instance_types_transitive" for r in rows)
    assert all(r["pred"] == S.RDF_TYPE for r in rows)
    # Settlement reaches {PopulatedPlace, Locality, Place, owl:Thing}:
    # 4 strict ancestors per typed subject, multi-path Place deduplicated
    per_subj = {}
    for r in rows:
        per_subj.setdefault(r["subj"], set()).add(r["obj"])
    assert len(per_subj) == direct.select("subj").distinct().count()
    expect = {O + "PopulatedPlace", O + "Locality", O + "Place", OWL_THING}
    assert all(objs == expect for objs in per_subj.values())


def test_direct_mapping_literals_fks_and_nulls(spark):
    import datetime

    from distributed_extraction_framework_spark import schema as S
    from distributed_extraction_framework_spark.sources.relational import (
        direct_map,
    )

    df = spark.createDataFrame(
        [
            (1, "Ada", 10, True, datetime.date(2020, 1, 2),
             datetime.datetime(2020, 1, 2, 3, 4, 5)),
            (2, None, None, False, None, None),   # nulls emit nothing
        ],
        "id int, name string, dept int, active boolean, d date, ts timestamp",
    )
    base = "http://x/"
    out = direct_map(df, "emp", pk="id", base=base,
                     fks={"dept": ("dept", "dept_id")})
    got = {
        (r["subj"], r["pred"]): (r["obj"], r["datatype"])
        for r in out.collect()
    }
    s1 = base + "emp/id=1"
    assert got[(s1, base + "emp#id")] == ("1", S.XSD_INTEGER)
    assert got[(s1, base + "emp#name")] == ("Ada", None)  # plain literal
    assert got[(s1, base + "emp#ref-dept")] == (base + "dept/dept_id=10", None)
    assert got[(s1, base + "emp#active")] == ("true", S.XSD + "boolean")
    assert got[(s1, base + "emp#d")] == ("2020-01-02", S.XSD_DATE)
    assert got[(s1, base + "emp#ts")] == ("2020-01-02T03:04:05", S.XSD_DATETIME)
    assert got[(s1, S.RDF_TYPE)] == (base + "emp", None)
    # row 2: only id, active, and the type triple survive the null filter
    s2 = base + "emp/id=2"
    row2 = {p for (s, p) in got if s == s2}
    assert row2 == {base + "emp#id", base + "emp#active", S.RDF_TYPE}


def test_direct_mapping_composite_key(spark):
    from distributed_extraction_framework_spark.sources.relational import (
        direct_map,
    )

    df = spark.createDataFrame([(1, 2, "v")], "a int, b int, c string")
    out = direct_map(df, "t", pk=["a", "b"], base="http://x/")
    assert out.first()["subj"] == "http://x/t/a=1;b=2"


def test_direct_mapping_null_pk_and_iri_encoding(spark):
    """Rows with a NULL pk emit nothing (no NULL-subject triples), and
    values embedding ';'/'='/' ' percent-encode so distinct composite
    keys cannot collide (code-review r5 wave-4 #3/#8)."""
    from distributed_extraction_framework_spark.sources.relational import (
        direct_map,
    )

    df = spark.createDataFrame(
        [("x;b=1", "2", "v1"), ("x", "1;b=2", "v2"), (None, "9", "v3"),
         ("New York", "1", "v4")],
        "a string, b string, val string",
    )
    out = direct_map(df, "t", pk=["a", "b"], base="http://e/")
    subs = {r["subj"] for r in out.collect()}
    assert None not in subs
    assert not any(r["subj"] is None for r in out.collect())
    # the two ;=-bearing rows stay DISTINCT subjects
    assert "http://e/t/a=x%3Bb%3D1;b=2" in subs
    assert "http://e/t/a=x;b=1%3Bb%3D2" in subs
    assert "http://e/t/a=New%20York;b=1" in subs
    # null-pk row contributed nothing at all
    assert not any(r["obj"] == "v3" for r in out.collect())
