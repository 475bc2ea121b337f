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

    tc, pm = load_mappings_xml(spark, str(mp), str(op))
    tcs = {(r["template"], r["onto_class"]) for r in tc.collect()}
    assert tcs == {
        ("Infobox_settlement", S.ONTOLOGY + "Settlement"),
        ("Infobox_company", S.ONTOLOGY + "Company"),
    }
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
