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
