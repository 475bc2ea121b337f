"""Synthetic source: determinism + the byte-identical html→text invariant
(BASELINE.json input_hint)."""

from distributed_extraction_framework_spark.functions.wikitext import html_to_text_kernel
from distributed_extraction_framework_spark.sources.synth import local_pages, make_page


def test_generator_deterministic():
    a = [make_page(i, 400) for i in range(0, 400, 37)]
    b = [make_page(i, 400) for i in range(0, 400, 37)]
    assert a == b


def test_distributed_matches_local(spark, pages_df, pages_local):
    rows = {r["url"]: r for r in pages_df.collect()}
    assert len(rows) == len(pages_local)
    for p in pages_local:
        r = rows[p["url"]]
        assert r["text"] == p["text"]
        assert bytes(r["html"]) == p["html"]
        assert r["lang"] == p["lang"]


def test_html_to_text_byte_identity(pages_local):
    for p in pages_local:
        assert html_to_text_kernel(p["html"]) == p["text"]


def test_html_to_text_udf(spark, pages_df):
    from pyspark.sql import functions as F

    from distributed_extraction_framework_spark.functions.wikitext import (
        make_html_to_text_udf,
    )

    udf = make_html_to_text_udf()
    bad = pages_df.withColumn("derived", udf(F.col("html"))).filter(
        ~(F.col("derived").eqNullSafe(F.col("text")))
    )
    assert bad.count() == 0


def test_construct_coverage(pages_local):
    """The corpus samples every construct the extractor suite consumes."""
    alltext = "\n".join(p["text"] for p in pages_local)
    assert "#REDIRECT" in alltext or "#redirect" in alltext
    assert "{{Infobox" in alltext
    assert "{{Coord|" in alltext
    assert "[[Category:" in alltext
    assert "[[de:" in alltext
    assert "[http://" in alltext
    assert "{{Disambiguation}}" in alltext
    langs = {p["lang"] for p in pages_local}
    assert {"en", "de", "fr"} <= langs
    urls = [p["url"] for p in pages_local]
    assert len(set(urls)) == len(urls)
