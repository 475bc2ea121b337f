"""N-Triples reader (sources/ntriples.py): spec parsing, escape
round-trip with the sink renderer, corrupt-line surfacing."""

import pytest

from distributed_extraction_framework_spark.plans.materialize import (
    render_ntriples,
)
from distributed_extraction_framework_spark.sources.ntriples import (
    parse_ntriples_lines,
    read_ntriples,
)


def _lines(spark, *lines):
    return spark.createDataFrame([(l,) for l in lines], "line string")


def test_parse_statement_forms(spark):
    df = parse_ntriples_lines(_lines(
        spark,
        "<http://a> <http://p> <http://b> .",
        '<http://a> <http://p> "plain" .',
        '<http://a> <http://p> "hallo"@de .',
        '<http://a> <http://p> "42"^^<http://www.w3.org/2001/XMLSchema#int> .',
        "<http://a> <http://p> <http://b> <http://g> .",   # N-Quads
        "# a comment",
        "   ",
    ))
    rows = df.collect()
    assert len(rows) == 5  # comment + blank dropped
    assert all(r["_corrupt"] is None for r in rows)
    by_obj = {r["obj"]: r for r in rows}
    assert by_obj["hallo"]["lang"] == "de"
    assert by_obj["42"]["datatype"].endswith("#int")
    quad = [r for r in rows if r["context"] is not None]
    assert len(quad) == 1 and quad[0]["context"] == "http://g"


def test_corrupt_lines_surfaced_not_dropped(spark):
    df = parse_ntriples_lines(_lines(
        spark,
        "<http://a> <http://p> <http://b> .",
        "this is not a statement",
        "<http://a> <http://p> .",   # missing object
    ))
    corrupt = [r["_corrupt"] for r in df.collect() if r["_corrupt"]]
    assert len(corrupt) == 2
    assert df.filter("_corrupt IS NULL").count() == 1


def test_escape_roundtrip_with_renderer(spark):
    """Sink-escaped literals parse back byte-identical — including the
    adversarial backslash-n sequence that naive unescape orders break."""
    nasty = ['tab\there', 'quote"inside', "back\\slash", "a\\nb", "nl\nend"]
    quads = spark.createDataFrame(
        [("http://s", "http://p", x, None, None, "d") for x in nasty],
        "subj string, pred string, obj string, lang string,"
        " datatype string, dataset string",
    )
    lines = render_ntriples(quads).select("line")
    back = parse_ntriples_lines(lines)
    assert back.filter("_corrupt IS NOT NULL").count() == 0
    assert {r["obj"] for r in back.collect()} == set(nasty)


def test_read_ntriples_from_file(spark, tmp_path):
    p = tmp_path / "dump.nt"
    p.write_text(
        "# header\n"
        "<http://a> <http://p> <http://b> .\n"
        '<http://a> <http://name> "A" .\n'
    )
    df = read_ntriples(spark, str(p))
    assert df.count() == 2
    assert {r["obj"] for r in df.collect()} == {"http://b", "A"}


def test_long_literal_no_stack_overflow(spark):
    """Multi-KB literals must parse — the naive (?:[^"\\]|\\.)* literal
    regex recurses per character in Java and StackOverflows here."""
    big = ("word " * 4000).strip()          # ~20 KB plain literal
    esc = ('x\\"y ' * 2000).strip()         # ~10 KB with 2000 escapes
    df = parse_ntriples_lines(_lines(
        spark,
        f'<http://a> <http://p> "{big}" .',
        f'<http://a> <http://p> "{esc}" .',
    ))
    rows = {r["obj"] for r in df.collect()}
    assert big in rows and ('x"y ' * 2000).strip() in rows


def test_full_extractor_output_roundtrips_exactly(spark):
    """Every dataset the extraction suite emits survives render→parse
    byte-identically (incl. implicit rdf:langString reconstruction)."""
    from distributed_extraction_framework_spark.operators.extractors import (
        extract,
    )
    from distributed_extraction_framework_spark.sources.synth import synth_pages

    quads = extract(synth_pages(spark, 100))
    back = parse_ntriples_lines(render_ntriples(quads).select("line"))
    assert back.filter("_corrupt IS NOT NULL").count() == 0
    cols = ["subj", "pred", "obj", "lang", "datatype"]
    orig = {tuple(r) for r in quads.select(*cols).distinct().collect()}
    rt = {tuple(r) for r in back.select(*cols).distinct().collect()}
    assert orig == rt
