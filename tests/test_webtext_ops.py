"""Webtext-side ops: JSON-LD extraction, XSD literal canonicalization,
unicode normalization, sentence stats, bigram-LM scoring, duplicate-span
census."""

from __future__ import annotations

import math

from distributed_extraction_framework_spark.functions.text import sentence_stats
from distributed_extraction_framework_spark.operators.curation import (
    bigram_lm_scores,
)
from distributed_extraction_framework_spark.operators.dedup import (
    duplicate_span_stats,
)
from distributed_extraction_framework_spark.operators.literals import (
    XSD,
    canonicalize_literals,
)
from distributed_extraction_framework_spark.operators.scrub import (
    normalize_unicode,
)
from distributed_extraction_framework_spark.operators.structured_data import (
    RDF_TYPE,
    extract_jsonld,
)


def _jsonld(body: str, attrs: str = ' type="application/ld+json"') -> str:
    return f"<script{attrs}>{body}</script>"


def test_extract_jsonld_flattening(spark):
    rows = [
        # nested bnode + array + number + bool + null + ignored @context
        (0, "<html>" + _jsonld(
            '{"@context":"https://schema.org","@id":"https://e/1",'
            '"@type":"Article","name":"N","n":3,"ok":true,"skip":null,'
            '"tags":["a","b"],"author":{"name":"A"}}') + "</html>"),
        # top-level array + @graph hoisting + bnode-rooted node
        (1, _jsonld('[{"@type":"T1","x":"1"},'
                    '{"@graph":[{"@id":"https://e/2","y":"2"}],"z":"3"}]')),
        # broken JSON skipped; later valid block still parses (block idx 1)
        (2, _jsonld("{nope") + _jsonld('{"@id":"https://e/3","k":"v"}')),
        # attribute order / case / quote variety
        (3, "<SCRIPT async TYPE='application/ld+json'>"
            '{"@id":"https://e/4","w":"q"}</SCRIPT>'),
        # a page with no block at all never reaches Python
        (4, "<html><script>var x = 1;</script></html>"),
    ]
    df = spark.createDataFrame(rows, ["page_id", "html"])
    got = {
        (r["id"], r["subj"], r["pred"], r["obj"], r["obj_kind"])
        for r in extract_jsonld(df).collect()
    }
    assert (0, "https://e/1", RDF_TYPE, "Article", "uri") in got
    assert (0, "https://e/1", "name", "N", "literal") in got
    assert (0, "https://e/1", "n", "3", "literal") in got
    assert (0, "https://e/1", "ok", "true", "literal") in got
    assert (0, "https://e/1", "tags", "a", "literal") in got
    assert (0, "https://e/1", "tags", "b", "literal") in got
    assert (0, "https://e/1", "author", "_:b0_0_0", "bnode") in got
    assert (0, "_:b0_0_0", "name", "A", "literal") in got
    assert not any(p == "skip" for (_, _, p, _, _) in got)  # null dropped
    assert not any(o == "https://schema.org" for (_, _, _, o, _) in got)

    # array + @graph: T1 node is the first bnode, the @graph carrier the
    # second; the hoisted member keeps its @id
    assert (1, "_:b1_0_0", RDF_TYPE, "T1", "uri") in got
    assert (1, "_:b1_0_0", "x", "1", "literal") in got
    assert (1, "_:b1_0_1", "z", "3", "literal") in got
    assert (1, "https://e/2", "y", "2", "literal") in got

    assert (2, "https://e/3", "k", "v", "literal") in got
    assert sum(1 for t in got if t[0] == 2) == 1  # broken block contributed 0
    assert (3, "https://e/4", "w", "q", "literal") in got
    assert not any(t[0] == 4 for t in got)


def test_canonicalize_literals_rules(spark):
    cases = [
        # (raw, datatype suffix, expected)
        ("+007", "integer", "7"),
        (" -042 ", "long", "-42"),
        ("+00", "integer", "0"),
        ("-0", "int", "0"),
        ("0", "integer", "0"),
        ("12", "integer", "12"),
        ("abc", "integer", "abc"),          # invalid lexical: untouched
        ("TRUE", "boolean", "true"),
        ("False", "boolean", "false"),
        ("1", "boolean", "true"),
        ("0", "boolean", "false"),
        ("yes", "boolean", "yes"),          # invalid lexical: untouched
        ("+03.50", "decimal", "3.5"),
        ("007", "decimal", "7.0"),
        (".5", "decimal", "0.5"),
        ("-.5", "decimal", "-0.5"),
        ("2.000", "decimal", "2.0"),
        ("100", "decimal", "100.0"),
        ("100.0", "decimal", "100.0"),
        ("12.", "decimal", "12.0"),
        ("-0.00", "decimal", "0.0"),
        ("1e3", "double", "1e3"),           # unhandled type: untouched
    ]
    df = spark.createDataFrame(
        [(i, raw, XSD + dt) for i, (raw, dt, _) in enumerate(cases)],
        ["i", "obj", "datatype"],
    )
    got = {r["i"]: r["obj"] for r in canonicalize_literals(df).collect()}
    for i, (raw, dt, want) in enumerate(cases):
        assert got[i] == want, f"{raw}^^{dt}: {got[i]!r} != {want!r}"


def test_canonicalize_literals_is_shuffle_free(spark):
    df = spark.createDataFrame(
        [(1, "+07", XSD + "integer")], ["i", "obj", "datatype"]
    )
    plan = canonicalize_literals(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_normalize_unicode(spark):
    rows = [
        (0, "cafe\u0301"),            # NFD → NFC rewrite
        (1, "caf\u00e9"),             # already NFC: untouched
        (2, "bad \ufffd byte \ufffd"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in normalize_unicode(df).collect()}
    assert got[0]["text"] == "caf\u00e9" and got[0]["was_changed"] is True
    assert got[1]["text"] == "caf\u00e9" and got[1]["was_changed"] is False
    assert got[0]["n_replacement"] == 0
    assert got[2]["n_replacement"] == 2 and got[2]["was_changed"] is False
    assert got[3]["text"] == "" and got[3]["n_replacement"] == 0


def test_sentence_stats(spark):
    rows = [
        (0, "One two. Three! Four five? trailing junk"),
        (1, "no terminator here at all"),
        (2, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in sentence_stats(df).collect()}
    # trimmed: "One two." (8), "Three!" (6), "Four five?" (10)
    assert got[0]["n_sentences"] == 3
    assert got[0]["max_sentence_chars"] == 10
    assert abs(got[0]["avg_sentence_chars"] - 8.0) < 1e-9
    assert got[1]["n_sentences"] == 0
    assert got[1]["avg_sentence_chars"] is None
    assert got[1]["max_sentence_chars"] == 0
    assert got[2]["n_sentences"] == 0


def test_sentence_stats_is_shuffle_free(spark):
    df = spark.createDataFrame([(0, "A. B!")], ["doc_id", "text"])
    plan = sentence_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bigram_lm_scores_hand_computed(spark):
    rows = [(0, "a b a b"), (1, "a b"), (2, "x")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    # bigrams: doc0 = (a,b),(b,a),(a,b); doc1 = (a,b); doc2 = none
    # c12: (a,b)=3, (b,a)=1; c1: a=3, b=1; V = |{a,b,x}| = 3
    p_ab = (3 + 1) / (3 + 3)
    p_ba = (1 + 1) / (1 + 3)
    want0 = round((2 * math.log(p_ab) + math.log(p_ba)) / 3, 6)
    want1 = round(math.log(p_ab), 6)
    assert got[0]["n_bigrams"] == 3 and got[0]["avg_logprob"] == want0
    assert got[1]["n_bigrams"] == 1 and got[1]["avg_logprob"] == want1
    assert got[2]["n_bigrams"] == 0 and got[2]["avg_logprob"] is None


def test_duplicate_span_stats_hand_computed(spark):
    rows = [(0, "a b c"), (1, "a b d"), (2, "x")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in duplicate_span_stats(df, n=2).collect()}
    # 2-grams: doc0 = "a b","b c"; doc1 = "a b","b d"; "a b" is corpus-dup
    assert (got[0]["n_spans"], got[0]["n_dup_spans"]) == (2, 1)
    assert abs(got[0]["dup_frac"] - 0.5) < 1e-9
    assert (got[1]["n_spans"], got[1]["n_dup_spans"]) == (2, 1)
    assert (got[2]["n_spans"], got[2]["n_dup_spans"]) == (0, 0)
    assert got[2]["dup_frac"] is None


def test_duplicate_span_shuffles_carry_digests_not_text(spark):
    """The census groupBy and the flag join must run on the 32-char md5,
    never the raw span text or the document body: no plan node below an
    Exchange may output a 'text' or '_span' column."""
    df = spark.createDataFrame(
        [(i, "w%d x y z a b c d e f" % (i % 3)) for i in range(20)],
        ["doc_id", "text"],
    )
    out = duplicate_span_stats(df, n=8)
    out.collect()  # finalize AQE
    plan = out._jdf.queryExecution().executedPlan().toString()
    ex = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert ex, "expected census/flag exchanges in the plan"
    for line in ex:
        assert ("_h#" in line) or ("doc_id#" in line), line
        assert "_span" not in line and "text#" not in line


def test_extract_html_links_and_meta(spark):
    from distributed_extraction_framework_spark.operators.structured_data import (
        extract_html_links,
        extract_meta_tags,
    )

    rows = [
        (0, '<a class="x" href="https://a.example/1">Click <b>here</b></a>'
            "<a href='https://b.example/2'>two</a>"
            '<META property="og:title" content="T1">'
            "<meta content='D1' name='description'>"),
        (1, None),                       # null html: no rows, no crash
        (2, "<p>no links or meta</p>"),
    ]
    df = spark.createDataFrame(rows, ["page_id", "html"])
    links = {(r["id"], r["href"], r["anchor"])
             for r in extract_html_links(df).collect()}
    assert links == {
        (0, "https://a.example/1", "Click here"),  # inner tags stripped
        (0, "https://b.example/2", "two"),
    }
    metas = {(r["id"], r["key"], r["content"])
             for r in extract_meta_tags(df).collect()}
    assert metas == {
        (0, "og:title", "T1"),          # property= before content=
        (0, "description", "D1"),       # content= before name=
    }


def test_html_extractors_are_shuffle_free(spark):
    from distributed_extraction_framework_spark.operators.structured_data import (
        extract_html_links,
        extract_meta_tags,
    )

    df = spark.createDataFrame([(0, "<a href='u'>t</a>")], ["page_id", "html"])
    for op in (extract_html_links, extract_meta_tags):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_html_extractors_accept_binary_html(spark):
    """The crawl schema (BASELINE input_hint) carries html as BINARY —
    all three HTML extractors must take it without a Python decode."""
    from distributed_extraction_framework_spark.operators.structured_data import (
        extract_html_links,
        extract_jsonld,
        extract_meta_tags,
    )

    html = ('<a href="https://u/1">t</a>'
            '<meta property="og:k" content="v">'
            '<script type="application/ld+json">{"@id":"https://s","p":"o"}'
            "</script>").encode("utf-8")
    df = spark.createDataFrame([(0, html)], "page_id bigint, html binary")
    assert extract_html_links(df).collect()[0]["href"] == "https://u/1"
    assert extract_meta_tags(df).collect()[0]["key"] == "og:k"
    assert extract_jsonld(df).collect()[0]["subj"] == "https://s"


def test_html_extractors_survive_malformed_utf8(spark):
    """ANSI mode makes decode() throw on bad bytes; the binary-html path
    must tolerate mojibake pages (cast, not decode) — one hostile page
    must never fail the job."""
    from distributed_extraction_framework_spark.operators.structured_data import (
        extract_html_links,
        extract_jsonld,
        extract_meta_tags,
    )

    bad = b'<a href="https://u/1">t</a> \xff\xfe bad bytes'
    df = spark.createDataFrame([(0, bad)], "page_id bigint, html binary")
    assert extract_html_links(df).collect()[0]["href"] == "https://u/1"
    assert extract_meta_tags(df).count() == 0
    assert extract_jsonld(df).count() == 0


def test_extract_jsonld_nested_arrays_and_deep_nesting(spark):
    from distributed_extraction_framework_spark.operators.structured_data import (
        _flatten_block,
        extract_jsonld,
    )

    # nested lists distribute to leaves — no Python repr leaks
    html = (_jsonld('{"@id":"https://e/1","k":[["a","b"],["c"]],'
                    '"m":[{"x":"1"},["y"]]}'))
    df = spark.createDataFrame([(0, html)], ["page_id", "html"])
    got = {(r["pred"], r["obj"], r["obj_kind"])
           for r in extract_jsonld(df).collect()}
    assert ("k", "a", "literal") in got and ("k", "c", "literal") in got
    assert ("m", "y", "literal") in got
    assert ("m", "_:b0_0_0", "bnode") in got   # dict inside nested list
    assert not any(o.startswith("[") for (_, o, _) in got)

    # pathological nesting must SKIP (return []), never raise — the
    # guard wraps the whole parse+walk, so whichever side trips the
    # recursion limit first (frame accounting varies across Python
    # versions), the block is dropped and the job survives
    deep = '{"a":' * 400 + '"v"' + "}" * 400
    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(300)
    try:
        assert _flatten_block(deep, 0, 0) == []
    finally:
        sys.setrecursionlimit(old)


def test_web_page_triples_channels_and_roots(spark):
    from distributed_extraction_framework_spark.operators.structured_data import (
        web_page_triples,
    )

    html = ('<a href="https://out/1">link</a>'
            '<meta property="og:title" content="T">'
            '<script type="application/ld+json">'
            '{"@id":"https://e/1","author":{"name":"A"}}</script>'
            '<div itemscope itemid="https://e/md">'
            '<span itemprop="sku">S1</span></div>'
            '<span about="https://e/ra" property="https://p/t" '
            'content="C"></span>')
    df = spark.createDataFrame(
        [(0, "https://page/0", html), (1, "https://page/1", "<p>empty</p>")],
        ["page_id", "url", "html"],
    )
    got = {(r["subj"], r["pred"], r["obj"], r["obj_kind"])
           for r in web_page_triples(df).collect()}
    assert ("https://page/0", "links_to", "https://out/1", "uri") in got
    assert ("https://page/0", "og:title", "T", "literal") in got
    assert ("https://e/1", "author", "_:b0_0_0", "bnode") in got
    # has_entity anchors the ROOT node only — the author bnode is an
    # object of a parent link, so it must not get a provenance edge
    assert ("https://page/0", "has_entity", "https://e/1", "uri") in got
    assert ("https://page/0", "has_entity", "_:b0_0_0", "uri") not in got
    # the microdata channel contributes its triples AND its root edge
    assert ("https://e/md", "sku", "S1", "literal") in got
    assert ("https://page/0", "has_entity", "https://e/md", "uri") in got
    # the RDFa channel likewise
    assert ("https://e/ra", "https://p/t", "C", "literal") in got
    assert ("https://page/0", "has_entity", "https://e/ra", "uri") in got
    assert not any(s == "https://page/1" for (s, _, _, _) in got)


def test_label_propagation_two_triangles(spark):
    from distributed_extraction_framework_spark.operators.graph import (
        label_propagation,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"),
         ("d", "e"), ("e", "f"), ("d", "f"), ("c", "d")],
        ["src", "dst"],
    )
    got = {r["vertex"]: r["label"]
           for r in label_propagation(edges, rounds=4).collect()}
    # two triangles + a bridge: hand-propagated sync/min-tie-break rounds
    # converge to community 'a' = {a,b,c} and community 'c' = {d,e,f}
    assert got == {"a": "a", "b": "a", "c": "a",
                   "d": "c", "e": "c", "f": "c"}


def test_web_page_triples_bnode_root_and_keep_cols_guard(spark):
    import pytest

    from distributed_extraction_framework_spark.operators.structured_data import (
        extract_meta_tags,
        web_page_triples,
    )

    # a ROOT node without @id is a bnode — its has_entity edge must say so
    html = ('<script type="application/ld+json">'
            '{"@type":"WebSite","u":"v"}</script>')
    df = spark.createDataFrame([(0, "https://page/0", html)],
                               ["page_id", "url", "html"])
    got = {(r["pred"], r["obj"], r["obj_kind"])
           for r in web_page_triples(df).collect()}
    assert ("has_entity", "_:b0_0_0", "bnode") in got

    # keep_cols colliding with output names fails fast, not ambiguously
    with pytest.raises(ValueError, match="keep_cols collide"):
        extract_meta_tags(df.withColumnRenamed("url", "key"),
                          keep_cols=("key",))
