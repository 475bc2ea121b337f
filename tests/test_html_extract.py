"""Round-5 late-wave HTML extractors: microdata triples, table cell
grids, main-content (boilerplate) segmentation."""

from __future__ import annotations

from distributed_extraction_framework_spark.operators.microdata import (
    extract_microdata,
)
from distributed_extraction_framework_spark.operators.structured_data import (
    RDF_TYPE,
    extract_tables,
    main_content,
)

_MD_PAGE = """<html><body>
<div itemscope itemtype="https://schema.org/Article" itemid="https://e/a7">
  <h1 itemprop="headline">Big   <b>bold</b> news</h1>
  <meta itemprop="wordCount" content="42">
  <a itemprop="url" href="https://e/a7.html">link</a>
  <time itemprop="datePublished" datetime="2026-01-02">Jan 2</time>
  <img itemprop="image" src="https://e/i.png">
  <span itemprop="author" itemscope itemtype="https://schema.org/Person">
    by <span itemprop="name">Ada</span>
  </span>
  <span itemprop="empty"/>
</div>
<p itemprop="orphan">no enclosing scope</p>
<div itemscope><span itemprop="x">second scope</span></div>
<script>var itemscope = '<span itemprop="fake">unreachable</span>';</script>
</body></html>"""


def test_extract_microdata_subset(spark):
    df = spark.createDataFrame(
        [(9, _MD_PAGE), (10, "<html><p>plain page</p></html>")],
        ["page_id", "html"],
    )
    got = {
        (r["id"], r["subj"], r["pred"], r["obj"], r["obj_kind"])
        for r in extract_microdata(df).collect()
    }
    a = "https://e/a7"
    assert (9, a, RDF_TYPE, "https://schema.org/Article", "uri") in got
    # text content: inline tags dropped, whitespace collapsed
    assert (9, a, "headline", "Big bold news", "literal") in got
    # value resolution order: content > url attr > datetime > text
    assert (9, a, "wordCount", "42", "literal") in got
    assert (9, a, "url", "https://e/a7.html", "uri") in got
    assert (9, a, "datePublished", "2026-01-02", "literal") in got
    assert (9, a, "image", "https://e/i.png", "uri") in got
    # nested itemscope: parent link + deterministic bnode label
    assert (9, a, "author", "_:m9_0", "bnode") in got
    assert (9, "_:m9_0", RDF_TYPE, "https://schema.org/Person", "uri") in got
    assert (9, "_:m9_0", "name", "Ada", "literal") in got
    # self-closed itemprop with no value source -> empty literal
    assert (9, a, "empty", "", "literal") in got
    # itemid-less scope after one bnode -> seq 1
    assert (9, "_:m9_1", "x", "second scope", "literal") in got
    # orphan itemprop (no open scope) and script bodies are ignored
    assert not [t for t in got if t[2] in ("orphan", "fake")]
    # page without 'itemscope' never reaches Python and emits nothing
    assert not [t for t in got if t[0] == 10]


def test_extract_microdata_multi_prop_and_hostility(spark):
    rows = [
        # space-separated itemprop fans out; itemref is ignored;
        # unclosed elements implicitly close at EOF
        (0, '<div itemscope><span itemprop="a b">v</span>'
            '<i itemprop="tail">end'),
        # stray close tag + '>' inside a quoted attribute value
        (1, '</div><div itemscope>'
            '<meta itemprop="k" content="x > y"></div>'),
    ]
    df = spark.createDataFrame(rows, ["page_id", "html"])
    got = {
        (r["id"], r["subj"], r["pred"], r["obj"])
        for r in extract_microdata(df).collect()
    }
    assert (0, "_:m0_0", "a", "v") in got
    assert (0, "_:m0_0", "b", "v") in got
    assert (0, "_:m0_0", "tail", "end") in got
    assert (1, "_:m1_0", "k", "x > y") in got


_TBL_PAGE = """<div><table class="x">
<tr><th>name</th><th>qty</th></tr>
<tr><td><b>ant</b></td><td> 3 </td></tr>
</table>
noise
<TABLE><tr><td>solo</td></tr></TABLE></div>"""


def test_extract_tables_grid(spark):
    df = spark.createDataFrame(
        [(1, _TBL_PAGE), (2, "<p>no tables</p>")], ["page_id", "html"])
    rows = {
        (r["id"], r["table_idx"], r["row_idx"], r["col_idx"],
         r["is_header"], r["cell"])
        for r in extract_tables(df).collect()
    }
    assert rows == {
        (1, 0, 0, 0, True, "name"),
        (1, 0, 0, 1, True, "qty"),
        (1, 0, 1, 0, False, "ant"),   # inner tags stripped
        (1, 0, 1, 1, False, "3"),     # trimmed
        (1, 1, 0, 0, False, "solo"),  # case-insensitive TABLE
    }


def test_main_content_density_rule(spark):
    body = (
        "<div>" + ("real content sentence. " * 4) + "</div>"
        '<div><a href="/a">nav</a> <a href="/b">menu</a></div>'
        "<p>tiny</p>"
        "<div>" + ("mixed " * 10)
        + '<a href="/c">one link inside long text</a></div>'
    )
    df = spark.createDataFrame([(5, body)], ["page_id", "html"])
    out = {r["text"]: r for r in main_content(df).collect()}
    long_block = ("real content sentence. " * 4).strip()
    assert out[long_block]["kept"] is True
    assert out[long_block]["link_density"] == 0.0
    assert out["nav menu"]["kept"] is False            # link-dense chrome
    assert out["nav menu"]["link_density"] > 0.4
    assert out["tiny"]["kept"] is False                # below min_chars
    mixed = [r for t, r in out.items() if t.startswith("mixed")][0]
    assert mixed["kept"] is True                       # low link density
    assert 0.0 < mixed["link_density"] <= 0.4
    # every block scored, none silently dropped except empties
    assert len(out) == 4


def test_html_extractors_shuffle_free_and_prefiltered(spark):
    df = spark.createDataFrame([(0, _TBL_PAGE)], ["page_id", "html"])
    for op in (extract_tables, main_content):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
    # microdata: no shuffle, and the itemscope prefilter is in the plan
    # BEFORE the Python stage (pages without markup never cross Arrow)
    plan = extract_microdata(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan
    assert "itemscope" in plan
    # tree printing is top-down (children BELOW parents): the filter
    # being downstream in the string means upstream in execution
    assert plan.index("itemscope") > plan.index("ArrowEvalPython")


def test_microdata_binary_html(spark):
    df = spark.createDataFrame(
        [(3, bytearray(_MD_PAGE, "utf-8"))], "page_id long, html binary")
    got = extract_microdata(df).collect()
    assert any(r["pred"] == "headline" for r in got)


def test_extract_link_rels(spark):
    from distributed_extraction_framework_spark.operators.structured_data import (
        extract_link_rels,
    )

    html = (
        '<link rel="canonical" href="https://e/c">'
        '<link href="https://e/de" hreflang="DE" REL="alternate">'
        "<link rel='Alternate NOFOLLOW' href='https://e/x'>"
        '<link rel="stylesheet">'           # no href -> dropped
        '<link href="https://e/orphan">'    # no rel  -> dropped
    )
    df = spark.createDataFrame([(7, html)], ["page_id", "html"])
    got = {(r["rel"], r["href"], r["hreflang"])
           for r in extract_link_rels(df).collect()}
    assert got == {
        ("canonical", "https://e/c", ""),
        ("alternate", "https://e/de", "de"),        # order + case
        ("alternate nofollow", "https://e/x", ""),  # multi-valued rel
    }


_T3_PAGE = (
    "<table><tr><th>name</th><th><i>qty</i></th></tr>"
    "<tr><td><b>ant</b></td><td> 3 </td><td>ragged</td></tr>"
    "<tr><td>bee</td></tr></table>"
    "<table><tr><td>no</td><td>header</td></tr><tr><td>x</td></tr></table>"
    "<TABLE><TR><TH>k</TH></TR><TR><TD>v</TD></TR></TABLE>"
)


def test_table_triples_header_keying(spark):
    from distributed_extraction_framework_spark.operators.structured_data import (
        table_triples,
    )

    df = spark.createDataFrame(
        [(1, "https://p/1", _T3_PAGE), (2, "https://p/2", "<p>none</p>")],
        ["page_id", "url", "html"],
    )
    got = {(r["subj"], r["pred"], r["obj"])
           for r in table_triples(df).collect()}
    assert got == {
        # table 0: th header keys both body rows; ragged cell dropped;
        # header tags stripped
        ("https://p/1#table0-row1", "name", "ant"),
        ("https://p/1#table0-row1", "qty", "3"),
        ("https://p/1#table0-row2", "name", "bee"),
        # table 1 (td first row) contributes nothing
        # table 2: case-insensitive tags
        ("https://p/1#table2-row1", "k", "v"),
    }


def test_table_triples_rowless_table_survives_ansi(spark):
    """A <table> block with zero <tr> rows must be dropped, not throw
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT under ANSI mode (code-review
    r5 #2) — one hostile page must never fail the job."""
    from distributed_extraction_framework_spark.operators.structured_data import (
        table_triples,
    )

    df = spark.createDataFrame(
        [(1, "https://p/1", "<table>junk no rows</table>"),
         (2, "https://p/2",
          "<table><tr><th>k</th></tr><tr><td>v</td></tr></table>")],
        ["page_id", "url", "html"],
    )
    got = {(r["subj"], r["pred"], r["obj"])
           for r in table_triples(df).collect()}
    assert got == {("https://p/2#table0-row1", "k", "v")}


def test_microdata_uppercase_attrs_pass_prefilter(spark):
    """HTML attr names are case-insensitive: <DIV ITEMSCOPE ...> must
    not be dropped by the prefilter (code-review r5 #8)."""
    html = ('<DIV ITEMSCOPE ITEMTYPE="https://schema.org/Thing" '
            'ITEMID="https://e/up"><span ITEMPROP="name">N</span></DIV>')
    df = spark.createDataFrame([(1, html)], ["page_id", "html"])
    got = {(r["subj"], r["pred"], r["obj"])
           for r in extract_microdata(df).collect()}
    assert ("https://e/up", "name", "N") in got


def test_new_extractors_shuffle_free(spark):
    from distributed_extraction_framework_spark.operators.structured_data import (
        extract_link_rels,
        table_triples,
    )

    df = spark.createDataFrame([(0, "https://p/0", _T3_PAGE)],
                               ["page_id", "url", "html"])
    for out in (extract_link_rels(df), table_triples(df)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan


_RDFA_PAGE = """<html vocab="https://schema.org/"
  prefix="dc: http://purl.org/dc/terms/ og: http://ogp.me/ns#"><body>
<div typeof="Article" resource="https://e/ra7">
  <h1 property="headline">Big   <b>bold</b> news</h1>
  <meta property="wordCount" content="42">
  <a property="url" href="https://e/ra7.html">link</a>
  <span property="dc:tag">graphs</span>
  <div property="author" typeof="Person"><span property="name">Ada</span></div>
  <span property="sameAs" resource="https://other/ra7"></span>
</div>
<p about="https://e/doc" typeof="Note" property="dc:title">The Doc</p>
<div typeof="Thing"><span property="x">orphanless</span></div>
<meta property="og:title" content="document-level: meta channel owns it">
<span property="orphan">no subject</span>
<script>var typeof_decoy = '<b property="fake">unreachable</b>';</script>
</body></html>"""


def test_extract_rdfa_subset(spark):
    from distributed_extraction_framework_spark.operators.rdfa import (
        extract_rdfa,
    )

    df = spark.createDataFrame(
        [(9, _RDFA_PAGE), (10, "<html><p>plain page</p></html>")],
        ["page_id", "html"],
    )
    got = {
        (r["id"], r["subj"], r["pred"], r["obj"], r["obj_kind"])
        for r in extract_rdfa(df).collect()
    }
    a, s = "https://e/ra7", "https://schema.org/"
    assert (9, a, RDF_TYPE, s + "Article", "uri") in got
    # vocab-resolved term; text content: tags dropped, ws collapsed
    assert (9, a, s + "headline", "Big bold news", "literal") in got
    # value resolution order: resource > href/src > content > text
    assert (9, a, s + "wordCount", "42", "literal") in got
    assert (9, a, s + "url", "https://e/ra7.html", "uri") in got
    assert (9, a, s + "sameAs", "https://other/ra7", "uri") in got
    # CURIE through the prefix map
    assert (9, a, "http://purl.org/dc/terms/tag", "graphs", "literal") in got
    # object chaining: property+typeof -> generated bnode
    assert (9, a, s + "author", "_:r9_0", "bnode") in got
    assert (9, "_:r9_0", RDF_TYPE, s + "Person", "uri") in got
    assert (9, "_:r9_0", s + "name", "Ada", "literal") in got
    # @about: subject for its own property AND its typeof
    assert (9, "https://e/doc", RDF_TYPE, s + "Note", "uri") in got
    assert (9, "https://e/doc", "http://purl.org/dc/terms/title",
            "The Doc", "literal") in got
    # hanging typeof -> generated subject, properties attach beneath it
    assert (9, "_:r9_1", RDF_TYPE, s + "Thing", "uri") in got
    assert (9, "_:r9_1", s + "x", "orphanless", "literal") in got
    # document-level og: meta and subject-less property are NOT emitted
    # (extract_meta_tags owns them); script bodies are stripped
    assert not [t for t in got
                if t[2] in ("http://ogp.me/ns#title", s + "orphan",
                            s + "fake", "orphan", "fake")]
    # page without subject markers never reaches Python
    assert not [t for t in got if t[0] == 10]


def test_extract_rdfa_scoping_and_hostility(spark):
    from distributed_extraction_framework_spark.operators.rdfa import (
        extract_rdfa,
    )

    rows = [
        # vocab/prefix restore on close: the second div has no vocab
        (0, '<div vocab="https://v1/" typeof="A"></div>'
            '<div typeof="https://v2/B" about="https://e/x">'
            '<span property="p">v</span></div>'),
        # stray close, unclosed at EOF, '>' in quoted attr
        (1, '</p><div typeof="T" about="https://e/y">'
            '<meta property="k" content="x > y"><i property="t">end'),
        # absolute-IRI tokens bypass vocab/prefix resolution
        (2, '<div vocab="https://v/" typeof="https://abs/T" '
            'about="_:b"><span property="dc:loose">u</span></div>'),
    ]
    df = spark.createDataFrame(rows, ["page_id", "html"])
    got = {
        (r["id"], r["subj"], r["pred"], r["obj"], r["obj_kind"])
        for r in extract_rdfa(df).collect()
    }
    assert (0, "_:r0_0", RDF_TYPE, "https://v1/A", "uri") in got
    # outer vocab restored (none) -> verbatim type, term property verbatim
    assert (0, "https://e/x", RDF_TYPE, "https://v2/B", "uri") in got
    assert (0, "https://e/x", "p", "v", "literal") in got
    assert (1, "https://e/y", "k", "x > y", "literal") in got
    assert (1, "https://e/y", "t", "end", "literal") in got
    assert (2, "_:b", RDF_TYPE, "https://abs/T", "uri") in got
    # unmapped CURIE prefix stays verbatim; bnode about kind
    assert (2, "_:b", "dc:loose", "u", "literal") in got


def test_rdfa_link_analytics_plan_shape(spark):
    from distributed_extraction_framework_spark.operators.rdfa import (
        extract_rdfa,
    )
    from distributed_extraction_framework_spark.operators.structured_data import (
        anchor_text_index,
        host_graph,
    )

    df = spark.createDataFrame(
        [(0, "https://s/a", '<a href="https://t/1">one</a>'
                            '<a href="/rel">two</a>')],
        ["page_id", "url", "html"],
    )
    # rdfa: prefilter + scan only — no exchange
    plan = extract_rdfa(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # host_graph / anchor_text_index: exactly the post-reduction
    # exchanges (1 for the hash agg; 2 incl. the window's) — the
    # map-side partial keeps shuffle volume at distinct-pair cardinality
    def final_plan(d):
        # the AQE string repeats the pre-runtime plan under
        # "== Initial Plan ==" — count exchanges in the final one only
        s = d._jdf.queryExecution().executedPlan().toString()
        return s.split("== Initial Plan ==")[0]

    hg = host_graph(df)
    hg.collect()
    hplan = final_plan(hg)
    assert hplan.count("Exchange") <= 1 and "partial_count" in hplan
    at = anchor_text_index(df)
    at.collect()
    aplan = final_plan(at)
    assert aplan.count("Exchange") <= 2 and "partial_count" in aplan
    assert {(r["src_host"], r["dst_host"], r["n_links"])
            for r in hg.collect()} == {("s", "t", 1), ("s", "s", 1)}
    assert {(r["href"], r["anchor"], r["n"], r["rank"])
            for r in at.collect()} == {("https://t/1", "one", 1, 1),
                                       ("/rel", "two", 1, 1)}


def test_html_table_cells_and_triples(spark):
    from distributed_extraction_framework_spark.operators.structured_data import (
        html_table_cells,
        html_table_triples,
    )

    html = (
        '<table class=x><TR><th>name</th><th>pop</th></tr>'
        "<tr><td> c1 </td><td><b>4 &amp; 2</b></td></tr>"
        "<tr><td>c2</td><td>9</td><td>extra</td></tr></table>"
        "<table><tr><td>a</td><td>b</td></tr></table>"
        "<table><tr><th>only-header</th></tr></table>"
        "<table>junk no rows</table>"
    )
    df = spark.createDataFrame(
        [(1, html), (2, "<p>no tables</p>"), (3, None)],
        ["page_id", "html"])
    cells = {(r.tbl, r.row, r.col, r.header, r.value, r.row_key)
             for r in html_table_cells(df).collect()}
    assert cells == {
        (0, 0, 0, "name", "c1", "c1"),
        (0, 0, 1, "pop", "4 & 2", "c1"),
        (0, 1, 0, "name", "c2", "c2"),
        (0, 1, 1, "pop", "9", "c2"),
        (0, 1, 2, "col2", "extra", "c2"),   # overflow → positional
        (1, 0, 0, "col0", "a", "a"),
        (1, 0, 1, "col1", "b", "a"),
    }
    trips = {(r.subj, r.pred, r.obj)
             for r in html_table_triples(df).collect()}
    # only header-named, col>0 cells become facts
    assert trips == {("c1", "pop", "4 & 2"), ("c2", "pop", "9")}
    # binary html column accepted (input_hint schema)
    bdf = spark.createDataFrame(
        [(1, html.encode())], "page_id int, html binary")
    assert html_table_cells(bdf).count() == 7


def test_html_table_plan_zero_shuffle(spark):
    from distributed_extraction_framework_spark.operators.structured_data import (
        html_table_triples,
    )

    df = spark.createDataFrame(
        [(0, "<table><tr><th>h</th></tr><tr><td>v</td></tr></table>")],
        ["page_id", "html"])
    plan = (html_table_triples(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan


def test_table_channel_mentions_and_facts(spark):
    from distributed_extraction_framework_spark.operators.structured_data import (
        web_page_triples,
    )

    html = (
        "<table><tr><th>k</th><th>v</th></tr>"
        "<tr><td>e1</td><td>a</td></tr>"
        "<tr><td>e1</td><td>b</td></tr>"       # same key → ONE mention
        "<tr><td></td><td>orphan</td></tr>"    # empty key → no fact
        "</table>"
        "<table><tr><td>e1</td><td>pos</td></tr></table>"  # headerless
    )
    df = spark.createDataFrame([(0, "https://p/0", html)],
                               ["page_id", "url", "html"])
    got = {(r.subj, r.pred, r.obj, r.obj_kind)
           for r in web_page_triples(df).collect()}
    assert got == {
        ("https://p/0", "mentions", "e1", "mention"),
        ("e1", "v", "a", "literal"),
        ("e1", "v", "b", "literal"),
    }
    # tables=False switches the channel off
    assert web_page_triples(df, tables=False).count() == 0


def test_table_subject_detection_and_fallback(spark):
    from distributed_extraction_framework_spark.operators.structured_data import (
        html_table_cells,
        table_column_profile,
        table_entity_facts,
        table_subject_columns,
    )

    html = (
        # rank-first: entity column is col 1
        "<table><tr><th>rank</th><th>name</th><th>pop</th></tr>"
        "<tr><td>1</td><td>oslo</td><td>7</td></tr>"
        "<tr><td>2</td><td>bergen</td><td>3</td></tr></table>"
        # all-numeric named columns: NO subject → no facts
        "<table><tr><th>a</th><th>b</th></tr>"
        "<tr><td>1</td><td>2</td></tr></table>"
    )
    df = spark.createDataFrame([(0, html)], ["page_id", "html"])
    cells = html_table_cells(df)
    subj = {(r.tbl, r.key_col, r.key_header)
            for r in table_subject_columns(
                table_column_profile(cells)).collect()}
    assert subj == {(0, 1, "name")}
    facts = {(r.subj, r.pred, r.obj)
             for r in table_entity_facts(cells).collect()}
    assert facts == {("oslo", "rank", "1"), ("oslo", "pop", "7"),
                     ("bergen", "rank", "2"), ("bergen", "pop", "3")}


def test_typed_table_facts_rules(spark):
    from distributed_extraction_framework_spark.operators.structured_data import (
        typed_table_facts,
    )

    df = spark.createDataFrame(
        [("1,234",), ("3.5",), ("12 km",), ("1,200 km2",), ("2021-02-03",),
         ("hello",), ("-4",)],
        ["obj"])
    got = {(r.obj, r.datatype) for r in typed_table_facts(df).collect()}
    X = "http://www.w3.org/2001/XMLSchema#"
    D = "http://kg.example.org/datatype/"
    assert got == {
        ("1234", X + "integer"),
        ("3.5", X + "double"),
        ("12", D + "kilometre"),
        ("1200", D + "squareKilometre"),
        ("2021-02-03", X + "date"),
        ("hello", X + "string"),
        ("-4", X + "integer"),
    }


def test_table_channel_plan_zero_shuffle(spark):
    from distributed_extraction_framework_spark.operators.structured_data import (
        _table_channel,
    )

    df = spark.createDataFrame(
        [(0, "u", "<table><tr><th>h</th></tr><tr><td>v</td></tr></table>")],
        ["page_id", "url", "html"])
    plan = (_table_channel(df, "html", "page_id", "url")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_table_uppercase_cells_classified(spark):
    """(?i) regexes keep the page's capture case: '<TD>' captures 'D'
    and must still be recognized as a data cell, '<TH>' as a header
    (code-review r5 wave-3 #2)."""
    from distributed_extraction_framework_spark.operators.structured_data import (
        extract_tables, table_triples,
    )

    html = ("<TABLE><TR><TD>Nav</TD><TD>Login</TD></TR>"
            "<TR><TD>x</TD><TD>y</TD></TR></TABLE>"
            "<TABLE><TR><TH>K</TH></TR><TR><TD>v</TD></TR></TABLE>")
    df = spark.createDataFrame([(1, "https://p/u", html)],
                               ["page_id", "url", "html"])
    got = {(r["subj"], r["pred"], r["obj"])
           for r in table_triples(df).collect()}
    # table 0 (pure-TD first row) is NOT header-keyed; table 1 is
    assert got == {("https://p/u#table1-row1", "K", "v")}
    cells = extract_tables(df).collect()
    headers = {(r["table_idx"], r["row_idx"]) for r in cells
               if r["is_header"]}
    assert headers == {(1, 0)}


def test_host_graph_protocol_relative_links(spark):
    """'//other.com/x' is a cross-host link, not a self-edge
    (code-review r5 wave-3 #8)."""
    from distributed_extraction_framework_spark.operators.structured_data import (
        host_graph,
    )

    html = ('<a href="//b.example/x">b</a>'
            '<a href="/local">me</a>'
            '<a href="https://c.example/y">c</a>')
    df = spark.createDataFrame([(1, "https://a.example/p", html)],
                               ["page_id", "url", "html"])
    got = {(r["src_host"], r["dst_host"]): r["n_links"]
           for r in host_graph(df).collect()}
    assert got == {("a.example", "b.example"): 1,
                   ("a.example", "a.example"): 1,
                   ("a.example", "c.example"): 1}


def test_extract_jsonld_keep_cols_guard(spark):
    """keep_cols colliding with output columns must fail fast
    (code-review r5 wave-3 #9)."""
    import pytest as _pytest

    from distributed_extraction_framework_spark.operators.structured_data import (
        extract_jsonld,
    )

    df = spark.createDataFrame([(1, "<p>x</p>", "s")],
                               ["page_id", "html", "subj"])
    with _pytest.raises(ValueError):
        extract_jsonld(df, keep_cols=("subj",))
