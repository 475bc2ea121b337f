"""SPARQL BGP compiler (plans/bgp.py) — parser + join semantics +
property-path closure over a hand-built quads table."""

import pytest

from distributed_extraction_framework_spark import schema as S
from distributed_extraction_framework_spark.plans.bgp import bgp_query, parse_bgp

TYPE = S.RDF_TYPE
LINK = S.DBO_WIKI_LINK
SUBJ = S.DCT_SUBJECT
LABEL = S.RDFS_LABEL


@pytest.fixture(scope="module")
def quads(spark):
    rows = [
        ("a", TYPE, "City", None),
        ("b", TYPE, "City", None),
        ("c", TYPE, "Country", None),
        ("a", LINK, "b", None),
        ("b", LINK, "c", None),
        ("a", SUBJ, "Cat1", None),
        ("b", SUBJ, "Cat2", None),
        ("a", LABEL, "Alpha", "en"),
        ("a", LABEL, "Alpha-de", "de"),
        ("b", LABEL, "Beta", "en"),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, lang string"
    ).cache()


def test_parse_bgp_shapes():
    sel, distinct, pats, filters, limit = parse_bgp(
        f'SELECT DISTINCT ?x ?y WHERE {{ ?x <{TYPE}> "City" . ?x <{LINK}>+ ?y }} LIMIT 5'
    )
    assert sel == ["x", "y"] and distinct and limit == 5 and filters == []
    (s1, p1, o1), (s2, p2, o2) = pats
    assert (s1.kind, p1.kind, o1.kind) == ("var", "uri", "lit")
    assert p2.kind == "path" and p2.value == LINK

    _, _, pats, filters, _ = parse_bgp(
        'SELECT ?x WHERE { ?x <p> ?v . FILTER(?v >= 10) '
        'FILTER(regex(?x, "^D.c", "i")) }'
    )
    assert len(pats) == 1 and filters == ["?v >= 10", 'regex(?x, "^D.c", "i")']

    with pytest.raises(ValueError):
        parse_bgp("SELECT ?x WHERE { ?x <p> }")  # not whole triples
    with pytest.raises(ValueError):
        parse_bgp('SELECT ?x WHERE { "lit" <p> ?x }')  # literal subject
    with pytest.raises(ValueError):
        parse_bgp("SELECT ?x WHERE { ?x <p> ?v . FILTER(langMatches(?v)) }")
    with pytest.raises(ValueError):
        parse_bgp("nonsense")


def test_single_pattern_and_literal_lang(spark, quads):
    got = {r["x"] for r in bgp_query(
        quads, f'SELECT ?x WHERE {{ ?x <{TYPE}> "City" }}'
    ).collect()}
    assert got == {"a", "b"}

    # @lang constrains the lang column
    got = {r["x"] for r in bgp_query(
        quads, f'SELECT ?x WHERE {{ ?x <{LABEL}> "Alpha-de"@de }}'
    ).collect()}
    assert got == {"a"}
    got = {r["x"] for r in bgp_query(
        quads, f'SELECT ?x WHERE {{ ?x <{LABEL}> "Alpha-de"@en }}'
    ).collect()}
    assert got == set()


def test_join_on_shared_var(spark, quads):
    q = (f"SELECT ?doc ?cat WHERE {{ ?doc <{LINK}> ?mid . "
         f"?mid <{SUBJ}> ?cat }}")
    got = {(r["doc"], r["cat"]) for r in bgp_query(quads, q).collect()}
    assert got == {("a", "Cat2")}  # a links b, b in Cat2; b links c (no cat)


def test_predicate_variable_binds(spark, quads):
    q = "SELECT DISTINCT ?p WHERE { ?s ?p ?o }"
    got = {r["p"] for r in bgp_query(quads, q).collect()}
    assert got == {TYPE, LINK, SUBJ, LABEL}


def test_property_path_one_or_more(spark, quads):
    q = f"SELECT ?s ?t WHERE {{ ?s <{LINK}>+ ?t }}"
    got = {(r["s"], r["t"]) for r in bgp_query(quads, q).collect()}
    assert got == {("a", "b"), ("b", "c"), ("a", "c")}


def test_repeated_var_in_one_pattern(spark):
    df = spark.createDataFrame(
        [("a", "p", "a", None), ("a", "p", "b", None)],
        "subj string, pred string, obj string, lang string",
    )
    got = [r["x"] for r in bgp_query(df, "SELECT ?x WHERE { ?x <p> ?x }").collect()]
    assert got == ["a"]


def test_filter_numeric_comparison(spark):
    """Comparison against a numeric literal coerces the var to double —
    lexicographic order would wrongly exclude '9' < '100'."""
    df = spark.createDataFrame(
        [("a", "score", "10", None), ("b", "score", "9", None),
         ("c", "score", "100", None)],
        "subj string, pred string, obj string, lang string",
    )
    got = {r["s"] for r in bgp_query(
        df, "SELECT ?s WHERE { ?s <score> ?v . FILTER(?v >= 10) }"
    ).collect()}
    assert got == {"a", "c"}
    got = {r["s"] for r in bgp_query(
        df, "SELECT ?s WHERE { ?s <score> ?v . FILTER(?v < 10) }"
    ).collect()}
    assert got == {"b"}


def test_filter_regex_and_string_eq(spark, quads):
    got = {r["x"] for r in bgp_query(
        quads, f'SELECT ?x WHERE {{ ?x <{LABEL}> ?l . FILTER(regex(?l, "^Alph")) }}'
    ).collect()}
    assert got == {"a"}
    # case-insensitive flag
    got = {r["x"] for r in bgp_query(
        quads, f'SELECT ?x WHERE {{ ?x <{LABEL}> ?l . FILTER(regex(?l, "^alpha$", "i")) }}'
    ).collect()}
    assert got == {"a"}
    # string equality (var = "literal")
    got = {r["x"] for r in bgp_query(
        quads, f'SELECT ?x WHERE {{ ?x <{LABEL}> ?l . FILTER(?l = "Beta") }}'
    ).collect()}
    assert got == {"b"}


def test_filter_unbound_var_raises(spark, quads):
    with pytest.raises(ValueError, match="not bound"):
        bgp_query(
            quads,
            f'SELECT ?x WHERE {{ ?x <{TYPE}> "City" . FILTER(?nope = "x") }}',
        )


def test_unbound_select_var_raises(spark, quads):
    with pytest.raises(ValueError, match="not bound"):
        bgp_query(quads, f'SELECT ?zzz WHERE {{ ?x <{TYPE}> "City" }}')


def test_bgp_runs_on_extracted_quads(spark, pages_df):
    """End-to-end over the real extractor output: docs linking into a page
    of a category — the join the driver gate (bgp_join) exercises."""
    from distributed_extraction_framework_spark.operators.extractors import extract

    quads = extract(pages_df, extractors=["page_links", "article_categories"])
    q = (f"SELECT DISTINCT ?doc ?cat WHERE {{ ?doc <{LINK}> ?mid . "
         f"?mid <{SUBJ}> ?cat }}")
    out = bgp_query(quads, q)
    assert out.columns == ["doc", "cat"]
    assert out.count() > 0


# ---------------------------------------------------------------------------
# extended constructs: OPTIONAL / UNION / VALUES / aggregates / ORDER BY
# ---------------------------------------------------------------------------


def test_optional_left_join(spark, quads):
    """OPTIONAL = SPARQL left join: unmatched rows keep NULL (unbound)."""
    q = (f'SELECT ?x ?cat WHERE {{ ?x <{TYPE}> "City" . '
         f"OPTIONAL {{ ?x <{SUBJ}> ?cat }} }}")
    got = {(r["x"], r["cat"]) for r in bgp_query(quads, q).collect()}
    assert got == {("a", "Cat1"), ("b", "Cat2")}
    # drop b's category: b must survive with NULL
    q2 = (f'SELECT ?x ?l WHERE {{ ?x <{TYPE}> ?t . '
          f'OPTIONAL {{ ?x <{LABEL}> ?l . FILTER(regex(?l, "^Alpha$")) }} }}')
    got = {(r["x"], r["l"]) for r in bgp_query(quads, q2).collect()}
    assert got == {("a", "Alpha"), ("b", None), ("c", None)}


def test_optional_requires_shared_var(spark, quads):
    with pytest.raises(ValueError, match="shares no variable"):
        bgp_query(
            quads,
            f'SELECT ?x WHERE {{ ?x <{TYPE}> "City" . '
            f"OPTIONAL {{ ?y <{SUBJ}> ?c }} }}",
        ).collect()


def test_union_branches(spark, quads):
    q = (f'SELECT DISTINCT ?x WHERE {{ {{ ?x <{TYPE}> "Country" }} '
         f'UNION {{ ?x <{SUBJ}> "Cat1" }} }}')
    got = {r["x"] for r in bgp_query(quads, q).collect()}
    assert got == {"c", "a"}


def test_union_partial_bindings_null_fill(spark, quads):
    """A var bound in only one branch is NULL in the other (SPARQL union)."""
    q = (f'SELECT ?x ?cat WHERE {{ {{ ?x <{TYPE}> "Country" }} '
         f"UNION {{ ?x <{SUBJ}> ?cat }} }}")
    got = {(r["x"], r["cat"]) for r in bgp_query(quads, q).collect()}
    assert got == {("c", None), ("a", "Cat1"), ("b", "Cat2")}


def test_values_inline_join(spark, quads):
    q = (f'SELECT ?x ?t WHERE {{ ?x <{TYPE}> ?t . '
         f'VALUES ?x {{ "a" "c" }} }}')
    got = {(r["x"], r["t"]) for r in bgp_query(quads, q).collect()}
    assert got == {("a", "City"), ("c", "Country")}
    with pytest.raises(ValueError, match="constants"):
        bgp_query(quads, "SELECT ?x WHERE { ?x <p> ?t . VALUES ?x { ?y } }")


def test_aggregates_group_by(spark, quads):
    q = (f"SELECT ?t (COUNT(?x) AS ?n) WHERE {{ ?x <{TYPE}> ?t }} "
         f"GROUP BY ?t ORDER BY DESC(?n) ?t")
    rows = [(r["t"], r["n"]) for r in bgp_query(quads, q).collect()]
    assert rows == [("City", 2), ("Country", 1)]
    # global aggregate (no GROUP BY), COUNT DISTINCT
    q2 = f"SELECT (COUNT(DISTINCT ?t) AS ?kinds) WHERE {{ ?x <{TYPE}> ?t }}"
    assert bgp_query(quads, q2).collect()[0]["kinds"] == 2


def test_aggregate_numeric_sum(spark):
    df = spark.createDataFrame(
        [("a", "score", "10", None), ("a", "score", "2.5", None),
         ("b", "score", "9", None)],
        "subj string, pred string, obj string, lang string",
    )
    q = ("SELECT ?s (SUM(?v) AS ?total) WHERE { ?s <score> ?v } "
         "GROUP BY ?s ORDER BY ?s")
    rows = [(r["s"], r["total"]) for r in bgp_query(df, q).collect()]
    assert rows == [("a", 12.5), ("b", 9.0)]


def test_order_by_limit(spark, quads):
    q = f"SELECT ?x ?l WHERE {{ ?x <{LABEL}> ?l }} ORDER BY DESC(?l) LIMIT 2"
    rows = [(r["x"], r["l"]) for r in bgp_query(quads, q).collect()]
    assert rows == [("b", "Beta"), ("a", "Alpha-de")]


def test_non_grouped_select_var_raises(spark, quads):
    with pytest.raises(ValueError, match="GROUP BY"):
        bgp_query(
            quads,
            f"SELECT ?x (COUNT(?t) AS ?n) WHERE {{ ?x <{TYPE}> ?t }} GROUP BY ?t",
        )


def test_parse_bgp_rejects_extended():
    with pytest.raises(ValueError, match="extended"):
        parse_bgp('SELECT ?x WHERE { { ?x <p> "a" } UNION { ?x <q> "b" } }')


# ---------------------------------------------------------------------------
# CONSTRUCT and ASK forms
# ---------------------------------------------------------------------------


def test_construct_emits_template_triples(spark, quads):
    from distributed_extraction_framework_spark.plans.bgp import construct_query

    q = (f'CONSTRUCT {{ ?x <isA> ?t . ?x <in> "KG"@en }} '
         f"WHERE {{ ?x <{TYPE}> ?t }}")
    got = {(r["subj"], r["pred"], r["obj"], r["lang"])
           for r in construct_query(quads, q).collect()}
    assert got == {
        ("a", "isA", "City", None), ("b", "isA", "City", None),
        ("c", "isA", "Country", None),
        ("a", "in", "KG", "en"), ("b", "in", "KG", "en"),
        ("c", "in", "KG", "en"),
    }


def test_construct_skips_unbound_optional_vars(spark, quads):
    from distributed_extraction_framework_spark.plans.bgp import construct_query

    q = (f"CONSTRUCT {{ ?x <cat> ?c }} WHERE {{ ?x <{TYPE}> ?t . "
         f"OPTIONAL {{ ?x <{SUBJ}> ?c }} }}")
    got = {(r["subj"], r["obj"]) for r in construct_query(quads, q).collect()}
    assert got == {("a", "Cat1"), ("b", "Cat2")}  # c has no category → skipped


def test_construct_unbound_template_var_raises(spark, quads):
    from distributed_extraction_framework_spark.plans.bgp import construct_query

    with pytest.raises(ValueError, match="not bound"):
        construct_query(
            quads, f"CONSTRUCT {{ ?x <p> ?zzz }} WHERE {{ ?x <{TYPE}> ?t }}"
        )


def test_sparql_form_dispatch(spark, quads):
    from distributed_extraction_framework_spark.plans.bgp import sparql

    assert {r["x"] for r in sparql(
        quads, f'SELECT ?x WHERE {{ ?x <{TYPE}> "City" }}'
    ).collect()} == {"a", "b"}
    assert sparql(quads, f'ASK {{ ?x <{TYPE}> "City" }}'
                  ).collect()[0]["ask"] is True
    assert sparql(quads, "DESCRIBE <c>").count() == 1
    assert sparql(
        quads, f"CONSTRUCT {{ ?x <t> ?t }} WHERE {{ ?x <{TYPE}> ?t }}"
    ).count() == 3
    with pytest.raises(ValueError, match="query form"):
        sparql(quads, "INSERT DATA { }")


def test_describe_query(spark, quads):
    from distributed_extraction_framework_spark.plans.bgp import describe_query

    got = {(r["subj"], r["pred"], r["obj"]) for r in describe_query(
        quads, "DESCRIBE <c>"
    ).collect()}
    assert got == {("c", TYPE, "Country")}
    # variable form: describe every binding from the WHERE block
    got = {(r["subj"], r["pred"], r["obj"], r["lang"]) for r in describe_query(
        quads, f'DESCRIBE ?x WHERE {{ ?x <{SUBJ}> "Cat1" }}'
    ).collect()}
    assert got == {
        ("a", TYPE, "City", None), ("a", LINK, "b", None),
        ("a", SUBJ, "Cat1", None),
        ("a", LABEL, "Alpha", "en"), ("a", LABEL, "Alpha-de", "de"),
    }
    # mixed constants + variables, deduplicated resource set
    got = {r["subj"] for r in describe_query(
        quads, f'DESCRIBE <c> ?x WHERE {{ ?x <{SUBJ}> "Cat2" }}'
    ).collect()}
    assert got == {"b", "c"}
    with pytest.raises(ValueError, match="WHERE"):
        describe_query(quads, "DESCRIBE ?x")
    with pytest.raises(ValueError, match="not bound"):
        describe_query(quads, f'DESCRIBE ?zz WHERE {{ ?x <{SUBJ}> "Cat1" }}')


def test_ask_query(spark, quads):
    from distributed_extraction_framework_spark.plans.bgp import ask_query

    assert ask_query(
        quads, f'ASK {{ ?x <{TYPE}> "City" }}'
    ).collect()[0]["ask"] is True
    assert ask_query(
        quads, f'ASK WHERE {{ ?x <{TYPE}> "Planet" }}'
    ).collect()[0]["ask"] is False
    with pytest.raises(ValueError, match="LIMIT"):
        ask_query(quads, f'ASK {{ ?x <{TYPE}> "City" }} LIMIT 1')


# ---------------------------------------------------------------------------
# SPARQL 1.1 property-path operators: ^ inverse, / sequence, | alternative,
# * ZeroOrMore
# ---------------------------------------------------------------------------


def test_path_inverse(spark, quads):
    got = {(r["x"], r["y"]) for r in bgp_query(
        quads, f"SELECT ?x ?y WHERE {{ ?x ^<{LINK}> ?y }}"
    ).collect()}
    # LINK edges are a->b, b->c; inverse relates b->a, c->b
    assert got == {("b", "a"), ("c", "b")}


def test_path_sequence(spark, quads):
    # a -LINK-> b -SUBJ-> Cat2
    got = {(r["x"], r["c"]) for r in bgp_query(
        quads, f"SELECT ?x ?c WHERE {{ ?x <{LINK}>/<{SUBJ}> ?c }}"
    ).collect()}
    assert got == {("a", "Cat2")}


def test_path_alternative(spark, quads):
    got = {(r["x"], r["o"]) for r in bgp_query(
        quads, f'SELECT ?x ?o WHERE {{ ?x <{SUBJ}>|<{TYPE}> ?o . '
               f'FILTER(?x = "a") }}'
    ).collect()}
    assert got == {("a", "Cat1"), ("a", "City")}


def test_path_zero_or_more(spark, quads):
    got = {r["y"] for r in bgp_query(
        quads, f'SELECT ?y WHERE {{ ?x <{LINK}>* ?y . FILTER(?x = "a") }}'
    ).collect()}
    # zero-length: a itself; one step: b; two steps: c
    assert got == {"a", "b", "c"}
    # zero-length relates EVERY graph term to itself, literals included
    got = {r["y"] for r in bgp_query(
        quads, f'SELECT ?y WHERE {{ ?x <{LINK}>* ?y . FILTER(?x = "Cat1") }}'
    ).collect()}
    assert got == {"Cat1"}


def test_path_sequence_with_closure_step(spark, quads):
    # every LINK-reachable node's category: a -> {b,c}; only b has SUBJ
    got = {(r["x"], r["c"]) for r in bgp_query(
        quads, f"SELECT ?x ?c WHERE {{ ?x <{LINK}>+/<{SUBJ}> ?c }}"
    ).collect()}
    assert got == {("a", "Cat2")}


def test_bad_path_raises(spark, quads):
    with pytest.raises(ValueError, match="unparseable path step"):
        from distributed_extraction_framework_spark.plans.bgp import _path_pairs
        _path_pairs(quads, "<a><b>")


# ---------------------------------------------------------------------------
# MINUS / FILTER [NOT] EXISTS / BIND / boolean filters / negated property
# sets / ZeroOrOne / GROUP_CONCAT / SAMPLE / OFFSET
# ---------------------------------------------------------------------------


def test_minus_removes_compatible_solutions(spark, quads):
    q = (f"SELECT ?x WHERE {{ ?x <{TYPE}> ?t . "
         f'MINUS {{ ?x <{SUBJ}> "Cat1" }} }}')
    got = {r["x"] for r in bgp_query(quads, q).collect()}
    assert got == {"b", "c"}  # a is in Cat1 → removed
    # MINUS sharing no variable removes nothing (SPARQL algebra)
    q2 = (f"SELECT ?x WHERE {{ ?x <{TYPE}> ?t . "
          f'MINUS {{ ?y <{SUBJ}> "Cat1" }} }}')
    got = {r["x"] for r in bgp_query(quads, q2).collect()}
    assert got == {"a", "b", "c"}


def test_filter_exists_and_not_exists(spark, quads):
    q = (f"SELECT ?x WHERE {{ ?x <{TYPE}> ?t . "
         f"FILTER EXISTS {{ ?x <{SUBJ}> ?c }} }}")
    got = {r["x"] for r in bgp_query(quads, q).collect()}
    assert got == {"a", "b"}
    q2 = (f"SELECT ?x WHERE {{ ?x <{TYPE}> ?t . "
          f"FILTER NOT EXISTS {{ ?x <{SUBJ}> ?c }} }}")
    got = {r["x"] for r in bgp_query(quads, q2).collect()}
    assert got == {"c"}
    with pytest.raises(ValueError, match="shares no variable"):
        bgp_query(quads, f"SELECT ?x WHERE {{ ?x <{TYPE}> ?t . "
                         f"FILTER EXISTS {{ ?y <{SUBJ}> ?c }} }}")


def test_bind_expressions(spark, quads):
    q = (f'SELECT ?x ?tag WHERE {{ ?x <{TYPE}> ?t . '
         f'BIND(CONCAT(?x, "-", LCASE(?t)) AS ?tag) }}')
    got = {(r["x"], r["tag"]) for r in bgp_query(quads, q).collect()}
    assert got == {("a", "a-city"), ("b", "b-city"), ("c", "c-country")}
    # arithmetic with numeric coercion of the lexical object column
    df = spark.createDataFrame(
        [("a", "score", "10", None), ("b", "score", "4", None)],
        "subj string, pred string, obj string, lang string",
    )
    q2 = ("SELECT ?s ?double WHERE { ?s <score> ?v . "
          "BIND(?v * 2 AS ?double) . FILTER(?double > 10) }")
    got = {(r["s"], r["double"]) for r in bgp_query(df, q2).collect()}
    assert got == {("a", 20.0)}
    # STRLEN and rebind guard
    q3 = (f"SELECT ?x ?n WHERE {{ ?x <{LABEL}> ?l . BIND(STRLEN(?l) AS ?n) }}")
    got = {(r["x"], r["n"]) for r in bgp_query(quads, q3).collect()}
    assert got == {("a", 5), ("a", 8), ("b", 4)}
    with pytest.raises(ValueError, match="rebind"):
        bgp_query(quads, f"SELECT ?x WHERE {{ ?x <{TYPE}> ?t . "
                         f"BIND(UCASE(?t) AS ?x) }}")


def test_filter_boolean_combinators(spark, quads):
    q = (f'SELECT ?x WHERE {{ ?x <{LABEL}> ?l . '
         f'FILTER(STRSTARTS(?l, "Alpha") || ?l = "Beta") }}')
    got = {r["x"] for r in bgp_query(quads, q).collect()}
    assert got == {"a", "b"}
    q2 = (f'SELECT ?l WHERE {{ ?x <{LABEL}> ?l . '
          f'FILTER(CONTAINS(?l, "a") && !STRENDS(?l, "de")) }}')
    got = {r["l"] for r in bgp_query(quads, q2).collect()}
    assert got == {"Alpha", "Beta"}
    q3 = (f'SELECT ?x WHERE {{ ?x <{TYPE}> ?t . '
          f'FILTER(?t IN ("City", "Planet")) }}')
    got = {r["x"] for r in bgp_query(quads, q3).collect()}
    assert got == {"a", "b"}
    q4 = (f'SELECT ?x WHERE {{ ?x <{TYPE}> ?t . '
          f'FILTER(?t NOT IN ("City")) }}')
    got = {r["x"] for r in bgp_query(quads, q4).collect()}
    assert got == {"c"}


def test_filter_bound_over_optional(spark, quads):
    q = (f"SELECT ?x WHERE {{ ?x <{TYPE}> ?t . "
         f"OPTIONAL {{ ?x <{SUBJ}> ?c }} FILTER(!BOUND(?c)) }}")
    # BOUND applies to the group result: filters run after OPTIONAL join
    got = {r["x"] for r in bgp_query(quads, q).collect()}
    assert got == {"c"}


def test_negated_property_set(spark, quads):
    # !(<LABEL>|<TYPE>) relates x to neighbours via any OTHER predicate
    got = {(r["x"], r["o"]) for r in bgp_query(
        quads, f'SELECT ?x ?o WHERE {{ ?x !(<{LABEL}>|<{TYPE}>) ?o . '
               f'FILTER(?x = "a") }}'
    ).collect()}
    assert got == {("a", "b"), ("a", "Cat1")}  # LINK and SUBJ edges only
    # a parenthesized POSITIVE alternative is just an alternative (the
    # tokenizer strips grouping parens); a bare property set reaching the
    # path compiler without '!' is rejected
    got = {(r["x"], r["o"]) for r in bgp_query(
        quads, f'SELECT ?x ?o WHERE {{ ?x (<{LINK}>|<{TYPE}>) ?o . '
               f'FILTER(?x = "b") }}'
    ).collect()}
    assert got == {("b", "c"), ("b", "City")}
    from distributed_extraction_framework_spark.plans.bgp import _path_pairs
    with pytest.raises(ValueError, match="require negation"):
        _path_pairs(quads, "(<a>|<b>)")


def test_path_zero_or_one(spark, quads):
    got = {r["y"] for r in bgp_query(
        quads, f'SELECT ?y WHERE {{ ?x <{LINK}>? ?y . FILTER(?x = "a") }}'
    ).collect()}
    assert got == {"a", "b"}  # zero-length (a) plus one step (b), NOT c


def test_group_concat_and_sample(spark, quads):
    q = (f'SELECT ?x (GROUP_CONCAT(?l ; SEPARATOR="|") AS ?labels) '
         f"WHERE {{ ?x <{LABEL}> ?l }} GROUP BY ?x ORDER BY ?x")
    rows = [(r["x"], r["labels"]) for r in bgp_query(quads, q).collect()]
    assert rows == [("a", "Alpha|Alpha-de"), ("b", "Beta")]
    q2 = (f"SELECT ?x (SAMPLE(?l) AS ?one) WHERE {{ ?x <{LABEL}> ?l }} "
          f"GROUP BY ?x ORDER BY ?x")
    rows = [(r["x"], r["one"]) for r in bgp_query(quads, q2).collect()]
    assert rows == [("a", "Alpha"), ("b", "Beta")]  # SAMPLE = deterministic MIN
    with pytest.raises(ValueError, match="SEPARATOR"):
        bgp_query(quads, f'SELECT ?x (COUNT(?l ; SEPARATOR=",") AS ?n) '
                         f"WHERE {{ ?x <{LABEL}> ?l }} GROUP BY ?x")


def test_join_order_heuristic_avoids_cross_join(spark, quads):
    """Patterns written in a disconnected order still compile to a
    connected join tree (greedy most-selective-connected-next), so no
    CartesianProduct/BroadcastNestedLoopJoin appears in the plan."""
    q = (f'SELECT ?x ?cat WHERE {{ ?mid <{SUBJ}> ?cat . '
         f'?x <{TYPE}> "City" . ?x <{LINK}> ?mid }}')
    df = bgp_query(quads, q)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got = {(r["x"], r["cat"]) for r in df.collect()}
    assert got == {("a", "Cat2")}


def test_subselect_grouped_join(spark, quads):
    """Sub-SELECT with GROUP BY joined to the outer pattern on ?x."""
    q = (f'SELECT ?x ?n WHERE {{ ?x <{TYPE}> "City" . '
         f"{{ SELECT ?x (COUNT(?o) AS ?n) WHERE {{ ?x <{LINK}> ?o }} "
         f"GROUP BY ?x }} }}")
    got = {(r["x"], r["n"]) for r in bgp_query(quads, q).collect()}
    assert got == {("a", 1), ("b", 1)}


def test_subselect_scalar_cross_join(spark, quads):
    """A 0-shared-var scalar-aggregate subquery cross-joins its 1 row."""
    q = (f"SELECT ?x ?total WHERE {{ ?x <{TYPE}> ?t . "
         f"{{ SELECT (COUNT(?o) AS ?total) WHERE {{ ?s <{LINK}> ?o }} }} }}")
    got = {(r["x"], r["total"]) for r in bgp_query(quads, q).collect()}
    assert got == {("a", 2), ("b", 2), ("c", 2)}


def test_subselect_first_in_body(spark, quads):
    """A body OPENING with '{ SELECT' is a subquery, not a UNION list."""
    q = (f"SELECT ?x ?n WHERE {{ "
         f"{{ SELECT ?x (COUNT(?l) AS ?n) WHERE {{ ?x <{LABEL}> ?l }} "
         f"GROUP BY ?x }} "
         f'?x <{TYPE}> "City" }}')
    got = {(r["x"], r["n"]) for r in bgp_query(quads, q).collect()}
    assert got == {("a", 2), ("b", 1)}


def test_subselect_with_bind_and_filter(spark, quads):
    """The scalar-compare idiom: per-key count vs a scaled global count."""
    q = (f"SELECT ?x ?n WHERE {{ "
         f"{{ SELECT ?x (COUNT(?l) AS ?n) WHERE {{ ?x <{LABEL}> ?l }} "
         f"GROUP BY ?x }} "
         f"{{ SELECT (COUNT(?l2) AS ?tot) WHERE {{ ?y <{LABEL}> ?l2 }} }} "
         f"BIND(?n * 2 AS ?scaled) . FILTER(?scaled > ?tot) }}")
    # labels: a has 2, b has 1, total 3 → only a (2*2=4 > 3)
    got = {(r["x"], r["n"]) for r in bgp_query(quads, q).collect()}
    assert got == {("a", 2)}


# ---------------------------------------------------------------------------
# SPARQL 1.1 UPDATE forms
# ---------------------------------------------------------------------------


def _rows(df):
    return {(r["subj"], r["pred"], r["obj"], r["lang"]) for r in df.collect()}


def test_insert_data_is_idempotent(spark, quads):
    from distributed_extraction_framework_spark.plans.bgp import sparql_update

    up = (f'INSERT DATA {{ <d> <{TYPE}> "City" . <d> <{LABEL}> "Delta"@en . '
          f'<a> <{TYPE}> "City" }}')  # a/City already present → no dup
    out = sparql_update(quads, up)
    assert out.count() == quads.count() + 2
    assert ("d", TYPE, "City", None) in _rows(out)
    assert ("d", LABEL, "Delta", "en") in _rows(out)
    # reapplying changes nothing (set semantics for inserted rows)
    assert sparql_update(out, up).count() == out.count()
    with pytest.raises(ValueError, match="no variables"):
        sparql_update(quads, "INSERT DATA { ?x <p> \"v\" }")


def test_delete_data_nullsafe_lang(spark, quads):
    from distributed_extraction_framework_spark.plans.bgp import sparql_update

    # no @lang → matches only the untagged quad, not "Alpha"@en
    out = sparql_update(quads, f'DELETE DATA {{ <a> <{TYPE}> "City" }}')
    assert ("a", TYPE, "City", None) not in _rows(out)
    assert ("a", LABEL, "Alpha", "en") in _rows(out)
    # @lang-tagged delete removes exactly the tagged row
    out2 = sparql_update(quads, f'DELETE DATA {{ <a> <{LABEL}> "Alpha"@en }}')
    rows = _rows(out2)
    assert ("a", LABEL, "Alpha", "en") not in rows
    assert ("a", LABEL, "Alpha-de", "de") in rows


def test_delete_where_shorthand(spark, quads):
    from distributed_extraction_framework_spark.plans.bgp import sparql_update

    out = sparql_update(quads, f"DELETE WHERE {{ ?s <{LINK}> ?o }}")
    rows = _rows(out)
    assert not any(p == LINK for _, p, _, _ in rows)
    assert out.count() == quads.count() - 2


def test_delete_insert_where(spark, quads):
    from distributed_extraction_framework_spark.plans.bgp import sparql_update

    up = (f"DELETE {{ ?s <{TYPE}> ?t }} INSERT {{ ?s <kind> ?t }} "
          f'WHERE {{ ?s <{TYPE}> ?t . FILTER(?t = "City") }}')
    rows = _rows(sparql_update(quads, up))
    assert ("a", "kind", "City", None) in rows
    assert ("b", "kind", "City", None) in rows
    assert ("a", TYPE, "City", None) not in rows
    assert ("c", TYPE, "Country", None) in rows  # untouched
    # INSERT-only form
    rows = _rows(sparql_update(
        quads, f"INSERT {{ ?s <t2> ?t }} WHERE {{ ?s <{TYPE}> ?t }}"
    ))
    assert ("c", "t2", "Country", None) in rows and ("c", TYPE, "Country", None) in rows
    with pytest.raises(ValueError, match="WHERE"):
        sparql_update(quads, "DELETE { ?s <p> ?o }")


def test_lang_filter(spark, quads):
    q = (f'SELECT ?x ?l WHERE {{ ?x <{LABEL}> ?l . '
         f'FILTER(LANG(?l) = "de") }}')
    got = {(r["x"], r["l"]) for r in bgp_query(quads, q).collect()}
    assert got == {("a", "Alpha-de")}
    # != keeps the other tags but NOT untagged? No: LANG of untagged is ""
    # which also differs from "de" — both en labels and any untagged match
    q2 = (f'SELECT ?x ?l WHERE {{ ?x <{LABEL}> ?l . '
          f'FILTER(LANG(?l) != "de") }}')
    got = {(r["x"], r["l"]) for r in bgp_query(quads, q2).collect()}
    assert got == {("a", "Alpha"), ("b", "Beta")}
    # untagged objects have LANG "" (TYPE objects carry no lang)
    q3 = (f'SELECT ?x WHERE {{ ?x <{TYPE}> ?t . FILTER(LANG(?t) = "") }}')
    got = {r["x"] for r in bgp_query(quads, q3).collect()}
    assert got == {"a", "b", "c"}
    # the hidden __lang column never leaks into the result schema
    assert bgp_query(quads, q).columns == ["x", "l"]


def test_lang_filter_errors(spark, quads):
    # LANG of a subject-position-only variable
    with pytest.raises(ValueError, match="object position"):
        bgp_query(quads, f'SELECT ?x WHERE {{ ?x <{TYPE}> "City" . '
                         f'FILTER(LANG(?x) = "en") }}')
    # ambiguous: ?l bound in object position by two patterns
    with pytest.raises(ValueError, match="ambiguous"):
        bgp_query(quads, f'SELECT ?x WHERE {{ ?x <{LABEL}> ?l . '
                         f'?x <{TYPE}> ?l . FILTER(LANG(?l) = "en") }}')


def test_having(spark, quads):
    # direct aggregate form: the COUNT becomes an internal agg column
    q = (f"SELECT ?x WHERE {{ ?x <{LABEL}> ?l }} "
         f"GROUP BY ?x HAVING(COUNT(?l) >= 2)")
    got = {r["x"] for r in bgp_query(quads, q).collect()}
    assert got == {"a"}
    # alias form referencing the SELECT aggregate
    q2 = (f"SELECT ?x (COUNT(?l) AS ?n) WHERE {{ ?x <{LABEL}> ?l }} "
          f"GROUP BY ?x HAVING(?n < 2) ORDER BY ?x")
    rows = [(r["x"], r["n"]) for r in bgp_query(quads, q2).collect()]
    assert rows == [("b", 1)]
    # internal columns never leak; HAVING without aggregation rejected
    assert bgp_query(quads, q).columns == ["x"]
    with pytest.raises(ValueError, match="HAVING requires aggregation"):
        bgp_query(quads, f'SELECT ?x WHERE {{ ?x <{TYPE}> "City" }} '
                         f"HAVING(?x = 1)")


def test_offset_pagination(spark, quads):
    base = f"SELECT ?l WHERE {{ ?x <{LABEL}> ?l }} ORDER BY ?l"
    assert [r["l"] for r in bgp_query(quads, base + " LIMIT 2 OFFSET 1").collect()] \
        == ["Alpha-de", "Beta"]
    # OFFSET-before-LIMIT order is equally valid SPARQL
    assert [r["l"] for r in bgp_query(quads, base + " OFFSET 2 LIMIT 5").collect()] \
        == ["Beta"]
    assert [r["l"] for r in bgp_query(quads, base + " OFFSET 1").collect()] \
        == ["Alpha-de", "Beta"]


# ---------------------------------------------------------------------------
# Expression function library (SUBSTR/REPLACE/COALESCE/IF/…)
# ---------------------------------------------------------------------------


def test_string_function_binds(spark, quads):
    q = (f"SELECT ?x ?sub ?rep ?pre ?post WHERE {{ ?x <{LABEL}> ?l . "
         f'FILTER(LANG(?l) = "en") '
         f"BIND(SUBSTR(?l, 2, 3) AS ?sub) "
         f'BIND(REPLACE(?l, "[aeiou]", "_") AS ?rep) '
         f'BIND(STRBEFORE(?l, "lph") AS ?pre) '
         f'BIND(STRAFTER(?l, "lph") AS ?post) }}')
    got = {tuple(r) for r in bgp_query(quads, q).collect()}
    assert got == {
        # [aeiou] is lowercase-only, so the leading "A" survives
        ("a", "lph", "Alph_", "A", "a"),
        # "Beta" has no "lph" → STRBEFORE/STRAFTER return "" per spec
        ("b", "eta", "B_t_", "", ""),
    }
    # SUBSTR without length runs to end of string
    q2 = (f"SELECT ?s2 WHERE {{ ?x <{LABEL}> ?l . "
          f'FILTER(?l = "Beta") BIND(SUBSTR(?l, 3) AS ?s2) }}')
    assert [r["s2"] for r in bgp_query(quads, q2).collect()] == ["ta"]
    with pytest.raises(ValueError, match="separator must be a string"):
        bgp_query(quads, f"SELECT ?p WHERE {{ ?x <{LABEL}> ?l . "
                         f"BIND(STRBEFORE(?l, ?l) AS ?p) }}")
    with pytest.raises(ValueError, match="argument"):
        bgp_query(quads, f"SELECT ?p WHERE {{ ?x <{LABEL}> ?l . "
                         f"BIND(SUBSTR(?l) AS ?p) }}")


def test_numeric_functions_and_coalesce_if(spark, quads):
    rows = spark.createDataFrame(
        [("a", "v", "-2.5", None), ("b", "v", "1.2", None)],
        "subj string, pred string, obj string, lang string",
    )
    q = ("SELECT ?x ?a ?r ?c ?f WHERE { ?x <v> ?n . "
         "BIND(ABS(?n) AS ?a) BIND(ROUND(?n) AS ?r) "
         "BIND(CEIL(?n) AS ?c) BIND(FLOOR(?n) AS ?f) }")
    got = {tuple(r) for r in bgp_query(rows, q).collect()}
    assert got == {("a", 2.5, -3.0, -2.0, -3.0),  # HALF_UP ties
                   ("b", 1.2, 1.0, 2.0, 1.0)}
    # IF over the filter grammar + COALESCE over an OPTIONAL null
    q2 = (f'SELECT ?x ?kind ?lbl WHERE {{ ?x <{TYPE}> ?t . '
          f'BIND(IF(?t = "City" && BOUND(?t), "c", "other") AS ?kind) '
          f'OPTIONAL {{ ?x <{SUBJ}> ?cat }} '
          f'BIND(COALESCE(?cat, "none") AS ?lbl) }}')
    got2 = {tuple(r) for r in bgp_query(quads, q2).collect()}
    assert got2 == {("a", "c", "Cat1"), ("b", "c", "Cat2"),
                    ("c", "other", "none")}


def test_function_calls_in_filter_comparisons(spark, quads):
    q = (f"SELECT ?x WHERE {{ ?x <{LABEL}> ?l . "
         f"FILTER(STRLEN(?l) > 4 && LANG(?l) = \"en\") }}")
    assert {r["x"] for r in bgp_query(quads, q).collect()} == {"a"}
    q2 = (f'SELECT ?x WHERE {{ ?x <{LABEL}> ?l . '
          f'FILTER(UCASE(?l) = "BETA") }}')
    assert {r["x"] for r in bgp_query(quads, q2).collect()} == {"b"}
    q3 = (f'SELECT ?x WHERE {{ ?x <{LABEL}> ?l . '
          f'FILTER(STRBEFORE(?l, "-") = "Alpha") }}')
    assert {r["x"] for r in bgp_query(quads, q3).collect()} == {"a"}


# ---------------------------------------------------------------------------
# GRAPH (named graphs over the provenance context column)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def gquads(spark):
    rows = [
        # (subj, pred, obj, lang, context)
        ("a", TYPE, "City", None, "g1"),
        ("a", LABEL, "Alpha", "en", "g1"),
        ("b", TYPE, "City", None, "g2"),
        ("b", LABEL, "Beta", "en", "g2"),
        ("c", TYPE, "Country", None, "g2"),
    ]
    return spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, lang string, context string",
    ).cache()


def test_graph_constant_scopes_block(spark, gquads):
    q = f'SELECT ?x WHERE {{ GRAPH <g2> {{ ?x <{TYPE}> "City" }} }}'
    assert {r["x"] for r in bgp_query(gquads, q).collect()} == {"b"}


def test_graph_var_binds_and_joins_within_graph(spark, gquads):
    q = (f"SELECT ?g ?x ?l WHERE {{ GRAPH ?g {{ "
         f'?x <{TYPE}> "City" . ?x <{LABEL}> ?l }} }}')
    got = {tuple(r) for r in bgp_query(gquads, q).collect()}
    # both patterns must match in the SAME graph
    assert got == {("g1", "a", "Alpha"), ("g2", "b", "Beta")}
    # a pattern outside the block joins across graphs on shared vars
    q2 = (f"SELECT ?g ?x WHERE {{ ?x <{TYPE}> ?t . "
          f"GRAPH ?g {{ ?x <{LABEL}> ?l }} }}")
    got2 = {tuple(r) for r in bgp_query(gquads, q2).collect()}
    assert got2 == {("g1", "a"), ("g2", "b")}


def test_graph_error_cases(spark, gquads, quads):
    with pytest.raises(ValueError, match="context"):
        bgp_query(quads, "SELECT ?g WHERE { GRAPH ?g { ?x <p> ?o } }")
    # nested GRAPH is rejected (as unsupported group algebra in the block)
    with pytest.raises(ValueError, match="GRAPH"):
        bgp_query(gquads, "SELECT ?g WHERE { GRAPH ?g { GRAPH ?h "
                          "{ ?x <p> ?o } } }")


# ---------------------------------------------------------------------------
# bounded-length quantifiers {n} / {n,m} / {n,} and paths under GRAPH ?g
# (VERDICT r4 #8)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def chain_quads(spark):
    rows = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    return spark.createDataFrame(
        [(s, "p", o, None, None, "g1") for s, o in rows]
        + [("x", "q", "y", None, None, "g2")],
        "subj string, pred string, obj string, lang string, "
        "datatype string, context string",
    ).cache()


def _pairs(quads, sel):
    return {tuple(r) for r in bgp_query(quads, sel).collect()}


def test_bounded_path_quantifiers(spark, chain_quads):
    q = chain_quads
    assert _pairs(q, "SELECT ?s ?t WHERE { ?s <p>{2} ?t }") == {
        ("a", "c"), ("b", "d"), ("c", "e")}
    assert _pairs(q, "SELECT ?s ?t WHERE { ?s <p>{2,3} ?t }") == {
        ("a", "c"), ("b", "d"), ("c", "e"), ("a", "d"), ("b", "e")}
    # {0,1}: zero-length relates EVERY graph term to itself (both graphs)
    got01 = _pairs(q, "SELECT ?s ?t WHERE { ?s <p>{0,1} ?t }")
    idents = {(n, n) for n in "abcdexy"}
    hops = {("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")}
    assert got01 == idents | hops
    # {2,}: unbounded upper = 2nd power composed with the closure
    assert _pairs(q, "SELECT ?s ?t WHERE { ?s <p>{2,} ?t }") == {
        ("a", "c"), ("a", "d"), ("a", "e"), ("b", "d"), ("b", "e"),
        ("c", "e")}
    # {n} composes with the other algebra (sequence)
    assert _pairs(q, "SELECT ?s ?t WHERE { ?s <p>{2}/<p> ?t }") == {
        ("a", "d"), ("b", "e")}
    # guard rails: inverted bounds and plan-exploding bounds raise
    with pytest.raises(ValueError, match="bounds"):
        bgp_query(q, "SELECT ?s ?t WHERE { ?s <p>{3,2} ?t }").collect()
    with pytest.raises(ValueError, match="exceeds"):
        bgp_query(q, "SELECT ?s ?t WHERE { ?s <p>{2,200} ?t }").collect()


def test_path_closure_scoped_per_graph(spark):
    """GRAPH ?g { ?s <p>+ ?t }: the closure must not cross graphs — a
    chain split across two graphs yields no through-pair."""
    quads = spark.createDataFrame(
        [("a", "p", "b", None, None, "g1"),
         ("b", "p", "c", None, None, "g1"),
         ("c", "p", "d", None, None, "g2")],
        "subj string, pred string, obj string, lang string, "
        "datatype string, context string",
    )
    got = _pairs(quads, "SELECT ?g ?s ?t WHERE { GRAPH ?g { ?s <p>+ ?t } }")
    assert got == {("g1", "a", "b"), ("g1", "a", "c"), ("g1", "b", "c"),
                   ("g2", "c", "d")}
    # zero-length identity is also per graph: 'd' self-relates in g2 only
    star = _pairs(quads, "SELECT ?g ?s ?t WHERE { GRAPH ?g { ?s <p>* ?t } }")
    assert ("g2", "d", "d") in star and ("g1", "d", "d") not in star
    # bounded quantifier under GRAPH
    b = _pairs(quads, "SELECT ?g ?s ?t WHERE { GRAPH ?g { ?s <p>{2} ?t } }")
    assert b == {("g1", "a", "c")}


def test_graph_var_excludes_default_graph_rows(spark):
    """GRAPH ?g iterates NAMED graphs only: rows with NULL context (the
    default graph) must not bind ?g — and must not corrupt the per-graph
    path encoding (concat_ws silently skips NULLs; code-review r5)."""
    quads = spark.createDataFrame(
        [("a", "p", "b", None, None, "g1"),
         ("b", "p", "c", None, None, "g1"),
         ("x", "p", "y", None, None, None),   # default graph
         ("y", "p", "z", None, None, None)],
        "subj string, pred string, obj string, lang string, "
        "datatype string, context string",
    )
    got = _pairs(quads, "SELECT ?g ?s ?t WHERE { GRAPH ?g { ?s <p>+ ?t } }")
    assert got == {("g1", "a", "b"), ("g1", "b", "c"), ("g1", "a", "c")}
    # plain (non-path) pattern under GRAPH ?g: same exclusion
    plain = _pairs(quads, "SELECT ?g ?s ?t WHERE { GRAPH ?g { ?s <p> ?t } }")
    assert plain == {("g1", "a", "b"), ("g1", "b", "c")}
    # zero-length identity never materializes default-graph nodes
    star = _pairs(quads, "SELECT ?g ?s ?t WHERE { GRAPH ?g { ?s <p>* ?t } }")
    assert all(g == "g1" for g, _, _ in star)


# ---------------------------------------------------------------------------
# code-review r5 wave-2 regressions
# ---------------------------------------------------------------------------

def test_parse_bgp_rejects_graph_queries(spark, quads):
    """GRAPH blocks are extended constructs: parse_bgp must raise, not
    silently drop the graph-scoped patterns (wave-2 #3)."""
    q = ('SELECT ?s WHERE { ?s <p> ?o . GRAPH ?g { ?s <q> ?x } }')
    with pytest.raises(ValueError, match="extended query"):
        parse_bgp(q)
    with pytest.raises(ValueError, match="extended query"):
        parse_bgp('SELECT ?s WHERE { GRAPH <g1> { ?s <q> ?x } }')


def test_values_numeric_term_rejected(spark, quads):
    """_TOKEN has no numeric branch; a numeric VALUES term must raise
    instead of vanishing from the inline relation (wave-2 #4)."""
    with pytest.raises(ValueError, match="VALUES"):
        bgp_query(
            quads,
            'SELECT ?v WHERE { ?v <%s> ?t . VALUES ?v { "a" 5 } }' % TYPE,
        )


def test_count_distinct_star_and_avg_distinct(spark):
    """COUNT(DISTINCT *) counts distinct solutions; AVG(DISTINCT ?x)
    averages the distinct values (wave-2 #5)."""
    rows = [
        ("s1", "p:v", "1", None),
        ("s1", "p:v", "1", None),   # duplicate quad row
        ("s2", "p:v", "1", None),
        ("s3", "p:v", "4", None),
    ]
    q = spark.createDataFrame(
        rows, "subj string, pred string, obj string, lang string"
    )
    got = bgp_query(
        q, "SELECT (COUNT(DISTINCT *) AS ?n) WHERE { ?s <p:v> ?x }"
    ).collect()[0]["n"]
    assert got == 3  # (s1,1) (s2,1) (s3,4) — duplicate row collapsed
    avg = bgp_query(
        q, "SELECT (AVG(DISTINCT ?x) AS ?a) WHERE { ?s <p:v> ?x }"
    ).collect()[0]["a"]
    assert avg == pytest.approx(2.5)  # (1+4)/2, not (1+1+4)/3


def test_literal_braces_and_parens_parse(spark):
    """Braces/parens inside quoted literals must not confuse the block
    and FILTER scanners (wave-2 #10)."""
    rows = [("s1", "p:v", "a}b", None), ("s2", "p:v", "x)y", None),
            ("s3", "p:v", "plain", None)]
    q = spark.createDataFrame(
        rows, "subj string, pred string, obj string, lang string"
    )
    got = {r["s"] for r in bgp_query(
        q, 'SELECT ?s WHERE { ?s <p:v> "a}b" }').collect()}
    assert got == {"s1"}
    got = {r["s"] for r in bgp_query(
        q, 'SELECT ?s WHERE { ?s <p:v> ?o . FILTER(regex(?o, "x[)]y")) }'
    ).collect()}
    assert got == {"s2"}


def test_insert_preserves_store_schema(spark):
    """INSERT DATA must keep dataset/context columns (NULL-filled for
    inserted rows), matching the DELETE forms (wave-2 #6)."""
    from distributed_extraction_framework_spark.plans.bgp import sparql_update

    rows = [("s1", "p:v", "o1", None, "labels", "ctx1")]
    q = spark.createDataFrame(
        rows, "subj string, pred string, obj string, lang string, "
              "dataset string, context string"
    )
    out = sparql_update(q, 'INSERT DATA { <s2> <p:v> "o2" }')
    assert set(out.columns) == {"subj", "pred", "obj", "lang",
                                "dataset", "context"}
    got = {(r["subj"], r["obj"], r["dataset"]) for r in out.collect()}
    assert got == {("s1", "o1", "labels"), ("s2", "o2", None)}
