"""Physical-plan property tests: the plans we'd want at 100 TB, asserted.

These lock in the scale-critical properties .explain() review found:
pushdown, pruning, broadcast choices, shuffle counts, codegen usage.
"""

import re

import pytest
from pyspark.sql import functions as F

from distributed_extraction_framework_spark.operators import dedup, similarity
from distributed_extraction_framework_spark.operators.extractors import (
    extract,
    extractor_df,
)
from distributed_extraction_framework_spark.operators.linking import (
    score_candidates,
    surface_forms_from_labels,
)
from distributed_extraction_framework_spark.plans.driver_queries import (
    q_part_type_stats,
    q_pricing_summary,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_projection_extractor_prunes_text(spark, tmp_path, pages_df):
    """page_ids must never read the fat text/html columns."""
    p = str(tmp_path / "pages")
    pages_df.write.mode("overwrite").parquet(p)
    df = extractor_df(spark.read.parquet(p), "page_ids")
    m = re.search(r"ReadSchema: ([^\n]+)", _plan(df))
    assert m and "text" not in m.group(1) and "html" not in m.group(1)


def test_lang_filter_pushed_to_scan(spark, tmp_path, pages_df):
    p = str(tmp_path / "pages2")
    pages_df.write.mode("overwrite").parquet(p)
    df = extract(
        spark.read.parquet(p).filter(F.col("lang") == "en"),
        extractors=["labels"],
    )
    m = re.search(r"PushedFilters: \[([^\]]*)\]", _plan(df))
    assert m and "lang" in m.group(1), _plan(df)


def test_full_extract_single_stage(spark, pages_df):
    plan = _plan(extract(pages_df))
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") == 1  # exactly one pandas pass


def test_dimension_join_broadcasts(spark):
    sf = "/root/testdata/sf0.001"
    plan = _plan(q_part_type_stats(spark, sf))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pricing_summary_partial_agg(spark):
    """The groupBy must map-side combine (two HashAggregate levels)."""
    plan = _plan(q_pricing_summary(spark, "/root/testdata/sf0.001"))
    assert plan.count("HashAggregate") >= 2


def test_minhash_lsh_no_cartesian(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(dedup.minhash_lsh_pairs(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_band_join_ships_no_signatures(spark):
    """Round-5 endurance finding: the banded self-join + candidate-pair
    dedup must ship (id_a, id_b) ONLY — carrying both 550 B signature
    arrays through every banded row was a >100 GB shuffle at 10M docs.
    The slim projection (exactly the two id columns, no minhash/mh_*)
    must exist between the band join and the pair shuffle."""
    import re as _re

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(dedup.minhash_lsh_pairs(docs))
    slim = [
        l for l in plan.splitlines()
        if _re.search(r"Project \[[^\[\]]*\bid_a#\d+[^\[\]]*\]", l)
        and "minhash" not in l and "mh_" not in l and "jaccard" not in l
    ]
    assert slim, plan


def test_lsh_topk_equi_join_only(spark):
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _plan(similarity.lsh_topk(embs.limit(5), embs, dim=64, n_tables=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_salted_linking_join_is_equi(spark, pages_df):
    quads = extract(pages_df, extractors=["labels"])
    sfd = surface_forms_from_labels(quads)
    from distributed_extraction_framework_spark.operators.linking import (
        detect_mentions,
    )

    mentions = detect_mentions(pages_df, sfd)
    plan = _plan(score_candidates(mentions, sfd, salt_buckets=8))
    assert "CartesianProduct" not in plan
    # the join key includes the salt column
    assert "salt" in plan


def test_ngram_inverted_index_no_cartesian(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(dedup.ngram_jaccard_pairs(docs, threshold=0.9))
    assert "CartesianProduct" not in plan


def test_topk_window_prunes_below_exchange(spark):
    """The exact top-k's rank<=k filter must compile to a PARTIAL
    WindowGroupLimit BELOW the merge exchange — i.e. each map partition
    ships only its per-query top-k, never the full |Q|x|C| cross product."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    plan = _plan(similarity.cosine_topk_bruteforce(e.limit(5), e, k=3))
    partial = plan.find("row_number(), 3, Partial")
    exchange = plan.find("Exchange hashpartitioning(query_id")
    assert partial != -1 and exchange != -1, plan
    # physical plans print top-down: the Partial limit is DEEPER (later in
    # the string) than the exchange it feeds
    assert partial > exchange, plan


def test_ivf_assign_is_map_only(spark):
    """Cell assignment must not shuffle the corpus: centroids are plan
    literals, so the only Exchanges in ivf_topk belong to the final
    rank/dedup stage, and assignment itself adds none."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    cents = [(i, [0.1 * (i + 1)] * 64) for i in range(4)]
    assigned = similarity._assign_cells(
        e.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v")),
        "v", cents, 1,
    )
    assert "Exchange" not in _plan(assigned)


def test_stream_exact_dedup_state_keys_on_digest(spark):
    """The streaming dedup aggregation shuffles 32-char digests, not
    document bodies: its single Exchange partitions on the digest column."""
    from distributed_extraction_framework_spark.streaming import events as STR

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(STR.stream_exact_dedup(docs))  # batch plan, same shape
    m = re.search(r"Exchange hashpartitioning\((\w+)", plan)
    assert m and m.group(1).startswith("digest"), plan


def test_bgp_join_plan_is_equi_join_with_pushed_filters(spark):
    """BGP pattern joins must be hash equi-joins on the shared variable —
    no cartesian/nested-loop — and each pattern's constant predicate
    filter must sit in the scan-side plan, not post-join."""
    from distributed_extraction_framework_spark import schema as S
    from distributed_extraction_framework_spark.plans.bgp import bgp_query

    quads = spark.createDataFrame(
        [("a", S.DBO_WIKI_LINK, "b", None), ("b", S.DCT_SUBJECT, "c", None)],
        "subj string, pred string, obj string, lang string",
    )
    df = bgp_query(
        quads,
        f"SELECT ?doc ?cat WHERE {{ ?doc <{S.DBO_WIKI_LINK}> ?mid . "
        f"?mid <{S.DCT_SUBJECT}> ?cat }}",
    )
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # both constant-predicate filters present (pattern selection pushed
    # into each scan branch, not evaluated after the join)
    assert plan.count("wikiPageWikiLink") >= 1 and plan.count("subject") >= 1


def test_instance_types_transitive_joins_broadcast(spark):
    """Corpus-scale types × ontology closure must be a broadcast (map-side)
    join — the ontology is bounded, the types table is not."""
    from distributed_extraction_framework_spark import schema as S
    from distributed_extraction_framework_spark.operators.mapping import (
        instance_types_transitive,
        subclass_edges,
    )

    O = S.ONTOLOGY
    quads = spark.createDataFrame(
        [("instance_types", "s1", S.RDF_TYPE, O + "A", None, None, "ctx")],
        "dataset string, subj string, pred string, obj string, "
        "lang string, datatype string, context string",
    )
    edges = subclass_edges(spark, [(O + "A", O + "B"), (O + "B", O + "C")])
    plan = _plan(instance_types_transitive(quads, edges))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bgp_minus_exists_compile_to_anti_semi_joins(spark):
    """MINUS and FILTER [NOT] EXISTS must compile to single anti/semi
    hash-join probes — never a correlated per-row subquery or a
    nested-loop join."""
    from distributed_extraction_framework_spark import schema as S
    from distributed_extraction_framework_spark.plans.bgp import bgp_query

    quads = spark.createDataFrame(
        [("a", S.RDFS_LABEL, "A", None), ("a", S.DCT_SUBJECT, "c", None)],
        "subj string, pred string, obj string, lang string",
    )
    minus_plan = _plan(bgp_query(
        quads,
        f"SELECT ?s WHERE {{ ?s <{S.RDFS_LABEL}> ?l . "
        f"MINUS {{ ?s <{S.DCT_SUBJECT}> ?c }} }}",
    ))
    assert "LeftAnti" in minus_plan
    assert "CartesianProduct" not in minus_plan

    exists_plan = _plan(bgp_query(
        quads,
        f"SELECT ?s WHERE {{ ?s <{S.RDFS_LABEL}> ?l . "
        f"FILTER EXISTS {{ ?s <{S.DCT_SUBJECT}> ?c }} }}",
    ))
    assert "LeftSemi" in exists_plan
    assert "CartesianProduct" not in exists_plan


def test_bgp_scalar_subquery_is_one_row_broadcast(spark):
    """A 0-shared-var scalar-aggregate subquery must appear as a 1-row
    broadcast nested-loop (the only sound plan for a join without keys),
    NOT a shuffled product of two corpus-sized sides."""
    from distributed_extraction_framework_spark import schema as S
    from distributed_extraction_framework_spark.plans.bgp import bgp_query

    quads = spark.createDataFrame(
        [("a", S.DBO_WIKI_LINK, "b", None)],
        "subj string, pred string, obj string, lang string",
    )
    plan = _plan(bgp_query(
        quads,
        f"SELECT ?s ?tot WHERE {{ ?s <{S.DBO_WIKI_LINK}> ?o . "
        f"{{ SELECT (COUNT(?o2) AS ?tot) WHERE {{ ?s2 <{S.DBO_WIKI_LINK}> ?o2 }} }} }}",
    ))
    # the 1-row aggregate side is broadcast; a CartesianProduct of two
    # unaggregated scans would be the scale bug this test guards against
    assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2  # partial+final global agg


def test_repetition_stats_plan_is_shuffle_free(spark):
    """Doc-local diagnostics must never shuffle: the whole computation is
    one projection (sorted-array run-length expressions), no explode →
    groupBy round trip."""
    from distributed_extraction_framework_spark.operators.curation import (
        repetition_stats,
    )

    docs = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    plan = _plan(repetition_stats(docs))
    assert "Exchange" not in plan


def test_decontamination_plan_broadcasts_probes(spark):
    """The corpus side must not be globally distinct-shuffled (per-doc
    dedup is in-projection); the probe shingles join as a broadcast."""
    from distributed_extraction_framework_spark.operators.curation import (
        ngram_collisions,
    )
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(i, "w x y z a b c d e f") for i in range(10)],
        "doc_id long, text string",
    )
    plan = _plan(ngram_collisions(docs, docs.filter(F.col("doc_id") < 2), n=3))
    assert "BroadcastHashJoin" in plan
    # exactly the collision groupBy (+AQE reads) may shuffle — no
    # corpus-wide distinct exchange on (doc, shingle) strings
    assert "CartesianProduct" not in plan


def test_cocitation_and_fuzzy_match_never_cartesian(spark):
    from distributed_extraction_framework_spark.operators.graph import (
        cocitation_pmi,
    )
    from distributed_extraction_framework_spark.operators.linking import (
        fuzzy_label_match,
    )

    edges = spark.createDataFrame(
        [("p1", "A"), ("p1", "B"), ("p2", "A"), ("p2", "B")],
        "src string, dst string",
    )
    assert "CartesianProduct" not in _plan(cocitation_pmi(edges, min_count=1))
    c = spark.createDataFrame([("abc",)], "name string")
    l = spark.createDataFrame([("abd",)], "label string")
    plan = _plan(fuzzy_label_match(c, l, max_dist=2))
    assert "CartesianProduct" not in plan
    # the levenshtein verify runs AFTER the (block, length) equi-join
    assert "levenshtein" in plan.lower()


def test_rdfs_entailment_rules_are_broadcast_joins(spark):
    from distributed_extraction_framework_spark.operators.reasoning import (
        rdfs_entailment,
    )

    quads = spark.createDataFrame(
        [("a", "p", "b")], "subj string, pred string, obj string"
    )
    dom = spark.createDataFrame([("p", "C")], "prop string, cls string")
    sc = spark.createDataFrame([("C", "D")], "src string, dst string")
    plan = _plan(rdfs_entailment(quads, subclass=sc, domains=dom))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_crawl_index_ops_are_shuffle_free(spark):
    """The per-page crawl-index projections (CDX records, canonical
    collapse, hreflang clustering, feed parsing) must stay single-stage:
    zero Exchanges, zero Python."""
    from distributed_extraction_framework_spark.operators.webarchive import (
        canonical_collapse,
        cdx_index,
        hreflang_clusters,
    )
    from distributed_extraction_framework_spark.sources.feeds import (
        parse_feeds,
    )

    pages = spark.createDataFrame(
        [(1, "https://a.example/x", "2024-01-01 00:00:00",
          '<link rel="canonical" href="/c">')],
        "page_id long, url string, warc_ts string, html string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    feeds = pages.select(F.col("page_id").alias("feed_id"),
                         F.col("html").alias("xml"))
    for df in (cdx_index(pages), canonical_collapse(pages),
               hreflang_clusters(pages), parse_feeds(feeds)):
        plan = _plan(df)
        assert "Exchange" not in plan, plan
        assert "Python" not in plan, plan


def test_fetch_schedule_one_shuffle_and_broadcast_delays(spark):
    """fetch_schedule: exactly ONE data shuffle (the per-host window
    partitioning — the irreducible politeness key) and the delay table
    joins as a broadcast, never a shuffled join."""
    from distributed_extraction_framework_spark.operators.webarchive import (
        fetch_schedule,
    )

    frontier = spark.createDataFrame(
        [(f"https://h{i % 3}.example/{i}", float(i)) for i in range(30)],
        "url string, prio double",
    )
    delays = spark.createDataFrame(
        [("h0.example", 2.0)], "host string, crawl_delay double"
    )
    plan = _plan(fetch_schedule(frontier, delays, priority_col="prio"))
    assert len(re.findall(r"Exchange hashpartitioning\(host", plan)) == 1
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_bpe_word_counts_single_corpus_shuffle(spark):
    """BPE training touches the corpus ONCE: word_counts' plan has exactly
    one Exchange (hashpartitioning on word) and partial aggregation below
    it — everything downstream is vocabulary-sized."""
    from distributed_extraction_framework_spark.operators.tokenizer import (
        word_counts,
    )

    docs = spark.createDataFrame(
        [(i, "a b c a") for i in range(10)], "doc_id long, text string"
    )
    plan = _plan(word_counts(docs))
    assert plan.count("Exchange") == 1, plan
    assert "Exchange hashpartitioning(word" in plan, plan


def test_bpe_pair_counts_no_extra_corpus_shuffle(spark):
    """pair_counts over the symbolized vocab adds only the pair-key
    Exchange on top of word_counts' — never a corpus-sized one — and no
    cartesian anywhere."""
    from distributed_extraction_framework_spark.operators.tokenizer import (
        bpe_pair_counts,
    )

    docs = spark.createDataFrame(
        [(i, "a b c a") for i in range(10)], "doc_id long, text string"
    )
    plan = _plan(bpe_pair_counts(docs))
    assert plan.count("Exchange") == 2, plan
    assert "CartesianProduct" not in plan


def test_schema_graph_equi_joins_only(spark):
    """schema_graph's two class lifts must stay equi-joins (instance
    keys), never a cartesian / nested-loop over the edge set."""
    from distributed_extraction_framework_spark.operators.profiling import (
        schema_graph,
    )

    quads = spark.createDataFrame(
        [("http://e/1", "http://p/x", "http://e/2", None, None)],
        "subj string, pred string, obj string, lang string, datatype string",
    )
    plan = _plan(schema_graph(quads))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
