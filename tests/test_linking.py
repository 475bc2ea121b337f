"""Entity linking: Aho-Corasick mention detection + salted candidate join."""

from pyspark.sql import functions as F

from distributed_extraction_framework_spark.operators.extractors import extract
from distributed_extraction_framework_spark.operators.linking import (
    AhoCorasick,
    detect_mentions,
    link_entities,
    score_candidates,
    surface_forms_from_labels,
)


def test_aho_corasick_unit():
    ac = AhoCorasick(["he", "she", "his", "hers"])
    assert sorted(ac.find_all("ushers")) == ["he", "hers", "she"]
    ac2 = AhoCorasick(["article 5", "article 55"])
    hits = ac2.find_all("see article 55 here")
    assert hits == ["article 5", "article 55"]
    assert AhoCorasick([]).find_all("anything") == []


def test_surface_forms(spark, pages_df):
    quads = extract(pages_df, extractors=["labels", "category_labels"]).cache()
    sf = surface_forms_from_labels(quads)
    rows = sf.collect()
    assert rows and all(0 < r["prior"] <= 1.0 for r in rows)
    assert all(r["surface"] == r["surface"].lower() for r in rows)


def test_detect_and_link(spark, pages_df):
    quads = extract(pages_df, extractors=["labels"]).cache()
    sf = surface_forms_from_labels(quads).cache()
    mentions = detect_mentions(pages_df, sf).cache()
    assert mentions.count() > 0
    # pages link to other articles by title, so mention text must exist
    m = mentions.limit(5).collect()
    texts = {r["url"]: (r["text"] or "").lower() for r in pages_df.collect()}
    for r in m:
        assert r["surface"] in texts[r["page"]]
        assert r["n_mentions"] >= 1

    linked = link_entities(pages_df, sf)
    rows = linked.collect()
    assert rows
    # exactly one winning entity per (page, surface)
    keys = [(r["subj"], r["surface"]) for r in rows]
    assert len(keys) == len(set(keys))
    assert all(r["dataset"] == "entity_links" for r in rows)


def test_salted_join_matches_unsalted(spark, pages_df):
    """Salting is a physical optimization — results must be identical."""
    quads = extract(pages_df, extractors=["labels"]).cache()
    sf = surface_forms_from_labels(quads).cache()
    mentions = detect_mentions(pages_df, sf).cache()
    a = {
        (r["page"], r["surface"], r["entity"])
        for r in score_candidates(mentions, sf, salt_buckets=1).collect()
    }
    b = {
        (r["page"], r["surface"], r["entity"])
        for r in score_candidates(mentions, sf, salt_buckets=8).collect()
    }
    assert a == b


def test_head_entity_skew_spreads(spark):
    """A head surface's candidates must land in all salt buckets."""
    import pandas as pd

    mentions = spark.createDataFrame(
        pd.DataFrame(
            {
                "page": [f"p{i}" for i in range(200)],
                "surface": ["head"] * 160 + [f"tail{i}" for i in range(40)],
                "n_mentions": [1] * 200,
            }
        )
    )
    m = mentions.withColumn(
        "salt", F.pmod(F.xxhash64("page"), F.lit(8)).cast("int")
    )
    dist = (
        m.filter(F.col("surface") == "head").groupBy("salt").count().collect()
    )
    assert len(dist) == 8, "head surface must spread over all 8 salt buckets"
    assert max(r["count"] for r in dist) <= 160 / 8 * 3


def test_broadcast_scoring_plan_has_no_shuffle_join(spark, pages_df):
    """The small-dictionary path must plan a BroadcastHashJoin (no shuffle
    to salt); the salted path must shuffle on (surface, salt)."""
    quads = extract(pages_df, extractors=["labels"])
    sf = surface_forms_from_labels(quads)
    mentions = detect_mentions(pages_df, sf)
    small = score_candidates(mentions, sf, salt_buckets=0)
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_small
    salted = score_candidates(mentions, sf, salt_buckets=8)
    plan_salted = salted._jdf.queryExecution().executedPlan().toString()
    assert "salt" in plan_salted
