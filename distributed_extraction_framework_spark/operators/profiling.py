"""KG profiling: entity summaries and per-class property completeness.

Publish-side analytics over the materialized triple store — the pieces
a KG consumer looks at before trusting the graph (complementing
plans/materialize.void_stats, which profiles datasets, not classes):

* ``entity_summaries`` — top-k facts per entity ranked by predicate
  informativeness (rarer predicate = more informative, the LinkSum/
  RELIN heuristic), fully deterministic tie-breaks — the "entity card"
  a search surface renders.
* ``class_completeness`` — for every (class, predicate) observed on the
  class's instances: what fraction of instances carry the predicate.
  The density matrix that drives both schema discovery and extraction-
  regression alarms (a release where dbo:populationTotal coverage on
  City drops 30% is a broken extractor, not a changed world).

Scale shape: predicate counts are |P|-sized and broadcast; the per-
entity top-k is one window over the subject-partitioned shuffle
(map-side combine does nothing for windows, but the rank prunes to k
rows per subject before anything else consumes it); completeness is two
hash aggregations on (class, pred) after an instance-keyed join —
type tables at 10^12 scale are bucketed by instance in the warehouse so
that join co-locates.

Reference parity: no counterpart (the reference emits datasets and
stops); SURVEY.md §2 'beyond the reference' family.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def entity_summaries(
    triples: DataFrame, k: int = 3, type_pred: str | None = None
) -> DataFrame:
    """(subj, pred, obj, rank) — the k most informative facts per
    subject: predicates ranked by ascending global frequency (rare
    first), ties by (pred ASC, obj ASC). ``type_pred`` (e.g. rdf:type),
    when given, is excluded — type arcs belong to the card header, not
    the fact list."""
    d = triples.select("subj", "pred", "obj").distinct()
    if type_pred is not None:
        d = d.filter(F.col("pred") != type_pred)
    # two consumers (the predicate counts and the ranked join) — pinned
    # once so the upstream is not re-executed per branch (guide §3.3;
    # lazy: the caller's first action materializes it)
    d = d.localCheckpoint(eager=False)
    counts = d.groupBy("pred").agg(F.count("*").alias("_pn"))
    w = Window.partitionBy("subj").orderBy(
        F.col("_pn").asc(), F.col("pred").asc(), F.col("obj").asc()
    )
    return (
        d.join(F.broadcast(counts), "pred")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("subj", "pred", "obj", "rank")
    )


def class_completeness(
    types: DataFrame,
    triples: DataFrame,
    inst_col: str = "inst",
    class_col: str = "cls",
) -> DataFrame:
    """(cls, pred, n_instances, n_with_pred, completeness) for every
    predicate observed on at least one instance of the class.
    ``completeness`` = n_with_pred / n_instances, double rounded 6 dp.
    """
    t = types.select(F.col(inst_col).alias("inst"),
                     F.col(class_col).alias("cls")).distinct() \
        .localCheckpoint(eager=False)  # 2 consumers: sizes + the join
    sizes = t.groupBy("cls").agg(F.count("*").alias("n_instances"))
    has = (
        triples.select(F.col("subj").alias("inst"), "pred").distinct()
        .join(t, "inst")
        .groupBy("cls", "pred")
        .agg(F.count("*").alias("n_with_pred"))
    )
    return (
        has.join(F.broadcast(sizes), "cls")
        .select(
            "cls", "pred", "n_instances", "n_with_pred",
            F.round(
                F.col("n_with_pred").cast("double") / F.col("n_instances"), 6
            ).alias("completeness"),
        )
    )


def sdtype_infer(
    quads: DataFrame,
    types: DataFrame,
    min_score: float = 0.0,
    use_inverse: bool = True,
    resource_obj_pattern: str | None = None,
) -> DataFrame:
    """Type completion for untyped entities → ``(entity, cls, score)``,
    the best-scoring class per untyped entity (SDType — Paulheim &
    Bizer, ISWC 2013 — in its uniform-weight form; the published weight
    refinement multiplies each predicate's vote by its discriminability,
    which changes ranking only when predicate distributions are near-
    uniform).

    A predicate carries a type distribution: P(t | entity uses p) over
    the TYPED entities using it. An untyped entity's score for class t
    averages that conditional over its own predicates (outgoing ``p``
    and, with ``use_inverse``, incoming ``^p`` — incoming edges type
    objects: whatever ``dbo:author`` points at is probably a Person);
    predicates whose distribution is unknown contribute 0 through the
    denominator. Winner per entity = highest score ≥ ``min_score``, ties
    broken by class string.

    Scale shape: the (entity, pred) feature set is one distinct over the
    corpus; the conditional table is predicate×class-sized (schema-ish —
    broadcastable); scoring is one broadcast join + one groupBy on the
    entity key. Nothing is pairwise in entities.
    """
    # inverse-feature gate: which objects count as ENTITIES. Null
    # datatype/lang is necessary but NOT sufficient — several producers
    # (e.g. plans/webkg) emit PLAIN literals with both null, and a
    # literal that equals a real entity label would merge votes with it
    # (code-review r5 wave-4 #2). Pass resource_obj_pattern (e.g.
    # '^https?://' for a web KG whose entities are IRIs) to add the
    # decisive shape test; the default stays None because entity ids are
    # not IRIs in every graph (e.g. curie-style ids).
    res_obj = F.col("datatype").isNull() if "datatype" in quads.columns \
        else F.lit(True)
    if "lang" in quads.columns:
        res_obj = res_obj & F.col("lang").isNull()
    if resource_obj_pattern is not None:
        res_obj = res_obj & F.col("obj").rlike(resource_obj_pattern)
    feats = quads.select(F.col("subj").alias("entity"), "pred")
    if use_inverse:
        feats = feats.unionByName(
            quads.where(res_obj).select(
                F.col("obj").alias("entity"),
                F.concat(F.lit("^"), F.col("pred")).alias("pred"),
            )
        )
    # three consumers (typed join, untyped anti-join — itself consumed
    # twice below) — un-pinned, the distinct union over the corpus ran
    # up to 6x in one plan (audit: 14 scans on the gate)
    feats = feats.distinct().localCheckpoint(eager=False)

    t = types.select(F.col("entity").alias("__e"), "cls")
    typed_feats = feats.join(t, feats["entity"] == F.col("__e")).select(
        "entity", "pred", "cls"
    )
    per_pt = typed_feats.groupBy("pred", "cls").agg(
        F.count_distinct("entity").alias("n_pt")
    )
    per_p = per_pt.groupBy("pred").agg(F.sum("n_pt").alias("n_p"))
    cond = per_pt.join(per_p, "pred").select(
        "pred", "cls", (F.col("n_pt") / F.col("n_p")).alias("p_t")
    )

    untyped = feats.join(t.select("__e"), feats["entity"] == F.col("__e"),
                         "left_anti").localCheckpoint(eager=False)
    n_feats = untyped.groupBy("entity").agg(
        F.count(F.lit(1)).alias("n_feats")
    )
    scores = (
        untyped.join(F.broadcast(cond), "pred")
        .groupBy("entity", "cls")
        .agg(F.sum("p_t").alias("vote"))
        .join(n_feats, "entity")
        .select(
            "entity", "cls",
            F.round(F.col("vote") / F.col("n_feats"), 6).alias("score"),
        )
        .where(F.col("score") >= min_score)
    )
    wbest = Window.partitionBy("entity").orderBy(
        F.desc("score"), F.asc("cls")
    )
    return (
        scores.withColumn("__rn", F.row_number().over(wbest))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def characteristic_sets(
    quads: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    sep: str = "|",
) -> DataFrame:
    """Characteristic-set statistics (Neumann & Moerkotte, ICDE 2011,
    public) → ``(cs, n_preds, n_subjects, n_triples)``: for every
    distinct predicate COMBINATION observed on a subject (its
    characteristic set, rendered as the ``sep``-joined sorted predicate
    list), how many subjects carry exactly that set and how many triples
    they hold in total.

    This is THE cardinality statistic for star-shaped SPARQL joins: a
    BGP asking ``?s :name ?n ; :size ?z`` matches exactly the subjects
    whose characteristic set is a superset of {name, size}, so summing
    ``n_subjects`` over superset rows answers the cardinality question
    without touching the triple table — the published technique RDF-3X
    and modern SPARQL optimizers use. It doubles as a structural profile
    of what entity SHAPES the 10^12-triple graph actually contains
    (schema discovery without a schema).

    Scale shape: one subject-keyed aggregation (map-side-combinable;
    ``collect_set`` keeps only distinct predicates per subject —
    bounded by |P|, a few thousand, not by the subject's triple count)
    followed by a second aggregation on the set itself, whose output is
    characteristic-set-sized: Neumann & Moerkotte measure ~10³-10⁴
    distinct sets on billion-triple graphs. No joins, no explode.
    """
    per_subj = quads.groupBy(subj_col).agg(
        F.concat_ws(sep, F.sort_array(F.collect_set(pred_col))).alias("cs"),
        F.count(F.lit(1)).alias("__n"),
    )
    return (
        per_subj.groupBy("cs")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_subjects"),
            F.sum("__n").cast("long").alias("n_triples"),
        )
        .select(
            "cs",
            F.size(F.split("cs", re.escape(sep))).alias("n_preds"),
            "n_subjects",
            "n_triples",
        )
    )


def schema_graph(
    quads: DataFrame,
    type_pred: str = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
    untyped: str = "<untyped>",
) -> DataFrame:
    """Class-level quotient summary of the KG → ``(src_cls, pred,
    dst_cls, n_edges, n_src)`` — the ABSTAT-style (Spahiu et al. 2016,
    public) schema graph a consumer reads to learn what the 10^12-triple
    graph actually contains without scanning it.

    Semantics: every non-type edge is lifted to the classes of its
    endpoints (all (src-type, dst-type) pairs for multi-typed entities —
    fan-out bounded by types-per-entity, a small constant in practice);
    entities with no ``type_pred`` fact summarize under ``untyped`` so
    coverage is total; literal objects summarize under their datatype,
    ``<langString>`` for language-tagged strings, ``<plain>`` for bare
    string literals (resource = datatype-less, lang-less, URI-shaped —
    plans/materialize._is_resource's test, plus the lang guard).
    ``n_src`` = distinct subjects carrying the (src_cls, pred, dst_cls)
    arc — the selectivity signal next to the raw edge count.

    Scale shape: the type table is entity-sized and both lifts are
    instance-keyed equi-joins (the dst-side join key is NULLed for
    literal rows, so literals never shuffle through the type join's
    match side); the summary itself is schema-sized. One groupBy; the
    exact ``count_distinct`` adds one expand — swap for
    ``approx_count_distinct`` at 10^12 edges if 2% error is acceptable.
    """
    res_obj = (
        F.col("datatype").isNull()
        & F.col("lang").isNull()
        & F.col("obj").rlike(r"^https?://")
    )
    t = (
        quads.filter(F.col("pred") == type_pred)
        .select(F.col("subj").alias("__i"), F.col("obj").alias("__c"))
        .distinct()
        # consumed as BOTH lift sides — pinned so the type-table distinct
        # runs once, not per side
        .localCheckpoint(eager=False)
    )
    e = quads.filter(F.col("pred") != type_pred).select(
        "subj", "pred", "obj", "lang", "datatype",
        # join key only for resource objects: literal rows carry NULL and
        # fall out of the match side of the left join below
        F.when(res_obj, F.col("obj")).alias("__ok"),
    )
    src = t.withColumnsRenamed({"__i": "__si", "__c": "__sc"})
    dst = t.withColumnsRenamed({"__i": "__di", "__c": "__dc"})
    lifted = (
        e.join(src, e["subj"] == src["__si"], "left")
        .join(dst, e["__ok"] == dst["__di"], "left")
        .select(
            F.coalesce("__sc", F.lit(untyped)).alias("src_cls"),
            "pred",
            F.when(F.col("datatype").isNotNull(), F.col("datatype"))
            .when(F.col("lang").isNotNull(), F.lit("<langString>"))
            .when(F.col("__ok").isNull(), F.lit("<plain>"))
            .otherwise(F.coalesce("__dc", F.lit(untyped)))
            .alias("dst_cls"),
            "subj",
        )
    )
    return lifted.groupBy("src_cls", "pred", "dst_cls").agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.count_distinct("subj").alias("n_src"),
    )
