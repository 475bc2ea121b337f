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
                     F.col(class_col).alias("cls")).distinct()
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
