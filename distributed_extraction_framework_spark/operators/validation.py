"""KG shape validation — a SHACL-core subset over the quad table.

The reference emits triples and stops; production KG construction needs
a validation pass before publishing (DBpedia runs exactly this as its
post-release quality reports). Implemented as declarative constraint
shapes compiled to Catalyst plans — no Python in the hot path:

* cardinality (sh:minCount / sh:maxCount) over a target subject set
  (sh:targetSubjectsOf) — one groupBy per shape, an anti-ish left join
  for the missing-property case;
* datatype (sh:datatype) — a filtered scan;
* pattern (sh:pattern) — a filtered scan with JVM regex;
* nodeKind (sh:nodeKind IRI/Literal) — a filtered scan (an IRI object
  in this quad model is exactly ``datatype IS NULL AND lang IS NULL``).

Each shape compiles to an independent branch unioned into one
violations DataFrame; with the quad table partitioned by ``dataset``
(plans/materialize.py) the per-predicate filters prune partitions, so a
shape touches only its predicate's slice of a 100 TB store. Violations,
not conformance, are materialized — the output is error-sized, never
corpus-sized.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Shape:
    """One property shape: constraints on quads with predicate ``pred``.

    ``target_pred`` picks the focus-node set for cardinality checks
    (every subject bearing ``target_pred`` — sh:targetSubjectsOf); it
    defaults to ``pred`` itself, which makes ``min_count`` vacuous but
    keeps ``max_count`` meaningful.
    """

    name: str
    pred: str
    target_pred: str | None = None
    min_count: int | None = None
    max_count: int | None = None
    datatype: str | None = None
    pattern: str | None = None
    node_kind: str | None = None  # "IRI" | "Literal"


def _is_iri(df: DataFrame):
    return F.col("datatype").isNull() & F.col("lang").isNull()


def validate_shapes(quads: DataFrame, shapes: list[Shape]) -> DataFrame:
    """Violation rows ``(shape, rule, subj, detail)`` for every
    constraint breach; conforming data produces nothing."""
    if not shapes:
        raise ValueError("no shapes given")
    out: DataFrame | None = None

    # every shape adds 1-3 union branches over `quads`, and Catalyst
    # shares no subtrees across union branches — un-pinned, the corpus
    # upstream re-executed once per branch (audit: 6 passes on the
    # shacl_validate gate). Pin ONE narrow projection filtered to the
    # predicates the shapes actually mention (usually a sliver of the
    # corpus); every branch below filters within that set, so results
    # are unchanged. Lazy: the caller's action materializes it.
    preds = {sh.pred for sh in shapes} | {
        sh.target_pred for sh in shapes if sh.target_pred
    }
    cols = [c for c in ("subj", "pred", "obj", "lang", "datatype")
            if c in quads.columns]
    quads = (
        quads.select(*cols)
        .where(F.col("pred").isin(*preds))
        .localCheckpoint(eager=False)
    )

    def emit(df: DataFrame) -> None:
        nonlocal out
        out = df if out is None else out.unionByName(df)

    for sh in shapes:
        prop = quads.where(F.col("pred") == sh.pred)
        if sh.min_count is not None or sh.max_count is not None:
            target_pred = sh.target_pred or sh.pred
            targets = (
                quads.where(F.col("pred") == target_pred)
                .select("subj")
                .distinct()
            )
            counts = prop.groupBy("subj").agg(
                F.count(F.lit(1)).alias("c")
            )
            with_c = targets.join(counts, "subj", "left").select(
                "subj", F.coalesce(F.col("c"), F.lit(0)).alias("c")
            )
            if sh.min_count is not None:
                emit(
                    with_c.where(F.col("c") < sh.min_count).select(
                        F.lit(sh.name).alias("shape"),
                        F.lit("minCount").alias("rule"),
                        "subj",
                        F.col("c").cast("string").alias("detail"),
                    )
                )
            if sh.max_count is not None:
                emit(
                    with_c.where(F.col("c") > sh.max_count).select(
                        F.lit(sh.name).alias("shape"),
                        F.lit("maxCount").alias("rule"),
                        "subj",
                        F.col("c").cast("string").alias("detail"),
                    )
                )
        if sh.datatype is not None:
            emit(
                prop.where(
                    F.coalesce(F.col("datatype"), F.lit(""))
                    != sh.datatype
                ).select(
                    F.lit(sh.name).alias("shape"),
                    F.lit("datatype").alias("rule"),
                    "subj",
                    F.coalesce(F.col("datatype"), F.lit("")).alias(
                        "detail"
                    ),
                )
            )
        if sh.pattern is not None:
            emit(
                prop.where(~F.col("obj").rlike(sh.pattern)).select(
                    F.lit(sh.name).alias("shape"),
                    F.lit("pattern").alias("rule"),
                    "subj",
                    F.col("obj").alias("detail"),
                )
            )
        if sh.node_kind is not None:
            if sh.node_kind not in ("IRI", "Literal"):
                raise ValueError(f"bad node_kind: {sh.node_kind}")
            bad = (
                ~_is_iri(prop)
                if sh.node_kind == "IRI"
                else _is_iri(prop)
            )
            emit(
                prop.where(bad).select(
                    F.lit(sh.name).alias("shape"),
                    F.lit("nodeKind").alias("rule"),
                    "subj",
                    F.col("obj").alias("detail"),
                )
            )
    if out is None:
        raise ValueError("shapes declare no constraints")
    return out


def functional_properties(
    quads: DataFrame, threshold: float = 0.99
) -> DataFrame:
    """Schema discovery: which predicates behave as owl:FunctionalProperty
    → ``(pred, n_subjects, n_multi, functional)`` where ``n_multi``
    counts subjects carrying >1 distinct object and ``functional`` is
    true when ≥ ``threshold`` of subjects are single-valued.

    The profiling pass that seeds shape definitions for
    :func:`validate_shapes` (run it once, turn the functional
    predicates into maxCount=1 shapes). Two aggregations whose keys
    share the ``pred`` prefix — the second reuses the first's
    partitioning; output is predicate-vocabulary-sized.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1]: {threshold}")
    per_subj = quads.groupBy("pred", "subj").agg(
        F.countDistinct("obj").alias("n_obj")
    )
    return per_subj.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_subjects"),
        F.sum(F.when(F.col("n_obj") > 1, 1).otherwise(0)).alias("n_multi"),
        (
            (F.count(F.lit(1)) - F.sum(F.when(F.col("n_obj") > 1, 1).otherwise(0)))
            / F.count(F.lit(1))
            >= F.lit(threshold)
        ).alias("functional"),
    )


_NUMERIC_DT = (
    "http://www.w3.org/2001/XMLSchema#integer",
    "http://www.w3.org/2001/XMLSchema#int",
    "http://www.w3.org/2001/XMLSchema#long",
    "http://www.w3.org/2001/XMLSchema#decimal",
    "http://www.w3.org/2001/XMLSchema#double",
    "http://www.w3.org/2001/XMLSchema#float",
)


def numeric_outliers(
    quads: DataFrame,
    k: float = 3.5,
    approx: bool = False,
) -> DataFrame:
    """Robust per-predicate outlier detection over numeric literals →
    ``(subj, pred, value, med, mad, z)`` for every value whose modified
    z-score ``0.6745·(v − median)/MAD`` exceeds ``k`` in magnitude
    (Iglewicz & Hoaglin 1993, the published robust-outlier rule — a
    population figure typo'd 100× survives mean/σ screening because it
    drags σ with it; it cannot drag the median).

    Completes the data-quality family (SHACL shapes, functional-property
    discovery, fusion conflict reports, class completeness): those catch
    STRUCTURAL breakage, this catches plausible-shaped but wrong VALUES
    — the classic broken-unit-conversion extractor regression.

    Predicates whose MAD is 0 (half the values identical) produce no
    rows — no dispersion, no robust scale. Non-castable lexical forms
    drop out via ``try_cast``.

    Scale shape: the stats table is PREDICATE-sized — two aggregations
    (median, then MAD of residuals) joined back by one broadcast-able
    equi-join on ``pred``; the violations output is error-sized. Exact
    ``percentile`` shuffles each predicate's values to one reducer —
    fine to vocabulary-scale; at 10^12 triples set ``approx=True`` for
    the one-pass ``percentile_approx`` sketch (same two-tier pattern as
    materialize.void_stats' exact/HLL switch).
    """
    pct = (
        (lambda c: F.percentile_approx(c, 0.5, 100000))
        if approx
        else (lambda c: F.percentile(c, 0.5))
    )
    # materialized once (lazy): three consumers below (median aggregate,
    # MAD aggregate, final violation join) would each re-run the upstream
    # plan otherwise — and the numeric-literal projection is a narrow
    # filtered subset of the corpus, exactly the thing worth keeping
    vals = quads.filter(F.col("datatype").isin(*_NUMERIC_DT)).select(
        "subj", "pred", F.col("obj").try_cast("double").alias("value")
    ).filter(F.col("value").isNotNull()).localCheckpoint(eager=False)
    med = vals.groupBy("pred").agg(pct(F.col("value")).alias("med"))
    mad = (
        vals.join(F.broadcast(med), "pred")
        .groupBy("pred", "med")
        .agg(pct(F.abs(F.col("value") - F.col("med"))).alias("mad"))
        .filter(F.col("mad") > 0)
    )
    z = F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        vals.join(F.broadcast(mad), "pred")
        .withColumn("z", F.round(z, 6))
        .filter(F.abs(F.col("z")) > k)
        .select(
            "subj", "pred", "value",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "z",
        )
    )
