"""Horn-rule mining over the materialized triple store (AMIE-style).

A KG built from 10^12 crawled pages is incomplete; the standard way to
densify it (and to sanity-check extraction) is mining high-confidence
Horn rules from the graph itself — ``capitalOf(x,y) <= cityIn(x,y)``,
``spouse(x,y) <= spouse(y,x)`` — then applying them. This module mines
the two rule shapes that cover the bulk of AMIE's useful output:

* ``mine_rules`` — single-atom bodies over the same variable pair:
  ``head(x,y) <= body(x,y)`` (direction ``fwd``) and
  ``head(x,y) <= body(y,x)`` (``inv``; head == body here is exactly
  symmetric-predicate detection).
* ``mine_chain_rules`` — 2-hop chain bodies:
  ``head(x,y) <= body1(x,z) AND body2(z,y)``.

Metrics follow AMIE: ``support`` = #distinct (x,y) pairs satisfying head
AND body; ``confidence`` = support / #pairs satisfying the body (CWA);
``head_coverage`` = support / #pairs of the head.

Scale shape (10^9..10^12 triples):
* ``mine_rules`` does NOT self-join the triple table: triples key by the
  (x, y) pair ONCE (plus the reversed key for ``inv``), predicates
  collect per pair, and rule candidates explode WITHIN each group — one
  shuffle on the pair key, group sizes are per-pair predicate counts
  (tiny), and the final (head, body) count is a map-side-combined
  aggregation over predicate-pair cardinality (~|P|^2 rows, not |T|^2);
* ``mine_chain_rules`` is the one genuine join (on the chain variable z)
  — hub nodes make it quadratic, so ``max_z_degree`` drops z's above
  the cap before joining (the standard AMIE functionality cap): degree
  is computed with one groupBy per side and the filter is a broadcast
  semi-join against the small over-cap hub set;
* predicate-size tables are |P|-cardinality and broadcast into the
  confidence join.

Reference parity: no counterpart — the reference emits triples and
stops; this is the densification layer over its output
(SURVEY.md §2 'beyond the reference' family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _distinct_triples(triples: DataFrame) -> DataFrame:
    """Narrow distinct (subj, pred, obj) — materialized ONCE (lazy
    localCheckpoint; the caller's first action pays it): every operator
    here consumes it from several plan branches (fwd/inv keyings,
    predicate sizes, hub caps, the apply anti-join), and Catalyst shares
    no subtrees across branches — un-pinned, each branch re-executed the
    WHOLE upstream (the rule_apply gate's plan re-ran its KG-construction
    scan 7×: 56 parquet scans where the pinned form needs one pass).
    The guide §3.3 treatment; same rationale as rdfs_entailment's base.
    On a real cluster swap for .checkpoint() / a stage snapshot."""
    return (
        triples.select("subj", "pred", "obj")
        .distinct()
        .localCheckpoint(eager=False)
    )


def _pred_sizes(d: DataFrame) -> DataFrame:
    """#distinct (x, y) pairs per predicate — |P|-sized, broadcastable.
    ``d`` is already distinct, so a plain count per pred is the pair
    count."""
    return d.groupBy("pred").agg(F.count("*").alias("n_pairs"))


def mine_rules(
    triples: DataFrame,
    min_support: int = 1,
    min_confidence: float = 0.0,
) -> DataFrame:
    """Single-atom rules head(x,y) <= body(x,y) | body(y,x).

    Returns (head, body, direction, support, body_size, confidence,
    head_coverage); confidence/head_coverage rounded to 6 dp (double),
    direction in {'fwd', 'inv'}. ``fwd`` excludes head == body (that
    rule is a tautology); ``inv`` keeps it (symmetry detection).
    """
    d = _distinct_triples(triples)
    fwd = d.select(
        F.col("subj").alias("x"), F.col("obj").alias("y"),
        "pred", F.lit(True).alias("is_fwd"),
    )
    inv = d.select(
        F.col("obj").alias("x"), F.col("subj").alias("y"),
        "pred", F.lit(False).alias("is_fwd"),
    )
    grouped = fwd.unionByName(inv).groupBy("x", "y").agg(
        F.collect_set(F.when(F.col("is_fwd"), F.col("pred"))).alias("fp"),
        F.collect_set(F.when(~F.col("is_fwd"), F.col("pred"))).alias("rp"),
    )
    heads = grouped.select("x", "y", F.explode("fp").alias("head"), "fp", "rp")
    cand_f = heads.select(
        "head", F.explode("fp").alias("body"), F.lit("fwd").alias("direction")
    ).filter(F.col("head") != F.col("body"))
    cand_i = heads.select(
        "head", F.explode("rp").alias("body"), F.lit("inv").alias("direction")
    )
    support = (
        cand_f.unionByName(cand_i)
        .groupBy("head", "body", "direction")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= min_support)
    )
    sizes = _pred_sizes(d)
    bz = F.broadcast(sizes.select(F.col("pred").alias("body"),
                                  F.col("n_pairs").alias("body_size")))
    hz = F.broadcast(sizes.select(F.col("pred").alias("head"),
                                  F.col("n_pairs").alias("head_size")))
    return (
        support.join(bz, "body").join(hz, "head")
        .select(
            "head", "body", "direction", "support", "body_size",
            F.round(F.col("support").cast("double") / F.col("body_size"), 6)
            .alias("confidence"),
            F.round(F.col("support").cast("double") / F.col("head_size"), 6)
            .alias("head_coverage"),
        )
        .filter(F.col("confidence") >= min_confidence)
    )


def mine_chain_rules(
    triples: DataFrame,
    min_support: int = 1,
    min_confidence: float = 0.0,
    max_z_degree: int | None = None,
) -> DataFrame:
    """2-hop chain rules head(x,y) <= body1(x,z) AND body2(z,y).

    Returns (head, body1, body2, support, body_size, confidence) with
    ``body_size`` = #distinct (x,y) reachable through the chain and
    support counted over distinct (x,y) as well (a pair connected via
    several z's counts once — AMIE semantics).

    ``max_z_degree`` drops chain variables whose in-degree (as body1
    object) or out-degree (as body2 subject) exceeds the cap BEFORE the
    join — hub nodes (a country, a top-level category) otherwise make
    the z-join quadratic at web scale. The cap set is expected tiny
    (hubs are rare) and is applied as a broadcast anti-join.
    """
    d = _distinct_triples(triples)
    left = d.select(F.col("subj").alias("x"), F.col("pred").alias("body1"),
                    F.col("obj").alias("z"))
    right = d.select(F.col("subj").alias("z"), F.col("pred").alias("body2"),
                     F.col("obj").alias("y"))
    if max_z_degree is not None:
        hubs = (
            left.groupBy("z").agg(F.count("*").alias("n"))
            .unionByName(right.groupBy("z").agg(F.count("*").alias("n")))
            .groupBy("z").agg(F.max("n").alias("n"))
            .filter(F.col("n") > max_z_degree)
            .select("z")
        )
        left = left.join(F.broadcast(hubs), "z", "left_anti")
        right = right.join(F.broadcast(hubs), "z", "left_anti")
    chains = (
        left.join(right, "z")
        .select("x", "y", "body1", "body2")
        .distinct()
        # two consumers (body sizes + the support join) — un-pinned, each
        # re-executes the z-join; one lazy materialization instead
        .localCheckpoint(eager=False)
    )
    body_sizes = chains.groupBy("body1", "body2").agg(
        F.count("*").alias("body_size")
    )
    support = (
        d.select(F.col("subj").alias("x"), F.col("pred").alias("head"),
                 F.col("obj").alias("y"))
        .join(chains, ["x", "y"])
        .groupBy("head", "body1", "body2")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= min_support)
    )
    return (
        support.join(body_sizes, ["body1", "body2"])
        .select(
            "head", "body1", "body2", "support", "body_size",
            F.round(F.col("support").cast("double") / F.col("body_size"), 6)
            .alias("confidence"),
        )
        .filter(F.col("confidence") >= min_confidence)
    )


def apply_rules(
    triples: DataFrame,
    rules: DataFrame,
    min_confidence: float = 0.5,
) -> DataFrame:
    """Materialize single-atom rule predictions NOT already in the KG:
    for each rule over ``min_confidence``, emit (subj, pred=head, obj,
    confidence) for every body pair lacking the head triple. The rules
    table is |rules|-sized and broadcast; the anti-join against existing
    triples is the only shuffle."""
    r = rules.filter(F.col("confidence") >= min_confidence).select(
        "head", "body", "direction", "confidence"
    )
    d = _distinct_triples(triples)
    joined = d.join(
        F.broadcast(r), d["pred"] == r["body"], "inner"
    ).select(
        F.when(F.col("direction") == "fwd", F.col("subj"))
        .otherwise(F.col("obj")).alias("subj"),
        F.col("head").alias("pred"),
        F.when(F.col("direction") == "fwd", F.col("obj"))
        .otherwise(F.col("subj")).alias("obj"),
        "confidence",
    )
    best = joined.groupBy("subj", "pred", "obj").agg(
        F.max("confidence").alias("confidence")
    )
    return best.join(d, ["subj", "pred", "obj"], "left_anti")
