"""Minimal-RDFS forward entailment (the ρdf fragment).

The published-KG consumer expects the RDFS closure DBpedia ships
implicitly through its ontology: sub-property application (rdfs7 with
rdfs5 transitivity), domain/range typing (rdfs2/rdfs3), and subclass
type lifting (rdfs9 with rdfs11 transitivity) — the ρdf fragment of
Muñoz, Pérez & Gutierrez (ESWC 2007), which covers the entailments
real query loads use without the pathological full-RDFS rules.

Scale shape: the ontology relations (subClassOf, subPropertyOf,
domain, range) are schema-sized — thousands of rows against 10^12
triples — so every rule is a BROADCAST join against the corpus scan;
the two transitive closures run on the tiny ontology tables only
(``graph.reachability``, repeated squaring). The corpus is scanned
once for property expansion and once for typing (Catalyst shares the
scan under one action); output is entailed-triples-only, deduplicated
with one distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schema as S
from .graph import reachability

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


_DRIVER_CLOSURE_ROWS = 100_000


def _closure(edges: DataFrame | None) -> DataFrame | None:
    """Transitive closure of a schema-sized (src, dst) relation.

    Ontology relations are thousands of rows against a 10^12-triple
    corpus, so up to ``_DRIVER_CLOSURE_ROWS`` the closure runs ON THE
    DRIVER (a bounded collect — the same budget the broadcast to
    executors needs anyway) instead of paying reachability's per-round
    jobs; bigger relations fall back to the distributed repeated
    squaring."""
    if edges is None:
        return None
    e = edges.select("src", "dst").distinct()
    rows = e.limit(_DRIVER_CLOSURE_ROWS + 1).collect()
    if len(rows) > _DRIVER_CLOSURE_ROWS:
        return reachability(e)
    adj: dict[str, set[str]] = {}
    for r in rows:
        adj.setdefault(r["src"], set()).add(r["dst"])
    out = []
    for start in adj:
        seen: set[str] = set()
        stack = list(adj[start])
        while stack:
            v = stack.pop()
            if v in seen:
                continue
            seen.add(v)
            stack.extend(adj.get(v, ()))
        seen.discard(start)
        out.extend((start, v) for v in seen)
    spark = edges.sparkSession
    return spark.createDataFrame(out or [], "src string, dst string")


def rdfs_entailment(
    quads: DataFrame,
    subclass: DataFrame | None = None,
    subprop: DataFrame | None = None,
    domains: DataFrame | None = None,
    ranges: DataFrame | None = None,
) -> DataFrame:
    """Entailed triples ``(subj, pred, obj)`` under ρdf — NEW facts the
    input does not state (callers union with the input if they want the
    closed graph).

    * ``subclass`` / ``subprop``: (src, dst) edges, closed transitively
      here (rdfs11/rdfs5);
    * ``domains`` / ``ranges``: (prop, cls) rows — rdfs2: subjects of
      ``prop`` are typed ``cls``; rdfs3: objects of ``prop`` are.
      rdfs3 applies only to RESOURCE objects: when the input carries
      ``datatype``/``lang`` columns, literal-valued rows are excluded
      (a literal can never be the subject of an rdf:type triple);
    * rdfs7: a triple with pred p entails the same triple under every
      super-property of p;
    * rdfs9: every asserted or derived ``rdf:type C`` lifts to all
      superclasses of C.
    """
    if all(x is None for x in (subclass, subprop, domains, ranges)):
        raise ValueError("no ontology relations given")
    cols = set(quads.columns)
    is_lit = F.lit(False)
    if "datatype" in cols:
        is_lit = is_lit | F.col("datatype").isNotNull()
    if "lang" in cols:
        is_lit = is_lit | F.col("lang").isNotNull()
    # __lit rides along so rdfs3 (range) can skip literal objects even on
    # triples re-predicated by rdfs7 — literalness is per-row, not per-pred.
    # Materialized ONCE (lazy localCheckpoint): the rule branches below are
    # a union Catalyst cannot share subtrees across, so without it every
    # rule re-runs the (potentially regex-extraction-sized) upstream plan —
    # measured 14 parquet scans / 38 exchanges for the 4-rule driver gate.
    # One narrow (subj, pred, obj, bool) materialization beats re-scanning
    # the corpus once per rule at any scale (guide §3.3; swap for
    # ``checkpoint()`` on a real multi-executor cluster).
    base = quads.select(
        "subj", "pred", "obj", is_lit.alias("__lit")
    ).localCheckpoint(eager=False)
    derived: list[DataFrame] = []

    spc = _closure(subprop)
    expanded = base
    if spc is not None:
        via_sp = (
            base.join(F.broadcast(spc), base["pred"] == spc["src"])
            .select("subj", F.col("dst").alias("pred"), "obj", "__lit")
        )
        derived.append(via_sp.select("subj", "pred", "obj"))
        expanded = base.unionByName(via_sp)

    typed: list[DataFrame] = []
    if domains is not None:
        typed.append(
            expanded.join(
                F.broadcast(domains.select("prop", "cls")),
                expanded["pred"] == F.col("prop"),
            ).select(
                "subj",
                F.lit(RDF_TYPE).alias("pred"),
                F.col("cls").alias("obj"),
            )
        )
    if ranges is not None:
        res_obj = expanded.where(~F.col("__lit"))
        typed.append(
            res_obj.join(
                F.broadcast(ranges.select("prop", "cls")),
                res_obj["pred"] == F.col("prop"),
            ).select(
                F.col("obj").alias("subj"),
                F.lit(RDF_TYPE).alias("pred"),
                F.col("cls").alias("obj"),
            )
        )
    derived.extend(typed)

    scc = _closure(subclass)
    if scc is not None:
        # asserted types + freshly derived ones both lift (rdfs9)
        all_types = base.where(F.col("pred") == RDF_TYPE).select(
            "subj", "pred", "obj"
        )
        for t in typed:
            all_types = all_types.unionByName(t)
        derived.append(
            all_types.join(
                F.broadcast(scc), all_types["obj"] == scc["src"]
            ).select(
                "subj",
                F.lit(RDF_TYPE).alias("pred"),
                F.col("dst").alias("obj"),
            )
        )

    if not derived:
        raise ValueError("ontology relations produced no rules")
    out = derived[0]
    for d in derived[1:]:
        out = out.unionByName(d)
    # entailed-only: drop facts the input already states
    return out.distinct().join(
        base.select(
            F.col("subj").alias("__s"),
            F.col("pred").alias("__p"),
            F.col("obj").alias("__o"),
        ).distinct(),
        (F.col("subj") == F.col("__s"))
        & (F.col("pred") == F.col("__p"))
        & (F.col("obj") == F.col("__o")),
        "left_anti",
    )


# --------------------------------------------------------------------------
# OWL-lite forward entailment — the property-characteristic rules a
# published web KG actually exercises (the owl:sameAs/inverseOf/
# symmetric/transitive/functional fragment; full OWL DL is out of scope
# by design, like full RDFS is for rdfs_entailment above).
# --------------------------------------------------------------------------


def owl_entailment(
    quads: DataFrame,
    inverse: DataFrame | None = None,
    symmetric: DataFrame | None = None,
    transitive: DataFrame | None = None,
    functional: DataFrame | None = None,
    inverse_functional: DataFrame | None = None,
    equivalent_class: DataFrame | None = None,
    max_iter: int = 12,
) -> DataFrame:
    """Entailed triples ``(subj, pred, obj)`` under the OWL-lite property
    rules — NEW facts only, asserted facts subtracted (same contract as
    :func:`rdfs_entailment`).

    * ``inverse``: (prop, inv) — prp-inv1/2: ``(s,p,o) ⊢ (o,inv,s)``
      (both directions: each row also fires inv→prop);
    * ``symmetric``: (prop) — prp-symp: ``(s,p,o) ⊢ (o,p,s)``;
    * ``transitive``: (prop) — prp-trp: per-property transitive closure
      of the CORPUS subgraph, computed pred-aware by repeated squaring
      (log₂ diameter rounds, ``localCheckpoint`` lineage cuts — the
      data-sized analog of the schema-sized closures above);
    * ``functional``: (prop) — prp-fp: ``(s,p,o₁),(s,p,o₂) ⊢
      owl:sameAs(o₁,o₂)`` (emitted once, o₁ < o₂);
    * ``inverse_functional``: (prop) — prp-ifp: ``(s₁,p,o),(s₂,p,o) ⊢
      owl:sameAs(s₁,s₂)``;
    * ``equivalent_class``: (a, b) — cax-eqc1/2: instances typed either
      class get the other (rows fire both ways).

    Literal-valued rows (non-null ``datatype``/``lang``) never feed
    inverse/symmetric/transitive/functional derivations — a literal can
    be neither a subject nor a sameAs operand.

    Scale shape: property lists and class pairs are schema-sized →
    broadcast joins against one corpus scan each. The functional rules
    need one shuffle per property family (a self-join on the grouping
    key); transitive closure shuffles per squaring round on the filtered
    per-property subgraph only — the corpus outside the declared
    transitive predicates is never touched.
    """
    args = (inverse, symmetric, transitive, functional,
            inverse_functional, equivalent_class)
    if all(x is None for x in args):
        raise ValueError("no OWL property declarations given")
    cols = set(quads.columns)
    is_lit = F.lit(False)
    if "datatype" in cols:
        is_lit = is_lit | F.col("datatype").isNotNull()
    if "lang" in cols:
        is_lit = is_lit | F.col("lang").isNotNull()
    # same single-materialization rationale as rdfs_entailment: every rule
    # branch and the final anti-join re-consume base/res
    base = quads.select(
        "subj", "pred", "obj", is_lit.alias("__lit")
    ).localCheckpoint(eager=False)
    res = base.where(~F.col("__lit")).select("subj", "pred", "obj")
    derived: list[DataFrame] = []

    if inverse is not None:
        pairs = inverse.select("prop", "inv").unionByName(
            inverse.select(
                F.col("inv").alias("prop"), F.col("prop").alias("inv")
            )
        ).distinct()
        derived.append(
            res.join(F.broadcast(pairs), res["pred"] == F.col("prop"))
            .select(
                F.col("obj").alias("subj"),
                F.col("inv").alias("pred"),
                F.col("subj").alias("obj"),
            )
        )

    if symmetric is not None:
        derived.append(
            res.join(F.broadcast(symmetric.select("prop")),
                     res["pred"] == F.col("prop"))
            .select(
                F.col("obj").alias("subj"), "pred",
                F.col("subj").alias("obj"),
            )
        )

    if transitive is not None:
        from pyspark.sql import Observation

        sub = res.join(F.broadcast(transitive.select("prop")),
                       res["pred"] == F.col("prop")).select(
            "pred", F.col("subj").alias("src"), F.col("obj").alias("dst")
        ).distinct().localCheckpoint(eager=False)
        closure = sub
        # ONE action per round (the observe() fusion every other loop in
        # the repo uses): the round's checkpoint job collects the row
        # count, and convergence compares it against the PREVIOUS round's
        # tracked count — the old form re-counted both materialized
        # frames every round (3 jobs/round instead of 1+setup)
        n_prev = sub.count()
        for _ in range(max_iter):
            grown = closure.alias("a").join(
                closure.alias("b"),
                (F.col("a.pred") == F.col("b.pred"))
                & (F.col("a.dst") == F.col("b.src")),
            ).select(
                F.col("a.pred").alias("pred"),
                F.col("a.src").alias("src"),
                F.col("b.dst").alias("dst"),
            )
            obs = Observation()
            nxt = (
                closure.unionByName(grown).distinct()
                .observe(obs, F.count(F.lit(1)).alias("n"))
                .localCheckpoint()
            )
            n_nxt = int(obs.get["n"] or 0)
            closure = nxt
            if n_nxt == n_prev:
                break
            n_prev = n_nxt
        derived.append(
            closure.where(F.col("src") != F.col("dst")).select(
                F.col("src").alias("subj"), "pred",
                F.col("dst").alias("obj"),
            )
        )

    def _same_as(rel: DataFrame, key: str, val: str) -> DataFrame:
        # prp-fp/prp-ifp require BOTH triples to share the same property
        # p — joining on the key alone would derive sameAs across
        # different functional properties (e.g. birthPlace vs deathPlace
        # of one subject), silently merging unrelated entities
        # (code-review r5 #1), so the property is part of the join key.
        fam = res.join(F.broadcast(rel.select("prop")),
                       res["pred"] == F.col("prop"))
        left = fam.select(
            F.col(key).alias("__k"), F.col("pred").alias("__p"),
            F.col(val).alias("a"),
        )
        right = fam.select(
            F.col(key).alias("__k"), F.col("pred").alias("__p"),
            F.col(val).alias("b"),
        )
        return (
            left.join(right, ["__k", "__p"])
            .where(F.col("a") < F.col("b"))
            .select(
                F.col("a").alias("subj"),
                F.lit(S.OWL_SAMEAS).alias("pred"),
                F.col("b").alias("obj"),
            )
        )

    if functional is not None:
        derived.append(_same_as(functional, "subj", "obj"))
    if inverse_functional is not None:
        derived.append(_same_as(inverse_functional, "obj", "subj"))

    if equivalent_class is not None:
        eq = equivalent_class.select("a", "b").unionByName(
            equivalent_class.select(F.col("b").alias("a"),
                                    F.col("a").alias("b"))
        ).distinct()
        types = base.where(F.col("pred") == RDF_TYPE)
        derived.append(
            types.join(F.broadcast(eq), types["obj"] == F.col("a"))
            .select("subj", "pred", F.col("b").alias("obj"))
        )

    out = derived[0]
    for d in derived[1:]:
        out = out.unionByName(d)
    return out.distinct().join(
        base.select(
            F.col("subj").alias("__s"),
            F.col("pred").alias("__p"),
            F.col("obj").alias("__o"),
        ).distinct(),
        (F.col("subj") == F.col("__s"))
        & (F.col("pred") == F.col("__p"))
        & (F.col("obj") == F.col("__o")),
        "left_anti",
    )
