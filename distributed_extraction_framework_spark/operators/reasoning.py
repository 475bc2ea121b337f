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
    # triples re-predicated by rdfs7 — literalness is per-row, not per-pred
    base = quads.select("subj", "pred", "obj", is_lit.alias("__lit"))
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
