"""Pattern-based open information extraction over plain text.

The reference extracts from structured wiki markup; a Common-Crawl-style
corpus is mostly unstructured prose, so a webtext KG pipeline needs a
text-side extraction channel too. This module implements the classic
deterministic patterns (no models, no randomness — every op is pure
Catalyst regex, so the driver oracles run the IDENTICAL expressions in
DuckDB):

* ``hearst_hyponyms`` — Hearst (1992) is-a patterns: "X such as A, B
  and C", "X, including A", "X, especially A", "A and other X".
* ``copula_facts`` — "A B is a tool" copula statements.
* ``mention_spans`` — capitalized-run entity mention candidates.
* ``nil_clusters`` — cross-document clustering of mentions that link to
  NO KB entity (the entity-discovery step that feeds new entities back
  into the KB; complements operators/linking.py which only finds KNOWN
  surface forms).

Regex notes: patterns stay in the RE2-compatible subset (no lookaround,
no backrefs) so Spark (java.util.regex) and DuckDB (RE2) agree;
leftmost-first greedy semantics match across both. Entity spans are
``[A-Z][a-z]+`` token runs — deliberately rigid; precision over recall,
as in the original Hearst formulation.

Scale shape: the pattern channels are per-row projections (zero
shuffles before the caller aggregates — same plan discipline as
operators/structured_data.extract_html_links); ``nil_clusters`` is one
anti-join against the KB label table (AQE picks broadcast vs shuffle by
size) plus one groupBy on the normalized surface.

Reference parity: no counterpart (the reference never parses prose);
SURVEY.md §2 'beyond the reference' family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# one capitalized token / a run of them (an entity-ish NP)
NP = "[A-Z][a-z]+(?: [A-Z][a-z]+)*"
# an enumeration of NPs: "A, B and C" / "A or B" / "A"
NP_LIST = f"{NP}(?:, {NP})*(?:,? (?:and|or) {NP})?"

# (pattern_name, full_regex, which group is the hypernym, hyponym side)
# hypernym_first=True: group 1 = hypernym NP, group 2 = hyponym list.
HEARST_PATTERNS = [
    ("such_as", f"({NP}) such as ({NP_LIST})", True),
    ("including", f"({NP}),? including ({NP_LIST})", True),
    ("especially", f"({NP}), especially ({NP_LIST})", True),
    ("and_other", f"({NP}) (?:and|or) other ([a-z]+)", False),
]

COPULA_PATTERN = f"({NP}) (?:is|was|are|were) (?:a|an|the) ([a-z]+(?: [a-z]+)?)"
# the greedy 2-word object captures a trailing function word ('Paris is
# a city in France' → 'city in'); the RE2-portable fix (no lookahead in
# the DuckDB-mirrored grammar) strips it AFTER extraction — both the
# Spark path and the oracle SQL apply this same pattern (code-review r5
# wave-4 #9)
COPULA_OBJ_STRIP = (
    " (?:in|of|for|on|at|by|with|from|as|to|and|or|that|which|who)$"
)


def _matches(df: DataFrame, id_col: str, text_col: str, pattern: str) -> DataFrame:
    """Explode every full match of ``pattern`` in ``text_col``."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
        ).alias("_m"),
    )


def hearst_hyponyms(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, hyponym, hypernym, pattern) — one row per extracted is-a
    pair. List-valued patterns split the enumeration by re-scanning it
    with the NP regex (", " / "and" / "or" never match an NP, so the
    split is exact)."""
    outs = []
    for name, pat, hypernym_first in HEARST_PATTERNS:
        m = _matches(docs, id_col, text_col, pat)
        g1 = F.regexp_extract("_m", pat, 1)
        g2 = F.regexp_extract("_m", pat, 2)
        if hypernym_first:
            out = m.select(
                id_col,
                F.explode(
                    F.regexp_extract_all(g2, F.lit(NP), F.lit(0))
                ).alias("hyponym"),
                g1.alias("hypernym"),
                F.lit(name).alias("pattern"),
            )
        else:
            out = m.select(
                id_col,
                g1.alias("hyponym"),
                g2.alias("hypernym"),
                F.lit(name).alias("pattern"),
            )
        outs.append(out)
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def copula_facts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, subj, obj) — "<NP> is a <noun phrase>" copula facts."""
    m = _matches(docs, id_col, text_col, COPULA_PATTERN)
    return m.select(
        id_col,
        F.regexp_extract("_m", COPULA_PATTERN, 1).alias("subj"),
        F.regexp_replace(
            F.regexp_extract("_m", COPULA_PATTERN, 2),
            COPULA_OBJ_STRIP, "",
        ).alias("obj"),
    )


def mention_pattern(min_tokens: int = 2) -> str:
    """Capitalized-run mention regex requiring >= min_tokens tokens
    (single capitalized words are sentence-start noise)."""
    return "[A-Z][a-z]+(?: [A-Z][a-z]+){%d,}" % (min_tokens - 1)


def mention_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 2,
) -> DataFrame:
    """(doc_id, mention) — every capitalized-run candidate span."""
    return _matches(docs, id_col, text_col, mention_pattern(min_tokens)).select(
        id_col, F.col("_m").alias("mention")
    )


def taxonomy_from_isa(
    pairs: DataFrame,
    hypo_col: str = "hyponym",
    hyper_col: str = "hypernym",
    min_weight: int = 1,
) -> DataFrame:
    """Induce a taxonomy from extracted is-a pairs: per hyponym keep the
    best-attested hypernym — (node, parent, weight, n_parents) with
    ``weight`` = #supporting extractions of the chosen edge and
    ``n_parents`` = how many distinct hypernyms competed. Argmax is
    deterministic (weight DESC, parent ASC). Choosing ONE parent per
    node makes the result a forest except for ties broken lexically —
    the standard first pass of Hearst-based taxonomy induction; cycle
    breaking across levels is the caller's second pass (the weighted
    edge list is the expensive distributed part).

    One groupBy on the (node, parent) edge plus a window on node — both
    shuffles on the node key, AQE-mergeable."""
    w_edges = (
        pairs.groupBy(
            F.col(hypo_col).alias("node"), F.col(hyper_col).alias("parent")
        )
        .agg(F.count("*").alias("weight"))
        .filter(F.col("weight") >= min_weight)
    )
    w = Window.partitionBy("node").orderBy(
        F.col("weight").desc(), F.col("parent").asc()
    )
    return (
        w_edges.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "n_parents",
            F.count("*").over(Window.partitionBy("node")).cast("long"),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .select("node", "parent", "weight", "n_parents")
    )


def nil_clusters(
    docs: DataFrame,
    kb_labels: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 2,
    label_col: str = "label",
) -> DataFrame:
    """Cross-document clusters of UNLINKABLE mentions — the entity-
    discovery queue. Mentions matching a KB label (exact string) are
    dropped; the rest cluster on the case-folded surface:
    (cluster, n_mentions, n_docs) with ``cluster`` = lower(mention).

    At web scale the KB label table is large: the anti-join is a plain
    shuffled join (AQE broadcasts it when it fits); the cluster groupBy
    is map-side combined on the normalized key.
    """
    m = mention_spans(docs, text_col, id_col, min_tokens)
    nil = m.join(
        kb_labels.select(F.col(label_col).alias("mention")).distinct(),
        "mention",
        "left_anti",
    )
    return (
        nil.groupBy(F.lower(F.col("mention")).alias("cluster"))
        .agg(
            F.count("*").alias("n_mentions"),
            F.countDistinct(id_col).alias("n_docs"),
        )
    )
