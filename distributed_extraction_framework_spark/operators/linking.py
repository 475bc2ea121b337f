"""Entity linking: broadcast Aho-Corasick mention detection + salted
candidate-scoring join.

north_star requirements: "mention detection uses a broadcast Aho-Corasick
surface-form dictionary, entity-link scoring a hash-partitioned candidate
join with salted keys for head-entity skew". The reference has no linking
stage (its 'joins' are driver-side map lookups — SURVEY.md §2.3); this is
the genuinely-distributed member of the suite.

Scale design:

* the surface-form dictionary (≤ tens of MB) is a Spark broadcast; the
  Aho-Corasick automaton is built ONCE per executor process from the
  broadcast list (module-level cache keyed by a content fingerprint) —
  not per batch, not per row;
* mention detection is a pandas UDF over Arrow batches: text in, array of
  matched surfaces out — the only Python in the path;
* the mention→candidate join hash-partitions on ``surface``; head surfaces
  (one entity owning ~30% of mentions, per FIXTURES.md §3) would make one
  reducer own 30% of the shuffle, so BOTH sides are salted: mentions get
  ``salt = pmod(xxhash64(page), R)``, candidates are exploded ×R. This is
  the explicit salting north_rule asks for, on top of AQE skew handling.
"""

from __future__ import annotations

import hashlib
from collections import deque

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from .. import schema as S


# --------------------------------------------------------------------------
# Aho-Corasick automaton (pure Python, public-knowledge algorithm)
# --------------------------------------------------------------------------
class AhoCorasick:
    """Multi-pattern matcher: goto/fail/output construction, O(text) scan."""

    def __init__(self, patterns: list[str]):
        self.goto: list[dict[str, int]] = [{}]
        self.fail: list[int] = [0]
        self.out: list[list[str]] = [[]]
        for p in patterns:
            self._insert(p)
        self._build_failures()

    def _insert(self, pattern: str) -> None:
        node = 0
        for ch in pattern:
            nxt = self.goto[node].get(ch)
            if nxt is None:
                self.goto.append({})
                self.fail.append(0)
                self.out.append([])
                nxt = len(self.goto) - 1
                self.goto[node][ch] = nxt
            node = nxt
        self.out[node].append(pattern)

    def _build_failures(self) -> None:
        q: deque[int] = deque()
        for child in self.goto[0].values():
            q.append(child)
        while q:
            node = q.popleft()
            for ch, child in self.goto[node].items():
                q.append(child)
                f = self.fail[node]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[child] = self.goto[f].get(ch, 0) if self.goto[f].get(ch, 0) != child else 0
                self.out[child] = self.out[child] + self.out[self.fail[child]]

    def find_all(self, text: str) -> list[str]:
        node = 0
        hits: list[str] = []
        for ch in text:
            while node and ch not in self.goto[node]:
                node = self.fail[node]
            node = self.goto[node].get(ch, 0)
            if self.out[node]:
                hits.extend(self.out[node])
        return hits


_AC_CACHE: dict[str, AhoCorasick] = {}


def _get_automaton(fingerprint: str, surfaces: list[str]) -> AhoCorasick:
    ac = _AC_CACHE.get(fingerprint)
    if ac is None:
        ac = AhoCorasick(surfaces)
        _AC_CACHE.clear()  # one dictionary per executor generation
        _AC_CACHE[fingerprint] = ac
    return ac


# --------------------------------------------------------------------------
# surface-form dictionary
# --------------------------------------------------------------------------

def surface_forms_from_labels(quads: DataFrame) -> DataFrame:
    """(surface, entity, prior) from the labels/redirect datasets — the
    FIXTURES.md §3 dictionary, derived instead of hand-written."""
    labels = quads.filter(F.col("dataset").isin("labels", "category_labels")).select(
        F.lower(F.col("obj")).alias("surface"), F.col("subj").alias("entity")
    )
    w = Window.partitionBy("surface")
    return (
        labels.distinct()
        .withColumn("prior", F.lit(1.0) / F.count("*").over(w))
        .filter(F.length("surface") >= 3)
    )


# --------------------------------------------------------------------------
# mention detection
# --------------------------------------------------------------------------

def detect_mentions(
    pages: DataFrame,
    surface_forms: DataFrame,
    text_col: str = "text",
    key_col: str = "url",
) -> DataFrame:
    """(key, surface, n_mentions): Aho-Corasick scan of each page text
    against the broadcast surface dictionary."""
    spark = pages.sparkSession
    surfaces = sorted(
        {r["surface"] for r in surface_forms.select("surface").distinct().collect()}
    )
    fingerprint = hashlib.md5("\x00".join(surfaces).encode("utf-8")).hexdigest()
    bc = spark.sparkContext.broadcast(surfaces)

    @F.pandas_udf(ArrayType(StringType()))
    def scan(texts: pd.Series) -> pd.Series:
        ac = _get_automaton(fingerprint, bc.value)
        return texts.map(
            lambda t: ac.find_all(t.lower()) if isinstance(t, str) else []
        )

    return (
        pages.select(F.col(key_col).alias("page"), F.col(text_col).alias("_t"))
        .withColumn("surface", F.explode(scan(F.col("_t"))))
        .groupBy("page", "surface")
        .agg(F.count("*").alias("n_mentions"))
    )


# --------------------------------------------------------------------------
# salted candidate-scoring join
# --------------------------------------------------------------------------

def score_candidates(
    mentions: DataFrame,
    surface_forms: DataFrame,
    salt_buckets: int = 8,
) -> DataFrame:
    """Join mentions to candidate entities on (surface, salt) and keep the
    best-scored candidate per (page, surface).

    Salting: mentions carry ``pmod(xxhash64(page), R)``; the candidate side
    replicates each row R times. A head surface's shuffle load spreads over
    R reducers instead of 1. Score = prior-weighted mention frequency.
    """
    R = salt_buckets
    m = mentions.withColumn(
        "salt", F.pmod(F.xxhash64("page"), F.lit(R)).cast("int")
    )
    c = surface_forms.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(R - 1)))
    )
    scored = (
        m.join(c, ["surface", "salt"], "inner")
        .withColumn(
            "score",
            F.col("prior") * F.log1p(F.col("n_mentions")),
        )
        .drop("salt")
    )
    w = Window.partitionBy("page", "surface").orderBy(
        F.desc("score"), F.asc("entity")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .drop("rank")
    )


def link_entities(
    pages: DataFrame,
    surface_forms: DataFrame,
    salt_buckets: int = 8,
) -> DataFrame:
    """Full linking pass: detect → salted score → linked mention quads."""
    mentions = detect_mentions(pages, surface_forms)
    best = score_candidates(mentions, surface_forms, salt_buckets)
    return best.select(
        F.lit("entity_links").alias("dataset"),
        F.col("page").alias("subj"),
        F.lit(S.ONTOLOGY + "mentions").alias("pred"),
        F.col("entity").alias("obj"),
        F.col("surface"),
        F.col("n_mentions"),
        F.col("score"),
    )
