"""Distributed BPE tokenizer induction over the document corpus.

The piece of a training-data pipeline the curation operators feed:
after dedup/quality filtering, the corpus trains its own subword
vocabulary. Classic byte-pair encoding (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units" — public
algorithm): start from characters (plus a word-end marker), repeatedly
merge the most frequent adjacent symbol pair.

Scale shape (the reason this is corpus-scale-safe):

* BPE statistics live on the WORD-FREQUENCY table, not the corpus — the
  canonical trick. One corpus-sized explode + map-side-combined
  ``groupBy(word)`` produces a vocabulary-sized ``(word, cnt)`` table
  (Heaps' law: ~10^7-10^8 distinct words at 100 TB — comfortably
  distributed, 10^4-10^5× smaller than the corpus). The corpus is never
  touched again.
* Each merge iteration runs TWO vocabulary-sized jobs: an
  ``explode``+``groupBy`` pair-count with a 1-row argmax collect
  (deterministic lexicographic tie-break — same merges on any cluster
  size), and an eager ``localCheckpoint`` that applies the merge as a
  Catalyst ``aggregate`` fold over each word's symbol array (greedy
  non-overlapping left-to-right, the reference semantics) while
  truncating lineage so plan depth stays O(1) across thousands of
  merges. ``localCheckpoint`` → ``checkpoint`` on a real cluster.
* Encoding applies the learned merge ranks per word inside an
  Arrow-batched pandas UDF with a broadcast merge dict + an LRU word
  cache (Zipf: a tiny cache covers most word instances); tokens per
  document come back as one array column, no per-row Python API calls.

No counterpart in the reference (it ships extraction only); this module
exists for the 100 TB training-data mission the north rule adds on top.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from .curation import _fan_out
from .retrieval import TOKEN_RE

END = "</w>"


def word_counts(
    docs: DataFrame,
    text_col: str = "text",
    min_parallelism: int | None = None,
) -> DataFrame:
    """Vocabulary table ``(word, cnt)`` — the ONE corpus-sized job in BPE
    training. ``array_distinct`` is deliberately absent: BPE weights by
    instance count, so every occurrence counts."""
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(f"({TOKEN_RE})"), 1
    )
    return (
        _fan_out(docs, min_parallelism)
        .select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_symbols(word: Column) -> Column:
    """Character symbols of ``word`` plus the end-of-word marker — the
    BPE base vocabulary."""
    return F.concat(F.split(word, ""), F.array(F.lit(END)))


def _pair_structs(syms: Column) -> Column:
    """Adjacent symbol pairs of ``syms`` as ``struct(lhs, rhs)`` — empty
    for 1-symbol words (can't happen after the marker append, but kept
    total)."""
    offs = F.sequence(F.lit(1), F.size(syms) - 1)
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            offs,
            lambda i: F.struct(
                F.element_at(syms, i).alias("lhs"),
                F.element_at(syms, i + 1).alias("rhs"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<lhs:string,rhs:string>>"))


def pair_counts(vocab: DataFrame, syms_col: str = "syms") -> DataFrame:
    """Instance-weighted adjacent-pair counts ``(lhs, rhs, cnt)`` over a
    symbolized vocabulary ``(word, cnt, syms)`` — vocabulary-sized
    explode, map-side-combined agg; never touches the corpus."""
    return (
        vocab.select(
            F.col("cnt"), F.explode(_pair_structs(F.col(syms_col))).alias("p")
        )
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("cnt").alias("cnt"))
    )


def bpe_pair_counts(
    docs: DataFrame,
    text_col: str = "text",
    min_parallelism: int | None = None,
) -> DataFrame:
    """Iteration-0 BPE pair statistics straight off the corpus →
    ``(lhs, rhs, cnt)``: the fully SQL-expressible face of training
    (the iterative argmax loop is gated by differential pytest against
    a sequential reference implementation instead)."""
    wc = word_counts(docs, text_col, min_parallelism)
    return pair_counts(
        wc.withColumn("syms", _initial_symbols(F.col("word")))
    )


def _apply_merge(syms: Column, lhs: str, rhs: str) -> Column:
    """Greedy non-overlapping left-to-right replacement of the adjacent
    pair (lhs, rhs) with its concatenation — one Catalyst ``aggregate``
    fold, no Python. ``aaa`` under (a,a) → ``[aa, a]`` exactly like the
    sequential reference: a just-merged symbol can't immediately re-merge
    because the fold compares the accumulator's LAST symbol (now
    ``lhs+rhs``) against ``lhs``."""
    merged = lhs + rhs

    def step(acc: Column, x: Column) -> Column:
        return F.when(
            (F.element_at(acc, -1) == F.lit(lhs)) & (x == F.lit(rhs)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        F.slice(syms, 2, F.size(syms) - 1),
        F.slice(syms, 1, 1),
        step,
    )


# separator for the batch-apply map keys: symbols are TOKEN_RE tokens
# ([a-z0-9]+), the end marker and their concatenations — NUL never occurs
_SEP = "\x00"


def _apply_merge_batch(
    syms: Column,
    batch: list[tuple[str, str, int]],
    word: Column | None = None,
) -> Column:
    """Apply a greedy-safe merge batch (:func:`_select_merge_batch`) in
    ONE left-to-right fold: the accumulator's last symbol + the next
    symbol key into a merge map; a hit replaces the last symbol with the
    merged form. Equal to chaining :func:`_apply_merge` per pair — batch
    pairs are symbol-disjoint (occurrences cannot interact) and no batch
    concatenation collides with an existing symbol (a merged token can
    never complete another batch pair) — so one pass per ROUND replaces
    one pass per MERGE, which is what makes wide batches actually cheap
    (the chained form re-folded every word once per pair).

    ``word`` (the raw word string) enables the cheap skip: adjacent syms
    ``(l, r)`` partition the word+marker text, so ``l·r`` must appear as
    a SUBSTRING of ``word</w>`` — words failing every batch pair's
    containment check cannot change and copy through without paying the
    quadratic fold (the fold itself stays the exact check for the
    words that pass)."""

    def _fold(target: Column) -> Column:
        if len(batch) == 1:
            return _apply_merge(target, batch[0][0], batch[0][1])
        mapping = F.create_map(
            *[x for (lhs, rhs, _cnt) in batch
              for x in (F.lit(lhs + _SEP + rhs), F.lit(lhs + rhs))]
        )

        def step(acc: Column, x: Column) -> Column:
            merged = F.try_element_at(
                mapping, F.concat(F.element_at(acc, -1), F.lit(_SEP), x)
            )
            return F.when(
                merged.isNotNull(),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
                ),
            ).otherwise(F.concat(acc, F.array(x)))

        return F.aggregate(
            F.slice(target, 2, F.size(target) - 1),
            F.slice(target, 1, 1),
            step,
        )

    if word is None:
        return _fold(syms)
    text = F.concat(word, F.lit(END))
    may_hit = F.lit(False)
    for lhs, rhs, _cnt in batch:
        may_hit = may_hit | text.contains(lhs + rhs)
    return F.when(may_hit, _fold(syms)).otherwise(syms)


def _candidate_prefix(
    rows: list, k: int, min_count: int
) -> tuple[list[tuple[str, str, int]], int]:
    """Longest symbol-disjoint PREFIX of the top-``k+1`` (cnt desc, lhs,
    rhs)-ordered pair rows, plus the count of the first pair left out
    (the trim boundary; 0 when the pair list was exhausted)."""
    cand: list[tuple[str, str, int]] = []
    used: set[str] = set()
    boundary = 0
    for i, r in enumerate(rows):
        cnt = int(r["cnt"])
        if i >= k or cnt < min_count:
            boundary = cnt if cnt >= min_count else 0
            break
        syms = {r["lhs"], r["rhs"]}
        if used & syms:
            boundary = cnt
            break
        cand.append((r["lhs"], r["rhs"], cnt))
        used |= syms
    return cand, boundary


def _select_merge_batch(
    cand: list[tuple[str, str, int]],
    boundary: int,
    colliding: set[str],
) -> list[tuple[str, str, int]]:
    """Finalize a greedy-safe merge batch from a symbol-disjoint candidate
    prefix (:func:`_candidate_prefix`): truncate at the first pair whose
    CONCATENATION string already exists as a symbol in the pair table
    (``colliding``), then trim to counts STRICTLY above the boundary.

    Why the surviving batch exactly reproduces sequential greedy BPE:

    * prefix + symbol-disjointness — applying any batch pair cannot touch
      another batch pair's symbols, so every batch pair's count (and the
      batch's internal (cnt, lex) order) is invariant under the other
      batch merges;
    * the concat-collision stop — merging ``(l, r)`` creates tokens
      spelled ``l·r``; if some EXISTING pair uses ``l·r`` as a symbol
      (e.g. batch ``(a,b)`` with ``(ab,c)`` anywhere in the table), that
      pair's count can GROW past later batch pairs and reorder the
      sequential argmax, so such a merge ends the batch (every symbol
      occurrence has an adjacent pair — words always carry the end
      marker — making the pair-table probe a complete symbol check);
    * the strict-count trim — with growth excluded, every pair CREATED
      by a batch merge ``(X, l·r)`` / ``(l·r, Y)`` implies a
      pre-existing adjacent pair ``(X, l)`` / ``(r, Y)`` sharing a
      symbol with the batch, so its count is bounded by an excluded
      pair's count ≤ the boundary < every kept pair's count; every
      already-existing non-batch pair is ≤ the boundary and cannot
      grow. Lexicographic tie-breaks cannot rescue either (strict
      inequality). Hence after applying batch pair i, the sequential
      argmax is exactly batch pair i+1.

    Falls back to the single top pair when truncation/trim would empty
    the batch — a 1-pair batch is trivially sequential."""
    batch = cand
    for i, (lhs, rhs, cnt) in enumerate(cand):
        if lhs + rhs in colliding:
            batch = cand[:i]
            boundary = cnt  # earliest-rank excluded pair wins the boundary
            break
    trimmed = [m for m in batch if m[2] > boundary]
    return trimmed if trimmed else cand[:1]


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 2,
    min_parallelism: int | None = None,
    batch_merges: int = 32,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges → ``[(lhs, rhs, pair_count), ...]``
    in rank order. Stops early when the best remaining pair falls under
    ``min_count`` (merging hapax pairs just memorizes typos).

    Determinism: ties on count break lexicographically on (lhs, rhs), so
    the merge table is identical at any parallelism — the property the
    north rule's two-cluster-size criterion needs.

    ``batch_merges`` (VERDICT r5 #1): each round collects the top
    ``batch_merges + 1`` pairs and applies the longest symbol-disjoint,
    strictly-count-separated prefix in ONE vocabulary job
    (:func:`_select_merge_batch` — provably identical output to the
    one-merge-per-round form, pytest-gated), so a 32k-merge production
    vocabulary costs ~n_merges/batch jobs instead of 2·n_merges.
    ``batch_merges=1`` recovers the strictly sequential form.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1: {n_merges}")
    if batch_merges < 1:
        raise ValueError(f"batch_merges must be >= 1: {batch_merges}")
    spark = docs.sparkSession

    # DataFrame.unpersist() does NOT free localCheckpoint blocks (it
    # clears cacheManager entries, not the checkpoint RDD's storage), so
    # a long training run accumulated one vocabulary-sized block set per
    # iteration until JVM GC happened to collect the dead RDDs
    # (code-review r5 wave-4 #10). The checkpoint RDD is tracked by id at
    # creation and its blocks are dropped EXPLICITLY once the next
    # iteration's checkpoint is eagerly materialized (the old vocab is
    # never read again, so losing its blocks is safe).
    def _persistent_ids() -> set[int]:
        conv = spark._jvm.scala.collection.JavaConverters \
            .mapAsJavaMapConverter(
                spark.sparkContext._jsc.sc().getPersistentRDDs()
            ).asJava()
        return {int(k) for k in conv.keySet().toArray()}

    def _drop_blocks(ids: set[int]) -> None:
        conv = spark._jvm.scala.collection.JavaConverters \
            .mapAsJavaMapConverter(
                spark.sparkContext._jsc.sc().getPersistentRDDs()
            ).asJava()
        for k in list(conv.keySet().toArray()):
            if int(k) in ids:
                conv.get(k).unpersist(False)

    before = _persistent_ids()
    vocab = (
        word_counts(docs, text_col, min_parallelism)
        .withColumn("syms", _initial_symbols(F.col("word")))
        .localCheckpoint(eager=True)
    )
    vocab_ids = _persistent_ids() - before
    # the pair table is STATE, maintained incrementally (the standard
    # fast-BPE delta update): a merge only changes words that contain
    # the merged pair, so each round subtracts the changed words' old
    # pairs and adds their new ones instead of re-exploding the whole
    # vocabulary — the full pair_counts() pass runs exactly once
    before = _persistent_ids()
    pc = pair_counts(vocab).localCheckpoint(eager=True)
    pc_ids = _persistent_ids() - before
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges:
        k = min(batch_merges, n_merges - len(merges))
        rows = (
            pc.orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
            .limit(k + 1)
            .collect()
        )
        if not rows or rows[0]["cnt"] < min_count:
            break
        cand, boundary = _candidate_prefix(rows, k, min_count)
        if len(cand) > 1:
            # pair-table probe (materialized state, pair-vocabulary-
            # sized): which candidate concatenations already exist as
            # symbols? — the growth guard _select_merge_batch needs
            concats = [lhs + rhs for (lhs, rhs, _c) in cand]
            colliding = {
                r["s"]
                for r in pc.select(
                    F.explode(F.array("lhs", "rhs")).alias("s")
                ).where(F.col("s").isin(concats)).distinct().collect()
            }
        else:
            colliding = set()
        batch = _select_merge_batch(cand, boundary, colliding)
        merges.extend(batch)
        # the same containment pre-filter the batch apply uses marks the
        # (superset of) changed words for the delta; unchanged-but-
        # matching words contribute identical ± pair rows that cancel
        text = F.concat(F.col("word"), F.lit(END))
        may_hit = F.lit(False)
        for lhs, rhs, _cnt in batch:
            may_hit = may_hit | text.contains(lhs + rhs)
        # re-pin every round: keeps the fold expression depth at 1
        # regardless of merge count (32k merges would otherwise nest 32k
        # aggregate() layers into one plan)
        before = _persistent_ids()
        nxt = vocab.withColumn(
            "syms",
            _apply_merge_batch(F.col("syms"), batch, word=F.col("word")),
        ).localCheckpoint(eager=True)
        nxt_ids = _persistent_ids() - before

        def _pair_rows(df, sign):
            return df.where(may_hit).select(
                (sign * F.col("cnt")).alias("cnt"),
                F.explode(_pair_structs(F.col("syms"))).alias("p"),
            ).select(
                F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"),
                "cnt",
            )

        before = _persistent_ids()
        pc_next = (
            pc.unionByName(_pair_rows(vocab, F.lit(-1)))
            .unionByName(_pair_rows(nxt, F.lit(1)))
            .groupBy("lhs", "rhs")
            .agg(F.sum("cnt").alias("cnt"))
            .where(F.col("cnt") != 0)
            .localCheckpoint(eager=True)
        )
        pcn_ids = _persistent_ids() - before
        _drop_blocks(vocab_ids)
        _drop_blocks(pc_ids)
        vocab, vocab_ids = nxt, nxt_ids
        pc, pc_ids = pc_next, pcn_ids
    _drop_blocks(vocab_ids)
    _drop_blocks(pc_ids)
    return merges


def encode_bpe(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Sequential BPE encode of one word under a learned merge-rank dict
    — the standard lowest-rank-first loop (public algorithm; shared by
    the pandas UDF below and the test oracle)."""
    syms = list(word) + [END]
    while len(syms) >= 2:
        pairs = [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]
        ranked = [
            (ranks[p], i) for i, p in enumerate(pairs) if p in ranks
        ]
        if not ranked:
            break
        rank = min(ranked)[0]
        out, i = [], 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and (syms[i], syms[i + 1]) in ranks
                and ranks[(syms[i], syms[i + 1])] == rank
            ):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` under a learned merge table → input columns
    plus ``out_col: array<string>``. Arrow-batched pandas UDF; the merge
    dict ships ONCE per executor via ``sc.broadcast``; a per-batch word
    cache exploits Zipf (most instances are cache hits, so per-word work
    amortizes away)."""
    import re

    from pyspark.sql.functions import pandas_udf

    ranks = {(m[0], m[1]): r for r, m in enumerate(merges)}
    sc = docs.sparkSession.sparkContext
    bc = sc.broadcast(ranks)
    tok_re = re.compile(TOKEN_RE)

    @pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        rk = bc.value
        cache: dict[str, list[str]] = {}

        def one(t):
            if t is None:
                return []
            out: list[str] = []
            for w in tok_re.findall(t.lower()):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_bpe(w, rk)
                out.extend(got)
            return out

        return texts.map(one)

    return docs.withColumn(out_col, enc(F.col(text_col)))
