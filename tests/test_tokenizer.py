"""Distributed BPE tokenizer induction (operators/tokenizer.py) vs an
independent sequential reference implementation of Sennrich et al. 2016
(the published algorithm, re-implemented here from its public form —
NOT shared code with the operator under test except encode_bpe, which is
additionally checked against hand-computed expectations)."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from distributed_extraction_framework_spark.operators.tokenizer import (
    END,
    bpe_encode,
    bpe_pair_counts,
    bpe_train,
    encode_bpe,
    word_counts,
)

# --- sequential reference (kept deliberately naive) ---


def ref_word_counts(texts):
    import re

    c = collections.Counter()
    for t in texts:
        c.update(re.findall("[a-z0-9]+", t.lower()))
    return c


def ref_pair_counts(symized):
    c = collections.Counter()
    for syms, cnt in symized.items():
        for i in range(len(syms) - 1):
            c[(syms[i], syms[i + 1])] += cnt
    return c


def ref_train(texts, n_merges, min_count=2):
    wc = ref_word_counts(texts)
    symized = {tuple(list(w) + [END]): c for w, c in wc.items()}
    merges = []
    for _ in range(n_merges):
        pc = ref_pair_counts(symized)
        if not pc:
            break
        # max count, lexicographically smallest pair on ties
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b), cnt = best
        merges.append((a, b, cnt))
        out = {}
        for syms, c in symized.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            out[tuple(merged)] = c
        symized = out
    return merges


TEXTS = [
    "low low low low low lower lower newest newest newest",
    "newest newest newest widest widest widest happier low",
    "the lowest newest widest happier lower the the the",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_word_counts_match_reference(docs, spark):
    got = {r["word"]: r["cnt"] for r in word_counts(docs).collect()}
    assert got == dict(ref_word_counts(TEXTS))


def test_pair_counts_match_reference(docs):
    wc = ref_word_counts(TEXTS)
    symized = {tuple(list(w) + [END]): c for w, c in wc.items()}
    want = {
        (a, b): c for (a, b), c in ref_pair_counts(symized).items()
    }
    got = {
        (r["lhs"], r["rhs"]): r["cnt"]
        for r in bpe_pair_counts(docs).collect()
    }
    assert got == want


def test_train_matches_reference_merge_for_merge(docs):
    want = ref_train(TEXTS, 12)
    got = bpe_train(docs, 12)
    assert got == want
    # the classic corpus: 'newest'/'widest' share 'est</w>', 'low' family
    # shares 'low' — the learned table must contain multi-char merges
    assert any(len(a + b) > 2 for a, b, _ in got)


def test_train_batched_equals_sequential(spark):
    # richer corpus than TEXTS so batches actually form AND collide:
    # deterministic pseudo-random words over a small alphabet create
    # heavy symbol overlap between top pairs (the case the prefix-
    # disjoint + strict-count-trim rule must survive), verified against
    # both the strictly sequential operator form and the reference
    import hashlib

    words = []
    for i in range(400):
        h = hashlib.md5(f"w{i}".encode()).hexdigest()
        words.append("".join("abcdefgh"[int(c, 16) % 8] for c in h[:6]))
    texts = [" ".join(words[i::7]) for i in range(7)]
    docs2 = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want = ref_train(texts, 40, min_count=1)
    sequential = bpe_train(docs2, 40, min_count=1, batch_merges=1)
    batched = bpe_train(docs2, 40, min_count=1)  # default batch 32
    assert sequential == want
    assert batched == want


def test_train_batched_concat_collision(spark):
    # the growth hole the concat-collision stop exists for: with 'ab'
    # already a frequent symbol pair-member, merging (a,b) creates new
    # 'ab' tokens and can RAISE (ab,c)-style counts past other batch
    # pairs — batched must still equal sequential merge-for-merge
    texts = [
        " ".join(["abc"] * 30 + ["ab"] * 4 + ["xy"] * 20 + ["qr"] * 18),
        " ".join(["abc"] * 25 + ["xy"] * 6 + ["ab"] * 3 + ["qr"] * 5),
    ]
    docs2 = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want = ref_train(texts, 12, min_count=1)
    got = bpe_train(docs2, 12, min_count=1)
    assert got == want


def test_train_min_count_stops_early(docs):
    # an absurd floor → only pairs with corpus-wide support survive
    got = bpe_train(docs, 50, min_count=10)
    assert all(c >= 10 for _, _, c in got)
    assert len(got) < 50


def test_train_deterministic_across_parallelism(docs, spark):
    one = bpe_train(docs.repartition(1), 8)
    many = bpe_train(docs.repartition(13), 8)
    assert one == many


def test_encode_roundtrip_and_greedy_overlap(docs):
    merges = bpe_train(docs, 10)
    ranks = {(a, b): r for r, (a, b, _) in enumerate(merges)}
    for w in ["low", "lowest", "newest", "unseen", "zzz"]:
        toks = encode_bpe(w, ranks)
        assert "".join(toks) == w + END  # lossless
    # greedy non-overlap: 'aaa' under a single (a,a) merge → ['aa','a</w>']
    # (the char split leaves 'a'+'</w>' adjacent; only the leading pair
    # merges because rank application is leftmost-first, non-overlapping)
    assert encode_bpe("aaa", {("a", "a"): 0}) == ["aa", "a", END]


def test_bpe_encode_dataframe(docs, spark):
    merges = bpe_train(docs, 10)
    ranks = {(a, b): r for r, (a, b, _) in enumerate(merges)}
    out = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(docs, merges).collect()
    }
    import re

    for i, t in enumerate(TEXTS):
        want = []
        for w in re.findall("[a-z0-9]+", t.lower()):
            want.extend(encode_bpe(w, ranks))
        assert out[i] == want


def test_encode_handles_null_text(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "low")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(df, []).collect()}
    assert rows[0] == []
    assert rows[1] == ["l", "o", "w", END]


def test_bpe_train_frees_checkpoint_blocks(docs, spark):
    """Per-iteration localCheckpoint blocks are dropped explicitly —
    DataFrame.unpersist() alone leaks them until JVM GC (code-review r5
    wave-4 #10)."""
    def persistent_ids():
        conv = spark._jvm.scala.collection.JavaConverters \
            .mapAsJavaMapConverter(
                spark.sparkContext._jsc.sc().getPersistentRDDs()
            ).asJava()
        return {int(k) for k in conv.keySet().toArray()}

    before = persistent_ids()
    bpe_train(docs, n_merges=3)
    assert persistent_ids() - before == set()
