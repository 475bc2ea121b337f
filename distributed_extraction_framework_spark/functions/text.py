"""Text analysis for training-data pipelines — all Catalyst, no Python.

Language-ID (stopword-marker heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (normalized digest + winnowing). Each returns a Column so it
composes into any select; every expression stays inside whole-stage codegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

# marker stopwords per language (tiny, deterministic, SQL-expressible)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "was"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "y", "las", "una"],
}


def _marker_hits(text: Column, words: list[str]) -> Column:
    pat = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(1)))


def lang_id(text: Column) -> Column:
    """Best-guess language from marker-stopword counts; 'und' when no
    marker fires (undetermined, BCP-47 convention)."""
    scores = [(lang, _marker_hits(text, ws)) for lang, ws in LANG_MARKERS.items()]
    best = F.greatest(*[s for _, s in scores])
    expr = F.when(best <= 0, F.lit("und"))
    for lang, s in scores:  # first-wins tie-break in insertion order
        expr = expr.when(s == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(F.coalesce(text, F.lit("")))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


BPE_ISH_PATTERN = r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count: letter runs, digit runs, single punctuation."""
    return F.size(
        F.regexp_extract_all(F.coalesce(text, F.lit("")), F.lit(BPE_ISH_PATTERN), F.lit(1))
    )


def quality_score(text: Column) -> Column:
    """Heuristic quality ∈ [0,1]: length band, punctuation ratio, stopword
    presence, mean-word-length sanity. Gopher-rules-style filter signal."""
    t = F.coalesce(text, F.lit(""))
    n_chars = F.length(t)
    n_tokens = token_count_ws(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"([.,;:!?])"), F.lit(1)))
    n_stop = _marker_hits(t, LANG_MARKERS["en"])
    mean_wl = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(F.lit(0.0))
    len_ok = F.when((n_chars >= 50) & (n_chars <= 100_000), 1.0).otherwise(0.25)
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_tokens).otherwise(F.lit(0.0))
    punct_ok = F.when((punct_ratio >= 0.0) & (punct_ratio <= 0.5), 1.0).otherwise(0.5)
    stop_ok = F.when(n_stop > 0, 1.0).otherwise(0.5)
    wl_ok = F.when((mean_wl >= 3.0) & (mean_wl <= 12.0), 1.0).otherwise(0.5)
    return F.round((len_ok * 0.3 + punct_ok * 0.2 + stop_ok * 0.25 + wl_ok * 0.25), 4)


def content_fingerprint(text: Column) -> Column:
    """Normalization-stable digest: lowercase, collapse whitespace, md5."""
    norm = F.lower(F.trim(F.regexp_replace(F.coalesce(text, F.lit("")), r"\s+", " ")))
    return F.md5(F.encode(norm, "utf-8"))


# Winnowing rolling-hash parameters: polynomial hash over code points mod
# 2^31-1 — every product < 2^52 (codepoint < 2^21 × weight < 2^31), so the
# numpy path never overflows int64 and a SQL oracle can recompute the exact
# hashes with plain integer arithmetic (unicode(substr(...)) per position).
WINNOW_BASE = 1_000_003
WINNOW_MOD = (1 << 31) - 1
# Python/SQL-shared ASCII whitespace class (RE2 \s and Python \s diverge on
# unicode, so both sides normalize with this explicit class)
WS_CLASS = "[ \t\n\r\f\v]+"


def make_winnowing_udf(k: int = 5, window: int = 4):
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03): k-gram rolling
    hashes, per-window minima — the standard rolling-hash document
    fingerprint. Numpy-vectorized pandas UDF (the window-min needs
    sequential state regex/SQL can't express); the hash itself is portable
    (polynomial mod 2^31-1) so the driver's DuckDB oracle recomputes it."""
    weights = np.array(
        [pow(WINNOW_BASE, k - 1 - j, WINNOW_MOD) for j in range(k)], dtype=np.int64
    )

    @F.pandas_udf(ArrayType(LongType()))
    def winnow(texts: pd.Series) -> pd.Series:
        import re

        ws = re.compile(WS_CLASS)
        out = []
        for t in texts:
            s = ws.sub(" ", (t or "").lower()).strip()
            if len(s) < k:
                out.append([])
                continue
            codes = np.fromiter((ord(c) for c in s), dtype=np.int64, count=len(s))
            hs = (
                np.lib.stride_tricks.sliding_window_view(codes, k) @ weights
            ) % WINNOW_MOD
            if hs.size <= window:
                out.append([int(hs.min())])
                continue
            sw = np.lib.stride_tricks.sliding_window_view(hs, window)
            mins = sw.min(axis=1)
            out.append(sorted(set(int(x) for x in mins)))
        return pd.Series(out)

    return winnow


def profile_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text-quality profile: all the above as columns."""
    t = F.col(text_col)
    return df.select(
        "*",
        lang_id(t).alias("lang_guess"),
        token_count_ws(t).alias("n_tokens_ws"),
        token_count_bpe(t).alias("n_tokens_bpe"),
        quality_score(t).alias("quality"),
        content_fingerprint(t).alias("fingerprint"),
    )


# sentence segmentation — the regex sticks to the Java-regex ∩ RE2 subset
# (no lookaround) so the DuckDB oracle runs the IDENTICAL pattern: a
# sentence is a maximal run of non-terminator characters followed by at
# least one terminator. A trailing terminator-less fragment is dropped by
# both engines the same way (crawl text trails mid-sentence constantly;
# counting it as a sentence double-counts truncation damage).
SENTENCE_RE = r"[^.!?]+[.!?]+"


def sentence_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document sentence segmentation profile: sentence count plus
    mean/max trimmed sentence length in characters — inputs to the
    classic C4-style heuristics ("drop pages whose mean sentence length
    is tiny" = menus/link farms, "huge" = minified junk). Pure Catalyst:
    one ``regexp_extract_all`` + array expressions, zero shuffles, zero
    Python."""
    sents = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(f"({SENTENCE_RE})"), 1
    )
    lens = F.transform(sents, lambda s: F.length(F.trim(s)))
    n = F.size(sents)
    total = F.aggregate(lens, F.lit(0), lambda a, x: a + x)
    return df.select(
        F.col(id_col),
        n.alias("n_sentences"),
        F.round(F.try_divide(total, n), 6).alias("avg_sentence_chars"),
        F.coalesce(F.array_max(lens), F.lit(0)).alias("max_sentence_chars"),
    )
