"""Deterministic, portable sampling and dataset splits.

Training-data pipelines need samples and train/val/test splits that are
(a) reproducible run-to-run, (b) stable under repartitioning and engine
changes, and (c) assignable from the row KEY alone so late-arriving rows
of the same entity land in the same split. Spark's ``df.sample`` /
``randomSplit`` are none of these (partition-RNG based); the standard
fix is a salted cryptographic hash bucket on the key — the same
``md5`` first-8-hex-chars integer this repo already uses for page ids
(operators/extractors.prepare_pages), so every function here is exactly
reproducible in the DuckDB oracle and in any engine with md5.

All pure Catalyst expressions: a sample/split is a FILTER, pushed into
the scan — sampling 1% of 100 TB reads the column needed for the key
plus whatever survives projection pruning, and never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^32 buckets: the md5-prefix integer space
_BUCKETS = float(1 << 32)


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform [0, 1) double from md5(salt ‖ key) — the first 8 hex chars
    as a 32-bit integer over 2^32. Portable: DuckDB spells it
    ``cast('0x' || substr(md5(salt || key), 1, 8) as bigint) / 2^32``."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    return h / F.lit(_BUCKETS)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep rows whose hash bucket falls below ``fraction``.

    Key-stable: the same key is in or out regardless of partitioning,
    row order, engine, or run; different ``salt`` values draw
    independent samples. A plain filter — no shuffle, no RNG state.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1]: {fraction}")
    return df.filter(hash_bucket(F.col(key_col), salt) < fraction)


def split_column(
    key: Column, weights: dict[str, float], salt: str = ""
) -> Column:
    """Label column assigning each key to one split by cumulative weight
    intervals over the hash bucket (insertion order of ``weights``)."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = hash_bucket(key, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < acc
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Add a deterministic split label (default 80/10/10
    train/val/test). Same key → same split, forever and on any engine —
    the leakage-safety property ``randomSplit`` cannot give you."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn(
        out_col, split_column(F.col(key_col), weights, salt)
    )
