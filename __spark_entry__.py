"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline on sf0.001: build the
deterministic wiki-markup pages table from ``documents`` and run the FULL
fused extractor suite (17 datasets, one scan, zero shuffles).

``queries()`` / ``oracle_sql()`` expose the operator inventory
(SURVEY.md §2 + the training-data ops) with DuckDB oracles; implementation
in distributed_extraction_framework_spark/plans/driver_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ensure_shipped(spark: SparkSession) -> None:
    from distributed_extraction_framework_spark.session import ship_package

    ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: constructed pages @ sf0.001 → full fused extraction."""
    _ensure_shipped(spark)
    from distributed_extraction_framework_spark.operators.extractors import extract
    from distributed_extraction_framework_spark.plans.driver_queries import _pages

    pages = _pages(spark, "/root/testdata/sf0.001")
    return extract(pages)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from distributed_extraction_framework_spark.plans.driver_queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_shipped(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from distributed_extraction_framework_spark.plans.driver_queries import ORACLES

    return dict(ORACLES)
