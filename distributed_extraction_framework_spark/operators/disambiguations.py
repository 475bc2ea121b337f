"""Disambiguation side-set: load-or-compute + broadcast into extraction.

Reference parity: DistDisambiguations.scala:16,31-77 loads a ``Set[Long]``
of disambiguation page ids (from the dump's disambiguations SQL file, with
an object-file cache) that extractors consult through the extraction
context. A crawl corpus has no side SQL file, so the set is HARVESTED from
the pages themselves ({{Disambiguation}} transclusion), cached as parquet
(the reference's ``disambiguations-ids.obj`` cache, K3-style), and shipped
as a broadcast marker join — extractors then treat a page as a
disambiguation page if EITHER the template is present OR the side set says
so (the reference's behavior when the dump list disagrees with the text).

Scale shape: the harvest is one fused scan (same single-projection plan as
extract()); the marker join is an explicit ``F.broadcast`` — dab sets are
tiny relative to the corpus (~0.3% of pages), never a shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extractors import enrich_pages, prepare_pages

DAB_TEMPLATE = "Disambiguation"


def compute_disambiguation_pages(pages: DataFrame) -> DataFrame:
    """(page_id) of every page transcluding {{Disambiguation}} — one scan,
    no shuffle (the distinct is on an already-unique key, dropped)."""
    e = enrich_pages(prepare_pages(pages), with_parse=False)
    return e.filter(F.array_contains(F.col("tmpl_names"), DAB_TEMPLATE)).select(
        "page_id"
    )


def load_disambiguations(
    spark: SparkSession, pages: DataFrame, cache_path: str | None = None
) -> DataFrame:
    """Load-or-compute the disambiguation id set (reference
    ``DistDisambiguations.load``: try cache → compute → write cache)."""
    if cache_path and os.path.exists(os.path.join(cache_path, "_SUCCESS")):
        return spark.read.parquet(cache_path)
    dab = compute_disambiguation_pages(pages)
    if cache_path:
        dab.write.mode("overwrite").parquet(cache_path)
        return spark.read.parquet(cache_path)
    return dab
