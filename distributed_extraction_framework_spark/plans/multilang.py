"""Multi-language concurrent extraction — reference C1
(DistExtraction.scala:40-46: one job per language submitted concurrently
on a driver thread pool).

With a single pages table carrying a ``lang`` column, the per-wiki job
dimension mostly collapses into partitioning (SURVEY.md §2.1 C1). Two
forms are provided:

* ``extract_partitioned`` — ONE job, quads written partitioned by
  (lang, dataset): the preferred 100 TB shape (no concurrency management,
  full cluster utilization, one scan).
* ``extract_concurrent`` — faithful C1: one Spark job per language
  submitted from a driver thread pool into fair-scheduler pools; useful
  when per-language sinks/configs genuinely differ (the reference's case).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extractors import extract


def with_page_lang(quads: DataFrame) -> DataFrame:
    """Append ``page_lang``: the SUBJECT page's language. It equals the
    quad's lang column for literals, but resource-only quads carry null
    lang — recover it from the subj URI host instead."""
    from .. import schema as S

    host = S.RESOURCE_HOST.replace(".", r"\.")
    page_lang = F.when(
        F.col("subj").rlike(rf"^http://[a-z]{{2,3}}\.{host}/"),
        F.regexp_extract("subj", r"^http://([a-z]{2,3})\.", 1),
    ).otherwise("en")
    return quads.withColumn("page_lang", page_lang)


def extract_partitioned(pages: DataFrame, out_path: str,
                        extractors: list[str] | None = None) -> None:
    """One fused job; sink partitioned by (lang, dataset)."""
    quads = extract(pages, extractors=extractors)
    (
        with_page_lang(quads)
        .write.mode("overwrite")
        .partitionBy("page_lang", "dataset")
        .parquet(out_path)
    )


def extract_concurrent(
    spark: SparkSession,
    pages: DataFrame,
    langs: list[str],
    sink: Callable[[str, DataFrame], None],
    max_parallel: int = 4,
    extractors: list[str] | None = None,
) -> dict[str, int]:
    """The reference's thread-pool form: one job per language, concurrent.

    Each thread sets its own fair-scheduler pool so languages share the
    cluster instead of FIFO-queueing. Returns per-language quad counts —
    collected as an ``observe()`` metric BY the sink's own write action,
    so each language pays exactly ONE extraction pass (the old
    ``quads.count()`` after the sink re-ran the whole fused extraction a
    second time per language). Contract: ``sink`` must run an action on
    the DataFrame it is given (every real sink writes), else the metric
    never materializes.
    """
    from pyspark.sql import Observation

    counts: dict[str, int] = {}

    def run(lang: str) -> tuple[str, int]:
        sc = spark.sparkContext
        sc.setLocalProperty("spark.scheduler.pool", f"lang-{lang}")
        try:
            obs = Observation()
            quads = extract(pages.filter(F.col("lang") == lang),
                            extractors=extractors).observe(
                obs, F.count(F.lit(1)).alias("n")
            )
            sink(lang, quads)
            return lang, int(obs.get["n"] or 0)
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)

    with ThreadPoolExecutor(max_workers=max_parallel) as pool:
        for lang, n in pool.map(run, langs):
            counts[lang] = n
    return counts
