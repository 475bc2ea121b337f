"""Multi-language concurrency (reference C1) — concurrent jobs must equal
the single partitioned job."""

import glob
import os

from pyspark.sql import functions as F

from distributed_extraction_framework_spark.operators.extractors import extract
from distributed_extraction_framework_spark.plans.multilang import (
    extract_concurrent,
    extract_partitioned,
)


def test_partitioned_multilang_sink(spark, pages_df, tmp_path):
    out = str(tmp_path / "ml")
    extract_partitioned(pages_df, out, extractors=["labels", "page_links"])
    langs = {
        os.path.basename(p).split("=")[1] for p in glob.glob(out + "/page_lang=*")
    }
    assert {"en", "de", "fr"} <= langs
    back = spark.read.parquet(out)
    assert back.count() == extract(
        pages_df, extractors=["labels", "page_links"]
    ).count()


def test_concurrent_equals_partitioned(spark, pages_df, tmp_path):
    sunk = {}

    def sink(lang, df):
        p = str(tmp_path / f"q_{lang}")
        df.write.mode("overwrite").parquet(p)
        sunk[lang] = p

    counts = extract_concurrent(
        spark, pages_df, ["en", "de", "fr"], sink, extractors=["labels"]
    )
    assert set(counts) == {"en", "de", "fr"}
    whole = extract(pages_df, extractors=["labels"])
    assert sum(counts.values()) == whole.count()
    for lang, p in sunk.items():
        back = spark.read.parquet(p)
        assert back.count() == counts[lang]
        assert back.filter(~F.col("lang").eqNullSafe(lang)).count() == 0
