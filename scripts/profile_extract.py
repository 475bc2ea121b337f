"""Component-level profile of the fused extraction at one parallelism level.

Answers "which component stops scaling 8→32?" by timing isolated slices of
the extraction plan on the same corpus the scaling bench uses. Run it
pinned (taskset) at two levels and compare per-component ratios.

Usage: python scripts/profile_extract.py <cpus> [n_pages]
Prints one JSON line {component: sec}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from distributed_extraction_framework_spark.session import get_spark  # noqa: E402
from distributed_extraction_framework_spark.operators import extractors as X  # noqa: E402
from distributed_extraction_framework_spark.functions import wikitext as W  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    path = f"/tmp/defs_scaling_pages_{n}"
    spark = get_spark(app_name=f"defs-profile-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8),
                      extra_conf={"spark.ui.enabled": "false"})
    if not os.path.exists(path + "/_SUCCESS"):
        from distributed_extraction_framework_spark.sources.synth import write_pages
        write_pages(spark, n, path, partitions=64)
    pages = spark.read.parquet(path)

    def sink(df):
        df.write.format("noop").mode("overwrite").save()

    prep = X.prepare_pages(pages)

    def scan_only():
        sink(pages.select(F.length("text").alias("l")))

    def prep_only():
        sink(prep.select("subj", "context", "ns", "page_id", "rev_id"))

    def regex_ilinks():
        sink(prep.select(F.regexp_extract_all(
            "text", F.lit(W.INTERNAL_LINK_PATTERN), F.lit(1)).alias("a")))

    def regex_all_flat():
        e = X.enrich_pages(prep, with_parse=False)
        sink(e.select("ilinks", "elinks", "tmpl_names", "redirect_target"))

    def parse_only():
        sink(prep.select(W.make_parse_page_udf()(F.col("text")).alias("p")))

    def abstracts_only():
        e = X.enrich_pages(prep, with_parse=False)
        sink(e.select(X.abstracts(e).alias("a")))

    def full():
        sink(X.extract(pages))

    def full_no_abstract():
        names = [k for k in X.EXTRACTORS if k != "abstracts"]
        sink(X.extract(pages, extractors=names))

    def full_no_parse():
        names = [k for k in X.EXTRACTORS if not X.EXTRACTORS[k][1]]
        sink(X.extract(pages, extractors=names))

    comps = [
        ("scan_only", scan_only),
        ("prep_only", prep_only),
        ("regex_ilinks", regex_ilinks),
        ("regex_all_flat", regex_all_flat),
        ("parse_only", parse_only),
        ("abstracts_only", abstracts_only),
        ("full_no_parse", full_no_parse),
        ("full_no_abstract", full_no_abstract),
        ("full", full),
    ]
    # warmup: one full pass compiles codegen + forks Python workers
    full()
    out = {"cpus": cpus, "n_pages": n}
    for name, fn in comps:
        walls = []
        for _ in range(2):
            t0 = time.time()
            fn()
            walls.append(time.time() - t0)
        out[name] = round(min(walls), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
