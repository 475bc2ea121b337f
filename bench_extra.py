"""Per-query isolation bench (guide §1.4) — NOT the driver bench.

``bench.py`` is frozen for measurement; this harness exists so the
optimization loop can time a CHOSEN subset of queries (noop sink, min-of-k
passes, job-description labels) and dump ``explain("formatted")`` plans
without paying for the whole suite.

Usage:
  python bench_extra.py [--passes N] [--plans plans/r06 --tag before] q1 q2 ...
  python bench_extra.py --all            # every Q.QUERIES entry
  python bench_extra.py extract_full pagerank_5it   # headline specials

Prints one JSON line {"queries": {name: min_sec}, "passes": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distributed_extraction_framework_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "60000"))
N_PAGES_FLAGSHIP = int(
    os.environ.get("SPARK_GRAFT_BENCH_FLAGSHIP_PAGES", "1000000")
)


def _sink(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--plans", default=None,
                    help="directory to write <query>_<tag>.txt explain dumps")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--no-time", action="store_true",
                    help="only dump plans, skip the timed passes")
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from distributed_extraction_framework_spark.operators import dedup as D
    from distributed_extraction_framework_spark.operators import similarity as SIM
    from distributed_extraction_framework_spark.operators.extractors import extract
    from distributed_extraction_framework_spark.operators.linking import (
        link_entities, surface_forms_from_labels,
    )
    from distributed_extraction_framework_spark.operators.redirects import (
        harvest_redirects, transitive_closure, resolve_objects,
    )
    from distributed_extraction_framework_spark.plans import driver_queries as Q
    from distributed_extraction_framework_spark.sources.synth import write_pages

    spark = get_spark(
        app_name="defs-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
        extra_conf={"spark.ui.enabled": "false"},
    )

    pages_path = f"/tmp/defs_bench_pages_{N_PAGES}"
    if not os.path.exists(pages_path + "/_SUCCESS"):
        write_pages(spark, N_PAGES, pages_path, partitions=max(CPUS * 2, 16))
    pages = spark.read.parquet(pages_path)

    def _flagship():
        flagship_path = f"/tmp/defs_scaling_pages_{N_PAGES_FLAGSHIP}_p256"
        if not os.path.exists(flagship_path + "/_SUCCESS"):
            write_pages(spark, N_PAGES_FLAGSHIP, flagship_path, partitions=256)
        return spark.read.parquet(flagship_path)

    # headline specials mirror bench.py's lambdas (same code, same inputs)
    def h_extract_full():
        return extract(_flagship())

    def h_redirect_resolve():
        return resolve_objects(
            extract(pages, extractors=["article_templates"]),
            transitive_closure(harvest_redirects(pages, namespaces=None)),
        )

    def h_entity_linking():
        quads = extract(pages, extractors=["labels"])
        return link_entities(pages, surface_forms_from_labels(quads))

    def h_minhash_lsh():
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        return D.minhash_lsh_pairs(docs, threshold=0.7)

    def h_simhash():
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        return D.simhash_near_duplicates(docs, max_hamming=6)

    def _embs():
        return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").withColumn(
            "embedding", F.col("embedding").cast("array<double>")
        )

    def h_cosine_topk():
        e = _embs()
        return SIM.cosine_topk_bruteforce(e.filter("vec_id < 50"), e, k=10)

    def h_cosine_topk_gemm():
        e = _embs()
        return SIM.cosine_topk_gemm(e.filter("vec_id < 50"), e, k=10)

    def h_pagerank_5it():
        from distributed_extraction_framework_spark.operators.graph import pagerank
        from distributed_extraction_framework_spark.plans.materialize import (
            edges_table,
        )

        links = extract(pages, extractors=["page_links"])
        edges = edges_table(links).select(
            F.col("subj").alias("src"), F.col("obj").alias("dst")
        )
        return pagerank(edges, iterations=5)

    HEADLINE = {
        "extract_full": h_extract_full,
        "redirect_resolve": h_redirect_resolve,
        "entity_linking": h_entity_linking,
        "minhash_lsh": h_minhash_lsh,
        "simhash": h_simhash,
        "cosine_topk": h_cosine_topk,
        "cosine_topk_gemm": h_cosine_topk_gemm,
        "pagerank_5it": h_pagerank_5it,
        "pricing_summary": lambda: Q.q_pricing_summary(spark, SF_DIR),
        "top_customer_revenue":
            lambda: Q.q_top_customer_revenue(spark, SF_DIR),
        "topk_orders": lambda: Q.q_topk_orders_per_priority(spark, SF_DIR),
        "sessionize": lambda: Q.q_sessionize(spark, SF_DIR),
        "asof_join": lambda: Q.q_asof_click_purchase(spark, SF_DIR),
        "range_join": lambda: Q.q_range_join_price_bands(spark, SF_DIR),
        "hypertable_rollup":
            lambda: Q.q_hypertable_rollup_daily(spark, SF_DIR),
    }

    names = list(args.names)
    if args.all:
        names = sorted(Q.QUERIES)

    def build(name):
        if name in HEADLINE:
            return HEADLINE[name]()
        return Q.QUERIES[name](spark, SF_DIR)

    timings: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    for name in names:
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = build(name)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(plan)
        if args.no_time:
            continue
        walls = []
        for i in range(max(args.passes, 1)):
            spark.sparkContext.setJobDescription(f"{name} pass {i}")
            t0 = time.time()
            _sink(build(name))
            walls.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        raw[name] = [round(w, 3) for w in walls]
        timings[name] = round(min(walls), 3)
        print(f"# {name}: {timings[name]} {raw[name]}", file=sys.stderr,
              flush=True)

    print(json.dumps({"queries": timings, "passes": raw, "sf": SF_DIR,
                      "cpus": CPUS}))


if __name__ == "__main__":
    main()
