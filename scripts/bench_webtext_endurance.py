"""Webtext-channel endurance canary: the crawl-page → KG composite
(`web_page_triples`: outlinks + meta + Arrow-batched JSON-LD flatten +
root provenance edges) over a large synthetic HTML corpus.

Complements scripts/bench_endurance.py (wikitext extraction + fuzzy
dedup): this drives the ROUND-5 structured-data path at corpus scale to
show the pandas-UDF channel is linear and memory-flat — the failure
mode it canaries is Arrow batch accumulation / Python-worker bloat on
the flatten, which no sf0.1 gate would surface.

HTML comes from a crawl-style corpus materialized ONCE by
``sources.synth.write_crawl_pages`` (one JSON-LD entity with a bnode
author, two outlinks, one OG tag per page; microdata on every 3rd page
and RDFa on every 4th — all three entity-channel scan UDFs do real
work — ~0.4-0.6 KB of markup each) and
scanned from parquet, the honest 100 TB model. An earlier revision
synthesized the markup inside the timed scan with ``split_part``, which
Pattern.compiles per row on Spark 4 and contaminates the measurement —
see scripts/bench_webtext_scaling.py's docstring for the full diagnosis.

Prints ONE JSON line and appends it to ENDURANCE.json at the repo root.
Environment:
  SPARK_GRAFT_ENDURANCE_PAGES (default 1_000_000)
  SPARK_GRAFT_CPUS (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_extraction_framework_spark.session import get_spark  # noqa: E402

N_PAGES = int(os.environ.get("SPARK_GRAFT_ENDURANCE_PAGES", "1000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _tree_rss_kb(root_pid: int) -> int:
    total = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/status") as f:
                rss = ppid = 0
                for ln in f:
                    if ln.startswith("VmRSS:"):
                        rss = int(ln.split()[1])
                    elif ln.startswith("PPid:"):
                        ppid = int(ln.split()[1])
            total += rss  # single-host sandbox: count the whole tree
            _ = ppid
        except OSError:
            continue
    return total


class _RssSampler(threading.Thread):
    def __init__(self, interval: float = 2.0):
        super().__init__(daemon=True)
        self.peak_kb = 0
        self._halt = threading.Event()
        self._interval = interval

    def run(self):
        while not self._halt.is_set():
            self.peak_kb = max(self.peak_kb, _tree_rss_kb(os.getpid()))
            self._halt.wait(self._interval)

    def stop(self):
        self._halt.set()


def main() -> None:
    from pyspark.sql import functions as F

    from distributed_extraction_framework_spark.operators.structured_data import (
        web_page_triples,
    )
    from distributed_extraction_framework_spark.sources.synth import (
        write_crawl_pages,
    )

    spark = get_spark(
        app_name="defs-webtext-endurance",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
        extra_conf={"spark.ui.enabled": "false"},
    )
    path = f"/tmp/defs_crawl_pages_{N_PAGES}_p256"
    if not os.path.exists(path + "/_SUCCESS"):
        write_crawl_pages(spark, N_PAGES, path, partitions=256)
    crawl = spark.read.parquet(path).withColumn(
        "page_id", F.xxhash64("url"))

    sampler = _RssSampler()
    sampler.start()
    t0 = time.time()
    out = web_page_triples(crawl, id_col="page_id")
    # count() prunes the final string-assembly projection (regex/Arrow/
    # explode stages — the memory-relevant ones — still run); fine for a
    # memory-cliff canary that also wants n_triples, NOT for scaling
    # ledgers (see bench_webtext_scaling.py, which sums string lengths).
    n_triples = out.count()
    wall = round(time.time() - t0, 1)
    sampler.stop()
    sampler.join(timeout=5)

    res = {
        "metric": "endurance_webtext",
        "pages": N_PAGES,
        "cpus": CPUS,
        "web_page_triples_sec": wall,
        "n_triples": n_triples,
        "pages_per_sec": round(N_PAGES / wall, 1),
        "peak_rss_gb": round(sampler.peak_kb / 1024 / 1024, 2),
        "oom": False,
    }
    line = json.dumps(res)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "ENDURANCE.json"), "a") as f:
        f.write(line + "\n")
    print(line, flush=True)


if __name__ == "__main__":
    main()
