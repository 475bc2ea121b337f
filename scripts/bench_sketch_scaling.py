"""Two-cluster-size scaling for the SKETCH workload: grouped
HyperLogLog (operators/sketches.hll_registers + hll_estimate) over a
large URL stream at N vs 4N pinned cores.

Why a fourth scaling ledger: extraction (bench_scaling.py) is the
scan/parse kernel, the webtext composite adds the Python-worker pool,
fusion is the exchange-bound surface; the sketch channel is the
PARTIAL-AGGREGATE surface — per-row md5 + integer arithmetic folding
into a state bounded at groups × 2^p rows, with an exchange that ships
sketch rows instead of key rows. That is the mechanism the whole
sketches module banks on for 100 TB cardinality work, so the north
rule's two-level evidence should include it. It is also the workload
whose shuffle volume is INDEPENDENT of input size — if this channel
doesn't scale, nothing will.

Protocol mirrors v3's discipline: the input is materialized ONCE as a
256-file parquet table of (host, url) rows (timed passes only scan),
each level runs in a fresh subprocess pinned with ``taskset`` to
exactly N CPUs, heap 2 GiB/core, one untimed warmup then wall = min of
three timed passes, mirrored level order (lo, hi, hi, lo) to cancel
host drift. Results append to BENCH/sketch_scaling.json.

Environment: SPARK_GRAFT_SCALING_ROWS (default 128_000_000 urls),
SPARK_GRAFT_SCALING_LEVELS (default "8,32").
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_ROWS = int(os.environ.get("SPARK_GRAFT_SCALING_ROWS", "256000000"))
# 1000 hosts x (N_ROWS / 50) distinct urls: ~50 repeats per url models
# recrawl duplication; p=12 registers -> state 1000 * 4096 rows max
N_HOSTS = int(os.environ.get("SPARK_GRAFT_SCALING_HOSTS", "1000"))
URL_DIV = int(os.environ.get("SPARK_GRAFT_SCALING_URL_DIV", "50"))
LEVELS = tuple(int(x) for x in
               os.environ.get("SPARK_GRAFT_SCALING_LEVELS", "8,32").split(","))
LO, HI = LEVELS
RATIO = HI / LO

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from distributed_extraction_framework_spark.session import get_spark

n = int(sys.argv[1]); path = sys.argv[2]
hosts = int(sys.argv[3]); url_div = int(sys.argv[4])
spark = get_spark(app_name="defs-sketch-gen", master="local[32]",
                  shuffle_partitions=32,
                  extra_conf={{"spark.ui.enabled": "false"}})
d = F.col("id")
urls = spark.range(0, n, 1, 256).select(
    F.concat(F.lit("h"), (d % hosts).cast("string"), F.lit(".example"))
    .alias("host"),
    F.concat(F.lit("https://h"), (d % hosts).cast("string"),
             F.lit(".example/path/"),
             (F.floor(d / url_div) % (n // url_div)).cast("string"))
    .alias("url"),
)
urls.write.mode("overwrite").parquet(path)
print("generated", n)
"""

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from distributed_extraction_framework_spark.session import get_spark
from distributed_extraction_framework_spark.operators.sketches import (
    hll_estimate, hll_registers)

from pyspark.sql import functions as F

cpus = int(sys.argv[1]); n = int(sys.argv[2]); path = sys.argv[3]
spark = get_spark(app_name=f"defs-sketch-scale-{{cpus}}",
                  master=f"local[{{cpus}}]",
                  shuffle_partitions=4 * cpus,
                  extra_conf={{"spark.ui.enabled": "false",
                               "spark.driver.memory": f"{{2 * cpus}}g",
                               "spark.sql.files.maxPartitionBytes": "16m"}})
urls = spark.read.parquet(path)

def one_pass():
    # CONSUME the estimates (sum), do not count() the groups: count()
    # lets RemoveRedundantAggregates prune the agg functions and elide
    # the inner sketch aggregate entirely, reducing the job to a bare
    # distinct(host) scan — md5 never runs (measured: 5.7 s vs the real
    # 100 s at 8 cores on 512M rows). Ledger trials 1-3 made exactly
    # that mistake; their rows are marked DIAGNOSTIC.
    regs = hll_registers(urls, "url", p=12, group_cols=["host"])
    est = hll_estimate(regs, p=12, group_cols=["host"])
    return est.agg(F.sum("est")).collect()

one_pass()  # untimed warmup: codegen + shuffle services warm
walls = []
for _ in range(3):
    t0 = time.time(); one_pass(); walls.append(time.time() - t0)
print(json.dumps({{"cpus": cpus, "wall_sec": round(min(walls), 3),
                   "rows_per_sec": round(n / min(walls), 1)}}))
"""


def run_level(cpus: int, path: str) -> dict:
    mask = ",".join(str(i) for i in range(cpus))
    code = WORKER.format(repo=REPO)
    out = subprocess.run(
        ["taskset", "-c", mask, sys.executable, "-c", code,
         str(cpus), str(N_ROWS), path],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    path = f"/tmp/defs_sketch_urls_{N_ROWS}_h{N_HOSTS}_d{URL_DIV}_p256"
    if not os.path.exists(path + "/_SUCCESS"):
        subprocess.run(
            [sys.executable, "-c", GEN.format(repo=REPO),
             str(N_ROWS), path, str(N_HOSTS), str(URL_DIV)],
            check=True,
        )
    # mirrored order cancels monotonic host drift
    runs = [run_level(LO, path), run_level(HI, path),
            run_level(HI, path), run_level(LO, path)]
    lo = min((r for r in runs if r["cpus"] == LO),
             key=lambda r: r["wall_sec"])
    hi = min((r for r in runs if r["cpus"] == HI),
             key=lambda r: r["wall_sec"])
    eff = round(hi["rows_per_sec"] / (RATIO * lo["rows_per_sec"]), 3)
    trial = {
        "workload": "v3-sketch-hll",
        "kernel": "hll-p12",
        "n_rows": N_ROWS,
        "n_hosts": N_HOSTS,
        "url_div": URL_DIV,
        "levels": list(LEVELS),
        "lo": lo,
        "hi": hi,
        "scaling_efficiency": eff,
    }
    ledger = os.path.join(REPO, "BENCH", "sketch_scaling.json")
    trials = []
    if os.path.exists(ledger):
        with open(ledger) as f:
            trials = json.load(f)
    trials.append(trial)
    with open(ledger, "w") as f:
        json.dump(trials, f, indent=1)
    print(json.dumps(trial))


if __name__ == "__main__":
    main()
