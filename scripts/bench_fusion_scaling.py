"""Two-cluster-size scaling for the FUSION workload: majority-vote
truth discovery (operators/fusion.resolve_functional) over a large
claims table at N vs 4N pinned cores.

Why a third scaling ledger: the extraction kernel
(scripts/bench_scaling.py) is scan/CPU-bound and the webtext composite
(scripts/bench_webtext_scaling.py) adds the Python-worker mechanism;
fusion is the engine's EXCHANGE-bound surface — a distinct plus three
hash aggregations on (subj, pred[, obj]) keys — so its N→4N behaviour
exercises shuffle write/read and sort paths the other two never touch.
A KG build at 10^12 pages spends much of its wall in exactly these
exchanges, so the north rule's two-level evidence should include one.

Protocol mirrors v3's discipline: the input claims table is
materialized ONCE (256 parquet files; timed passes only scan), each
level runs in a fresh subprocess pinned with ``taskset`` to exactly N
CPUs, heap 2 GiB/core, one untimed warmup then wall = min of three
timed passes, mirrored level order (lo, hi, hi, lo) to cancel host
drift. Results append to BENCH/fusion_scaling.json.

Ledger lesson (trial #1, kept as a diagnosis row): the first-cut
resolve_functional ranked winners with a row_number window and computed
n_sources with a second count-distinct over the raw claims — two full
claims scans plus an exchange+sort of the votes table. 8 pinned cores:
30.3 s for 32M claims, N→4N efficiency 0.526. The rewrite (plain
distinct fused by Catalyst into each downstream aggregate — pruned
scans + map-side partials instead of count-distinct EXPANDs — and a
min_by over struct(-votes, obj) instead of the window sort) brought the
same 32M workload to 9.6 s at 8 cores — measure, don't guess.

Environment: SPARK_GRAFT_SCALING_ROWS (default 128_000_000 claims),
SPARK_GRAFT_SCALING_LEVELS (default "8,32").
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_ROWS = int(os.environ.get("SPARK_GRAFT_SCALING_ROWS", "128000000"))
# claims-per-distinct-fact duplication: entities = N_ROWS // ENT_DIV.
# ENT_DIV 256 gives ~20 claims per (subj, pred, obj, source) quad — the
# realistic web shape (many pages per host republish a fact), which is
# what map-side combine exists for; the first ledger trials used the
# near-unique worst case (ENT_DIV 16) and measured the single host's
# hash-aggregation allocation wall more than the operator
ENT_DIV = int(os.environ.get("SPARK_GRAFT_SCALING_ENT_DIV", "256"))
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
spark = get_spark(app_name="defs-fusion-gen", master="local[32]",
                  shuffle_partitions=32,
                  extra_conf={{"spark.ui.enabled": "false"}})
d = F.col("id")
# n/ENT_DIV entities x 2 predicates; 13 hosts, hosts 0-3 systematically
# wrong (same conflict topology as the webkg_fused gate, at bench scale)
ents = n // int(sys.argv[3])
claims = spark.range(0, n, 1, 256).select(
    F.concat(F.lit("https://ent.example/e"), (d % ents).cast("string"))
    .alias("subj"),
    F.element_at(F.array(F.lit("population"), F.lit("capital")),
                 (d % 2).cast("int") + 1).alias("pred"),
    F.concat(F.lit("v"),
             F.when(d % 13 < 4, (d % ents) * 7 + 1 + (d % 13) % 2)
             .otherwise((d % ents) * 7).cast("string")).alias("obj"),
    F.concat(F.lit("h"), (d % 13).cast("string"), F.lit(".example"))
    .alias("source"),
)
claims.write.mode("overwrite").parquet(path)
print("generated", n)
"""

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from distributed_extraction_framework_spark.session import get_spark
from distributed_extraction_framework_spark.operators.fusion import (
    resolve_functional)

cpus = int(sys.argv[1]); n = int(sys.argv[2]); path = sys.argv[3]
spark = get_spark(app_name=f"defs-fusion-scale-{{cpus}}",
                  master=f"local[{{cpus}}]",
                  shuffle_partitions=4 * cpus,
                  extra_conf={{"spark.ui.enabled": "false",
                               "spark.driver.memory": f"{{2 * cpus}}g",
                               "spark.sql.files.maxPartitionBytes": "16m"}})
claims = spark.read.parquet(path)

def one_pass():
    # CONSUME the resolved values — .count() here is a trap: Catalyst
    # prunes every unused aggregate function and collapses the whole
    # operator to distinct(subj) JOIN distinct(subj) (verified on the
    # optimized plan), so a counted pass never runs the votes aggregate,
    # min_by argmax, or countDistinct at all. Ledger trials predating
    # 2026-08-20 made exactly that mistake and are marked DIAGNOSTIC.
    r = resolve_functional(claims)
    return r.agg(F.sum(F.length("obj")), F.sum("votes"),
                 F.sum("n_sources"), F.sum("n_values")).collect()

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
    path = f"/tmp/defs_fusion_claims_{N_ROWS}_d{ENT_DIV}_p256"
    if not os.path.exists(path + "/_SUCCESS"):
        subprocess.run(
            [sys.executable, "-c", GEN.format(repo=REPO),
             str(N_ROWS), path, str(ENT_DIV)],
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
        "workload": "v3-fusion",
        "kernel": "fusion",
        "n_rows": N_ROWS,
        "ent_div": ENT_DIV,
        "levels": list(LEVELS),
        "lo": lo,
        "hi": hi,
        "scaling_efficiency": eff,
    }
    ledger = os.path.join(REPO, "BENCH", "fusion_scaling.json")
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
