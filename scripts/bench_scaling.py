"""Scaling-efficiency bench: the SAME extraction workload at two
parallelism levels (local[8] vs local[32] — the sandbox stand-in for N vs
4N executors, per BASELINE.md), reporting docs/sec at both and
efficiency = throughput(4N) / (4 · throughput(N)). Target ≥ 0.8
(BASELINE.json north_rule). Results → BENCH/BASELINE.md.

Each level runs in a FRESH subprocess (own JVM) with an untimed warmup,
so neither level inherits the other's JIT state.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PAGES = int(os.environ.get("SPARK_GRAFT_SCALING_PAGES", "300000"))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from distributed_extraction_framework_spark.session import get_spark
from distributed_extraction_framework_spark.operators.extractors import extract

cpus = int(sys.argv[1]); n = int(sys.argv[2]); path = sys.argv[3]
spark = get_spark(app_name=f"defs-scaling-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(cpus, 8),
                  extra_conf={{"spark.ui.enabled": "false"}})
pages = spark.read.parquet(path)

def sink(df):
    df.write.format("noop").mode("overwrite").save()

# one full untimed pass: C2 JIT, codegen, and ALL Python workers warm
sink(extract(pages))
# steady state: min of two timed passes
walls = []
for _ in range(2):
    t0 = time.time(); sink(extract(pages)); walls.append(time.time() - t0)
wall = min(walls)
print(json.dumps({{"cpus": cpus, "wall_sec": round(wall, 3),
                   "docs_per_sec": round(n / wall, 1)}}))
"""


def run_level(cpus: int, pages_path: str) -> dict:
    """Run one parallelism level pinned to exactly ``cpus`` CPUs.

    Pinning matters: Spark's JVM threads and the Arrow Python workers run
    CONCURRENTLY, so an unpinned local[8] consumes up to ~2×8 CPUs and
    overstates the N-level baseline. ``taskset`` makes local[N] a true
    N-CPU allocation — the faithful stand-in for an N-core executor fleet.
    """
    script = WORKER.format(repo=REPO)
    cmd = [sys.executable, "-c", script, str(cpus), str(N_PAGES), pages_path]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    # generate the shared input once
    sys.path.insert(0, REPO)
    from distributed_extraction_framework_spark.session import get_spark
    from distributed_extraction_framework_spark.sources.synth import write_pages

    pages_path = f"/tmp/defs_scaling_pages_{N_PAGES}"
    if not os.path.exists(pages_path + "/_SUCCESS"):
        spark = get_spark(master="local[16]", extra_conf={"spark.ui.enabled": "false"})
        write_pages(spark, N_PAGES, pages_path, partitions=64)
        spark.stop()

    r8 = run_level(8, pages_path)
    r32 = run_level(32, pages_path)
    eff = round(r32["docs_per_sec"] / (4 * r8["docs_per_sec"]), 3)
    result = {"n_pages": N_PAGES, "local8": r8, "local32": r32,
              "scaling_efficiency": eff}
    print(json.dumps(result))

    md = f"""# BENCH — scaling efficiency (north_rule evidence)

Workload: the full fused 17-extractor suite (`operators/extractors.extract`)
over {N_PAGES:,} synthetic Common-Crawl-style pages (sources/synth.py,
seed=42), identical input at both parallelism levels, fresh JVM per level,
one full untimed warmup pass (C2 JIT + all Python workers), steady-state
wall = min of two timed passes, noop sink (no write IO).

`local[8]` vs `local[32]` is the sandbox stand-in for N vs 4N executors
(driver instruction; no real cluster available here). The job is a single
narrow stage — scan → fused projection → explode — so there is no shuffle
to erode scaling; the efficiency ceiling is CPU contention only.

| level | wall (s) | docs/sec |
|---|---|---|
| local[8]  (N)  | {r8['wall_sec']} | {r8['docs_per_sec']} |
| local[32] (4N) | {r32['wall_sec']} | {r32['docs_per_sec']} |

**Scaling efficiency = throughput(4N) / (4 × throughput(N)) = {eff}**
(target ≥ 0.8, BASELINE.json north_rule).

Reproduce: `python scripts/bench_scaling.py`
(env `SPARK_GRAFT_SCALING_PAGES` overrides the corpus size).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
