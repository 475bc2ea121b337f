"""BPE training endurance: many merges over the 1M-page synthetic corpus.

VERDICT r5 #1 follow-through: the batched merge rounds
(operators/tokenizer.bpe_train batch_merges) must push the per-merge cost
well below the sequential form's ~2.6 s/merge. Appends one
``endurance_bpe`` JSON row (same shape as the r5 row, plus round/batch
stats) to stdout; redirect into ENDURANCE.json to record it.

Usage: python scripts/bench_bpe_endurance.py [n_merges] [n_pages]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from distributed_extraction_framework_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from distributed_extraction_framework_spark.operators import tokenizer as TK
    from distributed_extraction_framework_spark.sources.synth import write_pages

    spark = get_spark(app_name="defs-bpe-endurance", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16),
                      extra_conf={"spark.ui.enabled": "false"})
    path = f"/tmp/defs_scaling_pages_{n_pages}_p256"
    if not os.path.exists(path + "/_SUCCESS"):
        write_pages(spark, n_pages, path, partitions=256)
    pages = spark.read.parquet(path)

    # count rounds by instrumenting the batch selector
    rounds = {"n": 0, "sizes": []}
    orig = TK._select_merge_batch

    def counting(cand, boundary, colliding):
        batch = orig(cand, boundary, colliding)
        rounds["n"] += 1
        rounds["sizes"].append(len(batch))
        return batch

    TK._select_merge_batch = counting
    t0 = time.time()
    merges = TK.bpe_train(pages, n_merges, min_count=2)
    train = round(time.time() - t0, 1)
    TK._select_merge_batch = orig

    out = {
        "metric": "endurance_bpe",
        "pages": n_pages,
        "cpus": cpus,
        "n_merges": len(merges),
        "train_sec": train,
        "sec_per_merge": round(train / max(len(merges), 1), 3),
        "rounds": rounds["n"],
        "mean_batch": round(sum(rounds["sizes"]) / max(rounds["n"], 1), 2),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
