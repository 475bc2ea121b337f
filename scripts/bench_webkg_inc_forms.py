"""Interleaved A/B of incremental_web_triples plan forms (r6 §22).

The exchange-count plan audit flagged ``webkg_incremental`` as the
heaviest remaining plan (30 Exchanges / 30 Sorts / 15 SortMergeJoins /
15 parquet scans at the gate): the composite fans the changed-slice
semi-join into its five channels (the corpus-keyed join re-executes
once per channel), and the small stale/fresh key sides sort-merge
against the triple table. This harness measures the shipped form
against three rewrites — byte-gated broadcast of the key sides
(+ probe), a lazy pin of the changed-pages slice, and both combined —
with interleaved same-JVM rounds so host phase cancels pairwise.

Round-6 verdict (sf0.1 documents table, local[32]): the combined form
is plan-perfect (0 Exchanges, 5 BroadcastHashJoins, 5 scans) but LOSES
the measured A/B at gate scale — full 0/5 pairwise (min 1.88 vs
1.60 s), pin-only 1/8 (1.54 vs 1.37), broadcast-only 0/5 (1.78 vs
1.44): at a ~5k-key diff the probe job, checkpoint barrier and
blocking broadcast builds cost more than the KB-sized exchanges they
remove. The shipped form therefore stays; re-run this harness before
adopting the rewrite on a corpus where the diff join is
genuinely corpus-sized.

Usage: python scripts/bench_webkg_inc_forms.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from distributed_extraction_framework_spark.operators.structured_data import (  # noqa: E402
    web_page_triples,
)
from distributed_extraction_framework_spark.operators.webarchive import (  # noqa: E402
    recrawl_diff,
)
from distributed_extraction_framework_spark.plans.webkg import (  # noqa: E402
    incremental_web_triples as shipped_form,
)
from distributed_extraction_framework_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def _caps(pages, url_col, html_col):
    h = F.coalesce(F.col(html_col), F.lit(""))
    return pages.select(F.col(url_col).alias("key"),
                        F.md5(h).alias("digest"))


def rewrite_form(old_triples, pages_v1, pages_v2, url_col="url",
                 html_col="html", id_col="id",
                 broadcast_bytes=64 << 20, pin=True, bc=True):
    """The audited rewrite: byte-gated broadcast key sides + pinned
    changed slice. Results identical to the shipped form (gate-checked
    when this was trialled in-tree)."""
    diff = recrawl_diff(
        _caps(pages_v1, url_col, html_col),
        _caps(pages_v2, url_col, html_col), key_col="key",
    ).localCheckpoint(eager=False)
    stale = diff.filter(F.col("change").isin("changed", "removed")).select(
        F.col("key").alias(id_col))
    fresh = diff.filter(F.col("change").isin("changed", "added")).select(
        F.col("key").alias(url_col))
    if bc:
        probe = diff.agg(
            F.sum(F.when(F.col("change").isin("changed", "removed"), 1)
                  .otherwise(0)).alias("n_stale"),
            F.sum(F.when(F.col("change").isin("changed", "added"), 1)
                  .otherwise(0)).alias("n_fresh"),
            F.avg(F.length("key")).alias("w"),
        ).first()
        w = (probe["w"] or 0.0) + 24.0
        if int((probe["n_stale"] or 0) * w) <= broadcast_bytes:
            stale = F.broadcast(stale)
        if int((probe["n_fresh"] or 0) * w) <= broadcast_bytes:
            fresh = F.broadcast(fresh)
    kept = old_triples.join(stale, id_col, "left_anti")
    changed = pages_v2.join(fresh, url_col, "left_semi")
    if pin:
        changed = changed.localCheckpoint(eager=False)
    new = web_page_triples(
        changed, html_col=html_col, url_col=url_col, id_col=url_col,
    ).withColumnRenamed("id", id_col)
    return kept.unionByName(new)


def main() -> None:
    spark = get_spark(app_name="defs-webkg-inc-forms",
                      master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 16),
                      extra_conf={"spark.ui.enabled": "false"})

    # the gate's fixture: v1 → v2 with %5 removals, %3 changes, %7 adds
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    d = F.col("doc_id")
    ds = d.cast("string")
    url = F.concat(F.lit("https://i.example/"), ds)

    def html(target):
        return F.concat(
            F.lit('<a href="https://t.example/'), target,
            F.lit('">x</a><meta property="og:k" content="c'),
            (d % 3).cast("string"), F.lit('">'),
        )

    def inputs():
        v1 = docs.select(url.alias("url"), html(ds).alias("html"))
        v2 = docs.filter(d % 5 != 0).select(
            url.alias("url"),
            html(F.when(d % 3 == 0, (d + 7).cast("string")).otherwise(ds))
            .alias("html"),
        ).unionByName(docs.filter(d % 7 == 0).select(
            F.concat(F.lit("https://i.example/x"), ds).alias("url"),
            F.concat(F.lit('<a href="https://t.example/x'), ds,
                     F.lit('">y</a>')).alias("html"),
        ))
        old = web_page_triples(v1, id_col="url")
        return old, v1, v2

    def sink(df):
        df.write.format("noop").mode("overwrite").save()

    forms = {
        "shipped": lambda: shipped_form(*inputs()),
        "pin+bc": lambda: rewrite_form(*inputs()),
        "pin": lambda: rewrite_form(*inputs(), bc=False),
        "bc": lambda: rewrite_form(*inputs(), pin=False),
    }
    for fn in forms.values():  # warmup
        sink(fn())
    res: dict[str, list[float]] = {k: [] for k in forms}
    for rnd in range(ROUNDS):
        for tag, fn in forms.items():
            spark.sparkContext.setJobDescription(f"{tag} round {rnd}")
            t0 = time.time()
            sink(fn())
            res[tag].append(round(time.time() - t0, 3))
    print(res)
    base = res["shipped"]
    for tag in ("pin+bc", "pin", "bc"):
        wins = sum(1 for a, b in zip(base, res[tag]) if b < a)
        print(f"{tag}: {wins}/{ROUNDS} pairwise wins, "
              f"min {min(res[tag])} vs shipped {min(base)}")


if __name__ == "__main__":
    main()
