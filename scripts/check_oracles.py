"""Local replica of the driver's correctness gate: run each queries() entry
on Spark AND its oracle_sql() on DuckDB at sf0.01; compare row count,
column names, and order-insensitive value multiset.

Usage: python scripts/check_oracles.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from distributed_extraction_framework_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_CORRECTNESS", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark(master="local[8]", shuffle_partitions=16,
                      extra_conf={"spark.ui.enabled": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs, oracles = entry.queries(), entry.oracle_sql()
    failed, passed, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"· {name}: rows-only ({len(rows)} rows)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"✗ {name}: DUCKDB ERROR {type(e).__name__}: {e}")
            failed.append(name)
            continue
        problems = []
        if sorted(c.lower() for c in cols) != sorted(c.lower() for c in ocols):
            problems.append(f"cols {sorted(cols)} vs {sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} vs {len(orows)}")
        a, b = canon(rows, cols), canon(orows, ocols)
        if a != b:
            sa, sb = set(a), set(b)
            diff1 = list(sa - sb)[:3]
            diff2 = list(sb - sa)[:3]
            problems.append(f"values spark-only={diff1} oracle-only={diff2}")
        if problems:
            print(f"✗ {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"✓ {name}: {len(rows)} rows match")
            passed.append(name)
    print(f"\n{len(passed)} passed, {len(failed)} FAILED, {len(rows_only)} rows-only")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
