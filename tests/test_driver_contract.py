"""Driver-contract regression: a representative subset of queries() vs
their DuckDB oracles at sf0.001 (fast); the full 31-query sweep lives in
scripts/check_oracles.py (sf0.01)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()

SUBSET = [
    "pricing_summary",
    "topk_orders_per_priority",
    "token_counts",
    "exact_dedup_docs",
    "cosine_topk",
    "x_labels",
    "x_page_links",
    "x_infobox_properties",
    "x_geo_coordinates",
    "redirect_closure",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.9g}"
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    qs, oracles = entry.queries(), entry.oracle_sql()
    df = qs[name](spark, SF)
    cols, rows = df.columns, [tuple(r) for r in df.collect()]
    cur = duck.execute(oracles[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(c.lower() for c in cols) == sorted(c.lower() for c in ocols)
    assert _canon(rows, cols) == _canon(orows, ocols)


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "dataset", "subj", "pred", "obj", "lang", "datatype", "context"
    }


def test_every_query_has_callable_and_oracle_coverage():
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    # every query is oracle-gated — the sketch family (minhash/simhash/
    # winnowing/lsh_ann) uses portable md5-derived hashing so even the
    # approximate indexes are hash-verified in SQL
    assert set(qs) == set(oracles)
