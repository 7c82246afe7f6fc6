"""Driver-contract harness: every queries() entry runs, and each one with
an oracle_sql() matches DuckDB row-for-row (the same comparison the driver
performs: row count + column names + order-insensitive value multiset)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"  # small sf for test speed; driver uses 0.01
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_normalize(x) for x in v)
    return v


def _multiset(rows):
    out = {}
    for r in rows:
        key = tuple(_normalize(v) for v in r)
        out[key] = out.get(key, 0) + 1
    return out


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"subj", "pred", "obj", "confidence", "n_context"}
    assert len(rows) > 0, "flagship should be non-empty on sf0.001"


def test_every_query_runs(spark):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_oracle_match(spark, duck, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]

    sdf = fn(spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(sql)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    # align duck columns to spark order
    idx = [duck_cols.index(c) for c in spark_cols]
    duck_aligned = [tuple(r[i] for i in idx) for r in duck_rows]

    assert len(spark_rows) == len(duck_aligned), (
        f"{name}: rows {len(spark_rows)} vs {len(duck_aligned)}"
    )
    ms, md = _multiset(spark_rows), _multiset(duck_aligned)
    if ms != md:
        only_s = [k for k in ms if ms[k] != md.get(k, 0)][:3]
        only_d = [k for k in md if md[k] != ms.get(k, 0)][:3]
        raise AssertionError(f"{name}: value mismatch; spark-only={only_s} duck-only={only_d}")


def test_oracle_keys_subset_of_queries():
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())
