"""unimax_sample (mixture.py) and cochange_edges (diff.py) invariants."""

from __future__ import annotations

from graphrag_rs_spark.operators.diff import cochange_edges
from graphrag_rs_spark.operators.mixture import unimax_sample


def test_unimax_epoch_cap_and_budget_flow(spark):
    # strata: tiny (2 docs), small (4), big (100). budget 30, epochs 2.
    # smallest-first: tiny min(2*2, 30//3=10) = 4; small min(8, 26//2=13)
    # = 8; big min(200, 18//1) = 18.
    rows = (
        [(i, "tiny") for i in range(2)]
        + [(10 + i, "small") for i in range(4)]
        + [(100 + i, "big") for i in range(100)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = unimax_sample(df, budget=30, max_epochs=2).collect()
    by = {}
    for r in out:
        by.setdefault(r["stratum"], []).append(r)
    assert {s: r[0]["quota"] for s, r in by.items()} == {
        "tiny": 4, "small": 8, "big": 18
    }
    # a stratum can never emit more rows than it has docs, even when its
    # epoch-capped quota exceeds the doc count (quota = repeat budget)
    assert len(by["tiny"]) == 2 and len(by["small"]) == 4
    assert len(by["big"]) == 18
    # selection is the quota-lowest draws: ranks are 1..n contiguous
    for rows_ in by.values():
        assert sorted(r["stratum_rank"] for r in rows_) == list(
            range(1, len(rows_) + 1)
        )


def test_unimax_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "l" + str(i % 3)) for i in range(60)], "doc_id long, lang string"
    )
    a = sorted(map(tuple, unimax_sample(df, budget=20).collect()))
    b = sorted(map(tuple, unimax_sample(df, budget=20).collect()))
    assert a == b and len(a) == 20


def test_cochange_support_and_bulk_guard(spark):
    rows = [
        # a+b co-change twice, a+c once
        ("r", "c1", "a"), ("r", "c1", "b"),
        ("r", "c2", "a"), ("r", "c2", "b"), ("r", "c2", "c"),
        # bulk commit touching 4 files would add support everywhere —
        # dropped by the guard
        ("r", "bulk", "a"), ("r", "bulk", "b"),
        ("r", "bulk", "c"), ("r", "bulk", "d"),
    ]
    df = spark.createDataFrame(rows, "repo string, commit string, path string")
    out = {
        (r["path_a"], r["path_b"]): r["n_cochanges"]
        for r in cochange_edges(df, min_support=2, max_commit_files=3).collect()
    }
    assert out == {("a", "b"): 2}


def test_cochange_blocks_by_repo(spark):
    rows = [("r1", "c1", "a"), ("r1", "c1", "b"),
            ("r2", "c1", "a"), ("r2", "c1", "b")]
    df = spark.createDataFrame(rows, "repo string, commit string, path string")
    out = cochange_edges(df, min_support=1).collect()
    assert {(r["repo"], r["path_a"], r["path_b"]) for r in out} == {
        ("r1", "a", "b"), ("r2", "a", "b")
    }
