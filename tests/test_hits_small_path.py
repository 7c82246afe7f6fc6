"""hits() guarded driver small path: equal to the distributed rounds at
the 6-dp rounding every consumer applies (collect_threshold=0 forces
the distributed path). Order-robustness at that precision is the status
quo — the distributed path already sums in nondeterministic partition
order against a fixed-order DuckDB oracle."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.operators.analytics import hits


CASES = [
    [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")],
    [("x", "y")],                                  # pure hub / pure auth
    [("a", "b"), ("a", "c"), ("a", "d"), ("b", "a")],  # star + back-edge
    [("a", "b"), ("a", "b"), ("b", "a")],          # duplicate edges
]


@pytest.mark.parametrize("pairs", CASES)
def test_hits_paths_equal_at_6dp(spark, pairs):
    e = spark.createDataFrame(pairs, "src string, dst string")
    small = {
        r["id"]: (round(r["hub"], 6), round(r["authority"], 6))
        for r in hits(e).collect()
    }
    dist = {
        r["id"]: (round(r["hub"], 6), round(r["authority"], 6))
        for r in hits(e, collect_threshold=0).collect()
    }
    assert small == dist


def test_hits_columns_and_support(spark):
    e = spark.createDataFrame([("x", "y")], "src string, dst string")
    out = hits(e)
    assert out.columns == ["id", "hub", "authority"]
    rows = {r["id"]: r for r in out.collect()}
    # y has no out-edge -> hub 0; x has no in-edge -> authority 0
    assert rows["y"]["hub"] == 0.0 and rows["x"]["authority"] == 0.0
