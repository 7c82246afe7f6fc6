from __future__ import annotations

from graphrag_rs_spark.operators.butterfly import butterfly_counts


def _rows(df):
    return {r["id"]: r["butterflies"] for r in df.collect()}


def test_single_butterfly(spark):
    e = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"), ("c", "x")],
        "left string, right string",
    )
    assert _rows(butterfly_counts(e)) == {"a": 1, "b": 1}


def test_three_common_neighbors(spark):
    # c(a,b) = 3 shared rights -> C(3,2) = 3 butterflies each
    e = spark.createDataFrame(
        [(u, r) for u in ("a", "b") for r in ("x", "y", "z")],
        "left string, right string",
    )
    assert _rows(butterfly_counts(e)) == {"a": 3, "b": 3}


def test_hub_cap_drops_right_node(spark):
    # right hub touches everyone; capped out, no wedges survive
    e = spark.createDataFrame(
        [(f"u{i}", "hub") for i in range(10)]
        + [("u0", "x"), ("u1", "x"), ("u0", "y"), ("u1", "y")],
        "left string, right string",
    )
    out = _rows(butterfly_counts(e, max_degree=5))
    assert out == {"u0": 1, "u1": 1}  # only x,y wedges counted
    full = _rows(butterfly_counts(e, max_degree=100))
    assert full["u0"] > 1  # uncapped, the hub contributes
