"""asof_join: backward/forward, ties, tolerance, no-join plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphrag_rs_spark.operators.asof import asof_join


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_backward_basic_and_no_match(spark):
    quotes = _df(
        spark,
        [("A", 10, 1.0), ("A", 20, 2.0), ("A", 30, 3.0), ("B", 15, 9.0)],
        ["sym", "qt", "px"],
    )
    trades = _df(
        spark,
        [("A", 5, 100), ("A", 20, 101), ("A", 25, 102), ("B", 14, 103)],
        ["sym", "tt", "qty"],
    )
    out = {
        (r["sym"], r["tt"]): (r["qt"], r["px"])
        for r in asof_join(
            trades, quotes, on=["sym"], left_time="tt", right_time="qt"
        ).collect()
    }
    assert out[("A", 5)] == (None, None)        # nothing at or before t=5
    assert out[("A", 20)] == (20, 2.0)          # tie: equal time matches
    assert out[("A", 25)] == (20, 2.0)
    assert out[("B", 14)] == (None, None)       # B's quote is later


def test_forward_direction(spark):
    quotes = _df(spark, [("A", 10, 1.0), ("A", 30, 3.0)], ["sym", "qt", "px"])
    trades = _df(spark, [("A", 5, 1), ("A", 10, 2), ("A", 31, 3)], ["sym", "tt", "q"])
    out = {
        r["tt"]: r["qt"]
        for r in asof_join(
            trades, quotes, on=["sym"], left_time="tt", right_time="qt",
            direction="forward",
        ).collect()
    }
    assert out[5] == 10 and out[10] == 10 and out[31] is None


def test_tolerance_nulls_stale_matches(spark):
    quotes = _df(spark, [("A", 10, 1.0)], ["sym", "qt", "px"])
    trades = _df(spark, [("A", 12, 1), ("A", 50, 2)], ["sym", "tt", "q"])
    out = {
        r["tt"]: (r["qt"], r["px"])
        for r in asof_join(
            trades, quotes, on=["sym"], left_time="tt", right_time="qt",
            tolerance=5,
        ).collect()
    }
    assert out[12] == (10, 1.0)
    assert out[50] == (None, None)  # 40 units stale > tolerance, row kept


def test_colliding_payload_names_get_suffix(spark):
    right = _df(spark, [("A", 10, 7.0)], ["k", "t", "v"])
    left = _df(spark, [("A", 11, 1.0)], ["k", "t", "v"])
    out = asof_join(left, right, on=["k"], left_time="t", right_time="t")
    assert set(out.columns) == {"k", "t", "v", "t_r", "v_r"}
    r = out.collect()[0]
    assert (r["v"], r["v_r"], r["t_r"]) == (1.0, 7.0, 10)


def test_plan_has_window_but_no_join(spark):
    right = _df(spark, [("A", 10, 7.0)], ["k", "t", "v"])
    left = _df(spark, [("A", 11, 5)], ["k", "t", "q"])
    plan = (
        asof_join(left, right, on=["k"], left_time="t", right_time="t")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
                "BroadcastNestedLoopJoin", "BatchEvalPython"):
        assert bad not in plan
