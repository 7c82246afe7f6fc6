"""Multi-touch attribution (operators/attribution.py)."""

import datetime as dt

from pyspark.sql import functions as F

from graphrag_rs_spark.operators.attribution import multi_touch_attribution


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _t(i):
    return dt.datetime(2024, 1, 1, 0, i)


def test_segmentation_and_credits(spark):
    rows = [
        (1, _t(1), 7, "click"),
        (2, _t(2), 7, "view"),
        (3, _t(3), 7, "purchase"),
        (4, _t(4), 7, "click"),
        (5, _t(5), 7, "purchase"),
        (6, _t(6), 7, "view"),  # no later conversion -> dropped
    ]
    out = multi_touch_attribution(_events(spark, rows)).collect()
    by_touch = {r.touch_event_id: r for r in out}
    assert set(by_touch) == {1, 2, 4}
    assert by_touch[1].conv_event_id == 3
    assert by_touch[2].conv_event_id == 3
    assert by_touch[4].conv_event_id == 5
    # conversion 3 has two touches: first/last split, linear 500k each
    assert (by_touch[1].first_credit, by_touch[1].last_credit) == (
        1_000_000,
        0,
    )
    assert (by_touch[2].first_credit, by_touch[2].last_credit) == (
        0,
        1_000_000,
    )
    assert by_touch[1].linear_credit == by_touch[2].linear_credit == 500_000
    # single-touch conversion gets everything in every model
    assert (
        by_touch[4].first_credit
        == by_touch[4].last_credit
        == by_touch[4].linear_credit
        == 1_000_000
    )


def test_credits_sum_to_unit_per_conversion(spark):
    rows = []
    eid = 0
    for u in range(3):
        for i in range(7):
            eid += 1
            rows.append((eid, _t(i), u, "click" if i % 2 else "view"))
        eid += 1
        rows.append((eid, _t(9), u, "purchase"))
    out = multi_touch_attribution(_events(spark, rows))
    sums = (
        out.groupBy("user_id", "conv_event_id")
        .agg(
            F.sum("first_credit").alias("f"),
            F.sum("last_credit").alias("l"),
            F.sum("linear_credit").alias("n"),
        )
        .collect()
    )
    assert sums
    for r in sums:
        assert (r.f, r.l, r.n) == (1_000_000, 1_000_000, 1_000_000)


def test_linear_remainder_goes_to_last_touch(spark):
    rows = [
        (1, _t(1), 1, "click"),
        (2, _t(2), 1, "click"),
        (3, _t(3), 1, "click"),
        (4, _t(4), 1, "purchase"),
    ]
    out = sorted(
        multi_touch_attribution(_events(spark, rows)).collect(),
        key=lambda r: r.touch_index,
    )
    assert [r.linear_credit for r in out] == [333333, 333333, 333334]


def test_purchase_only_user_produces_no_rows(spark):
    out = multi_touch_attribution(
        _events(spark, [(1, _t(1), 5, "purchase")])
    ).collect()
    assert out == []
