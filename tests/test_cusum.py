"""CUSUM via the prefix-min identity (operators/cusum.py)."""

import datetime as dt

from graphrag_rs_spark.operators.cusum import cusum_scores


def _series(spark, values, user=1):
    rows = [
        (i, dt.datetime(2024, 1, 1, 0, i), user, v)
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, x long"
    )


def _reference(values, drift):
    s, out = 0, []
    for v in values:
        s = max(0, s + v - drift)
        out.append(s)
    return out


def test_matches_sequential_recurrence(spark):
    values = [5, -3, 10, 2, -20, 7, 7, 7, -1, 0, 30]
    got = [
        r.cusum
        for r in cusum_scores(_series(spark, values), drift=2)
        .orderBy("event_id")
        .collect()
    ]
    assert got == _reference(values, 2)


def test_reset_after_deep_negative(spark):
    # the max(0, .) clamp: a crash resets the statistic to zero
    values = [10, -100, 4, 4]
    got = [
        r.cusum
        for r in cusum_scores(_series(spark, values), drift=0)
        .orderBy("event_id")
        .collect()
    ]
    assert got == [10, 0, 4, 8]


def test_alarm_threshold(spark):
    values = [4, 4, 4, 4]
    rows = (
        cusum_scores(_series(spark, values), drift=0, threshold=10)
        .orderBy("event_id")
        .collect()
    )
    assert [r.alarm for r in rows] == [0, 0, 1, 1]


def test_users_are_independent(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 1), 1, 100),
        (2, dt.datetime(2024, 1, 1, 0, 2), 2, 100),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, x long"
    )
    out = {r.event_id: r.cusum for r in cusum_scores(df).collect()}
    assert out == {1: 100, 2: 100}
