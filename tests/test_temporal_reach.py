"""Temporal earliest-arrival reachability (operators/temporal_reach.py)."""

import pytest

from graphrag_rs_spark.operators.temporal_reach import temporal_reachability


def _run(spark, edges, sources, **kw):
    e = spark.createDataFrame(edges, "src string, dst string, t long")
    s = spark.createDataFrame([(x,) for x in sources], "id string")
    return {
        (r.source, r.id): (r.arrival, r.hops)
        for r in temporal_reachability(e, s, **kw).collect()
    }


def test_decreasing_timestamps_block_the_path(spark):
    # a->b at 5, b->c at 3: c is NOT reachable through b; direct a->c at 9 is
    out = _run(
        spark,
        [("a", "b", 5), ("b", "c", 3), ("a", "c", 9)],
        ["a"],
    )
    assert out[("a", "b")] == (5, 1)
    assert out[("a", "c")] == (9, 1)  # the late direct edge, not via b


def test_foremost_path_beats_fewer_hops(spark):
    # direct a->d at 9; a->b->d arrives at 4 with 2 hops: foremost wins
    out = _run(
        spark,
        [("a", "d", 9), ("a", "b", 2), ("b", "d", 4)],
        ["a"],
    )
    assert out[("a", "d")] == (4, 2)


def test_equal_arrival_prefers_fewer_hops(spark):
    out = _run(
        spark,
        [("a", "d", 7), ("a", "b", 1), ("b", "d", 7)],
        ["a"],
    )
    assert out[("a", "d")] == (7, 1)


def test_source_itself_and_unreachable(spark):
    out = _run(spark, [("a", "b", 1), ("x", "y", 1)], ["a"])
    assert out[("a", "a")] == (0, 0)
    assert ("a", "x") not in out and ("a", "y") not in out


def test_multiple_sources_independent(spark):
    out = _run(spark, [("a", "b", 3), ("b", "c", 4)], ["a", "b"])
    assert out[("a", "c")] == (4, 2)
    assert out[("b", "c")] == (4, 1)
    assert ("b", "a") not in out


def test_start_time_filters_early_edges(spark):
    out = _run(spark, [("a", "b", 3)], ["a"], start_time=5)
    assert ("a", "b") not in out  # edge departs before we exist


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError):
        _run(
            spark,
            [("a", "b", 1), ("b", "c", 2), ("c", "d", 3)],
            ["a"],
            max_rounds=1,
        )


def test_temporal_reach_small_path_equals_distributed(spark):
    """The driver small path must replay the distributed rounds
    bit-identically (same (arrival, hops) minima and tie-breaks)."""
    from graphrag_rs_spark.operators.temporal_reach import temporal_reachability

    rows = [("a", "b", 3), ("b", "c", 5), ("a", "c", 9), ("c", "d", 6),
            ("a", "d", 1), ("d", "b", 2), ("x", "y", 4)]
    e = spark.createDataFrame(rows, "src string, dst string, t long")
    s = spark.createDataFrame([("a",), ("x",)], "id string")
    small = sorted(map(tuple, temporal_reachability(e, s, start_time=0).collect()))
    dist = sorted(map(tuple, temporal_reachability(
        e, s, start_time=0, collect_threshold=0).collect()))
    assert small == dist and small
