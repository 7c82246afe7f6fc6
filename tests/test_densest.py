"""Densest-subgraph peeling (operators/densest.py)."""

import pytest

from graphrag_rs_spark.operators.densest import densest_subgraph


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def _k4_plus_tail(spark):
    # K4 (density 6/4 = 1.5) with a pendant chain diluting the start
    rows = [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
        ("d", "e"), ("e", "f"), ("f", "g"),
    ]
    return _edges(spark, rows)


def test_peel_isolates_the_clique(spark):
    out = densest_subgraph(
        _k4_plus_tail(spark), factor_num=1, factor_den=1
    ).collect()
    members = {r.id for r in out}
    assert members == {"a", "b", "c", "d"}
    assert out[0].best_edges == 6 and out[0].best_nodes == 4


def test_round_one_is_recorded_and_can_win(spark):
    # a lone triangle: round 1 density 1.0; peel empties it — best is
    # round 1 with the full graph
    out = densest_subgraph(
        _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")]),
        factor_num=1,
        factor_den=1,
    ).collect()
    assert {r.id for r in out} == {"a", "b", "c"}
    assert out[0].best_round == 1
    assert out[0].best_edges == 3 and out[0].best_nodes == 3


def test_density_tie_prefers_earliest_round(spark):
    # two disjoint triangles: round 1 density 6/6 = 1, after one peel
    # everything is gone; single round recorded
    out = densest_subgraph(
        _edges(
            spark,
            [
                ("a", "b"), ("b", "c"), ("c", "a"),
                ("x", "y"), ("y", "z"), ("z", "x"),
            ],
        ),
        factor_num=1,
        factor_den=1,
    ).collect()
    assert out[0].best_round == 1
    assert len(out) == 6


def test_default_factor_is_faster_but_valid(spark):
    out = densest_subgraph(_k4_plus_tail(spark)).collect()
    # with eps = 1/2 the approximation may keep more than the clique,
    # but the reported counts must be a consistent (E, V) snapshot
    assert len(out) == out[0].best_nodes
    assert out[0].best_edges * 2 >= out[0].best_nodes  # density >= 0.5


def test_empty_input(spark):
    out = densest_subgraph(_edges(spark, []).limit(0)).collect()
    assert out == []


def test_bad_factor_raises(spark):
    with pytest.raises(ValueError):
        densest_subgraph(_edges(spark, [("a", "b")]), factor_num=1,
                         factor_den=2)


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError):
        densest_subgraph(
            _k4_plus_tail(spark), factor_num=1, factor_den=1, max_rounds=1
        )
