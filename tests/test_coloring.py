"""Jones–Plassmann coloring (operators/coloring.py)."""

import pytest

from graphrag_rs_spark.operators.coloring import jones_plassmann_coloring


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_proper_coloring_on_clique_plus_chain(spark):
    rows = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "e")]
    out = jones_plassmann_coloring(_edges(spark, rows)).collect()
    color = {r.id: r.color for r in out}
    assert set(color) == {"a", "b", "c", "d", "e"}
    for s, d in rows:
        assert color[s] != color[d], (s, d)
    # triangle needs 3 colors; chain reuses low ones
    assert {color["a"], color["b"], color["c"]} == {0, 1, 2}
    assert max(color.values()) <= 2


def test_deterministic_across_runs(spark):
    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    r1 = sorted(
        (r.id, r.color, r.round)
        for r in jones_plassmann_coloring(_edges(spark, rows)).collect()
    )
    r2 = sorted(
        (r.id, r.color, r.round)
        for r in jones_plassmann_coloring(_edges(spark, rows)).collect()
    )
    assert r1 == r2


def test_round_one_winners_are_local_priority_maxima(spark):
    rows = [("a", "b"), ("b", "c")]
    out = jones_plassmann_coloring(_edges(spark, rows)).collect()
    by_round = {}
    for r in out:
        by_round.setdefault(r.round, set()).add(r.id)
    # every round-1 winner got color 0 (no colored neighbours yet)
    for r in out:
        if r.round == 1:
            assert r.color == 0
    # rounds are contiguous from 1
    assert min(by_round) == 1


def test_isolated_pair_and_self_loop(spark):
    out = jones_plassmann_coloring(
        _edges(spark, [("x", "y"), ("z", "z")])
    ).collect()
    color = {r.id: r.color for r in out}
    assert set(color) == {"x", "y"}  # self-loop-only vertex dropped
    assert color["x"] != color["y"]


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError):
        jones_plassmann_coloring(
            _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")]),
            max_rounds=1,
        )
