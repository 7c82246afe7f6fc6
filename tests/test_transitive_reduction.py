"""transitive_reduction (operators/scc.py) — fixtures + path equality."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.operators.scc import transitive_reduction


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_diamond_shortcut_removed(spark):
    e = _edges(
        spark,
        [("a", "b"), ("b", "d"), ("a", "c"), ("c", "d"), ("a", "d")],
    )
    assert _rows(transitive_reduction(e)) == [
        ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
    ]


def test_chain_with_long_shortcut(spark):
    # a->b->c->d plus a->d and b->d: both shortcuts drop
    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"), ("b", "d")],
    )
    assert _rows(transitive_reduction(e)) == [
        ("a", "b"), ("b", "c"), ("c", "d"),
    ]


def test_already_minimal_untouched(spark):
    pairs = [("a", "b"), ("a", "c"), ("x", "y")]
    e = _edges(spark, pairs)
    assert _rows(transitive_reduction(e)) == sorted(pairs)


@pytest.mark.parametrize("thr", [0, 500_000])
def test_cycle_raises_both_paths(spark, thr):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    with pytest.raises(ValueError, match="cycle"):
        transitive_reduction(e, collect_threshold=thr).collect()


def test_paths_identical(spark):
    pairs = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"), ("b", "d"),
        ("a", "e"), ("e", "d"), ("x", "y"), ("x", "z"), ("y", "z"),
        ("a", "b"), ("b", "a2"),  # dup edge + extra branch
    ]
    e = _edges(spark, pairs)
    small = transitive_reduction(e)
    dist = transitive_reduction(e, collect_threshold=0)
    assert _rows(small) == _rows(dist)
    assert small.columns == dist.columns
