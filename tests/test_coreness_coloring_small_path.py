"""Guarded driver small paths for core_decomposition and
jones_plassmann_coloring: row-identical to the distributed peel/round
iteration on the same input (collect_threshold=0 forces distributed)."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.operators.coloring import jones_plassmann_coloring
from graphrag_rs_spark.operators.coreness import core_decomposition


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _graph(spark):
    # a 4-clique (coreness 3), a pendant chain, a triangle, a self-loop,
    # a duplicate edge, and an isolated pair
    return _edges(
        spark,
        [
            ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
            ("c", "d"),
            ("d", "e"), ("e", "f"),          # pendant chain
            ("t1", "t2"), ("t2", "t3"), ("t3", "t1"),  # triangle
            ("z", "z"),                      # self-loop: dropped
            ("a", "b"),                      # duplicate
            ("p", "q"),
        ],
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_coreness_paths_identical(spark):
    e = _graph(spark)
    small = core_decomposition(e)
    dist = core_decomposition(e, collect_threshold=0)
    assert _rows(small) == _rows(dist)
    assert small.columns == dist.columns
    got = dict(_rows(small))
    assert got["a"] == 3 and got["f"] == 1 and got["t1"] == 2 and got["p"] == 1


def test_coreness_empty_and_raise(spark):
    empty = _edges(spark, []).union(_edges(spark, [("s", "s")]))
    for thr in (0, 200_000):
        assert _rows(core_decomposition(empty, collect_threshold=thr)) == []
    for thr in (0, 200_000):
        with pytest.raises(RuntimeError):
            core_decomposition(_graph(spark), max_k=2, collect_threshold=thr)


def test_jp_paths_identical(spark):
    e = _graph(spark)
    small = jones_plassmann_coloring(e)
    dist = jones_plassmann_coloring(e, collect_threshold=0)
    assert _rows(small) == _rows(dist)
    assert small.columns == dist.columns
    # proper coloring: no edge joins two same-colored endpoints
    col = {r[0]: r[1] for r in _rows(small)}
    for s, d in [(r[0], r[1]) for r in e.collect()]:
        if s != d:
            assert col[s] != col[d]


def test_jp_non_ascii_ids_fall_back_and_match(spark):
    # the driver path refuses non-ASCII ids (Python str order != UTF8
    # binary order off-ASCII); output must still match the forced
    # distributed path because both run the distributed rounds
    e = _edges(spark, [("é", "b"), ("b", "ç"), ("ç", "é")])
    small = jones_plassmann_coloring(e)
    dist = jones_plassmann_coloring(e, collect_threshold=0)
    assert _rows(small) == _rows(dist)


def test_jp_empty_graph(spark):
    for thr in (0, 200_000):
        out = jones_plassmann_coloring(
            _edges(spark, [("s", "s")]), collect_threshold=thr
        )
        assert _rows(out) == []
        assert out.columns == ["id", "color", "round"]
