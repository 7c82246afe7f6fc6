"""Guarded driver small path for _multi_bfs / weighted_sssp: the
collect-threshold path must be row-identical to the distributed frontier
iteration on the same input (the scc.tarjan / kcenter / pagerank
path-equality contract).  collect_threshold=0 forces the distributed
path; the default routes small graphs to the driver."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.traversal import (
    closeness_centrality,
    eccentricity,
    harmonic_centrality,
    weighted_sssp,
)


def _edges(spark, triples):
    return spark.createDataFrame(triples, "src string, dst string, w long")


def _srcs(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id string")


def _graph(spark):
    # two components, a cycle, parallel edges with different weights,
    # and a directed-only reachable tail
    return _edges(
        spark,
        [
            ("a", "b", 1),
            ("b", "c", 4),
            ("a", "c", 9),
            ("a", "c", 2),  # parallel edge, cheaper — min must win
            ("c", "d", 1),
            ("d", "a", 1),  # cycle back
            ("x", "y", 7),  # separate component
        ],
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("directed", [False, True])
def test_weighted_sssp_paths_identical(spark, directed):
    e = _graph(spark)
    s = _srcs(spark, ["a", "x"])
    small = weighted_sssp(e, s, n_rounds=4, directed=directed)
    dist = weighted_sssp(
        e, s, n_rounds=4, directed=directed, collect_threshold=0
    )
    assert _rows(small) == _rows(dist)
    assert small.columns == dist.columns


def test_weighted_sssp_zero_rounds_duplicate_sources(spark):
    e = _graph(spark)
    s = _srcs(spark, ["a", "a"])
    small = weighted_sssp(e, s, n_rounds=0)
    dist = weighted_sssp(e, s, n_rounds=0, collect_threshold=0)
    assert _rows(small) == _rows(dist)
    assert len(_rows(small)) == 2  # occurrence-preserving at round 0


@pytest.mark.parametrize("directed", [False, True])
def test_multi_bfs_consumers_identical(spark, directed):
    e = _graph(spark)
    s = _srcs(spark, ["a", "x", "d"])
    # consumers route through _multi_bfs's default (driver) path; their
    # aggregates must stay self-consistent on it
    ecc = {r["source"]: r["eccentricity"] for r in eccentricity(e, s).collect()}
    assert ecc["a"] >= 1 and ecc["x"] == 1
    h = {r["source"]: r["h_ppm"] for r in harmonic_centrality(e, s).collect()}
    assert h["x"] == 1000000  # one neighbor at distance 1
    c = closeness_centrality(e, s).collect()
    assert {r["source"] for r in c} == {"a", "x", "d"}

    from graphrag_rs_spark.operators.traversal import _multi_bfs

    small = _multi_bfs(
        e, s, directed=directed, max_iter=64, op_name="t"
    )
    dist = _multi_bfs(
        e, s, directed=directed, max_iter=64, op_name="t",
        collect_threshold=0,
    )
    assert _rows(small) == _rows(dist)
    assert small.columns == dist.columns


def test_multi_bfs_max_iter_contract_matches(spark):
    # path graph depth 3 from 'a': distributed raises when no EMPTY
    # round lands within max_iter — the driver path must mirror it
    from graphrag_rs_spark.operators.traversal import _multi_bfs

    e = _edges(spark, [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)])
    s = _srcs(spark, ["a"])
    for thr in (0, 200_000):
        with pytest.raises(RuntimeError):
            _multi_bfs(
                e, s, directed=True, max_iter=3, op_name="t",
                collect_threshold=thr,
            ).collect()
        ok = _multi_bfs(
            e, s, directed=True, max_iter=4, op_name="t",
            collect_threshold=thr,
        )
        assert len(_rows(ok)) == 4


def test_multi_bfs_empty_sources(spark):
    from graphrag_rs_spark.operators.traversal import _multi_bfs

    e = _graph(spark)
    s = _srcs(spark, [])
    assert _rows(_multi_bfs(e, s, directed=False, max_iter=4, op_name="t")) == []


def test_bfs_small_path_equals_distributed(spark):
    # bfs's driver small path must be row-identical to the distributed
    # rounds: same first-visit depths, min-path parent dedupe and
    # (depth, path) truncation
    from graphrag_rs_spark.operators.traversal import bfs

    e = spark.createDataFrame(
        [
            ("a", "b", 1.0), ("b", "c", 0.9), ("a", "c", 0.6),
            ("c", "d", 0.8), ("d", "e", 0.4),  # below min_strength
            ("x", "y", 1.0),
        ],
        "src string, dst string, weight double",
    )
    s = _srcs(spark, ["a", "x"])
    for kwargs in (
        {"max_depth": 3, "min_strength": 0.5},
        {"max_depth": 2, "min_strength": 0.5, "max_paths_per_source": 3},
    ):
        small = _rows(bfs(e, s, **kwargs))
        dist = _rows(bfs(e, s, collect_threshold=0, **kwargs))
        assert small == dist and small


def test_bfs_null_endpoint_routes_to_distributed(spark):
    # a NULL endpoint must not crash the small path — it routes to the
    # distributed plan and both invocations agree row-for-row
    from graphrag_rs_spark.operators.traversal import bfs

    e = spark.createDataFrame(
        [("a", "b", 1.0), ("a", None, 1.0), ("b", "c", 0.9)],
        "src string, dst string, weight double",
    )
    s = spark.createDataFrame([("a",)], "id string")
    loc = sorted(map(tuple, bfs(e, s).collect()), key=str)
    dist = sorted(map(tuple, bfs(e, s, collect_threshold=0).collect()), key=str)
    assert loc == dist and len(loc) == 4
