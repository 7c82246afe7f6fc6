"""eccentricity (traversal.py) and halstead_metrics (code_quality.py)
— hand-computed fixtures."""

from __future__ import annotations

import math

import pytest

from graphrag_rs_spark.operators.code_quality import halstead_metrics
from graphrag_rs_spark.operators.traversal import eccentricity


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id string")


def test_path_graph_eccentricities(spark):
    # path a-b-c-d: ecc(a)=3, ecc(b)=2, ecc(c)=2, ecc(d)=3
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    out = {
        r["source"]: (r["eccentricity"], r["n_reached"])
        for r in eccentricity(e, _nodes(spark, "abcd")).collect()
    }
    assert out == {"a": (3, 4), "b": (2, 4), "c": (2, 4), "d": (3, 4)}


def test_disconnected_counts_only_reachable(spark):
    e = _edges(spark, [("a", "b"), ("x", "y")])
    out = {
        r["source"]: (r["eccentricity"], r["n_reached"])
        for r in eccentricity(e, _nodes(spark, ["a", "x"])).collect()
    }
    assert out == {"a": (1, 2), "x": (1, 2)}


def test_directed_respects_orientation(spark):
    e = _edges(spark, [("a", "b"), ("b", "c")])
    out = {
        r["source"]: (r["eccentricity"], r["n_reached"])
        for r in eccentricity(e, _nodes(spark, "abc"), directed=True).collect()
    }
    # c has no out-edges: eccentricity 0, reaches only itself
    assert out == {"a": (2, 3), "b": (1, 2), "c": (0, 1)}


def test_max_iter_exhaustion_raises(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    with pytest.raises(RuntimeError):
        eccentricity(e, _nodes(spark, ["a"]), max_iter=2)


def test_halstead_known_snippet(spark):
    files = spark.createDataFrame(
        [("r", "p", "x = x + 1")], "repo string, path string, content string"
    )
    r = halstead_metrics(files).first()
    # operators: '=' and '+' (2 distinct, 2 total); operands: x, x, 1
    assert (r["n1"], r["n2"], r["big_n1"], r["big_n2"]) == (2, 2, 2, 3)
    assert r["vocabulary"] == 4 and r["length"] == 5
    assert r["volume"] == round(5 * math.log2(4), 3)
    assert r["difficulty"] == round(2 / 2 * 3 / 2, 3)


def test_halstead_empty_content(spark):
    files = spark.createDataFrame(
        [("r", "p", "")], "repo string, path string, content string"
    )
    r = halstead_metrics(files).first()
    assert (r["volume"], r["difficulty"]) == (0.0, 0.0)


def test_harmonic_centrality_path_graph(spark):
    from graphrag_rs_spark.operators.traversal import harmonic_centrality

    # path a-b-c-d from a: d=1 (b), 2 (c), 3 (d)
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    out = {r["source"]: (r["h_ppm"], r["n_reached"])
           for r in harmonic_centrality(e, _nodes(spark, ["a", "b"])).collect()}
    assert out["a"] == (1000000 + 500000 + 333333, 3)
    assert out["b"] == (1000000 * 2 + 500000, 3)
