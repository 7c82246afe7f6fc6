from __future__ import annotations

from graphrag_rs_spark.operators.eigenvector import UNIT, eigenvector_centrality


def test_star_center_dominates(spark):
    e = spark.createDataFrame(
        [("c", f"l{i}") for i in range(5)], "src string, dst string"
    )
    rows = {r["id"]: r["score"] for r in eigenvector_centrality(e).collect()}
    assert rows["c"] == UNIT
    leaf = {rows[f"l{i}"] for i in range(5)}
    assert len(leaf) == 1 and 0 < leaf.pop() < UNIT


def test_path_symmetry_and_shift_convergence(spark):
    # P3 is bipartite: unshifted power iteration oscillates, the A+I
    # shift must converge with the centre on top and ends equal
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    rows = {r["id"]: r["score"] for r in eigenvector_centrality(e, iterations=12).collect()}
    assert rows["b"] == UNIT
    assert rows["a"] == rows["c"] < UNIT
    # Perron ratio for P3 is 1/sqrt(2) ~ 0.7071; micro-quantized
    assert abs(rows["a"] - 707106) < 2000


def test_regular_graph_uniform(spark):
    # triangle: every node equivalent -> all exactly UNIT
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    scores = {r["score"] for r in eigenvector_centrality(e, iterations=3).collect()}
    assert scores == {UNIT}
