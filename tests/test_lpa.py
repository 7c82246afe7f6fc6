"""Synchronous LPA vs a pure-Python replay (operators/lpa.py)."""

import pytest

from graphrag_rs_spark.operators.lpa import label_propagation

# two triangles joined by one bridge edge; labels are strings
EDGES = [
    ("a", "b"), ("b", "c"), ("a", "c"),
    ("x", "y"), ("y", "z"), ("x", "z"),
    ("c", "x"),
]


def _ref(n_rounds):
    sym = {}
    for s, d in EDGES:
        sym.setdefault(s, set()).add(d)
        sym.setdefault(d, set()).add(s)
    labels = {v: v for v in sym}
    for _ in range(n_rounds):
        new = {}
        for v, nbrs in sym.items():
            counts = {}
            for u in nbrs:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            new[v] = min(counts, key=lambda l: (-counts[l], l))
        labels = new
    return labels


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(EDGES, ["src", "dst"])


@pytest.mark.parametrize("rounds", [1, 2, 4])
def test_matches_python_replay(spark, edges, rounds):
    got = {
        r["id"]: r["label"]
        for r in label_propagation(edges, n_rounds=rounds).collect()
    }
    assert got == _ref(rounds)


def test_two_communities_emerge(spark, edges):
    got = {
        r["id"]: r["label"]
        for r in label_propagation(edges, n_rounds=4).collect()
    }
    assert got["a"] == got["b"] == got["c"]
    assert got["x"] == got["y"] == got["z"]
    assert got["a"] != got["x"]
