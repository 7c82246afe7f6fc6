from __future__ import annotations

import pytest

from graphrag_rs_spark.operators.scc import (
    build_layers,
    condensation,
    scc_sequential,
    strongly_connected_components,
    topological_layers,
)

# a graph with every interesting shape: a 3-cycle {a,b,c}, a 2-cycle
# {d,e}, a bridge a→d, tails into and out of the cycles, an isolated
# chain (all singleton SCCs), and a self-loop (must not merge anything)
EDGES = [
    ("a", "b"), ("b", "c"), ("c", "a"),          # 3-cycle
    ("d", "e"), ("e", "d"),                      # 2-cycle
    ("a", "d"),                                  # bridge cycle→cycle
    ("t1", "a"),                                 # tail in
    ("e", "t2"), ("t2", "t3"),                   # tail out
    ("x", "y"), ("y", "z"),                      # acyclic chain
    ("z", "z"),                                  # self-loop
]
EXPECTED = {
    "a": "a", "b": "a", "c": "a",
    "d": "d", "e": "d",
    "t1": "t1", "t2": "t2", "t3": "t3",
    "x": "x", "y": "y", "z": "z",
}


def test_scc_sequential_kernel():
    nodes = sorted(EXPECTED)
    assert scc_sequential(EDGES, nodes) == EXPECTED


def _edges_df(spark):
    return spark.createDataFrame(EDGES, ["src", "dst"])


def test_scc_small_path(spark):
    got = {
        r["id"]: r["scc_id"]
        for r in strongly_connected_components(_edges_df(spark)).collect()
    }
    assert got == EXPECTED


def test_scc_distributed_parity(spark):
    got = {
        r["id"]: r["scc_id"]
        for r in strongly_connected_components(
            _edges_df(spark), collect_threshold=0
        ).collect()
    }
    assert got == EXPECTED


def test_scc_distributed_pure_cycle_no_trim(spark):
    # nothing trims (every node has in+out): exercises COLOR + BW peel
    ring = [(f"n{i}", f"n{(i + 1) % 6}") for i in range(6)]
    got = {
        r["id"]: r["scc_id"]
        for r in strongly_connected_components(
            spark.createDataFrame(ring, ["src", "dst"]), collect_threshold=0
        ).collect()
    }
    assert got == {f"n{i}": "n0" for i in range(6)}


def test_scc_two_same_colored_sccs_peel_in_rounds(spark):
    # a→d gives d's 2-cycle the color of a's 3-cycle ancestor set; round 1
    # peels {a,b,c} (root a), round 2 re-colors and peels {d,e} — the case
    # where one color class holds two SCCs and only the root's is swept
    edges = [("a", "b"), ("b", "a"), ("a", "d"), ("d", "e"), ("e", "d")]
    got = {
        r["id"]: r["scc_id"]
        for r in strongly_connected_components(
            spark.createDataFrame(edges, ["src", "dst"]), collect_threshold=0
        ).collect()
    }
    assert got == {"a": "a", "b": "a", "d": "d", "e": "d"}


def test_scc_isolated_vertices(spark):
    verts = spark.createDataFrame([("a",), ("b",), ("lone",)], ["id"])
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    got = {
        r["id"]: r["scc_id"]
        for r in strongly_connected_components(edges, verts).collect()
    }
    assert got == {"a": "a", "b": "a", "lone": "lone"}


def test_condensation_dag(spark):
    scc = strongly_connected_components(_edges_df(spark))
    cond = {
        (r["scc_src"], r["scc_dst"])
        for r in condensation(_edges_df(spark), scc).collect()
    }
    assert cond == {
        ("t1", "a"), ("a", "d"), ("d", "t2"), ("t2", "t3"),
        ("x", "y"), ("y", "z"),
    }


def test_topological_layers_longest_path(spark):
    # diamond with a long side: layer = longest path from a source
    edges = spark.createDataFrame(
        [("s", "l1"), ("l1", "l2"), ("l2", "t"), ("s", "t")], ["src", "dst"]
    )
    got = {r["id"]: r["layer"] for r in topological_layers(edges).collect()}
    assert got == {"s": 0, "l1": 1, "l2": 2, "t": 3}


def test_topological_layers_distributed_parity(spark):
    edges = spark.createDataFrame(
        [("s", "l1"), ("l1", "l2"), ("l2", "t"), ("s", "t")], ["src", "dst"]
    )
    dist = {
        r["id"]: r["layer"]
        for r in topological_layers(edges, collect_threshold=0).collect()
    }
    assert dist == {"s": 0, "l1": 1, "l2": 2, "t": 3}


def test_topological_layers_raises_on_cycle_both_paths(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    with pytest.raises(RuntimeError, match="cycle"):
        topological_layers(edges, max_iterations=5, collect_threshold=0)


def test_topological_layers_raises_on_cycle(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    with pytest.raises(RuntimeError, match="cycle"):
        topological_layers(edges, max_iterations=5)


def test_build_layers_composite(spark):
    rows = {
        (r["id"], r["scc_id"], r["layer"])
        for r in build_layers(_edges_df(spark)).collect()
    }
    # waves: t1 and x/chain sources at 0; 3-cycle at 1; 2-cycle at 2; ...
    assert rows == {
        ("t1", "t1", 0), ("x", "x", 0),
        ("a", "a", 1), ("b", "a", 1), ("c", "a", 1), ("y", "y", 1),
        ("d", "d", 2), ("e", "d", 2), ("z", "z", 2),
        ("t2", "t2", 3),
        ("t3", "t3", 4),
    }


def test_build_layers_distributed_parity(spark):
    small = {
        (r["id"], r["scc_id"], r["layer"])
        for r in build_layers(_edges_df(spark)).collect()
    }
    dist = {
        (r["id"], r["scc_id"], r["layer"])
        for r in build_layers(_edges_df(spark), collect_threshold=0).collect()
    }
    assert small == dist
