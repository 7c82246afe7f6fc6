"""bridges / articulation_points (operators/biconnectivity.py)."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.operators.biconnectivity import (
    articulation_points,
    bridges,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _brute(pairs):
    """Definition-level reference: edge/vertex removal component check."""
    import itertools

    simple = {
        (min(a, b), max(a, b)) for a, b in pairs if a != b
    }
    nodes = {x for e in simple for x in e}

    def n_comp(edge_set, vert_set):
        seen, n = set(), 0
        adj = {}
        for a, b in edge_set:
            if a in vert_set and b in vert_set:
                adj.setdefault(a, []).append(b)
                adj.setdefault(b, []).append(a)
        for s in vert_set:
            if s in seen:
                continue
            n += 1
            stack = [s]
            seen.add(s)
            while stack:
                u = stack.pop()
                for w in adj.get(u, ()):
                    if w not in seen:
                        seen.add(w)
                        stack.append(w)
        return n

    base = n_comp(simple, nodes)
    br = {
        e for e in simple if n_comp(simple - {e}, nodes) > base
    }
    aps = {
        x
        for x in nodes
        if n_comp(simple, nodes - {x}) > n_comp(simple, nodes)
    }
    return br, aps


FIXTURES = [
    # chain: every edge a bridge, interior nodes APs
    [("a", "b"), ("b", "c"), ("c", "d")],
    # cycle: nothing
    [("a", "b"), ("b", "c"), ("c", "a")],
    # barbell: two triangles + connecting bridge
    [("a", "b"), ("b", "c"), ("c", "a"),
     ("x", "y"), ("y", "z"), ("z", "x"), ("c", "x")],
    # two components, one with a pendant
    [("a", "b"), ("b", "c"), ("c", "a"), ("c", "p"), ("q", "r")],
    # dupes / reversed dupes / self-loop
    [("a", "b"), ("b", "a"), ("a", "a"), ("b", "c")],
    # star: center is the AP, every edge a bridge
    [("h", "s1"), ("h", "s2"), ("h", "s3"), ("h", "s4")],
]


@pytest.mark.parametrize("pairs", FIXTURES)
def test_matches_definition_brute_force(spark, pairs):
    e = _edges(spark, pairs)
    got_br = {(r["src"], r["dst"]) for r in bridges(e).collect()}
    got_ap = {r["id"] for r in articulation_points(e).collect()}
    want_br, want_ap = _brute(pairs)
    assert got_br == want_br
    assert got_ap == want_ap


def test_refusal_above_threshold(spark):
    e = _edges(spark, [("a", "b"), ("b", "c")])
    with pytest.raises(ValueError, match="collect_threshold"):
        bridges(e, collect_threshold=1)
    with pytest.raises(ValueError, match="sparsify"):
        articulation_points(e, collect_threshold=1)


def test_empty_graph(spark):
    e = _edges(spark, [("a", "a")])  # only a self-loop
    assert bridges(e).collect() == []
    assert articulation_points(e).collect() == []
