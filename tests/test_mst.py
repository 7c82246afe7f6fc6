"""Borůvka minimum spanning forest (operators/mst.py)."""

import itertools

import pytest

from graphrag_rs_spark.operators.mst import boruvka_msf


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, weight long")


def test_hand_computed_mst(spark):
    # square with a diagonal: a-b 1, b-c 2, c-d 3, a-d 4, a-c 10
    out = {
        (r.src, r.dst, r.weight)
        for r in boruvka_msf(
            _edges(
                spark,
                [
                    ("a", "b", 1),
                    ("b", "c", 2),
                    ("c", "d", 3),
                    ("a", "d", 4),
                    ("a", "c", 10),
                ],
            )
        ).collect()
    }
    assert out == {("a", "b", 1), ("b", "c", 2), ("c", "d", 3)}


def test_forest_on_disconnected_graph(spark):
    out = {
        (r.src, r.dst, r.weight)
        for r in boruvka_msf(
            _edges(
                spark,
                [
                    ("a", "b", 5),
                    ("b", "c", 1),
                    ("a", "c", 2),
                    ("x", "y", 7),
                ],
            )
        ).collect()
    }
    assert out == {("b", "c", 1), ("a", "c", 2), ("x", "y", 7)}


def test_matches_bruteforce_on_k5(spark):
    # distinct weights -> unique MST; enumerate all spanning trees
    nodes = ["n0", "n1", "n2", "n3", "n4"]
    rows = []
    w = {}
    k = 0
    for i, j in itertools.combinations(range(5), 2):
        k += 1
        weight = (k * 37) % 101  # distinct
        rows.append((nodes[i], nodes[j], weight))
        w[(nodes[i], nodes[j])] = weight
    best, best_w = None, None
    for combo in itertools.combinations(rows, 4):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ok = True
        for s, d, _ in combo:
            rs, rd = find(s), find(d)
            if rs == rd:
                ok = False
                break
            parent[rs] = rd
        if ok:
            tw = sum(x[2] for x in combo)
            if best_w is None or tw < best_w:
                best, best_w = set(combo), tw
    got = {
        (r.src, r.dst, r.weight)
        for r in boruvka_msf(_edges(spark, rows)).collect()
    }
    assert got == best


def test_single_edge_and_self_loop(spark):
    out = boruvka_msf(
        _edges(spark, [("a", "b", 3), ("a", "a", 1)])
    ).collect()
    assert [(r.src, r.dst, r.weight) for r in out] == [("a", "b", 3)]


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError):
        boruvka_msf(
            _edges(spark, [("a", "b", 1), ("b", "c", 2), ("c", "d", 3)]),
            max_rounds=1,
        )


def test_boruvka_small_path_equals_distributed(spark):
    """The driver small path must replay the Borůvka rounds
    bit-identically (same picks, ties and contraction labels)."""
    from graphrag_rs_spark.operators.mst import boruvka_msf

    rows = [("a", "b", 4), ("b", "c", 1), ("a", "c", 4), ("c", "d", 7),
            ("d", "e", 2), ("b", "e", 9), ("x", "y", 3), ("y", "z", 3),
            ("x", "z", 3)]
    e = spark.createDataFrame(rows, "src string, dst string, weight long")
    small = sorted(map(tuple, boruvka_msf(e).collect()))
    dist = sorted(map(tuple, boruvka_msf(e, collect_threshold=0).collect()))
    assert small == dist and small
