"""maximal_matching — handshake invariants + hand replay."""

from __future__ import annotations

import hashlib


def _ek(a: str, b: str, seed: str = "match-v1") -> int:
    return int(
        hashlib.sha256(f"{seed}\x1f{a}\x1f{b}".encode()).hexdigest()[:15], 16
    )


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_matching_is_a_matching_and_maximal(spark):
    from graphrag_rs_spark.operators.analytics import maximal_matching

    pairs = [(f"n{i}", f"n{(i * 7 + 3) % 30}") for i in range(60)]
    out = maximal_matching(_edges(spark, pairs)).collect()
    used = [x for r in out for x in (r["a"], r["b"])]
    # a matching: no node appears twice
    assert len(used) == len(set(used))
    # maximal: every remaining edge has a matched endpoint
    matched = set(used)
    sym = {(min(s, d), max(s, d)) for s, d in pairs if s != d}
    for a, b in sym:
        assert a in matched or b in matched, (a, b)
    # canonical orientation
    assert all(r["a"] < r["b"] for r in out)


def test_matching_round1_is_mutual_best_by_hand(spark):
    from graphrag_rs_spark.operators.analytics import maximal_matching

    # triangle a-b-c plus pendant c-d: the globally minimal edge key
    # wins round 1; replay with hashlib
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    out = {(r["a"], r["b"]): r["round"]
           for r in maximal_matching(_edges(spark, pairs)).collect()}
    keys = {(min(s, d), max(s, d)): _ek(min(s, d), max(s, d))
            for s, d in pairs}
    global_min = min(keys, key=keys.get)
    assert out[global_min] == 1


def test_matching_deterministic_and_single_edge(spark):
    from graphrag_rs_spark.operators.analytics import maximal_matching

    e = _edges(spark, [("x", "y")])
    o1 = sorted(map(tuple, maximal_matching(e).collect()))
    o2 = sorted(map(tuple, maximal_matching(e).collect()))
    assert o1 == o2 == [("x", "y", 1)]


def test_matching_small_path_equals_distributed(spark):
    from graphrag_rs_spark.operators.analytics import maximal_matching

    # expander-ish graph with odd cycles and a pendant chain: several
    # handshake rounds, retirements, and a final unmatched remainder
    pairs = [(f"v{i}", f"v{(i * 5 + 2) % 23}") for i in range(23)]
    pairs += [("v0", "p1"), ("p1", "p2"), ("p2", "p3")]
    e = _edges(spark, [p for p in pairs if p[0] != p[1]])
    small = {(r["a"], r["b"], r["round"])
             for r in maximal_matching(e).collect()}
    dist = {(r["a"], r["b"], r["round"])
            for r in maximal_matching(e, collect_threshold=0).collect()}
    assert small == dist
    assert small  # fixture must actually match something
