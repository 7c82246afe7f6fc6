from __future__ import annotations

import math

import pytest

from graphrag_rs_spark.operators.linkpred import link_prediction_scores


def _scores(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        (r["id_a"], r["id_b"]): (
            r["common_neighbors"], r["jaccard"], r["adamic_adar"]
        )
        for r in link_prediction_scores(df, **kw).collect()
    }


def test_path_graph_hand_computed(spark):
    # a-b-c: only non-adjacent pair (a,c), shared neighbor b with deg 2
    got = _scores(spark, [("a", "b"), ("b", "c")])
    assert set(got) == {("a", "c")}
    cn, jac, aa = got[("a", "c")]
    assert cn == 1
    assert jac == 1.0
    assert aa == pytest.approx(round(1 / math.log(2), 4))


def test_square_graph(spark):
    # 4-cycle: diagonals share two deg-2 neighbors each
    got = _scores(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    assert set(got) == {("a", "c"), ("b", "d")}
    for pair in got:
        cn, jac, aa = got[pair]
        assert cn == 2
        assert jac == 1.0
        assert aa == pytest.approx(round(2 / math.log(2), 4))


def test_adjacent_pairs_excluded(spark):
    # triangle: every pair is adjacent — nothing predicted
    assert _scores(spark, [("a", "b"), ("b", "c"), ("c", "a")]) == {}


def test_min_common_threshold(spark):
    got = _scores(
        spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")], min_common=2
    )
    assert set(got) == {("a", "c"), ("b", "d")}
    assert _scores(spark, [("a", "b"), ("b", "c")], min_common=2) == {}


def test_hub_exclusion(spark):
    # star: hub h connects a..d; all leaf pairs share only the hub
    star = [("h", x) for x in "abcd"]
    full = _scores(spark, star)
    assert len(full) == 6  # C(4,2)
    assert full[("a", "b")][0] == 1
    # excluding hubs of degree > 3 removes every wedge
    assert _scores(spark, star, max_hub_degree=3) == {}


def test_jaccard_uses_union_of_neighborhoods(spark):
    # a-{b,c}, d-{b}: pair (a,d) shares b; deg(a)=2, deg(d)=1 → 1/(2+1-1)
    got = _scores(spark, [("a", "b"), ("a", "c"), ("d", "b")])
    assert got[("a", "d")][1] == 0.5


def test_negative_samples_are_nonedges(spark):
    """Every emitted sample is a real vertex, not a self-loop, and not an
    existing edge in either orientation; at most k per source; output is
    deterministic across invocations."""
    from graphrag_rs_spark.operators.linkpred import negative_samples

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "e")],
        ["src", "dst"],
    )
    out = negative_samples(edges, k=3, num_buckets=4).collect()
    pos = {("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "e")}
    pos |= {(b, a) for a, b in pos}
    verts = {"a", "b", "c", "d", "e"}
    assert out, "no samples emitted"
    per_src = {}
    for r in out:
        assert r["neg_dst"] in verts
        assert r["neg_dst"] != r["src"]
        assert (r["src"], r["neg_dst"]) not in pos
        per_src[r["src"]] = per_src.get(r["src"], 0) + 1
    assert all(v <= 3 for v in per_src.values())
    again = negative_samples(edges, k=3, num_buckets=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_sample_neighbors_deterministic_fanout(spark):
    from graphrag_rs_spark.operators.linkpred import sample_neighbors

    edges = spark.createDataFrame(
        [("hub", f"n{i}") for i in range(50)] + [("leaf", "n0")],
        ["src", "dst"],
    )
    out = sample_neighbors(edges, fan_out=5).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], []).append((r["draw_rank"], r["dst"]))
    assert len(by_src["hub"]) == 5          # hub capped at fan_out
    assert len(by_src["leaf"]) == 1         # low-degree kept entirely
    # repartitioning must not change the sample (hash draws, no RNG)
    again = sample_neighbors(edges.repartition(7), fan_out=5).collect()
    assert {(r["src"], r["dst"]) for r in again} == {
        (r["src"], r["dst"]) for r in out
    }
    # a different seed draws a different sample
    other = sample_neighbors(edges, fan_out=5, seed="x2").collect()
    assert {(r["src"], r["dst"]) for r in other} != {
        (r["src"], r["dst"]) for r in out
    }


def test_to_coo_graph_contiguous_and_deterministic(spark):
    from graphrag_rs_spark.operators.linkpred import to_coo_graph

    edges = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("c", "a"), ("c", "d")], ["src", "dst"]
    )
    rows = to_coo_graph(edges).collect()
    idx = {}
    for r in rows:
        idx[r["src"]] = r["src_idx"]
        idx[r["dst"]] = r["dst_idx"]
    # dense 0-based, ordered by node id
    assert idx == {"a": 0, "b": 1, "c": 2, "d": 3}
    assert len(rows) == 4
    # partitioning must not change the mapping
    again = to_coo_graph(edges.repartition(5)).collect()
    assert {(r["src_idx"], r["dst_idx"]) for r in again} == {
        (r["src_idx"], r["dst_idx"]) for r in rows
    }
