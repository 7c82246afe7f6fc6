"""Integer fixed-point SimRank (operators/simrank.py)."""

import pytest

from graphrag_rs_spark.operators.simrank import simrank


def _run(spark, rows, **kw):
    e = spark.createDataFrame(rows, "src string, dst string")
    return {
        (r.id_a, r.id_b): r.simrank_micro
        for r in simrank(e, **kw).collect()
    }


def test_siblings_of_one_parent_score_c(spark):
    # a and b share the single in-neighbour p:
    # s(a,b) = floor(0.8 * s(p,p)) = 800000, stable across iterations
    out = _run(spark, [("p", "a"), ("p", "b")], iterations=3)
    assert out == {("a", "b"): 800_000}


def test_two_shared_parents_with_cross_similarity(spark):
    # a, b each have in-neighbours {p, q}:
    # iter1: s = 0.8 * (s(p,p)+s(q,q)+s(p,q)+s(q,p)) / 4 = 0.8*2e6/4 = 400000
    rows = [("p", "a"), ("q", "a"), ("p", "b"), ("q", "b")]
    out1 = _run(spark, rows, iterations=1)
    assert out1[("a", "b")] == 400_000
    # p, q have no in-neighbours so s(p,q) stays 0; iter2 unchanged
    out2 = _run(spark, rows, iterations=2)
    assert out2[("a", "b")] == 400_000


def test_no_shared_ancestry_scores_zero(spark):
    out = _run(spark, [("p", "a"), ("q", "b")], iterations=3)
    assert out == {}  # zero pairs are dropped, not materialized


def test_output_is_upper_triangle_only(spark):
    out = _run(spark, [("p", "a"), ("p", "b"), ("p", "c")], iterations=2)
    for a, b in out:
        assert a < b
    assert len(out) == 3  # (a,b), (a,c), (b,c)


def test_bad_c_raises(spark):
    e_rows = [("p", "a")]
    with pytest.raises(ValueError):
        _run(spark, e_rows, c_num=10, c_den=10)
