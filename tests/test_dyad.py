"""Dyad census (operators/dyad.py)."""

from graphrag_rs_spark.operators.dyad import dyad_census


def _run(spark, rows):
    e = spark.createDataFrame(rows, "src string, dst string")
    return dyad_census(e).collect()[0]


def test_hand_counts(spark):
    # a<->b mutual; a->c asym; d isolated via edge to e (asym)
    r = _run(
        spark,
        [("a", "b"), ("b", "a"), ("a", "c"), ("d", "e")],
    )
    assert (r.mutual, r.asym) == (1, 2)
    # 5 nodes -> 10 dyads; 10 - 1 - 2 = 7 null
    assert r.null_dyads == 7
    # reciprocity = 2*1 / (2*1 + 2) = 0.5
    assert r.reciprocity_micro == 500_000


def test_fully_reciprocal(spark):
    r = _run(spark, [("a", "b"), ("b", "a")])
    assert (r.mutual, r.asym, r.null_dyads) == (1, 0, 0)
    assert r.reciprocity_micro == 1_000_000


def test_no_edges_after_self_loop_filter(spark):
    r = _run(spark, [("a", "a")])
    assert (r.mutual, r.asym, r.null_dyads, r.reciprocity_micro) == (
        0,
        0,
        0,
        0,
    )


def test_duplicate_edges_count_once(spark):
    r = _run(spark, [("a", "b"), ("a", "b"), ("a", "b")])
    assert (r.mutual, r.asym) == (0, 1)
    assert r.reciprocity_micro == 0
