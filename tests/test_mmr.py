"""MMR rerank (operators/mmr.py) — hand-computed picks + invariants."""

import pytest

from graphrag_rs_spark.operators.mmr import mmr_rerank


def _cand(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, rel long, vec array<long>"
    )


def test_first_pick_is_pure_relevance_argmax(spark):
    cand = _cand(
        spark,
        [
            (1, 10, 100, [10, 0]),
            (1, 11, 90, [9, 0]),
            (1, 12, 10, [1, 8]),
        ],
    )
    out = {
        (r["rank"]): (r["doc_id"], r["objective"])
        for r in mmr_rerank(cand, k=3, lambda_num=7, lambda_den=10).collect()
    }
    assert out[1] == (10, 700)  # argmax rel, objective = 7·rel


def test_diversity_beats_near_duplicate_at_low_lambda(spark):
    # doc 11 is a near-copy of the first pick; doc 12 is orthogonal-ish.
    # λ = 0.3 → redundancy dominates: pick 2 must be the diverse doc.
    cand = _cand(
        spark,
        [
            (1, 10, 100, [10, 0]),
            (1, 11, 100, [10, 0]),
            (1, 12, 10, [1, 8]),
        ],
    )
    rows = sorted(
        mmr_rerank(cand, k=2, lambda_num=3, lambda_den=10).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["doc_id"] for r in rows] == [10, 12]
    # doc 12: 3·10 − 7·dot([1,8],[10,0]) = 30 − 70 = −40
    assert rows[1]["objective"] == -40


def test_negative_similarity_is_not_clamped(spark):
    # anti-correlated doc: its redundancy term is NEGATIVE, which must
    # RAISE its objective (true max over selected, no floor at zero).
    cand = _cand(
        spark,
        [
            (1, 10, 100, [10, 0]),
            (1, 11, 0, [-10, 0]),
        ],
    )
    rows = sorted(
        mmr_rerank(cand, k=2, lambda_num=7, lambda_den=10).collect(),
        key=lambda r: r["rank"],
    )
    # doc 11: 7·0 − 3·(−100) = 300
    assert rows[1]["doc_id"] == 11 and rows[1]["objective"] == 300


def test_groups_independent_and_k_capped(spark):
    cand = _cand(
        spark,
        [
            (1, 10, 5, [1, 0]),
            (1, 11, 4, [0, 1]),
            (2, 20, 9, [1, 1]),
        ],
    )
    rows = mmr_rerank(cand, k=8).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["doc_id"])
    assert sorted(by_q[1]) == [10, 11]  # capped at group size
    assert by_q[2] == [20]
    assert len({(r["query_id"], r["doc_id"]) for r in rows}) == len(rows)


def test_tie_breaks_toward_smaller_doc_id(spark):
    cand = _cand(
        spark,
        [
            (1, 30, 50, [1, 0]),
            (1, 20, 50, [0, 1]),
        ],
    )
    rows = sorted(
        mmr_rerank(cand, k=1).collect(), key=lambda r: r["rank"]
    )
    assert rows[0]["doc_id"] == 20


def test_bad_lambda_raises(spark):
    cand = _cand(spark, [(1, 10, 1, [1])])
    with pytest.raises(ValueError):
        mmr_rerank(cand, lambda_num=0, lambda_den=10)
