"""contamination_scores: benchmark decontamination against an eval set."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphrag_rs_spark.operators.mixture import contamination_scores


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_basic_overlap(spark):
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words here nothing shared at all"),
            (3, "quick brown fox again quick brown fox again"),
        ],
    )
    ev = _docs(spark, [(100, "a quick brown fox appeared")])
    out = {
        r["doc_id"]: (r["n_contaminated"], r["contaminated"])
        for r in contamination_scores(train, ev, n=3, min_hits=1).collect()
    }
    # eval 3-grams: {a quick brown, quick brown fox, brown fox appeared}
    assert out[1] == (1, True)   # "quick brown fox"
    assert out[2] == (0, False)
    assert out[3] == (1, True)   # duplicated gram counts once (distinct)


def test_min_hits_threshold(spark):
    train = _docs(spark, [(1, "alpha beta gamma delta epsilon")])
    ev = _docs(spark, [(9, "alpha beta gamma delta zeta")])
    # shared 3-grams: "alpha beta gamma", "beta gamma delta" → 2 hits
    one = contamination_scores(train, ev, n=3, min_hits=2).collect()[0]
    assert one["n_contaminated"] == 2 and bool(one["contaminated"])
    strict = contamination_scores(train, ev, n=3, min_hits=3).collect()[0]
    assert not bool(strict["contaminated"])


def test_short_and_empty_docs_survive(spark):
    train = _docs(spark, [(1, "too short"), (2, ""), (3, None)])
    ev = _docs(spark, [(9, "some eval text goes here")])
    out = {r["doc_id"]: r for r in contamination_scores(train, ev, n=3).collect()}
    assert set(out) == {1, 2, 3}
    for r in out.values():
        assert r["n_grams"] == 0 and r["n_contaminated"] == 0
        assert not bool(r["contaminated"])


def test_portable_matches_fast_flags(spark):
    train = _docs(
        spark,
        [(i, f"common prefix words here tail_{i} more filler") for i in range(8)],
    )
    ev = _docs(spark, [(99, "common prefix words here and beyond")])
    fast = {
        r["doc_id"]: r["n_contaminated"]
        for r in contamination_scores(train, ev, n=3, hash_fn="fast").collect()
    }
    portable = {
        r["doc_id"]: r["n_contaminated"]
        for r in contamination_scores(train, ev, n=3, hash_fn="portable").collect()
    }
    assert fast == portable


def test_eval_grams_are_broadcast(spark):
    train = _docs(spark, [(1, "a b c d e f g")])
    ev = _docs(spark, [(9, "c d e f")])
    plan = (
        contamination_scores(train, ev, n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
