"""duplicated_spans (operators/dedup.py) — ExactSubstr invariants."""

from __future__ import annotations

from graphrag_rs_spark.operators.dedup import duplicated_spans


def _run(spark, rows, length=3):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r["id"], r["span_start"], r["span_end"]): r["span_tokens"]
        for r in duplicated_spans(df, length=length).collect()
    }


def test_cross_doc_duplicate_marked_in_both(spark):
    out = _run(
        spark,
        [
            (1, "a b c d e unique1 tail1"),
            (2, "head2 a b c d e other2"),
            (3, "nothing shared here at all"),
        ],
    )
    # the shared 5-token run "a b c d e" = 3 overlapping 3-grams each
    assert out == {(1, 0, 5): 5, (2, 1, 6): 5}


def test_within_doc_repeat_counts(spark):
    out = _run(spark, [(1, "x y z filler1 filler2 filler3 x y z")])
    assert out == {(1, 0, 3): 3, (1, 6, 9): 3}


def test_adjacent_grams_merge_to_one_span(spark):
    # duplicated grams at positions 0 and 3 (gap == length) merge: the
    # union [0,3)∪[3,6) is one contiguous duplicated region
    out = _run(
        spark,
        [
            (1, "a b c d e f tailone"),
            (2, "a b c padpad2a padpad2b padpad2c"),
            (3, "d e f padpad3a padpad3b padpad3c"),
        ],
    )
    assert out[(1, 0, 6)] == 6


def test_short_docs_and_no_dups_empty(spark):
    out = _run(spark, [(1, "a b"), (2, "p q r s t"), (3, "u v w x y")])
    assert out == {}
