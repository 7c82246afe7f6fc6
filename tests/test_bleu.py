from __future__ import annotations

from graphrag_rs_spark.operators.bleu import UNIT, clipped_ngram_precision


def test_clip_limits_repeats(spark):
    # candidate repeats "the cat" 3x; reference has it once -> clipped
    pairs = spark.createDataFrame(
        [(1, "the cat the cat the cat", "the cat sat")],
        "pair_id long, candidate string, reference string",
    )
    r = clipped_ngram_precision(pairs, n=2).collect()[0]
    # candidate 2-grams: [the cat, cat the, the cat, cat the, the cat]
    # -> counts {the cat: 3, cat the: 2}; ref has {the cat:1, cat sat:1}
    assert (r["matched"], r["total"]) == (1, 5)
    assert r["precision_micro"] == UNIT // 5
    assert (r["cand_len"], r["ref_len"]) == (6, 3)


def test_perfect_and_zero(spark):
    pairs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "alpha beta gamma"),
            (2, "x y z", "completely different words"),
            (3, "single", "single"),  # no 2-grams at all
        ],
        "pair_id long, candidate string, reference string",
    )
    rows = {r["pair_id"]: r for r in clipped_ngram_precision(pairs, n=2).collect()}
    assert rows[1]["precision_micro"] == UNIT
    assert rows[2]["precision_micro"] == 0
    assert rows[3]["total"] == 0 and rows[3]["precision_micro"] == 0
    assert len(rows) == 3  # gram-free pairs still emit a row
