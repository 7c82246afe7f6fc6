from __future__ import annotations

from graphrag_rs_spark.operators.rake import UNIT, rake_keyphrases


def test_rake_hand_computed(spark):
    # phrases: "deep learning" | "deep networks" | "learning" —
    # freq/deg: deep 2/4, learning 2/3, networks 1/2
    # ws: deep 2_000_000, learning 1_500_000, networks 2_000_000
    # scores: "deep learning" 3_500_000, "deep networks" 4_000_000,
    #         "learning" 1_500_000
    docs = spark.createDataFrame(
        [(1, "Deep learning, and deep networks of learning.")],
        "doc_id long, text string",
    )
    rows = {
        r["phrase"]: (r["score"], r["rk"])
        for r in rake_keyphrases(docs).collect()
    }
    assert rows == {
        "deep networks": (4 * UNIT, 1),
        "deep learning": (3 * UNIT + UNIT // 2, 2),
        "learning": (UNIT + UNIT // 2, 3),
    }


def test_rake_collocations_beat_singles(spark):
    # a repeated multi-word collocation outranks its member words
    docs = spark.createDataFrame(
        [(1, "red black tree insert; red black tree delete; tree")],
        "doc_id long, text string",
    )
    top = rake_keyphrases(docs, top_k=1).collect()[0]
    assert top["phrase"].startswith("red black tree")


def test_rake_topk_and_duplicate_phrases(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta. alpha beta. gamma. delta. epsilon. zeta.")],
        "doc_id long, text string",
    )
    out = rake_keyphrases(docs, top_k=3).collect()
    assert len(out) == 3  # duplicates collapse, k caps the rest
    assert out[0]["rk"] == 1
    phrases = {r["phrase"] for r in out}
    assert "alpha beta" in phrases
