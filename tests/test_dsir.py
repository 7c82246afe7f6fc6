"""DSIR importance weighting (operators/dsir.py) and the WIMBD corpus
n-gram analytics (operators/mixture.py) — semantic invariants; the
board rows pin the exact arithmetic vs DuckDB."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphrag_rs_spark.operators.dsir import dsir_log_weights
from graphrag_rs_spark.operators.mixture import (
    corpus_top_ngrams,
    ngram_duplication,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string, lang string")


def test_dsir_separates_target_like_docs(spark):
    # target docs share a vocabulary; 'web' docs use a disjoint one; one
    # 'mixed' doc borrows target phrasing and should score between them
    target = [
        (f"t{i}", "the quick brown fox jumps over the lazy dog again", "en")
        for i in range(6)
    ]
    web = [
        (f"w{i}", "lorem ipsum dolor sit amet consectetur adipiscing elit", "xx")
        for i in range(6)
    ]
    mixed = [("m0", "lorem ipsum the quick brown fox dolor sit", "xx")]
    out = {
        r["doc_id"]: r
        for r in dsir_log_weights(
            _frame(spark, target + web + mixed), target=F.col("lang") == "en"
        ).collect()
    }
    assert set(out) == {d for d, _, _ in target + web + mixed}
    t_w = out["t0"]["logw_ppm"]
    w_w = out["w0"]["logw_ppm"]
    m_w = out["m0"]["logw_ppm"]
    assert t_w > m_w > w_w
    assert w_w < 0  # pure off-target vocabulary is strictly down-weighted


def test_dsir_featureless_docs_score_zero(spark):
    rows = [("a", "word", "en"), ("b", "", "xx"), ("c", None, "xx"),
            ("d", "alpha beta", "en")]
    out = {r["doc_id"]: r for r in dsir_log_weights(
        _frame(spark, rows), target=F.col("lang") == "en").collect()}
    for d in ("a", "b", "c"):  # <2 tokens -> no bigram features
        assert out[d]["n_feats"] == 0 and out[d]["logw_ppm"] == 0
    assert out["d"]["n_feats"] == 1


def test_dsir_deterministic(spark):
    rows = [(f"d{i}", f"alpha beta gamma delta w{i} beta alpha", "en" if i % 2 else "xx")
            for i in range(12)]
    f = _frame(spark, rows)
    a = sorted(map(tuple, dsir_log_weights(f, target=F.col("lang") == "en").collect()))
    b = sorted(map(tuple, dsir_log_weights(f, target=F.col("lang") == "en").collect()))
    assert a == b


def test_corpus_top_ngrams_counts_and_cut(spark):
    rows = [
        ("a", "x y z x y z", None),       # 'x y z' twice... (see below)
        ("b", "x y z q r s", None),
        ("c", "q r s q r s", None),
    ]
    out = corpus_top_ngrams(_frame(spark, rows), n=3, k=2).collect()
    got = {r["gram"]: (r["cnt"], r["doc_freq"]) for r in out}
    # doc a trigrams: xyz, yzx, zxy, xyz -> 'x y z' x2; doc b: xyz, yzq,
    # zqr, qrs; doc c: qrs, rsq, sqr, qrs -> 'q r s' x2
    assert got == {"x y z": (3, 2), "q r s": (3, 2)}


def test_ngram_duplication_exact(spark):
    rows = [("a", "p q r p q r", None)]  # trigrams: pqr,qrp,rpq,pqr
    r = ngram_duplication(_frame(spark, rows), n=3).collect()[0]
    assert (r["n"], r["total_occurrences"], r["distinct_grams"],
            r["dup_occurrences"], r["dup_rate_bp"]) == (3, 4, 3, 2, 5000)
