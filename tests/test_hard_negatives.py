"""hard_negatives (operators/bm25.py) — DPR-style mining invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphrag_rs_spark.operators.bm25 import bm25_scores, hard_negatives


def _corpus(spark):
    rows = [
        (1, "spark shuffle join spark"),
        (2, "spark shuffle broadcast"),
        (3, "window aggregate shuffle"),
        (4, "totally unrelated prose here"),
        (5, "spark window join"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark):
    return spark.createDataFrame(
        [(1, ["spark", "shuffle"], 1)],
        "query_id long, terms array<string>, positive_id long",
    )


def test_hard_negatives_excludes_positive_and_ranks(spark):
    docs = _corpus(spark)
    out = hard_negatives(docs, _queries(spark), k=3).collect()
    negs = [r["neg_doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert 1 not in negs                      # positive excluded
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == list(
        range(1, len(out) + 1)
    )
    assert 4 not in negs                      # no query-term overlap
    # ordering agrees with the reference scorer on the same terms
    ref = {r["doc_id"]: r["bm25"] for r in bm25_scores(
        docs, ["spark", "shuffle"]).collect()}
    ref_order = sorted((d for d in ref if d != 1),
                       key=lambda d: (-ref[d], d))
    assert negs == ref_order[:3]


def test_hard_negatives_k_cap_and_determinism(spark):
    docs = _corpus(spark)
    out1 = sorted(map(tuple, hard_negatives(docs, _queries(spark), k=2).collect()))
    out2 = sorted(map(tuple, hard_negatives(docs, _queries(spark), k=2).collect()))
    assert out1 == out2 and len(out1) == 2
