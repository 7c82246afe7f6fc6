"""All-pairs TF-IDF cosine vs a driver-side numpy-style reference."""

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.allpairs import (
    allpairs_cosine,
    numpy_reference,
    tfidf_postings,
)

DOCS = [
    (0, "spark streaming joins windows spark spark"),
    (1, "spark streaming joins windows watermark"),
    (2, "graph entities linking communities pagerank"),
    (3, "graph entities linking communities leiden"),
    (4, "cooking pasta tomatoes basil olive oil"),
    (5, "spark graph entities streaming pagerank windows"),
]


def _tok(text):
    return text.lower().split()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_postings_unit_norm(spark, docs):
    norms = (
        tfidf_postings(docs)
        .groupBy("id")
        .agg(F.sum(F.col("w") * F.col("w")).alias("sq"))
        .collect()
    )
    for r in norms:
        assert abs(r["sq"] - 1.0) < 1e-9


def test_exact_matches_reference(spark, docs):
    ref = numpy_reference({i: _tok(t) for i, t in DOCS}, threshold=0.3)
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in allpairs_cosine(docs, threshold=0.3).collect()
    }
    assert got == ref
    assert (0, 1) in got and (2, 3) in got  # the two near-pairs
    assert not any(4 in p for p in got)     # cooking doc matches nothing


def test_threshold_filters(spark, docs):
    hi = allpairs_cosine(docs, threshold=0.99).count()
    lo = allpairs_cosine(docs, threshold=0.01).count()
    ref_lo = numpy_reference({i: _tok(t) for i, t in DOCS}, threshold=0.01)
    assert hi == 0 and lo == len(ref_lo)


def test_max_df_bounds_candidates_not_precision(spark, docs):
    # 'spark' (df=3) and every rarer term still generate candidates at
    # max_df=3; cosines reported must equal the exact ones
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in allpairs_cosine(docs, threshold=0.3).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in allpairs_cosine(docs, threshold=0.3, max_df=3).collect()
    }
    assert set(blocked) <= set(exact)
    for p, c in blocked.items():
        assert c == exact[p]  # precision exact: full-vector verification
    # the high-cosine pairs share rare terms → still found
    assert (0, 1) in blocked and (2, 3) in blocked


def test_candidate_generation_skips_frequent_terms(spark, docs):
    # with max_df=1 no term is shared-and-rare → no pairs at all
    assert allpairs_cosine(docs, threshold=0.01, max_df=1).count() == 0
