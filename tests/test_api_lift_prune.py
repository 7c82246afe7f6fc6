"""api_cooccurrence (code_graph.py) and perplexity_prune (ngram_lm.py)
— semantic invariants; board rows pin the exact arithmetic vs DuckDB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.code_graph import api_cooccurrence
from graphrag_rs_spark.operators.ngram_lm import (
    perplexity_prune,
    perplexity_scores,
    train_ngram_lm,
)


def _files(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, lang string, content string"
    )


def _py(*mods):
    return "\n".join(f"import {m}" for m in mods) + "\n"


def test_api_cooccurrence_counts_and_lift(spark):
    # numpy+pandas co-adopted in 3/4 repos; scipy rides with them twice;
    # 'rare' appears once (below support) and must never pair
    rows = [
        ("r1", "a.py", "python", _py("numpy", "pandas", "scipy")),
        ("r2", "b.py", "python", _py("numpy", "pandas", "scipy")),
        ("r3", "c.py", "python", _py("numpy", "pandas", "rare")),
        ("r4", "d.py", "python", _py("numpy")),
    ]
    out = {
        (r["module_a"], r["module_b"]): r
        for r in api_cooccurrence(_files(spark, rows), min_support=2).collect()
    }
    np_pd = out[("numpy", "pandas")]
    assert np_pd["co_baskets"] == 3
    assert np_pd["support_a"] == 4 and np_pd["support_b"] == 3
    # lift = 3*4 / (4*3) = 1.0 exactly -> 1_000_000 ppm
    assert np_pd["lift_ppm"] == 1_000_000
    assert np_pd["confidence_ppm"] == 750_000
    sc_pairs = {p for p in out if "scipy" in p}
    assert sc_pairs == {("numpy", "scipy"), ("pandas", "scipy")}
    assert out[("pandas", "scipy")]["lift_ppm"] == 1_333_333  # 2*4/(3*2)
    assert not any("rare" in p for p in out)


def test_api_cooccurrence_basket_guard(spark):
    rows = [("r1", "a.py", "python", _py("x", "y", "z")),
            ("r2", "b.py", "python", _py("x", "y", "z"))]
    with pytest.raises(ValueError, match="max_basket_modules"):
        api_cooccurrence(_files(spark, rows), min_support=1,
                         max_basket_modules=2)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_perplexity_prune_keeps_middle_band(spark):
    # train on everything; docs 0..9 in-distribution, doc 90 is pure
    # repeated boilerplate (low ppl tail), doc 91 unseen-vocab noise
    # (high ppl tail)
    rows = [(i, f"alpha beta gamma delta epsilon zeta token{i} beta gamma")
            for i in range(10)]
    rows += [(90, "alpha beta " * 30), (91, "zzq qqx xxv vvk kkj jjh hhg")]
    docs = _docs(spark, rows)
    model = train_ngram_lm(docs, n=2)
    kept = {r["doc_id"] for r in
            perplexity_prune(docs, model, low=0.25, high=0.75).collect()}
    assert 90 not in kept and 91 not in kept
    assert kept and kept <= set(range(10))
    # band membership is consistent with the float scorer's ordering:
    # every kept doc scores between the extremes
    scores = {r["doc_id"]: r["logppl"] for r in
              perplexity_scores(docs, model).collect()}
    for d in kept:
        assert scores[90] < scores[d] < scores[91]


def test_perplexity_prune_short_docs_never_kept(spark):
    rows = [(1, "one"), (2, ""), (3, None)] + [
        (10 + i, "aa bb cc dd ee") for i in range(8)
    ]
    docs = _docs(spark, rows)
    model = train_ngram_lm(docs, n=2)
    kept = {r["doc_id"] for r in perplexity_prune(docs, model).collect()}
    assert kept.isdisjoint({1, 2, 3})
    assert kept  # the well-formed docs survive
