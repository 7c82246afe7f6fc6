"""Count-Min / HyperLogLog sketches (operators/sketches.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.sketches import (
    cms_point_estimates,
    cms_table,
    hll_estimate,
    hll_registers,
)


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_cms_never_underestimates_and_absent_is_small(spark):
    docs = _docs(spark, ["a a a b", "b c", "a c c"])
    table = cms_table(docs, depth=4, width=64)
    probes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("never",)], ["token"]
    )
    est = {
        r["token"]: r["cms_estimate"]
        for r in cms_point_estimates(table, probes, depth=4, width=64).collect()
    }
    true = {"a": 4, "b": 2, "c": 3, "never": 0}
    for tok, t in true.items():
        assert est[tok] >= t  # CMS overestimates only
    # with 7 distinct tokens in 4x64 cells, collisions are unlikely:
    # the present tokens should be exact here
    assert est["a"] == 4 and est["b"] == 2 and est["c"] == 3


def test_cms_table_is_mergeable(spark):
    a = _docs(spark, ["x y z"])
    b = _docs(spark, ["x x w"])
    both = _docs(spark, ["x y z", "x x w"])
    merged = (
        cms_table(a).unionByName(cms_table(b))
        .groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_table(both)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hll_estimate_tracks_truth(spark):
    # 400 distinct tokens — large-range regime for m=64
    texts = [" ".join(f"tok{i}" for i in range(j, j + 40))
             for j in range(0, 400, 40)]
    toks = _docs(spark, texts).select(
        F.explode(F.split("text", " ")).alias("t")
    )
    row = hll_estimate(hll_registers(toks, "t")).first()
    est = row["estimate_c100"] / 100.0
    # HLL standard error ~1.04/sqrt(64) = 13%; allow 3 sigma
    assert 400 * 0.6 <= est <= 400 * 1.4, est


def test_hll_linear_counting_small_range(spark):
    toks = _docs(spark, ["a b c d e"]).select(
        F.explode(F.split("text", " ")).alias("t")
    )
    row = hll_estimate(hll_registers(toks, "t")).first()
    assert row["n_zero_buckets"] >= 59
    est = row["estimate_c100"] / 100.0
    assert 3 <= est <= 8, est


def test_hll_power_of_two_guard(spark):
    toks = _docs(spark, ["a"]).select(F.col("text").alias("t"))
    with pytest.raises(ValueError):
        hll_registers(toks, "t", m=48)


def test_feature_hash_deterministic_and_additive(spark):
    from graphrag_rs_spark.operators.sketches import feature_hash_vectors

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta"), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["fvec"]
           for r in feature_hash_vectors(docs, dim=16).collect()}
    assert 3 not in out                       # empty doc emits nothing
    assert len(out[1]) == 16
    # additivity: doc1 = 2*alpha + 1*beta; subtracting doc2's beta
    # leaves exactly the alpha-only doc times two
    alpha_only = {r["doc_id"]: r["fvec"] for r in feature_hash_vectors(
        spark.createDataFrame([(9, "alpha")], "doc_id long, text string"),
        dim=16).collect()}[9]
    diff = [a - b for a, b in zip(out[1], out[2])]
    assert diff == [2 * v for v in alpha_only]
    # repeat run identical
    out2 = {r["doc_id"]: r["fvec"]
            for r in feature_hash_vectors(docs, dim=16).collect()}
    assert out == out2
