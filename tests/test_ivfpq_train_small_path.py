"""IVF / IVF-PQ trainer driver small paths: the collected-integer Lloyd
loop must return the BIT-IDENTICAL model to the distributed pass family
(collect_threshold=0 forces distributed; all arithmetic is integer plus
the shared floor(sum/n) float division, so equality is exact)."""

from __future__ import annotations

from graphrag_rs_spark.operators.similarity import (
    _train_ivfpq_joint,
    train_ivf_centroids,
)


def _emb(spark, sf="/root/testdata/sf0.001"):
    return spark.read.parquet(f"{sf}/embeddings.parquet")


def test_ivf_trainer_models_identical(spark):
    e = _emb(spark)
    local = train_ivf_centroids(e, n_centroids=8, n_iters=2)
    dist = train_ivf_centroids(
        e, n_centroids=8, n_iters=2, collect_threshold=0
    )
    assert local == dist


def test_joint_trainer_models_identical(spark):
    e = _emb(spark)
    kw = dict(
        id_col="vec_id", vec_col="embedding", dim=64,
        n_centroids=8, n_iters=2, n_subspaces=4, pq_centroids=8,
    )
    lc, lb = _train_ivfpq_joint(e, **kw)
    dc, db = _train_ivfpq_joint(e, collect_threshold=0, **kw)
    assert lc == dc
    assert lb == db


def test_string_ids_fall_back_to_distributed(spark):
    from pyspark.sql import functions as F

    e = _emb(spark).select(
        F.col("vec_id").cast("string").alias("vec_id"), "embedding"
    )
    # must not crash — ordering of string ids is engine-sensitive, so
    # the driver path refuses and the distributed init decides
    out = train_ivf_centroids(e, n_centroids=4, n_iters=1)
    assert len(out) == 4
