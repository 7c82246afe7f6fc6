"""Lineage control for iterative DataFrame kernels.

Why this exists: ``Dataset.checkpoint``/``localCheckpoint`` DO materialize
the data, but the returned ``LogicalRDD`` retains ``originStats`` /
``originConstraints`` — live references to the pre-checkpoint logical
plan. In an iterative algorithm whose round-r plan references the round
r-1 frame several times (self-joins, multi-way joins of the label state),
Catalyst's relation deduplication copies those subtrees with fresh
instances, defeating the per-instance stats memoization. Planning then
re-walks the entire iteration history with branching ≈ (refs per round)^r:
measured here as 1.3s → 2.3s → 13s → 132s per community-merge round on a
1.9k-node graph, with the *executed* plans flat and tiny.

``cut_lineage`` severs the plan completely by writing the frame to
parquet in the session's checkpoint scratch dir and reading it back — the
same "save/load to truncate lineage" pattern GraphFrames recommends for
its connected-components checkpoint interval. Locally the scratch dir is
tmpfs; on a cluster it is the configured checkpoint dir (HDFS/object
store), where a per-superstep table write is the standard cost of
unbounded iterative lineage.
"""

from __future__ import annotations

import itertools
import os
import uuid

from pyspark.sql import DataFrame

_COUNTER = itertools.count()


def cut_lineage(df: DataFrame, tag: str = "iter") -> DataFrame:
    """Materialize ``df`` to parquet and read it back: a TRUE lineage cut
    (plan becomes a parquet scan; no originStats back-references)."""
    spark = df.sparkSession
    ckpt = spark.sparkContext._jsc.sc().getCheckpointDir()
    base = ckpt.get() if ckpt.isDefined() else "/tmp/graphrag-checkpoints"
    path = os.path.join(
        base, "cuts", f"{tag}-{next(_COUNTER)}-{uuid.uuid4().hex[:8]}"
    )
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def both_dirs(e: DataFrame, *extra: str) -> DataFrame:
    """(src, dst, *extra) → both edge directions from ONE evaluation of
    the upstream.

    ``e.union(e.reversed)`` re-plans the whole upstream pipeline in both
    union branches of a single action; exchange reuse recovers only the
    suffix that happens to end in an identical Exchange. The explode
    emits the identical row multiset from one scan, so every downstream
    ``distinct``/``groupBy`` result is unchanged.
    """
    from pyspark.sql import functions as F

    return e.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("p"),
        *extra,
    ).select("p.src", "p.dst", *extra)
