"""Dyad census + reciprocity for directed graphs.

Holland–Leinhardt dyad census: every unordered node pair is mutual
(edges both ways), asymmetric (exactly one way), or null.  Reciprocity
is the fraction of directed edges that are reciprocated,
2·mutual / (2·mutual + asym), reported in floor-quantized micro-units
so it stays integer-exact.

Scale shape: one canonical-pair groupBy over the edge list (the count
of distinct directions per pair), one distinct-node count — null dyads
are arithmetic (n·(n−1)/2 minus the observed pairs), never
materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dyad_census(edges: DataFrame) -> DataFrame:
    """edges(src, dst) directed → one row
    (mutual, asym, null_dyads, reciprocity_micro)."""
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    pair_kinds = (
        e.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.when(F.col("src") < F.col("dst"), 1)
            .otherwise(2)
            .alias("direction"),
        )
        .groupBy("a", "b")
        .agg(F.count_distinct("direction").alias("ndir"))
    )
    kinds = pair_kinds.agg(
        F.sum((F.col("ndir") == 2).cast("long")).alias("mutual"),
        F.sum((F.col("ndir") == 1).cast("long")).alias("asym"),
    )
    n = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )
    total = n * (n - 1) // 2
    return kinds.select(
        F.coalesce("mutual", F.lit(0)).alias("mutual"),
        F.coalesce("asym", F.lit(0)).alias("asym"),
        (
            F.lit(total)
            - F.coalesce("mutual", F.lit(0))
            - F.coalesce("asym", F.lit(0))
        ).cast("long").alias("null_dyads"),
        F.when(
            (F.col("mutual") * 2 + F.col("asym")) > 0,
            (F.col("mutual") * 2 * 1_000_000).cast("long")
            / (F.col("mutual") * 2 + F.col("asym")),
        )
        .otherwise(F.lit(0.0))
        .cast("long")
        .alias("reciprocity_micro"),
    )
