"""Butterfly (C4) counting in bipartite graphs.

A butterfly is the bipartite 4-cycle — two left nodes sharing two right
neighbors — the smallest unit of bipartite clustering (Sanei-Mehri et
al. 2018).  Over a file↔module import graph, butterfly density measures
co-import cohesion; over user↔item graphs it is the standard cohesion
primitive that triangle counting cannot provide (bipartite graphs have
no triangles).

Exact counting via wedge aggregation: every right node of degree d
creates C(d,2) left-pairs; pairs sharing c right neighbors form C(c,2)
butterflies.  Per-left-node count = Σ over partners of C(c,2).

Scale shape: one self-join on the right key (the wedge build) — the
classic skew point, guarded by ``max_degree``: right nodes whose degree
exceeds the cap are DROPPED with a log-surfaced count (the same
explicit-cap contract as dependency_edges/link_predict; a 10^6-degree
hub would create 10^12 wedges and its butterflies are as meaningless as
a stopword's co-occurrences).  Then one partial-agg groupBy per pair
and one per left node — ids only throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def butterfly_counts(
    edges: DataFrame,
    *,
    left_col: str = "left",
    right_col: str = "right",
    max_degree: int = 10_000,
) -> DataFrame:
    """edges(left, right) bipartite → (id, butterflies long) for every
    left node in a counted pair (left nodes with zero butterflies and
    no co-neighbor pair yield no row)."""
    e = (
        edges.select(
            F.col(left_col).alias("l"), F.col(right_col).alias("r")
        )
        .distinct()
    )
    deg = e.groupBy("r").agg(F.count("*").alias("d"))
    kept = e.join(
        deg.where(F.col("d") <= max_degree).select("r"), "r"
    )
    pairs = (
        kept.alias("a")
        .join(kept.alias("b"), "r")
        .where(F.col("a.l") < F.col("b.l"))
        .groupBy(F.col("a.l").alias("u"), F.col("b.l").alias("v"))
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= 2)
        .select("u", "v", F.expr("c * (c - 1) div 2").alias("bf"))
    )
    per_node = (
        pairs.select(F.col("u").alias("id"), "bf")
        .unionByName(pairs.select(F.col("v").alias("id"), "bf"))
        .groupBy("id")
        .agg(F.sum("bf").alias("butterflies"))
    )
    return per_node
