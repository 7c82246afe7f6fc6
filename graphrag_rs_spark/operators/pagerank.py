"""G5: PageRank — iterative DataFrame joins.

Reference: graph/pagerank.rs builds a CSR sparse adjacency from
relationship confidences (core/mod.rs:845-887) with damping 0.85,
tol 1e-6, max 100 iterations (pagerank.rs:17-52), SIMD-blocked on one
machine. Distributed form: the classic rank exchange

    rank'(v) = (1-d)/N + d · Σ_{u→v} rank(u) · w(u,v) / outw(u)

as join + groupBy per iteration, eager localCheckpoint per round (same
lineage policy as cc.py/communities.py). Dangling nodes keep their
teleport share (the reference's CSR walk does the same — no dangling
redistribution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    damping: float = 0.85,
    max_iterations: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """edges(src, dst, weight) directed → (id, rank). Σ ranks = 1."""
    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    if n == 0:
        return verts.withColumn("rank", F.lit(0.0))

    outw = edges.groupBy("src").agg(F.sum("weight").alias("outw"))
    norm_edges = (
        edges.join(outw, "src")
        .select("src", "dst", (F.col("weight") / F.col("outw")).alias("p"))
        .localCheckpoint(eager=True)
    )

    ranks = verts.select("id", F.lit(1.0 / n).alias("rank"))
    teleport = (1.0 - damping) / n
    # dangling nodes (no out-edges) redistribute their mass uniformly so
    # Σ ranks stays 1 (standard treatment)
    dangling = verts.join(
        norm_edges.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    ).localCheckpoint(eager=True)

    for _ in range(max_iterations):
        dangling_mass = (
            dangling.join(ranks, "id").agg(F.sum("rank").alias("m")).collect()[0]["m"]
            or 0.0
        )
        contrib = (
            norm_edges.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("incoming"))
            .withColumnRenamed("dst", "id")
        )
        new_ranks = (
            ranks.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (F.coalesce("incoming", F.lit(0.0)) + F.lit(dangling_mass / n))
                ).alias("new_rank"),
                "rank",
            )
            .localCheckpoint(eager=True)
        )
        delta = new_ranks.agg(
            F.sum(F.abs(F.col("new_rank") - F.col("rank"))).alias("d")
        ).collect()[0]["d"]
        ranks = new_ranks.select("id", F.col("new_rank").alias("rank"))
        if delta is not None and delta < tol:
            break
    return ranks


def pagerank_from_triples(triples: DataFrame, **kwargs) -> DataFrame:
    """Undirected PageRank over the triple graph (weight = confidence),
    matching the reference's undirected projection (core/mod.rs:1054-1073)."""
    e = triples.select(
        F.col("subj").alias("src"), F.col("obj").alias("dst"),
        F.col("confidence").cast("double").alias("weight"),
    )
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"))
    return pagerank(sym, **kwargs)
