"""Densest-subgraph peeling — Bahmani/Kumar/Vassilvitskii rounds.

The MapReduce densest-subgraph algorithm (Bahmani, Kumar,
Vassilvitskii, VLDB 2012): repeatedly delete every vertex whose degree
is at most (1+ε)·average-degree of the CURRENT subgraph, tracking the
density |E|/|V| after each peel; the best intermediate subgraph is a
2(1+ε)-approximation of the densest subgraph, reached in
O(log V / log(1+ε)) rounds.  Each round is one degree aggregation and
one semi-join — the canonical shuffle-parallel shape.

Everything is integer-exact: the peel test
deg · V · den ≤ num · 2 · E and the density comparison
E₁·V₂ vs E₂·V₁ are cross-multiplied, so no float ever decides an
outcome and a SQL oracle replays every round bit-for-bit
((1+ε) = num/den).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.iterutil import cut_lineage


def densest_subgraph(
    edges: DataFrame,
    *,
    factor_num: int = 3,
    factor_den: int = 2,
    max_rounds: int = 60,
) -> DataFrame:
    """edges(src, dst) undirected → the best peel-round subgraph:
    (id, best_edges, best_nodes, best_round) — one row per member of
    the densest intermediate subgraph, annotated with its exact edge
    and node counts (density = best_edges / best_nodes) and the
    1-based round at which that subgraph was current (round 1 = the
    full input graph, before any peel).
    """
    if factor_num * 1.0 / factor_den < 1.0:
        raise ValueError("factor must be >= 1 (factor_num/factor_den)")
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    sym = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
    )
    live = cut_lineage(sym, tag="densest")
    spark = edges.sparkSession
    members_acc = None  # (round, id) for every round's subgraph
    stats = []  # (round, n_edges, n_nodes) — O(rounds) driver ints
    rnd = 0
    for rnd in range(1, max_rounds + 1):
        deg = live.groupBy(F.col("src").alias("id")).agg(
            F.count("*").alias("deg")
        )
        deg = cut_lineage(deg, tag="densest")
        n_nodes = deg.count()
        if n_nodes == 0:
            break
        n_sym = live.count()  # 2 · undirected edge count
        stats.append((rnd, n_sym // 2, n_nodes))
        snapshot = deg.select("id").withColumn("round", F.lit(rnd))
        members_acc = (
            snapshot
            if members_acc is None
            else members_acc.unionByName(snapshot)
        )
        members_acc = cut_lineage(members_acc, tag="densest")
        # peel: deg · V · den ≤ num · 2E  (all int64)
        keep = deg.where(
            F.col("deg") * F.lit(n_nodes) * F.lit(factor_den)
            > F.lit(factor_num) * F.lit(n_sym)
        ).select("id")
        live = (
            live.join(keep.withColumnRenamed("id", "src"), "src")
            .join(keep.withColumnRenamed("id", "dst"), "dst")
            .select("src", "dst")
        )
        live = cut_lineage(live, tag="densest")
    else:
        if live.limit(1).count() > 0:
            raise RuntimeError(
                f"densest_subgraph did not converge in {max_rounds} rounds"
            )
    if not stats:
        return edges.sparkSession.createDataFrame(
            [], "id string, best_edges long, best_nodes long, best_round int"
        )
    # best density by integer cross-compare; ties → earliest round
    best = stats[0]
    for s in stats[1:]:
        if s[1] * best[2] > best[1] * s[2]:
            best = s
    best_round, best_e, best_v = best
    return (
        members_acc.where(F.col("round") == best_round)
        .select(
            "id",
            F.lit(best_e).cast("long").alias("best_edges"),
            F.lit(best_v).cast("long").alias("best_nodes"),
            F.lit(best_round).cast("int").alias("best_round"),
        )
    )
