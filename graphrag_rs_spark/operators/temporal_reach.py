"""Temporal reachability — earliest-arrival (foremost) paths.

A temporal edge (src, dst, t) can only be traversed at time t, and a
time-respecting path must use non-decreasing timestamps.  The foremost
path to v is the one minimizing arrival time; unlike static BFS, a
shorter-hop path can lose to a longer one that departs earlier.  This
is the standard primitive for "who could have influenced whom" over
interaction logs (Holme & Saramäki, Temporal Networks).

Scale shape: frontier relaxation exactly like weighted SSSP — each
round joins the improved frontier against the edge list with the
time-respecting predicate edge.t ≥ arrival(cur), keeps min arrival per
node, and stops when nothing improves.  Rounds are bounded by the
temporal diameter; per-round cost is one equi-join + one min
aggregation, lineage cut every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.iterutil import cut_lineage


def temporal_reachability(
    edges: DataFrame,
    sources: DataFrame,
    *,
    start_time: int = 0,
    max_rounds: int = 40,
) -> DataFrame:
    """edges(src, dst, t long) + sources(id) →
    (source, id, arrival long, hops int): the earliest arrival time at
    every node time-reachable from each source (the source itself at
    ``start_time``, 0 hops), taking each edge at its timestamp with
    departure ≥ current arrival.  ``hops`` is the hop count of THE
    earliest-arrival path, ties broken toward fewer hops.
    """
    e = edges.select(
        "src", "dst", F.col("t").cast("long").alias("t")
    ).where(F.col("src") != F.col("dst"))
    best = sources.select(
        F.col("id").alias("source"),
        F.col("id").alias("id"),
        F.lit(int(start_time)).cast("long").alias("arrival"),
        F.lit(0).cast("int").alias("hops"),
    )
    best = cut_lineage(best, tag="treach")
    frontier = best
    for _ in range(max_rounds):
        relax = (
            frontier.join(e.withColumnRenamed("src", "id"), "id")
            .where(F.col("t") >= F.col("arrival"))
            .select(
                "source",
                F.col("dst").alias("id"),
                F.col("t").alias("arrival"),
                (F.col("hops") + 1).cast("int").alias("hops"),
            )
        )
        merged = (
            best.unionByName(relax)
            .groupBy("source", "id")
            .agg(F.min(F.struct("arrival", "hops")).alias("b"))
            .select(
                "source",
                "id",
                F.col("b.arrival").alias("arrival"),
                F.col("b.hops").alias("hops"),
            )
        )
        merged = cut_lineage(merged, tag="treach")
        improved = (
            merged.alias("m")
            .join(best.alias("o"), ["source", "id"], "left")
            .where(
                F.col("o.arrival").isNull()
                | (F.col("m.arrival") < F.col("o.arrival"))
                | (
                    (F.col("m.arrival") == F.col("o.arrival"))
                    & (F.col("m.hops") < F.col("o.hops"))
                )
            )
            .select(
                "source",
                "id",
                F.col("m.arrival").alias("arrival"),
                F.col("m.hops").alias("hops"),
            )
        )
        improved = cut_lineage(improved, tag="treach")
        best = merged
        if improved.limit(1).count() == 0:
            break
        frontier = improved
    else:
        raise RuntimeError(
            f"temporal_reachability did not converge in {max_rounds} rounds"
        )
    return best
