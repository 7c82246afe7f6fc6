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


def _temporal_reachability_local(
    spark, edge_rows, src_list, start_time, max_rounds, id_type
) -> DataFrame:
    """Driver replay of the distributed rounds — identical (arrival,
    hops) struct minima (Python tuple compare) and the same
    non-convergence error after ``max_rounds``."""
    from pyspark.sql.types import (
        IntegerType, LongType, StructField, StructType,
    )

    adj: dict = {}
    for r in edge_rows:
        if r["t"] is None:
            continue  # the distributed t >= arrival predicate drops NULLs
        adj.setdefault(r["src"], []).append((r["dst"], int(r["t"])))
    best: dict = {
        (s, s): (int(start_time), 0) for s in src_list
    }
    frontier = dict(best)
    for _ in range(max_rounds):
        relax: dict = {}
        for (s, u), (arr, hp) in frontier.items():
            for v, t in adj.get(u, ()):
                if t >= arr:
                    cand = (t, hp + 1)
                    key = (s, v)
                    cur = relax.get(key)
                    if cur is None or cand < cur:
                        relax[key] = cand
        improved: dict = {}
        for key, cand in relax.items():
            cur = best.get(key)
            if cur is None or cand < cur:
                best[key] = cand
                improved[key] = cand
        if not improved:
            break
        frontier = improved
    else:
        raise RuntimeError(
            f"temporal_reachability did not converge in {max_rounds} rounds"
        )
    schema = StructType(
        [
            StructField("source", id_type),
            StructField("id", id_type),
            StructField("arrival", LongType()),
            StructField("hops", IntegerType()),
        ]
    )
    return spark.createDataFrame(
        [(s, v, a, h) for (s, v), (a, h) in sorted(best.items(), key=str)],
        schema,
    )


def temporal_reachability(
    edges: DataFrame,
    sources: DataFrame,
    *,
    start_time: int = 0,
    max_rounds: int = 40,
    collect_threshold: int = 200_000,
) -> DataFrame:
    """edges(src, dst, t long) + sources(id) →
    (source, id, arrival long, hops int): the earliest arrival time at
    every node time-reachable from each source (the source itself at
    ``start_time``, 0 hops), taking each edge at its timestamp with
    departure ≥ current arrival.  ``hops`` is the hop count of THE
    earliest-arrival path, ties broken toward fewer hops.

    Small inputs (edge/source/round product bounded like weighted_sssp)
    replay the identical rounds driver-side — the distributed form pays
    ~3 fixed-cost actions per round; parity pinned in
    tests/test_temporal_reach.py.
    """
    e = edges.select(
        "src", "dst", F.col("t").cast("long").alias("t")
    ).where(F.col("src") != F.col("dst"))
    if collect_threshold:
        e_rows = e.limit(collect_threshold + 1).collect()
        n_edges = len(e_rows)
        if n_edges <= collect_threshold:
            src_cap = 20_000_000 // max(1, n_edges * max(1, max_rounds)) + 1
            src_rows = sources.select("id").limit(src_cap + 1).collect()
            n_src = len(src_rows)
            if (
                n_src <= src_cap
                and n_src * max(1, n_edges) * max(1, max_rounds)
                <= 20_000_000
            ):
                return _temporal_reachability_local(
                    edges.sparkSession,
                    e_rows,
                    [r[0] for r in src_rows],
                    start_time,
                    max_rounds,
                    sources.schema["id"].dataType,
                )
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
