"""Jones–Plassmann parallel greedy graph coloring.

The JP algorithm (Jones & Plassmann 1993) is the standard way to color
a graph with shuffle-parallel rounds: give every vertex a hash
priority; each round, every still-uncolored vertex that is a LOCAL
MAXIMUM among its uncolored neighbours picks the smallest color absent
from its already-colored neighbourhood.  Adjacent vertices can never
win the same round, so there are no conflicts to repair, and the
expected round count is O(log n / log log n) on bounded-degree graphs.

Scale shape: each round is two equi-joins (loser detection + used-color
collection) and one aggregation over the LIVE vertex set, which shrinks
every round — no driver-side state, no per-vertex Python.  Priorities
use the portable 60-bit sha256 family (linkpred._h60), so a SQL oracle
replays every round bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.iterutil import cut_lineage
from graphrag_rs_spark.operators.linkpred import _h60


def jones_plassmann_coloring(
    edges: DataFrame,
    *,
    seed: str = "jp",
    max_rounds: int = 40,
) -> DataFrame:
    """edges(src, dst) undirected → (id, color int, round int).

    color is the smallest non-negative integer not used by neighbours
    colored in EARLIER rounds (synchronous JP); round is 1-based and
    records when the vertex won — handy for plan/round diagnostics.
    Deterministic: priority = (_h60(seed‖id), id) descending.
    """
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    sym = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
    )
    sym = cut_lineage(sym, tag="jp-sym")
    prio = F.concat(F.lit(seed), F.lit("\x1f"), F.col("id"))
    unc = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("prio", _h60(prio))
    )
    unc = cut_lineage(unc, tag="jp")
    colored = None
    for rnd in range(1, max_rounds + 1):
        if unc.limit(1).count() == 0:
            break
        # losers: uncolored vertices with an uncolored neighbour of
        # strictly higher (prio, id)
        nbr = sym.join(
            unc.select(F.col("id").alias("src"), F.col("prio").alias("p_s")),
            "src",
        ).join(
            unc.select(F.col("id").alias("dst"), F.col("prio").alias("p_d")),
            "dst",
        )
        losers = (
            nbr.where(
                (F.col("p_d") > F.col("p_s"))
                | ((F.col("p_d") == F.col("p_s")) & (F.col("dst") > F.col("src")))
            )
            .select(F.col("src").alias("id"))
            .distinct()
        )
        winners = unc.join(losers, "id", "left_anti").select("id")
        # used colors: already-colored neighbours of each winner
        used = (
            sym.join(winners.withColumnRenamed("id", "src"), "src")
            .join(
                (
                    colored.select(
                        F.col("id").alias("dst"), F.col("color").alias("c")
                    )
                    if colored is not None
                    else winners.limit(0).select(
                        F.col("id").alias("dst"),
                        F.lit(0).cast("int").alias("c"),
                    )
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.array_sort(F.array_distinct(F.collect_list("c"))).alias("cs"))
        )
        new = (
            winners.join(used, "id", "left")
            .select(
                "id",
                F.aggregate(
                    F.coalesce("cs", F.array().cast("array<int>")),
                    F.lit(0).cast("int"),
                    lambda acc, c: F.when(c == acc, acc + 1).otherwise(acc),
                ).alias("color"),
                F.lit(rnd).cast("int").alias("round"),
            )
        )
        colored = (
            new if colored is None else colored.unionByName(new)
        )
        colored = cut_lineage(colored, tag="jp")
        unc = cut_lineage(unc.join(new, "id", "left_anti"), tag="jp")
    else:
        if unc.limit(1).count() > 0:
            raise RuntimeError(
                "jones_plassmann_coloring did not converge in "
                f"{max_rounds} rounds"
            )
    if colored is None:
        return sym.select(
            F.col("src").alias("id"),
            F.lit(0).cast("int").alias("color"),
            F.lit(0).cast("int").alias("round"),
        ).limit(0)
    return colored
