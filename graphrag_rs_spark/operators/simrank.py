"""SimRank structural similarity — fixed-point integer iterations.

SimRank (Jeh & Widom 2002): two nodes are similar if their in-
neighbours are similar — s(a,b) = C/(|I(a)|·|I(b)|) · Σ s(i,j) over
in-neighbour pairs, s(a,a) = 1.  Scores here live in integer
micro-units with FLOOR division each iteration
(s' = (C_num · Σ) // (C_den · |I(a)|·|I(b)|)), so every engine
replays every iterate bit-exactly — the usual float-drift problem of
iterative scores is defined away rather than rounded away.

Scale shape: one iteration = the wedge join e₁ ⋈ e₂ ⋈ S_k on the
PREVIOUS nonzero pair frame plus two in-degree broadcasts — zero pairs
are never materialized (missing = 0), which is what keeps the pair
frame near-linear on sparse graphs instead of quadratic.  Iterations
are fixed-count (SimRank converges geometrically; 3–5 is standard),
lineage cut per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.iterutil import cut_lineage

UNIT = 1_000_000


def simrank(
    edges: DataFrame,
    *,
    iterations: int = 3,
    c_num: int = 8,
    c_den: int = 10,
) -> DataFrame:
    """edges(src, dst) directed → (id_a, id_b, simrank_micro long) for
    every non-diagonal pair with a positive score, id_a < id_b
    (SimRank is symmetric).  Scores are micro-units of the C=c_num/c_den
    floor-quantized iteration."""
    if not (0 < c_num < c_den):
        raise ValueError("need 0 < c_num < c_den")
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    e = cut_lineage(e, tag="simrank")
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    ind = e.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("d"))
    ind = cut_lineage(ind, tag="simrank")
    diag = nodes.select(
        F.col("id").alias("a"),
        F.col("id").alias("b"),
        F.lit(UNIT).cast("long").alias("s"),
    )
    s_k = cut_lineage(diag, tag="simrank")
    for _ in range(iterations):
        # drive the wedge from the nonzero pair frame: two equi-joins,
        # never an edge×edge cross product
        summed = (
            s_k.select(
                F.col("a").alias("i"), F.col("b").alias("j"), "s"
            )
            .join(
                e.select(F.col("src").alias("i"), F.col("dst").alias("a")),
                "i",
            )
            .join(
                e.select(F.col("src").alias("j"), F.col("dst").alias("b")),
                "j",
            )
            .where(F.col("a") != F.col("b"))
            .groupBy("a", "b")
            .agg(F.sum("s").alias("num"))
        )
        off_diag = (
            summed.join(ind.withColumnRenamed("id", "a")
                        .withColumnRenamed("d", "da"), "a")
            .join(ind.withColumnRenamed("id", "b")
                  .withColumnRenamed("d", "db"), "b")
            .select(
                "a",
                "b",
                F.expr(f"({c_num} * num) div ({c_den} * da * db)")
                .cast("long")
                .alias("s"),
            )
            .where(F.col("s") > 0)
        )
        s_k = cut_lineage(diag.unionByName(off_diag), tag="simrank")
    return (
        s_k.where(F.col("a") < F.col("b"))
        .select(
            F.col("a").alias("id_a"),
            F.col("b").alias("id_b"),
            F.col("s").alias("simrank_micro"),
        )
    )
