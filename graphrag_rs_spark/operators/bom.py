"""Bill-of-materials rollup — weighted transitive cost over a DAG.

The classic OLAP recursion: every assembly's total cost is its own cost
plus quantity-weighted totals of its children, over an acyclic
part-of graph.  The same DP shape covers storage rollups over directory
trees, dependency-closure sizing over module graphs, and aggregate
risk over ownership DAGs — it is the multiplicative-weight complement
of the pure path-count DP in ``analytics.path_counts``.

Totals are exact longs (costs and quantities are integers; a DAG has
finitely many paths, so the rollup is Σ over paths of Π qty · cost —
no floats anywhere), which the DuckDB oracle replays with a recursive
path-enumeration CTE.

Scale shape: value iteration — total⁰ = own cost; each round joins the
edge list with the previous totals on child, partial-agg sums per
parent, and adds the base cost.  Round k is correct for every node of
height ≤ k, so ``depth`` rounds fix the whole DAG; the loop stops
early on fixpoint (one limit-1 probe per round) and RAISES if
``max_depth`` is exhausted while still moving (cycle or too-deep
input), matching the convergence contract of scc/topological_layers.
Each round is one shuffle keyed on child then parent; lineage cut per
round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.iterutil import cut_lineage


def bom_rollup(
    edges: DataFrame,
    costs: DataFrame,
    *,
    max_depth: int = 30,
) -> DataFrame:
    """edges(parent, child, qty int) DAG + costs(id, cost int) →
    (id, total long): total(p) = cost(p) + Σ qty·total(child).

    Nodes appearing only in ``edges`` (no cost row) contribute base
    cost 0; a cyclic input raises RuntimeError at ``max_depth``.
    """
    e = edges.select("parent", "child", F.col("qty").cast("long").alias("qty"))
    e = cut_lineage(e, tag="bom")
    ids = (
        e.select(F.col("parent").alias("id"))
        .unionByName(e.select(F.col("child").alias("id")))
        .unionByName(costs.select("id"))
        .distinct()
    )
    base = ids.join(
        costs.select("id", F.col("cost").cast("long").alias("cost")),
        "id",
        "left",
    ).select("id", F.coalesce("cost", F.lit(0)).cast("long").alias("cost"))
    base = cut_lineage(base, tag="bom")
    total = base.select("id", F.col("cost").alias("total"))
    total = cut_lineage(total, tag="bom")
    for _ in range(max_depth):
        contrib = (
            e.join(total.withColumnRenamed("id", "child"), "child")
            .select(
                F.col("parent").alias("id"),
                (F.col("qty") * F.col("total")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        nxt = base.join(contrib, "id", "left").select(
            "id",
            (F.col("cost") + F.coalesce("s", F.lit(0))).alias("total"),
        )
        nxt = cut_lineage(nxt, tag="bom")
        moved = (
            nxt.join(
                total.withColumnRenamed("total", "prev"), "id"
            )
            .where(F.col("total") != F.col("prev"))
            .limit(1)
            .count()
        )
        total = nxt
        if moved == 0:
            return total
    raise RuntimeError(
        f"bom_rollup did not converge in {max_depth} rounds - "
        "cyclic edges or depth > max_depth"
    )
