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


def _wrap64(v: int) -> int:
    """Java-long wrap (Spark's non-ANSI sum/multiply overflow image)."""
    return ((v + 2**63) % 2**64) - 2**63


def _bom_rollup_local(spark, e_rows, cost_rows, max_depth, id_type) -> DataFrame:
    """Driver replay of the distributed value iteration — identical long
    wrap arithmetic, identical null-edge join semantics, identical
    non-convergence error."""
    from pyspark.sql.types import LongType, StructField, StructType

    cost = {}
    ids = set()
    for r in cost_rows:
        ids.add(r["id"])
        if r["id"] is not None:  # NULL cost ids never equi-join onto base
            cost[r["id"]] = int(r["cost"]) if r["cost"] is not None else 0
    valid_edges = []
    for r in e_rows:
        ids.add(r["parent"])
        ids.add(r["child"])
        # NULL parent/child never equi-joins; NULL qty terms vanish in
        # F.sum — mirror by skipping them in the contribution pass
        if r["parent"] is not None and r["child"] is not None and r["qty"] is not None:
            valid_edges.append((r["parent"], r["child"], int(r["qty"])))
    base = {v: cost.get(v, 0) for v in ids}
    total = dict(base)
    for _ in range(max_depth):
        contrib: dict = {}
        for p, c, q in valid_edges:
            contrib[p] = _wrap64(contrib.get(p, 0) + q * total[c])
        nxt = {v: _wrap64(base[v] + contrib.get(v, 0)) for v in ids}
        moved = nxt != total
        total = nxt
        if not moved:
            schema = StructType(
                [StructField("id", id_type), StructField("total", LongType())]
            )
            return spark.createDataFrame(
                sorted(total.items(), key=str), schema
            )
    raise RuntimeError(
        f"bom_rollup did not converge in {max_depth} rounds - "
        "cyclic edges or depth > max_depth"
    )


def bom_rollup(
    edges: DataFrame,
    costs: DataFrame,
    *,
    max_depth: int = 30,
    collect_threshold: int = 200_000,
) -> DataFrame:
    """edges(parent, child, qty int) DAG + costs(id, cost int) →
    (id, total long): total(p) = cost(p) + Σ qty·total(child).

    Nodes appearing only in ``edges`` (no cost row) contribute base
    cost 0; a cyclic input raises RuntimeError at ``max_depth``.

    Small inputs (edge/cost rows and round·E work product bounded) replay
    the identical value iteration driver-side — the distributed loop pays
    ~3 fixed-cost actions per round; parity pinned in tests/test_bom.py.
    """
    e0 = edges.select("parent", "child", F.col("qty").cast("long").alias("qty"))
    if collect_threshold:
        e_rows = e0.limit(collect_threshold + 1).collect()
        if (
            len(e_rows) <= collect_threshold
            and len(e_rows) * max(1, max_depth) <= 20_000_000
        ):
            cost_rows = costs.select(
                "id", F.col("cost").cast("long").alias("cost")
            ).limit(collect_threshold + 1).collect()
            # duplicate cost ids would duplicate base/output rows in the
            # distributed left join — a dict can't mirror that; route the
            # pathological shape to the distributed plan
            uniq = len({r["id"] for r in cost_rows}) == len(cost_rows)
            if len(cost_rows) <= collect_threshold and uniq:
                return _bom_rollup_local(
                    edges.sparkSession,
                    e_rows,
                    cost_rows,
                    max_depth,
                    edges.schema["parent"].dataType,
                )
    e = cut_lineage(e0, tag="bom")
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
