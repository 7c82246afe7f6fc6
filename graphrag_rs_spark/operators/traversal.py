"""G6: bounded BFS traversal — iterative frontier joins.

Reference: graph/traversal.rs:21-101 BFS with max_depth 3, max_paths 100,
min_relationship_strength 0.5 over the in-memory graph. Distributed form:
the frontier is a DataFrame; each hop is one join against the (filtered)
edge list, visited-set dedupe via left_anti, eager localCheckpoint per hop
(same lineage policy as the other iterative kernels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs(
    edges: DataFrame,
    sources: DataFrame,
    *,
    max_depth: int = 3,
    min_strength: float = 0.5,
    max_paths_per_source: int = 100,
) -> DataFrame:
    """edges(src, dst, weight) + sources(id) →
    (source, node, depth, path: array<string>).

    Undirected expansion; a node is visited at its FIRST (minimal) depth
    per source. Paths beyond ``max_paths_per_source`` per source are
    truncated deterministically (smallest path array first).
    """
    e = edges.where(F.col("weight") >= min_strength).select("src", "dst")
    sym = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    frontier = sources.select(
        F.col("id").alias("source"),
        F.col("id").alias("node"),
        F.lit(0).alias("depth"),
        F.array(F.col("id")).alias("path"),
    ).localCheckpoint(eager=True)
    visited = frontier.select("source", "node").localCheckpoint(eager=True)
    out = [frontier]

    for depth in range(1, max_depth + 1):
        expanded = (
            frontier.join(sym.withColumnRenamed("src", "node"), "node")
            .select(
                "source",
                F.col("dst").alias("node"),
                F.lit(depth).alias("depth"),
                F.concat("path", F.array("dst")).alias("path"),
            )
        )
        # first-visit only (per source); dedupe multiple parents by min path
        fresh = (
            expanded.join(visited, ["source", "node"], "left_anti")
            .groupBy("source", "node")
            .agg(F.min("depth").alias("depth"), F.min("path").alias("path"))
            .localCheckpoint(eager=True)
        )
        if fresh.limit(1).count() == 0:
            break
        visited = visited.union(fresh.select("source", "node")).localCheckpoint(eager=True)
        out.append(fresh)
        frontier = fresh

    all_nodes = out[0]
    for df in out[1:]:
        all_nodes = all_nodes.unionByName(df)
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("depth", "path")
    return (
        all_nodes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_paths_per_source)
        .drop("rn")
    )
