"""Deterministic random walks — graph → sequence corpus (DeepWalk-style).

Training pipelines turn graphs into token sequences for embedding models
(DeepWalk/node2vec); the reference has no walk surface (its graph module
stops at traversal/centrality), so this is a Spark-native extension in the
same spirit as streaming.py. The whole point at 100 TB is that walks are
data-parallel: every step is ONE equi-join of the walk frontier against
the indexed adjacency list — no per-walk Python loop, no collect.

Determinism: "randomness" is the engine-portable 60-bit sha256 prefix
family (same as simhash/minhash, operators/dedup.py:246): step t of walk w
standing at node v picks neighbor index

    H(v \\x1f w \\x1f t \\x1f seed) mod out_degree(v)

over the adjacency list sorted by dst. Identical walks on any engine with
sha256 — the DuckDB oracle replays them with a recursive CTE. Walks stop
early at sink nodes (no outgoing edge).

Scale shape: adjacency is built once (one shuffle: row_number over src);
each of the L steps is a frontier⋈degree + frontier⋈adjacency equi-join
pair on the current node — partition-pruned by AQE, skew-salted only by
Spark itself. Walk state carries (walk_id, cur, path); lineage is cut per
step so Catalyst never sees an L-deep plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEP = "\x1f"


def _h60(col):
    """Portable 60-bit hash of a string column (sha256 hex prefix)."""
    return F.conv(F.substring(F.sha2(col, 256), 1, 15), 16, 10).cast("long")


def random_walks(
    edges: DataFrame,
    *,
    walk_length: int = 5,
    walks_per_node: int = 2,
    seed: int = 42,
) -> DataFrame:
    """edges(src, dst) → (walk_id, start, steps, path_str).

    One walk row per (node with out-edges) × walks_per_node; ``steps`` is
    the number of hops actually taken (< walk_length only when the walk
    hit a sink), ``path_str`` the '>'-joined node sequence.
    """
    e = edges.select("src", "dst").distinct()
    adj = e.withColumn(
        "idx", F.row_number().over(Window.partitionBy("src").orderBy("dst")) - 1
    ).localCheckpoint(eager=True)
    deg = adj.groupBy("src").agg(F.count("*").alias("d"))

    state = (
        adj.select("src").distinct()
        .select(
            F.col("src").alias("start"),
            F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("w"),
        )
        .select(
            F.concat_ws("#", "start", F.col("w").cast("string")).alias("walk_id"),
            "start",
            "w",
            F.col("start").alias("cur"),
            F.array("start").alias("path"),
        )
        .localCheckpoint(eager=True)
    )
    finished = []

    for t in range(1, walk_length + 1):
        with_deg = state.join(deg, state.cur == deg.src, "left").drop("src")
        # sinks (no out-degree) finish with their current path
        finished.append(
            with_deg.where(F.col("d").isNull()).select(
                "walk_id", "start", F.lit(t - 1).alias("steps"), "path"
            )
        )
        key = F.concat_ws(
            SEP,
            F.col("cur"),
            F.col("w").cast("string"),
            F.lit(str(t)),
            F.lit(str(seed)),
        )
        stepped = (
            with_deg.where(F.col("d").isNotNull())
            .withColumn("choice", _h60(key) % F.col("d"))
            .join(
                adj.select(
                    F.col("src").alias("cur"),
                    F.col("idx").alias("choice"),
                    F.col("dst").alias("nxt"),
                ),
                ["cur", "choice"],
            )
            .select(
                "walk_id",
                "start",
                "w",
                F.col("nxt").alias("cur"),
                F.concat("path", F.array("nxt")).alias("path"),
            )
        )
        state = stepped.localCheckpoint(eager=True)

    finished.append(
        state.select("walk_id", "start", F.lit(walk_length).alias("steps"), "path")
    )
    out = finished[0]
    for f in finished[1:]:
        out = out.unionByName(f)
    return out.select(
        "walk_id",
        "start",
        F.col("steps").cast("int").alias("steps"),
        F.array_join("path", ">").alias("path_str"),
    )
