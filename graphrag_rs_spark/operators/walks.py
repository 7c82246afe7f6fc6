"""Deterministic random walks — graph → sequence corpus (DeepWalk-style).

Training pipelines turn graphs into token sequences for embedding models
(DeepWalk/node2vec); the reference has no walk surface (its graph module
stops at traversal/centrality), so this is a Spark-native extension in the
same spirit as streaming.py. The whole point at 100 TB is that walks are
data-parallel: every step is ONE equi-join of the walk frontier against
the indexed adjacency list — no per-walk Python loop, no collect.

Determinism: "randomness" is the engine-portable 60-bit sha256 prefix
family (same as simhash/minhash, operators/dedup.py:246): step t of the
walk identified by walk_id (= start#w) standing at node v picks index

    H(walk_id \\x1f v \\x1f t \\x1f seed) mod out_degree(v)

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
        # walk_id (start#w) is in the key so two walks that meet at the
        # same node at the same step diverge independently (round-4
        # ADVICE: omitting walk identity coalesced same-w walks forever
        # after a collision, shrinking corpus diversity on hub graphs).
        key = F.concat_ws(
            SEP,
            F.col("walk_id"),
            F.col("cur"),
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


def node2vec_walks(
    edges: DataFrame,
    *,
    walk_length: int = 5,
    walks_per_node: int = 2,
    seed: int = 42,
    w_return: int = 1,
    w_near: int = 1,
    w_far: int = 2,
) -> DataFrame:
    """node2vec-style 2nd-order biased walks → (walk_id, start, steps,
    path_str).

    Standing at ``cur`` having arrived from ``prev``, each out-neighbor
    d is weighted w_return (d == prev — the 1/p "go back" term),
    w_near (d adjacent to prev — the distance-1 term) or w_far
    (otherwise — the 1/q exploration term); the first hop is uniform.
    Weights are INTEGERS (node2vec's 1/p, 1, 1/q scaled to a common
    denominator) so the draw — H(walk_id␟cur␟t␟seed) mod Σweights landing in a
    candidate's cumulative range, candidates ordered by dst — is
    integer-exact and replayable on any engine with sha256 (the DuckDB
    oracle unrolls the steps).

    Scale shape vs the uniform walker: one extra LEFT equi-join per step
    (candidate (prev, dst) against the adjacency list for the nearness
    test) and a cumulative-sum window bounded by out-degree(cur) per
    walk. Still zero per-walk Python; lineage cut per step.
    """
    e = edges.select("src", "dst").distinct()
    adj = e.localCheckpoint(eager=True)

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
            F.lit(None).cast("string").alias("prev"),
            F.array("start").alias("path"),
        )
        .localCheckpoint(eager=True)
    )
    finished = []

    for t in range(1, walk_length + 1):
        cand = state.join(
            adj.select(F.col("src").alias("cur"), F.col("dst").alias("nxt")),
            "cur",
            "left",
        )
        finished.append(
            cand.where(F.col("nxt").isNull()).select(
                "walk_id", "start", F.lit(t - 1).alias("steps"), "path"
            ).distinct()
        )
        cand = cand.where(F.col("nxt").isNotNull())
        near = adj.select(
            F.col("src").alias("prev"), F.col("dst").alias("nxt"),
            F.lit(True).alias("_adj"),
        )
        cand = cand.join(near, ["prev", "nxt"], "left").withColumn(
            "_wt",
            F.when(F.col("prev").isNull(), F.lit(1))
            .when(F.col("nxt") == F.col("prev"), F.lit(int(w_return)))
            .when(F.col("_adj"), F.lit(int(w_near)))
            .otherwise(F.lit(int(w_far)))
            .cast("long"),
        )
        win = Window.partitionBy("walk_id").orderBy("nxt")
        cum = cand.select(
            "walk_id", "start", "w", "cur", "nxt", "path",
            F.sum("_wt").over(
                win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).alias("_hi"),
            F.col("_wt"),
            F.sum("_wt").over(
                win.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("_tot"),
        )
        # walk identity in the key — see random_walks; same ADVICE fix.
        key = F.concat_ws(
            SEP,
            F.col("walk_id"),
            F.col("cur"),
            F.lit(str(t)),
            F.lit(str(seed)),
        )
        pick = _h60(key) % F.col("_tot")
        stepped = cum.where(
            (pick >= F.col("_hi") - F.col("_wt")) & (pick < F.col("_hi"))
        ).select(
            "walk_id",
            "start",
            "w",
            F.col("nxt").alias("cur"),
            F.col("cur").alias("prev"),
            F.concat("path", F.array("nxt")).alias("path"),
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


def skipgram_pairs(
    walks: DataFrame,
    *,
    window: int = 2,
    path_col: str = "path_str",
) -> DataFrame:
    """Walk corpus → skip-gram co-occurrence counts (word2vec-style input).

    DeepWalk/node2vec training consumes (center, context) pairs with
    |position delta| <= window; this derives the aggregated pair counts
    directly from the walk table emitted by :func:`random_walks` /
    :func:`node2vec_walks`.

    Spark shape: pair generation is INTRA-ROW — a nested
    ``transform``/``filter``/``flatten`` over the split path array, fully
    inside whole-stage codegen (no self-join on walk_id, no UDF). A walk
    of length L yields <= L*2w structs in the same task that read the
    row, so the only shuffle is the final (center, context) groupBy,
    which partial-aggregates map-side. At 100 TB of walks this is one
    scan + one agg shuffle of the (already tiny) distinct-pair space.
    """
    arr = F.split(F.col(path_col), ">")
    pairs = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.filter(
                F.transform(
                    arr,
                    lambda y, j: F.struct(
                        x.alias("center"),
                        y.alias("context"),
                        (i - j).alias("d"),
                    ),
                ),
                lambda s: (s["d"] != 0)
                & (F.abs(s["d"]) <= F.lit(window)),
            ),
        )
    )
    return (
        walks.select(F.explode(pairs).alias("p"))
        .select(F.col("p.center").alias("center"), F.col("p.context").alias("context"))
        .groupBy("center", "context")
        .agg(F.count("*").alias("pair_count"))
    )
