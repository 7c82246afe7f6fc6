"""Greedy k-center seeding (Gonzalez farthest-first traversal).

The classic 2-approximation for k-center: start from a deterministic
seed, repeatedly add the node FARTHEST from the current center set
(hop metric here), then assign every node to its nearest center.
This is the seeding step of distributed clustering (k-means‖-style
pipelines) expressed on a graph.

Scale shape: each round is one incremental BFS from the newly added
center merged into the running (dist, center) minimum — the k rounds
cost k bounded BFS passes, not k full multi-source recomputes.  The
reach frame doubles as the visited set (one anti-join per hop, no
separate ``vis``), and lineage is cut every ``cut_every`` hops rather
than every hop, so a hop costs one shuffle join + one partial-agg
groupBy.  The farthest pick is a global argmax: unreached nodes (∞)
win first, ties break toward the smaller node id, so the traversal is
fully deterministic and replayable.  Only the k center ids ever reach
the driver.

Below ``collect_threshold`` edges the graph is solved exactly on the
driver with the identical tie rules (the same guarded small-path
pattern as ``scc.tarjan`` / the analytics suite): a 120-node board
fixture should not pay 40 Spark jobs of scheduling latency.  A pytest
asserts both paths are row-identical on the same graph.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.iterutil import cut_lineage

_INF = 1 << 60


def _greedy_local(adj: dict, k: int) -> list[tuple]:
    """Driver-side exact replay: identical seed/tie/merge rules as the
    distributed path.  Returns [(id, center, dist)] for reached nodes."""
    if not adj:
        return []
    best: dict = {}  # id -> (dist, center), min by tuple
    center = min(adj)
    for rnd in range(k):
        # BFS from the new center
        dist = {center: 0}
        dq = deque([center])
        while dq:
            cur = dq.popleft()
            for nb in adj[cur]:
                if nb not in dist:
                    dist[nb] = dist[cur] + 1
                    dq.append(nb)
        for node, d in dist.items():
            cand = (d, center)
            if node not in best or cand < best[node]:
                best[node] = cand
        if rnd == k - 1:
            break
        far = min(
            adj,
            key=lambda n: (-(best[n][0] if n in best else _INF), n),
        )
        if far == center or (far in best and best[far][0] == 0):
            break
        center = far
    return [(n, c, d) for n, (d, c) in best.items()]


def greedy_k_center(
    edges: DataFrame,
    *,
    k: int = 8,
    max_hops: int = 30,
    cut_every: int = 4,
    collect_threshold: int = 500_000,
) -> DataFrame:
    """edges(src, dst) undirected → (id, center, dist long): every node
    reachable from at least one chosen center, assigned to its nearest
    center (ties toward the smaller center id).  The first center is
    the minimum node id; each next is the farthest node (unreached
    first, then max hop distance, ties toward the smaller id)."""
    spark = edges.sparkSession
    out_schema = "id string, center string, dist long"
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    sym = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
    )
    # probe and collect fused into one action (the separate count re-ran
    # the edge derivation once more before collecting)
    sym_rows = sym.limit(collect_threshold + 1).collect()
    n_edges = len(sym_rows)
    if n_edges == 0:
        return spark.createDataFrame([], out_schema)
    if n_edges <= collect_threshold:
        adj: dict = {}
        for r in sym_rows:
            adj.setdefault(r["src"], []).append(r["dst"])
        rows = _greedy_local(adj, k)
        return spark.createDataFrame(rows, out_schema)

    sym = cut_lineage(sym, tag="kcenter")
    nodes = sym.select(F.col("src").alias("id")).distinct()
    nodes = cut_lineage(nodes, tag="kcenter")
    center = nodes.agg(F.min("id")).collect()[0][0]
    best = None
    for rnd in range(k):
        # incremental BFS from the new center only; reach is also the
        # visited set (dist is final the first time a node is reached)
        reach = spark.createDataFrame(
            [(center, 0)], "id string, dist long"
        )
        frontier = reach
        for hop in range(1, max_hops + 1):
            nxt = (
                frontier.join(sym.withColumnRenamed("src", "id"), "id")
                .select(
                    F.col("dst").alias("id"),
                    (F.col("dist") + 1).alias("dist"),
                )
                .groupBy("id")
                .agg(F.min("dist").alias("dist"))
                .join(reach, "id", "left_anti")
            )
            if nxt.isEmpty():
                break
            reach = reach.unionByName(nxt)
            frontier = nxt
            if hop % cut_every == 0:
                reach = cut_lineage(reach, tag="kcenter")
                frontier = reach.where(F.col("dist") == hop)
        labeled = reach.select(
            "id", F.lit(center).alias("center"), "dist"
        )
        merged = (
            labeled
            if best is None
            else best.unionByName(labeled)
            .groupBy("id")
            .agg(F.min(F.struct("dist", "center")).alias("b"))
            .select(
                "id",
                F.col("b.center").alias("center"),
                F.col("b.dist").alias("dist"),
            )
        )
        best = cut_lineage(merged, tag="kcenter")
        if rnd == k - 1:
            break
        # farthest-first pick: unreached (∞) first, then max dist;
        # ties toward the smaller id
        cand = (
            nodes.join(best.select("id", "dist"), "id", "left")
            .select(
                "id", F.coalesce("dist", F.lit(_INF)).alias("score")
            )
            .orderBy(F.col("score").desc(), F.col("id").asc())
            .limit(1)
            .collect()
        )
        nxt_center = cand[0]["id"]
        if nxt_center == center or cand[0]["score"] == 0:
            break  # everything is a center already
        center = nxt_center
    return best.select("id", "center", F.col("dist").cast("long"))
