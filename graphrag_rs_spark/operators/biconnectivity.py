"""Bridges and articulation points (Tarjan lowlink, driver small path).

A bridge is an edge whose removal disconnects its component; an
articulation point is a vertex whose removal does. Both are the
classical robustness probes for a knowledge graph (which canonical
entity / which dependency edge is a single point of failure).

There is NO shuffle-parallel DFS: lowlink is inherently sequential, and
the published distributed alternatives (ear decomposition, 2-ECC by
repeated MSF contraction) are multi-phase algorithms far beyond what a
board-scale graph justifies. Following the repo's all-pairs-centrality
precedent (analytics.py suite guard), these operators run the exact
iterative Tarjan on the driver below ``collect_threshold`` edges and
REFUSE above it with scale-path guidance (hash-sparsify the edge set —
the board rows do exactly that — or contract to component quotients
first). The input is treated as a SIMPLE undirected graph: direction,
duplicate edges, and self-loops are normalized away.

Results are graph properties — independent of DFS visitation order —
so the driver path is deterministic by construction and the DuckDB
oracle can verify via the DEFINITION: per-edge (per-vertex) exclusion
reachability closures, not a lowlink replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _simple_undirected(edges: DataFrame):
    return (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )


def _collect_or_refuse(edges: DataFrame, collect_threshold: int, op: str):
    e = _simple_undirected(edges)
    n = e.limit(collect_threshold + 1).count()
    if n > collect_threshold:
        raise ValueError(
            f"{op}: {n}+ edges exceeds collect_threshold="
            f"{collect_threshold}. Lowlink DFS is inherently sequential; "
            "at scale, hash-sparsify the edge set or contract components "
            "first, then re-run on the quotient graph."
        )
    return [(r[0], r[1]) for r in e.collect()], edges.schema["src"].dataType


def _tarjan(edge_rows):
    """Iterative Tarjan → (bridges set[(u,v) canonical], aps set[id])."""
    adj: dict = {}
    for u, v in edge_rows:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    disc: dict = {}
    low: dict = {}
    bridges_out = set()
    aps = set()
    counter = 0
    for root in adj:
        if root in disc:
            continue
        root_children = 0
        disc[root] = low[root] = counter
        counter += 1
        # stack frames: (node, parent, iterator index)
        stack = [(root, None, iter(adj[root]))]
        parent_edge_skipped = {root: False}
        while stack:
            u, parent, it = stack[-1]
            advanced = False
            for w in it:
                if w == parent and not parent_edge_skipped.get(u, True):
                    # skip the tree edge back to the parent exactly once
                    # (simple graph: one undirected edge per pair)
                    parent_edge_skipped[u] = True
                    continue
                if w not in disc:
                    if u == root:
                        root_children += 1
                    disc[w] = low[w] = counter
                    counter += 1
                    parent_edge_skipped[w] = False
                    stack.append((w, u, iter(adj[w])))
                    advanced = True
                    break
                low[u] = min(low[u], disc[w])
            if not advanced:
                stack.pop()
                if parent is not None:
                    low[parent] = min(low[parent], low[u])
                    if low[u] > disc[parent]:
                        bridges_out.add(
                            (min(parent, u), max(parent, u))
                        )
                    if parent != root and low[u] >= disc[parent]:
                        aps.add(parent)
        if root_children >= 2:
            aps.add(root)
    return bridges_out, aps


def bridges(
    edges: DataFrame, *, collect_threshold: int = 500_000
) -> DataFrame:
    """edges(src, dst) → (src, dst) with src < dst: every edge whose
    removal disconnects its component (see module docstring for the
    driver-path contract)."""
    from pyspark.sql import types as T

    rows, id_type = _collect_or_refuse(edges, collect_threshold, "bridges")
    br, _ = _tarjan(rows)
    schema = T.StructType(
        [T.StructField("src", id_type), T.StructField("dst", id_type)]
    )
    return edges.sparkSession.createDataFrame(sorted(br), schema)


def articulation_points(
    edges: DataFrame, *, collect_threshold: int = 500_000
) -> DataFrame:
    """edges(src, dst) → (id): every vertex whose removal disconnects
    its component (see module docstring for the driver-path contract)."""
    from pyspark.sql import types as T

    rows, id_type = _collect_or_refuse(
        edges, collect_threshold, "articulation_points"
    )
    _, aps = _tarjan(rows)
    schema = T.StructType([T.StructField("id", id_type)])
    return edges.sparkSession.createDataFrame(
        [(a,) for a in sorted(aps)], schema
    )
