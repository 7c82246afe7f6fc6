"""G7 remainder: graph analytics — centrality, shortest path, density,
clustering coefficient.

Reference: graph/analytics.rs:182-486. Transcribed semantics:

- degree centrality       = degree / (n − 1)                    (:209-217)
- closeness               = reachable / Σ shortest-path weight  (:250-279)
- betweenness (simplified)= pairs (s,t), s≠t≠v, whose SINGLE
  shortest path contains v, normalized by (n−1)(n−2)/2          (:219-248)
  — the reference picks its Dijkstra current node and the s/t
  iteration order from HashSet/HashMap iteration, so its own
  betweenness/closeness are NONDETERMINISTIC on tie-heavy graphs;
  here every tie breaks by (distance, path) lexicographic order —
  deterministic, and equal to the reference whenever ties are absent;
- shortest_path (Dijkstra)= minimal summed edge weight          (:281-355)
- density                 = 2m / n(n−1)                         (:432-443)
- clustering coefficient  = avg over nodes with ≥2 neighbors of
  ordered-triangle-count / k(k−1)                               (:448-478)

Scale shape: degree/density/top-k/clustering are plain distributed
aggregations (clustering's wedge join is quadratic in hub degree — the
``max_degree`` knob excludes hubs explicitly rather than silently
exploding). Shortest path is iterative frontier relaxation
(Bellman–Ford shape — one join + one min-agg per round, lineage cut per
round, converges in ≤ |V|−1 rounds with positive weights and is bounded
by ``max_hops``). The all-pairs centrality suite is inherently
O(n · SSSP) — the reference itself is in-memory O(n²·Dijkstra) — so it
runs driver-side under the same small-graph guard pattern as
communities/CC, and REFUSES above the cap instead of melting.
"""

from __future__ import annotations

import heapq

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphrag_rs_spark.iterutil import cut_lineage


from graphrag_rs_spark.iterutil import both_dirs as _both_dirs


def _sym(edges: DataFrame) -> DataFrame:
    e = edges.select("src", "dst", F.col("weight").cast("double").alias("weight")).where(
        F.col("src") != F.col("dst")
    )
    return (
        _both_dirs(e, "weight")
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
    )


def degree_centrality(edges: DataFrame) -> DataFrame:
    """→ (id, degree, degree_centrality = degree/(n−1)) — distributed."""
    sym = _sym(edges)
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree"))
    n = deg.count()
    denom = float(n - 1) if n > 1 else 1.0
    return deg.select(
        "id",
        "degree",
        (F.col("degree") / F.lit(denom) if n > 1 else F.lit(0.0)).alias(
            "degree_centrality"
        ),
    )


def top_degree_nodes(edges: DataFrame, top_k: int = 10) -> DataFrame:
    """(:412-427) — ties broken by id ascending (the reference's sort is
    tie-unstable)."""
    return (
        degree_centrality(edges)
        .orderBy(F.col("degree_centrality").desc(), F.col("id").asc())
        .limit(top_k)
    )


def graph_density(edges: DataFrame) -> DataFrame:
    """→ one row (n_nodes, n_edges, density = 2m/n(n−1))."""
    sym = _sym(edges)
    stats = sym.agg(
        F.countDistinct("src").alias("n_nodes"),
        (F.count("*") / 2).cast("long").alias("n_edges"),
    )
    return stats.select(
        "n_nodes",
        "n_edges",
        F.when(
            F.col("n_nodes") > 1,
            2.0 * F.col("n_edges") / (F.col("n_nodes") * (F.col("n_nodes") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("density"),
    )


def clustering_coefficients(
    edges: DataFrame, *, max_degree: int = 1000
) -> DataFrame:
    """→ (id, k, triangles, coefficient) for nodes with ≥2 neighbors.

    Wedge join is O(k²) per node: nodes above ``max_degree`` are EXCLUDED
    (reported with null coefficient) rather than silently exploding the
    shuffle — raise the knob deliberately for hub-heavy graphs."""
    # materialized once: deg, adj and the closing join all read it
    sym = _sym(edges).select("src", "dst").localCheckpoint(eager=True)
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("k"))
    ok = deg.where((F.col("k") >= 2) & (F.col("k") <= max_degree))
    adj = sym.join(ok.select(F.col("id").alias("src")), "src")
    a = adj.select(F.col("src").alias("v"), F.col("dst").alias("n1"))
    b = adj.select(F.col("src").alias("v"), F.col("dst").alias("n2"))
    wedges = a.join(b, "v").where(F.col("n1") != F.col("n2"))
    closed = wedges.join(
        sym.select(F.col("src").alias("n1"), F.col("dst").alias("n2")), ["n1", "n2"]
    )
    tri = closed.groupBy(F.col("v").alias("id")).agg(F.count("*").alias("triangles"))
    return (
        deg.where(F.col("k") >= 2)
        .join(tri, "id", "left")
        .select(
            "id",
            "k",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.when(
                F.col("k") <= max_degree,
                F.coalesce("triangles", F.lit(0))
                / (F.col("k") * (F.col("k") - 1)).cast("double"),
            ).alias("coefficient"),
        )
    )


def avg_clustering_coefficient(edges: DataFrame, *, max_degree: int = 1000) -> float:
    row = (
        clustering_coefficients(edges, max_degree=max_degree)
        .agg(F.avg("coefficient").alias("c"))
        .collect()[0]
    )
    return float(row["c"] or 0.0)


def shortest_path(
    edges: DataFrame,
    source: str,
    target: str,
    *,
    max_hops: int = 30,
) -> DataFrame:
    """Weighted shortest path source→target (:281-355) → one row
    (path: array<string>, weight) or zero rows if unreachable.

    Distributed Bellman–Ford frontier: each round relaxes every improved
    node's out-edges (one join + one min-agg, lineage cut). Positive
    weights converge in ≤ |V|−1 rounds; ``max_hops`` bounds the loop.
    Ties break by lexicographic path (the reference's Dijkstra breaks
    them by HashSet iteration order — nondeterministic there)."""
    sym = _sym(edges).localCheckpoint(eager=True)
    spark = edges.sparkSession
    best = spark.createDataFrame(
        [(source, 0.0, [source])], "id string, dist double, path array<string>"
    ).localCheckpoint(eager=True)
    frontier = best

    for _ in range(max_hops):
        relax = (
            frontier.join(sym.withColumnRenamed("src", "id"), "id")
            .where(~F.array_contains("path", F.col("dst")))
            .select(
                F.col("dst").alias("id"),
                (F.col("dist") + F.col("weight")).alias("dist"),
                F.concat("path", F.array("dst")).alias("path"),
            )
        )
        merged = (
            best.unionByName(relax)
            .groupBy("id")
            .agg(F.min(F.struct("dist", "path")).alias("b"))
            .select("id", F.col("b.dist").alias("dist"), F.col("b.path").alias("path"))
        )
        merged = cut_lineage(merged, tag="sssp")
        improved = (
            merged.alias("m")
            .join(best.alias("o"), "id", "left")
            .where(
                F.col("o.dist").isNull() | (F.col("m.dist") < F.col("o.dist"))
            )
            .select("id", F.col("m.dist").alias("dist"), F.col("m.path").alias("path"))
        ).localCheckpoint(eager=True)
        best = merged
        if improved.limit(1).count() == 0:
            break
        frontier = improved

    return best.where(F.col("id") == target).select("path", F.col("dist").alias("weight"))


CENTRALITY_MAX_NODES = 20_000


def centrality_scores(edges: DataFrame, *, max_nodes: int = CENTRALITY_MAX_NODES) -> DataFrame:
    """→ (id, degree, betweenness, closeness): the reference's exact
    all-pairs suite (:182-279). All-pairs SSSP is inherently O(n·SSSP) —
    the reference is in-memory O(n²·Dijkstra) — so this runs driver-side
    under the small-graph guard pattern and REFUSES above ``max_nodes``
    (use degree_centrality / sampled estimates at scale). Deterministic:
    all Dijkstra ties break by (distance, path)."""
    sym = _sym(edges)
    n_probe = sym.select("src").distinct().limit(max_nodes + 1).count()
    if n_probe > max_nodes:
        raise ValueError(
            f"centrality_scores: graph has more than {max_nodes} nodes - "
            "the all-pairs suite is O(n^2 log n) by definition (the "
            "reference's own shape). Use degree_centrality (distributed) "
            "or sampled_centrality (distributed k-source pivot estimate)."
        )
    rows = sym.collect()
    adj: dict[str, list[tuple[str, float]]] = {}
    for r in rows:
        adj.setdefault(r["src"], []).append((r["dst"], float(r["weight"])))
    nodes = sorted(adj)
    n = len(nodes)

    def dijkstra(start: str) -> dict[str, tuple[float, tuple[str, ...]]]:
        out: dict[str, tuple[float, tuple[str, ...]]] = {}
        heap: list[tuple[float, tuple[str, ...]]] = [(0.0, (start,))]
        while heap:
            dist, path = heapq.heappop(heap)
            node = path[-1]
            if node in out:
                continue
            out[node] = (dist, path)
            for nb, w in sorted(adj.get(node, ())):
                if nb not in out:
                    heapq.heappush(heap, (dist + w, path + (nb,)))
        return out

    sssp = {v: dijkstra(v) for v in nodes}
    results = []
    for v in nodes:
        deg = len(adj[v]) / (n - 1) if n > 1 else 0.0
        reach = [
            (d, p) for t, (d, p) in sssp[v].items() if t != v
        ]
        total = sum(d for d, _p in reach)
        closeness = len(reach) / total if reach and total > 0 else 0.0
        betweenness = 0.0
        for s in nodes:
            if s == v:
                continue
            for t, (_d, p) in sssp[s].items():
                if t in (v, s):
                    continue
                if v in p:
                    betweenness += 1.0
        if n > 2:
            betweenness /= (n - 1) * (n - 2) / 2
        else:
            betweenness = 0.0
        results.append((v, float(deg), float(betweenness), float(closeness)))

    return edges.sparkSession.createDataFrame(
        results, "id string, degree double, betweenness double, closeness double"
    )


def _sampled_centrality_local(
    spark, sym_rows, k, seed, max_hops, id_type
) -> DataFrame:
    """Driver replay of the distributed k-pivot estimator, bit-identical:
    same xxhash64 pivot pick (one LocalRelation mini-job — xxhash64 has
    no Python twin), same (dist, path) lexicographic relaxation with the
    subtle frontier rule (a same-dist better-path merge updates `best`
    but does NOT re-enter the frontier — the distributed `improved`
    filter compares dist only), same betweenness/closeness formulas."""
    from pyspark.sql.types import StructField, StructType

    adj: dict = {}
    for r in sym_rows:
        adj.setdefault(r["src"], []).append((r["dst"], float(r["weight"])))
    nodes = sorted(adj)
    n = len(nodes)
    ndf = spark.createDataFrame(
        [(v,) for v in nodes], StructType([StructField("src", id_type)])
    )
    pivots = [
        r[0]
        for r in ndf.orderBy(F.xxhash64("src", F.lit(seed)), F.col("src"))
        .limit(k)
        .collect()
    ]
    best: dict = {(p, p): (0.0, (p,)) for p in pivots}
    frontier = dict(best)
    for _ in range(max_hops):
        relax: dict = {}
        for (p, u), (d, path) in frontier.items():
            for dst, w in adj.get(u, ()):
                if dst in path:
                    continue
                cand = (d + w, path + (dst,))
                key = (p, dst)
                cur = relax.get(key)
                if cur is None or cand < cur:
                    relax[key] = cand
        improved: dict = {}
        for key, cand in relax.items():
            cur = best.get(key)
            if cur is None:
                best[key] = cand
                improved[key] = cand
            elif cand < cur:
                best[key] = cand
                if cand[0] < cur[0]:
                    improved[key] = cand
        if not improved:
            break
        frontier = improved

    k_eff = len(pivots)
    norm = (n - 1) * (n - 2) / 2 if n > 2 else 1.0
    bet_cnt: dict = {}
    clo_cnt: dict = {}
    clo_sum: dict = {}
    for (p, v), (d, path) in best.items():
        if v == p:
            continue
        for interior in path[1:-1]:
            bet_cnt[interior] = bet_cnt.get(interior, 0) + 1
        clo_cnt[v] = clo_cnt.get(v, 0) + 1
        clo_sum[v] = clo_sum.get(v, 0.0) + d
    out = []
    for v in nodes:
        deg = len(adj[v]) / max(n - 1, 1)
        bet = (
            bet_cnt[v] * (float(n) / k_eff) / norm if v in bet_cnt else 0.0
        )
        sd = clo_sum.get(v, 0.0)
        clo = (clo_cnt[v] / sd) if v in clo_cnt and sd > 0 else 0.0
        out.append((v, float(deg), float(bet), float(clo)))
    from pyspark.sql.types import DoubleType

    schema = StructType(
        [
            StructField("id", id_type),
            StructField("degree", DoubleType()),
            StructField("betweenness", DoubleType()),
            StructField("closeness", DoubleType()),
        ]
    )
    return spark.createDataFrame(out, schema)


def sampled_centrality(
    edges: DataFrame,
    *,
    k: int = 64,
    seed: int = 42,
    max_hops: int = 30,
    collect_threshold: int = 500_000,
) -> DataFrame:
    """→ (id, degree, betweenness, closeness): the DISTRIBUTED pivot-
    sampled estimator the exact suite's guard points to — k-source
    Brandes-style sampling (Brandes & Pich 2007, "Centrality Estimation
    in Large Networks") adapted to the reference's single-path
    betweenness semantics (analytics.rs:219-248 counts v on THE chosen
    shortest path per ordered pair, not the σ-weighted path count).

    - pivots: k nodes chosen by xxhash64(id, seed) order — deterministic,
      uniform-ish, no RNG state anywhere;
    - one multi-source frontier relaxation computes all k shortest-path
      TREES at once (same (dist, path) lexicographic tie-break as the
      exact kernel's Dijkstra, so with k = n the estimate EQUALS the
      exact suite's output — pinned by tests);
    - betweenness(v) ≈ (n/k) · #{(s,t): s ∈ pivots, v interior of
      path(s,t)} / ((n−1)(n−2)/2)   [the n/k factor unbiases the
      sampled source sum; with k = n it is exactly the full sum];
    - closeness(v) ≈ reached_pivots / Σ_p dist(p, v) — the exact
      formula's reachable/Σd ratio evaluated on the pivot sample
      (distances symmetric: the suite operates on the symmetrized
      graph);
    - degree is exact (one distributed aggregation).

    Cost: O(k · |V|) state rows, diameter-bounded rounds — linear in the
    graph, executor-side throughout; no driver collect (above the small-
    graph bound; below it, the identical round recurrence replays
    driver-side — each distributed round costs ~3 actions of fixed
    scheduling, ~20 s for a 120-node board graph; parity pinned by
    tests/test_analytics.py's small-vs-distributed equality).
    """
    spark = edges.sparkSession
    sym_df = _sym(edges)
    if collect_threshold:
        probe_rows = sym_df.limit(collect_threshold + 1).collect()
        n_edges = len(probe_rows)
        # work bound like the sibling small paths (_multi_bfs 5M,
        # weighted_sssp 20M): the Python replay is O(k·E·rounds) with
        # per-(pivot, node) path tuples — an edge count alone would admit
        # hours of driver arithmetic on a large-but-collectable graph
        if (
            n_edges <= collect_threshold
            and k * max(1, n_edges) * max(1, max_hops) <= 20_000_000
        ):
            return _sampled_centrality_local(
                spark, probe_rows, k, seed, max_hops,
                edges.schema["src"].dataType,
            )
    sym = sym_df.localCheckpoint(eager=True)

    nodes = sym.select("src").distinct()
    n = nodes.count()
    pivots = (
        nodes.orderBy(F.xxhash64("src", F.lit(seed)), F.col("src"))
        .limit(k)
        .select(F.col("src").alias("pivot"))
    )

    best = pivots.select(
        "pivot",
        F.col("pivot").alias("id"),
        F.lit(0.0).alias("dist"),
        F.array("pivot").alias("path"),
    ).localCheckpoint(eager=True)
    frontier = best
    for _ in range(max_hops):
        relax = (
            frontier.join(sym.withColumnRenamed("src", "id"), "id")
            .where(~F.array_contains("path", F.col("dst")))
            .select(
                "pivot",
                F.col("dst").alias("id"),
                (F.col("dist") + F.col("weight")).alias("dist"),
                F.concat("path", F.array("dst")).alias("path"),
            )
        )
        merged = (
            best.unionByName(relax)
            .groupBy("pivot", "id")
            .agg(F.min(F.struct("dist", "path")).alias("b"))
            .select(
                "pivot", "id",
                F.col("b.dist").alias("dist"), F.col("b.path").alias("path"),
            )
        )
        merged = cut_lineage(merged, tag="sampled-centrality")
        improved = (
            merged.alias("m")
            .join(best.alias("o"), ["pivot", "id"], "left")
            .where(F.col("o.dist").isNull() | (F.col("m.dist") < F.col("o.dist")))
            .select(
                "pivot", "id",
                F.col("m.dist").alias("dist"), F.col("m.path").alias("path"),
            )
        ).localCheckpoint(eager=True)
        best = merged
        if improved.limit(1).count() == 0:
            break
        frontier = improved

    # betweenness: explode interior nodes of every pivot-rooted path
    interior = best.where(F.col("id") != F.col("pivot")).select(
        F.explode(F.slice("path", 2, F.greatest(F.size("path") - 2, F.lit(0)))).alias("id")
    )
    k_eff = pivots.count()  # k may exceed |V|
    norm = (n - 1) * (n - 2) / 2 if n > 2 else 1.0
    bet = interior.groupBy("id").agg(
        (F.count("*") * (float(n) / k_eff) / norm).alias("betweenness")
    )

    # closeness: pivot-sample of reachable/Σd (self excluded)
    clo = (
        best.where(F.col("id") != F.col("pivot"))
        .groupBy("id")
        .agg(
            (F.count("*") / F.sum("dist")).alias("closeness_raw"),
            F.sum("dist").alias("_sd"),
        )
        .select(
            "id",
            F.when(F.col("_sd") > 0, F.col("closeness_raw")).otherwise(0.0).alias("closeness"),
        )
    )

    deg = sym.groupBy("src").agg(
        (F.count("*") / F.lit(max(n - 1, 1))).alias("degree")
    ).withColumnRenamed("src", "id")

    return (
        deg.join(bet, "id", "left")
        .join(clo, "id", "left")
        .select(
            "id",
            F.col("degree").cast("double"),
            F.coalesce("betweenness", F.lit(0.0)).cast("double").alias("betweenness"),
            F.coalesce("closeness", F.lit(0.0)).cast("double").alias("closeness"),
        )
    )


def cc_communities_with_modularity(edges: DataFrame) -> DataFrame:
    """The analytics CC community fallback (:97-180) →
    (community, n_nodes, modularity).

    Communities are connected components (min-member-id label, shared CC
    kernel); each is scored by the reference's 'modularity' =
    internal-directed-edge-count / (2 · total) where the reference's
    ``total_edges = self.adjacency.len()`` is actually the NODE count —
    a quirk preserved verbatim. Within a connected component every edge
    is internal, so the numerator is just the component's symmetric edge
    count."""
    from graphrag_rs_spark.operators.cc import connected_components

    # materialized once: CC and the internal-edge count both read it
    sym = _sym(edges).select("src", "dst").localCheckpoint(eager=True)
    comp = connected_components(sym)
    n_total = comp.count()
    edge_counts = (
        sym.join(comp.withColumnRenamed("id", "src"), "src")
        .groupBy("component")
        .agg(F.count("*").alias("internal_directed"))
    )
    sizes = comp.groupBy("component").agg(F.count("*").alias("n_nodes"))
    return sizes.join(edge_counts, "component", "left").select(
        F.col("component").alias("community"),
        "n_nodes",
        (
            F.coalesce("internal_directed", F.lit(0))
            / F.lit(2.0 * max(n_total, 1))
        ).alias("modularity"),
    )


# ------------------------------------------------- scalable graph extras --

def _sym_unweighted(edges: DataFrame) -> DataFrame:
    """Distinct symmetric (src, dst) pairs, self-loops dropped. Accepts
    edge frames with or without a weight column."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    return _both_dirs(e).distinct()


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Exact per-node triangle counts via degree-ordered orientation.

    The clustering-coefficient wedge join above is O(k²) per node and
    counts each triangle 6× (once per node per wedge direction); this is
    the scale version: orient every undirected edge from its
    (degree, id)-smaller endpoint to the larger, join oriented edges on
    their common source, and close each wedge against the oriented edge
    set.  Every triangle is materialized exactly once, and out-degree
    under degree orientation is O(√m) on any graph — the wedge fan-out a
    hub would otherwise explode into is provably bounded, so no
    ``max_degree`` exclusion knob is needed.  Three shuffles total
    (degree agg, wedge join, closing join); ships only (id, id) pairs.

    → (id, triangles) for nodes in ≥1 triangle.
    """
    # materialized once: deg and the orientation both read sym, and the
    # oriented frame feeds three join sides (both wedge sides + closing)
    sym = _sym_unweighted(edges).localCheckpoint(eager=True)
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("_deg"))
    with_keys = (
        sym.join(deg.select(F.col("id").alias("src"), F.col("_deg").alias("_ks")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("_deg").alias("_kd")), "dst")
    )
    oriented = with_keys.where(
        F.struct(F.col("_ks"), F.col("src")) < F.struct(F.col("_kd"), F.col("dst"))
    ).select(
        "src", "dst", F.struct(F.col("_kd"), F.col("dst")).alias("_key")
    ).localCheckpoint(eager=True)
    a = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"), F.col("_key").alias("_kv"))
    b = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"), F.col("_key").alias("_kw"))
    wedges = a.join(b, "u").where(F.col("_kv") < F.col("_kw")).select("u", "v", "w")
    closing = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tris = wedges.join(closing, ["v", "w"])  # one row per triangle
    members = (
        tris.select(F.col("u").alias("id"))
        .union(tris.select(F.col("v").alias("id")))
        .union(tris.select(F.col("w").alias("id")))
    )
    return members.groupBy("id").agg(F.count("*").alias("triangles"))


def k_core(edges: DataFrame, k: int, max_iter: int = 100) -> DataFrame:
    """k-core decomposition by simultaneous peeling: repeatedly remove
    every node with degree < k until the graph is stable.

    Each round is one degree aggregation plus two semi-joins (filter both
    endpoints), lineage-cut per round; rounds needed = the peel depth of
    the graph (typically small), each a constant number of shuffles over
    a strictly shrinking edge set.  Convergence is detected by node
    count, which the degree frame already materializes — no extra scan.

    → (id, core_degree) for nodes in the k-core, where core_degree is the
    node's degree WITHIN the core (≥ k by construction).
    """
    cur = _sym_unweighted(edges).localCheckpoint(eager=True)
    prev_nodes = -1
    for _ in range(max_iter):
        deg = cur.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("core_degree"))
        keep = deg.where(F.col("core_degree") >= k).persist()
        n = keep.count()
        if n == 0:
            keep.unpersist()
            return deg.where(F.lit(False))  # empty, correct schema
        if n == prev_nodes:
            keep.unpersist()
            return deg.where(F.col("core_degree") >= k)
        prev_nodes = n
        cur = (
            cur.join(keep.select(F.col("id").alias("src")), "src", "left_semi")
            .join(keep.select(F.col("id").alias("dst")), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        keep.unpersist()
    # same contract as scc/topological_layers: never hand back a
    # possibly-unconverged result as if it were the fixpoint
    raise RuntimeError(
        f"k_core did not converge within max_iter={max_iter} rounds; "
        "raise max_iter (rounds needed = the graph's peel depth)"
    )


def _hits_local(
    spark, edge_rows: list, id_type, max_iterations: int
) -> DataFrame:
    """Driver replica of the HITS rounds for graphs under the collect
    threshold (guarded small-path pattern). Float sums run in sorted
    edge order — associativity differences vs the distributed partition
    order are far below the 6-dp rounding every consumer applies (the
    distributed path itself already sums in nondeterministic partition
    order against the same fixed-order oracle, so order-robustness at
    that precision is the status quo, not a new assumption). Join
    semantics mirrored exactly: auth supports only in-edge nodes, hub
    only out-edge nodes after round 1, absent scores contribute 0, and
    empty half-steps normalize by 1.0."""
    import math

    from pyspark.sql import types as T

    e = sorted(set(edge_rows))
    verts = sorted({x for ed in e for x in ed})
    hub = {v: 1.0 for v in verts}
    auth: dict = {}
    for _ in range(max_iterations):
        auth_raw: dict = {}
        for u, v in e:
            if u in hub:
                auth_raw[v] = auth_raw.get(v, 0.0) + hub[u]
        a_norm = (
            math.sqrt(sum(x * x for x in auth_raw.values()))
            if auth_raw
            else 1.0
        )
        auth = {v: x / a_norm for v, x in auth_raw.items()}
        hub_raw: dict = {}
        for u, v in e:
            if v in auth:
                hub_raw[u] = hub_raw.get(u, 0.0) + auth[v]
        h_norm = (
            math.sqrt(sum(x * x for x in hub_raw.values()))
            if hub_raw
            else 1.0
        )
        hub = {u: x / h_norm for u, x in hub_raw.items()}
    schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("hub", T.DoubleType()),
            T.StructField("authority", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(
        [(v, hub.get(v, 0.0), auth.get(v, 0.0)) for v in verts], schema
    )


def hits(
    edges: DataFrame,
    *,
    max_iterations: int = 10,
    cut_every: int = 1,
    collect_threshold: int = 200_000,
) -> DataFrame:
    """HITS hubs/authorities (Kleinberg) over a DIRECTED edge list →
    (id, hub, authority).

    The reference ships degree/PageRank-family importance scores
    (graph/pagerank.rs, graph/analytics.rs); HITS rounds out the same
    importance toolbox for the KG with the mutually-recursive pair:

        auth(v) ∝ Σ_{u→v} hub(u)      hub(u) ∝ Σ_{u→v} auth(v)

    L2-normalized after every half-step, fixed ``max_iterations`` rounds
    so a DuckDB oracle can unroll the identical math (same protocol as
    the fixed-iteration PageRank oracle).

    Scale shape: per iteration, two join+groupBy jobs over the edge list
    (shuffled on dst then src — the same keys every round, so AQE reuses
    exchange partitioning) and two 1-row L2-norm aggregates folded in as
    broadcast crossJoins. State is (id, score) — never materializes
    anything edge-sized beyond the input. Lineage cut per round.

    Below ``collect_threshold`` edges the rounds run on the driver
    (:func:`_hits_local`): the distributed loop pays ~6 scheduled jobs
    per iteration of pure latency at board scale. ``cut_every`` default
    is 1 — measured faster than 2 on the distributed path (each uncut
    round re-executes the previous round's plan for every reference;
    same finding as the eigenvector operator).
    """
    # probe and collect fused into one action
    probe_rows = edges.select("src", "dst").limit(collect_threshold + 1).collect()
    if len(probe_rows) <= collect_threshold:
        return _hits_local(
            edges.sparkSession,
            [(r[0], r[1]) for r in probe_rows],
            edges.schema["src"].dataType,
            max_iterations,
        )
    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)

    hub = verts.select("id", F.lit(1.0).alias("hub"))
    auth = None
    for i in range(max_iterations):
        # one lineage cut per ``cut_every`` rounds, always on the LAST
        # round (auth must be cut too so the final join reads both sides
        # from a scan): the per-round plan adds 2 joins + 2 aggs, so a
        # 2-round stride keeps planning linear while halving the
        # materialization count — the cuts are the dominant fixed cost on
        # small graphs (each is a parquet write+read job)
        cut = (i + 1) % max(1, cut_every) == 0 or i == max_iterations - 1
        # auth half-step: sum hub over in-edges, then L2-normalize.
        # Nodes with no in-edges hold score 0 and contribute 0 to the
        # norm, so aggregating only over the non-zero rows is exact.
        auth_raw = (
            e.join(hub.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("v"))
        )
        a_norm = auth_raw.agg(
            F.coalesce(F.sqrt(F.sum(F.col("v") * F.col("v"))), F.lit(1.0)).alias("_n")
        )
        auth = auth_raw.crossJoin(F.broadcast(a_norm)).select(
            "id", (F.col("v") / F.col("_n")).alias("authority")
        )
        if cut:
            auth = cut_lineage(auth, tag="hits_auth")
        # hub half-step: sum authority over out-edges, L2-normalize
        hub_raw = (
            e.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("authority").alias("v"))
        )
        h_norm = hub_raw.agg(
            F.coalesce(F.sqrt(F.sum(F.col("v") * F.col("v"))), F.lit(1.0)).alias("_n")
        )
        hub = hub_raw.crossJoin(F.broadcast(h_norm)).select(
            "id", (F.col("v") / F.col("_n")).alias("hub")
        )
        if cut:
            hub = cut_lineage(hub, tag="hits_hub")
    return (
        verts.join(hub, "id", "left")
        .join(auth, "id", "left")
        .select(
            "id",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
        )
    )


def katz_centrality(
    edges: DataFrame,
    *,
    alpha: float = 0.1,
    beta: float = 1.0,
    max_iterations: int = 10,
    collect_threshold: int = 200_000,
) -> DataFrame:
    """Katz centrality over DIRECTED edges → (id, katz):

        x_{k+1}(v) = β + α · Σ_{u→v} x_k(u),   x_0 = β

    counting walks of every length discounted by α per hop — the
    importance measure that, unlike PageRank, rewards being reachable
    by MANY short walks rather than splitting mass across out-edges
    (α must stay below 1/λ_max for convergence; the default 0.1 is safe
    for the bounded-degree graphs KG construction emits). Fixed
    ``max_iterations`` so a DuckDB oracle can unroll the identical math.

    Same scale shape as pagerank: one join+groupBy per round over the
    edge list, state is (id, score), lineage cut per round.  Below
    ``collect_threshold`` edges the rounds run on the driver in sorted
    edge order — the same 6-dp order-robustness argument as
    :func:`_hits_local`.
    """
    # probe and collect fused into one action
    probe_rows = edges.select("src", "dst").limit(collect_threshold + 1).collect()
    if len(probe_rows) <= collect_threshold:
        from pyspark.sql import types as T

        e_rows = sorted({(r[0], r[1]) for r in probe_rows})
        verts_l = sorted({x for ed in e_rows for x in ed})
        xs = {v: float(beta) for v in verts_l}
        for _ in range(max_iterations):
            inc: dict = {}
            for u, v in e_rows:
                inc[v] = inc.get(v, 0.0) + xs[u]
            xs = {
                v: float(beta) + float(alpha) * inc.get(v, 0.0)
                for v in verts_l
            }
        schema = T.StructType(
            [
                T.StructField("id", edges.schema["src"].dataType),
                T.StructField("katz", T.DoubleType()),
            ]
        )
        return edges.sparkSession.createDataFrame(
            sorted(xs.items()), schema
        )
    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    x = verts.select("id", F.lit(float(beta)).alias("katz"))
    for _ in range(max_iterations):
        incoming = (
            e.join(x.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("katz").alias("_in"))
        )
        x = cut_lineage(
            verts.join(incoming, "id", "left").select(
                "id",
                (
                    F.lit(float(beta))
                    + F.lit(float(alpha)) * F.coalesce("_in", F.lit(0.0))
                ).alias("katz"),
            ),
            tag="katz",
        )
    return x


def degree_histogram(edges: DataFrame) -> DataFrame:
    """Undirected degree distribution → (degree, n_nodes) — the graph-
    profiling query run before choosing skew strategies (a heavy tail
    here is what motivates the hub caps and salting elsewhere). Two
    map-side-combinable aggregations, no joins."""
    deg = _sym_unweighted(edges).groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("degree")
    )
    return deg.groupBy("degree").agg(F.count("*").alias("n_nodes"))


def contract_graph(
    edges: DataFrame,
    labels: DataFrame,
    *,
    weight_col: str | None = None,
) -> DataFrame:
    """Community contraction: collapse nodes into their community label →
    supergraph (label_a, label_b, n_edges, weight), label_a <= label_b,
    self-loops kept (intra-community mass — the quantity Leiden-style
    refinement tracks between levels).

    ``labels`` carries (id, label). Two broadcast-or-shuffle key joins to
    tag endpoints plus one aggregation; the supergraph is community-
    cardinality, typically orders of magnitude smaller than the input —
    the standard multi-level trick that makes hierarchical community
    detection tractable at web scale.
    """
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    e = edges.select("src", "dst", w.alias("_w"))
    la = labels.select(F.col("id").alias("src"), F.col("label").alias("_la"))
    lb = labels.select(F.col("id").alias("dst"), F.col("label").alias("_lb"))
    tagged = e.join(la, "src").join(lb, "dst").select(
        F.least("_la", "_lb").alias("label_a"),
        F.greatest("_la", "_lb").alias("label_b"),
        "_w",
    )
    return tagged.groupBy("label_a", "label_b").agg(
        F.count("*").alias("n_edges"),
        F.round(F.sum("_w"), 6).alias("weight"),
    )


def _triangles_once(canon: DataFrame) -> DataFrame:
    """canon(a, b) with a < b, distinct, no self-loops → one row (u, v, w)
    per triangle, via the same degree-ordered orientation as
    triangle_counts (out-degree bounded by O(√m), no hub knob needed)."""
    sym = _both_dirs(canon.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("_deg"))
    with_keys = (
        sym.join(deg.select(F.col("id").alias("src"), F.col("_deg").alias("_ks")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("_deg").alias("_kd")), "dst")
    )
    oriented = with_keys.where(
        F.struct(F.col("_ks"), F.col("src")) < F.struct(F.col("_kd"), F.col("dst"))
    ).select("src", "dst", F.struct(F.col("_kd"), F.col("dst")).alias("_key"))
    a = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"), F.col("_key").alias("_kv"))
    b = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"), F.col("_key").alias("_kw"))
    wedges = a.join(b, "u").where(F.col("_kv") < F.col("_kw")).select("u", "v", "w")
    closing = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    return wedges.join(closing, ["v", "w"]).select("u", "v", "w")


def k_truss(edges: DataFrame, k: int, max_iter: int = 100) -> DataFrame:
    """k-truss decomposition: the maximal subgraph in which every edge
    participates in ≥ k−2 triangles → (a, b, support), a < b.

    Completes the dense-subgraph family (triangle_counts, k_core): truss
    is the edge-level cohesion filter — cliques of size k survive the
    k-truss, chains/bridges never do — the standard "keep only the
    load-bearing relationships" pass over a noisy co-occurrence KG.

    Peeling loop: enumerate triangles (degree-oriented, each exactly
    once), count per-edge support by exploding each triangle into its 3
    canonical edges, drop edges under k−2, repeat until stable. Rounds =
    peel depth; each round is a constant number of shuffles over a
    strictly shrinking edge set, lineage-cut per round. The stability
    probe reuses the kept-edge count the round already computes.
    """
    cur = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_n = cur.count()
    if prev_n == 0:
        return cur.withColumn("support", F.lit(0).cast("long"))
    for _ in range(max_iter):
        tris = _triangles_once(cur)
        tri_edges = (
            tris.select(F.col("u").alias("x"), F.col("v").alias("y"))
            .union(tris.select(F.col("u").alias("x"), F.col("w").alias("y")))
            .union(tris.select(F.col("v").alias("x"), F.col("w").alias("y")))
        ).select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        support = tri_edges.groupBy("a", "b").agg(F.count("*").alias("support"))
        scored = cur.join(support, ["a", "b"], "left").select(
            "a", "b", F.coalesce("support", F.lit(0)).alias("support")
        )
        kept = scored.where(F.col("support") >= k - 2).localCheckpoint(eager=True)
        n = kept.count()
        if n == 0:
            return kept
        if n == prev_n:
            return kept
        prev_n = n
        cur = kept.select("a", "b")
    # non-fixpoint 'kept' must not leak out (and max_iter=0 would have
    # raised UnboundLocalError here) — match the SCC operators' contract
    raise RuntimeError(
        f"k_truss did not converge within max_iter={max_iter} rounds; "
        "raise max_iter (rounds needed = the graph's peel depth)"
    )


def rich_club(edges: DataFrame, *, ks: tuple[int, ...] = (1, 2, 4, 8)) -> DataFrame:
    """Rich-club coefficients φ(k) (Zhou & Mondragón 2004; Colizza et
    al. 2006 define the normalized form — this is the raw φ, the
    normalization baseline being a caller-side null model) →
    (k, n_rich, e_rich, phi_ppm) for each threshold in ``ks``.

    φ(k) = 2·E_{>k} / (N_{>k}·(N_{>k}−1)) where N_{>k} counts nodes of
    degree > k and E_{>k} the undirected edges with BOTH endpoints of
    degree > k — "do the hubs of this graph preferentially wire to each
    other?", the density of the subgraph induced by the rich nodes.
    Reported as ``phi_ppm = floor(10^6·2·E/(N·(N−1)))`` — exact integer
    arithmetic; NULL when N_{>k} < 2.

    Scale shape: one degree aggregation, two broadcast-backed joins to
    tag edge endpoints with degrees, then ONE explode of the tiny
    literal threshold array on the node and edge sides — per-k work is
    a partial-agg count, never a per-k scan of the graph. Ships
    (id, deg) and (min_end_deg) only.
    """
    if not ks:
        raise ValueError("ks must name at least one degree threshold")
    sym = _sym_unweighted(edges)
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    karr = F.array(*[F.lit(int(k)) for k in sorted(set(ks))])
    n_rich = (
        deg.select("deg", F.explode(karr).alias("k"))
        .where(F.col("deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n_rich"))
    )
    # canonical (a<b) edge list tagged with the SMALLER endpoint degree:
    # both endpoints exceed k iff min(deg_a, deg_b) > k
    canon = sym.where(F.col("src") < F.col("dst"))
    tagged = (
        canon.join(deg.select(F.col("id").alias("src"), F.col("deg").alias("_da")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("deg").alias("_db")), "dst")
        .select(F.least("_da", "_db").alias("min_deg"))
    )
    e_rich = (
        tagged.select("min_deg", F.explode(karr).alias("k"))
        .where(F.col("min_deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count("*").alias("e_rich"))
    )
    return (
        n_rich.join(e_rich, "k", "left")
        .select(
            "k",
            "n_rich",
            F.coalesce("e_rich", F.lit(0)).alias("e_rich"),
            F.when(
                F.col("n_rich") > 1,
                F.floor(
                    1000000 * 2 * F.coalesce("e_rich", F.lit(0))
                    / (F.col("n_rich") * (F.col("n_rich") - 1))
                ).cast("long"),
            ).alias("phi_ppm"),
        )
    )


def _luby_mis_local(spark, edge_rows, seed, n_rounds, id_type) -> DataFrame:
    """Driver replay of the distributed Luby rounds for small edge lists
    — identical priorities (sha-60 of seed␟node), identical strict-local-
    minimum selection and neighbor removal per round, identical statuses.
    Python tuple compare (p, node) equals Spark's struct compare (UTF-8
    byte order == code point order), so the output is bit-identical."""
    import hashlib

    from pyspark.sql.types import (
        IntegerType, StringType, StructField, StructType,
    )

    sym = set()
    for r in edge_rows:
        s, d = r[0], r[1]
        sym.add((s, d))
        sym.add((d, s))
    adj: dict = {}
    for s, d in sym:
        adj.setdefault(s, []).append(d)
    nodes = sorted(adj)
    pri = {
        v: int(
            hashlib.sha256(f"{seed}\x1f{v}".encode("utf-8")).hexdigest()[:15],
            16,
        )
        for v in nodes
    }
    active = set(nodes)
    out_rows = []
    for rnd in range(1, n_rounds + 1):
        selected = []
        for v in active:
            m = None
            for nb in adj[v]:
                if nb in active:
                    t = (pri[nb], nb)
                    if m is None or t < m:
                        m = t
            if m is None or (pri[v], v) < m:
                selected.append(v)
        removed = set()
        for v in selected:
            for nb in adj[v]:
                if nb in active:
                    removed.add(nb)
        for v in selected:
            out_rows.append((v, "in_mis", rnd))
        for v in removed:
            out_rows.append((v, "removed", rnd))
        active -= set(selected)
        active -= removed
        if not active:
            break
    for v in active:
        out_rows.append((v, "active", None))
    schema = StructType(
        [
            StructField("node", id_type or StringType()),
            StructField("status", StringType()),
            StructField("round", IntegerType()),
        ]
    )
    return spark.createDataFrame(out_rows, schema)


def luby_mis(
    edges: DataFrame,
    *,
    n_rounds: int = 12,
    seed: str = "mis-v1",
    collect_threshold: int = 500_000,
) -> DataFrame:
    """Luby's maximal-independent-set rounds (Luby 1986, the canonical
    O(log n)-round parallel MIS) with DETERMINISTIC priorities →
    (node, status, round): status ``in_mis`` (selected as a local
    priority minimum in that round), ``removed`` (a neighbor was
    selected), or ``active`` (undecided after ``n_rounds``, round
    NULL).

    Priorities are the portable sha-derived 60-bit family
    H(seed␟node) with the node id as total-order tiebreak, so the
    OUTPUT — not just the invariants — is bit-reproducible on any
    engine and any partitioning; semantics are defined as the state
    after exactly ``n_rounds`` rounds (the oracle's unrolled form). The
    selected set is an independent set by construction (strict local
    minima of a total order are never adjacent); it is maximal over
    the decided region, and ``active`` is empty whenever ``n_rounds``
    ≥ the instance's convergence depth — O(log n) w.h.p., so the
    default 12 covers graphs to ~millions of nodes in practice.

    Scale shape per round: one semi-join of the edge list against the
    active set per endpoint, one partial-agg min of the (priority, id)
    struct per node, one left join to test local minimality — ids and
    one long only, lineage cut per round. MIS is the classic building
    block for parallel graph coloring / matching / scheduling.
    """
    from graphrag_rs_spark.operators.sketches import SEP, _h60

    e0 = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    if collect_threshold:
        # the 12-round distributed form costs ~3 actions/round of fixed
        # scheduling; small graphs replay the identical rounds driver-side
        # (probe and collect fused into one action; parity pinned by
        # tests/test_mis_zorder_scd2.py's small-vs-distributed equality)
        probe_rows = e0.limit(collect_threshold + 1).collect()
        if len(probe_rows) <= collect_threshold:
            # restrict to string/ASCII-safe or numeric ids is unnecessary
            # here: UTF-8 byte order equals code-point order, and the
            # formatted numeric image matches concat_ws's cast exactly
            return _luby_mis_local(
                edges.sparkSession,
                probe_rows,
                seed,
                n_rounds,
                edges.schema["src"].dataType,
            )
    sym = _both_dirs(e0).distinct()
    pri = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("p", _h60(F.concat_ws(SEP, F.lit(seed), F.col("node"))))
        .localCheckpoint(eager=True)
    )
    e = (
        sym.join(pri.select(F.col("node").alias("src"), F.col("p").alias("p_dst")).withColumnRenamed("src", "dst"), "dst")
        .select("src", "dst", "p_dst")
        .localCheckpoint(eager=True)
    )

    active = pri
    decided = None
    for rnd in range(1, n_rounds + 1):
        act_ids = active.select("node")
        e_act = (
            e.join(act_ids.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(act_ids.withColumnRenamed("node", "dst"), "dst", "left_semi")
        )
        nbr_min = e_act.groupBy(F.col("src").alias("node")).agg(
            F.min(F.struct(F.col("p_dst").alias("p"), F.col("dst").alias("node"))).alias("_m")
        )
        tagged = active.join(nbr_min, "node", "left")
        selected = tagged.where(
            F.col("_m").isNull()
            | (F.struct(F.col("p"), F.col("node")) < F.col("_m"))
        ).select("node")
        removed = (
            e_act.join(selected.withColumnRenamed("node", "src"), "src", "left_semi")
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        batch = (
            selected.select("node", F.lit("in_mis").alias("status"), F.lit(rnd).alias("round"))
            .unionByName(
                removed.select("node", F.lit("removed").alias("status"), F.lit(rnd).alias("round"))
            )
            .localCheckpoint(eager=True)
        )
        decided = batch if decided is None else decided.unionByName(batch)
        active = (
            active.join(batch.select("node"), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if active.limit(1).count() == 0:
            break

    out = active.select(
        "node",
        F.lit("active").alias("status"),
        F.lit(None).cast("int").alias("round"),
    )
    if decided is not None:
        out = decided.unionByName(out)
    return out


def _wl_local(spark, edge_rows: list, id_type, n_rounds: int):
    """Driver-exact replay of the WL rounds. The color hash is the
    portable sha-60 family over ASCII digit strings (labels and the
    '|'-joined sorted signature), so hashlib reproduces `_h60`
    bit-for-bit; node ids never enter a hash or an ordering, so no
    ASCII guard is needed."""
    import hashlib

    from pyspark.sql import types as T

    adj: dict = {}
    for s, d in edge_rows:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)

    def h60(s: str) -> int:
        return int(hashlib.sha256(s.encode("utf-8")).hexdigest()[:15], 16)

    labels = {v: len(nbrs) for v, nbrs in adj.items()}
    for _ in range(n_rounds):
        labels = {
            v: h60(
                str(labels[v])
                + "\x1f"
                + "|".join(sorted(str(labels[u]) for u in nbrs))
            )
            for v, nbrs in adj.items()
        }
    n_colors = len(set(labels.values()))
    schema = T.StructType(
        [
            T.StructField("node", id_type),
            T.StructField("wl_label", T.LongType()),
            T.StructField("n_colors", T.LongType()),
        ]
    )
    return spark.createDataFrame(
        [(v, l, n_colors) for v, l in labels.items()], schema
    )


def wl_labels(
    edges: DataFrame,
    *,
    n_rounds: int = 3,
    init_label: str = "deg",
    collect_threshold: int = 200_000,
) -> DataFrame:
    """Weisfeiler-Lehman iterative relabeling (the 1-WL color
    refinement behind WL graph kernels and the GIN expressiveness
    bound) → (node, wl_label, n_colors): after ``n_rounds`` of
    ``label' = H(label ␟ sorted multiset of neighbor labels)``,
    wl_label is the node's final 60-bit color and n_colors the global
    count of distinct colors (broadcast onto every row — the classic
    WL statistic: more colors = finer structural resolution).

    ``init_label="deg"`` starts from the degree (the standard choice
    for unlabeled graphs); nodes with identical ``n_rounds``-hop
    unfolding trees provably share a color, so equal wl_labels are the
    structural-role buckets a KG pipeline uses for role-based entity
    blocking and GNN feature seeding.

    The hash is the portable sha-derived family over the label and the
    '|'-joined SORTED neighbor list, so the colors themselves — not
    just their partition — replay bit-for-bit on any engine. Per
    round: one equi-join edge×labels, one sort_array(collect_list)
    per node (bounded by max degree), one projection — no window, no
    driver loop state.
    """
    from graphrag_rs_spark.operators.sketches import SEP, _h60

    e0 = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    if init_label != "deg":
        raise ValueError("only init_label='deg' is defined")
    # driver replay under the collect threshold: each distributed round
    # is an equi-join + collect_list groupBy + lineage cut of pure
    # scheduling at board scale, and `_h60` replays exactly in hashlib
    if collect_threshold:
        probe_rows = e0.distinct().limit(collect_threshold + 1).collect()
        if (
            len(probe_rows) <= collect_threshold
            and n_rounds * max(len(probe_rows), 1) <= 20_000_000
        ):
            return _wl_local(
                edges.sparkSession,
                [(r[0], r[1]) for r in probe_rows],
                edges.schema["src"].dataType,
                n_rounds,
            )
    sym = _both_dirs(e0).distinct().localCheckpoint(eager=True)
    labels = (
        sym.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").cast("long").alias("l"))
        .localCheckpoint(eager=True)
    )
    for _ in range(n_rounds):
        nbr = (
            sym.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("l").alias("_nl")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(
                F.concat_ws(
                    "|", F.sort_array(F.collect_list(F.col("_nl").cast("string")))
                ).alias("_sig")
            )
        )
        labels = (
            labels.join(nbr, "node")
            .select(
                "node",
                _h60(
                    F.concat_ws(SEP, F.col("l").cast("string"), F.col("_sig"))
                ).alias("l"),
            )
            .localCheckpoint(eager=True)
        )
    colors = labels.agg(F.countDistinct("l").alias("n_colors"))
    return labels.crossJoin(F.broadcast(colors)).select(
        "node", F.col("l").alias("wl_label"), "n_colors"
    )


def _matching_local(spark, canon_rows: list, id_type, n_rounds: int):
    """Driver-exact replay of the handshake rounds; the sha-60 edge
    priorities ride the collected canon rows (computed by Spark, no
    Python hash twin). Returns None → distributed fallback when a
    string id is non-ASCII (the struct tie-break compares ids — the
    ordering-guard class)."""
    from pyspark.sql import types as T

    for a, b, ek in canon_rows:
        if isinstance(a, str) and not all(ord(ch) < 128 for ch in a):
            return None
        if isinstance(b, str) and not all(ord(ch) < 128 for ch in b):
            return None

    active = list(canon_rows)
    matched: list = []
    for rnd in range(1, n_rounds + 1):
        best: dict = {}
        for a, b, ek in active:
            key = (ek, a, b)
            for node in (a, b):
                cur = best.get(node)
                if cur is None or key < cur:
                    best[node] = key
        won = [
            (a, b)
            for a, b, ek in active
            if best[a] == (ek, a, b) and best[b] == (ek, a, b)
        ]
        if not won:
            break
        matched.extend((a, b, rnd) for a, b in won)
        gone = {n for pair in won for n in pair}
        active = [t for t in active if t[0] not in gone and t[1] not in gone]
        if not active:
            break

    if not matched:
        # mirror the distributed empty-case schema exactly
        return spark.createDataFrame([], "a string, b string, round int")
    schema = T.StructType(
        [
            T.StructField("a", id_type),
            T.StructField("b", id_type),
            T.StructField("round", T.IntegerType()),
        ]
    )
    return spark.createDataFrame(matched, schema)


def maximal_matching(
    edges: DataFrame,
    *,
    n_rounds: int = 12,
    seed: str = "match-v1",
    collect_threshold: int = 200_000,
) -> DataFrame:
    """Deterministic parallel maximal matching (the handshake/proposal
    rounds of Israeli-Itai 1986, derandomized with portable sha edge
    priorities) → (a, b, round): the matched pairs (a < b) and the
    round each pair locked in.

    Per round every unmatched node points at its best unmatched
    neighbor — minimal (H(seed␟least␟greatest), least, greatest) edge
    key, a total order — and an edge joins the matching iff BOTH
    endpoints point at each other (mutual-best handshake). Matched
    nodes leave; repeat. Strict total order makes every round a pure
    function of the previous state, so the oracle unrolls rounds and
    matches bit-for-bit; the result is maximal whenever ``n_rounds``
    suffices (expected O(log n); the round column exposes the actual
    depth). Maximal matching is THE coarsening primitive — multilevel
    partitioners and graph coarseners collapse matched pairs level by
    level (the same contraction step operators/communities.py's
    multilevel path applies to community merges).

    Scale shape per round: one min-struct partial agg per node (best
    incident edge), one self-join on the reversed pointer (the
    handshake), two anti-joins to retire matched endpoints — ids and
    one long only, lineage cut per round.
    """
    from graphrag_rs_spark.operators.sketches import SEP, _h60

    e0 = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    canon = (
        e0.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .withColumn(
            "ek",
            _h60(F.concat_ws(SEP, F.lit(seed), F.col("a"), F.col("b"))),
        )
        .localCheckpoint(eager=True)
    )

    # driver replay under the collect threshold: each distributed round
    # is ~4 fixed-cost jobs (min-agg, handshake, two anti-joins + cut)
    # of pure scheduling at board scale; canon is already materialized
    # so the bounded collect is one cheap ship
    from pyspark.sql import types as T

    id_dt = edges.schema["src"].dataType
    _num = (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
    if collect_threshold and isinstance(id_dt, _num + (T.StringType,)):
        rows = canon.limit(collect_threshold + 1).collect()
        if (
            len(rows) <= collect_threshold
            and n_rounds * max(len(rows), 1) <= 20_000_000
        ):
            local = _matching_local(
                canon.sparkSession,
                [(r["a"], r["b"], r["ek"]) for r in rows],
                id_dt,
                n_rounds,
            )
            if local is not None:
                return local

    matched = None
    active = canon
    for rnd in range(1, n_rounds + 1):
        inc = active.select(
            F.col("a").alias("node"), F.struct("ek", "a", "b").alias("edge")
        ).unionByName(
            active.select(
                F.col("b").alias("node"), F.struct("ek", "a", "b").alias("edge")
            )
        )
        best = inc.groupBy("node").agg(F.min("edge").alias("edge"))
        # handshake: an edge wins iff it is BOTH endpoints' best edge
        won = (
            best.groupBy("edge")
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") == 2)
            .select(
                F.col("edge.a").alias("a"),
                F.col("edge.b").alias("b"),
                F.lit(rnd).alias("round"),
            )
            .localCheckpoint(eager=True)
        )
        if won.limit(1).count() == 0:
            break
        matched = won if matched is None else matched.unionByName(won)
        gone = won.select(F.col("a").alias("node")).unionByName(
            won.select(F.col("b").alias("node"))
        )
        active = (
            active.join(gone.withColumnRenamed("node", "a"), "a", "left_anti")
            .join(gone.withColumnRenamed("node", "b"), "b", "left_anti")
            .select("a", "b", "ek")
            .localCheckpoint(eager=True)
        )
        if active.limit(1).count() == 0:
            break

    if matched is None:
        return canon.sparkSession.createDataFrame(
            [], "a string, b string, round int"
        )
    return matched.select("a", "b", F.col("round").cast("int").alias("round"))


def partition_conductance(
    edges: DataFrame,
    labels: DataFrame,
    *,
    id_col: str = "id",
    label_col: str = "label",
) -> DataFrame:
    """Per-community conductance φ(S) = cut(S) / min(vol(S), 2m − vol(S))
    over an undirected graph — the standard partition-quality score
    (Leiden/Louvain validation; community pruning before summarization).

    Exact-integer contract: emits ``cut_edges``, ``volume`` and ``denom``
    as BIGINTs plus ``conductance_micro`` = floor(1e6·cut/denom) via
    integer division, so any engine reproduces it bit-for-bit (no float
    summation order anywhere).  ``denom`` = 0 (a community holding every
    edge endpoint) yields NULL micro.

    Shape at scale: dedup the edge list, ONE join per endpoint against
    the (id → label) frame (broadcast when labels are small, shuffle
    otherwise — left to AQE), then a single partial-aggregated groupBy
    on label: each edge contributes one row per endpoint (volume) with
    an is-cut flag.  2m rides in as a 1-row broadcast.  No per-community
    loop, no window, no collect.
    """
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    lab = labels.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("label")
    )
    j = (
        e.join(lab.select(F.col("id").alias("src"), F.col("label").alias("sl")), "src")
        .join(lab.select(F.col("id").alias("dst"), F.col("label").alias("dl")), "dst")
        .select("sl", "dl", (F.col("sl") != F.col("dl")).cast("long").alias("is_cut"))
    )
    contrib = j.select(F.col("sl").alias("label"), "is_cut").unionAll(
        j.select(F.col("dl").alias("label"), "is_cut")
    )
    two_m = e.select((F.count("*") * 2).alias("two_m"))
    per = (
        contrib.groupBy("label")
        .agg(
            F.sum("is_cut").cast("long").alias("cut_edges"),
            F.count("*").cast("long").alias("volume"),
        )
        .crossJoin(F.broadcast(two_m))
    )
    return per.select(
        "label",
        "cut_edges",
        "volume",
        F.least(F.col("volume"), F.col("two_m") - F.col("volume"))
        .cast("long")
        .alias("denom"),
    ).select(
        "label",
        "cut_edges",
        "volume",
        "denom",
        F.when(
            F.col("denom") > 0,
            F.expr("(1000000 * cut_edges) div denom"),
        ).alias("conductance_micro"),
    )


def key_skew_profile(
    df: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Shuffle-key skew diagnostic → one row per decimal-magnitude
    bucket of the per-key row count: (bucket_digits, n_keys, min_count,
    max_count, rows_total).

    The pre-flight question every join/groupBy at 100 TB needs answered
    — "is this key uniform or does one key hold 10^8 rows?" — as a
    two-aggregation profile: per-key counts (partial-agg, the same
    shuffle the real job would do) bucketed by count magnitude.
    ``bucket_digits`` = number of DECIMAL DIGITS of the count
    (length of the count's string image) — integer-exact on any engine,
    unlike floor(log2(c)) whose float image can land a power of two in
    the wrong bucket. A heavy tail here is what motivates salting /
    AQE skew-join / the hub caps used throughout this repo.
    """
    if not key_cols:
        raise ValueError("key_cols must name at least one column")
    # collision-proof count alias: a key column literally named "c"
    # would make F.col("c") ambiguous downstream
    cnt = "__skp_count"
    per_key = df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.count("*").alias(cnt)
    )
    return (
        per_key.select(
            F.length(F.col(cnt).cast("string")).cast("int").alias(
                "bucket_digits"
            ),
            cnt,
        )
        .groupBy("bucket_digits")
        .agg(
            F.count("*").alias("n_keys"),
            F.min(cnt).alias("min_count"),
            F.max(cnt).alias("max_count"),
            F.sum(cnt).alias("rows_total"),
        )
    )


def edge_support(
    edges: DataFrame, *, max_degree: int = 10_000
) -> DataFrame:
    """Triangle support per undirected edge → (src, dst, support) with
    src < dst: support = common-neighbour count — the k-truss peel
    criterion exposed as a per-edge diagnostic (an edge's support + 2
    is the largest truss it can belong to; support 0 marks the
    tree-like periphery).

    Scale shape: the wedge join is O(deg²) per node, so nodes above
    ``max_degree`` raise (the clustering_coefficients hub contract,
    loudly instead of a melted shuffle — cap hubs upstream or raise
    the knob deliberately). Joins are ids-only; zero-support edges are
    kept via the final left join.
    """
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    # materialize the symmetric edge list once: the hub probe, the canon
    # side and both wedge-join sides otherwise re-ran the upstream edge
    # derivation (×2 more through the old self-union) per action
    sym = _both_dirs(e).distinct().localCheckpoint(eager=True)
    deg = sym.groupBy("src").agg(F.count("*").alias("d"))
    hub = deg.where(F.col("d") > max_degree).limit(1).collect()
    if hub:
        raise ValueError(
            f"edge_support: node {hub[0]['src']!r} has degree "
            f"{hub[0]['d']} > max_degree={max_degree}; the wedge join "
            "is O(deg^2) per node — cap hubs upstream or raise the knob"
        )
    canon = sym.where(F.col("src") < F.col("dst"))
    tri = (
        canon.join(
            sym.select(F.col("src").alias("src"), F.col("dst").alias("w")),
            "src",
        )
        .join(
            sym.select(F.col("src").alias("dst"), F.col("dst").alias("w")),
            ["dst", "w"],
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("support"))
    )
    return canon.join(tri, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("support", F.lit(0)).alias("support")
    )
