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

from graphrag_rs_spark.iterutil import both_dirs


def _bfs_local(
    spark, edge_rows, src_occurrences, id_type,
    max_depth, max_paths_per_source,
) -> DataFrame:
    """Driver replay of the distributed bfs rounds — identical first-visit
    depths, identical min-path parent dedupe (Python tuple compare equals
    Spark's array<string> lexicographic compare under UTF-8), identical
    (depth, path) truncation order."""
    from pyspark.sql.types import (
        ArrayType, IntegerType, StructField, StructType,
    )

    sym = set()
    for r in edge_rows:
        s, d = r[0], r[1]
        sym.add((s, d))
        sym.add((d, s))
    adj: dict = {}
    for s, d in sym:
        adj.setdefault(s, []).append(d)
    per_source_rows: dict = {}
    # depth-0 rows once per source OCCURRENCE (the distributed frontier
    # keeps duplicate source rows; deeper rows collapse in the groupBy)
    for s in src_occurrences:
        per_source_rows.setdefault(s, []).append((0, (s,), s))
    for s in set(src_occurrences):
        visited = {s}
        frontier = {s: (s,)}
        for depth in range(1, max_depth + 1):
            nxt: dict = {}
            for node, path in frontier.items():
                for nb in adj.get(node, ()):
                    if nb in visited:
                        continue
                    cand = path + (nb,)
                    cur = nxt.get(nb)
                    if cur is None or cand < cur:
                        nxt[nb] = cand
            if not nxt:
                break
            for nb, path in nxt.items():
                visited.add(nb)
                per_source_rows[s].append((depth, path, nb))
            frontier = nxt
    out_rows = []
    for s, rows in per_source_rows.items():
        rows.sort(key=lambda t: (t[0], t[1]))
        for depth, path, node in rows[:max_paths_per_source]:
            out_rows.append((s, node, depth, list(path)))
    schema = StructType(
        [
            StructField("source", id_type),
            StructField("node", id_type),
            StructField("depth", IntegerType()),
            StructField("path", ArrayType(id_type)),
        ]
    )
    return spark.createDataFrame(out_rows, schema)


def bfs(
    edges: DataFrame,
    sources: DataFrame,
    *,
    max_depth: int = 3,
    min_strength: float = 0.5,
    max_paths_per_source: int = 100,
    collect_threshold: int = 200_000,
) -> DataFrame:
    """edges(src, dst, weight) + sources(id) →
    (source, node, depth, path: array<string>).

    Undirected expansion; a node is visited at its FIRST (minimal) depth
    per source. Paths beyond ``max_paths_per_source`` per source are
    truncated deterministically (smallest path array first).

    Small graphs (edge/source product bounded like _multi_bfs) replay the
    identical rounds driver-side — the distributed form pays ~3 fixed-cost
    actions per hop; parity pinned by tests/test_traversal_small_path.py.
    """
    e = edges.where(F.col("weight") >= min_strength).select("src", "dst")
    if collect_threshold:
        e_rows = e.limit(collect_threshold + 1).collect()
        n_edges = len(e_rows)
        if n_edges <= collect_threshold:
            src_cap = 5_000_000 // max(1, n_edges) + 1
            src_rows = sources.select("id").limit(src_cap + 1).collect()
            n_src = len(src_rows)
            # NULL endpoints/sources keep the distributed plan: the local
            # replay's Python path-tuple comparisons cannot reproduce
            # Spark's null ordering inside array<string> mins
            has_null = any(
                r[0] is None or r[1] is None for r in e_rows
            ) or any(r[0] is None for r in src_rows)
            if (
                not has_null
                and n_src <= src_cap
                and n_src * max(1, n_edges) <= 5_000_000
            ):
                return _bfs_local(
                    edges.sparkSession,
                    e_rows,
                    [r[0] for r in src_rows],
                    sources.schema["id"].dataType,
                    max_depth,
                    max_paths_per_source,
                )
    sym = both_dirs(e).distinct().localCheckpoint(eager=True)

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


def ego_network(
    edges: DataFrame,
    centers: DataFrame,
    *,
    k_hops: int = 3,
    min_strength: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """G6 ego-network extraction (traversal.rs:242-303): BFS outward from
    each center for ``k_hops`` over strength-filtered undirected edges.

    → (nodes, sub_edges): nodes = (center, node, distance) with distance =
    first-visit hop (0 for the center itself); sub_edges = the induced
    strength-filtered edge set among the ego nodes of each center — the
    set-valued equivalent of the reference's subgraph_relationships list
    (which appends one copy per encounter; a set is what callers consume).
    """
    nodes = bfs(
        edges,
        centers,
        max_depth=k_hops,
        min_strength=min_strength,
        max_paths_per_source=2**31 - 1,
    ).select(F.col("source").alias("center"), "node", F.col("depth").alias("distance"))

    e = edges.where(F.col("weight") >= min_strength)
    n_src = nodes.select(F.col("center").alias("c"), F.col("node").alias("src"))
    n_dst = nodes.select(F.col("center").alias("c"), F.col("node").alias("dst"))
    sub_edges = (
        e.join(n_src, "src")
        .join(n_dst, ["c", "dst"])
        .select(F.col("c").alias("center"), "src", "dst", "weight")
        .dropDuplicates(["center", "src", "dst"])
    )
    return nodes, sub_edges


def find_all_paths(
    edges: DataFrame,
    source: str,
    target: str,
    *,
    max_depth: int = 3,
    max_paths: int = 100,
    min_strength: float = 0.5,
) -> DataFrame:
    """G6 all-simple-paths (traversal.rs:382-477): every loop-free path
    source→target of length ≤ max_depth over strength-filtered undirected
    edges → (path: array<string>, length).

    The reference's recursive DFS truncates at ``max_paths`` in HashMap
    iteration order — nondeterministic in the reference itself. Here the
    frontier enumerates ALL simple paths (path-local visited via
    array_contains, exactly the visited-set-with-backtrack semantics) and
    truncates deterministically: shortest first, then lexicographic.

    Scale note: simple-path counts are exponential in dense graphs;
    max_depth (default 3) bounds the frontier like the reference.
    """
    e = edges.where(F.col("weight") >= min_strength).select("src", "dst")
    sym = both_dirs(e).distinct().localCheckpoint(eager=True)
    spark = edges.sparkSession
    frontier = spark.createDataFrame(
        [([source],)], "path array<string>"
    ).where(F.lit(source) != F.lit(target))
    done = spark.createDataFrame([([source],)], "path array<string>").where(
        F.lit(source) == F.lit(target)
    )

    for _depth in range(1, max_depth + 1):
        if frontier.limit(1).count() == 0:
            break
        hop = (
            frontier.join(
                sym.withColumnRenamed("src", "node"),
                F.element_at(F.col("path"), -1) == F.col("node"),
            )
            .where(~F.array_contains("path", F.col("dst")))
            .select(F.concat("path", F.array("dst")).alias("path"))
            .localCheckpoint(eager=True)
        )
        done = done.unionByName(hop.where(F.element_at("path", -1) == target))
        frontier = hop.where(F.element_at("path", -1) != target)

    return (
        done.select("path", F.size("path").alias("length"))
        .orderBy("length", "path")
        .limit(max_paths)
    )


def eccentricity(
    edges: DataFrame,
    sources: DataFrame,
    *,
    directed: bool = False,
    max_iter: int = 64,
) -> DataFrame:
    """Per-source eccentricity → (source, eccentricity, n_reached):
    eccentricity = max BFS depth over the source's reachable set
    (excluding unreachable nodes), n_reached = reachable nodes incl.
    the source. max(eccentricity) over hash-sampled sources is the
    standard pseudo-diameter lower bound (the all-sources exact
    diameter is O(n·E) — callers pick k sources, this runs them ALL in
    one frontier, so the work is k parallel BFS sharing each hop's
    join).

    Scale shape: state is (source, node); every hop is one equi-join of
    the frontier against the edge list + one left_anti against the
    visited set, lineage cut per hop. Raises on non-convergence at
    ``max_iter`` (same contract as scc/topological_layers) — a graph's
    true eccentricity can't exceed its longest shortest path, so
    max_iter only trips on genuinely deeper graphs.
    """
    visited = _multi_bfs(
        edges, sources, directed=directed, max_iter=max_iter,
        op_name="eccentricity",
    )
    return visited.groupBy("source").agg(
        F.max("depth").cast("int").alias("eccentricity"),
        F.count("*").alias("n_reached"),
    )


def _multi_bfs_local(
    spark,
    edge_rows: list,
    src_rows: list,
    id_type,
    directed: bool,
    max_iter: int,
    op_name: str,
) -> DataFrame:
    """Driver-exact replica of the distributed multi-source BFS for
    graphs under the collect threshold (the scc.tarjan / kcenter /
    pagerank guarded-small-path pattern): identical minimal-depth
    semantics, identical max_iter contract (raise when the deepest
    discovered depth reaches ``max_iter`` — the distributed loop only
    returns after observing an EMPTY round within max_iter hops), and
    identical duplicate-source behavior (depth-0 rows once per source
    OCCURRENCE, deeper rows once per distinct source — the distributed
    initial frontier is never deduped, later hops are)."""
    from pyspark.sql import types as T

    adj: dict = {}
    for s, d in edge_rows:
        adj.setdefault(s, []).append(d)
        if not directed:
            adj.setdefault(d, []).append(s)
    rows = []
    max_depth_seen = 0
    for s in dict.fromkeys(src_rows):
        depth_of = {s: 0}
        frontier = [s]
        depth = 0
        while frontier:
            depth += 1
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in depth_of:
                        depth_of[v] = depth
                        nxt.append(v)
            frontier = nxt
            if nxt and depth > max_depth_seen:
                max_depth_seen = depth
        rows.extend((s, v, d) for v, d in depth_of.items() if d > 0)
    if max_depth_seen >= max_iter:
        raise RuntimeError(
            f"{op_name} did not exhaust frontiers within max_iter={max_iter}"
        )
    rows.extend((s, s, 0) for s in src_rows)
    schema = T.StructType(
        [
            T.StructField("source", id_type),
            T.StructField("node", id_type),
            T.StructField("depth", T.IntegerType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _multi_bfs(
    edges: DataFrame,
    sources: DataFrame,
    *,
    directed: bool,
    max_iter: int,
    op_name: str,
    collect_threshold: int = 200_000,
) -> DataFrame:
    """Shared multi-source BFS → (source, node, depth) at minimal depth,
    every source advancing in ONE frontier per hop (the eccentricity /
    harmonic-centrality engine). Raises on max_iter exhaustion.

    Below ``collect_threshold`` edges (and a driver-work product bound
    n_src·n_edges ≤ 5M — Python BFS is O(n_src·E)) the identical
    semantics run on the driver: per-hop frontier joins cost ~0.5 s of
    pure scheduling each on an idle cluster, so a 60-round board-scale
    BFS pays ~30 s for microseconds of arithmetic. Path-equality is
    pinned by tests/test_traversal_small_path.py."""
    e = edges.select("src", "dst")
    # probe and collect fused (one action each side): limit(T+1).collect()
    # both answers "is it small?" and already holds the rows — separate
    # count() probes re-ran the whole edge/source derivation (often a
    # regex-extraction pipeline) once more per probe
    e_rows = e.limit(collect_threshold + 1).collect()
    n_edges = len(e_rows)
    if n_edges <= collect_threshold:
        # probe sources up to the budget the product bound implies —
        # a probe capped at collect_threshold+1 would let an arbitrarily
        # large source table through whenever the edge set is tiny
        src_cap = 5_000_000 // max(1, n_edges) + 1
        src_rows = sources.select("id").limit(src_cap + 1).collect()
        n_src = len(src_rows)
        if n_src <= src_cap and n_src * max(1, n_edges) <= 5_000_000:
            return _multi_bfs_local(
                edges.sparkSession,
                [(r[0], r[1]) for r in e_rows],
                [r[0] for r in src_rows],
                edges.schema["src"].dataType,
                directed,
                max_iter,
                op_name,
            )
    if not directed:
        e = both_dirs(e)
    e = e.distinct().localCheckpoint(eager=True)

    frontier = sources.select(
        F.col("id").alias("source"),
        F.col("id").alias("node"),
        F.lit(0).alias("depth"),
    ).localCheckpoint(eager=True)
    visited = frontier
    for depth in range(1, max_iter + 1):
        fresh = (
            frontier.join(e.withColumnRenamed("src", "node"), "node")
            .select("source", F.col("dst").alias("node"), F.lit(depth).alias("depth"))
            .join(visited.select("source", "node"), ["source", "node"], "left_anti")
            .dropDuplicates(["source", "node"])
            .localCheckpoint(eager=True)
        )
        if fresh.limit(1).count() == 0:
            return visited
        visited = visited.unionByName(fresh).localCheckpoint(eager=True)
        frontier = fresh
    raise RuntimeError(
        f"{op_name} did not exhaust frontiers within max_iter={max_iter}"
    )


def harmonic_centrality(
    edges: DataFrame,
    sources: DataFrame,
    *,
    directed: bool = False,
    max_iter: int = 64,
) -> DataFrame:
    """Harmonic centrality (Boldi & Vigna 2014, "Axioms for
    Centrality": Σ over reachable v of 1/d(u, v) — the disconnected-
    safe closeness variant) for the given sources →
    (source, h_ppm, n_reached). The reciprocal sum is accumulated as
    Σ floor(10^6 / d) — exact integer arithmetic, replayable by any
    engine, order-independent.

    Same scale shape as :func:`eccentricity` (they share one
    multi-source frontier); hash-sample sources for the estimator
    form, pass all nodes for the exact form.
    """
    visited = _multi_bfs(
        edges, sources, directed=directed, max_iter=max_iter,
        op_name="harmonic_centrality",
    )
    return (
        visited.where(F.col("depth") > 0)
        .groupBy("source")
        .agg(
            F.sum(F.floor(1000000 / F.col("depth")).cast("long")).alias("h_ppm"),
            F.count("*").alias("n_reached"),
        )
    )


def closeness_centrality(
    edges: DataFrame,
    sources: DataFrame,
    *,
    directed: bool = False,
    max_iter: int = 64,
) -> DataFrame:
    """Wasserman–Faust closeness for the given sources →
    (source, sum_dist, n_reached, closeness_ppm).

    The disconnected-safe normalization
    ``((r−1)/(n−1)) · ((r−1)/Σd)`` (r = reachable incl. the source,
    n = nodes in the graph, Σd = sum of shortest-path distances) scales
    plain closeness by the reachable fraction, so sources in small
    components don't score as central as hub nodes. Reported as
    ``closeness_ppm = floor(10^6 · (r−1)² / (Σd · (n−1)))`` — exact
    integer arithmetic over the BFS depths, replayable by any engine.
    Sources that reach nothing (Σd = 0) emit NULL closeness.

    Same scale shape as :func:`harmonic_centrality` — all sources share
    ONE multi-source frontier (`_multi_bfs`), each hop an equi-join +
    left_anti, lineage cut per hop; n is one count over the
    symmetrized node set, broadcast onto the k-row aggregate.
    """
    e = edges.select("src", "dst")
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    n_total = nodes.agg(F.count("*").alias("n_nodes"))
    visited = _multi_bfs(
        edges, sources, directed=directed, max_iter=max_iter,
        op_name="closeness_centrality",
    )
    per_src = visited.groupBy("source").agg(
        F.sum("depth").cast("long").alias("sum_dist"),
        F.count("*").alias("n_reached"),
    )
    return per_src.crossJoin(F.broadcast(n_total)).select(
        "source",
        "sum_dist",
        "n_reached",
        F.when(
            (F.col("sum_dist") > 0) & (F.col("n_nodes") > 1),
            F.floor(
                1000000
                * (F.col("n_reached") - 1)
                * (F.col("n_reached") - 1)
                / (F.col("sum_dist") * (F.col("n_nodes") - 1))
            ).cast("long"),
        ).alias("closeness_ppm"),
    )


def _weighted_sssp_local(
    spark,
    edge_rows: list,
    src_rows: list,
    id_type,
    n_rounds: int,
    directed: bool,
) -> DataFrame:
    """Driver-exact replica of the n-round Bellman-Ford relaxation for
    graphs under the collect threshold (guarded-small-path pattern):
    identical round-prefix semantics — dist_r(s,v) = min(dist_{r-1}(s,v),
    min_{(u,v)} dist_{r-1}(s,u)+w) — including the distributed path's
    min-weight parallel-edge fold and its duplicate-source quirk
    (n_rounds=0 emits one row per source OCCURRENCE; any groupBy round
    dedupes)."""
    from pyspark.sql import types as T

    w_of: dict = {}
    for s, d, w in edge_rows:
        w = int(w)
        for a, b in ((s, d),) if directed else ((s, d), (d, s)):
            k = (a, b)
            if k not in w_of or w < w_of[k]:
                w_of[k] = w
    adj: dict = {}
    for (a, b), w in w_of.items():
        adj.setdefault(a, []).append((b, w))

    rows = []
    if n_rounds == 0:
        rows = [(s, s, 0) for s in src_rows]
    else:
        for s in dict.fromkeys(src_rows):
            dist = {s: 0}
            for _ in range(n_rounds):
                new = dict(dist)
                for u, du in dist.items():
                    for v, w in adj.get(u, ()):
                        c = du + w
                        if v not in new or c < new[v]:
                            new[v] = c
                if new == dist:
                    break
                dist = new
            rows.extend((s, v, d) for v, d in dist.items())
    schema = T.StructType(
        [
            T.StructField("source", id_type),
            T.StructField("node", id_type),
            T.StructField("dist", T.LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def weighted_sssp(
    edges: DataFrame,
    sources: DataFrame,
    *,
    n_rounds: int,
    directed: bool = False,
    weight_col: str = "w",
    collect_threshold: int = 200_000,
) -> DataFrame:
    """Bounded Bellman-Ford: multi-source weighted shortest distances
    using at most ``n_rounds`` hops → (source, node, dist).

    Semantics are DEFINED as the n-round relaxation fixpoint prefix —
    dist_r(s,v) = min(dist_{r-1}(s,v), min over edges (u,v) of
    dist_{r-1}(s,u) + w(u,v)) — so the result is exact true-SSSP
    whenever ``n_rounds`` ≥ the weighted-path hop diameter, and is
    bit-replayable by ``n_rounds`` unrolled relational rounds on any
    engine (the oracle's form). Integer weights in, integer distances
    out; unreached (source, node) pairs are absent, the source itself
    reports dist 0.

    Scale shape: the dist frame (≤ |sources|·|nodes| rows of three
    ids/longs) is the only state; each round is ONE equi-join on the
    relax key plus ONE partial-agg min — no global ordering, no
    per-path state, lineage cut per round. This is the Pregel/GraphX
    SSSP recurrence expressed as DataFrame algebra; at 100 TB the
    rounds shuffle on node id and AQE handles the frontier skew.
    """
    if n_rounds < 0:
        raise ValueError("n_rounds must be >= 0")
    e = edges.select("src", "dst", F.col(weight_col).cast("long").alias("w"))
    # probe and collect fused — see _multi_bfs
    e_rows = e.limit(collect_threshold + 1).collect()
    n_edges = len(e_rows)
    if n_edges <= collect_threshold:
        # Python relaxation is O(n_rounds·n_src·E); bound the product so
        # the driver path never exceeds ~1 s of driver arithmetic. The
        # source probe must extend to the budget-implied cap — a probe
        # capped at the edge threshold would admit an arbitrarily large
        # source table whenever n_edges·n_rounds is small.
        src_cap = 20_000_000 // max(1, n_edges * max(1, n_rounds)) + 1
        src_rows = sources.select("id").limit(src_cap + 1).collect()
        n_src = len(src_rows)
        if (
            n_src <= src_cap
            and n_src * max(1, n_edges) * max(1, n_rounds) <= 20_000_000
        ):
            return _weighted_sssp_local(
                edges.sparkSession,
                [(r[0], r[1], r[2]) for r in e_rows],
                [r[0] for r in src_rows],
                edges.schema["src"].dataType,
                n_rounds,
                directed,
            )
    if not directed:
        e = e.union(
            e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
    e = e.groupBy("src", "dst").agg(F.min("w").alias("w"))
    e = e.localCheckpoint(eager=True)

    dist = sources.select(
        F.col("id").alias("source"),
        F.col("id").alias("node"),
        F.lit(0).cast("long").alias("dist"),
    ).localCheckpoint(eager=True)
    for _ in range(n_rounds):
        relaxed = (
            dist.join(e.withColumnRenamed("src", "node"), "node")
            .select(
                "source",
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("source", "node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist
