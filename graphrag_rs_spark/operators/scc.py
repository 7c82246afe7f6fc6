"""Strongly connected components + condensation layers for directed graphs.

The undirected CC kernel (operators/cc.py) resolves entity clusters; code
graphs are DIRECTED — call graphs (operators/code_graph.py:call_edges) and
import graphs have recursion groups and dependency cycles that undirected
CC cannot see.  SCC answers the questions a source-code KG user actually
asks: which functions are mutually recursive, which modules form an import
cycle, and in what order can the acyclic remainder be built
(``topological_layers`` over the condensation = parallel build waves).

Distributed algorithm: FW-BW-Trim with Orzan-style min-id coloring — the
standard shape for SCC on vertex-centric/dataflow systems (Hong et al.,
"On Fast Parallel Detection of Strongly Connected Components", and the
Slota/McLaughlin trim-color family):

  outer loop until no active nodes:
    1. TRIM      — peel nodes with no in-edge or no out-edge in the active
                   subgraph (each is a singleton SCC); cascades to fixpoint.
                   One semi-join pair per round, O(tail length) rounds.
    2. COLOR     — propagate min id FORWARD to fixpoint:
                   color(v) = min(color(v), min over u→v of color(u)).
                   After fixpoint, color(v) = min id among v's ancestors∪{v};
                   ancestors are SCC-invariant, so color is too.
    3. ROOTS+BW  — nodes with color(r)=r are SCC roots (one per color class
                   that contains its own minimum).  Grow the root set
                   BACKWARD along edges whose endpoints share a color:
                   everything reached is mutually reachable with its root
                   (forward via the color certificate, backward via the
                   sweep), i.e. exactly the root's SCC.  All roots peel in
                   parallel — one round per color class, not per SCC.
    4. PEEL      — assign scc_id = color to swept nodes, remove them, loop.

Labels are min member ids (string order), so output is deterministic under
any partitioning — same total-order tie-break contract as cc.py.

Scale notes: every step is join + algebraic groupBy (map-side combine);
state is cut with true lineage cuts per superstep.  Iteration counts are
O(longest trim tail) + O(SCC diameter) per outer round — real dependency
graphs peel in a handful of outer rounds (most mass is acyclic and dies in
TRIM; cycles are short).  Small graphs (the entity-linking-dim scale) take
the driver-side exact path: iterative Tarjan, same min-id labels by
definition — the same crossover contract as cc.py:collect_threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.iterutil import cut_lineage


def scc_sequential(edge_list, nodes) -> dict:
    """Iterative Tarjan (explicit stack — no recursion-limit hazard) over
    a small edge list; → {node: min id of its SCC}.  Deterministic: the
    label is a set minimum, independent of traversal order."""
    adj: dict = {}
    for s, d in edge_list:
        if s != d:
            adj.setdefault(s, []).append(d)
    index: dict = {}
    low: dict = {}
    on_stack: set = set()
    stack: list = []
    out: dict = {}
    counter = [0]

    for root in nodes:
        if root in index:
            continue
        # explicit DFS stack of (node, iterator position)
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            nbrs = adj.get(v, ())
            advanced = False
            while pi < len(nbrs):
                w = nbrs[pi]
                pi += 1
                if w not in index:
                    work[-1] = (v, pi)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                label = min(comp)
                for w in comp:
                    out[w] = label
            if work:
                p = work[-1][0]
                low[p] = min(low[p], low[v])
    for n in nodes:
        out.setdefault(n, n)
    return out


def _fixpoint_changed(new_labels: DataFrame) -> tuple[DataFrame, int]:
    """Materialize one superstep and probe its change counter."""
    cut = cut_lineage(new_labels, "scc")
    changed = cut.where(F.col("_changed")).count()
    return cut.drop("_changed"), changed


def strongly_connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    *,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    max_outer: int = 30,
    max_iterations: int = 200,
    collect_threshold: int = 500_000,
) -> DataFrame:
    """edges(src, dst) directed [+ vertices(id)] → (id, scc_id) with
    scc_id = min member id (string/natural order) of the node's SCC.

    Self-loops are ignored (a self-loop never merges SCCs).  Isolated
    vertices map to themselves.  ``collect_threshold`` as in cc.py: small
    graphs run driver-side Tarjan (identical labels by definition); 0
    forces the distributed FW-BW-Trim path.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    if vertices is not None:
        verts = vertices.select(F.col(id_col).alias("id")).distinct()
        # edges touching unlisted nodes propagate nothing (same contract as
        # cc.py's ghost-endpoint drop) — filter once so both paths agree
        e = e.join(verts.withColumnRenamed("id", "src"), "src", "semi").join(
            verts.withColumnRenamed("id", "dst"), "dst", "semi"
        )
    else:
        verts = (
            e.select(F.col("src").alias("id"))
            .union(e.select(F.col("dst").alias("id")))
            .distinct()
        )
    e = e.localCheckpoint(eager=True)
    verts = verts.localCheckpoint(eager=True)

    if (
        collect_threshold
        and e.count() <= collect_threshold
        and verts.count() <= collect_threshold
    ):
        import pandas as pd
        from pyspark.sql.types import StructField, StructType

        epdf = e.toPandas()
        vpdf = verts.toPandas()
        vset = set(vpdf["id"])
        # parity with the distributed path when vertices is not a superset
        # of endpoints: edges touching unlisted nodes propagate nothing
        edge_list = [
            (s, d)
            for s, d in zip(epdf["src"], epdf["dst"])
            if s in vset and d in vset
        ]
        comp = scc_sequential(edge_list, vpdf["id"].tolist())
        items = sorted(comp.items())
        id_type = verts.schema["id"].dataType
        return verts.sparkSession.createDataFrame(
            pd.DataFrame(items, columns=["id", "scc_id"]),
            StructType(
                [
                    StructField("id", id_type, False),
                    StructField("scc_id", id_type, False),
                ]
            ),
        )

    spark = e.sparkSession
    assigned: DataFrame | None = None
    active_nodes = verts
    active_edges = e

    def _accumulate(acc, part):
        part = cut_lineage(part, "scc-out")
        return part if acc is None else acc.union(part)

    for _outer in range(max_outer):
        if active_nodes.count() == 0:
            break

        # --- 1. TRIM: peel no-in or no-out nodes (singleton SCCs) ---
        for _t in range(max_iterations):
            srcs = active_edges.select(F.col("src").alias("id")).distinct()
            dsts = active_edges.select(F.col("dst").alias("id")).distinct()
            keep = active_nodes.join(srcs, "id", "semi").join(dsts, "id", "semi")
            keep = cut_lineage(keep, "scc-trim")
            n_keep = keep.count()
            trimmed = active_nodes.join(keep, "id", "anti")
            n_trim = active_nodes.count() - n_keep
            if n_trim > 0:
                assigned = _accumulate(
                    assigned, trimmed.select("id", F.col("id").alias("scc_id"))
                )
            active_nodes = keep
            if n_trim == 0:
                break
            active_edges = cut_lineage(
                active_edges.join(keep.withColumnRenamed("id", "src"), "src", "semi")
                .join(keep.withColumnRenamed("id", "dst"), "dst", "semi"),
                "scc-trim-e",
            )
        else:
            raise RuntimeError("SCC trim did not converge")

        if active_nodes.count() == 0:
            break

        # --- 2. COLOR: forward min-id propagation to fixpoint ---
        colors = active_nodes.select("id", F.col("id").alias("color"))
        colors = cut_lineage(colors, "scc-color")
        for _c in range(max_iterations):
            nbr_min = (
                active_edges.join(
                    colors.select(
                        F.col("id").alias("src"), F.col("color").alias("src_color")
                    ),
                    "src",
                )
                .groupBy("dst")
                .agg(F.min("src_color").alias("in_min"))
                .withColumnRenamed("dst", "id")
            )
            new_colors = colors.join(nbr_min, "id", "left").select(
                "id",
                F.least(
                    F.col("color"), F.coalesce(F.col("in_min"), F.col("color"))
                ).alias("color"),
                (F.col("in_min") < F.col("color")).alias("_changed"),
            )
            colors, changed = _fixpoint_changed(new_colors)
            if changed == 0:
                break
        else:
            raise RuntimeError("SCC coloring did not converge")

        # --- 3. ROOTS + BACKWARD sweep within color classes ---
        mark = colors.where(F.col("id") == F.col("color"))
        mark = cut_lineage(mark, "scc-mark")
        same_color_edges = (
            active_edges.join(
                colors.select(F.col("id").alias("src"), F.col("color").alias("sc")),
                "src",
            )
            .join(
                colors.select(F.col("id").alias("dst"), F.col("color").alias("dc")),
                "dst",
            )
            .where(F.col("sc") == F.col("dc"))
            .select("src", "dst", F.col("sc").alias("color"))
        )
        same_color_edges = cut_lineage(same_color_edges, "scc-sce")
        for _b in range(max_iterations):
            preds = (
                same_color_edges.join(
                    mark.select(F.col("id").alias("dst")), "dst", "semi"
                )
                .select(F.col("src").alias("id"), "color")
                .distinct()
            )
            grown = mark.unionByName(preds).groupBy("id").agg(
                F.min("color").alias("color")
            )
            grown = cut_lineage(grown, "scc-bw")
            if grown.count() == mark.count():
                mark = grown
                break
            mark = grown
        else:
            raise RuntimeError("SCC backward sweep did not converge")

        # --- 4. PEEL ---
        assigned = _accumulate(
            assigned, mark.select("id", F.col("color").alias("scc_id"))
        )
        active_nodes = cut_lineage(
            active_nodes.join(mark, "id", "anti"), "scc-nodes"
        )
        active_edges = cut_lineage(
            active_edges.join(
                active_nodes.withColumnRenamed("id", "src"), "src", "semi"
            ).join(active_nodes.withColumnRenamed("id", "dst"), "dst", "semi"),
            "scc-edges",
        )
    else:
        raise RuntimeError(f"SCC did not converge in {max_outer} outer rounds")

    if assigned is None:
        return spark.createDataFrame([], schema="id string, scc_id string")
    return assigned


def condensation(edges: DataFrame, scc: DataFrame) -> DataFrame:
    """Distinct SCC-level edges (scc_src, scc_dst), self-edges dropped —
    the condensation DAG of the input graph."""
    return (
        edges.join(
            scc.select(F.col("id").alias("src"), F.col("scc_id").alias("scc_src")),
            "src",
        )
        .join(
            scc.select(F.col("id").alias("dst"), F.col("scc_id").alias("scc_dst")),
            "dst",
        )
        .where(F.col("scc_src") != F.col("scc_dst"))
        .select("scc_src", "scc_dst")
        .distinct()
    )


def layers_sequential(edge_list, nodes) -> dict:
    """Kahn topological order + longest-path DP over a small edge list;
    → {node: layer}.  Raises on a cycle (same contract as the distributed
    path, which would fail to converge)."""
    adj: dict = {}
    indeg = {n: 0 for n in nodes}
    for s, d in edge_list:
        if s == d:
            continue
        adj.setdefault(s, []).append(d)
        indeg[d] = indeg.get(d, 0) + 1
        indeg.setdefault(s, 0)
    layer = {n: 0 for n in indeg}
    ready = [n for n, k in indeg.items() if k == 0]
    seen = 0
    while ready:
        nxt = []
        for u in ready:
            seen += 1
            for v in adj.get(u, ()):
                layer[v] = max(layer[v], layer[u] + 1)
                indeg[v] -= 1
                if indeg[v] == 0:
                    nxt.append(v)
        ready = nxt
    if seen != len(indeg):
        raise RuntimeError(
            "topological_layers did not converge — the input graph has a cycle"
        )
    return layer


def topological_layers(
    dag_edges: DataFrame,
    vertices: DataFrame | None = None,
    *,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    max_iterations: int = 200,
    collect_threshold: int = 500_000,
) -> DataFrame:
    """DAG edges → (id, layer) with layer = longest path from any source
    (nodes with no in-edge are layer 0).  Layer k of a build graph is the
    set of modules buildable in wave k once waves < k are done.

    Iterates layer(v) ← max(layer(v), 1 + max over u→v of layer(u)) to
    fixpoint — O(depth) supersteps on a DAG.  Raises if ``max_iterations``
    is hit, which on a finite graph means the input has a cycle (run
    ``strongly_connected_components`` + ``condensation`` first).
    """
    e = (
        dag_edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if vertices is not None:
        verts = vertices.select(F.col(id_col).alias("id")).distinct()
    else:
        verts = (
            e.select(F.col("src").alias("id"))
            .union(e.select(F.col("dst").alias("id")))
            .distinct()
        )
    if (
        collect_threshold
        and e.count() <= collect_threshold
        and verts.count() <= collect_threshold
    ):
        import pandas as pd
        from pyspark.sql.types import IntegerType, StructField, StructType

        epdf = e.toPandas()
        vpdf = verts.toPandas()
        vset = set(vpdf["id"])
        edge_list = [
            (s, d)
            for s, d in zip(epdf["src"], epdf["dst"])
            if s in vset and d in vset
        ]
        lay = layers_sequential(edge_list, vpdf["id"].tolist())
        items = sorted(lay.items())
        id_type = verts.schema["id"].dataType
        return verts.sparkSession.createDataFrame(
            pd.DataFrame(items, columns=["id", "layer"]),
            StructType(
                [
                    StructField("id", id_type, False),
                    StructField("layer", IntegerType(), False),
                ]
            ),
        )

    layers = verts.select("id", F.lit(0).cast("int").alias("layer"))
    layers = cut_lineage(layers, "topo")
    for _i in range(max_iterations):
        from_preds = (
            e.join(
                layers.select(F.col("id").alias("src"), F.col("layer").alias("pl")),
                "src",
            )
            .groupBy("dst")
            .agg((F.max("pl") + 1).alias("cand"))
            .withColumnRenamed("dst", "id")
        )
        new_layers = layers.join(from_preds, "id", "left").select(
            "id",
            F.greatest(
                F.col("layer"), F.coalesce(F.col("cand"), F.col("layer"))
            ).alias("layer"),
            (F.col("cand") > F.col("layer")).alias("_changed"),
        )
        layers, changed = _fixpoint_changed(new_layers)
        if changed == 0:
            return layers
    raise RuntimeError(
        "topological_layers did not converge — the input graph has a cycle"
    )


def build_layers(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    collect_threshold: int = 500_000,
) -> DataFrame:
    """Directed (possibly cyclic) edges → (id, scc_id, layer): SCC ids plus
    the condensation DAG's longest-path layer — the 'build waves' view of a
    dependency graph (cycles collapse to one wave)."""
    scc = strongly_connected_components(
        edges, src=src, dst=dst, collect_threshold=collect_threshold
    ).localCheckpoint(eager=True)
    cond = condensation(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")), scc
    )
    lay = topological_layers(
        cond,
        scc.select(F.col("scc_id").alias("id")).distinct(),
        src="scc_src",
        dst="scc_dst",
        collect_threshold=collect_threshold,
    )
    return scc.join(
        lay.select(F.col("id").alias("scc_id"), "layer"), "scc_id"
    ).select("id", "scc_id", "layer")


def dag_path_counts(
    dag_edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 200,
    collect_threshold: int = 500_000,
) -> DataFrame:
    """(id, n_paths): distinct source→id path counts in a DAG — the
    build-fanout / provenance-multiplicity measure ("through how many
    dependency chains can a change in a root reach this module?").
    Sources are the zero-in-degree nodes; each counts its own empty path,
    so n_paths(source) = 1 and n_paths(v) = Σ over u→v of n_paths(u).

    Classic DAG dynamic program expressed as wave-scheduled joins:
    ``topological_layers`` gives every node's longest-path layer; all
    predecessors of a layer-k node sit in layers < k, so wave k finalizes
    layer-k nodes with ONE counts⋈edges join + ONE partial-aggregated
    sum.  Each edge is pre-tagged with its head's layer and participates
    in exactly one wave — total shuffled volume is O(E), Spark jobs are
    O(depth), and only COUNTS travel (path multiplicities grow
    combinatorially; rows never do — no enumeration anywhere).

    Raises (via topological_layers) if the input has a cycle.
    """
    e = (
        dag_edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if collect_threshold:
        # driver small path: the wave loop below costs ~2 fixed-cost
        # actions per topological layer; small DAGs run the identical DP
        # locally. Cycle/max_iterations semantics are delegated to
        # topological_layers (its own guarded path — raises exactly as
        # the distributed pipeline would), and per-node sums wrap to
        # signed 64-bit like Spark's non-ANSI long sum, so counts are
        # bit-identical even at combinatorial overflow. Parity pinned in
        # tests/test_conductance_paths_dead.py.
        probe_rows = e.limit(collect_threshold + 1).collect()
        if len(probe_rows) <= collect_threshold:
            from pyspark.sql.types import LongType, StructField, StructType

            lay = {
                r["id"]: r["layer"]
                for r in topological_layers(
                    e, max_iterations=max_iterations
                ).collect()
            }
            preds: dict = {}
            for r in probe_rows:
                preds.setdefault(r["dst"], []).append(r["src"])
            counts = {v: 1 for v, l in lay.items() if l == 0}
            for v in sorted(lay, key=lambda x: lay[x]):
                if lay[v] == 0:
                    continue
                s = sum(counts[u] for u in preds.get(v, ()) if u in counts)
                counts[v] = ((s + 2**63) % 2**64) - 2**63  # Java long wrap
            id_type = e.schema["src"].dataType
            schema = StructType(
                [
                    StructField("id", id_type),
                    StructField("n_paths", LongType()),
                ]
            )
            return e.sparkSession.createDataFrame(
                sorted(counts.items(), key=lambda kv: str(kv[0])), schema
            )
    layers = topological_layers(e, max_iterations=max_iterations)
    depth_row = layers.agg(F.max("layer").alias("d")).collect()[0]
    depth = depth_row["d"] if depth_row["d"] is not None else 0
    # tag each edge with the wave that finalizes its head
    e_tagged = cut_lineage(
        e.join(
            layers.select(F.col("id").alias("dst"), F.col("layer").alias("_wave")),
            "dst",
        ),
        "pathcount-edges",
    )
    counts = cut_lineage(
        layers.where(F.col("layer") == 0).select(
            "id", F.lit(1).cast("long").alias("n_paths")
        ),
        "pathcount-0",
    )
    for wave in range(1, depth + 1):
        new = (
            e_tagged.where(F.col("_wave") == wave)
            .join(
                counts.select(F.col("id").alias("src"), F.col("n_paths").alias("_n")),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum("_n").alias("n_paths"))
            .select(F.col("dst").alias("id"), "n_paths")
        )
        counts = cut_lineage(counts.unionAll(new), f"pathcount-{wave}")
    return counts


def transitive_reduction(
    dag_edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 200,
    collect_threshold: int = 500_000,
) -> DataFrame:
    """DAG edges → (src, dst): the unique minimal edge subset with the
    same reachability (Aho–Garey–Ullman 1972 — uniqueness holds for
    DAGs). An edge (u, v) is redundant iff some length-≥2 path u ⇝ v
    exists, i.e. iff ∃w with edge (u, w) and w ⇝ v in the ≥1-step
    closure. The minimal "must build before" view of a condensed
    dependency graph (compose after scc + condensation for cyclic
    input).

    Raises ValueError if the input has a cycle (detected exactly: the
    closure contains a self-pair).

    Scale shape: the ≥1-step closure is grown by iterative
    (reach ⋈ edges) rounds with lineage cuts — O(longest path) rounds,
    state = reachability pairs, the same budget the path-counting DP
    already spends; redundancy is then ONE self-join + left_anti.
    Below ``collect_threshold`` edges the identical closure runs on the
    driver (guarded small-path pattern; path-equality pinned in
    tests/test_transitive_reduction.py).
    """
    e = (
        dag_edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    # closure work on the driver is O(n_src_with_outedges · E) ≤ E², so
    # the small path bounds E² (not just E — the sibling small paths all
    # bound the work product, and an un-bounded closure over a chain-like
    # 500k-edge DAG would build ~V² reach entries in driver dicts)
    local_cap = min(collect_threshold, 5_000)
    # probe and collect fused into one action
    probe_rows = e.limit(local_cap + 1).collect()
    if len(probe_rows) <= local_cap:
        rows = [(r[0], r[1]) for r in probe_rows]
        adj: dict = {}
        for u, v in rows:
            adj.setdefault(u, []).append(v)
        reach: dict = {}
        for s in adj:
            seen: set = set()
            stack = list(adj[s])
            while stack:
                w = stack.pop()
                if w in seen:
                    continue
                seen.add(w)
                stack.extend(adj.get(w, ()))
            if s in seen:
                raise ValueError(
                    "transitive_reduction: input graph has a cycle "
                    f"(through {s!r}) — condense SCCs first"
                )
            reach[s] = seen
        kept = [
            (u, v)
            for u, v in rows
            if not any(v in reach.get(w, ()) for w in adj[u] )
        ]
        from pyspark.sql import types as T

        id_type = dag_edges.schema[src].dataType
        schema = T.StructType(
            [T.StructField("src", id_type), T.StructField("dst", id_type)]
        )
        return dag_edges.sparkSession.createDataFrame(kept, schema)

    e = e.localCheckpoint(eager=True)
    reach_df = e
    for _ in range(max_iterations):
        grown = (
            reach_df.join(
                e.select(
                    F.col("src").alias("dst"), F.col("dst").alias("nxt")
                ),
                "dst",
            )
            .select("src", F.col("nxt").alias("dst"))
            .unionByName(reach_df)
            .distinct()
        )
        reach_df, n_new = _fixpoint_changed(
            grown.join(reach_df, ["src", "dst"], "left_anti")
            .select("src", "dst", F.lit(True).alias("_changed"))
            .unionByName(
                reach_df.select("src", "dst", F.lit(False).alias("_changed"))
            )
        )
        if n_new == 0:
            break
    else:
        raise RuntimeError(
            f"transitive_reduction closure did not converge within "
            f"max_iterations={max_iterations}"
        )
    if reach_df.where(F.col("src") == F.col("dst")).limit(1).count() > 0:
        raise ValueError(
            "transitive_reduction: input graph has a cycle — condense "
            "SCCs first"
        )
    redundant = (
        e.alias("c")
        .join(
            e.select(F.col("src").alias("c_src"), F.col("dst").alias("w")),
            F.col("c.src") == F.col("c_src"),
        )
        .join(
            reach_df.select(
                F.col("src").alias("w"), F.col("dst").alias("c_dst")
            ),
            ["w"],
        )
        .where(F.col("c.dst") == F.col("c_dst"))
        .select(F.col("c.src").alias("src"), F.col("c.dst").alias("dst"))
        .distinct()
    )
    return e.join(redundant, ["src", "dst"], "left_anti")
