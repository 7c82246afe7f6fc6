"""G1-G3: Leiden-style community detection + extractive summaries.

The reference runs sequential greedy modularity local-moving + a
connectivity refinement phase over an in-memory petgraph
(graph/leiden.rs:465-783; singleton init :547-556, local moving :519-535,
refinement-split-to-connected-components :598-708; hierarchy is
single-level in practice, :506-544). A sequential sweep doesn't
distribute, so we re-express it as the standard scalable equivalent
(SURVEY §4, accepted semantic substitution — communities feed summaries,
not the scored triples):

1. **ΔQ modularity local moving** (modularity_local_moving): synchronous
   supersteps evaluating the reference's Newman ΔQ per candidate move,
   with resolution / min_improvement / max_cluster_size knobs — replacing
   round 1's min-biased label propagation, which had no objective and
   over-merged dense-but-modular graphs into one community.
2. **mutual-best community merging** (the distributed Louvain second
   phase): resolves the symmetric stall states synchronous node moves
   can't escape (e.g. a clique split into equal halves).
3. **connectivity refinement** (the part of Leiden the reference adds over
   Louvain, leiden.rs:598-708): final communities are split into their
   connected components via the shared hashmin CC kernel, so every
   emitted community is a connected subgraph.
4. **summaries** (G3): per community, members grouped by entity type, top-5
   names per type + "and N more" (leiden.rs:145-242) — pure column ops;
   **context** (G4): LLM-ready entity + intra-community-triple rendering.

`label_propagation` (the round-1 kernel) is kept as a cheap alternative
for callers that only need connectivity-ish grouping.

Scale notes: supersteps are joins+groupBys with lineage cut per round by
iterutil.cut_lineage (checkpoint/localCheckpoint retain originStats plan
back-references → exponential planning in iterative self-join algorithms;
see iterutil.py); hot vertices are handled by map-side partial
aggregation; iteration count is bounded by config. Per-superstep cost is
scheduling-dominated on small graphs and shuffle-dominated at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

import os

from graphrag_rs_spark.config import DEFAULT_CONFIG, PipelineConfig
from graphrag_rs_spark.iterutil import cut_lineage

_DEBUG = bool(os.environ.get("GRAPHRAG_COMM_DEBUG"))
from graphrag_rs_spark.operators.cc import connected_components


def triples_to_edges(triples: DataFrame) -> DataFrame:
    """G2: project triples onto an undirected weighted edge list
    (core/mod.rs:1054-1073 — weight = confidence)."""
    e = triples.select(
        F.col("subj").alias("src"),
        F.col("obj").alias("dst"),
        F.col("confidence").cast("double").alias("weight"),
    ).where(F.col("src") != F.col("dst"))
    # both directions from ONE evaluation of the upstream (a self-union
    # scans the triples pipeline twice per action; identical row multiset)
    from graphrag_rs_spark.iterutil import both_dirs

    return (
        both_dirs(e, "weight")
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )


def label_propagation(
    edges: DataFrame,
    *,
    max_iterations: int = 20,
) -> DataFrame:
    """edges(src, dst, weight) → (id, label): weighted synchronous LP.

    Each superstep a node looks at the argmax-by-incident-weight label among
    its neighbors (ties → smallest label) and adopts it ONLY if it is
    smaller than its current label. The min-bias makes every label
    non-increasing, so the iteration is monotone — synchronous LP's classic
    two-cycle oscillation cannot occur and convergence is guaranteed; with
    singleton init the extra constraint only affects which of two
    symmetric labels a community ends up with, which the connectivity
    refinement re-splits anyway. Deterministic under any partitioning
    (total-order tie-breaks, no RNG — honoring the reference's seeded
    determinism contract, leiden.rs:438-439).

    Every superstep eagerly localCheckpoints (GraphFrames cadence): the
    convergence probe and the next round read materialized state instead
    of re-executing a growing join lineage.
    """
    verts = edges.select(F.col("src").alias("id")).distinct()
    labels = verts.select("id", F.col("id").alias("label"))
    edges = edges.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iterations):
        # sum of incident weights per (node, neighbor label)
        votes = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy("dst", "label")
            .agg(F.sum("weight").alias("wsum"))
        )
        w = Window.partitionBy("dst").orderBy(F.col("wsum").desc(), F.col("label").asc())
        best = (
            votes.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("dst").alias("id"), F.col("label").alias("new_label"))
        )
        new_labels = (
            labels.join(best, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("new_label", "label")).alias("label"),
                (F.coalesce("new_label", "label") < F.col("label")).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels


def _collect_inner_hashes(sym: DataFrame) -> dict:
    """Per-id Spark xxhash64 (seed 42) for the eligibility-gate mirror: the
    sequential kernel chains XXH64.hashInt(it, seed=this) exactly as
    ``F.xxhash64(src, lit(it))`` does (one tiny job on a materialized frame)."""
    rows = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("h", F.xxhash64("id"))
        .collect()
    )
    return {r["id"]: r["h"] for r in rows}


def _labels_df(sym: DataFrame, labels: dict, col: str = "label") -> DataFrame:
    """Materialize a sequential-kernel label dict as (id, label) with the
    same id type as the edge endpoints."""
    from pyspark.sql.types import StructField, StructType

    id_type = sym.schema["src"].dataType
    schema = StructType(
        [StructField("id", id_type, False), StructField(col, id_type, False)]
    )
    spark = sym.sparkSession
    return spark.createDataFrame(sorted(labels.items()), schema)


def modularity_local_moving(
    edges: DataFrame,
    *,
    resolution: float = 1.0,
    max_iterations: int = 20,
    min_improvement: float = 0.001,
    max_cluster_size: int | None = None,
    small_graph_edges: int | None = 100_000,
    materialized: bool = False,
) -> DataFrame:
    """edges(src, dst, weight) SYMMETRIC → (id, label): distributed greedy
    modularity local moving (the Leiden phase-2 objective,
    leiden.rs:519-535 / ΔQ Newman formula leiden.rs:711-736).

    Per synchronous superstep, every eligible node evaluates moving to each
    neighboring community using the reference's ΔQ:

        ΔQ(i: from→to) = (k_{i,to} − k_{i,from}) / 2m
                         − resolution · d_i · (Σtot_to − Σtot_from + d_i) / (2m)²

    generalized to edge weights (the reference counts unweighted neighbor
    edges, petgraph `neighbors()` — our formula reduces to it when all
    weights are 1). Moves apply only when ΔQ > 0, argmax with smallest-label
    tie-break (deterministic, honoring the seeded-determinism contract
    leiden.rs:438-439).

    Synchronous-update safety: the sequential reference can never oscillate;
    a parallel sweep can (two singletons swapping forever). Each superstep
    only nodes with pmod(xxhash64(id, iter), 2) == 0 may move — a
    deterministic alternating subset that breaks swap symmetry while
    preserving convergence (standard distributed-Louvain practice).

    Stops on: no moves, modularity improvement < min_improvement
    (leiden.rs:461 min_improvement config), or max_iterations.

    ``max_cluster_size`` (leiden.rs:433, default 10 — declared but never
    enforced by the reference's algorithm, so our default is None): when
    set, a move into a community at or above the cap is gated. The cap is
    soft under synchronous updates (several nodes may enter one community
    in the same superstep); the connectivity refinement in
    detect_communities can only shrink communities further.

    ``small_graph_edges``: symmetric edge lists at or under this bound run
    the exact sequential mirror (kernel/communities.py) in the driver —
    byte-identical labels (parity-tested in tests/test_communities.py),
    none of the per-superstep distributed fixed cost. The distributed path
    below is the scale path.
    """
    sym = edges if materialized else edges.localCheckpoint(eager=True)
    # probe and collect fused into one action (count + collect was two)
    rows = (
        sym.limit(small_graph_edges + 1).collect() if small_graph_edges else None
    )
    if small_graph_edges and len(rows) <= small_graph_edges:
        from graphrag_rs_spark.kernel.communities import modularity_sequential

        labels = modularity_sequential(
            [(r["src"], r["dst"], float(r["weight"])) for r in rows],
            _collect_inner_hashes(sym),
            resolution=resolution,
            max_iterations=max_iterations,
            min_improvement=min_improvement,
            max_cluster_size=max_cluster_size,
        )
        return _labels_df(sym, labels)

    deg = sym.groupBy("src").agg(F.sum("weight").alias("deg")).withColumnRenamed("src", "id")
    verts = deg.select("id", "deg").localCheckpoint(eager=True)
    # Σ deg over all vertices == Σ weight over the symmetric edges == 2m
    row = verts.agg(F.sum("deg").alias("m2")).collect()[0]
    m2 = float(row["m2"] or 0.0)
    labels = verts.select("id", F.col("id").alias("label"))
    if m2 <= 0.0:
        return labels

    labels = _local_moves(
        sym, verts, labels, m2,
        resolution=resolution, max_iterations=max_iterations,
        min_improvement=min_improvement, max_cluster_size=max_cluster_size,
    )
    # community-level aggregation (the Louvain "second phase", distributed
    # as parallel mutual-best matching): synchronous node-level moves stall
    # on symmetric configurations (e.g. a clique split into two equal halves
    # swaps members forever with zero net ΔQ, where the sequential reference
    # would coalesce) — merging whole communities with positive merge-ΔQ
    # resolves exactly those states
    labels = _merge_communities(
        sym, verts, labels, m2,
        resolution=resolution, max_cluster_size=max_cluster_size,
    )
    # short node-level cleanup pass so individual nodes can re-seat after
    # the merges
    labels = _local_moves(
        sym, verts, labels, m2,
        resolution=resolution, max_iterations=min(3, max_iterations),
        min_improvement=min_improvement, max_cluster_size=max_cluster_size,
    )
    return labels


def _local_moves(
    sym: DataFrame,
    verts: DataFrame,
    labels: DataFrame,
    m2: float,
    *,
    resolution: float,
    max_iterations: int,
    min_improvement: float,
    max_cluster_size: int | None,
) -> DataFrame:
    """Synchronous ΔQ local-moving supersteps (see modularity_local_moving).

    Stop conditions account for the alternating eligibility gate: a single
    quiet round may just mean the movable nodes weren't eligible this
    parity, so convergence requires TWO consecutive quiet rounds (quiet =
    fewer than 0.2% of nodes moved — tail iterations shuffling a handful
    of nodes cost a full superstep each for negligible ΔQ), plus the
    modularity-improvement probe across two-round windows.
    """
    n_nodes = verts.count()
    quiet_threshold = max(1, n_nodes // 500)
    prev_q = None
    zero_rounds = 0
    for it in range(max_iterations):
        lab = labels
        # k_{i,c}: summed edge weight from each node to each neighbor community
        k = (
            sym.join(
                lab.select(F.col("id").alias("dst"), F.col("label").alias("dst_label")),
                "dst",
            )
            .groupBy("src", "dst_label")
            .agg(F.sum("weight").alias("k"))
        )
        cur = lab.select(F.col("id").alias("src"), F.col("label").alias("cur_label"))
        k2 = k.join(cur, "src")
        k_from = (
            k2.where(F.col("dst_label") == F.col("cur_label"))
            .select("src", F.col("k").alias("k_from"))
        )
        # Σtot per community (weighted degree mass)
        sigma = (
            lab.join(verts, "id")
            .groupBy("label")
            .agg(F.sum("deg").alias("tot"))
        )

        cand = (
            k2.where(F.col("dst_label") != F.col("cur_label"))
            # eligibility gate first: halves the ΔQ work per superstep
            .where(F.pmod(F.xxhash64("src", F.lit(it)), F.lit(2)) == 0)
            .join(k_from, "src", "left")
            .join(verts.select(F.col("id").alias("src"), "deg"), "src")
            .join(
                sigma.select(F.col("label").alias("dst_label"), F.col("tot").alias("tot_to")),
                "dst_label",
            )
            .join(
                sigma.select(F.col("label").alias("cur_label"), F.col("tot").alias("tot_from")),
                "cur_label",
            )
            .withColumn(
                "dq",
                (F.col("k") - F.coalesce("k_from", F.lit(0.0))) / F.lit(m2)
                - F.lit(resolution)
                * F.col("deg")
                * (F.col("tot_to") - F.col("tot_from") + F.col("deg"))
                / F.lit(m2 * m2),
            )
            .where(F.col("dq") > 0)
        )
        if max_cluster_size is not None:
            sizes = lab.groupBy("label").agg(F.count("*").alias("sz"))
            cand = cand.join(
                sizes.select(F.col("label").alias("dst_label"), "sz"), "dst_label"
            ).where(F.col("sz") < max_cluster_size)

        w = Window.partitionBy("src").orderBy(F.col("dq").desc(), F.col("dst_label").asc())
        moves = (
            cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("src").alias("id"), F.col("dst_label").alias("new_label"))
        )
        # fold the move count into the lineage-cut write: an Observation on
        # the written plan is computed during the write job itself, so each
        # superstep costs exactly ONE Spark action (was write + count)
        from pyspark.sql import Observation

        obs = Observation()
        labels = cut_lineage(
            labels.join(moves, "id", "left")
            .select(
                "id",
                F.coalesce("new_label", "label").alias("label"),
                F.col("new_label").isNotNull().alias("_moved"),
            )
            .observe(obs, F.sum(F.col("_moved").cast("long")).alias("n_moved"))
            .drop("_moved"),
            tag="lm-labels",
        )
        n_moved = int(obs.get["n_moved"] or 0)
        if _DEBUG:
            import sys
            print(f"[communities] iter={it} moved={n_moved}/{n_nodes}", file=sys.stderr)
        if n_moved < quiet_threshold:
            zero_rounds += 1
            if zero_rounds >= 2:
                break
            continue
        zero_rounds = 0
        if min_improvement > 0 and it % 3 == 2:
            # Q = Σ_intra w / 2m − resolution · Σ_c (tot_c / 2m)²
            l_s = labels.select(F.col("id").alias("src"), F.col("label").alias("ls"))
            l_d = labels.select(F.col("id").alias("dst"), F.col("label").alias("ld"))
            intra = (
                sym.join(l_s, "src").join(l_d, "dst")
                .where(F.col("ls") == F.col("ld"))
                .agg(F.coalesce(F.sum("weight"), F.lit(0.0)).alias("w"))
            )
            tots = (
                labels.join(verts, "id").groupBy("label").agg(F.sum("deg").alias("tot"))
                .agg(F.sum((F.col("tot") / F.lit(m2)) ** 2).alias("s"))
            )
            q_row = intra.crossJoin(tots).select(
                (F.col("w") / F.lit(m2) - F.lit(resolution) * F.col("s")).alias("q")
            ).collect()[0]
            q = float(q_row["q"])
            if prev_q is not None and q - prev_q < min_improvement:
                break
            prev_q = q
    return labels


def _merge_communities(
    sym: DataFrame,
    verts: DataFrame,
    labels: DataFrame,
    m2: float,
    *,
    resolution: float,
    max_cluster_size: int | None,
    max_rounds: int = 10,
) -> DataFrame:
    """Greedy community aggregation by parallel mutual-best matching.

    Merge ΔQ for communities A, B (sym edge mass S_AB counts both
    directions): ΔQ = S_AB / 2m − 2·resolution·Σtot_A·Σtot_B / (2m)².
    Each round every community points at its best positive-ΔQ neighbor;
    pairs that point at each other merge (label = smaller of the two) —
    deterministic, no RNG, converges in ≤ log(n) rounds per chain.
    """
    for _ in range(max_rounds):
        l_s = labels.select(F.col("id").alias("src"), F.col("label").alias("la"))
        l_d = labels.select(F.col("id").alias("dst"), F.col("label").alias("lb"))
        ce = (
            sym.join(l_s, "src").join(l_d, "dst")
            .where(F.col("la") != F.col("lb"))
            .groupBy("la", "lb")
            .agg(F.sum("weight").alias("s"))
        )
        tots = labels.join(verts, "id").groupBy("label").agg(F.sum("deg").alias("tot"))
        cand = (
            ce.join(tots.select(F.col("label").alias("la"), F.col("tot").alias("tot_a")), "la")
            .join(tots.select(F.col("label").alias("lb"), F.col("tot").alias("tot_b")), "lb")
            .withColumn(
                "dq",
                # ce rows hold ONE direction of the symmetric edge mass
                # (src∈A, dst∈B), hence the factor 2 on s
                F.lit(2.0) * F.col("s") / F.lit(m2)
                - F.lit(2.0 * resolution) * F.col("tot_a") * F.col("tot_b") / F.lit(m2 * m2),
            )
            .where(F.col("dq") > 0)
        )
        if max_cluster_size is not None:
            sizes = labels.groupBy("label").agg(F.count("*").alias("sz"))
            cand = (
                cand.join(sizes.select(F.col("label").alias("la"), F.col("sz").alias("sz_a")), "la")
                .join(sizes.select(F.col("label").alias("lb"), F.col("sz").alias("sz_b")), "lb")
                .where(F.col("sz_a") + F.col("sz_b") <= max_cluster_size)
            )
        w = Window.partitionBy("la").orderBy(F.col("dq").desc(), F.col("lb").asc())
        best = (
            cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("la", "lb")
        )
        # mutual pairs are ≤ one per two communities — usually a small
        # set, so collect them (one action, was checkpoint + count) and
        # re-broadcast as a literal frame for the relabel join. GUARD:
        # on a graph still holding millions of communities the pair set
        # itself is data-sized — the limit-probe detects that and this
        # round falls back to the fully-distributed parquet-cut join
        # instead of pulling millions of rows through the driver.
        mutual_df = (
            best.alias("x")
            .join(
                best.select(F.col("la").alias("lb"), F.col("lb").alias("la")).alias("y"),
                ["la", "lb"],
            )
            .where(F.col("la") < F.col("lb"))
            .select(F.col("lb").alias("label"), F.col("la").alias("new_label"))
        )
        max_collect = 100_000
        mutual_rows = mutual_df.limit(max_collect + 1).collect()
        if not mutual_rows:
            break
        if len(mutual_rows) <= max_collect:
            from pyspark.sql.types import StructField, StructType

            lab_type = labels.schema["label"].dataType
            mutual = F.broadcast(
                labels.sparkSession.createDataFrame(
                    [(r["label"], r["new_label"]) for r in mutual_rows],
                    StructType(
                        [
                            StructField("label", lab_type, False),
                            StructField("new_label", lab_type, False),
                        ]
                    ),
                )
            )
        else:
            mutual = cut_lineage(mutual_df, tag="merge-pairs")
        labels = cut_lineage(
            labels.join(mutual, "label", "left")
            .select("id", F.coalesce("new_label", "label").alias("label")),
            tag="merge-labels",
        )
    return labels


def detect_communities(
    triples: DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """triples → communities(level, entity_id, community_id).

    level is always 0 (the reference's hierarchical variant also fills only
    level 0 in practice, leiden.rs:506-544). community_id is a dense long,
    stable across re-runs (derived from the min member id).

    Round-2: the clustering objective is the reference's greedy-modularity
    local moving (with resolution / min_improvement / max_cluster_size
    knobs) instead of min-biased label propagation, which had no objective
    and over-merged dense-but-modular graphs into one community.
    """
    # materialize the projected edges once: both the clustering and the
    # refinement read them, and the upstream triple pipeline must not rerun
    edges = triples_to_edges(triples).localCheckpoint(eager=True)
    threshold = getattr(config, "community_small_graph_edges", 100_000)

    if threshold and edges.count() <= threshold:
        # exact sequential path (kernel/communities.py): clustering AND the
        # connectivity refinement in the driver — ~4 tiny Spark jobs total
        # instead of ~1 per superstep. Byte-identical to the distributed
        # path (parity-tested); the reference itself is in-memory
        # (leiden.rs:465-783).
        from graphrag_rs_spark.kernel.communities import (
            modularity_sequential,
            union_find_components,
        )

        rows = edges.collect()
        erows = [(r["src"], r["dst"], float(r["weight"])) for r in rows]
        labels = modularity_sequential(
            erows,
            _collect_inner_hashes(edges),
            resolution=config.community_resolution,
            max_iterations=config.community_max_iterations,
            min_improvement=config.community_min_improvement,
            max_cluster_size=config.community_max_cluster_size,
        )
        intra = [(s, d) for s, d, _ in erows if labels[s] == labels[d]]
        comp = union_find_components(intra, labels.keys())
        refined = _labels_df(edges, comp, col="component")
    else:
        labels = modularity_local_moving(
            edges,
            resolution=config.community_resolution,
            max_iterations=config.community_max_iterations,
            min_improvement=config.community_min_improvement,
            max_cluster_size=config.community_max_cluster_size,
            small_graph_edges=0,
            materialized=True,
        )

        # refinement: split non-connected communities into connected
        # components (leiden.rs:598-708) — restrict edges to same-label
        # endpoints, CC within
        lab_src = labels.select(F.col("id").alias("src"), F.col("label").alias("lab_s"))
        lab_dst = labels.select(F.col("id").alias("dst"), F.col("label").alias("lab_d"))
        intra = (
            edges.join(lab_src, "src")
            .join(lab_dst, "dst")
            .where(F.col("lab_s") == F.col("lab_d"))
            .select("src", "dst")
        )
        refined = connected_components(intra, vertices=labels.select("id"))

    # stable long community ids: hash of the component key (min member id).
    # A global dense_rank would funnel every row through one task — at
    # 10^12-file scale that's the bottleneck; xxhash64 is deterministic,
    # distributed, and collision-safe at realistic community counts.
    return refined.select(
        F.lit(0).cast("long").alias("level"),
        F.col("id").alias("entity_id"),
        F.xxhash64("component").alias("community_id"),
    )


def community_context(
    communities: DataFrame,
    entities: DataFrame,
    triples: DataFrame,
) -> DataFrame:
    """G4: LLM-ready context per community (leiden.rs:260-312
    prepare_community_context).

    → (community_id, context): a markdown block with the entity list
    ("- name (TYPE): confidence c.cc, N mentions") and every
    INTRA-community triple ("- subj --[pred]--> obj (confidence: c.cc)").
    Lines are sorted for determinism (the reference iterates hash maps).
    One join per triple endpoint + two groupBys — no per-community work.
    """
    members = communities.select("community_id", "entity_id").join(
        entities.select(
            "entity_id", "name", "entity_type", "confidence",
            F.coalesce("mention_count", F.lit(0)).alias("mention_count"),
        ),
        "entity_id",
        "left",
    )
    ent_lines = members.select(
        "community_id",
        F.format_string(
            "- %s (%s): confidence %.2f, %d mentions",
            F.coalesce("name", F.col("entity_id")),
            F.coalesce("entity_type", F.lit("UNKNOWN")),
            F.coalesce("confidence", F.lit(0.0)).cast("double"),
            F.col("mention_count").cast("long"),
        ).alias("line"),
    ).groupBy("community_id").agg(
        F.concat_ws("\n", F.sort_array(F.collect_list("line"))).alias("entity_block")
    )

    mem_s = members.select(
        F.col("entity_id").alias("subj"),
        F.col("community_id").alias("c_s"),
        F.col("name").alias("subj_name"),
    )
    mem_o = members.select(
        F.col("entity_id").alias("obj"),
        F.col("community_id").alias("c_o"),
        F.col("name").alias("obj_name"),
    )
    intra = (
        triples.join(mem_s, "subj")
        .join(mem_o, "obj")
        .where(F.col("c_s") == F.col("c_o"))
        .select(
            F.col("c_s").alias("community_id"),
            F.format_string(
                "- %s --[%s]--> %s (confidence: %.2f)",
                F.coalesce("subj_name", F.col("subj")),
                F.col("pred"),
                F.coalesce("obj_name", F.col("obj")),
                F.col("confidence").cast("double"),
            ).alias("line"),
        )
        .groupBy("community_id")
        .agg(
            F.concat_ws("\n", F.sort_array(F.collect_list("line"))).alias("rel_block")
        )
    )

    return (
        ent_lines.join(intra, "community_id", "left")
        .select(
            "community_id",
            F.concat(
                F.lit("# Community "), F.col("community_id").cast("string"),
                F.lit(" at Level 0\n\n## Entities:\n"), F.col("entity_block"),
                F.lit("\n\n## Relationships:\n"),
                F.coalesce("rel_block", F.lit("")),
            ).alias("context"),
        )
    )


def summarize_communities(
    communities: DataFrame,
    entities: DataFrame,
    clusters: DataFrame | None = None,
    *,
    top_names_per_type: int = 5,
) -> DataFrame:
    """G3: extractive summaries (leiden.rs:145-242).

    Returns (community_id, member_count, summary). If ``clusters`` is given,
    community members are canonical ids — resolve names via the canonical
    entity; else directly from ``entities``.
    """
    ent = entities.select("entity_id", "name", "entity_type", "confidence")
    members = communities.join(ent, "entity_id", "left").select(
        "community_id",
        "entity_id",
        F.coalesce("name", F.col("entity_id")).alias("name"),
        F.coalesce("entity_type", F.lit("UNKNOWN")).alias("entity_type"),
    )

    per_type = (
        members.groupBy("community_id", "entity_type")
        .agg(F.sort_array(F.collect_list("name")).alias("names"))
        .select(
            "community_id",
            "entity_type",
            F.size("names").alias("n"),
            F.concat_ws(", ", F.slice("names", 1, top_names_per_type)).alias("top_names"),
        )
        .withColumn(
            "type_line",
            F.concat(
                F.lit("- "),
                F.col("entity_type"),
                F.lit(": "),
                F.col("top_names"),
                F.when(
                    F.col("n") > top_names_per_type,
                    F.concat(F.lit(" and "), (F.col("n") - top_names_per_type).cast("string"), F.lit(" more")),
                ).otherwise(F.lit("")),
            ),
        )
    )

    return (
        per_type.groupBy("community_id")
        .agg(
            F.sum("n").alias("member_count"),
            F.concat_ws("\n", F.sort_array(F.collect_list("type_line"))).alias("type_lines"),
        )
        .select(
            "community_id",
            "member_count",
            F.concat(
                F.lit("Community "), F.col("community_id").cast("string"),
                F.lit(" (Level 0)\nContains "), F.col("member_count").cast("string"),
                F.lit(" entities:\n"), F.col("type_lines"),
            ).alias("summary"),
        )
    )


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    *,
    gamma: float = 1.0,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
) -> DataFrame:
    """Per-community modularity contributions of a partition →
    (community_id, intra_weight, degree_weight, contribution); total
    modularity Q = sum(contribution).

    ``edges`` must be the SYMMETRIC projection (both directions present —
    ``triples_to_edges`` output); ``labels`` is (id, label).  For each
    community c: contribution = intra_c/W − γ·(deg_c/W)² with W the total
    symmetric weight (= 2m).  This is the quality score the Leiden
    local-moving loop optimizes — materialized as an operator so a 100 TB
    partition can be AUDITED without rerunning detection (compare two
    partitions, track Q across incremental updates, alert on regression).

    Scale shape: two broadcast-able label joins (labels are ids-only),
    one partial-agg groupBy per term, and the scalar W rides a 1-row
    broadcast join — no collect, no per-community work.  With integer
    edge weights every aggregate is exact, so the floating-point
    contributions are single-rounded arithmetic on exact sums —
    bit-replayable by any engine.
    """
    lab_s = labels.select(F.col("id").alias(src), F.col("label").alias("_c_s"))
    lab_d = labels.select(F.col("id").alias(dst), F.col("label").alias("_c_d"))
    e = (
        edges.select(src, dst, F.col(weight).cast("double").alias("_w"))
        .join(F.broadcast(lab_s), src)
        .join(F.broadcast(lab_d), dst)
    )
    total = e.agg(F.sum("_w").alias("_total"))
    deg_c = (
        e.groupBy(F.col("_c_s").alias("community_id"))
        .agg(F.sum("_w").alias("degree_weight"))
    )
    intra_c = (
        e.where(F.col("_c_s") == F.col("_c_d"))
        .groupBy(F.col("_c_s").alias("community_id"))
        .agg(F.sum("_w").alias("intra_weight"))
    )
    g = F.lit(float(gamma))
    return (
        deg_c.join(intra_c, "community_id", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "community_id",
            F.coalesce("intra_weight", F.lit(0.0)).alias("intra_weight"),
            "degree_weight",
            (
                F.coalesce("intra_weight", F.lit(0.0)) / F.col("_total")
                # explicit r*r, not pow(r, 2): Math.pow is only 1-ulp
                # accurate and can differ from C pow — multiplication is
                # single-rounded identically on every engine
                - g
                * (F.col("degree_weight") / F.col("_total"))
                * (F.col("degree_weight") / F.col("_total"))
            ).alias("contribution"),
        )
    )
