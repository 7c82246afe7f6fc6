"""G1-G3: Leiden-style community detection + extractive summaries.

The reference runs sequential greedy modularity local-moving + a
connectivity refinement phase over an in-memory petgraph
(graph/leiden.rs:465-783; singleton init :547-556, local moving :519-535,
refinement-split-to-connected-components :598-708; hierarchy is
single-level in practice, :506-544). A sequential sweep doesn't
distribute, so we re-express it as the standard scalable equivalent
(SURVEY §4, accepted semantic substitution — communities feed summaries,
not the scored triples):

1. **weighted synchronous label propagation** as iterative DataFrame
   self-joins: each superstep every node adopts the label with the largest
   incident edge-weight sum, ties broken by smallest label (total order ⇒
   deterministic under any execution order; no RNG, honoring the
   reference's seeded-determinism contract leiden.rs:438-439).
2. **connectivity refinement** (the part of Leiden that label propagation
   shares with the reference exactly): final communities are split into
   their connected components via the shared hashmin CC kernel, so every
   emitted community is a connected subgraph — the invariant Leiden adds
   over Louvain (leiden.rs:598-708).
3. **summaries** (G3): per community, members grouped by entity type, top-5
   names per type + "and N more" (leiden.rs:145-242) — pure column ops.

Scale notes: supersteps are join+groupBy pairs (two shuffles each) with
lineage cut by localCheckpoint; hot vertices are handled by map-side
partial aggregation of the (dst, label) weight sums; iteration count is
bounded by config (LP converges in a handful of rounds on KG graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphrag_rs_spark.config import DEFAULT_CONFIG, PipelineConfig
from graphrag_rs_spark.operators.cc import connected_components


def triples_to_edges(triples: DataFrame) -> DataFrame:
    """G2: project triples onto an undirected weighted edge list
    (core/mod.rs:1054-1073 — weight = confidence)."""
    e = triples.select(
        F.col("subj").alias("src"),
        F.col("obj").alias("dst"),
        F.col("confidence").cast("double").alias("weight"),
    ).where(F.col("src") != F.col("dst"))
    return (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"))
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


def detect_communities(
    triples: DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """triples → communities(level, entity_id, community_id).

    level is always 0 (the reference's hierarchical variant also fills only
    level 0 in practice, leiden.rs:506-544). community_id is a dense long,
    stable across re-runs (derived from the min member id).
    """
    edges = triples_to_edges(triples)
    labels = label_propagation(
        edges, max_iterations=config.community_max_iterations
    )

    # refinement: split non-connected communities into connected components
    # (leiden.rs:598-708) — restrict edges to same-label endpoints, CC within
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
