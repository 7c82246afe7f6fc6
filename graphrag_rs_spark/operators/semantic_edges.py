"""R3: semantic-similarity edges + G11 graph statistics.

R3 (graph/mod.rs:244-289): for entities with embeddings, connect pairs
with cosine > similarity_threshold, keeping at most ``max_connections``
per entity, edge type SEMANTICALLY_SIMILAR. The reference's O(n²) cosine
loop becomes LSH-bucketed candidate generation + exact re-rank
(operators/similarity.py), then a per-entity top-k window.

G11 (graph/mod.rs:330-394): entity counts by type, avg entities/chunk,
degree stats — plain aggregations, used as run metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.similarity import cosine_topk_lsh


def semantic_edges(
    entities_with_embeddings: DataFrame,
    *,
    dim: int,
    similarity_threshold: float = 0.8,
    max_connections: int = 10,
    method: str = "lsh",
) -> DataFrame:
    """entities(entity_id, embedding) →
    triples(subj, pred=SEMANTICALLY_SIMILAR, obj, confidence=cosine).

    ``method``: "lsh" (default — bucketed candidates, the scale path) or
    "exact" (brute-force cosine top-k, matching the reference's O(n²) loop
    literally; SQL-oracle-able, sized for dim-scale entity sets)."""
    vecs = entities_with_embeddings.select(
        F.col("entity_id").alias("vec_id"), "embedding"
    )
    if method == "exact":
        from graphrag_rs_spark.operators.similarity import cosine_topk_bruteforce

        topk = cosine_topk_bruteforce(vecs, vecs, k=max_connections)
    else:
        topk = cosine_topk_lsh(vecs, dim=dim, k=max_connections)
    return (
        topk.where(
            (F.col("cosine") > similarity_threshold)
            & (F.col("query_id") < F.col("neighbor_id"))
        )
        .select(
            F.col("query_id").alias("subj"),
            F.lit("SEMANTICALLY_SIMILAR").alias("pred"),
            F.col("neighbor_id").alias("obj"),
            F.col("cosine").cast("float").alias("confidence"),
            F.array().cast("array<string>").alias("context_chunk_ids"),
        )
    )


def graph_statistics(
    entities: DataFrame, triples: DataFrame, mentions: DataFrame | None = None
) -> DataFrame:
    """G11: one-row stats frame (counts by type as a map, degree stats,
    avg entities/chunk)."""
    type_counts = (
        entities.groupBy("entity_type").count()
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("entity_type", "count"))
            ).alias("entities_by_type")
        )
    )
    deg = (
        triples.select(F.col("subj").alias("id"))
        .union(triples.select(F.col("obj").alias("id")))
        .groupBy("id")
        .count()
    )
    deg_stats = deg.agg(
        F.round(F.avg("count"), 4).alias("avg_degree"),
        F.max("count").alias("max_degree"),
    )
    base = (
        entities.agg(F.count("*").alias("n_entities"))
        .crossJoin(triples.agg(F.count("*").alias("n_triples")))
        .crossJoin(type_counts)
        .crossJoin(deg_stats)
    )
    if mentions is not None:
        per_chunk = mentions.groupBy("chunk_id").count().agg(
            F.round(F.avg("count"), 4).alias("avg_entities_per_chunk")
        )
        base = base.crossJoin(per_chunk)
    return base
