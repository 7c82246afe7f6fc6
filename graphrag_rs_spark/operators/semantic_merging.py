"""L11: semantic entity merging — heuristic merge decisions over
embedding-cosine duplicate groups.

Reference: entity/semantic_merging.rs. Transcribed semantics:

- string_similarity (:209-236): lowercase; exact → 1.0; one-contains-
  other → 0.9; else word-set Jaccard (whitespace tokens);
- heuristic_merge_decision (:133-184): groups of <2 never merge
  ("Only one entity in group"); mixed entity types never merge
  ("Different entity types"); same-type groups merge iff the MEAN
  PAIRWISE name similarity exceeds 0.8, with confidence = that mean
  ("High name similarity (x.xx) and matching types") else confidence =
  1 − mean ("Low name similarity (x.xx)");
- select_best_name (:238-253): longest name, ties by confidence
  (we add the name itself as a final tiebreak — Rust's max_by keeps the
  last of fully-tied elements, which is input-order-dependent; a
  deterministic tiebreak is required under arbitrary partitioning);
- merge_entities (:333-380): canonical id = the group's first entity id
  (min entity_id here — the reference takes input order, which has no
  distributed meaning), merged confidence = max(avg member confidence,
  decision confidence).

The LLM decision slot (decide_merge's use_llm_merging path, :90-131) is
the surveyed out-of-scope extractor seam (SURVEY §7 / E15-E18): the
reference itself falls back to exactly these heuristics when no LLM
client is configured.

Scale shape: groups come from ``embedding_cosine_duplicates`` (LSH-
blocked) + ``dup_groups_from_pairs`` (hashmin CC) — the pairwise name
scoring below joins WITHIN dup groups only, so fan-out is bounded by
near-duplicate group sizes, never O(n²) over the entity table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def name_similarity_col(a, b):
    """string_similarity (:209-236) as a column expression."""
    la, lb = F.lower(a), F.lower(b)
    wa = F.array_distinct(F.filter(F.split(la, r"\s+"), lambda w: w != F.lit("")))
    wb = F.array_distinct(F.filter(F.split(lb, r"\s+"), lambda w: w != F.lit("")))
    union = F.size(F.array_union(wa, wb))
    jac = F.when(union == 0, F.lit(0.0)).otherwise(
        F.size(F.array_intersect(wa, wb)).cast("double") / union.cast("double")
    )
    return (
        F.when(la == lb, F.lit(1.0))
        .when(la.contains(lb) | lb.contains(la), F.lit(0.9))
        .otherwise(jac)
    )


def semantic_merge_decisions(
    entities: DataFrame, groups: DataFrame
) -> DataFrame:
    """entities(entity_id, name, entity_type, confidence) +
    groups(id, dup_group_id) →
    (dup_group_id, should_merge, confidence, reasoning, merged_name,
    canonical_id, group_size): one heuristic decision per dup group."""
    members = groups.select(
        F.col("id").alias("entity_id"), "dup_group_id"
    ).join(entities, "entity_id")

    stats = members.groupBy("dup_group_id").agg(
        F.count("*").alias("group_size"),
        F.countDistinct("entity_type").alias("n_types"),
        F.avg("confidence").alias("avg_confidence"),
        F.min("entity_id").alias("canonical_id"),
        # select_best_name: longest, ties by confidence, then name
        F.max(F.struct(F.length("name").alias("l"), F.col("confidence").alias("c"), F.col("name")))["name"].alias("best_name"),
    )

    # mean pairwise name similarity WITHIN each group (groups are small
    # near-dup clusters; the self-join is group-bounded)
    a = members.select(
        "dup_group_id", F.col("entity_id").alias("ia"), F.col("name").alias("na")
    )
    b = members.select(
        "dup_group_id", F.col("entity_id").alias("ib"), F.col("name").alias("nb")
    )
    pair_sim = (
        a.join(b, "dup_group_id")
        .where(F.col("ia") < F.col("ib"))
        .select(
            "dup_group_id", name_similarity_col(F.col("na"), F.col("nb")).alias("sim")
        )
        .groupBy("dup_group_id")
        .agg(F.avg("sim").alias("name_similarity"))
    )

    d = stats.join(pair_sim, "dup_group_id", "left")
    fmt = F.format_number(F.col("name_similarity"), 2)
    return d.select(
        "dup_group_id",
        "group_size",
        F.when(
            (F.col("group_size") >= 2)
            & (F.col("n_types") == 1)
            & (F.col("name_similarity") > 0.8),
            F.lit(True),
        ).otherwise(F.lit(False)).alias("should_merge"),
        F.when(F.col("group_size") < 2, F.lit(1.0))
        .when(F.col("n_types") > 1, F.lit(1.0))
        .when(F.col("name_similarity") > 0.8, F.col("name_similarity"))
        .otherwise(F.lit(1.0) - F.col("name_similarity"))
        .alias("confidence"),
        F.when(F.col("group_size") < 2, F.lit("Only one entity in group"))
        .when(F.col("n_types") > 1, F.lit("Different entity types"))
        .when(
            F.col("name_similarity") > 0.8,
            F.concat(F.lit("High name similarity ("), fmt, F.lit(") and matching types")),
        )
        .otherwise(F.concat(F.lit("Low name similarity ("), fmt, F.lit(")")))
        .alias("reasoning"),
        F.when(
            (F.col("group_size") >= 2)
            & (F.col("n_types") == 1)
            & (F.col("name_similarity") > 0.8),
            F.col("best_name"),
        ).alias("merged_name"),
        "canonical_id",
    )


def apply_semantic_merges(
    entities: DataFrame, groups: DataFrame, decisions: DataFrame
) -> DataFrame:
    """merge_entities (:333-380) over the whole table: merging groups
    collapse to one row (canonical id, best name, shared type,
    confidence = max(avg member confidence, decision confidence));
    everything else passes through unchanged."""
    members = groups.select(
        F.col("id").alias("entity_id"), "dup_group_id"
    ).join(entities, "entity_id")

    dec = decisions.select(
        "dup_group_id", "should_merge", "merged_name", "canonical_id",
        F.col("confidence").alias("decision_confidence"),
    )
    tagged = members.join(dec, "dup_group_id", "left")

    merged = (
        tagged.where(F.col("should_merge"))
        .groupBy("dup_group_id")
        .agg(
            F.first("canonical_id").alias("entity_id"),
            F.first("merged_name").alias("name"),
            F.first("entity_type").alias("entity_type"),
            F.greatest(
                F.avg("confidence"), F.first("decision_confidence")
            ).alias("confidence"),
        )
        .drop("dup_group_id")
    )
    untouched = tagged.where(
        F.col("should_merge").isNull() | ~F.col("should_merge")
    ).select("entity_id", "name", "entity_type", "confidence")
    passthrough = entities.join(
        groups.select(F.col("id").alias("entity_id")), "entity_id", "left_anti"
    ).select("entity_id", "name", "entity_type", "confidence")
    return merged.unionByName(untouched).unionByName(passthrough)
