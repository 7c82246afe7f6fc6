"""L11 semantic merge decisions — reference literals from
entity/semantic_merging.rs tests (:425-520) and the heuristic rules
(:133-260)."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.operators.semantic_merging import (
    apply_semantic_merges,
    name_similarity_col,
    semantic_merge_decisions,
)


@pytest.fixture(scope="module")
def frames(spark):
    entities = spark.createDataFrame(
        [
            ("entity1", "Apple Inc", "ORGANIZATION", 0.9),
            ("entity2", "Apple Inc.", "ORGANIZATION", 0.8),
            ("entity3", "Microsoft", "ORGANIZATION", 0.9),
            ("entity4", "Seattle", "LOCATION", 0.7),
            ("entity5", "Seattle Team", "ORGANIZATION", 0.6),
            ("entity6", "Alpha Beta", "PERSON", 0.9),
            ("entity7", "Gamma Delta", "PERSON", 0.9),
            ("entity8", "Lone Entity", "PERSON", 0.5),
        ],
        ["entity_id", "name", "entity_type", "confidence"],
    )
    groups = spark.createDataFrame(
        [
            ("entity1", "g1"), ("entity2", "g1"),      # same-type near-dups
            ("entity4", "g2"), ("entity5", "g2"),      # mixed types
            ("entity6", "g3"), ("entity7", "g3"),      # same type, low sim
            ("entity8", "g4"),                          # singleton group
        ],
        ["id", "dup_group_id"],
    )
    return entities, groups


def test_name_similarity_rules(spark):
    rows = spark.createDataFrame(
        [
            ("Apple Inc", "apple inc"),      # exact after lowering → 1.0
            ("Apple Inc", "Apple Inc."),     # containment → 0.9
            ("Alpha Beta", "Beta Gamma"),    # jaccard 1/3
            ("Alpha", "Zork"),               # disjoint → 0.0
        ],
        ["a", "b"],
    ).select(name_similarity_col("a", "b").alias("s")).collect()
    vals = [round(r["s"], 6) for r in rows]
    assert vals == [1.0, 0.9, round(1 / 3, 6), 0.0]


def test_merge_decisions_reference_literals(spark, frames):
    entities, groups = frames
    d = {r["dup_group_id"]: r for r in
         semantic_merge_decisions(entities, groups).collect()}

    # :483-505 — Apple Inc + Apple Inc. merges, confidence > 0.8
    g1 = d["g1"]
    assert g1["should_merge"] and g1["confidence"] == pytest.approx(0.9)
    assert g1["merged_name"] == "Apple Inc."  # select_best_name: longest
    assert g1["canonical_id"] == "entity1"
    assert g1["reasoning"] == "High name similarity (0.90) and matching types"

    # mixed types never merge, confidence 1.0
    g2 = d["g2"]
    assert not g2["should_merge"] and g2["confidence"] == 1.0
    assert g2["reasoning"] == "Different entity types"

    # same type, low name similarity (jaccard 0) → no merge, conf 1-sim
    g3 = d["g3"]
    assert not g3["should_merge"] and g3["confidence"] == pytest.approx(1.0)
    assert g3["reasoning"] == "Low name similarity (0.00)"

    # singleton group (:134-142)
    g4 = d["g4"]
    assert not g4["should_merge"] and g4["confidence"] == 1.0
    assert g4["reasoning"] == "Only one entity in group"


def test_apply_merges(spark, frames):
    entities, groups = frames
    decisions = semantic_merge_decisions(entities, groups)
    out = {r["entity_id"]: r for r in
           apply_semantic_merges(entities, groups, decisions).collect()}

    # g1 collapsed to canonical entity1 with the best name; merged
    # confidence = max(avg(0.9, 0.8), decision 0.9) = 0.9 (:356-368)
    assert "entity2" not in out
    assert out["entity1"]["name"] == "Apple Inc."
    assert out["entity1"]["confidence"] == pytest.approx(0.9)
    # non-merging members + ungrouped entities pass through unchanged
    for eid in ("entity3", "entity4", "entity5", "entity6", "entity7", "entity8"):
        assert out[eid]["confidence"] == pytest.approx(
            {r["entity_id"]: r["confidence"] for r in entities.collect()}[eid]
        )
    assert len(out) == 7


def test_end_to_end_with_embedding_groups(spark):
    """The L11 pipeline shape: embedding_cosine_duplicates → dup groups →
    merge decisions → applied merges."""
    import numpy as np

    from graphrag_rs_spark.operators.dedup import dup_groups_from_pairs
    from graphrag_rs_spark.operators.similarity import embedding_cosine_duplicates

    rng = np.random.default_rng(7)
    base = rng.normal(size=16)
    base /= np.linalg.norm(base)
    other = rng.normal(size=16)
    other /= np.linalg.norm(other)
    rows = [
        ("e1", "Acme Corp", "ORGANIZATION", 0.9, [float(x) for x in base]),
        ("e2", "Acme Corporation", "ORGANIZATION", 0.8,
         [float(x) for x in (base + 0.01 * other) / np.linalg.norm(base + 0.01 * other)]),
        ("e3", "Unrelated Co", "ORGANIZATION", 0.9, [float(x) for x in other]),
    ]
    df = spark.createDataFrame(
        rows, "entity_id string, name string, entity_type string, "
              "confidence double, embedding array<double>"
    )
    pairs = embedding_cosine_duplicates(
        df.select(F_col("entity_id").alias("vec_id"), "embedding"),
        dim=16, threshold=0.95,
    )
    groups = dup_groups_from_pairs(
        pairs, df.select(F_col("entity_id").alias("id"))
    )
    decisions = semantic_merge_decisions(df, groups)
    merged = apply_semantic_merges(df, groups, decisions)
    names = {r["name"] for r in merged.collect()}
    assert "Acme Corporation" in names          # best (longest) name kept
    assert "Acme Corp" not in names             # absorbed
    assert "Unrelated Co" in names
    assert merged.count() == 2


def F_col(c):
    from pyspark.sql import functions as F

    return F.col(c)
