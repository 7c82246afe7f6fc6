"""G10 temporal operators + G4 community context + entity temporal bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.temporal import (
    entity_temporal_bounds,
    evolution_metrics,
    node_churn,
    node_lifetime,
    snapshot_at,
    snapshot_range,
)

# (src, dst, ts, valid_from, valid_to): two interval edges + one point edge
EDGES = [
    ("a", "b", 100, 100, 200),
    ("b", "c", 150, 150, 400),
    ("c", "d", 300, None, None),  # point edge at t=300
]


def _edges(spark):
    return spark.createDataFrame(
        EDGES, "src string, dst string, ts long, valid_from long, valid_to long"
    )


def test_snapshot_at(spark):
    e = _edges(spark)
    assert {(r.src, r.dst) for r in snapshot_at(e, 150).collect()} == {
        ("a", "b"), ("b", "c")
    }
    # point edge active only at its exact ts (temporal.rs:125-133)
    assert {(r.src, r.dst) for r in snapshot_at(e, 300).collect()} == {
        ("b", "c"), ("c", "d")
    }
    assert {(r.src, r.dst) for r in snapshot_at(e, 299).collect()} == {("b", "c")}


def test_snapshot_range_inclusive_overlap(spark):
    e = _edges(spark)
    # [200, 250]: a-b touches at 200 (inclusive), b-c overlaps
    assert {(r.src, r.dst) for r in snapshot_range(e, 200, 250).collect()} == {
        ("a", "b"), ("b", "c")
    }


def test_evolution_metrics(spark):
    e = _edges(spark)
    rows = {
        r.timestamp: r
        for r in evolution_metrics(
            e, start_time=100, end_time=400, granularity=100
        ).collect()
    }
    assert set(rows) == {100, 200, 300, 400}
    # bucket [100,200]: both interval edges active → 3 nodes, 2 edges
    b = rows[100]
    assert (b.edge_count, b.node_count) == (2, 3)
    assert b.density == pytest.approx(2 / 3)
    assert b.avg_degree == pytest.approx(4 / 3)
    # bucket [300,400]: b-c interval + point edge at 300 → nodes {b,c,d}
    assert (rows[300].edge_count, rows[300].node_count) == (2, 3)
    # bucket [400,500]: only b-c touches 400
    assert (rows[400].edge_count, rows[400].node_count) == (1, 2)


def test_node_lifetime(spark):
    lt = {r.node: (r.first_seen, r.last_seen) for r in node_lifetime(_edges(spark)).collect()}
    assert lt["a"] == (100, 200)
    assert lt["b"] == (100, 400)
    assert lt["c"] == (150, 400)
    assert lt["d"] == (300, 300)


def test_node_churn(spark):
    row = node_churn(_edges(spark), start_time=100, end_time=300).collect()[0]
    # at 100: {a,b}; at 300: {b,c,d} → added c,d; removed a; stable b
    assert (row.added_count, row.removed_count, row.stable_count) == (2, 1, 1)


def test_entity_temporal_bounds(spark):
    mentions = spark.createDataFrame(
        [
            ("E1", "doc1_0"), ("E1", "doc1_7"), ("E1", "doc2_3"),
            ("E2", "doc9_2"),
        ],
        ["entity_id", "chunk_id"],
    )
    b = {r.entity_id: (r.first_mentioned, r.last_mentioned)
         for r in entity_temporal_bounds(mentions).collect()}
    assert b["E1"] == (0, 7)
    assert b["E2"] == (2, 2)


def test_rollup_entities_emits_temporal_bounds(spark):
    from graphrag_rs_spark.operators.extraction import rollup_entities

    mentions = spark.createDataFrame(
        [
            ("d1_0", "d1", "PERSON_x", "X", "PERSON", 0.9, 1),
            ("d1_5", "d1", "PERSON_x", "X", "PERSON", 0.8, 2),
        ],
        "chunk_id string, doc_id string, entity_id string, name string, "
        "entity_type string, confidence float, n_mentions long",
    )
    row = rollup_entities(mentions).collect()[0]
    assert (row.first_mentioned, row.last_mentioned) == (0, 5)


def test_community_context_format(spark):
    from graphrag_rs_spark.operators.communities import community_context

    comm = spark.createDataFrame(
        [(0, "E1", 7), (0, "E2", 7), (0, "E3", 99)],
        ["level", "entity_id", "community_id"],
    )
    ents = spark.createDataFrame(
        [
            ("E1", "Alice", "PERSON", 0.9, 3),
            ("E2", "Acme", "ORGANIZATION", 0.8, 1),
            ("E3", "Berlin", "LOCATION", 0.7, 1),
        ],
        ["entity_id", "name", "entity_type", "confidence", "mention_count"],
    )
    triples = spark.createDataFrame(
        [
            ("E1", "WORKS_FOR", "E2", 0.5),   # intra community 7
            ("E1", "BORN_IN", "E3", 0.5),     # crosses communities → excluded
        ],
        ["subj", "pred", "obj", "confidence"],
    )
    ctx = {r.community_id: r.context for r in community_context(comm, ents, triples).collect()}
    assert "# Community 7 at Level 0" in ctx[7]
    assert "- Alice (PERSON): confidence 0.90, 3 mentions" in ctx[7]
    assert "- Alice --[WORKS_FOR]--> Acme (confidence: 0.50)" in ctx[7]
    assert "BORN_IN" not in ctx[7]
    assert "BORN_IN" not in ctx[99]
