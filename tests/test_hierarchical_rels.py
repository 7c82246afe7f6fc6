"""G9: hierarchical relationship clustering — similarity-edge semantics,
multi-resolution levels, parent links, summaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphrag_rs_spark.operators.hierarchical_rels import (
    cluster_relationships,
    relationship_edges,
    summarize_relationship_clusters,
)

TRIPLES_COLS = "subj string, pred string, obj string, confidence float"


def _t(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, 0.5) for s, p, o in rows], TRIPLES_COLS
    )


def test_similarity_edge_rules(spark):
    rows = [
        ("a", "WORKS_FOR", "x"),   # r0
        ("b", "WORKS_FOR", "y"),   # r1: same pred as r0 → 0.5 edge
        ("a", "BORN_IN", "z"),     # r2: shares source with r0 only → 0.3, NO edge
        ("q", "LOCATED_IN", "w"),  # r3: nothing shared → no edge
    ]
    e = {
        (r["src"], r["dst"]): r["weight"]
        for r in relationship_edges(_t(spark, rows)).collect()
    }
    rid = lambda s, p, o: f"{s}|{p}|{o}"
    assert e[(rid("a", "WORKS_FOR", "x"), rid("b", "WORKS_FOR", "y"))] == 0.5
    # shared endpoint alone is exactly 0.3 — the reference's > 0.3 gate excludes it
    assert (rid("a", "BORN_IN", "z"), rid("a", "WORKS_FOR", "x")) not in e
    assert (rid("a", "WORKS_FOR", "x"), rid("a", "BORN_IN", "z")) not in e
    # same pred AND shared source → 0.8
    rows2 = rows + [("a", "WORKS_FOR", "y2")]
    e2 = {
        (r["src"], r["dst"]): r["weight"]
        for r in relationship_edges(_t(spark, rows2)).collect()
    }
    assert e2[(rid("a", "WORKS_FOR", "x"), rid("a", "WORKS_FOR", "y2"))] == 0.8


def test_temporal_overlap_component(spark):
    rows = [
        ("a", "KNOWS", "x", 0.5, 100, 200),
        ("a", "MET", "y", 0.5, 150, 250),   # shared source + overlap [150,200]
        ("a", "SAW", "z", 0.5, 900, 950),   # shared source, no overlap → no edge
    ]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string, confidence float, "
              "valid_from long, valid_to long"
    )
    e = {(r["src"], r["dst"]): r["weight"] for r in relationship_edges(t).collect()}
    k = ("a|KNOWS|x", "a|MET|y")
    assert k in e and 0.3 < e[k] <= 0.5  # 0.3 + 0.2·overlap_ratio
    assert all("SAW" not in a + b for a, b in e)


def test_hierarchy_levels_and_parents(spark):
    # two same-pred families → two clusters at fine resolution
    rows = [("s%d" % i, "FAM_A", "t%d" % i) for i in range(4)] + [
        ("u%d" % i, "FAM_B", "v%d" % i) for i in range(4)
    ]
    h = cluster_relationships(_t(spark, rows), resolutions=(1.0, 0.2))
    lv0 = h.where(F.col("level") == 0).collect()
    lv1 = h.where(F.col("level") == 1).collect()
    assert len(lv0) == len(lv1) == 8
    c0 = {r["rel_id"]: r["cluster_id"] for r in lv0}
    fam_a = {c0[k] for k in c0 if "FAM_A" in k}
    fam_b = {c0[k] for k in c0 if "FAM_B" in k}
    assert len(fam_a) == 1 and len(fam_b) == 1 and fam_a != fam_b
    # every level-0 cluster has a parent at level 1; level 1 (last) has none
    assert all(r["parent_cluster_id"] is not None for r in lv0)
    assert all(r["parent_cluster_id"] is None for r in lv1)
    assert {r["resolution"] for r in lv0} == {1.0}
    assert {r["resolution"] for r in lv1} == {0.2}


def test_isolated_relationships_are_singletons(spark):
    rows = [("a", "P1", "b"), ("c", "P2", "d")]  # no similarity edges at all
    h = cluster_relationships(_t(spark, rows), resolutions=(1.0,))
    assert h.count() == 2
    assert h.select("cluster_id").distinct().count() == 2


def test_summaries_and_cohesion(spark):
    rows = [("s%d" % i, "FAM_A", "t%d" % i) for i in range(3)]
    t = _t(spark, rows)
    h = cluster_relationships(t, resolutions=(1.0,))
    s = summarize_relationship_clusters(h, t).collect()
    assert len(s) == 1
    row = s[0]
    assert row["n_relationships"] == 3
    assert "FAM_A (3)" in row["summary"]
    assert row["cohesion"] == 0.5  # all intra edges are same-pred-only


def test_determinism(spark):
    rows = [("s%d" % i, "P%d" % (i % 2), "t%d" % i) for i in range(8)]
    t = _t(spark, rows)
    a = sorted(map(tuple, cluster_relationships(t).collect()))
    b = sorted(map(tuple, cluster_relationships(t).collect()))
    assert a == b
