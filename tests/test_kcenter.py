from __future__ import annotations

from graphrag_rs_spark.operators.kcenter import greedy_k_center


def _edges(spark):
    # two separate components: a 7-node path and a 5-node star, plus a
    # detached 2-node edge — exercises the cross-component farthest
    # pick (unreached-first) and the within-component refinement.
    path = [(f"p{i}", f"p{i+1}") for i in range(6)]
    star = [("s0", f"s{i}") for i in range(1, 5)]
    pair = [("z0", "z1")]
    return spark.createDataFrame(path + star + pair, "src string, dst string")


def test_paths_agree(spark):
    e = _edges(spark)
    small = {
        tuple(r) for r in greedy_k_center(e, k=4).collect()
    }
    dist = {
        tuple(r)
        for r in greedy_k_center(e, k=4, collect_threshold=0).collect()
    }
    assert small == dist and len(small) > 0


def test_greedy_semantics(spark):
    e = _edges(spark)
    rows = {r["id"]: (r["center"], r["dist"]) for r in greedy_k_center(e, k=3).collect()}
    # first center: min id overall = p0; second pick: unreached nodes
    # win (s* or z*), tie toward smaller id -> s0; third: z0.
    centers = {c for c, _ in rows.values()}
    assert centers == {"p0", "s0", "z0"}
    assert rows["p0"] == ("p0", 0)
    assert rows["p6"] == ("p0", 6)
    assert rows["s3"] == ("s0", 1)
    assert rows["z1"] == ("z0", 1)
    # every node of the three components assigned
    assert len(rows) == 14


def test_k_exceeds_components(spark):
    e = _edges(spark)
    rows = greedy_k_center(e, k=12).collect()
    # after all components have centers, later picks refine within the
    # path component (its far end is the global farthest), never crash
    assert {r["id"] for r in rows} == {r["id"] for r in greedy_k_center(e, k=3).collect()}
    by_id = {r["id"]: r["dist"] for r in rows}
    assert max(by_id.values()) <= 3  # k=12 saturates: all dist small


def test_empty(spark):
    e = spark.createDataFrame([], "src string, dst string")
    assert greedy_k_center(e, k=3).count() == 0
