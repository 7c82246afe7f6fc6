from __future__ import annotations

import pytest

from graphrag_rs_spark.operators.bom import bom_rollup


def test_bom_hand_computed(spark):
    # bike = frame + 2*wheel; wheel = rim + 32*spoke
    # spoke 1, rim 5 -> wheel = 3 + 5 + 32*1 = 40
    # frame 20 -> bike = 10 + 20 + 2*40 = 110
    edges = spark.createDataFrame(
        [
            ("bike", "frame", 1),
            ("bike", "wheel", 2),
            ("wheel", "rim", 1),
            ("wheel", "spoke", 32),
        ],
        "parent string, child string, qty int",
    )
    costs = spark.createDataFrame(
        [("bike", 10), ("wheel", 3), ("frame", 20), ("rim", 5), ("spoke", 1)],
        "id string, cost int",
    )
    rows = {r["id"]: r["total"] for r in bom_rollup(edges, costs).collect()}
    assert rows == {
        "spoke": 1, "rim": 5, "frame": 20, "wheel": 40, "bike": 110,
    }


def test_bom_shared_subassembly_and_missing_cost(spark):
    # diamond: a -> b, a -> c, b -> d, c -> d (d counted via both arms);
    # node b has no cost row -> base 0
    edges = spark.createDataFrame(
        [("a", "b", 1), ("a", "c", 1), ("b", "d", 2), ("c", "d", 3)],
        "parent string, child string, qty int",
    )
    costs = spark.createDataFrame(
        [("a", 1), ("c", 1), ("d", 10)], "id string, cost int"
    )
    rows = {r["id"]: r["total"] for r in bom_rollup(edges, costs).collect()}
    assert rows["d"] == 10
    assert rows["b"] == 0 + 2 * 10
    assert rows["c"] == 1 + 3 * 10
    assert rows["a"] == 1 + rows["b"] + rows["c"]


def test_bom_cycle_raises(spark):
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 1)], "parent string, child string, qty int"
    )
    costs = spark.createDataFrame([("a", 1), ("b", 1)], "id string, cost int")
    with pytest.raises(RuntimeError, match="converge"):
        bom_rollup(edges, costs, max_depth=5)


def test_bom_small_path_equals_distributed(spark):
    """The driver small path must replay the value iteration
    bit-identically (same wrap arithmetic, same rows)."""
    from graphrag_rs_spark.operators.bom import bom_rollup

    e = spark.createDataFrame(
        [("a", "b", 2), ("a", "c", 1), ("b", "d", 3), ("c", "d", 1),
         ("x", "y", 5)],
        "parent string, child string, qty int",
    )
    costs = spark.createDataFrame(
        [("a", 10), ("b", 5), ("c", 7), ("d", 2), ("y", 4)],
        "id string, cost int",
    )
    small = sorted(map(tuple, bom_rollup(e, costs).collect()))
    dist = sorted(map(tuple, bom_rollup(e, costs, collect_threshold=0).collect()))
    assert small == dist and small
