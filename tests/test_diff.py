"""Snapshot diff (operators/diff.py) on hand-built snapshots."""

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.diff import graph_diff, snapshot_diff


@pytest.fixture(scope="module")
def snaps(spark):
    old = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "y"), ("c", 3, None)],
        ["id", "n", "tag"],
    )
    new = spark.createDataFrame(
        [("a", 1, "x"), ("b", 5, "y"), ("d", 4, "z"), ("e", 6, None)],
        ["id", "n", "tag"],
    )
    return old, new


def test_statuses(spark, snaps):
    old, new = snaps
    got = {
        r["id"]: (r["status"], sorted(r["changed_cols"]))
        for r in snapshot_diff(old, new, keys=["id"]).collect()
    }
    assert got == {
        "b": ("changed", ["n"]),
        "c": ("removed", []),
        "d": ("added", []),
        "e": ("added", []),
    }


def test_include_unchanged_and_old_new_values(spark, snaps):
    old, new = snaps
    rows = {
        r["id"]: r
        for r in snapshot_diff(
            old, new, keys=["id"], include_unchanged=True
        ).collect()
    }
    assert rows["a"]["status"] == "unchanged"
    assert rows["b"]["old_n"] == 2 and rows["b"]["new_n"] == 5
    assert rows["c"]["new_n"] is None and rows["c"]["old_n"] == 3


def test_null_safe_compare(spark):
    old = spark.createDataFrame([("k", None)], "id string, v string")
    new_same = spark.createDataFrame([("k", None)], "id string, v string")
    new_diff = spark.createDataFrame([("k", "w")], "id string, v string")
    assert snapshot_diff(old, new_same, keys=["id"]).count() == 0
    r = snapshot_diff(old, new_diff, keys=["id"]).collect()[0]
    assert r["status"] == "changed" and r["changed_cols"] == ["v"]


def test_composite_key_graph_diff(spark):
    oe = spark.createDataFrame(
        [("e1", "A", "PERSON"), ("e2", "B", "ORG")],
        ["entity_id", "name", "entity_type"],
    )
    ne = spark.createDataFrame(
        [("e1", "A2", "PERSON"), ("e2", "B", "ORG")],
        ["entity_id", "name", "entity_type"],
    )
    ot = spark.createDataFrame(
        [("e1", "KNOWS", "e2", 0.5)], ["subj", "pred", "obj", "confidence"]
    )
    nt = spark.createDataFrame(
        [("e1", "KNOWS", "e2", 0.5), ("e2", "PART_OF", "e1", 0.9)],
        ["subj", "pred", "obj", "confidence"],
    )
    d = graph_diff(oe, ne, ot, nt)
    ents = {(r["entity_id"], r["status"]) for r in d["entities"].collect()}
    assert ents == {("e1", "changed")}
    trips = {
        (r["subj"], r["pred"], r["obj"], r["status"])
        for r in d["triples"].collect()
    }
    assert trips == {("e2", "PART_OF", "e1", "added")}


def test_one_shuffle_full_outer_plan(spark, snaps):
    old, new = snaps
    plan = (
        snapshot_diff(old, new, keys=["id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
