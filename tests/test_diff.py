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


def test_line_churn_basic(spark):
    from graphrag_rs_spark.operators.diff import line_churn

    old = spark.createDataFrame(
        [
            ("r", "a.py", "x = 1\ny = 2\n"),
            ("r", "gone.py", "a\nb\n"),
            ("r", "same.py", "k\n"),
        ],
        ["repo", "path", "content"],
    )
    new = spark.createDataFrame(
        [
            ("r", "a.py", "x = 1\nz = 3\n"),       # y removed, z added
            ("r", "same.py", "k\n"),                # untouched -> absent
            ("r", "born.py", "c\n"),                # new file
        ],
        ["repo", "path", "content"],
    )
    got = {
        r["path"]: (r["lines_added"], r["lines_removed"])
        for r in line_churn(old, new).collect()
    }
    # gone.py: 2 content lines + trailing '' removed; born.py symmetric
    assert got == {"a.py": (1, 1), "gone.py": (0, 3), "born.py": (2, 0)}


def test_line_churn_multiset(spark):
    from graphrag_rs_spark.operators.diff import line_churn

    old = spark.createDataFrame([("r", "d.py", "dup\ndup\n")], ["repo", "path", "content"])
    new = spark.createDataFrame([("r", "d.py", "dup\n")], ["repo", "path", "content"])
    row = line_churn(old, new).collect()[0]
    # duplicate lines count as a multiset: one of the two 'dup's removed
    assert (row["lines_added"], row["lines_removed"]) == (0, 1)
