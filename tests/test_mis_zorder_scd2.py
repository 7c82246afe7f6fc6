"""luby_mis / zorder_key / scd2_history — hand fixtures + invariants."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------- luby MIS
def _p(node: str, seed: str = "mis-v1") -> int:
    return int(hashlib.sha256(f"{seed}\x1f{node}".encode()).hexdigest()[:15], 16)


def test_luby_mis_path_graph_matches_hand_simulation(spark):
    from graphrag_rs_spark.operators.analytics import luby_mis

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    out = {r["node"]: (r["status"], r["round"])
           for r in luby_mis(e).collect()}
    # replay round 1 by hand: local minima of (p, id) join the MIS
    pri = {n: (_p(n), n) for n in "abcd"}
    nbrs = {"a": ["b"], "b": ["a", "c"], "c": ["b", "d"], "d": ["c"]}
    sel1 = {n for n in "abcd"
            if all(pri[n] < pri[m] for m in nbrs[n])}
    for n in sel1:
        assert out[n] == ("in_mis", 1)
    # invariants: independence + maximality + fully decided
    mis = {n for n, (s, _) in out.items() if s == "in_mis"}
    for s, d in [("a", "b"), ("b", "c"), ("c", "d")]:
        assert not (s in mis and d in mis)
    for n, (s, _) in out.items():
        if s == "removed":
            assert any(m in mis for m in nbrs[n])
        assert s != "active"


def test_luby_mis_deterministic_across_runs(spark):
    from graphrag_rs_spark.operators.analytics import luby_mis

    rows = [(f"n{i}", f"n{(i * 7 + 3) % 40}") for i in range(80)]
    e = spark.createDataFrame(rows, "src string, dst string")
    o1 = sorted(map(tuple, luby_mis(e).collect()))
    o2 = sorted(map(tuple, luby_mis(e).collect()))
    assert o1 == o2
    # independence on the full random-ish graph
    mis = {n for n, s, _ in o1 if s == "in_mis"}
    sym = {(s, d) for s, d in rows if s != d}
    assert not any(s in mis and d in mis for s, d in sym)


def test_luby_mis_small_path_equals_distributed(spark):
    # the driver small path must replay the distributed rounds
    # bit-identically (same priorities, same per-round statuses)
    from graphrag_rs_spark.operators.analytics import luby_mis

    rows = [(f"n{i}", f"n{(i * 11 + 5) % 37}") for i in range(70)]
    e = spark.createDataFrame(rows, "src string, dst string")
    small = sorted(map(tuple, luby_mis(e).collect()))
    dist = sorted(map(tuple, luby_mis(e, collect_threshold=0).collect()))
    assert small == dist


# ------------------------------------------------------------------ zorder
def test_zorder_key_known_values_and_ordering(spark):
    from graphrag_rs_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(1, 1), (3, 1), (0, 2), (0, 0), (65535, 65535)],
        "x long, y long",
    )
    out = {(r["x"], r["y"]): r["z"]
           for r in df.select("x", "y",
                              zorder_key(["x", "y"]).alias("z")).collect()}
    # Morton with x in the high lane of each bit pair
    assert out[(1, 1)] == 3
    assert out[(3, 1)] == 11
    assert out[(0, 2)] == 4
    assert out[(0, 0)] == 0
    assert out[(65535, 65535)] == (1 << 32) - 1


def test_zorder_key_guards(spark):
    from graphrag_rs_spark.operators.layout import zorder_key

    with pytest.raises(ValueError):
        zorder_key([])
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], bits=16)  # 64 > 63


# -------------------------------------------------------------------- scd2
def test_scd2_history_intervals_and_current(spark):
    from graphrag_rs_spark.operators.temporal import scd2_history

    ch = spark.createDataFrame(
        [("u1", 10, "A"), ("u1", 20, "B"), ("u1", 30, "C"), ("u2", 5, "X")],
        "k string, t long, v string",
    )
    out = {(r["k"], r["v"]): (r["valid_from"], r["valid_to"], r["is_current"])
           for r in scd2_history(ch, key_cols=["k"], time_col="t").collect()}
    assert out[("u1", "A")] == (10, 20, False)
    assert out[("u1", "B")] == (20, 30, False)
    assert out[("u1", "C")] == (30, None, True)
    assert out[("u2", "X")] == (5, None, True)


def test_scd2_history_ties_break_deterministically(spark):
    from graphrag_rs_spark.operators.temporal import scd2_history

    # two changes at the same timestamp: ordered by the payload column
    ch = spark.createDataFrame(
        [("u", 10, "a"), ("u", 10, "b")], "k string, t long, v string"
    )
    out = {r["v"]: (r["valid_to"], r["is_current"])
           for r in scd2_history(ch, key_cols=["k"], time_col="t").collect()}
    assert out["a"] == (10, False)
    assert out["b"] == (None, True)
