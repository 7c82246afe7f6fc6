"""partition_conductance, dag_path_counts, dead_exports — hand-checked
fixtures plus the invariants that make each safe to trust at scale:
conductance is orientation-invariant, the path DP matches enumeration,
and dead-ness ignores self-calls but respects any cross-file reference.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.analytics import partition_conductance
from graphrag_rs_spark.operators.code_graph import dead_exports
from graphrag_rs_spark.operators.scc import dag_path_counts


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _labels(spark, items):
    return spark.createDataFrame(items, "id string, label string")


class TestPartitionConductance:
    def test_triangle_plus_pendant(self, spark):
        # triangle {a,b,c}=X plus pendant d=Y via c-d: 2m=8,
        # vol(X)=7 cut 1, vol(Y)=1 cut 1 -> both denom 1, micro 1e6
        e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
        lab = _labels(
            spark, [("a", "X"), ("b", "X"), ("c", "X"), ("d", "Y")]
        )
        rows = {
            r["label"]: r
            for r in partition_conductance(e, lab).collect()
        }
        assert rows["X"]["cut_edges"] == 1
        assert rows["X"]["volume"] == 7
        assert rows["X"]["denom"] == 1
        assert rows["X"]["conductance_micro"] == 1_000_000
        assert rows["Y"]["volume"] == 1
        assert rows["Y"]["conductance_micro"] == 1_000_000

    def test_single_community_null_micro(self, spark):
        e = _edges(spark, [("a", "b"), ("b", "c")])
        lab = _labels(spark, [("a", "X"), ("b", "X"), ("c", "X")])
        row = partition_conductance(e, lab).collect()[0]
        assert row["cut_edges"] == 0
        assert row["denom"] == 0
        assert row["conductance_micro"] is None

    def test_orientation_invariant_micro(self, spark):
        # feeding the symmetrized list doubles cut/vol/denom together,
        # so the micro ratio is unchanged — callers can pass either form
        once = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
        both = once + [(d, s) for s, d in once]
        lab = _labels(
            spark, [("a", "X"), ("b", "X"), ("c", "X"), ("d", "Y")]
        )
        m1 = {
            r["label"]: r["conductance_micro"]
            for r in partition_conductance(_edges(spark, once), lab).collect()
        }
        m2 = {
            r["label"]: r["conductance_micro"]
            for r in partition_conductance(_edges(spark, both), lab).collect()
        }
        assert m1 == m2

    def test_self_loops_and_dups_ignored(self, spark):
        e = _edges(
            spark,
            [("a", "b"), ("a", "b"), ("a", "a"), ("b", "c")],
        )
        lab = _labels(spark, [("a", "X"), ("b", "X"), ("c", "Y")])
        rows = {
            r["label"]: r for r in partition_conductance(e, lab).collect()
        }
        # 2 distinct non-loop edges: 2m=4; X vol=3 cut=1, Y vol=1 cut=1
        assert rows["X"]["volume"] == 3
        assert rows["X"]["cut_edges"] == 1
        assert rows["Y"]["denom"] == 1


class TestDagPathCounts:
    def test_diamond(self, spark):
        e = _edges(
            spark, [("s", "a"), ("s", "b"), ("a", "t"), ("b", "t")]
        )
        got = {r["id"]: r["n_paths"] for r in dag_path_counts(e).collect()}
        assert got == {"s": 1, "a": 1, "b": 1, "t": 2}

    def test_fibonacci_chain(self, spark):
        # i->i+1 and i->i+2 over 0..7: counts follow Fibonacci
        pairs = []
        for i in range(8):
            if i + 1 < 8:
                pairs.append((f"n{i}", f"n{i+1}"))
            if i + 2 < 8:
                pairs.append((f"n{i}", f"n{i+2}"))
        got = {
            r["id"]: r["n_paths"]
            for r in dag_path_counts(_edges(spark, pairs)).collect()
        }
        assert [got[f"n{i}"] for i in range(8)] == [1, 1, 2, 3, 5, 8, 13, 21]

    def test_multi_source_sums(self, spark):
        # two sources both feeding t: n_paths(t) = 2
        e = _edges(spark, [("s1", "t"), ("s2", "t")])
        got = {r["id"]: r["n_paths"] for r in dag_path_counts(e).collect()}
        assert got == {"s1": 1, "s2": 1, "t": 2}

    def test_cycle_raises(self, spark):
        e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
        with pytest.raises(RuntimeError):
            dag_path_counts(e, max_iterations=10)


PY_A = "def foo(x):\n    return x\n\ndef bar(x):\n    return x\n"
PY_B = "y = foo(3)\n"
PY_C = "def baz(n):\n    return baz(n - 1)\n"


class TestDeadExports:
    def _files(self, spark, rows):
        return spark.createDataFrame(
            rows, "repo string, path string, lang string, content string"
        )

    def test_unreferenced_and_selfcall_are_dead(self, spark):
        files = self._files(
            spark,
            [
                ("r1", "a.py", "python", PY_A),
                ("r1", "b.py", "python", PY_B),
                ("r1", "c.py", "python", PY_C),
            ],
        )
        dead = {r["symbol"] for r in dead_exports(files).collect()}
        # foo is called from b.py; bar is never named; baz only calls
        # ITSELF (extract_calls subtracts own defs) -> dead
        assert dead == {"bar", "baz"}

    def test_cross_repo_reference_keeps_alive(self, spark):
        # liveness is corpus-wide: a caller in ANOTHER repo still counts
        files = self._files(
            spark,
            [
                ("r1", "a.py", "python", PY_A),
                ("r2", "use.py", "python", "foo(1)\nbar(2)\n"),
            ],
        )
        dead = dead_exports(files).collect()
        assert dead == []


def test_dag_path_counts_small_path_equals_distributed(spark):
    """The driver small path must replay the wave DP bit-identically
    (same layers, same summed counts)."""
    pairs = [(f"n{i}", f"n{i + 1}") for i in range(8)]
    pairs += [(f"n{i}", f"n{i + 2}") for i in range(7)]
    pairs += [("r0", "n0"), ("r1", "n0")]
    e = spark.createDataFrame(pairs, "src string, dst string")
    small = sorted(map(tuple, dag_path_counts(e).collect()))
    dist = sorted(map(tuple, dag_path_counts(e, collect_threshold=0).collect()))
    assert small == dist and small
