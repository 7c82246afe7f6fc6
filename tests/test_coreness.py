"""Coreness decomposition (operators/coreness.py)."""

from graphrag_rs_spark.operators.coreness import core_decomposition


def _run(spark, rows):
    e = spark.createDataFrame(rows, "src string, dst string")
    return {r.id: r.coreness for r in core_decomposition(e).collect()}


def test_clique_coreness(spark):
    rows = [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
    ]
    assert _run(spark, rows) == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_path_and_star_are_shell_one(spark):
    assert _run(spark, [("a", "b"), ("b", "c"), ("c", "d")]) == {
        "a": 1, "b": 1, "c": 1, "d": 1,
    }
    assert _run(
        spark, [("hub", "x"), ("hub", "y"), ("hub", "z")]
    ) == {"hub": 1, "x": 1, "y": 1, "z": 1}


def test_clique_with_pendant(spark):
    rows = [
        ("a", "b"), ("a", "c"), ("b", "c"),  # triangle: coreness 2
        ("c", "p"),  # pendant: coreness 1
    ]
    assert _run(spark, rows) == {"a": 2, "b": 2, "c": 2, "p": 1}


def test_every_node_gets_exactly_one_shell(spark):
    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    e = spark.createDataFrame(rows, "src string, dst string")
    out = core_decomposition(e).collect()
    assert len(out) == len({r.id for r in out}) == 5


def test_empty_input(spark):
    e = spark.createDataFrame([], "src string, dst string")
    assert core_decomposition(e).collect() == []
