"""Motif pattern matching (operators/motif.py) on hand-checked graphs."""

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.motif import match_motif, parse_pattern


@pytest.fixture(scope="module")
def edges(spark):
    # a1→b1→c1 with closing a1→c1 (feed-forward triangle);
    # a2→b2→c2 open triad; d→d self loop; weights distinguish edges
    rows = [
        ("a1", "b1", 1.0),
        ("b1", "c1", 2.0),
        ("a1", "c1", 3.0),
        ("a2", "b2", 4.0),
        ("b2", "c2", 5.0),
        ("d", "d", 6.0),
    ]
    return spark.createDataFrame(rows, ["src", "dst", "weight"])


def test_parse_roundtrip():
    stmts = parse_pattern("(a)-[e]->(b); (b)-[]->(c); !(a)-[]->(c)")
    assert stmts == [
        (False, "a", "e", "b"),
        (False, "b", "", "c"),
        (True, "a", "", "c"),
    ]


@pytest.mark.parametrize(
    "bad",
    ["", "(a)-[]->", "!(a)-[e]->(b)", "!(a)-[]->(b)", "(a)<-[]-(b)"],
)
def test_parse_rejects(bad):
    with pytest.raises(ValueError):
        parse_pattern(bad)


def test_two_hop_wedge(edges):
    out = match_motif(edges, "(x)-[]->(y); (y)-[]->(z)")
    got = {tuple(r) for r in out.select("x", "y", "z").collect()}
    assert got == {
        ("a1", "b1", "c1"),
        ("a2", "b2", "c2"),
        ("d", "d", "d"),  # homomorphism: self loop matches both hops
    }


def test_open_triad_negation(edges):
    out = match_motif(
        edges, "(x)-[]->(y); (y)-[]->(z); !(x)-[]->(z)", distinct_vertices=True
    )
    got = {tuple(r) for r in out.select("x", "y", "z").collect()}
    assert got == {("a2", "b2", "c2")}  # a1-wedge is closed, d is a loop


def test_closed_triangle_pattern(edges):
    out = match_motif(edges, "(x)-[]->(y); (y)-[]->(z); (x)-[]->(z)",
                      distinct_vertices=True)
    got = {tuple(r) for r in out.select("x", "y", "z").collect()}
    assert got == {("a1", "b1", "c1")}


def test_named_edge_payload(edges):
    out = match_motif(edges, "(x)-[e]->(y); (y)-[f]->(z)")
    row = (
        out.where((F.col("x") == "a1") & (F.col("z") == "c1"))
        .select("e_weight", "f_weight")
        .collect()
    )
    assert [(r["e_weight"], r["f_weight"]) for r in row] == [(1.0, 2.0)]


def test_self_loop_statement(edges):
    out = match_motif(edges, "(x)-[]->(x)")
    assert [r["x"] for r in out.collect()] == ["d"]


def test_disconnected_raises(edges):
    with pytest.raises(ValueError, match="cartesian"):
        match_motif(edges, "(a)-[]->(b); (c)-[]->(d)")
    n = match_motif(
        edges, "(a)-[]->(b); (c)-[]->(d)", allow_cartesian=True
    ).count()
    assert n == 36


def test_unbound_negation_raises(edges):
    with pytest.raises(ValueError, match="unbound"):
        match_motif(edges, "(a)-[]->(b); !(a)-[]->(q)")


def test_plan_is_joins_not_cartesian(edges):
    plan = match_motif(
        edges, "(x)-[]->(y); (y)-[]->(z); !(x)-[]->(z)"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan
