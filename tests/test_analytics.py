"""G7 analytics — reference literals (graph/analytics.rs:486-546) plus
exact values hand-computed on the diamond test graph."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.operators.analytics import (
    avg_clustering_coefficient,
    centrality_scores,
    clustering_coefficients,
    degree_centrality,
    graph_density,
    shortest_path,
    top_degree_nodes,
)


@pytest.fixture(scope="module")
def diamond(spark):
    # the reference's test graph (:489-496): A-B, A-C, B-C, B-D, C-D
    return spark.createDataFrame(
        [("A", "B", 1.0), ("A", "C", 1.0), ("B", "C", 1.0),
         ("B", "D", 1.0), ("C", "D", 1.0)],
        ["src", "dst", "weight"],
    )


def test_shortest_path_reference_literals(spark, diamond):
    rows = shortest_path(diamond, "A", "D").collect()
    assert len(rows) == 1
    assert rows[0]["weight"] == 2.0
    assert len(rows[0]["path"]) == 3          # A→B→D or A→C→D
    assert rows[0]["path"] == ["A", "B", "D"]  # deterministic lexical tie
    # unreachable target → zero rows
    e2 = spark.createDataFrame([("A", "B", 1.0), ("X", "Y", 1.0)],
                               ["src", "dst", "weight"])
    assert shortest_path(e2, "A", "Y").collect() == []


def test_shortest_path_prefers_lighter_longer_route(spark):
    edges = spark.createDataFrame(
        [("A", "B", 5.0), ("A", "C", 1.0), ("C", "B", 1.0)],
        ["src", "dst", "weight"],
    )
    row = shortest_path(edges, "A", "B").collect()[0]
    assert row["path"] == ["A", "C", "B"] and row["weight"] == 2.0


def test_degree_and_density(spark, diamond):
    d = {r["id"]: (r["degree"], r["degree_centrality"])
         for r in degree_centrality(diamond).collect()}
    assert d["A"] == (2, pytest.approx(2 / 3))
    assert d["B"] == (3, pytest.approx(1.0))
    dens = graph_density(diamond).collect()[0]
    assert dens["n_nodes"] == 4 and dens["n_edges"] == 5
    assert dens["density"] == pytest.approx(2 * 5 / (4 * 3))
    top = top_degree_nodes(diamond, 2).collect()
    assert [r["id"] for r in top] == ["B", "C"]  # tie B/C broken by id


def test_clustering_coefficients(spark, diamond):
    # A: nbrs {B,C}, 1 triangle pair counted both ways → 2/(2·1) = 1.0
    # B: nbrs {A,C,D}, closed ordered pairs (A,C),(C,A),(C,D),(D,C) → 4/6
    c = {r["id"]: r["coefficient"] for r in clustering_coefficients(diamond).collect()}
    assert c["A"] == pytest.approx(1.0)
    assert c["B"] == pytest.approx(4 / 6)
    assert c["C"] == pytest.approx(4 / 6)
    assert c["D"] == pytest.approx(1.0)
    assert 0.0 <= avg_clustering_coefficient(spark.createDataFrame(
        [("A", "B", 1.0), ("B", "C", 1.0)], ["src", "dst", "weight"]
    )) <= 1.0


def test_centrality_reference_literals(spark, diamond):
    s = {r["id"]: r for r in centrality_scores(diamond).collect()}
    assert set(s) == {"A", "B", "C", "D"}
    # :519-521 — central nodes dominate betweenness
    assert s["B"]["betweenness"] >= s["A"]["betweenness"]
    assert s["B"]["degree"] == pytest.approx(1.0)
    # closeness of B: distances 1,1,1 → 3/3 = 1.0
    assert s["B"]["closeness"] == pytest.approx(1.0)
    # closeness of A: distances B=1, C=1, D=2 → 3/4
    assert s["A"]["closeness"] == pytest.approx(3 / 4)


def test_centrality_size_guard(spark):
    import pyspark.sql.functions as F

    big = spark.range(21000).select(
        F.concat(F.lit("n"), F.col("id")).alias("src"),
        F.concat(F.lit("n"), F.col("id") + 1).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    with pytest.raises(ValueError, match="more than"):
        centrality_scores(big, max_nodes=20000)


def test_cc_communities_with_modularity(spark, diamond):
    from graphrag_rs_spark.operators.analytics import cc_communities_with_modularity

    # one component of 4 nodes (:525-532); internal directed edges = 10,
    # reference 'total_edges' quirk = node count 4 → 10/(2·4) = 1.25
    rows = cc_communities_with_modularity(diamond).collect()
    assert len(rows) == 1
    assert rows[0]["n_nodes"] == 4
    assert rows[0]["modularity"] == pytest.approx(10 / 8)
    # two components
    e2 = spark.createDataFrame(
        [("a", "b", 1.0), ("x", "y", 1.0), ("y", "z", 1.0)],
        ["src", "dst", "weight"],
    )
    got = {r["community"]: (r["n_nodes"], r["modularity"])
           for r in cc_communities_with_modularity(e2).collect()}
    assert got["a"] == (2, pytest.approx(2 / 10))
    assert got["x"] == (3, pytest.approx(4 / 10))


def test_sampled_centrality_equals_exact_at_full_k(spark):
    """With k = n pivots and the same (dist, path) tie-break, the
    distributed estimator reproduces the exact all-pairs suite."""
    from graphrag_rs_spark.operators.analytics import sampled_centrality

    # a less symmetric graph than the diamond so betweenness is nontrivial
    edges = spark.createDataFrame(
        [("A", "B", 1.0), ("B", "C", 1.0), ("C", "D", 1.0),
         ("B", "D", 3.0), ("D", "E", 1.0), ("A", "F", 1.0)],
        ["src", "dst", "weight"],
    )
    exact = {r["id"]: r for r in centrality_scores(edges).collect()}
    est = {r["id"]: r for r in sampled_centrality(edges, k=6).collect()}
    assert set(est) == set(exact)
    for v in exact:
        assert est[v]["degree"] == pytest.approx(exact[v]["degree"]), v
        assert est[v]["betweenness"] == pytest.approx(exact[v]["betweenness"]), v
        assert est[v]["closeness"] == pytest.approx(exact[v]["closeness"]), v


def test_sampled_centrality_small_path_equals_distributed(spark):
    """The driver small path must replay the distributed rounds
    bit-identically (same pivots, relaxation tie-breaks and formulas)."""
    from graphrag_rs_spark.operators.analytics import sampled_centrality

    rows = [("hub", f"s{i}", 1.0) for i in range(8)]
    rows += [(f"s{i}", f"t{i}", float(1 + i % 3)) for i in range(8)]
    rows += [(f"t{i}", f"t{(i + 1) % 8}", 2.0) for i in range(8)]
    edges = spark.createDataFrame(rows, ["src", "dst", "weight"])
    small = sorted(map(tuple, sampled_centrality(edges, k=9, seed=3).collect()))
    dist = sorted(
        map(
            tuple,
            sampled_centrality(
                edges, k=9, seed=3, collect_threshold=0
            ).collect(),
        )
    )
    assert small == dist


def test_sampled_centrality_partial_k_tracks_exact(spark):
    """k < n: rankings stay useful — the top-betweenness node of the
    exact suite is in the estimator's top ranks, and closeness errors
    stay bounded on a path+star graph."""
    from graphrag_rs_spark.operators.analytics import sampled_centrality

    rows = [("hub", f"s{i}", 1.0) for i in range(10)]
    rows += [(f"s{i}", f"t{i}", 1.0) for i in range(10)]
    edges = spark.createDataFrame(rows, ["src", "dst", "weight"])

    exact = {r["id"]: r for r in centrality_scores(edges).collect()}
    est = {r["id"]: r for r in sampled_centrality(edges, k=8, seed=7).collect()}

    top_exact = max(exact, key=lambda v: exact[v]["betweenness"])
    est_sorted = sorted(est, key=lambda v: -est[v]["betweenness"])
    assert top_exact == "hub"
    assert "hub" in est_sorted[:3]
    # closeness is a ratio estimate — bounded relative error on this graph
    for v in exact:
        if exact[v]["closeness"] > 0 and est[v]["closeness"] > 0:
            rel = abs(est[v]["closeness"] - exact[v]["closeness"]) / exact[v]["closeness"]
            assert rel < 0.8, (v, rel)


def test_hits_chain_and_norms(spark):
    """On the directed chain a→b→c: b is the only authority reachable
    from a and the only hub pointing at c's... — verify against the
    hand-computed fixed point and the L2-norm invariant."""
    from graphrag_rs_spark.operators.analytics import hits

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], ["src", "dst"]
    )
    out = {r["id"]: (r["hub"], r["authority"]) for r in hits(
        edges, max_iterations=10
    ).collect()}
    # auth: in-edges of b from a(hub), of c from b(hub). hub0=1 ⇒
    # auth ∝ (b:1, c:1)/√2; hub ∝ (a: auth(b), b: auth(c)) = equal ⇒
    # stays the symmetric fixed point every round.
    s = 2 ** -0.5
    assert abs(out["a"][0] - s) < 1e-9 and abs(out["a"][1] - 0.0) < 1e-9
    assert abs(out["b"][0] - s) < 1e-9 and abs(out["b"][1] - s) < 1e-9
    assert abs(out["c"][0] - 0.0) < 1e-9 and abs(out["c"][1] - s) < 1e-9
    # L2 norms are 1 by construction
    hub_n = sum(h * h for h, _ in out.values()) ** 0.5
    auth_n = sum(a * a for _, a in out.values()) ** 0.5
    assert abs(hub_n - 1.0) < 1e-9 and abs(auth_n - 1.0) < 1e-9


def test_hits_star_hub(spark):
    """Star u→{v1,v2,v3}: u is the pure hub (score 1), spokes are pure
    equal authorities (1/√3 each)."""
    from graphrag_rs_spark.operators.analytics import hits

    edges = spark.createDataFrame(
        [("u", "v1"), ("u", "v2"), ("u", "v3")], ["src", "dst"]
    )
    out = {r["id"]: (r["hub"], r["authority"]) for r in hits(
        edges, max_iterations=5
    ).collect()}
    assert abs(out["u"][0] - 1.0) < 1e-9 and out["u"][1] == 0.0
    for v in ("v1", "v2", "v3"):
        assert abs(out[v][1] - 3 ** -0.5) < 1e-9 and out[v][0] == 0.0
