"""triangle_counts (degree-oriented) and k_core (simultaneous peeling)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from graphrag_rs_spark.operators.analytics import (
    clustering_coefficients,
    k_core,
    triangle_counts,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], ["src", "dst", "weight"]
    )


def test_triangles_k4(spark):
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    got = {r["id"]: r["triangles"] for r in triangle_counts(_edges(spark, k4)).collect()}
    # K4 has C(4,3)=4 triangles; each node is in C(3,2)=3
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_triangles_none_on_star_and_path(spark):
    star = [("hub", f"n{i}") for i in range(6)]
    assert triangle_counts(_edges(spark, star)).count() == 0
    path = [(f"p{i}", f"p{i+1}") for i in range(5)]
    assert triangle_counts(_edges(spark, path)).count() == 0


def test_triangles_duplicate_and_reversed_edges_collapse(spark):
    tri = [("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"), ("c", "a"), ("a", "a")]
    got = {r["id"]: r["triangles"] for r in triangle_counts(_edges(spark, tri)).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_triangles_match_clustering_coefficient_wedges(spark):
    # random graph cross-check: clustering_coefficients counts each
    # triangle at a node TWICE (ordered wedges), so cc.triangles == 2x ours
    rng = random.Random(7)
    nodes = [f"v{i}" for i in range(30)]
    pairs = {
        tuple(sorted(rng.sample(nodes, 2))) for _ in range(120)
    }
    e = _edges(spark, sorted(pairs))
    ours = {r["id"]: r["triangles"] for r in triangle_counts(e).collect()}
    cc = {r["id"]: r["triangles"] for r in clustering_coefficients(e).collect()}
    for node, wedge_count in cc.items():
        assert ours.get(node, 0) * 2 == wedge_count


def test_kcore_triangle_with_tail(spark):
    e = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "t1"), ("t1", "t2")]
    got = {r["id"]: r["core_degree"] for r in k_core(_edges(spark, e), 2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}
    assert k_core(_edges(spark, e), 3).count() == 0


def test_kcore_cascade_chain_empties(spark):
    chain = [(f"c{i}", f"c{i+1}") for i in range(5)]
    # every round peels only the current endpoints → multi-round cascade
    assert k_core(_edges(spark, chain), 2).count() == 0


def test_kcore_clique_chain_fixture_shape(spark):
    # one 5-clique (0..4) + chain 4-5-6-7 + extra edge 0-5 (the board
    # fixture's group shape): 4-core = the clique, all core degrees 4
    pairs = [(f"n{i}", f"n{j}") for i in range(5) for j in range(i + 1, 5)]
    pairs += [("n4", "n5"), ("n5", "n6"), ("n6", "n7"), ("n0", "n5")]
    got = {r["id"]: r["core_degree"] for r in k_core(_edges(spark, pairs), 4).collect()}
    assert got == {f"n{i}": 4 for i in range(5)}
    tri = {r["id"]: r["triangles"] for r in triangle_counts(_edges(spark, pairs)).collect()}
    assert tri == {"n0": 7, "n1": 6, "n2": 6, "n3": 6, "n4": 7, "n5": 1}


def test_triangle_plan_is_udf_free(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    plan = triangle_counts(e)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pmi_edges_hand_computed(spark):
    """4 docs: x,y always together (npmi 1), x,z once each way."""
    import math

    from graphrag_rs_spark.operators.relationships import pmi_edges

    m = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z"), (4, "w")],
        ["doc_id", "entity_id"],
    )
    out = {(r["subj"], r["obj"]): r for r in pmi_edges(
        m, min_pair_count=1
    ).collect()}
    # x,y: p_ab=2/4, p_x=3/4, p_y=2/4 → pmi=ln(0.5/(0.75*0.5))=ln(4/3)
    assert abs(out[("x", "y")]["pmi"] - round(math.log(4 / 3), 6)) < 1e-9
    assert out[("x", "y")]["pair_count"] == 2
    # npmi = pmi / -ln(0.5)
    assert abs(
        out[("x", "y")]["npmi"] - round(math.log(4 / 3) / -math.log(0.5), 6)
    ) < 1e-9
    # x,z: p_ab=1/4, pmi=ln(0.25/(0.75*0.25)) = ln(4/3)... = ln(1/0.75)
    assert abs(out[("x", "z")]["pmi"] - round(math.log(1 / 0.75), 6)) < 1e-9
    assert ("w", "x") not in out  # never co-occurs


def test_entity_salience_ranking(spark):
    """Rarer entity with equal tf outranks the ubiquitous one; top_k
    truncates; idf of an everywhere-entity is 0."""
    import math

    from graphrag_rs_spark.operators.keywords import entity_salience

    rows = [
        (1, "common", 5), (2, "common", 5), (3, "common", 5),
        (1, "rare", 5), (1, "mid", 9),
        (2, "mid", 1),
    ]
    m = spark.createDataFrame(rows, ["doc_id", "entity_id", "tf"])
    out = {(r["doc_id"], r["entity_id"]): r for r in entity_salience(
        m
    ).collect()}
    assert out[(1, "common")]["idf"] == 0.0  # ln(3/3)
    assert out[(1, "common")]["salience"] == 0.0
    # doc 1: rare (5·ln3) > mid (9·ln(3/2)) > common (0)
    assert out[(1, "rare")]["rank"] == 1
    assert abs(out[(1, "rare")]["salience"] - round(5 * math.log(3), 6)) < 1e-9
    assert out[(1, "mid")]["rank"] == 2
    assert out[(1, "common")]["rank"] == 3
    top1 = entity_salience(m, top_k=1)
    assert top1.count() == 3 and all(
        r["rank"] == 1 for r in top1.collect()
    )


def test_katz_hand_computed(spark):
    """Chain a→b→c with small alpha: closed form after convergence-many
    rounds — katz(a)=β, katz(b)=β+αβ, katz(c)=β+α(β+αβ)."""
    from graphrag_rs_spark.operators.analytics import katz_centrality

    edges = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    out = {r["id"]: r["katz"] for r in katz_centrality(
        edges, alpha=0.1, beta=1.0, max_iterations=10
    ).collect()}
    assert abs(out["a"] - 1.0) < 1e-12
    assert abs(out["b"] - 1.1) < 1e-12
    assert abs(out["c"] - 1.11) < 1e-12


def test_degree_histogram(spark):
    from graphrag_rs_spark.operators.analytics import degree_histogram

    # triangle + pendant: degrees 2,2,3,1
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")], ["src", "dst"]
    )
    out = {r["degree"]: r["n_nodes"] for r in degree_histogram(edges).collect()}
    assert out == {1: 1, 2: 2, 3: 1}


def test_contract_graph(spark):
    """Two 2-cliques joined by one bridge, labels = clique id: two
    self-loops carrying intra mass + one cross edge."""
    from graphrag_rs_spark.operators.analytics import contract_graph

    edges = spark.createDataFrame(
        [("a", "b"), ("c", "d"), ("b", "c")], ["src", "dst"]
    )
    labels = spark.createDataFrame(
        [("a", "L"), ("b", "L"), ("c", "R"), ("d", "R")], ["id", "label"]
    )
    out = {(r["label_a"], r["label_b"]): (r["n_edges"], r["weight"])
           for r in contract_graph(edges, labels).collect()}
    assert out == {("L", "L"): (1, 1.0), ("R", "R"): (1, 1.0),
                   ("L", "R"): (1, 1.0)}


def test_feature_propagation_mean_smoothing(spark):
    """1 round on a→b with 1-dim features: both become the pair mean;
    isolated node keeps its value."""
    from graphrag_rs_spark.operators.featprop import feature_propagation

    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    feats = spark.createDataFrame(
        [("a", [0.0]), ("b", [2.0]), ("z", [7.0])], ["id", "features"]
    )
    out = {r["id"]: r["features"] for r in feature_propagation(
        edges, feats, rounds=1
    ).collect()}
    assert out["a"] == [1.0] and out["b"] == [1.0]
    assert out["z"] == [7.0]  # isolated: h/1
    # two rounds: already at the fixed point for the pair
    out2 = {r["id"]: r["features"] for r in feature_propagation(
        edges, feats, rounds=2
    ).collect()}
    assert out2["a"] == [1.0] and out2["b"] == [1.0]


def test_multilevel_lpa_contract_roundtrip(spark):
    """Two triangles joined by a bridge: level-1 LPA labels each
    triangle; contraction + level-2 LPA merges them into one
    supercommunity via the bridge edge."""
    from graphrag_rs_spark.operators.analytics import contract_graph
    from graphrag_rs_spark.operators.lpa import label_propagation

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"),
         ("x", "y"), ("y", "z"), ("x", "z"),
         ("c", "x")],
        ["src", "dst"],
    )
    l1 = label_propagation(edges, n_rounds=2)
    super_e = (
        contract_graph(edges, l1)
        .where("label_a != label_b")
        .selectExpr("label_a as src", "label_b as dst")
    )
    # the bridge produces at least one cross-label superedge unless LPA
    # already merged everything
    labels = {r["id"]: r["label"] for r in l1.collect()}
    if len(set(labels.values())) > 1:
        assert super_e.count() >= 1
        l2 = label_propagation(super_e, n_rounds=2)
        sup = {r["id"]: r["label"] for r in l2.collect()}
        # supergraph of 2 connected supernodes collapses to one community
        if len(set(labels.values())) == 2:
            assert len(set(sup.values())) == 1


def test_k_truss_clique_survives_bridge_peels(spark):
    """K4 + pendant chain: the 4-truss keeps exactly the K4 edges, each
    with support 2; every chain edge peels. 5-truss of K4 is empty."""
    from graphrag_rs_spark.operators.analytics import k_truss

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    chain = [("d", "e"), ("e", "f")]
    edges = spark.createDataFrame(k4 + chain, ["src", "dst"])
    out = {(r["a"], r["b"]): r["support"] for r in k_truss(edges, k=4).collect()}
    assert set(out) == {tuple(sorted(e)) for e in k4}
    assert all(s == 2 for s in out.values())
    assert k_truss(edges, k=5).count() == 0


def test_k_truss_cascading_peel(spark):
    """Peeling must cascade: a triangle hanging off a K4 survives the
    3-truss but the 4-truss must also remove K4 edges' lost support
    transitively — here the pendant triangle peels in round 1 and the
    K4 stays intact."""
    from graphrag_rs_spark.operators.analytics import k_truss

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    pendant_tri = [("d", "x"), ("d", "y"), ("x", "y")]
    edges = spark.createDataFrame(k4 + pendant_tri, ["src", "dst"])
    t4 = {(r["a"], r["b"]) for r in k_truss(edges, k=4).collect()}
    assert t4 == {tuple(sorted(e)) for e in k4}
    t3 = {(r["a"], r["b"]) for r in k_truss(edges, k=3).collect()}
    assert t3 == {tuple(sorted(e)) for e in k4 + pendant_tri}


def test_peeling_raises_on_max_iter_exhaustion(spark):
    """k_core/k_truss must raise rather than return a non-fixpoint (and
    max_iter=0 used to raise UnboundLocalError in k_truss) — matching
    the scc/topological_layers convergence contract (round-4 ADVICE)."""
    import pytest

    from graphrag_rs_spark.operators.analytics import k_truss

    # chain a-b-c-d-e peels one layer per round under k=2
    chain = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    with pytest.raises(RuntimeError, match="k_core did not converge"):
        k_core(_edges(spark, chain), 2, max_iter=1)
    # triangle fan needs >0 rounds to stabilize under k=4
    tri = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    with pytest.raises(RuntimeError, match="k_truss did not converge"):
        k_truss(_edges(spark, tri), k=3, max_iter=0)
