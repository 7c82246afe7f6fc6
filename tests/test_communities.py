"""Community detection: LP on the reference's 2-community toy shape
(leiden.rs:785-843 analog), connectivity refinement, summaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphrag_rs_spark.operators.communities import (
    detect_communities,
    label_propagation,
    summarize_communities,
    triples_to_edges,
)


def _triples(spark, rows):
    from graphrag_rs_spark.schemas import TRIPLES_SCHEMA

    return spark.createDataFrame(
        [(s, "RELATED_TO", o, 0.5 if w is None else w, []) for s, o, w in rows],
        schema=TRIPLES_SCHEMA,
    )


def test_two_cliques_two_communities(spark):
    # two triangles joined by a single weak bridge — the reference's own
    # toy test shape (leiden.rs:785-843)
    rows = [
        ("a1", "a2", 1.0), ("a2", "a3", 1.0), ("a1", "a3", 1.0),
        ("b1", "b2", 1.0), ("b2", "b3", 1.0), ("b1", "b3", 1.0),
        ("a3", "b1", 0.1),
    ]
    comm = detect_communities(_triples(spark, rows)).collect()
    by_node = {r["entity_id"]: r["community_id"] for r in comm}
    assert by_node["a1"] == by_node["a2"] == by_node["a3"]
    assert by_node["b1"] == by_node["b2"] == by_node["b3"]
    assert by_node["a1"] != by_node["b1"]
    assert all(r["level"] == 0 for r in comm)


def test_all_nodes_assigned_once(spark):
    rows = [("a", "b", 1.0), ("c", "d", 1.0), ("e", "f", 1.0)]
    comm = detect_communities(_triples(spark, rows))
    assert comm.count() == 6
    assert comm.select("entity_id").distinct().count() == 6


def test_refinement_splits_disconnected(spark):
    # two components that LP could label identically must end up split:
    # feed LP output through refinement via detect_communities and assert
    # no community spans disconnected subgraphs
    rows = [("a", "b", 1.0), ("x", "y", 1.0)]
    comm = detect_communities(_triples(spark, rows)).collect()
    by_node = {r["entity_id"]: r["community_id"] for r in comm}
    assert by_node["a"] == by_node["b"]
    assert by_node["x"] == by_node["y"]
    assert by_node["a"] != by_node["x"]


def test_determinism_across_runs(spark):
    rows = [
        ("a1", "a2", 1.0), ("a2", "a3", 1.0), ("a1", "a3", 1.0),
        ("b1", "b2", 1.0), ("b2", "b3", 1.0), ("b1", "b3", 1.0),
        ("a3", "b1", 0.1),
    ]
    t = _triples(spark, rows)
    c1 = sorted(map(tuple, detect_communities(t).collect()))
    c2 = sorted(map(tuple, detect_communities(t.repartition(7)).collect()))
    assert c1 == c2


def test_edges_projection_symmetric_weighted(spark):
    t = _triples(spark, [("a", "b", 0.5), ("a", "b", None)])
    edges = {(r["src"], r["dst"]): r["weight"] for r in triples_to_edges(t).collect()}
    assert edges[("a", "b")] == edges[("b", "a")] == 1.0


def test_label_propagation_weighted_pull(spark):
    # node m is connected to clique {a1,a2} with strong weights and to x
    # weakly — it must join the a-side
    edges = spark.createDataFrame(
        [
            ("a1", "a2", 5.0), ("a2", "a1", 5.0),
            ("a1", "m", 5.0), ("m", "a1", 5.0),
            ("a2", "m", 5.0), ("m", "a2", 5.0),
            ("x", "m", 0.1), ("m", "x", 0.1),
        ],
        ["src", "dst", "weight"],
    )
    labels = {r["id"]: r["label"] for r in label_propagation(edges).collect()}
    assert labels["m"] == labels["a1"] == labels["a2"]


def _clique(prefix, k, w=1.0):
    nodes = [f"{prefix}{i}" for i in range(k)]
    return [(a, b, w) for i, a in enumerate(nodes) for b in nodes[i + 1:]]


def test_dense_but_modular_splits(spark):
    # two K5 cliques + one bridge: round-1 min-biased LP over-merged this
    # shape into a single community; the modularity objective must split it
    rows = _clique("a", 5) + _clique("b", 5) + [("a0", "b0", 1.0)]
    comm = detect_communities(_triples(spark, rows)).collect()
    by_node = {r["entity_id"]: r["community_id"] for r in comm}
    assert len(set(by_node.values())) == 2
    assert len({by_node[f"a{i}"] for i in range(5)}) == 1
    assert len({by_node[f"b{i}"] for i in range(5)}) == 1


def test_resolution_knob(spark):
    # higher resolution → smaller communities (leiden.rs:444 semantics);
    # at an extreme resolution every positive ΔQ vanishes → all singletons
    from graphrag_rs_spark.operators.communities import modularity_local_moving

    rows = _clique("a", 4) + _clique("b", 4) + [("a0", "b0", 1.0)]
    edges = triples_to_edges(_triples(spark, rows))
    low = modularity_local_moving(edges, resolution=1.0)
    high = modularity_local_moving(edges, resolution=50.0)
    n_low = low.select("label").distinct().count()
    n_high = high.select("label").distinct().count()
    assert n_low == 2
    assert n_high == 8  # every node stays a singleton


def test_max_cluster_size_gate(spark):
    from graphrag_rs_spark.operators.communities import modularity_local_moving

    # one K6 clique wants to be a single 6-community; the cap gates growth
    edges = triples_to_edges(_triples(spark, _clique("a", 6)))
    capped = modularity_local_moving(edges, max_cluster_size=3)
    sizes = (
        capped.groupBy("label").count().select("count").toPandas()["count"].tolist()
    )
    assert max(sizes) <= 3 + 2  # soft cap: same-superstep joins may overshoot slightly
    uncapped = modularity_local_moving(edges)
    assert uncapped.select("label").distinct().count() == 1


def test_modularity_matches_reference_formula_unweighted(spark):
    # reference toy (leiden.rs:785-843): triangle A-B-C + weak link C-D.
    # With weights, D stays out only if the 0.1 edge is too weak; verify
    # the weighted ΔQ keeps the triangle together in one community
    rows = [("A", "B", 1.0), ("B", "C", 1.0), ("C", "A", 1.0), ("C", "D", 0.1)]
    comm = detect_communities(_triples(spark, rows)).collect()
    by_node = {r["entity_id"]: r["community_id"] for r in comm}
    assert by_node["A"] == by_node["B"] == by_node["C"]


def test_summaries_format(spark):
    comm = spark.createDataFrame(
        [(0, "PERSON_a", 7), (0, "PERSON_b", 7), (0, "LOCATION_x", 7)],
        ["level", "entity_id", "community_id"],
    )
    ents = spark.createDataFrame(
        [
            ("PERSON_a", "Alice", "PERSON", 0.9, 1),
            ("PERSON_b", "Bob", "PERSON", 0.8, 1),
            ("LOCATION_x", "Xanadu", "LOCATION", 0.9, 1),
        ],
        ["entity_id", "name", "entity_type", "confidence", "mention_count"],
    )
    rows = summarize_communities(comm, ents).collect()
    assert len(rows) == 1
    s = rows[0]
    assert s["member_count"] == 3
    assert "Contains 3 entities:" in s["summary"]
    assert "- PERSON: Alice, Bob" in s["summary"]
    assert "- LOCATION: Xanadu" in s["summary"]


def test_summaries_top5_and_more(spark):
    comm = spark.createDataFrame(
        [(0, f"PERSON_{i}", 1) for i in range(8)], ["level", "entity_id", "community_id"]
    )
    ents = spark.createDataFrame(
        [(f"PERSON_{i}", f"Name{i}", "PERSON", 0.9, 1) for i in range(8)],
        ["entity_id", "name", "entity_type", "confidence", "mention_count"],
    )
    s = summarize_communities(comm, ents).collect()[0]
    assert "and 3 more" in s["summary"]
    assert s["summary"].count("Name") == 5


def test_xxh64_int_mirror_matches_spark(spark):
    # the sequential kernel's eligibility gate must chain exactly like
    # F.xxhash64(src, lit(it)): inner = xxhash64(src), outer = hashInt(it, inner)
    from graphrag_rs_spark.kernel.communities import xxh64_int

    ids = ["PERSON_a", "ORG_x", "n0", "LOCATION_new_york", ""]
    df = spark.createDataFrame([(i,) for i in ids], ["id"])
    for it in (0, 1, 5, 19):
        rows = df.select(
            "id",
            F.xxhash64("id").alias("inner"),
            F.xxhash64("id", F.lit(it)).alias("chain"),
            F.pmod(F.xxhash64("id", F.lit(it)), F.lit(2)).alias("gate"),
        ).collect()
        for r in rows:
            mine = xxh64_int(it, r["inner"])
            signed = mine - (1 << 64) if mine >= (1 << 63) else mine
            assert signed == r["chain"]
            assert mine % 2 == r["gate"]


def _parity_graphs():
    # shapes that exercise moves, merges, refinement, ties and bridges
    g1 = _clique("a", 3) + _clique("b", 3) + [("a0", "b0", 0.1)]
    g2 = _clique("a", 5) + _clique("b", 5) + [("a0", "b0", 1.0)]
    g3 = [("a", "b", 1.0), ("x", "y", 1.0), ("p", "q", 0.5)]
    # deterministic pseudo-random graph, 80 nodes, dyadic weights
    g4 = []
    for i in range(80):
        for j in (1, 3, 7):
            a, b = f"n{i:02d}", f"n{(i * j + 13) % 80:02d}"
            if a != b:
                g4.append((a, b, ((i + j) % 8 + 1) / 4.0))
    return [g1, g2, g3, g4]


def test_sequential_path_byte_identical_to_distributed(spark):
    # the small-graph fast path must produce EXACTLY the distributed
    # output: same supersteps, same gate, same tie-breaks
    import dataclasses

    from graphrag_rs_spark.config import DEFAULT_CONFIG

    dist_cfg = dataclasses.replace(DEFAULT_CONFIG, community_small_graph_edges=0)
    for rows in _parity_graphs():
        t = _triples(spark, rows)
        fast = sorted(map(tuple, detect_communities(t).collect()))
        dist = sorted(map(tuple, detect_communities(t, dist_cfg).collect()))
        assert fast == dist


def test_modularity_local_moving_parity(spark):
    from graphrag_rs_spark.operators.communities import modularity_local_moving

    for rows in _parity_graphs():
        edges = triples_to_edges(_triples(spark, rows))
        fast = sorted(map(tuple, modularity_local_moving(edges).collect()))
        dist = sorted(
            map(tuple, modularity_local_moving(edges, small_graph_edges=0).collect())
        )
        assert fast == dist


def test_cc_union_find_parity(spark):
    from graphrag_rs_spark.operators.cc import connected_components

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("q", "q")], ["src", "dst"]
    )
    verts = spark.createDataFrame([("a",), ("b",), ("c",), ("x",), ("y",), ("z",), ("q",)], ["id"])
    fast = sorted(map(tuple, connected_components(edges, verts).collect()))
    dist = sorted(
        map(tuple, connected_components(edges, verts, collect_threshold=0).collect())
    )
    assert fast == dist
    assert dict(fast)["z"] == "z"


def test_modularity_two_cliques(spark):
    from graphrag_rs_spark.operators.communities import modularity

    # two disjoint triangles, unit weights, symmetric list
    tri = lambda off: [  # noqa: E731
        (f"n{a + off}", f"n{b + off}", 1.0)
        for a, b in [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)]
    ]
    edges = spark.createDataFrame(tri(0) + tri(10), ["src", "dst", "weight"])
    labels = spark.createDataFrame(
        [(f"n{i + off}", off) for off in (0, 10) for i in range(3)],
        ["id", "label"],
    )
    rows = {r["community_id"]: r for r in modularity(edges, labels).collect()}
    # perfect split of two equal cliques: Q = 2*(1/2 - 1/4) = 1/2
    total = sum(r["contribution"] for r in rows.values())
    assert abs(total - 0.5) < 1e-12
    for r in rows.values():
        assert r["intra_weight"] == 6.0 and r["degree_weight"] == 6.0


def test_modularity_penalizes_merged_partition(spark):
    from graphrag_rs_spark.operators.communities import modularity

    tri = lambda off: [  # noqa: E731
        (f"n{a + off}", f"n{b + off}", 1.0)
        for a, b in [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)]
    ]
    edges = spark.createDataFrame(tri(0) + tri(10), ["src", "dst", "weight"])
    one = spark.createDataFrame(
        [(f"n{i + off}", 0) for off in (0, 10) for i in range(3)],
        ["id", "label"],
    )
    total = sum(
        r["contribution"] for r in modularity(edges, one).collect()
    )
    # everything in one community: Q = 1 - 1 = 0 < 0.5
    assert abs(total) < 1e-12
