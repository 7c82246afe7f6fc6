"""PageRank, TF-IDF keywords, code-aware chunking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.kernel.chunking import chunk_text
from graphrag_rs_spark.operators.code_chunking import split_code


def test_pagerank_star(spark):
    from graphrag_rs_spark.operators.pagerank import pagerank

    # star: everyone points at hub → hub gets the highest rank
    edges = spark.createDataFrame(
        [(f"leaf{i}", "hub", 1.0) for i in range(5)], ["src", "dst", "weight"]
    )
    ranks = {r["id"]: r["rank"] for r in pagerank(edges, max_iterations=30).collect()}
    assert ranks["hub"] == max(ranks.values())
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_uniform_cycle(spark):
    from graphrag_rs_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)], ["src", "dst", "weight"]
    )
    ranks = [r["rank"] for r in pagerank(edges).collect()]
    assert all(r == pytest.approx(1 / 3, abs=1e-4) for r in ranks)


def test_personalized_pagerank_hand_computed(spark):
    """PPR vs a pure-python replica of the reference iteration
    (pagerank.rs pagerank_iteration_parallel + build_reset_vector,
    including the non-seed-keeps-1/n reset quirk)."""
    from graphrag_rs_spark.operators.pagerank import pagerank

    edge_rows = [("a", "b", 1.0), ("b", "a", 1.0), ("b", "c", 1.0), ("c", "b", 1.0)]
    edges = spark.createDataFrame(edge_rows, ["src", "dst", "weight"])
    seeds = spark.createDataFrame([("a", 1.0)], ["id", "prob"])
    got = {
        r["id"]: r["rank"]
        for r in pagerank(
            edges, reset_probs=seeds, max_iterations=40, tol=0.0
        ).collect()
    }

    nodes = ["a", "b", "c"]
    n = len(nodes)
    reset = {"a": 1.0, "b": 1.0 / n, "c": 1.0 / n}  # quirk: non-seeds keep 1/n
    outw = {}
    for s, _, w in [(s, d, w) for s, d, w in edge_rows]:
        outw[s] = outw.get(s, 0.0) + w
    rank = {v: 1.0 / n for v in nodes}
    d = 0.85
    for _ in range(40):
        new = {v: (1 - d) * reset[v] for v in nodes}
        for s, t, w in edge_rows:
            new[t] += d * rank[s] * w / outw[s]
        rank = new
    for v in nodes:
        assert got[v] == pytest.approx(rank[v], abs=1e-9), v
    # seed attracts teleport mass: a outranks c (symmetric otherwise)
    assert got["a"] > got["c"]


def test_pagerank_dangling_mass(spark):
    from graphrag_rs_spark.operators.pagerank import pagerank

    # b has no out-edges → dangling; Σ ranks must stay 1
    edges = spark.createDataFrame([("a", "b", 1.0)], ["src", "dst", "weight"])
    ranks = {r["id"]: r["rank"] for r in pagerank(edges, max_iterations=30).collect()}
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-6)
    assert ranks["b"] > ranks["a"]


def test_tfidf_keywords(spark):
    from graphrag_rs_spark.operators.keywords import tfidf_keywords

    docs = spark.createDataFrame(
        [
            (1, "zebra zebra zebra common common"),
            (2, "common common apple apple apple"),
            (3, "common banana"),
        ],
        ["doc_id", "content"],
    )
    kw = tfidf_keywords(docs, top_k=1).collect()
    best = {r["doc_id"]: r["keyword"] for r in kw}
    assert best[1] == "zebra"
    assert best[2] == "apple"
    assert best[3] == "banana"  # 'common' has df=3 → idf=0


def test_split_code_rust_items():
    src = (
        "/// doc comment\n"
        "pub fn alpha(x: u32) -> u32 {\n    x + 1\n}\n\n"
        "pub struct Beta {\n    pub id: u64,\n    name: String,\n    value: f64,\n}\n\n"
        "impl Beta {\n    fn gamma(&self) -> u64 {\n        self.id\n    }\n}\n"
    )
    chunks = split_code(src, "rust", min_chunk_size=20)
    assert len(chunks) == 3
    assert chunks[0][1].startswith("/// doc comment")
    assert "pub struct Beta" in chunks[1][1]
    assert chunks[2][1].startswith("impl Beta")
    # offsets slice back
    for _, content, s, e in chunks:
        assert src[s:e] == content


def test_split_code_no_boundaries_single_chunk():
    text = "just some text without items"
    assert split_code(text, "rust") == [(0, text, 0, len(text))]


def test_split_code_fallback_lang_uses_c1():
    text = "Sentence one. " * 100
    assert split_code(text, "unknown_lang") == chunk_text(text)


def test_chunk_code_documents_dispatch(spark):
    from graphrag_rs_spark.operators.code_chunking import chunk_code_documents

    fn_a = "pub fn alpha(input: &str) -> usize {\n    input.split_whitespace().count()\n}\n\n"
    fn_b = "pub fn beta(values: &[u64]) -> u64 {\n    values.iter().sum::<u64>()\n}\n"
    rows = [
        ("d1", "rust", fn_a + fn_b),
        ("d2", "text", "Plain text. " * 100),
        ("d3", "markdown",
         "# Title\n\nSome introduction text that is long enough to stand alone here.\n\n"
         "## Section\n\nMore body text that also clears the minimum chunk size limit.\n"),
        ("d4", "rust", None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "content"])
    chunks = chunk_code_documents(df).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc["d1"]) == 2
    assert len(by_doc["d2"]) >= 2
    assert len(by_doc["d3"]) >= 2
    assert "d4" not in by_doc
    assert all(r["chunk_id"] == f"{r['doc_id']}_{i}" for d in by_doc.values()
               for i, r in enumerate(sorted(d, key=lambda x: x["start_offset"])))


def test_ego_network_hops_and_induced_edges(spark):
    from graphrag_rs_spark.operators.traversal import ego_network

    # chain a-b-c-d plus weak edge b-x (filtered) and triangle edge a-c
    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0),
         ("b", "x", 0.2), ("a", "c", 0.9)],
        ["src", "dst", "weight"],
    )
    centers = spark.createDataFrame([("a",)], ["id"])
    nodes, sub = ego_network(edges, centers, k_hops=2, min_strength=0.5)
    dist = {r["node"]: r["distance"] for r in nodes.collect()}
    assert dist == {"a": 0, "b": 1, "c": 1, "d": 2}  # x filtered by strength
    got_edges = {(r["src"], r["dst"]) for r in sub.collect()}
    assert got_edges == {("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")}


def test_find_all_paths_simple_and_bounded(spark):
    from graphrag_rs_spark.operators.traversal import find_all_paths

    # two routes a→d: a-b-c-d (len 4 > max_depth 3 edges? depth counts
    # hops: 3 hops allowed) and a-c-d (2 hops); plus a cycle a-b-a pruned
    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0), ("a", "c", 1.0)],
        ["src", "dst", "weight"],
    )
    got = [tuple(r["path"]) for r in
           find_all_paths(edges, "a", "d", max_depth=3).collect()]
    assert got == [("a", "c", "d"), ("a", "b", "c", "d")]  # shortest first
    # depth bound: only the 2-hop route survives max_depth=2
    got2 = [tuple(r["path"]) for r in
            find_all_paths(edges, "a", "d", max_depth=2).collect()]
    assert got2 == [("a", "c", "d")]
    # max_paths truncation is deterministic
    got3 = [tuple(r["path"]) for r in
            find_all_paths(edges, "a", "d", max_depth=3, max_paths=1).collect()]
    assert got3 == [("a", "c", "d")]
    # source == target → the trivial path
    got4 = [tuple(r["path"]) for r in
            find_all_paths(edges, "a", "a", max_depth=3).collect()]
    assert got4 == [("a",)]


def test_mention_context_windows(spark):
    from graphrag_rs_spark.operators.extraction import mention_context_windows

    chunks = spark.createDataFrame(
        [("c1", "d1", "x" * 40 + "spark rules here"),
         ("c2", "d2", "spark at start")],
        ["chunk_id", "doc_id", "content"],
    )
    gaz = spark.createDataFrame([("spark", "CONCEPT")], ["name", "entity_type"])
    rows = {r["chunk_id"]: r for r in
            mention_context_windows(chunks, gaz, window=5).collect()}
    r1 = rows["c1"]
    assert r1["start_offset"] == 40
    assert r1["snippet"] == "xxxxxspark rule"  # 5 before + name + 5 after
    r2 = rows["c2"]                            # window clamps at doc start
    assert r2["start_offset"] == 0
    assert r2["snippet"] == "spark at s"


def test_pagerank_paths_agree(spark):
    from graphrag_rs_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 1.0),
         ("a", "c", 0.5), ("d", "a", 1.0)],  # d dangles after its edge; e none
        "src string, dst string, weight double",
    )
    seeds = spark.createDataFrame([("a", 1.0)], "id string, prob double")
    for kw in ({}, {"reset_probs": seeds}):
        small = {
            r["id"]: round(r["rank"], 6)
            for r in pagerank(edges, max_iterations=10, tol=0.0, **kw).collect()
        }
        dist = {
            r["id"]: round(r["rank"], 6)
            for r in pagerank(
                edges, max_iterations=10, tol=0.0, collect_threshold=0, **kw
            ).collect()
        }
        assert small == dist and len(small) == 4
