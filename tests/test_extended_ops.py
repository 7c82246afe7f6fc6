"""Hierarchical chunker, structured import, BFS, semantic edges, stats,
extractive summarizer, streaming index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.kernel.hierarchical import (
    chunk_text_hierarchical,
    chunk_text_hierarchical_raw,
)


# --- C2/C3 kernel (reference chunking.rs:264-351 expectations) ---

def test_hierarchical_prefers_paragraph_breaks():
    text = ("A" * 200 + " end of para.\n\n") + ("B" * 200 + " tail sentence. ") + "C" * 400
    chunks = chunk_text_hierarchical_raw(text, chunk_size=512, overlap=64)
    # first chunk must end at the paragraph break (highest-priority separator)
    assert chunks[0].endswith("\n\n")


def test_hierarchical_min_size_filter():
    # trailing fragment below min size (50) is dropped
    text = "X" * 512 + " tiny"
    chunks = chunk_text_hierarchical_raw(text, chunk_size=512, overlap=0, min_chunk_size=50)
    assert all(len(c.strip()) >= 50 for c in chunks)


def test_hierarchical_quarter_rule():
    # a separator in the first quarter of the window is ignored
    text = "Hi. " + "y" * 600
    chunks = chunk_text_hierarchical_raw(text, chunk_size=512, overlap=0)
    assert len(chunks[0]) > 512 // 4


def test_hierarchical_wrapper_cumulative_offsets():
    text = ("Sentence number one is long enough to matter. " * 30)
    out = chunk_text_hierarchical(text, 256, 32)
    # reference quirk: offsets are cumulative chunk lengths
    pos = 0
    for i, (idx, content, start, end) in enumerate(out):
        assert idx == i
        assert start == pos
        assert end == pos + len(content)
        pos = end


def test_hierarchical_strategy_in_operator(spark):
    from graphrag_rs_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [("d1", "Para one is long enough to be a chunk of text.\n\n" * 20)],
        ["doc_id", "content"],
    )
    legacy = chunk_documents(docs).count()
    hier = chunk_documents(docs, strategy="hierarchical").count()
    assert legacy > 0 and hier > 0
    with pytest.raises(ValueError):
        chunk_documents(docs, strategy="nope")


# --- S3 structured import ---

def test_import_entities_csv(spark, tmp_path):
    from graphrag_rs_spark.operators.import_data import ImportConfig, import_entities

    p = tmp_path / "ents.csv"
    p.write_text(
        "id,name,type,confidence\n"
        "E1,Alice,PERSON,0.9\n"
        "E2,Acme,ORGANIZATION,0.8\n"
        "E3,Boston,LOCATION,\n"
    )
    df = import_entities(spark, str(p), ImportConfig(format="csv"))
    rows = {r["entity_id"]: r for r in df.collect()}
    assert rows["E1"]["name"] == "Alice"
    assert rows["E3"]["confidence"] == 1.0  # default fill


def test_import_relationships_jsonl_and_max_errors(spark, tmp_path):
    from graphrag_rs_spark.operators.import_data import (
        ImportConfig,
        import_relationships,
    )

    p = tmp_path / "rels.jsonl"
    p.write_text(
        '{"source": "E1", "relation": "KNOWS", "target": "E2", "confidence": "0.7"}\n'
        "this is not json\n"
        '{"source": "E2", "relation": "WORKS_FOR", "target": "E3"}\n'
    )
    df = import_relationships(spark, str(p), ImportConfig(format="jsonl", max_errors=5))
    assert df.count() == 2
    with pytest.raises(ValueError, match="max_errors"):
        import_relationships(spark, str(p), ImportConfig(format="jsonl", max_errors=0))


def test_validate_referential(spark):
    from graphrag_rs_spark.operators.import_data import validate_referential

    rels = spark.createDataFrame(
        [("E1", "KNOWS", "E2", 0.5), ("E1", "KNOWS", "MISSING", 0.5)],
        ["subj", "pred", "obj", "confidence"],
    )
    ents = spark.createDataFrame([("E1",), ("E2",)], ["entity_id"])
    valid, dangling = validate_referential(rels, ents)
    assert valid.count() == 1
    assert dangling.collect()[0]["obj"] == "MISSING"


# --- G6 BFS ---

def test_bfs_depths_and_bound(spark):
    from graphrag_rs_spark.operators.traversal import bfs

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0), ("d", "e", 1.0),
         ("a", "x", 0.1)],  # below min_strength → unreachable
        ["src", "dst", "weight"],
    )
    sources = spark.createDataFrame([("a",)], ["id"])
    got = {r["node"]: r["depth"] for r in bfs(edges, sources, max_depth=3).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}  # e beyond depth, x filtered


def test_bfs_path_recorded(spark):
    from graphrag_rs_spark.operators.traversal import bfs

    edges = spark.createDataFrame([("a", "b", 1.0), ("b", "c", 1.0)], ["src", "dst", "weight"])
    sources = spark.createDataFrame([("a",)], ["id"])
    paths = {r["node"]: list(r["path"]) for r in bfs(edges, sources).collect()}
    assert paths["c"] == ["a", "b", "c"]


# --- R3 semantic edges + G11 stats ---

def test_semantic_edges(spark):
    from graphrag_rs_spark.operators.semantic_edges import semantic_edges

    ents = spark.createDataFrame(
        [
            ("E1", [1.0, 0.0, 0.0, 0.0]),
            ("E2", [0.999, 0.02, 0.0, 0.0]),
            ("E3", [0.0, 1.0, 0.0, 0.0]),
        ],
        ["entity_id", "embedding"],
    )
    got = semantic_edges(ents, dim=4, similarity_threshold=0.9).collect()
    assert len(got) == 1
    assert (got[0]["subj"], got[0]["pred"], got[0]["obj"]) == (
        "E1", "SEMANTICALLY_SIMILAR", "E2",
    )


def test_graph_statistics(spark):
    from graphrag_rs_spark.operators.semantic_edges import graph_statistics

    ents = spark.createDataFrame(
        [("E1", "A", "PERSON", 0.9, 1), ("E2", "B", "PERSON", 0.8, 1),
         ("E3", "C", "LOCATION", 0.9, 1)],
        ["entity_id", "name", "entity_type", "confidence", "mention_count"],
    )
    triples = spark.createDataFrame(
        [("E1", "KNOWS", "E2", 0.5, []), ("E1", "BORN_IN", "E3", 0.5, [])],
        "subj string, pred string, obj string, confidence float, context_chunk_ids array<string>",
    )
    row = graph_statistics(ents, triples).collect()[0]
    assert row["n_entities"] == 3
    assert row["n_triples"] == 2
    assert row["entities_by_type"]["PERSON"] == 2
    assert row["max_degree"] == 2


# --- Q5 extractive summarizer ---

def test_extractive_summary_picks_top_sentences(spark):
    from graphrag_rs_spark.operators.summarizer import extractive_summary

    text = (
        "Quantum computing hardware progress. "
        "Unrelated filler words here. "
        "Quantum computing needs quantum error correction hardware. "
        "More filler. "
        "Totally offtopic short bit."
    )
    docs = spark.createDataFrame([("d1", text)], ["doc_id", "content"])
    got = extractive_summary(docs, top_k_sentences=2).collect()[0]["summary"]
    assert "Quantum computing needs quantum error correction hardware" in got
    assert "Quantum computing hardware progress" in got
    assert "Totally offtopic" not in got


# --- streaming ---

def test_stream_index_available_now(spark, tmp_path):
    from graphrag_rs_spark.fixtures import generate_corpus
    from graphrag_rs_spark.schemas import SOURCE_SCHEMA
    from graphrag_rs_spark.streaming import consolidated_triples, stream_index

    input_dir = str(tmp_path / "in")
    ws = str(tmp_path / "ws")
    corpus = generate_corpus(n_docs=6, include_edge_cases=False)
    spark.createDataFrame(corpus, schema=SOURCE_SCHEMA).write.parquet(input_dir)

    q = stream_index(spark, input_dir, ws)
    q.awaitTermination(120)
    triples = consolidated_triples(spark, ws)
    assert triples.count() > 0
    # streaming output matches the batch pipeline on the same input
    from graphrag_rs_spark.pipeline import build_graph

    batch = build_graph(spark.createDataFrame(corpus, schema=SOURCE_SCHEMA)).triples
    got = {(r["subj"], r["pred"], r["obj"]) for r in triples.collect()}
    want = {(r["subj"], r["pred"], r["obj"]) for r in batch.collect()}
    assert got == want


GRAPHML = """<?xml version="1.0" encoding="UTF-8"?>
<graphml xmlns="http://graphml.graphdrawing.org/xmlns">
  <graph id="G" edgedefault="undirected">
    <node id="n0"><data key="name">Alice</data><data key="type">PERSON</data></node>
    <node id="n1"><data key="label">Acme Corp</data></node>
    <node id="n2"/>
    <edge source="n0" target="n1"><data key="type">WORKS_FOR</data></edge>
    <edge source="n1" target="n2"/>
  </graph>
</graphml>
"""


def test_import_graphml(spark, tmp_path):
    from graphrag_rs_spark.operators.import_data import import_graphml

    p = tmp_path / "g.graphml"
    p.write_text(GRAPHML)
    ents, rels = import_graphml(spark, str(p))
    e = {r["entity_id"]: (r["name"], r["entity_type"]) for r in ents.collect()}
    assert e["n0"] == ("Alice", "PERSON")
    assert e["n1"] == ("Acme Corp", "node")   # label fallback, default type
    assert e["n2"] == ("n2", "node")          # id fallback
    r = {(x["subj"], x["pred"], x["obj"]) for x in rels.collect()}
    assert r == {("n0", "WORKS_FOR", "n1"), ("n1", "related_to", "n2")}


TURTLE = """# a comment
@prefix ex: <http://example.org/> .
<http://example.org/alice> <http://example.org/name> "Alice" .
<http://example.org/alice> <http://example.org/type> "PERSON" .
<http://example.org/alice> <http://xmlns.com/foaf/0.1/knows> <http://example.org/bob> .
<http://example.org/bob> <http://example.org/worksFor> <http://example.org/acme#corp> .
"""


def test_import_rdf_turtle(spark, tmp_path):
    from graphrag_rs_spark.operators.import_data import import_rdf_turtle

    p = tmp_path / "t.ttl"
    p.write_text(TURTLE)
    ents, rels = import_rdf_turtle(spark, str(p))
    e = {r["entity_id"]: (r["name"], r["entity_type"]) for r in ents.collect()}
    assert e["alice"] == ("Alice", "PERSON")       # literal attrs applied
    assert e["bob"] == ("bob", "resource")         # defaults
    assert e["corp"] == ("corp", "resource")       # fragment local name
    r = {(x["subj"], x["pred"], x["obj"]) for x in rels.collect()}
    assert r == {("alice", "knows", "bob"), ("bob", "worksFor", "corp")}


def test_imported_graph_referential_validation(spark, tmp_path):
    # imports wire into R5 validation like any other entity/rel source
    from graphrag_rs_spark.operators.import_data import (
        import_graphml,
        validate_referential,
    )

    p = tmp_path / "g.graphml"
    p.write_text(GRAPHML)
    ents, rels = import_graphml(spark, str(p))
    valid, dangling = validate_referential(rels, ents)
    assert valid.count() == 2
    assert dangling.count() == 0
