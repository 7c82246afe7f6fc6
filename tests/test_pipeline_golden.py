"""Golden-output harness: the distributed pipeline vs the sequential oracle.

The oracle (oracle/pipeline.py) runs the reference-semantics pipeline
single-threaded; the Spark pipeline runs the same stages distributed
(mapInPandas extraction, self-join pair generation, when()-typing, groupBy
dedupe). P/R on the (subj, pred, obj) set must be ≥ 0.95 (BASELINE.json) —
in practice exactly 1.0, since both sides share the per-chunk kernel and
differ only in composition.
"""

from __future__ import annotations

import pytest

from graphrag_rs_spark.config import PipelineConfig
from graphrag_rs_spark.fixtures import generate_corpus
from graphrag_rs_spark.oracle import build_golden
from graphrag_rs_spark.pipeline import build_graph
from graphrag_rs_spark.schemas import SOURCE_SCHEMA


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(n_docs=20, seed=42, include_edge_cases=True)


@pytest.fixture(scope="module")
def golden(corpus):
    return build_golden(corpus)


@pytest.fixture(scope="module")
def tables(spark, corpus):
    src = spark.createDataFrame(corpus, schema=SOURCE_SCHEMA)
    return build_graph(src)


def _pr(predicted: set, golden: set) -> tuple[float, float]:
    if not predicted or not golden:
        return (0.0, 0.0)
    tp = len(predicted & golden)
    return tp / len(predicted), tp / len(golden)


def test_chunks_match_oracle(tables, golden):
    got = {
        (r["chunk_id"], r["content"], r["start_offset"], r["end_offset"])
        for r in tables.chunks.collect()
    }
    want = {
        (c["chunk_id"], c["content"], c["start_offset"], c["end_offset"])
        for c in golden["chunks"]
    }
    assert got == want


def test_mentions_match_oracle(tables, golden):
    got = {
        (r["chunk_id"], r["entity_id"], r["name"], r["entity_type"],
         round(r["confidence"], 5), r["n_mentions"])
        for r in tables.mentions.collect()
    }
    want = {
        (m["chunk_id"], m["entity_id"], m["name"], m["entity_type"],
         round(m["confidence"], 5), m["n_mentions"])
        for m in golden["mentions"]
    }
    assert got == want


def test_entities_match_oracle(tables, golden):
    got = {
        (r["entity_id"], r["entity_type"], round(r["confidence"], 5), r["mention_count"])
        for r in tables.entities.collect()
    }
    want = {
        (e["entity_id"], e["entity_type"], round(e["confidence"], 5), e["mention_count"])
        for e in golden["entities"]
    }
    assert got == want


def test_triples_pr_at_least_095(tables, golden):
    got = {(r["subj"], r["pred"], r["obj"]) for r in tables.triples.collect()}
    want = {(t["subj"], t["pred"], t["obj"]) for t in golden["triples"]}
    precision, recall = _pr(got, want)
    assert precision >= 0.95, f"precision {precision} < 0.95"
    assert recall >= 0.95, f"recall {recall} < 0.95"


def test_triples_context_and_confidence(tables, golden):
    got = {
        (r["subj"], r["pred"], r["obj"]): (round(r["confidence"], 5), set(r["context_chunk_ids"]))
        for r in tables.triples.collect()
    }
    want = {
        (t["subj"], t["pred"], t["obj"]): (round(t["confidence"], 5), set(t["context_chunk_ids"]))
        for t in golden["triples"]
    }
    assert got == want


def test_sha_invariant(spark, corpus, tables):
    from graphrag_rs_spark.operators.ingest import verify_sha_invariant

    src = spark.createDataFrame(corpus, schema=SOURCE_SCHEMA)
    assert verify_sha_invariant(tables.documents, src) == 0


def test_nondefault_config_flows_through(spark, corpus):
    cfg = PipelineConfig(chunk_size=256, chunk_overlap=32, min_confidence=0.7)
    src = spark.createDataFrame(corpus, schema=SOURCE_SCHEMA)
    t = build_graph(src, cfg)
    g = build_golden(corpus, cfg)
    got = {(r["subj"], r["pred"], r["obj"]) for r in t.triples.collect()}
    want = {(x["subj"], x["pred"], x["obj"]) for x in g["triples"]}
    assert got == want
    assert all(
        len(r["content"]) <= 256 for r in t.chunks.select("content").collect()
    )
