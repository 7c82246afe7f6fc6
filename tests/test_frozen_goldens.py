"""Frozen-golden guard: the oracle's output on the canonical fixture corpus
is pinned to a checked-in JSON snapshot (tests/goldens/golden_kg_seed42.json,
produced once and frozen — FIXTURES.md §2). The Spark pipeline is proven
equal to the oracle elsewhere (test_pipeline_golden); this test closes the
loop so a kernel edit that silently changes extraction semantics fails CI
instead of drifting both sides together."""

from __future__ import annotations

import json
import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "golden_kg_seed42.json")


@pytest.fixture(scope="module")
def frozen():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def fresh(frozen):
    from graphrag_rs_spark.fixtures import generate_corpus
    from graphrag_rs_spark.oracle import build_golden

    c = frozen["corpus"]
    corpus = generate_corpus(
        n_docs=c["n_docs"], seed=c["seed"], include_edge_cases=c["include_edge_cases"]
    )
    return build_golden(corpus)


def test_counts_frozen(frozen, fresh):
    assert len(fresh["chunks"]) == frozen["n_chunks"]
    assert len(fresh["mentions"]) == frozen["n_mentions"]
    assert len(fresh["entities"]) == frozen["n_entities"]
    assert len(fresh["triples"]) == len(frozen["triples"])


def test_triples_frozen(frozen, fresh):
    got = {
        (t["subj"], t["pred"], t["obj"]): (round(t["confidence"], 5), len(t["context_chunk_ids"]))
        for t in fresh["triples"]
    }
    want = {
        (t["subj"], t["pred"], t["obj"]): (round(t["confidence"], 5), t["n_context"])
        for t in frozen["triples"]
    }
    assert got == want


def test_entities_frozen(frozen, fresh):
    got = {
        (e["entity_id"], e["entity_type"], round(e["confidence"], 5), e["mention_count"])
        for e in fresh["entities"]
    }
    want = {
        (e["entity_id"], e["entity_type"], round(e["confidence"], 5), e["mention_count"])
        for e in frozen["entities"]
    }
    assert got == want
