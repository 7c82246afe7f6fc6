"""Incremental updates (G8): bucket-level rewrite, no re-extraction of
unchanged docs, convergence to the full-rebuild result."""

from __future__ import annotations

import json
import os

from graphrag_rs_spark.checkpoint import LEDGER, run_checkpointed, run_incremental
from graphrag_rs_spark.fixtures import generate_corpus
from graphrag_rs_spark.schemas import SOURCE_SCHEMA


def _src(spark, corpus):
    return spark.createDataFrame(corpus, schema=SOURCE_SCHEMA)


def _triples_set(spark, ws):
    df = spark.read.parquet(os.path.join(ws, "triples"))
    return {(r["subj"], r["pred"], r["obj"]) for r in df.collect()}


def test_incremental_matches_full_rebuild(spark, tmp_path):
    ws = str(tmp_path / "ws")
    corpus = generate_corpus(n_docs=10, include_edge_cases=False)
    run_checkpointed(_src(spark, corpus), ws)

    # mutate one doc, add one doc
    corpus2 = [dict(r) for r in corpus]
    corpus2[0]["content"] = (
        "Dr. Emily Chen works for Initech LLC in Berlin. "
        "Alice Johnson lives in Boston."
    )
    corpus2.append(
        {
            "repo": "orgX/projY", "path": "docs/new.txt", "commit": "f" * 40,
            "lang": "text",
            "content": "Prof. Robert Brown founded Globex Company in Tokyo.",
        }
    )

    stats = run_incremental(_src(spark, corpus2), ws)
    assert stats["changed_docs"] == 2
    assert 1 <= stats["buckets_rewritten"] <= 2

    got = _triples_set(spark, ws)

    # full rebuild in a fresh workspace must agree
    ws2 = str(tmp_path / "ws2")
    run_incremental(_src(spark, corpus2), ws2)  # bootstrap path (empty ws)
    want = _triples_set(spark, ws2)
    assert got == want
    assert len(got) > 0

    # docs table merged correctly
    docs = spark.read.parquet(os.path.join(ws, "documents"))
    assert docs.count() == 11
    assert docs.select("doc_id").distinct().count() == 11


def test_incremental_noop(spark, tmp_path):
    ws = str(tmp_path / "ws")
    corpus = generate_corpus(n_docs=6, include_edge_cases=False)
    run_checkpointed(_src(spark, corpus), ws)
    stats = run_incremental(_src(spark, corpus), ws)
    assert stats == {"changed_docs": 0, "buckets_rewritten": 0}


def test_incremental_ledger_records(spark, tmp_path):
    ws = str(tmp_path / "ws")
    corpus = generate_corpus(n_docs=6, include_edge_cases=False)
    run_checkpointed(_src(spark, corpus), ws)
    corpus2 = [dict(r) for r in corpus]
    corpus2[1]["content"] = corpus2[1]["content"] + " Extra tail sentence."
    run_incremental(_src(spark, corpus2), ws)
    ledger = [json.loads(x) for x in open(os.path.join(ws, LEDGER))]
    inc = [r for r in ledger if r["stage"] == "incremental"]
    assert inc and inc[-1]["rows"] == 1
    assert inc[-1]["partition_histogram"]["buckets_rewritten"] >= 1
