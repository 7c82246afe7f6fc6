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
    assert stats == {"changed_docs": 0, "deleted_docs": 0, "buckets_rewritten": 0}


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


def test_incremental_deletion_and_empty_bucket(spark, tmp_path):
    """Deleted docs are removed from documents/mentions; a changed doc
    whose new content yields zero mentions leaves no stale rows even when
    its bucket becomes empty (round-1 dynamic-overwrite gap)."""
    ws = str(tmp_path / "ws")
    corpus = generate_corpus(n_docs=8, include_edge_cases=False)
    run_checkpointed(_src(spark, corpus), ws)
    docs0 = spark.read.parquet(os.path.join(ws, "documents"))
    n0 = docs0.count()

    # snapshot 2: drop the last doc entirely, blank out the first one
    corpus2 = [dict(r) for r in corpus[:-1]]
    corpus2[0]["content"] = "zzz qqq www"  # no extractable entities
    stats = run_incremental(_src(spark, corpus2), ws)
    assert stats["deleted_docs"] == 1
    assert stats["changed_docs"] == 1

    docs = spark.read.parquet(os.path.join(ws, "documents"))
    assert docs.count() == n0 - 1
    blank_id = [r["doc_id"] for r in docs.collect() if r["path"] == corpus[0]["path"]]
    mentions = spark.read.parquet(os.path.join(ws, "mentions_flagged"))
    # no mentions survive for the blanked doc or the deleted doc
    assert mentions.where(mentions["doc_id"].isin(blank_id)).count() == 0
    deleted_path = corpus[-1]["path"]
    assert docs.where(docs["path"] == deleted_path).count() == 0

    # result converges to a fresh rebuild of snapshot 2
    ws2 = str(tmp_path / "ws2")
    run_incremental(_src(spark, corpus2), ws2)
    assert _triples_set(spark, ws) == _triples_set(spark, ws2)


def test_incremental_delta_mode_skips_deletion(spark, tmp_path):
    ws = str(tmp_path / "ws")
    corpus = generate_corpus(n_docs=6, include_edge_cases=False)
    run_checkpointed(_src(spark, corpus), ws)
    # delta carries ONE updated doc; full_snapshot=False must not treat
    # the absent docs as deletions
    delta = [dict(corpus[0])]
    delta[0]["content"] = "Dr. Emily Chen works for Initech LLC in Berlin."
    stats = run_incremental(_src(spark, delta), ws, full_snapshot=False)
    assert stats["deleted_docs"] == 0
    docs = spark.read.parquet(os.path.join(ws, "documents"))
    assert docs.count() == 6


def test_config_change_invalidates_checkpoints(spark, tmp_path):
    from graphrag_rs_spark.config import PipelineConfig

    ws = str(tmp_path / "ws")
    corpus = generate_corpus(n_docs=5, include_edge_cases=False)
    run_checkpointed(_src(spark, corpus), ws)
    n_chunks_default = spark.read.parquet(os.path.join(ws, "chunks")).count()

    # same workspace, smaller chunk_size → chunks MUST be rebuilt
    cfg = PipelineConfig(chunk_size=128, chunk_overlap=16)
    run_checkpointed(_src(spark, corpus), ws, cfg)
    n_chunks_small = spark.read.parquet(os.path.join(ws, "chunks")).count()
    assert n_chunks_small > n_chunks_default

    # and re-running with the same config skips (ledger gains no new rows)
    with open(os.path.join(ws, LEDGER)) as f:
        before = sum(1 for _ in f)
    run_checkpointed(_src(spark, corpus), ws, cfg)
    with open(os.path.join(ws, LEDGER)) as f:
        after = sum(1 for _ in f)
    assert after == before


def test_crash_between_stage_and_swap_loses_nothing(spark, tmp_path, monkeypatch):
    """A crash after staging but before the bucket swap must leave the old
    workspace fully intact (the round-2 advice scenario: the old scheme
    rmtree'd buckets before writing, so a crash lost kept rows of unchanged
    docs); the NEXT run recovers the interrupted swap from the ledger
    marker and converges to the full-rebuild result."""
    import graphrag_rs_spark.checkpoint as cp

    ws = str(tmp_path / "ws")
    corpus = generate_corpus(n_docs=10, include_edge_cases=False)
    run_checkpointed(_src(spark, corpus), ws)
    docs_before = {
        (r["doc_id"], r["content_sha256"])
        for r in spark.read.parquet(os.path.join(ws, "documents")).collect()
    }

    corpus2 = [dict(r) for r in corpus]
    corpus2[0]["content"] = "Dr. Emily Chen works for Initech LLC in Berlin."

    # crash INSIDE the first swap: staged data + 'started' marker are on
    # disk, the bucket directories are untouched
    real_apply = cp._apply_swap

    def boom(*a, **k):
        raise RuntimeError("injected crash before swap")

    monkeypatch.setattr(cp, "_apply_swap", boom)
    try:
        run_incremental(_src(spark, corpus2), ws)
        raise AssertionError("expected injected crash")
    except RuntimeError:
        pass

    # old documents table fully intact — nothing lost
    docs_now = {
        (r["doc_id"], r["content_sha256"])
        for r in spark.read.parquet(os.path.join(ws, "documents")).collect()
    }
    assert docs_now == docs_before

    # next run: recovery + redo converges to the full rebuild
    monkeypatch.setattr(cp, "_apply_swap", real_apply)
    run_incremental(_src(spark, corpus2), ws)
    ws2 = str(tmp_path / "ws2")
    run_incremental(_src(spark, corpus2), ws2)
    assert _triples_set(spark, ws) == _triples_set(spark, ws2)
    d1 = spark.read.parquet(os.path.join(ws, "documents"))
    assert d1.count() == 10

    # ledger shows the recovered swap
    recs = [json.loads(x) for x in open(os.path.join(ws, LEDGER)) if x.strip()]
    assert any(r.get("recovered") for r in recs)
