"""Checkpoint/lineage/resume: ledger records, skip-on-match, change detection."""

from __future__ import annotations

import json
import os

from graphrag_rs_spark.checkpoint import (
    LEDGER,
    CheckpointManager,
    changed_documents,
    fingerprint,
    run_checkpointed,
)
from graphrag_rs_spark.fixtures import generate_corpus
from graphrag_rs_spark.schemas import SOURCE_SCHEMA


def _src(spark, corpus):
    return spark.createDataFrame(corpus, schema=SOURCE_SCHEMA)


def test_run_writes_tables_and_ledger(spark, tmp_path):
    ws = str(tmp_path / "ws")
    corpus = generate_corpus(n_docs=6, include_edge_cases=False)
    tables = run_checkpointed(_src(spark, corpus), ws)
    for name in ["documents", "chunks", "mentions", "entities", "triples"]:
        assert os.path.exists(os.path.join(ws, name)), name
        assert tables[name].count() > 0
    ledger = [json.loads(x) for x in open(os.path.join(ws, LEDGER))]
    stages = [r["stage"] for r in ledger]
    assert stages == ["documents", "chunks", "mentions", "entities", "triples"]
    for r in ledger:
        assert r["status"] == "ok"
        assert r["rows"] > 0
        assert r["partition_histogram"]["partitions"] >= 1
        assert "wall_seconds" in r


def test_resume_skips_unchanged(spark, tmp_path):
    ws = str(tmp_path / "ws")
    corpus = generate_corpus(n_docs=6, include_edge_cases=False)
    src = _src(spark, corpus)
    run_checkpointed(src, ws)
    n_ledger_before = len(open(os.path.join(ws, LEDGER)).readlines())
    # identical input → every stage skipped → ledger unchanged
    t2 = run_checkpointed(src, ws)
    n_ledger_after = len(open(os.path.join(ws, LEDGER)).readlines())
    assert n_ledger_after == n_ledger_before
    assert t2["triples"].count() > 0


def test_changed_input_triggers_recompute(spark, tmp_path):
    ws = str(tmp_path / "ws")
    corpus = generate_corpus(n_docs=6, include_edge_cases=False)
    run_checkpointed(_src(spark, corpus), ws)
    before = CheckpointManager(ws).latest("triples")["output_fingerprint"]
    corpus2 = list(corpus) + generate_corpus(n_docs=9, include_edge_cases=False)[6:]
    run_checkpointed(_src(spark, corpus2), ws)
    after = CheckpointManager(ws).latest("triples")["output_fingerprint"]
    assert before != after


def test_changed_documents_detection(spark, tmp_path):
    ws = str(tmp_path / "ws")
    corpus = generate_corpus(n_docs=6, include_edge_cases=False)
    run_checkpointed(_src(spark, corpus), ws)
    # same corpus → nothing changed
    assert changed_documents(_src(spark, corpus), ws).count() == 0
    # mutate one document's content → exactly that doc detected
    corpus2 = [dict(r) for r in corpus]
    corpus2[0]["content"] = corpus2[0]["content"] + " Extra sentence."
    changed = changed_documents(_src(spark, corpus2), ws).collect()
    assert len(changed) == 1
    assert changed[0]["path"] == corpus2[0]["path"]


def test_fingerprint_order_independent(spark):
    corpus = generate_corpus(n_docs=6, include_edge_cases=False)
    df = _src(spark, corpus)
    fp1 = fingerprint(df, ["repo", "path"])
    fp2 = fingerprint(df.repartition(13).sortWithinPartitions("lang"), ["repo", "path"])
    assert fp1 == fp2


# --- Iceberg routing seam (no Iceberg runtime in this sandbox: the test
# pins WHICH writer/reader surface each table_format selects, with
# duck-typed frames standing in for DataFrames) ---


class _Recorder:
    def __init__(self, log, name):
        self._log, self._name = log, name

    def __call__(self, *a, **k):
        self._log.append((self._name, a))
        return self

    def __getattr__(self, attr):
        return _Recorder(self._log, f"{self._name}.{attr}")


class _FakeFrame:
    def __init__(self, log):
        self.log = log

    @property
    def write(self):
        return _Recorder(self.log, "write")

    def writeTo(self, ident):
        self.log.append(("writeTo", (ident,)))
        return _Recorder(self.log, "writeTo")


def test_iceberg_flag_routes_writes_and_reads(tmp_path):
    mgr = CheckpointManager(
        str(tmp_path / "ws"), table_format="iceberg", catalog_ns="cat.graphrag"
    )
    log = []
    mgr._write_table(_FakeFrame(log), "triples", ["doc_bucket"], "overwrite")
    names = [n for n, _ in log]
    assert names[0] == "writeTo" and log[0][1] == ("cat.graphrag.triples",)
    assert "writeTo.using" in names          # .using("iceberg")
    assert "writeTo.using.partitionedBy" in names
    assert names[-1].endswith(".createOrReplace")

    log2 = []
    mgr._write_table(_FakeFrame(log2), "entities", None, "append")
    assert [n for n, _ in log2][-1].endswith(".append")

    reads = []
    class _FakeReader:
        def table(self, ident):
            reads.append(ident)
    class _FakeSpark:
        read = _FakeReader()
    mgr._read_table(_FakeSpark(), "triples")
    assert reads == ["cat.graphrag.triples"]

    # iceberg existence is witnessed by the ledger (written post-commit)
    mgr._append_ledger(
        {"stage": "triples", "status": "ok", "input_fingerprint": {"rows": 1}}
    )
    assert mgr.is_current("triples", {"rows": 1})


def test_parquet_default_routes_to_workspace_paths(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ws"))
    log = []
    mgr._write_table(_FakeFrame(log), "triples", ["doc_bucket"], "overwrite")
    names = [n for n, _ in log]
    assert names[0].startswith("write.")
    assert any(n.endswith(".parquet") for n in names)
    assert not any(n.startswith("writeTo") for n in names)


def test_iceberg_flag_validation(tmp_path):
    import pytest

    with pytest.raises(ValueError):
        CheckpointManager(str(tmp_path), table_format="iceberg")
    with pytest.raises(ValueError):
        CheckpointManager(str(tmp_path), table_format="delta")
