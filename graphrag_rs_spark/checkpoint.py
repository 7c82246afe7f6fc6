"""Per-stage checkpointing, lineage + metrics — resumable runs.

The reference persists its whole graph to a parquet workspace after build
(lifecycle.rs:138-172) and resumes by loading it (lifecycle.rs:64-134); its
incremental module detects changed docs by content hash
(incremental/mod.rs:87-91). The distributed analog:

- every stage is materialized to the workspace as parquet, bucketed by
  ``doc_bucket = pmod(xxhash64(doc_id), n_buckets)`` where applicable, so
  incremental runs rewrite only the buckets containing changed documents
  (the plain-parquet stand-in for Iceberg ``MERGE INTO``; swap the
  write/read pair for ``writeTo(...).overwritePartitions()`` on a real
  catalog);
- a ``_checkpoints`` JSONL ledger records per-stage lineage: input
  fingerprint, output fingerprint, row count, per-partition row counts
  (skew evidence), wall time, status — written atomically (tmp + rename)
  AFTER the stage's data lands, so a crash mid-write is re-run, never
  trusted;
- resume = skip stages whose recorded input fingerprint matches the
  current input (order-independent fingerprint: row count + sum of row
  hashes, computed distributed with map-side combine — no sort, no
  collect).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphrag_rs_spark.config import DEFAULT_CONFIG, PipelineConfig

LEDGER = "_checkpoints.jsonl"


def fingerprint(df: DataFrame, cols: list[str]) -> dict:
    """Order-independent content fingerprint: (rows, SUM of xxhash64(cols)).

    One distributed agg — addition is commutative/associative so
    partitioning/order can't change it, and unlike XOR it is sensitive to
    row multiplicity (XOR self-cancels duplicate pairs: swapping two
    identical copies of row A for two copies of row B left the round-1
    hashsum unchanged). Summed as decimal(38,0) so ANSI mode can't
    overflow (2⁶³·n_rows fits until ~10¹⁹ rows).
    """
    row = df.select(
        F.count(F.lit(1)).alias("rows"),
        F.expr(
            f"sum(cast(xxhash64({', '.join(cols)}) as decimal(38,0)))"
        ).alias("hashsum"),
    ).collect()[0]
    return {"rows": row["rows"], "hashsum": str(row["hashsum"] or 0)}


def config_fingerprint(config: PipelineConfig) -> str:
    """Deterministic hash of every config field (except the free-form
    ``extra`` escape hatch): folded into stage input fingerprints so a
    re-run on the same workspace with a CHANGED config (chunk_size,
    thresholds, ...) rebuilds instead of silently reusing checkpoints
    built under the old config."""
    import dataclasses
    import hashlib

    fields = {
        f.name: getattr(config, f.name)
        for f in dataclasses.fields(config)
        if f.name != "extra"
    }
    blob = json.dumps(fields, sort_keys=True, default=repr)
    return hashlib.sha256(blob.encode("utf-8")).hexdigest()[:16]


def partition_histogram(df: DataFrame) -> dict:
    """Per-partition row counts — the skew evidence recorded in lineage."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .orderBy("pid")
        .collect()
    )
    counts = [r["count"] for r in rows]
    if not counts:
        return {"partitions": 0, "max": 0, "median": 0}
    counts_sorted = sorted(counts)
    return {
        "partitions": len(counts),
        "max": max(counts),
        "median": counts_sorted[len(counts_sorted) // 2],
    }


@dataclass
class CheckpointManager:
    """``table_format="parquet"`` (default) writes workspace-relative
    parquet directories. ``table_format="iceberg"`` routes every stage
    table through the Iceberg DataFrameWriterV2 seam instead
    (``df.writeTo(f"{catalog_ns}.{stage}").using("iceberg")``) — the
    100 TB deployment shape, where the ledger's roles map onto Iceberg's
    own metadata:

    - ledger "status: ok after data lands"  → snapshot commit atomicity
      (a crashed write never becomes a snapshot);
    - ledger input/output fingerprints      → snapshot summary properties
      (still recorded in the ledger here — resume logic is identical);
    - bucketed-directory swap (_swap_buckets) → ``overwritePartitions()``
      on the bucket-partitioned table;
    - ``load`` re-read                      → catalog read with Iceberg
      stats/pushdown instead of parquet-directory stats.

    This sandbox has no Iceberg runtime jar, so the routing (not the
    Iceberg commit protocol) is what unit tests pin; on a cluster with a
    configured catalog the same manager runs unchanged.
    """

    workspace: str
    table_format: str = "parquet"
    catalog_ns: str = ""  # e.g. "spark_catalog.graphrag" (iceberg only)

    def __post_init__(self) -> None:
        if self.table_format not in ("parquet", "iceberg"):
            raise ValueError(f"unknown table_format: {self.table_format!r}")
        if self.table_format == "iceberg" and not self.catalog_ns:
            raise ValueError("table_format='iceberg' requires catalog_ns")

    def table_identifier(self, stage: str) -> str:
        return f"{self.catalog_ns}.{stage}"

    def _write_table(self, df, stage: str, partition_by, mode: str) -> None:
        """Format-routing seam (kept tiny so it is unit-testable with a
        duck-typed frame; see tests/test_checkpoint.py)."""
        if self.table_format == "iceberg":
            writer = df.writeTo(self.table_identifier(stage)).using("iceberg")
            if partition_by:
                writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
            if mode == "append":
                writer.append()
            else:
                writer.createOrReplace()
            return
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.table_path(stage))

    def _read_table(self, spark, stage: str):
        if self.table_format == "iceberg":
            return spark.read.table(self.table_identifier(stage))
        return spark.read.parquet(self.table_path(stage))

    def _ledger_path(self) -> str:
        return os.path.join(self.workspace, LEDGER)

    def _read_ledger(self) -> list[dict]:
        path = self._ledger_path()
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def _append_ledger(self, record: dict) -> None:
        os.makedirs(self.workspace, exist_ok=True)
        path = self._ledger_path()
        tmp = path + ".tmp"
        records = self._read_ledger() + [record]
        with open(tmp, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
        os.replace(tmp, path)

    def latest(self, stage: str) -> dict | None:
        recs = [r for r in self._read_ledger() if r["stage"] == stage and r["status"] == "ok"]
        return recs[-1] if recs else None

    def table_path(self, name: str) -> str:
        return os.path.join(self.workspace, name)

    def is_current(self, stage: str, input_fp: dict) -> bool:
        rec = self.latest(stage)
        # parquet: double-check the directory still exists; iceberg: the
        # ledger entry is only written after the snapshot commit, so the
        # ledger itself is the existence witness (catalog lookups need a
        # SparkSession this method deliberately doesn't take)
        exists = (
            self.table_format == "iceberg"
            or os.path.exists(self.table_path(stage))
        )
        return rec is not None and rec["input_fingerprint"] == input_fp and exists

    def load(self, spark: SparkSession, stage: str) -> DataFrame:
        return self._read_table(spark, stage)

    def materialize(
        self,
        stage: str,
        df: DataFrame,
        *,
        input_fp: dict,
        fingerprint_cols: list[str] | None = None,
        partition_by: list[str] | None = None,
        mode: str = "overwrite",
    ) -> DataFrame:
        """Write a stage's output + ledger entry; return the re-read DataFrame
        (reading back cuts lineage and gives downstream stages parquet
        stats/pushdown)."""
        spark = df.sparkSession
        t0 = time.time()
        self._write_table(df, stage, partition_by, mode)
        out = self._read_table(spark, stage)
        out_fp = (
            fingerprint(out, fingerprint_cols)
            if fingerprint_cols
            else {"rows": out.count(), "hashsum": None}
        )
        self._append_ledger(
            {
                "stage": stage,
                "status": "ok",
                "input_fingerprint": input_fp,
                "output_fingerprint": out_fp,
                "rows": out_fp["rows"],
                "partition_histogram": partition_histogram(out),
                "wall_seconds": round(time.time() - t0, 3),
                "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
        )
        return out


def run_checkpointed(
    source: DataFrame,
    workspace: str,
    config: PipelineConfig = DEFAULT_CONFIG,
    *,
    link: bool = False,
    communities: bool = False,
) -> dict[str, DataFrame]:
    """The resumable pipeline: each stage skipped when its recorded input
    fingerprint matches — re-running after a crash (or on identical input)
    reuses everything already materialized."""
    from graphrag_rs_spark.operators.chunking import chunk_documents
    from graphrag_rs_spark.operators.extraction import extract_mentions, rollup_entities
    from graphrag_rs_spark.operators.ingest import ingest_documents
    from graphrag_rs_spark.operators.relationships import extract_triples

    spark = source.sparkSession
    mgr = CheckpointManager(workspace)
    tables: dict[str, DataFrame] = {}

    src_fp = fingerprint(
        ingest_documents(source).select("doc_id", "content_sha256"),
        ["doc_id", "content_sha256"],
    )
    # a config change must invalidate checkpoints built under the old one
    src_fp["config"] = config_fingerprint(config)

    def stage(name, build, parents_fp, fp_cols, partition_by=None):
        if mgr.is_current(name, parents_fp):
            tables[name] = mgr.load(spark, name)
        else:
            tables[name] = mgr.materialize(
                name, build(), input_fp=parents_fp,
                fingerprint_cols=fp_cols, partition_by=partition_by,
            )
        return tables[name]

    documents = stage(
        "documents",
        lambda: ingest_documents(source).withColumn(
            "doc_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(config.salt_buckets * 4))
        ),
        src_fp,
        ["doc_id", "content_sha256"],
        partition_by=["doc_bucket"],
    )
    chunks = stage(
        "chunks", lambda: chunk_documents(documents, config), src_fp, ["chunk_id"]
    )
    mentions = stage(
        "mentions",
        lambda: extract_mentions(chunks, config),
        src_fp,
        ["chunk_id", "entity_id"],
    )
    stage(
        "entities", lambda: rollup_entities(mentions), src_fp, ["entity_id"]
    )
    triples = stage(
        "triples",
        lambda: extract_triples(mentions, chunks, config),
        src_fp,
        ["subj", "pred", "obj"],
    )

    if link or communities:
        from graphrag_rs_spark.operators.linking import link_entities, rewrite_triples

        clusters = stage(
            "clusters", lambda: link_entities(tables["entities"], config), src_fp,
            ["entity_id", "canonical_id"],
        )
        stage(
            "canonical_triples",
            lambda: rewrite_triples(triples, clusters),
            src_fp,
            ["subj", "pred", "obj"],
        )
    if communities:
        from graphrag_rs_spark.operators.communities import (
            detect_communities,
            summarize_communities,
        )

        comm = stage(
            "communities",
            lambda: detect_communities(tables["canonical_triples"], config),
            src_fp,
            ["entity_id", "community_id"],
        )
        stage(
            "community_summaries",
            lambda: summarize_communities(comm, tables["entities"], tables["clusters"]),
            src_fp,
            ["community_id"],
        )

    return tables


def _swap_buckets(
    merged: DataFrame, path: str, buckets: list, mgr: "CheckpointManager", table: str
) -> None:
    """Crash-safe bucket rewrite: stage the merged affected-bucket rows in
    a sibling tmp dir, then swap each bucket directory into place.

    The old scheme (clear buckets, then write) had a window where a crash
    between the rmtree and the write silently lost the KEPT rows of
    unchanged docs in those buckets — unrecoverable in delta mode, where
    the lost docs are absent from the partial new_source. Here the
    workspace stays intact until the tmp write has fully landed; a
    'started' ledger marker (appended only after the tmp write completes)
    carries the bucket list so ``_recover_incomplete_swaps`` can finish an
    interrupted swap idempotently on the next run. On a real catalog this
    whole dance is Iceberg's atomic ``overwritePartitions``."""
    import shutil

    tmp = path + ".incr_tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    merged.write.mode("overwrite").partitionBy("doc_bucket").parquet(tmp)
    staged = [
        int(b)
        for b in buckets
        if os.path.exists(os.path.join(tmp, f"doc_bucket={b}"))
    ]
    emptied = [int(b) for b in buckets if int(b) not in set(staged)]
    mgr._append_ledger(
        {
            "stage": f"swap:{table}",
            "status": "started",
            "tmp": tmp,
            "staged": staged,
            "emptied": emptied,
        }
    )
    _apply_swap(tmp, path, staged, emptied)
    mgr._append_ledger({"stage": f"swap:{table}", "status": "ok"})


def _apply_swap(tmp: str, path: str, staged: list, emptied: list) -> None:
    """Move staged bucket dirs into place. Idempotent on re-application
    after a crash: a staged bucket already swapped has no tmp subdir and
    is SKIPPED (its target holds the new data); an ``emptied`` bucket (all
    its docs deleted — no staged rows) has its target removed, which is a
    no-op the second time."""
    import shutil

    os.makedirs(path, exist_ok=True)
    for b in staged:
        src = os.path.join(tmp, f"doc_bucket={b}")
        dst = os.path.join(path, f"doc_bucket={b}")
        if os.path.exists(src):
            if os.path.exists(dst):
                shutil.rmtree(dst)
            os.replace(src, dst)
    for b in emptied:
        dst = os.path.join(path, f"doc_bucket={b}")
        if os.path.exists(dst):
            shutil.rmtree(dst)
    shutil.rmtree(tmp, ignore_errors=True)


def _recover_incomplete_swaps(mgr: "CheckpointManager") -> int:
    """Finish bucket swaps whose 'started' marker has no matching 'ok'
    (crash between staging and swap completion). Returns swaps recovered.
    Safe because the marker is only written AFTER the staged tmp data has
    fully landed — if the tmp dir is gone the swap already completed and
    only the ok record was lost, which is also fine to re-append."""
    recs = mgr._read_ledger()
    open_swaps: dict[str, dict] = {}
    for r in recs:
        stage = r.get("stage", "")
        if not stage.startswith("swap:"):
            continue
        if r.get("status") == "started":
            open_swaps[stage] = r
        elif r.get("status") == "ok":
            open_swaps.pop(stage, None)
    n = 0
    for stage, r in open_swaps.items():
        tmp = r["tmp"]
        path = tmp[: -len(".incr_tmp")]
        if os.path.exists(tmp):
            _apply_swap(tmp, path, r.get("staged", []), r.get("emptied", []))
        mgr._append_ledger({"stage": stage, "status": "ok", "recovered": True})
        n += 1
    return n


def run_incremental(
    new_source: DataFrame,
    workspace: str,
    config: PipelineConfig = DEFAULT_CONFIG,
    *,
    full_snapshot: bool = True,
) -> dict:
    """Incremental update (reference G8 analog, incremental/mod.rs):

    1. detect changed/new docs by (doc_id, content_sha256) anti-join
       against the checkpointed documents table; with ``full_snapshot``
       (default) also detect DELETED docs (checkpointed doc_ids absent
       from ``new_source``) and remove their rows — pass False when
       ``new_source`` is a partial delta rather than the whole corpus;
    2. re-run chunk+extract ONLY for changed docs;
    3. rewrite ONLY the doc_buckets containing changed/deleted docs in the
       per-document tables — merged rows are STAGED to a tmp dir and the
       bucket directories swapped in afterwards (crash-safe: old buckets
       survive until the staged write lands; a 'started' ledger marker
       lets the next run finish an interrupted swap — the plain-parquet
       stand-in for Iceberg's atomic ``overwritePartitions``);
    4. recompute the global aggregates (entities, triples) from the merged
       mentions table — one scan of already-extracted mentions, zero
       re-extraction of unchanged docs.

    Returns {"changed_docs": n, "deleted_docs": d, "buckets_rewritten": k}.
    """
    from graphrag_rs_spark.operators.extraction import extract_mentions_fused
    from graphrag_rs_spark.operators.ingest import ingest_documents
    from graphrag_rs_spark.operators.relationships import extract_triples_fused

    spark = new_source.sparkSession
    mgr = CheckpointManager(workspace)
    _recover_incomplete_swaps(mgr)  # finish any crash-interrupted rewrite
    n_buckets = config.salt_buckets * 4

    changed = changed_documents(new_source, workspace)
    changed = changed.withColumn(
        "doc_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets))
    ).localCheckpoint(eager=True)
    n_changed = changed.count()

    docs_path = mgr.table_path("documents")
    deleted = None
    n_deleted = 0
    if full_snapshot and os.path.exists(docs_path):
        deleted = (
            spark.read.parquet(docs_path)
            .select("doc_id", "doc_bucket")
            .join(
                ingest_documents(new_source).select("doc_id"), "doc_id", "left_anti"
            )
            .localCheckpoint(eager=True)
        )
        n_deleted = deleted.count()

    if n_changed == 0 and n_deleted == 0:
        return {"changed_docs": 0, "deleted_docs": 0, "buckets_rewritten": 0}

    bucket_rows = changed.select("doc_bucket").distinct().collect()
    if deleted is not None and n_deleted:
        bucket_rows += deleted.select("doc_bucket").distinct().collect()
    buckets = sorted({r["doc_bucket"] for r in bucket_rows})
    gone_ids = (
        changed.select("doc_id")
        if deleted is None
        else changed.select("doc_id").union(deleted.select("doc_id"))
    )

    # ORDERING = the transaction protocol: the documents table is what
    # changed-doc detection compares against, so it is swapped LAST (the
    # commit point). A crash anywhere earlier leaves the old documents
    # table in place → the next run re-flags the same docs and redoes the
    # (idempotent) mention swap and aggregate overwrites; a crash during
    # the final documents swap is finished by _recover_incomplete_swaps,
    # after which every other table is already consistent with it.
    old_docs = spark.read.parquet(docs_path) if os.path.exists(docs_path) else None

    # 1. mentions for changed docs only (fused single-pass extraction)
    mflag_path = mgr.table_path("mentions_flagged")
    if os.path.exists(mflag_path):
        new_flagged = extract_mentions_fused(changed, config).withColumn(
            "doc_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets))
        )
        old_m = spark.read.parquet(mflag_path)
        keep_m = old_m.where(F.col("doc_bucket").isin(buckets)).join(
            gone_ids, "doc_id", "left_anti"
        )
        _swap_buckets(
            keep_m.unionByName(new_flagged), mflag_path, buckets, mgr, "mentions_flagged"
        )
    else:
        # bootstrap (first incremental run, or workspace built by the plain
        # checkpointed path): extract flagged mentions for the full MERGED
        # corpus — surviving old docs plus changed docs (the documents
        # table on disk is still the pre-update one at this point)
        full_docs = (
            changed
            if old_docs is None
            else old_docs.join(gone_ids, "doc_id", "left_anti").unionByName(
                changed.select(*old_docs.columns)
            )
        )
        extract_mentions_fused(full_docs, config).withColumn(
            "doc_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets))
        ).write.mode("overwrite").partitionBy("doc_bucket").parquet(mflag_path)

    # 2. global aggregates from merged mentions (no re-extraction;
    # idempotent full overwrites)
    all_m = spark.read.parquet(mflag_path)
    from graphrag_rs_spark.operators.extraction import rollup_entities

    rollup_entities(all_m.drop("kw_bits", "doc_bucket")).write.mode("overwrite").parquet(
        mgr.table_path("entities")
    )
    extract_triples_fused(all_m, config).write.mode("overwrite").parquet(
        mgr.table_path("triples")
    )

    # 3. documents — the COMMIT: merged view of affected buckets = old
    # rows for surviving unchanged docs + changed rows, staged to a tmp
    # dir and swapped in
    if old_docs is not None:
        keep = old_docs.where(F.col("doc_bucket").isin(buckets)).join(
            gone_ids, "doc_id", "left_anti"
        )
        merged_docs = keep.unionByName(changed.select(*old_docs.columns))
        _swap_buckets(merged_docs, docs_path, buckets, mgr, "documents")
    else:
        # bootstrap: empty workspace, all docs are new
        changed.write.mode("overwrite").partitionBy("doc_bucket").parquet(docs_path)

    mgr._append_ledger(
        {
            "stage": "incremental",
            "status": "ok",
            "input_fingerprint": fingerprint(
                changed.select("doc_id", "content_sha256"), ["doc_id", "content_sha256"]
            ),
            "output_fingerprint": None,
            "rows": n_changed,
            "partition_histogram": {"buckets_rewritten": len(buckets)},
            "wall_seconds": None,
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
    )
    return {
        "changed_docs": n_changed,
        "deleted_docs": n_deleted,
        "buckets_rewritten": len(buckets),
    }


def changed_documents(new_source: DataFrame, workspace: str) -> DataFrame:
    """Incremental change detection (incremental/mod.rs:87-91 analog):
    rows of ``new_source`` whose (doc_id, content_sha256) is not already
    checkpointed — an anti-join on the invariant column."""
    from graphrag_rs_spark.operators.ingest import ingest_documents

    spark = new_source.sparkSession
    mgr = CheckpointManager(workspace)
    fresh = ingest_documents(new_source)
    prev_path = mgr.table_path("documents")
    if not os.path.exists(prev_path):
        return fresh
    prev = spark.read.parquet(prev_path).select("doc_id", "content_sha256")
    return fresh.join(prev, ["doc_id", "content_sha256"], "left_anti")
