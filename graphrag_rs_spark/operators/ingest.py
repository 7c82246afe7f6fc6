"""S1: source ingest — identity + invariant columns.

Reference: document ingest wraps text in a uuid'd Document
(graphrag/documents.rs:18-40). We derive ids deterministically from
(repo, path, commit) so re-runs and multi-executor runs agree (SURVEY §7),
and stamp the north-rule per-row invariant ``content_sha256 = sha2(content)``
— also the change-detection key for incremental runs (incremental/mod.rs:87-91
analog via snapshot anti-join).

Everything is native column expressions: the scan keeps pushdown/pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ingest_documents(source: DataFrame) -> DataFrame:
    """source(repo, path, commit, lang, content) → documents(+doc_id, +content_sha256)."""
    return source.withColumn(
        "doc_id",
        F.concat(F.col("repo"), F.lit("/"), F.col("path"), F.lit("@"), F.col("commit")),
    ).withColumn("content_sha256", F.sha2(F.coalesce(F.col("content"), F.lit("")), 256))


def verify_sha_invariant(documents: DataFrame, source: DataFrame) -> int:
    """Count rows whose stored sha doesn't match a fresh sha of the source
    content (must be 0). Join on identity key; broadcast-free equi-join."""
    fresh = source.select(
        F.concat(F.col("repo"), F.lit("/"), F.col("path"), F.lit("@"), F.col("commit")).alias("doc_id"),
        F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias("fresh_sha"),
    )
    return (
        documents.join(fresh, "doc_id", "left")
        .where(
            (F.col("fresh_sha").isNull())
            | (F.col("content_sha256") != F.col("fresh_sha"))
        )
        .count()
    )
