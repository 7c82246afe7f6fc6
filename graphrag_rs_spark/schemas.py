"""Explicit StructType schemas for every pipeline table.

The reference defines fixed Arrow schemas per persisted table
(persistence/parquet.rs:219-230 entities, :425-435 relationships, :627-651
chunks, :970-985 documents); we mirror them as code-defined StructTypes —
no inference anywhere (SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# north-rule input table (BASELINE.json input_hint)
SOURCE_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), True),
        StructField("content", StringType(), True),
    ]
)

# documents: source + derived identity/invariant columns
DOCUMENTS_SCHEMA = StructType(
    SOURCE_SCHEMA.fields
    + [
        StructField("doc_id", StringType(), False),
        StructField("content_sha256", StringType(), True),
    ]
)

CHUNKS_SCHEMA = StructType(
    [
        StructField("chunk_id", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("content", StringType(), False),
        StructField("start_offset", LongType(), False),
        StructField("end_offset", LongType(), False),
    ]
)

# one row per (chunk, entity) after per-chunk dedupe — the atom of the
# distributed model (SURVEY §1.1)
MENTIONS_SCHEMA = StructType(
    [
        StructField("chunk_id", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("entity_id", StringType(), False),
        StructField("name", StringType(), False),
        StructField("entity_type", StringType(), False),
        StructField("confidence", FloatType(), False),
        StructField("n_mentions", LongType(), False),
        StructField(
            "mention_offsets",
            ArrayType(
                StructType(
                    [
                        StructField("start_offset", LongType(), False),
                        StructField("end_offset", LongType(), False),
                    ]
                )
            ),
            True,
        ),
    ]
)

# fused extraction output: mentions + per-chunk relation-keyword flags
# packed into ONE bitmask column (constant within a chunk → it can ride the
# per-chunk groupBy KEY with zero aggregation overhead; 13 separate bool
# columns measured heavy through the shuffle + first() aggs)
MENTIONS_FLAGGED_SCHEMA = StructType(
    [
        StructField("chunk_id", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("entity_id", StringType(), False),
        StructField("name", StringType(), False),
        StructField("entity_type", StringType(), False),
        StructField("confidence", FloatType(), False),
        StructField("n_mentions", LongType(), False),
        StructField("kw_bits", LongType(), False),
    ]
)

ENTITIES_SCHEMA = StructType(
    [
        StructField("entity_id", StringType(), False),
        StructField("name", StringType(), False),
        StructField("entity_type", StringType(), False),
        StructField("confidence", FloatType(), False),
        StructField("mention_count", LongType(), False),
        # G10 temporal bounds (core/mod.rs:237-240) — chunk-order
        # surrogate timestamps, nullable
        StructField("first_mentioned", LongType(), True),
        StructField("last_mentioned", LongType(), True),
    ]
)

TRIPLES_SCHEMA = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("confidence", FloatType(), False),
        StructField("context_chunk_ids", ArrayType(StringType()), True),
    ]
)

ENTITY_CLUSTERS_SCHEMA = StructType(
    [
        StructField("entity_id", StringType(), False),
        StructField("canonical_id", StringType(), False),
        StructField("cluster_id", StringType(), False),
        # L10: most-frequent-then-longest member name
        # (corpus/entity_linker.rs:524-536)
        StructField("canonical_name", StringType(), True),
    ]
)

COMMUNITIES_SCHEMA = StructType(
    [
        StructField("level", LongType(), False),
        StructField("entity_id", StringType(), False),
        StructField("community_id", LongType(), False),
    ]
)
