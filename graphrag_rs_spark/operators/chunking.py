"""C1: distributed chunking — Arrow-batched ``mapInPandas``.

Chunking is a pure per-document function (kernel/chunking.py implements the
reference semantics of text/mod.rs:141-186), so it is embarrassingly
parallel: each executor task chunks its partition of documents with zero
shuffle. ``mapInPandas`` (not a row UDF) keeps transfer Arrow-batched; the
session caps ``arrow.maxRecordsPerBatch`` because code files can be MBs.

Also exposes the native-function text utilities C7-C9
(clean_text / extract_sentences / word_count — text/mod.rs:349-390) as
column expressions: no Python at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.config import DEFAULT_CONFIG, PipelineConfig
from graphrag_rs_spark.kernel.chunking import chunk_text
from graphrag_rs_spark.schemas import CHUNKS_SCHEMA


def chunk_documents(
    documents: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
    *,
    strategy: str = "legacy",
) -> DataFrame:
    """documents(doc_id, content, ...) → chunks(chunk_id, doc_id, content, offsets).

    Narrow transformation: no shuffle; the chunk explosion happens inside
    the Arrow batch. chunk_id = ``{doc_id}_{idx}`` (text/mod.rs:161).

    ``strategy``: "legacy" (C1 — the reference pipeline default),
    "hierarchical" (C2/C3 recursive-separator cascade), "semantic"
    (C5 embedding-similarity breakpoints, text/semantic_chunking.rs —
    start/end offsets hold SENTENCE indices, the reference's
    SemanticChunk convention, not char offsets), or "boundary"
    (C6/BAR-RAG boundary-aware coherence optimization,
    chunking_strategies.rs:266-594 — see kernel/boundary.py). For late
    chunking (context-preserving spans, late_chunking.rs) use
    ``late_chunk_documents`` — it carries extra span/position columns.
    """
    chunk_size, overlap = config.chunk_size, config.chunk_overlap
    if strategy == "boundary":
        from graphrag_rs_spark.kernel.boundary import boundary_aware_chunk_text

        def chunker(content):
            return boundary_aware_chunk_text(
                content,
                max_chunk_chars=config.boundary_max_chunk_chars,
                min_chunk_chars=config.boundary_min_chunk_chars,
                hash_fn=config.semantic_hash_fn,
            )
    elif strategy == "hierarchical":
        from graphrag_rs_spark.kernel.hierarchical import chunk_text_hierarchical

        min_size = config.min_chunk_size

        def chunker(content):
            return chunk_text_hierarchical(content, chunk_size, overlap, min_size)
    elif strategy == "legacy":
        def chunker(content):
            return chunk_text(content, chunk_size, overlap)
    elif strategy == "semantic":
        from graphrag_rs_spark.kernel.semantic import semantic_chunk_text

        def chunker(content):
            return semantic_chunk_text(
                content,
                strategy=config.semantic_breakpoint_strategy,
                threshold_amount=config.semantic_threshold_amount,
                min_chunk_size=config.semantic_min_sentences,
                max_chunk_size=config.semantic_max_sentences,
                hash_fn=config.semantic_hash_fn,
            )
    else:
        raise ValueError(f"unknown chunking strategy: {strategy}")

    def chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, docs, contents, starts, ends = [], [], [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                if content is None:
                    continue
                for idx, text, start, end in chunker(content):
                    ids.append(f"{doc_id}_{idx}")
                    docs.append(doc_id)
                    contents.append(text)
                    starts.append(start)
                    ends.append(end)
            yield pd.DataFrame(
                {
                    "chunk_id": pd.Series(ids, dtype="string"),
                    "doc_id": pd.Series(docs, dtype="string"),
                    "content": pd.Series(contents, dtype="string"),
                    "start_offset": pd.Series(starts, dtype="int64"),
                    "end_offset": pd.Series(ends, dtype="int64"),
                }
            )

    return documents.select("doc_id", "content").mapInPandas(
        chunk_batches, schema=CHUNKS_SCHEMA
    )


LATE_CHUNKS_SCHEMA = (
    "chunk_id string, doc_id string, section_id long, content string, "
    "start_offset long, end_offset long, position_in_document double"
)


def late_chunk_documents(
    documents: DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """LateChunkingStrategy (text/late_chunking.rs:99-214): hierarchical
    splitter (min size 50) recording precise spans + relative positions so
    a late-chunking-aware embedding provider can pool per-chunk
    representations from ONE full-context forward pass. Documents beyond
    the model window (1 token ≈ 4 chars) are pre-split into paragraph-
    grouped sections that each fit (split_into_sections :147-172);
    spans/positions are section-relative — each section is one attention
    context. chunk_id = ``{doc_id}_lc_{seq}`` (:188, per-doc sequential
    in place of the reference's process-global counter — deterministic
    under any partitioning). The embedding forward pass itself is the
    surveyed out-of-scope provider slot (S7); the Spark deliverable is
    the span/section plumbing, same pattern as multimodal decode.

    Narrow transformation: no shuffle, Arrow-batched like C1."""
    chunk_size = config.late_chunk_size
    overlap = config.late_chunk_overlap
    max_doc_tokens = config.late_max_doc_tokens

    from graphrag_rs_spark.kernel.late import late_chunk_text

    def chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, docs, secs, contents, starts, ends, positions = (
                [], [], [], [], [], [], []
            )
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                if content is None:
                    continue
                for seq, sec, text, start, end, pos in late_chunk_text(
                    content, chunk_size, overlap, max_doc_tokens
                ):
                    ids.append(f"{doc_id}_lc_{seq}")
                    docs.append(doc_id)
                    secs.append(sec)
                    contents.append(text)
                    starts.append(start)
                    ends.append(end)
                    positions.append(pos)
            yield pd.DataFrame(
                {
                    "chunk_id": pd.Series(ids, dtype="string"),
                    "doc_id": pd.Series(docs, dtype="string"),
                    "section_id": pd.Series(secs, dtype="int64"),
                    "content": pd.Series(contents, dtype="string"),
                    "start_offset": pd.Series(starts, dtype="int64"),
                    "end_offset": pd.Series(ends, dtype="int64"),
                    "position_in_document": pd.Series(positions, dtype="float64"),
                }
            )

    return documents.select("doc_id", "content").mapInPandas(
        chunk_batches, schema=LATE_CHUNKS_SCHEMA
    )


# --- C7-C9: pure column expressions (no UDF) ---

def clean_text_col(col):
    """Whitespace-normalize (text/mod.rs:349-358)."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def sentences_col(col):
    """Split on .!? and drop empties (text/mod.rs:361-385)."""
    return F.filter(
        F.transform(F.split(col, r"[.!?]"), lambda s: F.trim(s)),
        lambda s: s != F.lit(""),
    )


def word_count_col(col):
    """Whitespace word count (text/mod.rs:388-390)."""
    return F.size(F.split(F.trim(col), r"\s+")) - F.when(F.trim(col) == "", 1).otherwise(0)
