"""E1-E13: distributed entity extraction — Arrow-batched ``mapInPandas``.

Mention detection is a pure per-chunk text function (gazetteers + pattern
heuristics; kernel/extraction.py carries the reference semantics of
entity/mod.rs:114-1089). The gazetteers are small static tuples shipped in
the task closure — the moral equivalent of a broadcast join against a
gazetteer dim table (for user-supplied gazetteers, ``gazetteer_mentions``
below does a real broadcast join, JVM-side).

The per-chunk dedupe (E10) and confidence threshold happen inside the
kernel; the *corpus-level* rollup (E14 analog) is a distributed groupBy with
map-side partial aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.config import DEFAULT_CONFIG, PipelineConfig
from graphrag_rs_spark.kernel.extraction import extract_entities_from_chunk
from graphrag_rs_spark.schemas import MENTIONS_SCHEMA


def extract_mentions(
    chunks: DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """chunks → mentions: one row per (chunk, entity) after per-chunk dedupe.

    Narrow (no shuffle): extraction happens inside each Arrow batch.
    """
    min_conf = config.min_confidence
    etypes = config.entity_types
    allowed = config.allowed_patterns
    excluded = config.excluded_patterns

    def extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "chunk_id": [], "doc_id": [], "entity_id": [], "name": [],
                "entity_type": [], "confidence": [], "n_mentions": [],
                "mention_offsets": [],
            }
            for chunk_id, doc_id, content in zip(
                pdf["chunk_id"], pdf["doc_id"], pdf["content"]
            ):
                for e in extract_entities_from_chunk(
                    content or "",
                    min_confidence=min_conf,
                    entity_types=etypes,
                    allowed_patterns=allowed,
                    excluded_patterns=excluded,
                ):
                    rows["chunk_id"].append(chunk_id)
                    rows["doc_id"].append(doc_id)
                    rows["entity_id"].append(e["entity_id"])
                    rows["name"].append(e["name"])
                    rows["entity_type"].append(e["entity_type"])
                    rows["confidence"].append(e["confidence"])
                    rows["n_mentions"].append(len(e["mentions"]))
                    rows["mention_offsets"].append(
                        [{"start_offset": s, "end_offset": t} for s, t in e["mentions"]]
                    )
            # explicit dtypes: an empty batch would otherwise default to
            # float64 columns, which Arrow can't map onto list<struct>
            yield pd.DataFrame(
                {
                    "chunk_id": pd.Series(rows["chunk_id"], dtype="string"),
                    "doc_id": pd.Series(rows["doc_id"], dtype="string"),
                    "entity_id": pd.Series(rows["entity_id"], dtype="string"),
                    "name": pd.Series(rows["name"], dtype="string"),
                    "entity_type": pd.Series(rows["entity_type"], dtype="string"),
                    "confidence": pd.Series(rows["confidence"], dtype="float32"),
                    "n_mentions": pd.Series(rows["n_mentions"], dtype="int64"),
                    "mention_offsets": pd.Series(rows["mention_offsets"], dtype="object"),
                }
            )

    return chunks.select("chunk_id", "doc_id", "content").mapInPandas(
        extract_batches, schema=MENTIONS_SCHEMA
    )


def extract_mentions_fused(
    documents: DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """documents → mentions with per-chunk relation-keyword flags, in ONE
    Arrow pass: chunking, extraction and the 13 keyword ``contains`` checks
    run inside the same ``mapInPandas``, so document content crosses the
    Python boundary exactly once and never round-trips back to the JVM.

    This removes (vs the chunk→extract→join pipeline): a second chunking
    pass, the chunks Arrow round-trip (~the corpus size), and the
    flags shuffle join — the measured scaling ceiling was exactly this
    serialization mass, not compute. Downstream, extract_triples groups by
    chunk_id and reads the flags with ``first()`` (constant per chunk).
    """
    from graphrag_rs_spark.kernel.chunking import chunk_text
    from graphrag_rs_spark.operators.relationships import _KEYWORDS
    from graphrag_rs_spark.schemas import MENTIONS_FLAGGED_SCHEMA

    chunk_size, overlap = config.chunk_size, config.chunk_overlap
    min_conf = config.min_confidence
    etypes = config.entity_types
    allowed = config.allowed_patterns
    excluded = config.excluded_patterns
    kw_items = list(_KEYWORDS.items())

    keywords = [kw for _, kw in kw_items]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "chunk_id": [], "doc_id": [], "entity_id": [], "name": [],
                "entity_type": [], "confidence": [], "n_mentions": [],
                "kw_bits": [],
            }
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                if content is None:
                    continue
                for idx, text, _s, _e in chunk_text(content, chunk_size, overlap):
                    ents = extract_entities_from_chunk(
                        text,
                        min_confidence=min_conf,
                        entity_types=etypes,
                        allowed_patterns=allowed,
                        excluded_patterns=excluded,
                    )
                    if not ents:
                        continue
                    chunk_id = f"{doc_id}_{idx}"
                    bits = 0
                    for i, kw in enumerate(keywords):
                        if kw in text:
                            bits |= 1 << i
                    for e in ents:
                        rows["chunk_id"].append(chunk_id)
                        rows["doc_id"].append(doc_id)
                        rows["entity_id"].append(e["entity_id"])
                        rows["name"].append(e["name"])
                        rows["entity_type"].append(e["entity_type"])
                        rows["confidence"].append(e["confidence"])
                        rows["n_mentions"].append(len(e["mentions"]))
                        rows["kw_bits"].append(bits)
            yield pd.DataFrame(
                {
                    "chunk_id": pd.Series(rows["chunk_id"], dtype="string"),
                    "doc_id": pd.Series(rows["doc_id"], dtype="string"),
                    "entity_id": pd.Series(rows["entity_id"], dtype="string"),
                    "name": pd.Series(rows["name"], dtype="string"),
                    "entity_type": pd.Series(rows["entity_type"], dtype="string"),
                    "confidence": pd.Series(rows["confidence"], dtype="float32"),
                    "n_mentions": pd.Series(rows["n_mentions"], dtype="int64"),
                    "kw_bits": pd.Series(rows["kw_bits"], dtype="int64"),
                }
            )

    return documents.select("doc_id", "content").mapInPandas(
        run, schema=MENTIONS_FLAGGED_SCHEMA
    )


def rollup_entities(mentions: DataFrame) -> DataFrame:
    """Corpus-level entity table (E14 analog, graph/mod.rs:219-241):
    dedupe mentions by entity_id keeping max confidence + mention counts.

    One shuffle on entity_id with map-side combine; ``max_by`` keeps the
    name variant of the highest-confidence mention deterministically
    (ties broken by name) so re-runs are stable.

    first_mentioned / last_mentioned (core/mod.rs:237-240) are populated
    as chunk-order surrogate timestamps — min/max chunk ordinal across
    the entity's mentions (see operators/temporal.entity_temporal_bounds;
    real epoch columns drop in when the corpus carries them).
    """
    ordinal = F.regexp_extract(F.col("chunk_id"), r"_(\d+)$", 1).cast("long")
    return mentions.groupBy("entity_id").agg(
        F.max_by(F.col("name"), F.struct(F.col("confidence"), F.col("name"))).alias("name"),
        F.first("entity_type").alias("entity_type"),
        F.max("confidence").alias("confidence"),
        F.sum("n_mentions").alias("mention_count"),
        F.min(ordinal).alias("first_mentioned"),
        F.max(ordinal).alias("last_mentioned"),
    )


GAZETTEER_MAX_ROWS = 10_000


def gazetteer_mentions(
    chunks: DataFrame, gazetteer: DataFrame, *, max_rows: int = GAZETTEER_MAX_ROWS
) -> DataFrame:
    """Broadcast-join gazetteer matching: finds chunks containing each
    gazetteer ``name`` (with ``entity_type``) as a substring — the scale
    path for configurable gazetteers (E2 phase 1 / E4 generalized), fully
    JVM-side (no Python).

    gazetteer: (name, entity_type[, confidence]) — must be small
    (dim-sized): the contains-join is a BroadcastNestedLoopJoin, i.e.
    every chunk is scanned against every dictionary row. The guard below
    FAILS FAST above ``max_rows`` instead of silently shipping a huge
    dictionary into an O(chunks × dict) scan — for big dictionaries use
    the blocked ``linking.find_canonical`` path (token-keyed candidate
    generation) or pre-filter the gazetteer.
    """
    n = gazetteer.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"gazetteer has more than {max_rows} rows: the substring "
            "broadcast join is O(chunks x dictionary) and is only safe "
            "for dim-sized dictionaries. Use the blocked find_canonical "
            "path (graphrag_rs_spark.operators.linking) for large "
            "dictionaries, or raise max_rows explicitly if you accept "
            "the scan cost."
        )
    g = F.broadcast(gazetteer)
    joined = chunks.join(g, F.col("content").contains(F.col("name")), "inner")
    conf = (
        F.col("confidence")
        if "confidence" in gazetteer.columns
        else F.lit(0.8).cast("float")
    )
    return joined.select(
        "chunk_id",
        "doc_id",
        F.concat(
            F.col("entity_type"),
            F.lit("_"),
            F.regexp_replace(F.lower(F.col("name")), "[^a-z0-9_]", ""),
        ).alias("entity_id"),
        "name",
        "entity_type",
        conf.alias("confidence"),
    )


def mention_context_windows(
    chunks: DataFrame,
    gazetteer: DataFrame,
    *,
    window: int = 30,
    max_rows: int = GAZETTEER_MAX_ROWS,
) -> DataFrame:
    """NER training examples from gazetteer matches → one row per
    (chunk, name): (chunk_id, doc_id, name, entity_type, start_offset,
    snippet) where ``snippet`` is ±``window`` chars around the FIRST
    occurrence and ``start_offset`` is its 0-based position.

    Span-annotated snippets are the supervision format every NER/entity
    model trains on; emitting them straight from the same broadcast
    gazetteer join that indexes the corpus turns the KG's mention layer
    into model training data with zero extra scans.  Same dictionary-size
    guard as ``gazetteer_mentions``; the snippet math is pure codegen
    (instr/substring), map-only after the broadcast join.
    """
    n = gazetteer.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"gazetteer has more than {max_rows} rows — see "
            "gazetteer_mentions for the rationale and the blocked "
            "alternative."
        )
    g = F.broadcast(gazetteer)
    joined = chunks.join(g, F.col("content").contains(F.col("name")), "inner")
    pos = F.instr(F.col("content"), F.col("name"))  # 1-based, > 0 after join
    left = F.greatest(pos - F.lit(int(window)), F.lit(1))
    length = pos + F.length("name") + F.lit(int(window)) - left
    return joined.select(
        "chunk_id",
        "doc_id",
        "name",
        "entity_type",
        (pos - 1).alias("start_offset"),
        F.substring(F.col("content"), left, length).alias("snippet"),
    )
