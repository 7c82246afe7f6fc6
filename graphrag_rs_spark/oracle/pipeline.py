"""Sequential golden pipeline: docs → chunks → entities → triples.

Mirrors the reference's build loop (graphrag/build.rs:516-631 pattern path +
graphrag/documents.rs:18-40 ingest): chunk each document, extract entities
per chunk, then per chunk emit one triple per unordered entity pair with
relation typing. Runs single-threaded on the driver over small fixtures —
this is the golden set the distributed pipeline is scored against
(P/R ≥ 0.95 on the (subj, pred, obj) tuple set).

Triple canonicalization convention (documented, applied identically to both
sides): subj/obj ordered ascending by entity_id; pairs whose two entities
normalize to the same entity_id are DROPPED (no self-loops) — matching the
distributed operators' ``subj < obj`` pair convention.
"""

from __future__ import annotations

from graphrag_rs_spark.config import DEFAULT_CONFIG, PipelineConfig
from graphrag_rs_spark.kernel.chunking import chunk_text
from graphrag_rs_spark.kernel.extraction import (
    extract_entities_from_chunk,
    infer_relationship_type,
)


def build_golden(
    docs: list[dict], config: PipelineConfig = DEFAULT_CONFIG
) -> dict[str, list[dict]]:
    """Run the sequential reference-semantics pipeline.

    ``docs``: rows with (repo, path, commit, lang, content).
    Returns dict of golden tables: chunks, mentions, entities, triples.
    """
    chunks_out: list[dict] = []
    mentions_out: list[dict] = []
    triples: dict[tuple[str, str, str], dict] = {}

    for doc in docs:
        doc_id = f"{doc['repo']}/{doc['path']}@{doc['commit']}"
        text = doc["content"] or ""
        doc_chunks = chunk_text(text, config.chunk_size, config.chunk_overlap)
        chunk_entities_by_chunk = []
        for idx, content, start, end in doc_chunks:
            chunk_id = f"{doc_id}_{idx}"
            chunks_out.append(
                {
                    "chunk_id": chunk_id,
                    "doc_id": doc_id,
                    "content": content,
                    "start_offset": start,
                    "end_offset": end,
                }
            )
            ents = extract_entities_from_chunk(
                content,
                min_confidence=config.min_confidence,
                entity_types=config.entity_types,
                allowed_patterns=config.allowed_patterns,
                excluded_patterns=config.excluded_patterns,
            )
            for e in ents:
                mentions_out.append(
                    {
                        "chunk_id": chunk_id,
                        "doc_id": doc_id,
                        "entity_id": e["entity_id"],
                        "name": e["name"],
                        "entity_type": e["entity_type"],
                        "confidence": e["confidence"],
                        "n_mentions": len(e["mentions"]),
                    }
                )
            chunk_entities_by_chunk.append((chunk_id, content, ents))

        if not config.extract_relationships:
            continue
        for chunk_id, content, ents in chunk_entities_by_chunk:
            # only entities with at least one literal mention participate
            # (build.rs:579-583 filters on mention chunk-id presence)
            present = [e for e in ents if e["mentions"]]
            if len(present) < 2:
                continue
            for i in range(len(present)):
                for j in range(i + 1, len(present)):
                    e1, e2 = present[i], present[j]
                    pred = infer_relationship_type(
                        e1["entity_type"], e2["entity_type"], content
                    )
                    subj, obj = sorted((e1["entity_id"], e2["entity_id"]))
                    if subj == obj:
                        continue  # identical ids collapse to nothing pairable
                    key = (subj, pred, obj)
                    if key in triples:
                        t = triples[key]
                        t["confidence"] = max(
                            t["confidence"], config.relationship_confidence
                        )
                        if chunk_id not in t["context_chunk_ids"]:
                            t["context_chunk_ids"].append(chunk_id)
                    else:
                        triples[key] = {
                            "subj": subj,
                            "pred": pred,
                            "obj": obj,
                            "confidence": config.relationship_confidence,
                            "context_chunk_ids": [chunk_id],
                        }

    # doc-level entity rollup (graph/mod.rs:219-241 analog at corpus level):
    # per entity_id keep max confidence + total mention count
    entities: dict[str, dict] = {}
    for m in mentions_out:
        e = entities.get(m["entity_id"])
        if e is None:
            entities[m["entity_id"]] = {
                "entity_id": m["entity_id"],
                "name": m["name"],
                "entity_type": m["entity_type"],
                "confidence": m["confidence"],
                "mention_count": m["n_mentions"],
            }
        else:
            e["confidence"] = max(e["confidence"], m["confidence"])
            e["mention_count"] += m["n_mentions"]

    return {
        "chunks": chunks_out,
        "mentions": mentions_out,
        "entities": sorted(entities.values(), key=lambda e: e["entity_id"]),
        "triples": sorted(triples.values(), key=lambda t: (t["subj"], t["pred"], t["obj"])),
    }
