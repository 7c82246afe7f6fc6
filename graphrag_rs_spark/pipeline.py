"""End-to-end KG-construction pipeline facade.

The distributed analog of the reference's ``GraphRAG::build_graph``
(graphrag/build.rs:28-631, pattern path): ingest → chunk → extract →
triples [→ link → canonicalize → communities]. Each stage returns a
DataFrame; nothing is collected. ``build_graph`` wires the stages;
``run_and_checkpoint`` (checkpoint.py) adds per-stage persistence, lineage
and metrics for resumable runs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from graphrag_rs_spark.config import DEFAULT_CONFIG, PipelineConfig
from graphrag_rs_spark.operators.chunking import chunk_documents
from graphrag_rs_spark.operators.extraction import rollup_entities
from graphrag_rs_spark.operators.ingest import ingest_documents


def _scratch_materialize(df: DataFrame) -> DataFrame:
    """Write df to scratch parquet (under spark.local.dir) and read back."""
    import os
    import tempfile
    import uuid

    spark = df.sparkSession
    base = spark.conf.get("spark.local.dir", tempfile.gettempdir())
    path = os.path.join(base, f"graphrag-scratch-{uuid.uuid4().hex[:12]}")
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


@dataclass
class GraphTables:
    """The distributed KnowledgeGraph: a set of DataFrames, not an object
    graph (SURVEY §1.1 — adjacency is a self-join on triples)."""

    documents: DataFrame
    chunks: DataFrame
    mentions: DataFrame
    entities: DataFrame
    triples: DataFrame
    clusters: DataFrame | None = None
    canonical_triples: DataFrame | None = None
    communities: DataFrame | None = None
    community_summaries: DataFrame | None = None


def build_graph(
    source: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
    *,
    link: bool = False,
    communities: bool = False,
    materialize: bool = False,
) -> GraphTables:
    """source(repo, path, commit, lang, content) → graph tables.

    ``link=True`` adds entity linking/canonicalization + triple rewrite;
    ``communities=True`` adds label-propagation communities + summaries
    (requires link). ``materialize=True`` eagerly materializes the fused
    extraction output to scratch parquet so multiple downstream consumers
    don't re-run the UDF (use when collecting several tables in one
    session; ``run_checkpointed`` is the durable equivalent).
    """
    from graphrag_rs_spark.operators.extraction import extract_mentions_fused
    from graphrag_rs_spark.operators.relationships import extract_triples_fused

    documents = ingest_documents(source)
    # chunks are derived on demand (the fused extraction path never needs
    # them JVM-side — content crosses the Python boundary exactly once)
    chunks = chunk_documents(documents, config)
    flagged = extract_mentions_fused(documents, config)
    if materialize:
        # scratch-parquet round trip, NOT localCheckpoint/persist: both
        # in-heap options measured badly at high thread counts
        # (localCheckpoint keeps millions of deserialized rows in old-gen —
        # 54% of downstream stage time became GC; columnar cache build was
        # 2-3× slower than recompute). Parquet in the shuffle scratch dir
        # (tmpfs here) is off-heap, compressed, and gives downstream scans
        # real column pruning. run_checkpointed() is the durable analog.
        flagged = _scratch_materialize(flagged)
    mentions = flagged.drop(
        *[c for c in flagged.columns if c.startswith("kw_")]
    )
    entities = rollup_entities(mentions)
    if config.extract_relationships:
        triples = extract_triples_fused(flagged, config)
    else:
        from graphrag_rs_spark.schemas import TRIPLES_SCHEMA

        triples = source.sparkSession.createDataFrame([], schema=TRIPLES_SCHEMA)
    tables = GraphTables(
        documents=documents,
        chunks=chunks,
        mentions=mentions,
        entities=entities,
        triples=triples,
    )

    if link or communities:
        from graphrag_rs_spark.operators.linking import (
            link_entities,
            rewrite_triples,
        )

        clusters = link_entities(entities, config)
        tables.clusters = clusters
        tables.canonical_triples = rewrite_triples(triples, clusters)

    if communities:
        from graphrag_rs_spark.operators.communities import (
            detect_communities,
            summarize_communities,
        )

        comm = detect_communities(tables.canonical_triples, config)
        tables.communities = comm
        tables.community_summaries = summarize_communities(
            comm, entities, tables.clusters
        )

    return tables
