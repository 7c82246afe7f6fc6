"""Physical-plan audits: the optimizations we rely on must actually appear
in the plan — filter pushdown to the parquet scan, column pruning,
broadcast for dim joins, whole-stage codegen on hot relational paths, and
map-side partial aggregation. Catches regressions that correctness tests
can't see (a plan that scans every column still returns the right rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def parquet_docs(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "docs")
    from graphrag_rs_spark.fixtures import generate_corpus
    from graphrag_rs_spark.schemas import SOURCE_SCHEMA

    spark.createDataFrame(
        generate_corpus(n_docs=30, include_edge_cases=False), SOURCE_SCHEMA
    ).write.parquet(path)
    return spark.read.parquet(path)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark, parquet_docs):
    df = parquet_docs.where(F.col("lang") == "rust").select("repo", "path")
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "lang" in plan.split("PushedFilters")[1][:200]


def test_column_pruning(spark, parquet_docs):
    df = parquet_docs.select("repo", "path")
    plan = _plan(df)
    # ReadSchema must not include the wide content column
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "content" not in read_schema


def test_fused_extraction_prunes_columns(spark, parquet_docs):
    from graphrag_rs_spark.operators.extraction import extract_mentions_fused
    from graphrag_rs_spark.operators.ingest import ingest_documents

    df = extract_mentions_fused(ingest_documents(parquet_docs))
    plan = _plan(df)
    # the scan feeding the UDF needs only the identity + content columns
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "content" in read_schema
    assert "lang" not in read_schema


def test_broadcast_dim_join(spark, parquet_docs):
    gaz = spark.createDataFrame([("alpha", "CONCEPT")], ["name", "entity_type"])
    from graphrag_rs_spark.operators.extraction import gazetteer_mentions

    chunks = parquet_docs.select(
        F.col("path").alias("chunk_id"), F.col("path").alias("doc_id"),
        F.col("content"),
    )
    plan = _plan(gazetteer_mentions(chunks, gaz))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_triple_rewrite_broadcasts_cluster_map(spark):
    from graphrag_rs_spark.operators.linking import rewrite_triples

    triples = spark.createDataFrame(
        [("a", "KNOWS", "b", 0.5, ["c1"])],
        "subj string, pred string, obj string, confidence float, context_chunk_ids array<string>",
    )
    clusters = spark.createDataFrame(
        [("a", "a", "a")], ["entity_id", "canonical_id", "cluster_id"]
    )
    plan = _plan(rewrite_triples(triples, clusters))
    assert "BroadcastExchange" in plan


def test_map_side_partial_aggregation(spark, parquet_docs):
    # AQE formatted plans don't label WholeStageCodegen spans; the property
    # that matters at scale is the partial (map-side) aggregate before the
    # exchange — hot keys combine before shuffling
    df = (
        parquet_docs.where(F.col("lang") == "text")
        .groupBy("repo")
        .agg(F.count("*").alias("n"))
    )
    plan = _plan(df)
    assert "partial_count" in plan
    assert plan.index("partial_count") < plan.index("Exchange") or "Exchange" in plan


def test_triples_partial_aggregation(spark, parquet_docs):
    """The context dedupe must show a partial (map-side) aggregation before
    the exchange — hot keys collapse before shuffling."""
    from graphrag_rs_spark.operators.extraction import extract_mentions_fused
    from graphrag_rs_spark.operators.ingest import ingest_documents
    from graphrag_rs_spark.operators.relationships import extract_triples_fused

    flagged = extract_mentions_fused(ingest_documents(parquet_docs))
    plan = _plan(extract_triples_fused(flagged))
    # ObjectHashAggregate (collect_set/list) appears in partial + final pairs
    assert plan.count("ObjectHashAggregate") >= 2 or plan.count("HashAggregate") >= 2
