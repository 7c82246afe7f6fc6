"""Structured Streaming: micro-batch incremental KG indexing.

The reference has no streaming surface (SURVEY §2.8) — its incremental
module (incremental/mod.rs) is micro-batch-shaped change application. This
module is the Spark-native extension of that idea: new source files land
in a directory (or any streaming source), and each micro-batch flows
through the SAME batch operators (ingest → chunk → extract are narrow, so
they compose with streaming DataFrames directly); the relational tail
(pair-join + dedupe) runs inside ``foreachBatch`` where batch-only ops are
allowed, appending to the workspace tables.

Checkpointing is Spark's own streaming checkpoint (exactly-once file
source tracking) layered over our content-sha lineage: re-delivered rows
dedupe on (doc_id, content_sha256) downstream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphrag_rs_spark.config import DEFAULT_CONFIG, PipelineConfig
from graphrag_rs_spark.operators.chunking import chunk_documents
from graphrag_rs_spark.operators.extraction import extract_mentions
from graphrag_rs_spark.operators.ingest import ingest_documents
from graphrag_rs_spark.operators.relationships import extract_triples
from graphrag_rs_spark.schemas import SOURCE_SCHEMA


def stream_index(
    spark: SparkSession,
    input_dir: str,
    workspace: str,
    config: PipelineConfig = DEFAULT_CONFIG,
    *,
    trigger_available_now: bool = True,
):
    """Watch ``input_dir`` for parquet drops of source rows and maintain
    append-only mentions/triples tables under ``workspace``.

    Returns the StreamingQuery. With ``trigger_available_now`` the query
    drains what's present and stops — the batch-job-shaped variant used in
    tests and backfills; set False for a continuous micro-batch daemon.
    """
    src = (
        spark.readStream.schema(SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        documents = ingest_documents(batch_df)
        chunks = chunk_documents(documents, config).localCheckpoint(eager=True)
        mentions = extract_mentions(chunks, config).localCheckpoint(eager=True)
        triples = extract_triples(mentions, chunks, config)
        mentions.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            os.path.join(workspace, "mentions_stream")
        )
        triples.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            os.path.join(workspace, "triples_stream")
        )

    writer = (
        src.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(workspace, "_stream_checkpoint"))
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    workspace: str,
    *,
    window_duration: str = "1 minute",
    watermark_delay: str = "5 minutes",
    trigger_available_now: bool = True,
):
    """Watermarked tumbling-window aggregation over an event stream
    (event_id, ts, user_id, event_type, value) — the late-data-tolerant
    streaming aggregation shape (watermark bounds state; events later than
    ``watermark_delay`` are dropped, earlier stragglers update their
    window). Output: append-mode parquet of finalized windows.
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    src = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        src.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(workspace, "event_window_counts"))
        .option("checkpointLocation", os.path.join(workspace, "_event_checkpoint"))
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_sessionize(
    spark: SparkSession,
    input_dir: str,
    workspace: str,
    *,
    gap_seconds: int = 300,
    watermark_delay: str = "10 minutes",
    trigger_available_now: bool = True,
):
    """Custom STATEFUL streaming operator: per-user sessionization with a
    gap timeout, via ``applyInPandasWithState`` (arbitrary per-key state —
    the shape Structured Streaming's built-in windows can't express).

    State per user: (session_start, last_ts, n_events) as epoch seconds.
    Each micro-batch merges the user's new events (sorted within the
    buffered window; cross-batch disorder is bounded by the watermark),
    emits every session CLOSED by a ``gap_seconds`` gap, and keeps the
    open session in state with an event-time timeout at
    last_ts + gap_seconds — when the watermark passes it, the open
    session is emitted with ``closed_by='timeout'`` and the state is
    dropped (bounded state, the 100 TB requirement).

    Output: (user_id, session_start, session_end, n_events, closed_by)
    appended as parquet under ``workspace/sessions``.
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )

    def sessionize(key, pdfs, state):
        import pandas as pd

        user_id = key[0]

        def _emit(rows):
            return pd.DataFrame(
                {
                    "user_id": pd.Series([r[0] for r in rows], dtype="int64"),
                    "session_start": pd.Series([r[1] for r in rows], dtype="int64"),
                    "session_end": pd.Series([r[2] for r in rows], dtype="int64"),
                    "n_events": pd.Series([r[3] for r in rows], dtype="int64"),
                    "closed_by": pd.Series([r[4] for r in rows], dtype="string"),
                }
            )

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield _emit([(user_id, start, last, n, "timeout")])
            return

        ts_list = []
        for pdf in pdfs:
            ts_list.extend(int(t.timestamp()) for t in pdf["ts"] if t is not None)
        ts_list.sort()

        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0

        closed = []
        # cross-batch late arrivals (allowed while inside the watermark,
        # which is wider than the gap): an event may precede the open
        # session held in state — and may CHAIN to it through other new
        # events. Merge ORDER-INSENSITIVELY as an interval merge: each
        # event is a [t, t] interval, the open session is [start, last]
        # carrying its event count; sort by interval start and chain
        # whenever the next interval starts within ``gap`` of the current
        # chain's end. Every chain except the final one is closed ("gap");
        # the final chain becomes the new open session. Late events can
        # extend start DOWNWARD but last never regresses, and an event
        # bridge (e.g. 1499→1501→[1800,1900] with gap 300) correctly
        # fuses into one session regardless of which batch delivered it.
        items = [(t, t, 1) for t in ts_list]
        if start is not None:
            items.append((start, last, n))
        items.sort()
        start = last = None
        n = 0
        for s_i, e_i, n_i in items:
            if start is None:
                start, last, n = s_i, e_i, n_i
            elif s_i - last > gap_seconds:
                closed.append((user_id, start, last, n, "gap"))
                start, last, n = s_i, e_i, n_i
            else:
                last = max(last, e_i)
                n += n_i
        if start is not None:
            state.update((start, last, n))
            state.setTimeoutTimestamp((last + gap_seconds) * 1000)
        yield _emit(closed)

    src = (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .withWatermark("ts", watermark_delay)
    )
    sessions = src.groupBy("user_id").applyInPandasWithState(
        sessionize,
        outputStructType=(
            "user_id long, session_start long, session_end long, "
            "n_events long, closed_by string"
        ),
        stateStructType="start long, last long, n long",
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
    writer = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(workspace, "sessions"))
        .option("checkpointLocation", os.path.join(workspace, "_sessions_checkpoint"))
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def consolidated_triples(spark: SparkSession, workspace: str) -> DataFrame:
    """Merge the append-only stream output into the canonical triple set
    (max confidence, unioned contexts) — the read-side compaction."""
    t = spark.read.parquet(os.path.join(workspace, "triples_stream"))
    return t.groupBy("subj", "pred", "obj").agg(
        F.max("confidence").alias("confidence"),
        F.sort_array(
            F.array_distinct(F.flatten(F.collect_list("context_chunk_ids")))
        ).alias("context_chunk_ids"),
    )


def stream_dedup_events(
    spark: SparkSession,
    input_dir: str,
    workspace: str,
    *,
    watermark_delay: str = "10 minutes",
    trigger_available_now: bool = True,
):
    """Streaming exact deduplication: drop re-deliveries of the same
    ``event_id`` inside the watermark horizon and emit the first arrival
    of each — the at-least-once → exactly-once repair every streaming
    ingest front-end needs before events feed stateful operators.

    ``dropDuplicatesWithinWatermark`` keys state by event_id and expires
    entries once the watermark passes their event time, so state is
    bounded by (arrival rate × watermark horizon) instead of growing
    with the stream — the property that keeps this runnable forever on a
    real cluster (a plain dropDuplicates on an unbounded stream leaks
    state without bound). Output: append-mode parquet of unique events.
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    src = spark.readStream.schema(schema).parquet(input_dir)
    deduped = src.withWatermark("ts", watermark_delay).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    writer = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(workspace, "events_deduped"))
        .option(
            "checkpointLocation", os.path.join(workspace, "_dedup_checkpoint")
        )
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
