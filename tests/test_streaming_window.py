"""Watermarked streaming window aggregation vs the equivalent batch query."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_stream_windowed_counts_match_batch(spark, tmp_path):
    from graphrag_rs_spark.streaming import stream_windowed_event_counts

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    input_dir = str(tmp_path / "ev_in")
    ws = str(tmp_path / "ev_ws")
    events.write.parquet(input_dir)

    q = stream_windowed_event_counts(spark, input_dir, ws)
    q.awaitTermination(120)

    got = spark.read.parquet(f"{ws}/event_window_counts")
    batch = (
        events.groupBy(F.window("ts", "1 minute"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type", "n",
            F.round("sum_value", 4).alias("sum_value"),
        )
    )
    g = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 4))
        for r in got.collect()
    }
    b = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in batch.collect()
    }
    # watermark append-mode finalizes all but the trailing window(s); every
    # emitted window must match the batch result exactly, and most windows
    # must have been emitted
    assert g, "no windows emitted"
    for k, v in g.items():
        assert b[k] == v, k
    assert len(g) >= len(b) - 10 * len({k[1] for k in b})
