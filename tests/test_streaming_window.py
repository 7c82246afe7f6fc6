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


def test_stream_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState sessionizer == batch lag-sessionize for every
    session closed by an in-stream gap (the trailing open session per user
    stays in state awaiting its event-time timeout)."""
    import datetime
    import os

    from pyspark.sql import functions as F

    from graphrag_rs_spark.streaming import stream_sessionize

    base = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def ev(eid, user, offset_s):
        return (eid, base + datetime.timedelta(seconds=offset_s), user, "click", 1.0, "{}")

    rows = []
    eid = 0
    # user 1: two sessions (gap 1000s > 300s), second session left open
    for off in [0, 100, 200, 1200, 1300]:
        rows.append(ev(eid, 1, off)); eid += 1
    # user 2: three sessions
    for off in [0, 50, 800, 900, 2000]:
        rows.append(ev(eid, 2, off)); eid += 1

    in_dir = str(tmp_path / "in"); ws = str(tmp_path / "ws")
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    df = spark.createDataFrame(rows, schema)
    df.write.parquet(in_dir)

    q = stream_sessionize(spark, in_dir, ws, gap_seconds=300)
    q.awaitTermination(180)

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(os.path.join(ws, "sessions")).collect()
    }

    # batch comparator: lag-based sessionize, drop each user's LAST session
    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
        "user_id"
    ).orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = df.withColumn(
        "sid", F.sum(F.when(gap.isNull() | (gap > 300), 1).otherwise(0)).over(w)
    )
    sess = (
        marked.groupBy("user_id", "sid")
        .agg(
            F.min(F.unix_timestamp("ts")).alias("session_start"),
            F.max(F.unix_timestamp("ts")).alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
    last_sid = sess.groupBy("user_id").agg(F.max("sid").alias("sid"))
    closed = sess.join(last_sid, ["user_id", "sid"], "left_anti")
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in closed.collect()
    }
    assert got == want
    assert len(want) == 3  # user1: 1 closed, user2: 2 closed
