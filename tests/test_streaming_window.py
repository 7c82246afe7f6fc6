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


def test_stream_sessionize_late_events_across_batches(spark, tmp_path):
    """Cross-batch LATE arrivals (allowed: the 10-min watermark is wider
    than the 300 s gap) must merge order-insensitively — the round-2
    advice scenario: a late t < last must never regress session_end below
    session_start or falsely gap-split the open session."""
    import datetime
    import os

    from graphrag_rs_spark.streaming import stream_sessionize

    base = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def ev(eid, user, offset_s):
        return (eid, base + datetime.timedelta(seconds=offset_s), user, "click", 1.0, "{}")

    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    in_dir = str(tmp_path / "in"); ws = str(tmp_path / "ws")

    # batch 1: user 1 opens [1800,1900], user 2 opens [2000,2100];
    # watermark after batch 1 = 2100 - 600 = 1500
    b1 = [ev(0, 1, 1800), ev(1, 1, 1900), ev(2, 2, 2000), ev(3, 2, 2100)]
    spark.createDataFrame(b1, schema).write.mode("append").parquet(in_dir)
    q = stream_sessionize(spark, in_dir, ws, gap_seconds=300)
    q.awaitTermination(180)

    # batch 2 (same checkpoint → state carries over):
    #   user 1: late 1700 (inside open session zone → start extends DOWN,
    #           last must NOT regress), 2050 (forward merge), 4000 (closes)
    #   user 2: late 1600 (strictly before open session − gap → its own
    #           closed 1-event session), 2200 (extends open session)
    b2 = [ev(4, 1, 1700), ev(5, 1, 2050), ev(6, 1, 4000),
          ev(7, 2, 1600), ev(8, 2, 2200)]
    spark.createDataFrame(b2, schema).write.mode("append").parquet(in_dir)
    q = stream_sessionize(spark, in_dir, ws, gap_seconds=300)
    q.awaitTermination(180)

    rows = spark.read.parquet(os.path.join(ws, "sessions")).collect()
    for r in rows:
        assert r["session_end"] >= r["session_start"], rows
    t0 = int(base.timestamp())
    gap_closed = {
        (r["user_id"], r["session_start"] - t0, r["session_end"] - t0, r["n_events"])
        for r in rows if r["closed_by"] == "gap"
    }
    assert gap_closed == {(1, 1700, 2050, 4), (2, 1600, 1600, 1)}


def test_stream_sessionize_late_events_bridge_the_gap(spark, tmp_path):
    """Review regression: late events straddling start−gap must CHAIN into
    the open session when consecutive gaps stay within the threshold —
    1499→1501→[1800,1900] is ONE session [1499,1900], not a bogus
    single-event session plus a truncated open one."""
    import datetime
    import os

    from graphrag_rs_spark.streaming import stream_sessionize

    base = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def ev(eid, user, offset_s):
        return (eid, base + datetime.timedelta(seconds=offset_s), user, "click", 1.0, "{}")

    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    in_dir = str(tmp_path / "in"); ws = str(tmp_path / "ws")

    # batch 1: open session [1800, 1900]; watermark → 1900-600 = 1300
    spark.createDataFrame([ev(0, 1, 1800), ev(1, 1, 1900)], schema).write.mode(
        "append"
    ).parquet(in_dir)
    stream_sessionize(spark, in_dir, ws, gap_seconds=300).awaitTermination(180)

    # batch 2: late chain 1499, 1501 (gaps 2 / 299 ≤ 300) + closer at 4000
    spark.createDataFrame(
        [ev(2, 1, 1499), ev(3, 1, 1501), ev(4, 1, 4000)], schema
    ).write.mode("append").parquet(in_dir)
    stream_sessionize(spark, in_dir, ws, gap_seconds=300).awaitTermination(180)

    t0 = int(base.timestamp())
    gap_closed = {
        (r["session_start"] - t0, r["session_end"] - t0, r["n_events"])
        for r in spark.read.parquet(os.path.join(ws, "sessions")).collect()
        if r["closed_by"] == "gap"
    }
    assert gap_closed == {(1499, 1900, 4)}


def test_stream_dedup_events(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps exactly one row per event_id:
    feed the event table unioned with itself (every row re-delivered) and
    expect the batch-distinct result."""
    from graphrag_rs_spark.streaming import stream_dedup_events

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    dupd = events.union(events)
    input_dir = str(tmp_path / "dd_in")
    ws = str(tmp_path / "dd_ws")
    dupd.write.parquet(input_dir)

    q = stream_dedup_events(spark, input_dir, ws)
    q.awaitTermination(120)

    got = spark.read.parquet(f"{ws}/events_deduped")
    assert got.count() == events.select("event_id").distinct().count()
    # each id exactly once
    assert got.groupBy("event_id").count().where("count > 1").count() == 0
