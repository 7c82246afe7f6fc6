"""G10: temporal graph operators — snapshots, evolution metrics, churn,
lifetimes, and entity temporal bounds.

Reference: graph/temporal.rs. Column conventions for a temporal edge
frame: (src, dst, ts, valid_from, valid_to) where valid_from/valid_to are
nullable epoch-second longs. A row with BOTH valid_from and valid_to set
is interval-valid (active at t iff valid_from ≤ t ≤ valid_to,
TemporalEdge::is_active_at :125-133); otherwise it is a point-in-time
edge active only at ts exactly — the reference's two-mode semantics,
preserved (including the boundary-inclusive overlap of
is_active_in_range :135-143, which makes adjacent evolution buckets share
boundary instants).

All operators are plain filters/aggregations — snapshots are predicates
pushed into the scan, evolution metrics are one explode + groupBy over
generated buckets (no per-bucket jobs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _active_at(ts_lit):
    interval = F.col("valid_from").isNotNull() & F.col("valid_to").isNotNull()
    return F.when(
        interval, (F.col("valid_from") <= ts_lit) & (F.col("valid_to") >= ts_lit)
    ).otherwise(F.col("ts") == ts_lit)


def _active_in(start_lit, end_lit):
    interval = F.col("valid_from").isNotNull() & F.col("valid_to").isNotNull()
    return F.when(
        interval,
        (F.col("valid_from") <= end_lit) & (F.col("valid_to") >= start_lit),
    ).otherwise((F.col("ts") >= start_lit) & (F.col("ts") <= end_lit))


def snapshot_at(edges: DataFrame, timestamp: int) -> DataFrame:
    """Edges active at an instant (temporal.rs:254-263)."""
    return edges.where(_active_at(F.lit(int(timestamp))))


def snapshot_range(edges: DataFrame, start: int, end: int) -> DataFrame:
    """Edges active anywhere in [start, end] (temporal.rs:266-275)."""
    return edges.where(_active_in(F.lit(int(start)), F.lit(int(end))))


def _snapshot_stats(edges: DataFrame, group_cols: list[str]) -> DataFrame:
    """node/edge counts + density + avg degree per group
    (Snapshot::density :192-199, avg degree = 2E/N)."""
    nodes = (
        edges.select(*group_cols, F.col("src").alias("node"))
        .union(edges.select(*group_cols, F.col("dst").alias("node")))
        .groupBy(*group_cols)
        .agg(F.countDistinct("node").alias("node_count"))
    )
    ecount = edges.groupBy(*group_cols).agg(F.count("*").alias("edge_count"))
    n = F.col("node_count")
    e = F.col("edge_count")
    return (
        ecount.join(nodes, group_cols)
        .withColumn(
            "density",
            F.when(n < 2, F.lit(0.0)).otherwise(
                e.cast("double") / ((n * (n - 1) / 2).cast("double"))
            ),
        )
        .withColumn(
            "avg_degree",
            F.when(n == 0, F.lit(0.0)).otherwise(2.0 * e.cast("double") / n.cast("double")),
        )
    )


def evolution_metrics(
    edges: DataFrame, *, start_time: int, end_time: int, granularity: int
) -> DataFrame:
    """→ (timestamp, node_count, edge_count, density, avg_degree) per
    granularity bucket (TemporalAnalytics::evolution_metrics :361-381).
    Buckets start at start_time, start_time+g, ... ≤ end_time; each bucket
    is snapshot_range(t, t+g) with the reference's inclusive bounds.
    Implemented as bucket-sequence explode + range join + one groupBy —
    not a per-bucket driver loop."""
    spark = edges.sparkSession
    buckets = spark.range(0, (end_time - start_time) // granularity + 1).select(
        (F.lit(start_time) + F.col("id") * granularity).alias("timestamp")
    )
    b_start = F.col("timestamp")
    b_end = F.col("timestamp") + F.lit(granularity)
    joined = buckets.join(edges, _active_in(b_start, b_end))
    stats = _snapshot_stats(joined, ["timestamp"])
    # buckets with no active edges are omitted by the inner join — union
    # them back as zero rows (the reference emits every bucket)
    empty = buckets.join(stats.select("timestamp"), "timestamp", "left_anti").select(
        "timestamp",
        F.lit(0).cast("long").alias("edge_count"),
        F.lit(0).cast("long").alias("node_count"),
        F.lit(0.0).alias("density"),
        F.lit(0.0).alias("avg_degree"),
    )
    return stats.select(
        "timestamp", "edge_count", "node_count", "density", "avg_degree"
    ).unionByName(empty)


def node_lifetime(edges: DataFrame) -> DataFrame:
    """→ (node, first_seen, last_seen) over edge validity
    (TemporalGraph::node_lifetime :305-311). Point edges contribute ts;
    interval edges contribute their bounds."""
    interval = F.col("valid_from").isNotNull() & F.col("valid_to").isNotNull()
    lo = F.when(interval, F.col("valid_from")).otherwise(F.col("ts"))
    hi = F.when(interval, F.col("valid_to")).otherwise(F.col("ts"))
    per_edge = edges.select(
        F.explode(F.array("src", "dst")).alias("node"),
        lo.alias("lo"),
        hi.alias("hi"),
    )
    return per_edge.groupBy("node").agg(
        F.min("lo").alias("first_seen"), F.max("hi").alias("last_seen")
    )


def node_churn(edges: DataFrame, *, start_time: int, end_time: int) -> DataFrame:
    """→ one row (added_count, removed_count, stable_count): node sets of
    the instant snapshots at start vs end (TemporalAnalytics::node_churn
    :396-430)."""

    def nodes_at(t):
        s = snapshot_at(edges, t)
        return (
            s.select(F.col("src").alias("node"))
            .union(s.select(F.col("dst").alias("node")))
            .distinct()
        )

    a = nodes_at(start_time).withColumn("_a", F.lit(1))
    b = nodes_at(end_time).withColumn("_b", F.lit(1))
    m = a.join(b, "node", "full_outer")
    return m.agg(
        F.sum(F.when(F.col("_a").isNull(), 1).otherwise(0)).alias("added_count"),
        F.sum(F.when(F.col("_b").isNull(), 1).otherwise(0)).alias("removed_count"),
        F.sum(
            F.when(F.col("_a").isNotNull() & F.col("_b").isNotNull(), 1).otherwise(0)
        ).alias("stable_count"),
    )


def entity_temporal_bounds(mentions: DataFrame) -> DataFrame:
    """→ (entity_id, first_mentioned, last_mentioned): chunk-order
    surrogate timestamps (core/mod.rs:237-240 keeps Option<i64> epochs;
    this corpus has no real timestamps, so the bounds are the min/max
    chunk ordinal — the index after the final '_' of chunk_id, i.e. the
    chunk's position within its document). Real epoch columns drop in
    unchanged when the source has them."""
    ordinal = F.regexp_extract(F.col("chunk_id"), r"_(\d+)$", 1).cast("long")
    return mentions.groupBy("entity_id").agg(
        F.min(ordinal).alias("first_mentioned"),
        F.max(ordinal).alias("last_mentioned"),
    )


def scd2_history(
    changes: DataFrame,
    *,
    key_cols: list[str],
    time_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 intervals (Kimball's SCD2 — the
    warehouse-standard history table) from a change stream → every
    input column plus ``valid_from``, ``valid_to``, ``is_current``:
    each change row becomes a version valid from its own timestamp
    until the key's NEXT change (half-open ``[from, to)``), the latest
    version per key carrying ``valid_to`` NULL and ``is_current``
    true.

    ONE window (partition by key, order by time) and one ``lead`` —
    single shuffle on the key, no self-join, no groupBy-max second
    pass. Ties on (key, time) are ordered by all remaining columns so
    the versioning is total and deterministic. This is the incremental-
    maintenance companion to snapshot_at/snapshot_range above: apply a
    day's change feed, and point-in-time queries become a BETWEEN on
    (valid_from, valid_to).
    """
    from pyspark.sql import Window

    order_cols = [time_col] + [
        c for c in changes.columns if c not in key_cols and c != time_col
    ]
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])
    t = F.col(time_col)
    nxt = F.lead(t).over(w)
    return (
        changes.withColumn("valid_from", t)
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull())
    )
