"""Generic as-of join — the time-series join Spark's DataFrame API lacks.

For each left row, find the right row in the same key group whose
timestamp is the latest ≤ the left timestamp (``direction="backward"``,
the pandas ``merge_asof`` / kdb ``aj`` / DuckDB ``ASOF JOIN`` default),
or the earliest ≥ it (``"forward"``).

Re-expression instead of a range join: tag both sides, union them, and
take ``last(payload, ignorenulls=True)`` over ONE window sorted by
(time, side) within the key — the right row in effect at each left row
is whatever payload most recently preceded it in the merged timeline.
This is the same single-window trick the chunk enricher uses for heading
paths (enrich.py:_asof_headings) and the classic streaming as-of shape:

- ONE shuffle (the window partitionBy), vs a range join's O(n·m)
  per-key blowup or a join+groupBy-max double shuffle;
- at equal timestamps the right row sorts BEFORE the left row, so a
  simultaneous right event matches (DuckDB ``l.t >= r.t`` semantics);
- 100 TB shape: cost is a sort within each key partition — skewed keys
  spill but never cross-product; AQE handles moderate key skew.

``tolerance`` (in the time column's own units) nulls out matches older
(backward) / newer (forward) than the bound, keeping the row — exactly
``merge_asof(tolerance=...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_r",
) -> DataFrame:
    """→ all left columns + right payload columns. Right's key columns
    are excluded; the right TIME column is deliberately carried through
    as payload (suffixed on name collision) — the tolerance check and
    downstream staleness math need the matched timestamp. Left rows with
    no match keep NULL payload (left-outer semantics)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    key = list(on)
    r_payload_cols = [c for c in right.columns if c not in key]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in r_payload_cols
    }
    payload = F.struct(*[F.col(c).alias(c) for c in r_payload_cols])
    r = right.select(
        *key,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_p"),
    )
    lrow = F.struct(*[F.col(c).alias(c) for c in left.columns])
    l = left.select(
        *key,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        lrow.alias("_lrow"),
    )
    u = l.unionByName(r.withColumn("_lrow", F.lit(None).cast(l.schema["_lrow"].dataType)))
    order = (
        [F.col("_t").asc(), F.col("_side").asc()]
        if direction == "backward"
        else [F.col("_t").desc(), F.col("_side").asc()]
    )
    w = (
        Window.partitionBy(*key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("_m", F.last("_p", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    if tolerance is not None:
        gap = (
            F.col("_t") - F.col(f"_m.{right_time}")
            if direction == "backward"
            else F.col(f"_m.{right_time}") - F.col("_t")
        )
        matched = matched.withColumn(
            "_m", F.when(gap <= tolerance, F.col("_m"))
        )
    return matched.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(out_names[c]) for c in r_payload_cols],
    )


def interval_overlap_join(
    intervals: DataFrame,
    points: DataFrame,
    *,
    start_col: str,
    end_col: str,
    time_col: str,
    bucket_width: int,
) -> DataFrame:
    """Interval-containment join without a range-join blowup → every
    (interval row ⨝ point row) pair with ``start ≤ time < end``,
    all columns from both sides (callers pre-alias collisions).

    The naive plan for ``ON p.t >= i.start AND p.t < i.end`` is a
    broadcast-nested-loop / cartesian filter — O(n·m) per overlap, the
    classic Spark range-join trap. This is the standard bucketization
    re-expression: explode each interval into the ``bucket_width``-unit
    buckets it covers (``floor(start/w) .. floor((end-1)/w)``), map each
    point to its single bucket, EQUI-join on the bucket id, then apply
    the exact predicate. Each qualifying pair is produced exactly once
    (a point lives in exactly one bucket), so no dedupe pass.

    All time values must be integers in one shared unit (epoch seconds /
    micros / days). Pick ``bucket_width`` near the TYPICAL interval
    length: cost is Σ ceil(len/w) interval replicas + one shuffle on a
    key whose cardinality the width controls — the same tuning knob as
    Databricks' range-join bin hint. Degenerate (end ≤ start) intervals
    cover no bucket and drop out, matching the empty half-open range.
    """
    s, e, t = F.col(start_col), F.col(end_col), F.col(time_col)
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be a positive integer")
    iv = intervals.where(e > s).withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(s / w), F.floor((e - 1) / w))),
    )
    pt = points.withColumn("_bucket", F.floor(t / w))
    return (
        iv.join(pt, "_bucket")
        .where((t >= s) & (t < e))
        .drop("_bucket")
    )
