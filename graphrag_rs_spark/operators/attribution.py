"""Multi-touch marketing attribution — first / last / linear credit.

Every touch event (click, view, …) is assigned to the SAME user's next
conversion event via one forward-looking window pass (partition by
user, order by (ts, event_id), first non-null conversion id from the
current row onward) — the classic attribution segmentation, computed
without a self-join.  Credits are exact integer micro-units
(unit = 1 000 000): first-touch and last-touch give the whole unit to
one row; linear gives unit // n to every touch and the remainder to
the last touch, so per-conversion credits always sum to exactly one
unit in every model.

Scale shape: two window passes over the event log, both partitioned by
user_id — no shuffle beyond the user hash, no driver state, linear in
the log.  Skewed users are bounded by their own event count (windows,
not joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def multi_touch_attribution(
    events: DataFrame,
    *,
    touch_types: tuple[str, ...] = ("click", "view"),
    conversion_type: str = "purchase",
    unit: int = 1_000_000,
) -> DataFrame:
    """events(event_id, ts, user_id, event_type) →
    (user_id, conv_event_id, touch_event_id, touch_type,
     touch_index, n_touches, first_credit, last_credit, linear_credit).

    Touches with no later conversion by the same user are dropped
    (they carry no credit).  Order within a user is (ts, event_id) —
    a strict total order, so every engine segments identically.
    """
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    seg = events.select(
        "event_id", "ts", "user_id", "event_type"
    ).withColumn(
        "conv_event_id",
        F.first(
            F.when(F.col("event_type") == conversion_type, F.col("event_id")),
            ignorenulls=True,
        ).over(w_fwd),
    )
    touches = seg.where(
        F.col("event_type").isin(*touch_types)
        & F.col("conv_event_id").isNotNull()
    )
    w_grp = Window.partitionBy("user_id", "conv_event_id").orderBy(
        "ts", "event_id"
    )
    w_all = Window.partitionBy("user_id", "conv_event_id")
    ranked = touches.select(
        "user_id",
        "conv_event_id",
        F.col("event_id").alias("touch_event_id"),
        F.col("event_type").alias("touch_type"),
        F.row_number().over(w_grp).alias("touch_index"),
        F.count("*").over(w_all).alias("n_touches"),
    )
    n = F.col("n_touches")
    i = F.col("touch_index")
    base = (F.lit(unit) / n).cast("long")  # unit // n (both positive)
    return ranked.select(
        "user_id",
        "conv_event_id",
        "touch_event_id",
        "touch_type",
        "touch_index",
        "n_touches",
        F.when(i == 1, F.lit(unit)).otherwise(F.lit(0))
        .cast("long")
        .alias("first_credit"),
        F.when(i == n, F.lit(unit)).otherwise(F.lit(0))
        .cast("long")
        .alias("last_credit"),
        F.when(i == n, F.lit(unit) - (n - 1) * base)
        .otherwise(base)
        .cast("long")
        .alias("linear_credit"),
    )
