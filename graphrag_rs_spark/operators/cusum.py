"""One-sided CUSUM changepoint scores — windows only, no recurrence.

The Page CUSUM statistic S_i = max(0, S_{i−1} + x_i − k) looks like an
inherently sequential recurrence, but it has a closed form over prefix
sums: with P_i = Σ_{t≤i}(x_t − k) and P_0 = 0,

    S_i = P_i − min(0, min_{j≤i} P_j)

so one cumulative sum and one cumulative min — both plain window
frames partitioned by the series key — compute the exact statistic.
That is the scale story: no applyInPandas, no per-series loop, just
two window passes that Spark executes with a single hash shuffle on
the key.

Everything is integer: x arrives quantized (e.g. cents), drift k and
alarm threshold h are integers, so any engine replays the scores
bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_scores(
    series: DataFrame,
    *,
    key: str = "user_id",
    order: tuple[str, ...] = ("ts", "event_id"),
    value: str = "x",
    drift: int = 0,
    threshold: int | None = None,
) -> DataFrame:
    """series(key, order…, value int) → input columns + (cusum long,
    alarm int): the exact one-sided CUSUM statistic per row and a 0/1
    alarm flag (1 where cusum > threshold; all-0 when threshold is
    None)."""
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = F.sum(F.col(value) - F.lit(int(drift))).over(w)
    out = series.withColumn("_p", p.cast("long"))
    w2 = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = out.withColumn(
        "cusum",
        (
            F.col("_p")
            - F.least(F.lit(0).cast("long"), F.min("_p").over(w2))
        ).cast("long"),
    ).drop("_p")
    alarm = (
        (F.col("cusum") > F.lit(int(threshold))).cast("int")
        if threshold is not None
        else F.lit(0).cast("int")
    )
    return out.withColumn("alarm", alarm)
