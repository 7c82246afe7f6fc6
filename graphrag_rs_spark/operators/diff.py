"""Snapshot diff — what changed between two materializations of a table.

The incremental module (checkpoint.py:run_incremental, reference
incremental/mod.rs) applies deltas forward; users auditing a rebuild want
the reverse view: given yesterday's and today's entities/triples tables,
which rows appeared, vanished, or changed. One full-outer join on the key
— the canonical scale shape (both sides shuffle once on the key; with
bucketed workspace tables even that shuffle is free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare: list[str] | None = None,
    *,
    include_unchanged: bool = False,
) -> DataFrame:
    """→ (*keys, status, changed_cols, old_<c>/new_<c> per compare col).

    status ∈ added | removed | changed | unchanged; ``changed_cols`` lists
    the compare columns whose values differ (null-safe), empty for the
    other statuses. Rows equal on every compare column are dropped unless
    ``include_unchanged``. Compare defaults to all shared non-key columns.
    """
    if compare is None:
        compare = [
            c for c in old.columns if c in set(new.columns) and c not in keys
        ]
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare],
        F.lit(True).alias("_in_new"),
    )
    cond = None
    for k in keys:
        eq = F.col(f"_ok_{k}").eqNullSafe(F.col(f"_nk_{k}"))
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")
    empty = F.array().cast("array<string>")
    both = F.col("_in_old").isNotNull() & F.col("_in_new").isNotNull()
    changed_cols = F.when(
        both,
        F.array_compact(
            F.array(*[
                F.when(
                    ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")), F.lit(c)
                )
                for c in compare
            ])
        ),
    ).otherwise(empty) if compare else empty
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.size(changed_cols) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *[
            F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
            for k in keys
        ],
        status.alias("status"),
        changed_cols.alias("changed_cols"),
        *[F.col(f"old_{c}") for c in compare],
        *[F.col(f"new_{c}") for c in compare],
    )
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out


def graph_diff(
    old_entities: DataFrame,
    new_entities: DataFrame,
    old_triples: DataFrame,
    new_triples: DataFrame,
) -> dict[str, DataFrame]:
    """Diff the two core KG tables with their natural keys."""
    return {
        "entities": snapshot_diff(
            old_entities, new_entities, keys=["entity_id"]
        ),
        "triples": snapshot_diff(
            old_triples, new_triples, keys=["subj", "pred", "obj"]
        ),
    }
