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


def line_churn(
    old: DataFrame,
    new: DataFrame,
    keys: list[str] | None = None,
    *,
    content_col: str = "content",
) -> DataFrame:
    """Line-level churn between two commits/snapshots of a text corpus →
    one row per changed file: (*keys, lines_added, lines_removed).

    ``snapshot_diff`` answers *which rows* changed; this answers *how
    much* — the per-file added/removed line counts every commit-analytics
    view (code velocity, hot-file detection, review sizing) is built on.
    Lines are compared as multisets (exact duplicates of one line count
    separately), which equals diff churn for the dominant edit shapes
    (pure insert/delete/replace) without quadratic alignment.

    Scale shape: each side is one map-only explode of its line array,
    then a partial-aggregated count shuffled on (*keys, line) — a
    uniform-width key (a single line of text) with the heavy lifting in
    map-side combine; the full-outer join runs on the same key and the
    final per-file rollup is a second partial agg.  No alignment state,
    no collect, no UDF — churn over two 100 TB snapshots is three
    shuffles of ids+line rows.
    """
    keys = list(keys) if keys is not None else ["repo", "path"]

    def _counts(df: DataFrame, side: str) -> DataFrame:
        return (
            df.select(
                *keys,
                F.explode(F.split(F.col(content_col), "\n", -1)).alias("line"),
            )
            .groupBy(*keys, "line")
            .agg(F.count("*").alias(side))
        )

    j = _counts(old, "n_old").join(
        _counts(new, "n_new"), [*keys, "line"], "full_outer"
    )
    zero = F.lit(0).cast("long")
    n_old, n_new = F.coalesce("n_old", zero), F.coalesce("n_new", zero)
    return (
        j.groupBy(*keys)
        .agg(
            F.sum(F.greatest(n_new - n_old, zero)).alias("lines_added"),
            F.sum(F.greatest(n_old - n_new, zero)).alias("lines_removed"),
        )
        .where((F.col("lines_added") > 0) | (F.col("lines_removed") > 0))
    )


def cochange_edges(
    commits: DataFrame,
    *,
    repo_col: str = "repo",
    commit_col: str = "commit",
    path_col: str = "path",
    min_support: int = 2,
    max_commit_files: int = 1000,
) -> DataFrame:
    """Logical-coupling edges from VCS history (Zimmermann et al. 2004,
    "Mining Version Histories to Guide Software Changes"): two files
    that repeatedly change in the SAME commit are coupled →
    (repo, path_a, path_b, n_cochanges) for pairs with support >=
    ``min_support``, path_a < path_b.

    These are first-class code-KG edges (the dependency graph misses
    cross-language and config/code coupling; co-change catches both).

    Scale shape: the pair generation is a self-join keyed on
    (repo, commit) — the classic blocking key. Bulk/merge/reformat
    commits touching more than ``max_commit_files`` files are dropped
    FIRST (the standard mining guard: they assert no real coupling and
    their pair count is quadratic — this is the skew story, a 50k-file
    sweep commit would otherwise emit 1.25B pairs). One groupBy on the
    (bounded) pair space afterwards.
    """
    f = commits.select(
        F.col(repo_col).alias("repo"),
        F.col(commit_col).alias("commit"),
        F.col(path_col).alias("path"),
    ).dropDuplicates(["repo", "commit", "path"])
    sizes = f.groupBy("repo", "commit").agg(F.count("*").alias("_n"))
    ok = f.join(
        sizes.where(F.col("_n") <= max_commit_files).select("repo", "commit"),
        ["repo", "commit"],
    )
    a = ok.select("repo", "commit", F.col("path").alias("path_a"))
    b = ok.select("repo", "commit", F.col("path").alias("path_b"))
    pairs = a.join(b, ["repo", "commit"]).where(
        F.col("path_a") < F.col("path_b")
    )
    return (
        pairs.groupBy("repo", "path_a", "path_b")
        .agg(F.count("*").alias("n_cochanges"))
        .where(F.col("n_cochanges") >= min_support)
    )
