"""Winnowing fingerprints + cross-repo code clone detection.

The MOSS local document-fingerprinting algorithm (Schleimer, Wilkerson,
Aiken, SIGMOD 2003 — public): normalize the text, hash every k-gram of
characters, slide a window of ``w`` consecutive k-gram hashes and keep
the minimum of each window.  The selected set is a guarantee-carrying
sketch: any shared substring of length ≥ k + w − 1 contributes at least
one shared fingerprint, so clone detection over fingerprints has no
false negatives above that match length.  This is the classic sketch
for CODE clone detection (whitespace/case-insensitive copies across
repos — vendored snippets, license boilerplate, homework-style
duplication) and complements dedup.py's token-shingle MinHash, which
targets prose.

Scale shape (the 100 TB corpus is the design point):
- fingerprinting is map-only column algebra — one pass over ``content``,
  no shuffle; the per-file sketch is ~|content|/((w+1)/2) longs.
- the clone join ships (fingerprint, id) pairs ONLY — never content —
  and mirrors dedup.py's band-join discipline: fingerprints shared by
  more than ``max_fp_bucket`` files (license headers, codegen preambles)
  are dropped before the self-join, bounding per-key fan-out exactly
  like the MinHash band skew guard.
- the k-gram hash is the repo-wide engine-portable sha256-prefix family
  (dedup.py/textstats.py), so DuckDB oracles replay it bit-for-bit.  A
  production deployment would swap in a Karp-Rabin rolling hash UDF for
  the O(n·k) → O(n) constant-factor win; the window-min selection and
  the join topology — the parts that matter at scale — are identical.

Reference scope note: graphrag-rs has no clone detector; this extends
the training-data-pipeline surface (exact/MinHash/SimHash dedup) down to
substring granularity for the source-code corpus of the north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash60(c: Column) -> Column:
    """First 15 hex chars of sha256 as a 60-bit long — engine-portable."""
    return F.conv(F.substring(F.sha2(c, 256), 1, 15), 16, 10).cast("long")


def normalized_code_col(content: Column) -> Column:
    """Whitespace-free, lowercase view of code — the MOSS normalization
    (clones survive reformatting and identifier-case churn)."""
    return F.lower(F.regexp_replace(content, r"\s+", ""))


def winnow_fingerprints(
    files: DataFrame,
    *,
    k: int = 12,
    window: int = 8,
    content_col: str = "content",
    id_col: str = "path",
) -> DataFrame:
    """→ one row per (file, fingerprint): ``(<id_col>, fp)``.

    Map-only (fingerprint + explode ride the scan); downstream joins
    never see ``content``.

    Strings shorter than k yield no rows; strings with fewer than
    ``window`` k-grams yield the single global min (one window covering
    everything) — both engines agree on these edges by construction.

    Each array (normalized string → k-gram hashes → window mins) is
    STAGED in its own projection: higher-order-function lambdas are
    evaluated interpreted, per element, with no hoisting of
    element-independent subexpressions — inlining ``hashes`` into the
    window-min lambda re-hashes the whole gram array once per window,
    turning the linear sketch into O(n²) sha256 calls (measured 64 s →
    1.6 s at sf0.01 for this refactor). CollapseProject keeps the stages
    separate because each alias is referenced more than once and is
    non-cheap.
    """
    staged = files.select(
        F.col(id_col),
        normalized_code_col(F.col(content_col)).alias("_s"),
    )
    n_grams = F.greatest(
        F.coalesce(F.length("_s"), F.lit(0)) - (k - 1), F.lit(0)
    )
    # sequence(1, 0) is DESCENDING [1, 0] in Spark (step defaults to -1
    # when start > stop), so the no-grams case needs an explicit empty
    # branch — it cannot fall out of the sequence bounds
    hashed = staged.select(
        id_col,
        F.when(n_grams < 1, F.array().cast("array<long>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), n_grams),
                lambda i: _hash60(F.col("_s").substr(i, F.lit(k))),
            )
        ).alias("_hs"),
    ).where(F.size("_hs") > 0)
    n_windows = F.greatest(F.size("_hs") - (window - 1), F.lit(1))
    mins = hashed.select(
        id_col,
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda j: F.array_min(F.slice(F.col("_hs"), j, window)),
        ).alias("_mins"),
    )
    return mins.select(
        F.col(id_col),
        F.explode(F.array_distinct("_mins")).alias("fp"),
    )


def clone_pairs(
    files: DataFrame,
    *,
    k: int = 12,
    window: int = 8,
    min_similarity: float = 0.25,
    max_fp_bucket: int = 50,
    content_col: str = "content",
    id_col: str = "path",
) -> DataFrame:
    """→ (id_a, id_b, shared, sim) cross-file clone candidates with
    ``sim`` = |shared fingerprints| / min(|fp_a|, |fp_b|) ≥ min_similarity
    (containment-style: a small file fully pasted into a big one scores
    1.0 — the right asymmetry for vendored-snippet hunting).

    Join topology: (fp, id) pairs only; fingerprints appearing in more
    than ``max_fp_bucket`` files are dropped first (a fingerprint shared
    corpus-wide is boilerplate, not a clone signal — and B² pair blowup
    is exactly the hot-bucket failure dedup.py guards against).
    """
    fps = winnow_fingerprints(
        files, k=k, window=window, content_col=content_col, id_col=id_col
    ).select(F.col(id_col).alias("id"), "fp").persist()

    sizes = fps.groupBy("id").agg(F.count("*").alias("n_fp"))

    hot = (
        fps.groupBy("fp").count()
        .where(F.col("count") > max_fp_bucket)
        .select("fp")
    )
    cold = fps.join(F.broadcast(hot), "fp", "left_anti")

    a = cold.select("fp", F.col("id").alias("id_a"))
    b = cold.select("fp", F.col("id").alias("id_b"))
    shared = (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
    )

    out = (
        shared.join(sizes.withColumnRenamed("id", "id_a")
                    .withColumnRenamed("n_fp", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b")
              .withColumnRenamed("n_fp", "n_b"), "id_b")
        .withColumn(
            "sim",
            F.round(F.col("shared") / F.least("n_a", "n_b"), 6),
        )
        .where(F.col("sim") >= min_similarity)
        .select("id_a", "id_b", "shared", "sim")
    )
    out = out.localCheckpoint(eager=True)
    fps.unpersist()
    return out
