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
- fingerprinting is one pass over ``content``; the per-file sketch is
  ~|content|/((w+1)/2) longs. Two plans with identical output: the
  default explodes grams to rows for whole-stage-codegen hashing (one
  per-byte shuffle, ~22× faster on Spark's interpreted HOF evaluator),
  and ``strategy="array"`` keeps everything map-only inside per-row
  arrays for very large documents (see ``winnow_fingerprints``).
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

from pyspark.sql import Column, DataFrame, Window
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
    strategy: str = "explode",
) -> DataFrame:
    """→ one row per (file, fingerprint): ``(<id_col>, fp)``.

    Strings shorter than k yield no rows; strings with fewer than
    ``window`` k-grams yield the single global min (one window covering
    everything) — both engines agree on these edges by construction.

    Two physically different plans, bit-identical output
    (tests/test_winnow.py pins equality):

    - ``strategy="explode"`` (default): one row per k-gram position, so
      the sha256+conv element expression runs inside whole-stage codegen
      instead of the interpreted higher-order-function evaluator (HOF
      lambdas are evaluated per element with no codegen: measured 7.8 s
      interpreted vs 0.34 s exploded for the identical 699k hashes at
      sf0.1). Window mins ride a ``rowsBetween(0, w-1)`` window over
      (file, position). Costs one shuffle of (id, pos, hash) rows —
      one row per CONTENT BYTE — so this is the right plan when files
      are small-to-medium (source code: the north-star corpus).
    - ``strategy="array"``: the gram hashes and window mins stay inside
      per-row arrays — map-only, zero shuffle, nothing leaves the scan
      task. Slower on Spark's interpreted HOF evaluator, but the per-row
      work is bounded only by the row, not the shuffle — the right plan
      for very large documents where a per-byte shuffle row is the
      bottleneck. Kept staged in separate projections: inlining the hash
      array into the window-min lambda re-hashes the gram array once per
      window, turning the linear sketch into O(n²) sha256 calls
      (measured 64 s → 1.6 s at sf0.01 for the staging fix).
    """
    staged = files.select(
        F.col(id_col),
        normalized_code_col(F.col(content_col)).alias("_s"),
    )
    n_grams = F.greatest(
        F.coalesce(F.length("_s"), F.lit(0)) - (k - 1), F.lit(0)
    )

    if strategy == "explode":
        grams = staged.where(n_grams >= 1).select(
            id_col,
            F.greatest(n_grams - (window - 1), F.lit(1)).alias("_nw"),
            F.explode(F.sequence(F.lit(1), n_grams)).alias("_i"),
            "_s",
        ).select(
            id_col,
            "_nw",
            "_i",
            _hash60(F.col("_s").substr(F.col("_i"), F.lit(k))).alias("_h"),
        )
        win = (
            Window.partitionBy(id_col)
            .orderBy("_i")
            .rowsBetween(Window.currentRow, window - 1)
        )
        mins = grams.select(
            id_col, "_i", "_nw", F.min("_h").over(win).alias("fp")
        ).where(F.col("_i") <= F.col("_nw"))
        return mins.select(id_col, "fp").distinct()

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
    strategy: str = "explode",
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
        files, k=k, window=window, content_col=content_col, id_col=id_col,
        strategy=strategy,
    ).select(F.col(id_col).alias("id"), "fp").persist()
    # eager fill: persist alone is lazy, and FOUR independent subtrees
    # below (sizes, hot, and both join sides) otherwise race to compute
    # the sketch before the cache is populated — the sha256 k-gram pass,
    # the expensive stage, would run up to 4×. One count() materializes
    # it exactly once; everything downstream reads ids-only cached rows
    # (same fix class as dedup.py's band-frame persist, round 4).
    fps.count()

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
