"""DSIR — Data Selection via Importance Resampling (Xie et al., 2023).

Given a raw web-scale corpus and a (much smaller) target distribution —
"docs like these" — DSIR scores every raw document with an importance
log-weight under a hashed n-gram bag-of-features model:

    logw(doc) = sum over gram occurrences g of
                ln p_target(bucket(g)) - ln p_raw(bucket(g))

where ``bucket(g)`` hashes the gram into ``n_buckets`` slots and each
distribution is add-1 (Laplace) smoothed over the buckets. High-weight
documents look like the target; resampling by weight yields a pretrain
mixture aligned with it. This is the principled cousin of the heuristic
quality gates in ``textstats.py`` and slots between them and the
stratified sampler in ``mixture.py``.

The reference repo has no training-data surface; this is a Spark-native
extension in the training-data family (dedup / mixture / packing).

Determinism & oracle story: hashing is the repo-wide portable sha256
60-bit family, and the per-bucket log-ratio is quantized to integer
parts-per-million (``floor(ln(...)*1e6)``) BEFORE the per-document sum —
so the reduction is exact integer addition, immune to float summation
order across partitionings, engines, and cluster sizes. The DuckDB
oracle replays bucket counts, smoothing, quantization, and sum exactly.

Spark shape (scale notes for 100 TB):
- one map-side explode of (doc, bucket) pairs — no data is widened
  beyond gram-count × 8-byte bucket ids;
- the two distribution tables are ``groupBy(bucket)`` partial-agg
  shuffles bounded by ``n_buckets`` rows (default 10k) regardless of
  corpus size, then broadcast back — the only full-data shuffle is the
  final ``groupBy(doc_id)``;
- corpus totals ride a broadcast 1-row frame (no driver collect).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .mixture import _portable_hash60, ngrams_col
from .textstats import _tokens

SEP = "\x1f"


def _buckets(text_col: Column, *, n: int, n_buckets: int, seed: int) -> Column:
    grams = ngrams_col(_tokens(text_col), n)
    return F.transform(
        grams,
        lambda g: _portable_hash60(F.concat_ws(SEP, g, F.lit(str(seed))))
        % n_buckets,
    )


def dsir_log_weights(
    docs: DataFrame,
    *,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    n_buckets: int = 10_000,
    seed: int = 42,
) -> DataFrame:
    """docs + a boolean ``target`` column expression → one row per doc:
    (doc_id, n_feats, logw_ppm).

    ``target`` marks the rows that DEFINE the target distribution (they
    are scored too — DSIR scores the whole raw corpus, target rows
    included, matching the paper's raw ⊇ target framing). ``logw_ppm``
    is the importance log-weight in integer parts-per-million; docs with
    no features (under ``n`` tokens / NULL text) score 0.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        target.alias("is_target"),
        _buckets(F.col(text_col), n=n, n_buckets=n_buckets, seed=seed).alias(
            "bks"
        ),
    )
    feats = base.select(
        "doc_id", "is_target", F.explode("bks").alias("bucket")
    )

    raw_cnt = feats.groupBy("bucket").agg(F.count("*").alias("c_raw"))
    tgt_cnt = (
        feats.where("is_target")
        .groupBy("bucket")
        .agg(F.count("*").alias("c_tgt"))
    )
    totals = feats.agg(
        F.count("*").alias("t_raw"),
        F.sum(F.col("is_target").cast("long")).alias("t_tgt"),
    )

    # per-bucket quantized log-ratio; the ratio table is ≤ n_buckets rows
    # (buckets unseen in BOTH corpora contribute ln((1/Z_t)/(1/Z_r)) only
    # to grams that never occur — i.e. never), so only observed buckets
    # are materialized.
    ratio = (
        raw_cnt.join(tgt_cnt, "bucket", "left")
        .crossJoin(broadcast(totals))
        .select(
            "bucket",
            F.floor(
                (
                    F.log(F.coalesce(F.col("c_tgt"), F.lit(0)) + 1.0)
                    - F.log(F.col("t_tgt") + F.lit(float(n_buckets)))
                    - F.log(F.col("c_raw") + 1.0)
                    + F.log(F.col("t_raw") + F.lit(float(n_buckets)))
                )
                * 1e6
            )
            .cast("long")
            .alias("lr_ppm"),
        )
    )

    scored = (
        feats.join(broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feats"),
            F.sum("lr_ppm").alias("logw_ppm"),
        )
    )
    return (
        base.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).cast("int").alias("n_feats"),
            F.coalesce("logw_ppm", F.lit(0)).cast("long").alias("logw_ppm"),
        )
    )
