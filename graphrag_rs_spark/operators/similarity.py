"""Similarity search over embedding columns (array<float>).

Training-data-pipeline operators beyond the reference inventory (the
reference keeps embeddings in single-node vector stores, vector/*.rs —
surveyed as S7/out-of-scope). Two paths:

- brute-force cosine top-k: exact baseline. Higher-order array fns
  (zip_with + aggregate) keep the dot product JVM-side; the cross join is
  blocked per query batch. Correct at any scale where |queries| is small
  or |corpus| fits a broadcast; quadratic otherwise — use the LSH path.
- random-hyperplane LSH top-k: deterministic hyperplanes derived from
  xxhash64 (no RNG state), multi-table bucketing bounds candidates; exact
  re-rank inside buckets. The 100TB path: shuffle is bounded by bucket
  sizes, not n².
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_col(a, b):
    """Cosine similarity of two array<float/double> columns, JVM-side."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame | None = None,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """→ (query_id, neighbor_id, cosine, rank): exact top-k neighbors.

    Self-join mode when ``queries`` is None (excludes self-matches).
    The smaller side should be broadcast by the caller when applicable;
    AQE picks it up automatically at these sizes.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    q = (queries if queries is not None else corpus).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_col(F.col("qvec"), F.col("nvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _planes(dim: int, n_planes: int, table_idx: int, seed: int = 42):
    """Deterministic ±1 hyperplanes (Charikar sign-random projections only
    need iid signs). Derived from a seeded generator — stable across runs,
    executors, and partitionings."""
    rng = np.random.default_rng((seed, table_idx))
    return (rng.integers(0, 2, size=(n_planes, dim)) * 2 - 1).astype("float64")


def portable_planes(dim: int, n_planes: int, table_idx: int):
    """±1 hyperplanes from sha256 nibble parity — engine-portable.

    Any SQL engine with sha256 (or a driver that can precompute the same
    hashes) reproduces the exact matrix, so an external oracle can replay
    bucket assignment bit-for-bit. Used by the correctness harness; the
    production default stays the seeded-RNG family above."""
    import hashlib

    out = np.empty((n_planes, dim), dtype="float64")
    for p in range(n_planes):
        for d in range(dim):
            h = hashlib.sha256(f"lsh:{table_idx}:{p}:{d}".encode()).hexdigest()
            out[p, d] = 1.0 if int(h[0], 16) % 2 else -1.0
    return out


#: fixed-point scale for the portable projection: floor(x * 1e6) keeps every
#: term integer-valued, and a 64-dim dot of ±few-million values stays far
#: below 2^53 — float64 matmul is then EXACT in any summation order, so
#: numpy (BLAS, blocked) and a SQL engine (sequential fold) agree bit-for-bit.
PORTABLE_SCALE = 1_000_000.0


def make_lsh_bucket_udf(dim: int, n_planes: int, table_idx: int, plane_fn: str = "gaussian"):
    """Arrow-batched bucket assignment: one numpy matmul per batch.

    Dense projections are linear algebra — a vectorized UDF (BLAS matmul
    over the whole Arrow batch) beats thousands of per-plane Catalyst
    expressions by orders of magnitude; this is the documented exception
    where built-ins can't express the op efficiently."""
    if plane_fn == "portable":
        planes = portable_planes(dim, n_planes, table_idx)
    else:
        planes = _planes(dim, n_planes, table_idx)
    weights = (2 ** np.arange(n_planes)).astype("int64")
    portable = plane_fn == "portable"

    @F.pandas_udf(LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(v, dtype="float64") for v in vecs], dtype="float64")
        if m.size == 0:
            return pd.Series([], dtype="int64")
        if portable:
            m = np.floor(m * PORTABLE_SCALE)
        signs = (m @ planes.T) >= 0
        return pd.Series(signs @ weights, dtype="int64")

    return bucket


def cosine_topk_lsh(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    n_tables: int = 4,
    plane_fn: str = "gaussian",
) -> DataFrame:
    """Approximate self-ANN: candidates share an LSH bucket in ≥1 of
    ``n_tables`` tables; exact cosine re-rank within candidates.

    Recall grows with n_tables, cost with bucket collision rates — both
    deterministic here (hash-derived planes). ``plane_fn="portable"``
    switches to the sha256 plane family + fixed-point projection so an
    external SQL oracle can replay bucketing exactly."""
    base = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    tables = []
    for t in range(n_tables):
        udf = make_lsh_bucket_udf(dim, n_planes, t, plane_fn=plane_fn)
        tables.append(
            base.select(
                "id", "vec",
                F.lit(t).alias("table"),
                udf(F.col("vec")).alias("bucket"),
            )
        )
    buckets = tables[0]
    for t in tables[1:]:
        buckets = buckets.unionByName(t)

    a = buckets.select("table", "bucket", F.col("id").alias("query_id"), F.col("vec").alias("qvec"))
    b = buckets.select("table", "bucket", F.col("id").alias("neighbor_id"), F.col("vec").alias("nvec"))
    cand = (
        a.join(b, ["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn("cosine", cosine_col(F.col("qvec"), F.col("nvec")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_cosine_duplicates(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 10,
    n_tables: int = 6,
    plane_fn: str = "gaussian",
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold (LSH-blocked,
    exact-verified) — the embedding leg of the dedup family."""
    topk = cosine_topk_lsh(
        corpus, id_col=id_col, vec_col=vec_col, dim=dim,
        k=50, n_planes=n_planes, n_tables=n_tables, plane_fn=plane_fn,
    )
    return (
        topk.where((F.col("cosine") >= threshold) & (F.col("query_id") < F.col("neighbor_id")))
        .select(
            F.col("query_id").alias("id_a"),
            F.col("neighbor_id").alias("id_b"),
            F.col("cosine"),
        )
    )
