"""Similarity search over embedding columns (array<float>).

Training-data-pipeline operators beyond the reference inventory (the
reference keeps embeddings in single-node vector stores, vector/*.rs —
surveyed as S7/out-of-scope). Three paths:

- brute-force cosine top-k: exact baseline. Higher-order array fns
  (zip_with + aggregate) keep the dot product JVM-side; the cross join is
  blocked per query batch. Correct at any scale where |queries| is small
  or |corpus| fits a broadcast; quadratic otherwise — use the LSH path.
- random-hyperplane LSH top-k: deterministic hyperplanes derived from
  xxhash64 (no RNG state), multi-table bucketing bounds candidates; exact
  re-rank inside buckets. The 100TB path: shuffle is bounded by bucket
  sizes, not n².
- IVF top-k: integer-exact k-means coarse quantizer (Lloyd's over
  fixed-point vectors — engine-reproducible training), n_probe bucket
  search, exact cosine re-rank. The second scale path: best when the
  corpus is clustered; provably equals brute force at n_probe=K.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from graphrag_rs_spark.session import request_arrow_batch_rows


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


def _make_cosine_pair_udf(single_precision_products: bool):
    """Arrow-batched pairwise cosine, bit-identical to ``cosine_col``.

    The SQL fold multiplies per element (in the ARRAY's precision: float32
    products for array<float>, float64 for array<double>) and accumulates
    into a float64 ``acc + v`` chain in index order. The numpy kernel
    reproduces both exactly: products in the matching dtype, then a
    column-by-column float64 accumulation — same op, same order, same
    rounding. This replaces the interpreted higher-order-function
    evaluator on the candidate re-rank hot path (measured ~30× per
    element; see cosine_topk_bruteforce for the same finding)."""
    fdt = "float32" if single_precision_products else "float64"

    @F.pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.array(list(a), dtype=fdt)
        B = np.array(list(b), dtype=fdt)
        if A.size == 0:
            return pd.Series([], dtype="float64")
        P = A * B
        A2 = A * A
        B2 = B * B
        dot = np.zeros(len(A))
        na = np.zeros(len(A))
        nb = np.zeros(len(A))
        for i in range(A.shape[1]):
            dot += P[:, i]
            na += A2[:, i]
            nb += B2[:, i]
        return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))

    return cos


def _make_id_pair_scorer(ids, vecs, single_precision_products: bool):
    """Arrow-batched cosine for (query_id, neighbor_id) pairs against a
    task-local matrix of the collected corpus — candidates shuffle two
    ids per pair instead of two dim-length vectors. Float semantics match
    ``cosine_col`` exactly: products in the array's precision, float64
    column-order accumulation (see _make_cosine_pair_udf)."""
    fdt = "float32" if single_precision_products else "float64"
    M = np.array(list(vecs), dtype=fdt)
    n, dim = M.shape if len(vecs) else (0, 0)
    M2 = M * M
    norm = np.zeros(n)
    for i in range(dim):
        norm += M2[:, i]
    norm = np.sqrt(norm)
    index = {v: j for j, v in enumerate(ids)}

    @F.pandas_udf("double")
    def score(qid: pd.Series, nid: pd.Series) -> pd.Series:
        if qid.empty:
            return pd.Series([], dtype="float64")
        qi = qid.map(index).to_numpy(dtype="int64")
        ni = nid.map(index).to_numpy(dtype="int64")
        A = M[qi]
        B = M[ni]
        P = A * B
        dot = np.zeros(len(qi))
        for i in range(dim):
            dot += P[:, i]
        return pd.Series(dot / (norm[qi] * norm[ni]))

    return score


def _cosine_pair_expr(frame: DataFrame, a: str, b: str):
    """Vectorized pair cosine when both columns are same-precision float
    arrays; falls back to the interpreted fold on mixed/exotic types."""
    from pyspark.sql.types import ArrayType, DoubleType, FloatType

    ta = frame.schema[a].dataType
    tb = frame.schema[b].dataType
    if (
        isinstance(ta, ArrayType)
        and isinstance(tb, ArrayType)
        and ta.elementType == tb.elementType
        and isinstance(ta.elementType, (DoubleType, FloatType))
    ):
        udf = _make_cosine_pair_udf(isinstance(ta.elementType, FloatType))
        return udf(F.col(a), F.col(b))
    return cosine_col(F.col(a), F.col(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame | None = None,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    broadcast_rows: int = 50_000,
) -> DataFrame:
    """→ (query_id, neighbor_id, cosine, rank): exact top-k neighbors.

    Self-join mode when ``queries`` is None (excludes self-matches).

    Physical plan: when the corpus fits in ``broadcast_rows`` it is
    collected once and shipped to every task inside an Arrow-batched
    mapInPandas over the QUERY side — the classic broadcast-matmul
    brute-force shape (corpus small, queries unbounded), which is also
    what survives 100 TB: queries stream, nothing shuffles. The numpy
    kernel accumulates dot products and squared norms COLUMN BY COLUMN,
    i.e. in exactly the float64 operation order of the SQL fold
    ``acc + x*y`` (`_dot`/`_norm`), so the cosines are bit-identical to
    the join formulation and to the DuckDB oracle — measured 61.6 s →
    ~2 s at sf0.1 for the 2000×2000 self-join (the interpreted HOF
    evaluator costs ~30× on per-element lambdas). Corpora larger than
    ``broadcast_rows`` fall back to the crossJoin formulation, whose
    smaller side AQE broadcasts at these sizes.
    """
    head = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    ).limit(broadcast_rows + 1).collect()
    if len(head) <= broadcast_rows:
        return _bruteforce_broadcast(
            head,
            queries if queries is not None else corpus,
            id_col=id_col, vec_col=vec_col, k=k,
        )

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


def _bruteforce_broadcast(
    corpus_rows, queries: DataFrame, *, id_col, vec_col, k
) -> DataFrame:
    """Broadcast-corpus exact top-k: numpy columnwise accumulation keeps
    every float64 add/mul in the SQL fold's order (see caller)."""
    # UDF input rows are one id + one dim-length vector: raise the Arrow
    # batch bound off the blob-safe session default (session.py)
    request_arrow_batch_rows(queries.sparkSession, 16384)
    ids = [r["neighbor_id"] for r in corpus_rows]
    C = np.array([r["nvec"] for r in corpus_rows], dtype="float64")
    nc, dim = C.shape if len(corpus_rows) else (0, 0)
    cnorm = np.zeros(nc)
    for i in range(dim):
        cnorm += C[:, i] * C[:, i]
    cnorm = np.sqrt(cnorm)
    ids_arr = np.array(ids)

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    id_type = q.schema["query_id"].dataType.simpleString()
    out_schema = (
        f"query_id {id_type}, neighbor_id {id_type}, "
        "cosine double, rank int"
    )
    # cap the dense block so D stays ~tens of MB regardless of corpus size
    block = max(1, int(2e7 / max(nc, 1)))

    def run(batches):
        for pdf in batches:
            if pdf.empty or nc == 0:
                yield pd.DataFrame(
                    {"query_id": [], "neighbor_id": [], "cosine": [],
                     "rank": []}
                )
                continue
            out_q, out_n, out_c, out_r = [], [], [], []
            for lo in range(0, len(pdf), block):
                sub = pdf.iloc[lo:lo + block]
                Q = np.array(list(sub["qvec"]), dtype="float64")
                qn = np.zeros(len(sub))
                D = np.zeros((len(sub), nc))
                for i in range(dim):
                    qn += Q[:, i] * Q[:, i]
                    D += Q[:, i:i + 1] * C[None, :, i]
                qn = np.sqrt(qn)
                cos = D / (qn[:, None] * cnorm[None, :])
                for r, qid in enumerate(sub["query_id"]):
                    row = cos[r]
                    # Spark's desc sort puts NaN FIRST; map to +inf keys
                    key = np.where(np.isnan(row), np.inf, row)
                    order = np.lexsort((ids_arr, -key))
                    taken = 0
                    for j in order:
                        # both formulations exclude id-equal matches
                        # (self in self-mode; same row when queries ⊆
                        # corpus), matching the join's query_id !=
                        # neighbor_id predicate
                        if ids[j] == qid:
                            continue
                        taken += 1
                        out_q.append(qid)
                        out_n.append(ids[j])
                        out_c.append(float(row[j]))
                        out_r.append(taken)
                        if taken >= k:
                            break
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n,
                 "cosine": out_c, "rank": out_r}
            )

    return q.mapInPandas(run, schema=out_schema)


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
    # UDF rows here are at most two dim-length vectors wide
    request_arrow_batch_rows(corpus.sparkSession, 16384)
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
    cand = a.join(b, ["table", "bucket"]).where(
        F.col("query_id") != F.col("neighbor_id")
    )
    # score BEFORE the pair dedup: cosine is a function of the pair, so
    # every multi-table copy scores identically and the distinct set is
    # unchanged — the dedup Exchange then carries (ids, cosine) instead
    # of both dim-length vectors
    scored = (
        cand.withColumn("cosine", _cosine_pair_expr(cand, "qvec", "nvec"))
        .select("query_id", "neighbor_id", "cosine")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _int_vec(vec_col):
    """Fixed-point image of an embedding: floor(x * 1e6) as long — the
    engine-portable integer domain (same family as the LSH oracle)."""
    return F.transform(
        vec_col, lambda x: F.floor(x.cast("double") * PORTABLE_SCALE).cast("long")
    )


def _sqdist_to(ivec_col, centroid: list[int]):
    """Exact integer squared euclidean distance to a literal centroid
    (in-row fold: order-independent, identical in any engine)."""
    lit = F.lit([int(v) for v in centroid]).cast("array<bigint>")
    return F.aggregate(
        F.zip_with(ivec_col, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _lit_vecs(vecs: list[list[int]]):
    """Nested literal array<array<long>> of integer vectors.

    ONE Literal node (F.lit accepts nested lists since Spark 3.4), not a
    CreateArray tree of k·dim element literals: the per-element tree made
    every Catalyst rule batch walk thousands of nodes, which put ~2.5 s of
    pure driver planning on EVERY fresh ANN query DataFrame (measured on
    the IVFPQ query at sf0.1: fresh-plan wall 4.3 s vs 1.7 s re-executing
    an already-planned frame; the single-literal form plans in ~0.1 s).
    Values and types are unchanged (same ints, cast to long)."""
    return F.lit([[int(v) for v in c] for c in vecs]).cast(
        "array<array<bigint>>"
    )


def _centroid_dists(ivec_col, centroids: list[list[int]]):
    """Array of (squared-distance, centroid-index) structs; array_min /
    array_sort over it break ties toward the smaller index.

    Built as ONE transform lambda over a literal centroid matrix, not K
    unrolled per-centroid folds: the unrolled form made Catalyst compile
    K independent aggregate/zip_with trees per call site — with 8×64
    centroids the janino compile dominated wall time (measured 38 → 11 s
    for the IVFPQ query at sf0.01, identical results)."""
    return F.transform(
        _lit_vecs(centroids),
        lambda c, j: F.struct(
            F.aggregate(
                F.zip_with(ivec_col, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("d"),
            j.cast("int").alias("j"),
        ),
    )


def _collect_ivecs_sorted(
    corpus: DataFrame, id_col: str, vec_col: str, collect_threshold: int
):
    """Fixed-point vectors sorted by id, collected to the driver when
    the corpus fits under ``collect_threshold`` rows — else None.

    The float→int floor runs SPARK-side (one collect of the already-
    quantized image), so exactly one engine performs the only float op;
    everything after is integer. Only id ORDER matters (the Lloyd init
    takes the lowest-id vectors), so the driver path is restricted to
    numeric id columns where Python and Spark ordering provably agree
    (the JP-coloring ASCII guard class)."""
    from pyspark.sql import types as T

    if not isinstance(
        corpus.schema[id_col].dataType,
        (T.LongType, T.IntegerType, T.ShortType, T.ByteType),
    ):
        return None
    probe = corpus.limit(collect_threshold + 1).count()
    if probe > collect_threshold:
        return None
    # Arrow transfer (toPandas), not row-wise collect: py4j pickling of
    # dim-length array rows was the dominant cost of the small-path
    # training collect
    pdf = corpus.select(
        F.col(id_col).alias("id"), _int_vec(F.col(vec_col)).alias("ivec")
    ).toPandas()
    pdf = pdf.sort_values("id", kind="stable")
    return [list(v) for v in pdf["ivec"]]


def _lloyd_local(
    vecs: list, init: list, n_iters: int
) -> list[list[int]]:
    """Exact integer Lloyd rounds on the driver, replicating the
    distributed recurrence bit-for-bit: integer squared distances,
    argmin ties to the smallest index, update = floor(sum / count) with
    the same float division (sums ≪ 2^53 — engine-exact), empty
    clusters persist."""
    import math

    import numpy as np

    X = np.array(vecs, dtype=np.int64)
    cents = [list(c) for c in init]
    for _ in range(n_iters):
        C = np.array(cents, dtype=np.int64)
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        new = [list(c) for c in cents]
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                s = X[mask].sum(axis=0)
                n = int(mask.sum())
                new[c] = [math.floor(int(sv) / n) for sv in s]
        cents = new
    return cents


def train_ivf_centroids(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    n_iters: int = 2,
    collect_threshold: int = 100_000,
) -> list[list[int]]:
    """Lloyd's k-means coarse quantizer in EXACT integer arithmetic.

    Every step is engine-reproducible: fixed-point vectors, integer
    squared distances (ties -> smaller centroid index), centroid update =
    floor(sum/count) — so an external SQL oracle replays training
    bit-for-bit. Init = the ``n_centroids`` lowest-id vectors.

    Per iteration: one map-only assignment pass + one (centroid, dim)
    integer-sum aggregation; only the K x dim model state (a few KB)
    crosses to the driver — the classic IVF training shape, scale-bounded
    by the corpus scan.
    """
    import math

    ivecs = _collect_ivecs_sorted(corpus, id_col, vec_col, collect_threshold)
    if ivecs:
        return _lloyd_local(ivecs, ivecs[:n_centroids], n_iters)
    base = corpus.select(
        F.col(id_col).alias("id"), _int_vec(F.col(vec_col)).alias("ivec")
    )
    init = base.orderBy("id").limit(n_centroids).select("ivec").collect()
    centroids = [list(r["ivec"]) for r in init]
    for _ in range(n_iters):
        # assignment is projected BEFORE the explode: posexplode emits 64
        # rows per vector, and an assignment expression living in the same
        # projection as the generator is re-evaluated once per EMITTED row
        # — 64× the work (measured 24 s → 1.4 s at sf0.1 for this split;
        # Generate keeps its child's columns, so the two-step plan
        # evaluates the distance fold exactly once per vector)
        assigned = base.select(
            F.array_min(_centroid_dists(F.col("ivec"), centroids))["j"].alias("c"),
            "ivec",
        ).select("c", F.posexplode("ivec").alias("pos", "val"))
        upd = (
            assigned.groupBy("c", "pos")
            .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new = [list(c) for c in centroids]
        for r in upd:
            # floor of double division == SQL floor(CAST(s AS DOUBLE)/n):
            # sums stay far below 2^53 so the division is engine-exact
            new[r["c"]][r["pos"]] = math.floor(r["s"] / r["n"])
        centroids = new  # empty clusters keep their previous centroid
    return centroids


def cosine_topk_ivf(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    n_iters: int = 2,
    centroids: list[list[int]] | None = None,
    broadcast_rows: int = 50_000,
) -> DataFrame:
    """IVF approximate self-ANN: k-means coarse quantizer, each vector
    indexed under its nearest centroid, each query probing its ``n_probe``
    nearest centroid buckets; exact cosine re-rank within candidates.

    The second scale path next to ``cosine_topk_lsh``: candidate count is
    bounded by the probed buckets (~ n_probe/n_centroids of the corpus per
    query instead of n²), the bucket join shuffles on centroid id, and at
    ``n_probe == n_centroids`` the result provably equals the brute-force
    top-k (every member bucket is probed). All quantizer arithmetic is
    exact integer math, so results are deterministic and replayable by a
    SQL oracle.
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, id_col=id_col, vec_col=vec_col,
            n_centroids=n_centroids, n_iters=n_iters,
        )
    from pyspark.sql.types import ArrayType, FloatType

    vec_type = corpus.schema[vec_col].dataType
    head = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .limit(broadcast_rows + 1)
        .collect()
    )
    # empty corpora route to the (trivially empty) distributed plan — the
    # numpy replay below would index a 0-d matrix
    small = 0 < len(head) <= broadcast_rows

    if small:
        # corpora under the broadcast bound run the whole bucket search
        # partition-locally: each task holds the collected matrix, so a
        # query row expands to its probed buckets, scores, and top-k cut
        # WITHOUT materializing the ~n·n_probe/n_centroids·n candidate
        # rows through a join + ArrowEvalPython + window exchange (the
        # prior id-pair scorer shipped ~25 M pair rows across the Python
        # boundary at sf0.1 and re-sorted them in a window — measured
        # 6.4 s → ~1.5 s end-to-end for ann_ivf_topk). Quantizer math is
        # replayed in int64 numpy (bit-exact: same floor/fixed-point
        # image, argmin/stable-argsort == array_min/array_sort (d, j)
        # tie-breaks) and cosine keeps _make_id_pair_scorer's float
        # semantics exactly: products in the array's precision, float64
        # column-order accumulation, scalar·array norm product.
        from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

        single = (
            isinstance(vec_type, ArrayType)
            and isinstance(vec_type.elementType, FloatType)
        )
        ids = [r["id"] for r in head]
        fdt = "float32" if single else "float64"
        M = np.array([r["vec"] for r in head], dtype=fdt)
        n, mdim = M.shape if len(head) else (0, 0)
        M2 = M * M
        norm = np.zeros(n)
        for i in range(mdim):
            norm += M2[:, i]
        norm = np.sqrt(norm)
        small = bool(np.isfinite(M).all() and (norm > 0.0).all())
    if small:
        # degenerate inputs (zero/non-finite vectors → NaN cosines) stay
        # on the distributed plan: Spark's window ranks NaN as the
        # largest double while numpy sorts it last — the replay would
        # diverge from the distributed result exactly there
        index = {v: j for j, v in enumerate(ids)}
        cen = np.asarray(centroids, dtype=np.int64)
        ivec = np.floor(M.astype(np.float64) * 1_000_000.0).astype(np.int64)
        dmat = ((ivec[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
        c_all = np.argmin(dmat, axis=1)
        probe_all = np.argsort(dmat, axis=1, kind="stable")[:, :n_probe]
        buckets = {
            b: np.nonzero(c_all == b)[0] for b in range(len(centroids))
        }
        ids_np = np.asarray(ids)
        id_type = corpus.schema[id_col].dataType
        out_schema = StructType(
            [
                StructField("query_id", id_type),
                StructField("neighbor_id", id_type),
                StructField("cosine", DoubleType()),
                StructField("rank", IntegerType()),
            ]
        )

        def _topk_batches(batches):
            for pdf in batches:
                q_ids, n_ids, cosines, ranks = [], [], [], []
                for qv in pdf["id"]:
                    qi = index.get(qv)
                    if qi is None:
                        continue
                    cand = np.concatenate(
                        [buckets[int(b)] for b in probe_all[qi]]
                    )
                    cand = cand[cand != qi]
                    if not len(cand):
                        continue
                    P = M[qi] * M[cand]
                    dot = np.zeros(len(cand))
                    for i in range(mdim):
                        dot += P[:, i]
                    cos = dot / (norm[qi] * norm[cand])
                    nid = ids_np[cand]
                    if nid.dtype == object:
                        order = sorted(
                            range(len(cand)), key=lambda j: (-cos[j], nid[j])
                        )[:k]
                        order = np.asarray(order, dtype=np.int64)
                    else:
                        order = np.lexsort((nid, -cos))[:k]
                    q_ids.extend([qv] * len(order))
                    n_ids.extend(nid[order].tolist())
                    cosines.extend(cos[order].tolist())
                    ranks.extend(range(1, len(order) + 1))
                yield pd.DataFrame(
                    {
                        "query_id": q_ids,
                        "neighbor_id": n_ids,
                        "cosine": cosines,
                        "rank": ranks,
                    }
                )

        # input rows are a single id column — large Arrow batches are safe
        request_arrow_batch_rows(corpus.sparkSession, 65536)
        return corpus.select(F.col(id_col).alias("id")).mapInPandas(
            _topk_batches, out_schema
        )

    base = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _int_vec(F.col(vec_col)).alias("ivec"),
    )
    dists = _centroid_dists(F.col("ivec"), centroids)
    members = base.select(
        F.col("id").alias("neighbor_id"),
        F.col("vec").alias("nvec"),
        F.array_min(dists)["j"].alias("c"),
    )
    probes = base.select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.explode(F.slice(F.array_sort(dists), 1, n_probe)).alias("p"),
    ).select("query_id", "qvec", F.col("p.j").alias("c"))
    # each member lives in exactly one bucket and probes are distinct
    # buckets, so a candidate pair appears at most once — no dedup pass
    cand = probes.join(members, "c").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.withColumn(
        "cosine", _cosine_pair_expr(cand, "qvec", "nvec")
    )
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


def quantize_embeddings(
    df: DataFrame, *, vec_col: str = "embedding"
) -> DataFrame:
    """Append symmetric int8 scalar quantization per vector:
    ``qvec`` (array<int>, each in [-127, 127]) and ``qscale``
    (max|v|/127) — dequantize as ``q * qscale``.

    At 10^11-vector scale the embedding column dominates every ANN
    shuffle; int8 symmetric quantization cuts that traffic ~4× while
    keeping cosine rankings (dequantization error per element is bounded
    by one scale step).  This is the compression step IVF/LSH pipelines
    run before bucketing — quantize once, ship ``qvec`` everywhere, keep
    the float vector only for the final exact re-rank.

    Determinism contract: everything is computed in IEEE doubles with
    single-rounded ops (cast → multiply by 127.0 → divide by max|v| →
    floor), so any engine replays it bit-exactly: the max element maps
    to exactly ±127 (the ×127 product of a float-origin double is exact,
    so the division yields exactly 127.0), and ``floor`` avoids
    rounding-mode divergence between engines.  Zero vectors quantize to
    all-zero with scale 0.  Map-only, zero shuffles.
    """
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    maxabs = F.coalesce(F.array_max(F.transform(vd, F.abs)), F.lit(0.0))
    q = F.when(
        maxabs == 0, F.transform(vd, lambda x: F.lit(0).cast("int"))
    ).otherwise(
        F.transform(vd, lambda x: F.floor(x * F.lit(127.0) / maxabs).cast("int"))
    )
    return df.withColumn("qvec", q).withColumn(
        "qscale", maxabs / F.lit(127.0)
    )


def cosine_topk_quantized(
    corpus: DataFrame,
    queries: DataFrame | None = None,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_candidates: int = 20,
) -> DataFrame:
    """Two-stage ANN: int8 quantized dot-product candidate generation +
    exact float cosine re-rank → (query_id, neighbor_id, cosine, rank).

    The production pattern behind ``quantize_embeddings``: ship the 4×
    smaller ``qvec`` through the scoring fan-out, keep only
    ``n_candidates`` per query by integer dot product, then re-rank just
    those with the exact double cosine.  The candidate stage is
    INTEGER-exact — products of int8s summed into a long — so unlike
    float scoring it is order-independent and any engine replays the
    candidate set identically; only the tiny re-rank touches floats.

    The candidate scan here is the broadcast brute-force shape (query
    side broadcast, corpus streamed — same rationale as
    ``cosine_topk_bruteforce``); at bucketed scale run LSH/IVF candidate
    generation instead and keep this operator's re-rank contract.
    Self-pairs are excluded.
    """
    from pyspark.sql import Window

    base_q = queries if queries is not None else corpus
    cq = quantize_embeddings(corpus, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_nvec"),
        F.col("qvec").alias("_nq"),
    )
    qq = quantize_embeddings(base_q, vec_col=vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.col("qvec").alias("_qq"),
    )
    idot = F.aggregate(
        F.zip_with("_qq", "_nq", lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    w_cand = Window.partitionBy("query_id").orderBy(
        F.desc("idot"), F.asc("neighbor_id")
    )
    cand = (
        cq.crossJoin(F.broadcast(qq))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("idot", idot)
        .withColumn("_crank", F.row_number().over(w_cand))
        .where(F.col("_crank") <= int(n_candidates))
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("cosine", cosine_col(F.col("_qvec"), F.col("_nvec")))
        .withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= int(k))
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def train_pq_codebooks(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    n_subspaces: int = 4,
    n_centroids: int = 8,
    n_iters: int = 2,
) -> list[list[list[int]]]:
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search" §II): the vector is split
    into ``n_subspaces`` contiguous slices and each slice gets its own
    k-means codebook, trained with the same exact-integer Lloyd's as the
    IVF coarse quantizer (fixed-point sub-vectors, integer squared
    distances, ties to the smaller index, floor(sum/count) updates,
    init = the n_centroids lowest-id vectors) — fully replayable by a
    SQL oracle.

    Returns codebooks[s][j] = centroid j of subspace s (length dim/m
    integer vectors). Cost: n_subspaces independent trainings, each a
    corpus scan + (centroid, dim/m) partial agg per iteration; model
    state crossing the driver is m·k·(dim/m) = k·dim ints total.
    """
    import math

    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    d_sub = dim // n_subspaces
    base = corpus.select(
        F.col(id_col).alias("id"), _int_vec(F.col(vec_col)).alias("ivec")
    )
    init = base.orderBy("id").limit(n_centroids).select("ivec").collect()
    books = [
        [list(r["ivec"])[s * d_sub:(s + 1) * d_sub] for r in init]
        for s in range(n_subspaces)
    ]
    # ALL subspaces train in one pass family per iteration (not m
    # sequential trainings): one staged projection assigns every
    # subspace's nearest centroid, one posexplode+partial-agg sums per
    # (subspace, centroid, dim) — m× fewer jobs, same exact-integer
    # Lloyd semantics per subspace (measured 16.5 → ~8 s warm at
    # sf0.01 for the IVFPQ query).
    for _ in range(n_iters):
        cs = F.array(
            *[
                F.array_min(
                    _centroid_dists(
                        F.slice(F.col("ivec"), s * d_sub + 1, d_sub), books[s]
                    )
                )["j"]
                for s in range(n_subspaces)
            ]
        )
        # assignments staged BEFORE the generator — same re-evaluation
        # trap as train_ivf_centroids (Generate re-runs its child's
        # expressions once per emitted row)
        staged = base.select(cs.alias("cs"), "ivec")
        ex = staged.select("cs", F.posexplode("ivec").alias("pos", "val")).select(
            F.floor(F.col("pos") / d_sub).cast("int").alias("s"),
            (F.col("pos") % d_sub).alias("pos_in"),
            F.element_at("cs", F.floor(F.col("pos") / d_sub).cast("int") + 1).alias("c"),
            "val",
        )
        upd = (
            ex.groupBy("s", "c", "pos_in")
            .agg(F.sum("val").alias("sum"), F.count("*").alias("n"))
            .collect()
        )
        new = [[list(c) for c in b] for b in books]
        for r in upd:
            new[r["s"]][r["c"]][r["pos_in"]] = math.floor(r["sum"] / r["n"])
        books = new  # empty clusters keep their previous centroid
    return books


def _train_ivfpq_joint(
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    dim: int,
    n_centroids: int,
    n_iters: int,
    n_subspaces: int,
    pq_centroids: int,
    collect_threshold: int = 100_000,
) -> tuple[list[list[int]], list[list[list[int]]]]:
    """Coarse quantizer + PQ codebooks trained in ONE pass family.

    Identical Lloyd recurrences to :func:`train_ivf_centroids` /
    :func:`train_pq_codebooks` run separately (the assignments of each
    quantizer never feed the other, so co-scheduling changes nothing),
    but every iteration is a single job: one staged projection computes
    the coarse assignment AND all subspace assignments, one
    posexplode emits each element once under its coarse group (grp 0)
    and once under its subspace group (grp 1+s), one partial-agg
    groupBy sums both. 2×dim rows per vector per iteration instead of
    (1 + n_subspaces) sequential corpus scans — the driver still only
    ever sees the k·dim-int model state.
    """
    import math

    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    d_sub = dim // n_subspaces
    ivecs = _collect_ivecs_sorted(
        corpus, id_col, vec_col, collect_threshold
    )
    if ivecs:
        # driver path (bit-exact — see _lloyd_local): the coarse and
        # subspace quantizers never feed each other, so running them as
        # separate local Lloyd loops equals the co-scheduled job exactly
        coarse_l = _lloyd_local(ivecs, ivecs[:n_centroids], n_iters)
        books_l = [
            _lloyd_local(
                [v[s * d_sub:(s + 1) * d_sub] for v in ivecs],
                [v[s * d_sub:(s + 1) * d_sub] for v in ivecs[:pq_centroids]],
                n_iters,
            )
            for s in range(n_subspaces)
        ]
        return coarse_l, books_l
    base = corpus.select(
        F.col(id_col).alias("id"), _int_vec(F.col(vec_col)).alias("ivec")
    )
    n_init = max(n_centroids, pq_centroids)
    init = base.orderBy("id").limit(n_init).select("ivec").collect()
    coarse = [list(r["ivec"]) for r in init[:n_centroids]]
    books = [
        [list(r["ivec"])[s * d_sub:(s + 1) * d_sub] for r in init[:pq_centroids]]
        for s in range(n_subspaces)
    ]
    for _ in range(n_iters):
        cs = F.array(
            F.array_min(_centroid_dists(F.col("ivec"), coarse))["j"],
            *[
                F.array_min(
                    _centroid_dists(
                        F.slice(F.col("ivec"), s * d_sub + 1, d_sub), books[s]
                    )
                )["j"]
                for s in range(n_subspaces)
            ],
        )
        staged = base.select(cs.alias("cs"), "ivec")
        ex = (
            staged.select("cs", F.posexplode("ivec").alias("pos", "val"))
            .select(
                F.explode(
                    F.array(
                        F.struct(
                            F.lit(0).alias("grp"),
                            F.col("pos").alias("pos_in"),
                            F.element_at("cs", 1).alias("c"),
                        ),
                        F.struct(
                            (1 + F.floor(F.col("pos") / d_sub)).cast("int").alias("grp"),
                            (F.col("pos") % d_sub).alias("pos_in"),
                            F.element_at(
                                "cs",
                                F.floor(F.col("pos") / d_sub).cast("int") + 2,
                            ).alias("c"),
                        ),
                    )
                ).alias("g"),
                F.col("val"),
            )
            .select("g.grp", "g.c", "g.pos_in", "val")
        )
        upd = (
            ex.groupBy("grp", "c", "pos_in")
            .agg(F.sum("val").alias("sum"), F.count("*").alias("n"))
            .collect()
        )
        new_coarse = [list(c) for c in coarse]
        new_books = [[list(c) for c in b] for b in books]
        for r in upd:
            v = math.floor(r["sum"] / r["n"])
            if r["grp"] == 0:
                new_coarse[r["c"]][r["pos_in"]] = v
            else:
                new_books[r["grp"] - 1][r["c"]][r["pos_in"]] = v
        coarse, books = new_coarse, new_books  # empty clusters persist
    return coarse, books


def cosine_topk_ivfpq(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    n_iters: int = 2,
    n_subspaces: int = 4,
    pq_centroids: int = 8,
    refine: int = 0,
    model: tuple[list[list[int]], list[list[list[int]]]] | None = None,
) -> DataFrame:
    """IVF-PQ approximate self-ANN → (query_id, neighbor_id, adc_sqdist,
    rank), or with ``refine`` = R > 0 an exact-cosine re-rank of the
    k·R-deep ADC shortlist → (query_id, neighbor_id, cosine, rank): IVF coarse buckets prune candidates, PQ codes score them via
    asymmetric distance computation (ADC) — the query keeps its exact
    (fixed-point) sub-vectors, each candidate is represented ONLY by its
    m subspace codes, and the approximate distance is the sum of m
    table lookups.

    This is the memory-bound large-scale ANN shape (FAISS IVFPQ): the
    candidate join ships m small ints per corpus vector instead of dim
    floats, and the per-query distance table (m × k_pq longs) rides the
    query row. Everything is integer arithmetic end-to-end —
    ``adc_sqdist`` is exact given the codes, so any SQL engine replays
    the output bit-for-bit (no float rounding anywhere). Residual
    encoding (IVFPQ's optional refinement) is deliberately omitted: raw
    sub-vector codes keep the quantizer engine-portable.

    Scale: one training pass family (driver holds k·dim ints), one
    map-only encode pass, a bucket equi-join on the coarse centroid id
    (bounded by n_probe/n_centroids of the corpus per query), one
    window top-k. Ties break (adc_sqdist ASC, neighbor_id ASC).
    """
    d_sub = dim // n_subspaces
    if model is None:
        # `model` lets callers reuse one trained (coarse, books) pair
        # across variants (ADC-only + refined) — training is the fixed
        # cost; pass the result of _train_ivfpq_joint back in
        model = _train_ivfpq_joint(
            corpus, id_col=id_col, vec_col=vec_col, dim=dim,
            n_centroids=n_centroids, n_iters=n_iters,
            n_subspaces=n_subspaces, pq_centroids=pq_centroids,
        )
    coarse, books = model

    # Encode pass as ONE vectorized numpy pandas UDF (guide: hand whole
    # batches to native code) instead of ~12 interpreted transform/
    # aggregate lambda trees over literal codebooks. Two wins, both
    # measured at sf0.1: the lambda forest put ~1 s of Catalyst planning
    # on every fresh query DataFrame and evaluated interpreted per row;
    # the numpy form plans in ~0.1 s and encodes each Arrow batch with
    # four matrix ops. Integer arithmetic is bit-identical: fixed-point
    # floor(double·1e6) as int64, squared distances summed in int64
    # (numpy wraps like Java long), argmin/stable-argsort reproduce the
    # array_min/array_sort (d, j) lexicographic tie-breaks.
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType, IntegerType, LongType, StructField, StructType,
    )

    # dim-length float vectors per input row — the 16384 bound every
    # other vector-input UDF in this file uses (NB session conf is
    # last-writer-wins at action time, so this single call also governs
    # the refine branch's pair-cosine UDF below)
    request_arrow_batch_rows(corpus.sparkSession, 16384)
    coarse_np = np.asarray(coarse, dtype=np.int64)
    books_np = [np.asarray(b, dtype=np.int64) for b in books]
    m = n_subspaces
    enc_schema = StructType(
        [StructField("c", ArrayType(IntegerType()))]
        + [StructField(f"code{s}", IntegerType()) for s in range(m)]
        + [StructField(f"qt{s}", ArrayType(LongType())) for s in range(m)]
    )

    @F.pandas_udf(enc_schema)
    def _encode(vecs: pd.Series) -> pd.DataFrame:
        valid = vecs.notna()
        n_rows = len(vecs)
        out: dict = {}
        if valid.any():
            V = np.stack(vecs[valid].to_numpy())
            ivec = np.floor(V.astype(np.float64) * 1_000_000.0).astype(np.int64)
            cd = ((ivec[:, None, :] - coarse_np[None, :, :]) ** 2).sum(axis=2)
            # argsort(kind=stable) == array_sort on (d, j) structs: equal
            # distances order by centroid index
            order = np.argsort(cd, axis=1, kind="stable")[:, :n_probe]
            probes_v = order.astype(np.int32)
            codes_v, qts_v = [], []
            for s in range(m):
                sub = ivec[:, s * d_sub:(s + 1) * d_sub]
                ds = ((sub[:, None, :] - books_np[s][None, :, :]) ** 2).sum(axis=2)
                codes_v.append(np.argmin(ds, axis=1).astype(np.int32))
                qts_v.append(ds)
        if valid.all():
            # common case: no per-row Python assembly, list() hands Arrow
            # C-level row views
            out["c"] = pd.Series(list(probes_v))
            for s in range(m):
                out[f"code{s}"] = pd.Series(codes_v[s])
                out[f"qt{s}"] = pd.Series(list(qts_v[s]))
            return pd.DataFrame(out)
        res_c = np.empty(n_rows, dtype=object)
        res_codes = [np.full(n_rows, None, dtype=object) for _ in range(m)]
        res_qts = [np.empty(n_rows, dtype=object) for _ in range(m)]
        vi = 0
        for i in range(n_rows):
            if valid.iloc[i]:
                res_c[i] = probes_v[vi]
                for s in range(m):
                    res_codes[s][i] = int(codes_v[s][vi])
                    res_qts[s][i] = qts_v[s][vi]
                vi += 1
            else:
                res_c[i] = None
                for s in range(m):
                    res_qts[s][i] = None
        out["c"] = pd.Series(res_c)
        for s in range(m):
            out[f"code{s}"] = pd.Series(res_codes[s])
            out[f"qt{s}"] = pd.Series(res_qts[s])
        return pd.DataFrame(out)

    # asNondeterministic: the optimizer otherwise duplicates the encode
    # UDF below the pushed join-key null filter (two ArrowEvalPython
    # nodes on the members side — guide §4.4's pattern); the function is
    # in fact deterministic, the marker only pins a single evaluation
    encode_once = _encode.asNondeterministic()
    enc = corpus.select(
        F.col(id_col).alias("id"), encode_once(F.col(vec_col)).alias("e")
    )
    members = enc.select(
        F.col("id").alias("neighbor_id"),
        *[F.col(f"e.code{s}").alias(f"code{s}") for s in range(m)],
        F.element_at("e.c", 1).alias("c"),
    )
    probes = enc.select(
        F.col("id").alias("query_id"),
        *[F.col(f"e.qt{s}").alias(f"qt{s}") for s in range(m)],
        F.explode(F.slice("e.c", 1, n_probe)).alias("c"),
    )

    cand = probes.join(members, "c").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    adc = sum(
        F.element_at(F.col(f"qt{s}"), F.col(f"code{s}") + 1)
        for s in range(n_subspaces)
    )
    # project to (query_id, neighbor_id, adc_sqdist) BEFORE the top-k
    # window: the window's Exchange otherwise carries every qt{s} ADC
    # table (m×k_pq longs) per candidate row — at n_probe/n_centroids
    # selectivity that exchange is the query's largest shuffle by an
    # order of magnitude (measured 5.2 s → 2.1 s end-to-end at sf0.1)
    scored = cand.select(
        "query_id", "neighbor_id", adc.alias("adc_sqdist")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_sqdist").asc(), F.col("neighbor_id").asc()
    )
    if not refine:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "adc_sqdist", "rank")
        )
    # FAISS-refine shape (IVFPQR): ADC produces a k·refine shortlist of
    # ids, the original vectors are randomly accessed by id for an exact
    # cosine re-rank of just that shortlist. Quantization error then only
    # costs recall when a true neighbor misses the WHOLE shortlist —
    # measured recall@5 on sf0.001 random unit vectors (ANN's worst
    # case): 0.09 pure ADC at m=4/k_pq=8 → 0.85 at m=16/k_pq=16,
    # refine=8, n_probe=8. The vector join stays tiny: k·refine rows
    # per query.
    short = (
        scored.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= k * refine)
        .select("query_id", "neighbor_id")
    )
    vq = corpus.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    vn = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    # (Arrow batch bound for the re-rank UDF set once with the encode
    # UDF's request above — both are vector-width inputs at 16384)
    re_sc = short.join(vq, "query_id").join(vn, "neighbor_id")
    re_sc = re_sc.withColumn("cosine", _cosine_pair_expr(re_sc, "qvec", "nvec"))
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        re_sc.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def semdedup(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    n_iters: int = 2,
    threshold: float = 0.3,
    centroids: list[list[int]] | None = None,
) -> DataFrame:
    """SemDedup (Abbas et al. 2023, arXiv:2303.09540) — semantic
    deduplication by clustering then within-cluster cosine pruning →
    (id, cluster, max_prior_cosine, kept).

    The published recipe: k-means the embedding space, and inside each
    cluster drop every item whose cosine to another cluster member
    exceeds ``threshold`` — near-duplicate *meaning*, not near-duplicate
    bytes (the web-scale step AFTER MinHash: catches translations,
    templated rewrites, boilerplate paraphrases). This implementation
    keeps the FIRST member by id of every semantic group (deterministic
    first-occurrence rule, same tie policy as the C4 span dedup
    operator) rather than the paper's keep-farthest-from-centroid, and
    reuses the integer-exact Lloyd's quantizer (train_ivf_centroids) so
    an external SQL oracle replays clustering bit-for-bit.

    Scale shape: assignment is one map-only pass (K×dim literal
    distance fold, no shuffle); the pair stage shuffles on cluster id
    and is O(Σ c_i²) — the SemDedup cost model, bounded by picking
    n_centroids ∝ corpus/target-cluster-size (the paper runs 50k
    clusters for LAION-440M; cluster size, not corpus size, is the
    knob). Cosine pairs are scored with the Arrow-batched kernel that
    is bit-identical to the SQL fold (_cosine_pair_expr).
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus,
            id_col=id_col,
            vec_col=vec_col,
            n_centroids=n_centroids,
            n_iters=n_iters,
        )
    assigned = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("emb"),
        F.array_min(_centroid_dists(_int_vec(F.col(vec_col)), centroids))[
            "j"
        ].alias("cluster"),
    )
    lo = assigned.select(
        "cluster", F.col("id").alias("_id_lo"), F.col("emb").alias("_emb_lo")
    )
    hi = assigned.select(
        "cluster", F.col("id").alias("id"), F.col("emb").alias("_emb_hi")
    )
    pairs = hi.join(lo, "cluster").where(F.col("_id_lo") < F.col("id"))
    scored = pairs.withColumn(
        "_cos", _cosine_pair_expr(pairs, "_emb_lo", "_emb_hi")
    )
    prior = scored.groupBy("id").agg(F.max("_cos").alias("max_prior_cosine"))
    return (
        assigned.join(prior, "id", "left")
        .select(
            "id",
            "cluster",
            F.round("max_prior_cosine", 5).alias("max_prior_cosine"),
            (
                F.col("max_prior_cosine").isNull()
                | (F.col("max_prior_cosine") < F.lit(float(threshold)))
            ).alias("kept"),
        )
    )
