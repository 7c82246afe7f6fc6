"""Mergeable sketches over token streams — Count-Min and HyperLogLog.

Standard distributed-analytics machinery the 100 TB tier runs instead of
exact aggregation when memory is the constraint: a Count-Min table
(Cormode & Muthukrishnan 2005) answers heavy-hitter point queries in
depth×width cells regardless of vocabulary size; HyperLogLog (Flajolet
et al. 2007) estimates distinct counts in m registers. Both are built
here as ordinary partial-agg groupBys over DETERMINISTIC sha256-derived
hashes (the portable 60-bit family every oracle replays) — so unlike
`approx_count_distinct`, the sketch contents and the estimates are
bit-reproducible on any engine, any partitioning, any cluster size.

Spark shape: a sketch build is ONE explode + ONE partial-agg groupBy on
(row, col) / (bucket) — the reduce side is bounded by the sketch size
(depth×width / m cells), never by the corpus. Merging shards = the same
groupBy; the sketches are trivially algebraic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.textstats import _tokens

SEP = "\x1f"

#: HLL hash-value bit budget after the bucket split: the portable hash
#: is 60 bits, the bucket takes log2(m); 54 bits remain for m=64.
_HLL_W_BITS = 54


def _h60(col):
    return F.conv(F.substring(F.sha2(col, 256), 1, 15), 16, 10).cast("long")


def cms_table(
    docs: DataFrame,
    *,
    text_col: str = "text",
    depth: int = 4,
    width: int = 256,
    seed: str = "cms-v1",
) -> DataFrame:
    """Count-Min sketch of the corpus token stream → (row, col, cnt).

    Each token occurrence increments one cell per row: col =
    H(seed␟row␟token) mod width. Point query = min over rows of the
    probed cells — an overestimate by construction (collisions only
    ever add), within εN with probability 1−δ for width=e/ε, depth=
    ln(1/δ).
    """
    toks = docs.select(F.explode(_tokens(F.col(text_col))).alias("t"))
    rows = toks.select(
        "t",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    ).select(
        "row",
        (
            _h60(
                F.concat_ws(
                    SEP, F.lit(seed), F.col("row").cast("string"), F.col("t")
                )
            )
            % width
        ).alias("col"),
    )
    return rows.groupBy("row", "col").agg(F.count("*").alias("cnt"))


def cms_point_estimates(
    table: DataFrame,
    probes: DataFrame,
    *,
    depth: int = 4,
    width: int = 256,
    seed: str = "cms-v1",
    token_col: str = "token",
) -> DataFrame:
    """probes(token) × CMS table → (token, cms_estimate): min over the
    depth probed cells (missing cell = 0). The probe side is tiny —
    the join broadcasts it against the (bounded) sketch."""
    cells = probes.select(
        F.col(token_col).alias("token"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    ).select(
        "token",
        "row",
        (
            _h60(
                F.concat_ws(
                    SEP, F.lit(seed), F.col("row").cast("string"), F.col("token")
                )
            )
            % width
        ).alias("col"),
    )
    joined = cells.join(table, ["row", "col"], "left").select(
        "token", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    return joined.groupBy("token").agg(F.min("cnt").alias("cms_estimate"))


def hll_registers(
    df: DataFrame,
    col: str,
    *,
    m: int = 64,
    seed: str = "hll-v1",
) -> DataFrame:
    """HyperLogLog registers over a column's DISTINCT-insensitive stream
    → (bucket, register): bucket = H mod m, register = max over stream
    of (1 + leading-zero count of the remaining 54 hash bits).

    Rank arithmetic is integer-exact: bit length via the BINARY STRING
    length (``length(bin(w))``) — not floor(log2)+1, whose float
    boundary can disagree across engines. Buckets never hit are simply
    absent (register 0 — the caller's estimator fills them).
    """
    if m & (m - 1):
        raise ValueError("m must be a power of two (bucket split is a shift)")
    # w via SHIFT, not floor(h/m): h is 60 bits — double division would
    # round above 2^53
    h = _h60(F.concat_ws(SEP, F.lit(seed), F.col(col).cast("string")))
    w = F.shiftright(h, m.bit_length() - 1)
    bitlen = F.when(F.col("_w") <= 0, F.lit(0)).otherwise(
        F.length(F.bin(F.col("_w")))
    )
    return (
        df.select((h % m).alias("bucket"), w.alias("_w"))
        .select("bucket", (F.lit(_HLL_W_BITS) - bitlen + 1).alias("rank"))
        .groupBy("bucket")
        .agg(F.max("rank").cast("int").alias("register"))
    )


def hll_estimate(
    registers: DataFrame,
    *,
    m: int = 64,
) -> DataFrame:
    """registers → ONE row (m, n_zero_buckets, int_sum, estimate_c100).

    The harmonic-mean sum Σ 2^(−M[j]) is computed as the INTEGER
    Σ 2^(54+1−M[j]) (absent buckets contribute 2^55) — order-independent
    exact arithmetic; the float enters only in the final closed form.
    Small-range (linear counting) branch when zero registers exist and
    the raw estimate is under 2.5m, exactly as the paper prescribes.
    Estimate is floor-quantized to centi-units for engine parity.
    """
    alpha = 0.709  # alpha_64 (Flajolet et al. 2007, m >= 64)
    agg = registers.agg(
        F.count("*").alias("n_buckets"),
        F.sum(
            F.pow(F.lit(2.0), (F.lit(_HLL_W_BITS + 1) - F.col("register")))
            .cast("long")
        ).alias("hit_sum"),
    )
    scale = 1 << (_HLL_W_BITS + 1)
    out = agg.select(
        F.lit(m).alias("m"),
        (F.lit(m) - F.col("n_buckets")).cast("long").alias("n_zero_buckets"),
        (
            F.col("hit_sum") + (F.lit(m) - F.col("n_buckets")) * F.lit(scale)
        ).cast("long").alias("int_sum"),
    )
    raw = F.lit(alpha * m * m * float(scale)) / F.col("int_sum").cast("double")
    linear = F.lit(float(m)) * F.log(
        F.lit(float(m)) / F.col("n_zero_buckets").cast("double")
    )
    est = F.when(
        (F.col("n_zero_buckets") > 0) & (raw < 2.5 * m), linear
    ).otherwise(raw)
    return out.withColumn(
        "estimate_c100", F.floor(est * 100).cast("long")
    )


def feature_hash_vectors(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    seed: str = "fh-v1",
) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009, "Feature Hashing for
    Large Scale Multitask Learning") → (doc_id, fvec: array<long>):
    each token occurrence adds ±1 at bucket H(seed␟token) mod dim, the
    sign taken from the next hash bit (the signed variant that keeps
    the inner product unbiased). The standard vocabulary-free text
    featurizer — a deterministic integer embedding any of the ANN /
    cosine-dedup operators can consume, with zero model state.

    Shape: explode → (doc, bucket) partial-agg groupBy → dense array
    assembly via map_from_entries + a sequence transform (no pivot, no
    UDF). Two shuffles, both keyed by doc_id.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("t"),
    )
    h = _h60(F.concat_ws(SEP, F.lit(seed), F.col("t")))
    contrib = toks.select(
        "doc_id",
        (h % dim).alias("bucket"),
        F.when(F.shiftright(h, 59) % 2 == 1, F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("s"),
    )
    cells = contrib.groupBy("doc_id", "bucket").agg(F.sum("s").alias("v"))
    assembled = (
        cells.groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "v"))
            ).alias("m")
        )
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at("m", i.cast("long")), F.lit(0).cast("long")
                ),
            ).alias("fvec"),
        )
    )
    return assembled


def bloom_bits(
    keys: DataFrame,
    *,
    key_col: str = "key",
    m_bits: int = 65536,
    k_hashes: int = 4,
    seed: str = "bloom-v1",
) -> DataFrame:
    """Bloom filter build (Bloom 1970) → (bit,) — the distinct set bit
    positions, each key setting ``k_hashes`` positions
    H(seed␟i␟key) mod m. Like the CMS/HLL sketches this uses the
    portable sha256-derived 60-bit family, so the filter CONTENT (not
    just the answers) is bit-reproducible on any engine and any
    partitioning.

    Scale shape: one explode(×k) + one distinct bounded by m_bits —
    the reduce side is filter-sized, never corpus-sized; shard filters
    union to the same distinct (trivially mergeable). The dense bitmap
    form is a driver-side afterthought at m=2^16..2^32; the relational
    (bit,) form is what the probe join below wants anyway.
    """
    key = F.col(key_col)
    return (
        keys.select(
            F.explode(F.sequence(F.lit(0), F.lit(k_hashes - 1))).alias("i"),
            key.alias("_k"),
        )
        .select(
            (
                _h60(F.concat_ws(SEP, F.lit(seed), F.col("i").cast("string"), F.col("_k")))
                % m_bits
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    probes: DataFrame,
    bits: DataFrame,
    *,
    key_col: str = "key",
    m_bits: int = 65536,
    k_hashes: int = 4,
    seed: str = "bloom-v1",
) -> DataFrame:
    """Membership probe against a built filter → probes + ``bloom_hit``:
    true iff ALL ``k_hashes`` probed positions are set (the one-sided
    guarantee: misses are certain, hits may be false positives at rate
    ≈ (1−e^{−kn/m})^k). Implemented as explode(×k) → left join on the
    bit key → per-probe count == k; the join side is the m-bounded bit
    set, broadcastable for any practical filter.
    """
    key = F.col(key_col)
    probed = probes.select(
        key.alias(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(k_hashes - 1))).alias("i"),
    ).select(
        key_col,
        (
            _h60(F.concat_ws(SEP, F.lit(seed), F.col("i").cast("string"), key))
            % m_bits
        ).alias("bit"),
    )
    hits = (
        probed.join(F.broadcast(bits.withColumn("_set", F.lit(1))), "bit", "left")
        .groupBy(key_col)
        .agg((F.count("_set") == k_hashes).alias("bloom_hit"))
    )
    return probes.join(hits, key_col, "left")
