"""Deduplication family for large-scale training-data pipelines.

Beyond the reference's operator set (its incremental module dedupes by
content hash only, incremental/mod.rs:87-91); these are the standard
web-scale corpus dedup techniques, each expressed as pure DataFrame ops:

- exact:       sha2 hash groupBy (one shuffle)
- MinHash+LSH: shingle → k minhashes → band → bucket-join candidates →
               exact-jaccard verify → connected components
- SimHash:     64-bit signed-bit-sum signature, hamming≤k candidate pairs
               via 16-bit block banding (pigeonhole: d≤3 ⇒ one of 4 blocks
               equal)
- n-gram Jaccard: shared-shingle blocking + exact jaccard

Everything JVM-side (higher-order array fns + xxhash64); no Python in any
hot path. Embedding-cosine near-dup lives in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.cc import connected_components


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (id, dup_group_id, group_size): groups of byte-identical texts.

    dup_group_id = min id in the group (deterministic); singletons included.
    """
    hashed = df.select(
        F.col(id_col).alias("id"), F.sha2(F.col(text_col), 256).alias("h")
    )
    groups = hashed.groupBy("h").agg(
        F.min("id").alias("dup_group_id"), F.count("*").alias("group_size")
    )
    return hashed.join(groups, "h").select("id", "dup_group_id", "group_size")


def _shingles(text_col, n: int = 3):
    """Word n-gram shingles as an array column (distinct)."""
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    return F.array_distinct(
        F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        )
    )


def minhash_signature(shingles_col, num_hashes: int = 64):
    """k minhashes: per seed, min over shingle hashes (JVM-side, no UDF).

    Seeded family: xxhash64(shingle, seed_literal) — deterministic across
    runs and executors.

    NOTE the closure factory: a ``lambda s, i=i`` default-arg capture would
    make pyspark bind ``i`` to transform's optional second lambda variable
    (the element INDEX), silently collapsing every "seed" into the same
    position-dependent hash and gutting LSH recall.
    """

    def _hash_with_seed(seed: int):
        return lambda s: F.xxhash64(s, F.lit(seed))

    return F.array(
        *[
            F.array_min(F.transform(shingles_col, _hash_with_seed(i)))
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """→ (id_a, id_b, jaccard) near-duplicate pairs with exact verified
    shingle-jaccard ≥ threshold.

    LSH recall knob: bands=16 × rows=4 catches pairs with jaccard ≳ 0.5
    w.h.p. — candidates are verified exactly, so precision is 1.0 by
    construction. Shuffles: band explode → bucket groupBy-join → verify.
    """
    rows_per_band = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("id"),
        _shingles(F.col(text_col), shingle_size).alias("sh"),
    ).where(F.size("sh") > 0)
    sig = base.withColumn("sig", minhash_signature(F.col("sh"), num_hashes))

    banded = sig.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[b * rows_per_band + r].cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sh", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))

    a = banded.select("band", "bucket", F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = banded.select("band", "bucket", F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )

    union_sz = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / union_sz.cast("double")
    return (
        cand.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dup_groups_from_pairs(pairs: DataFrame, all_ids: DataFrame) -> DataFrame:
    """pairs(id_a, id_b) + ids(id) → (id, dup_group_id) via connected
    components (transitive closure of near-duplicate pairs)."""
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        vertices=all_ids,
    )
    return comp.select("id", F.col("component").alias("dup_group_id"))


def simhash_col(text_col, bits: int = 64):
    """64-bit SimHash of the whitespace token multiset, JVM-side.

    Classic Charikar: signature bit i = sign of Σ_tokens (±1 by token-hash
    bit i). Expressed as one aggregate over exploded bit contributions —
    here as an array expression per row (no explode, no shuffle).
    """
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def _bit_sum(bit: int):
        # closure factory: default-arg capture would add a third lambda
        # parameter, which pyspark maps to a lambda variable
        return lambda acc, h: acc + F.when(
            F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_exprs = []
    for i in range(bits):
        # Σ over tokens of (bit_i ? 1 : -1)
        s = F.aggregate(hashes, F.lit(0), _bit_sum(i))
        bit_exprs.append(F.when(s > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")) * F.lit(2**i if i < 63 else -(2**63)).cast("long"))
    # bit 63 handled via two's complement (long min) to avoid overflow
    out = bit_exprs[0]
    for e in bit_exprs[1:]:
        out = out + e
    return out


def simhash_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
) -> DataFrame:
    """→ (id_a, id_b, hamming) pairs with hamming(simhash) ≤ max_hamming.

    Blocking by 16-bit blocks (pigeonhole: hamming ≤ 3 ⇒ at least one of
    the 4 blocks identical), then exact hamming verify via bit_count(xor).
    """
    sigs = df.select(
        F.col(id_col).alias("id"), simhash_col(F.col(text_col)).alias("sig")
    )
    blocks = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(blk).alias("block"),
                        F.shiftright(F.col("sig"), blk * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for blk in range(4)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", F.col("bk.block").alias("block"), F.col("bk.key").alias("key"))

    a = blocks.select("block", "key", F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = blocks.select("block", "key", F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    cand = (
        a.join(b, ["block", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_size: int = 3,
    threshold: float = 0.5,
    max_block_size: int = 200,
) -> DataFrame:
    """→ (id_a, id_b, jaccard): exact n-gram-jaccard pairs ≥ threshold,
    blocked by shared shingle (skew guard: shingles occurring in more than
    ``max_block_size`` docs are dropped as non-discriminative — same
    hot-key policy as linking)."""
    base = df.select(
        F.col(id_col).alias("id"), _shingles(F.col(text_col), shingle_size).alias("sh")
    ).where(F.size("sh") > 0)
    exploded = base.select("id", "sh", F.explode("sh").alias("g"))
    hot = exploded.groupBy("g").count().where(F.col("count") > max_block_size).select("g")
    pruned = exploded.join(F.broadcast(hot), "g", "left_anti")

    a = pruned.select("g", F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = pruned.select("g", F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    cand = (
        a.join(b, "g")
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    ).cast("double")
    return (
        cand.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
