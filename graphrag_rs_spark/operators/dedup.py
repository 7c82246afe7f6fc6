"""Deduplication family for large-scale training-data pipelines.

Beyond the reference's operator set (its incremental module dedupes by
content hash only, incremental/mod.rs:87-91); these are the standard
web-scale corpus dedup techniques, each expressed as pure DataFrame ops:

- exact:       sha2 hash groupBy (one shuffle)
- MinHash+LSH: shingle → k minhashes → band → bucket-join candidates →
               exact-jaccard verify → connected components
- SimHash:     64-bit signed-bit-sum signature, hamming≤k candidate pairs
               via (k+1)-block banding (pigeonhole: d≤k ⇒ at least one
               block equal — complete for any k)
- n-gram Jaccard: shared-shingle blocking + exact jaccard

Everything JVM-side (higher-order array fns + xxhash64); no Python in any
hot path. Embedding-cosine near-dup lives in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphrag_rs_spark.operators.cc import connected_components


def _spread(df: DataFrame, *cols: str) -> DataFrame:
    """Ensure at least default-parallelism partitions before CPU-heavy
    per-row work. Small inputs (one parquet split) otherwise pin the whole
    signature computation to a single task; inputs that already have
    enough partitions (the 100 TB case) pass through untouched — no
    corpus-wide reshuffle."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *cols)


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


def exact_bow_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (id, bow_group_id, group_size): groups of documents with the
    IDENTICAL token multiset (sorted nonempty lowercase tokens of
    ``[^a-z0-9]+`` splits, joined with \\x1f, sha256-hashed).

    Word-order-invariant exact dedup — catches shuffled/reordered and
    re-punctuated copies that byte-hash dedup (:func:`exact_duplicates`)
    misses, at the same cost: one map-side projection + one groupBy
    shuffle on a 64-hex key. bow_group_id = min id in the group;
    singletons included. Strictly coarser than byte equality, strictly
    finer than the probabilistic near-dup family (minhash/simhash).
    """
    toks = F.array_sort(
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda t: t != "",
        )
    )
    hashed = df.select(
        F.col(id_col).alias("id"),
        F.sha2(F.concat_ws("\x1f", toks), 256).alias("h"),
    )
    groups = hashed.groupBy("h").agg(
        F.min("id").alias("bow_group_id"), F.count("*").alias("group_size")
    )
    return hashed.join(groups, "h").select("id", "bow_group_id", "group_size")


def _shingles(text_col, n: int = 3):
    """Word n-gram shingles as an array column (distinct).

    Built by zipping n shifted views of the token array (zip_with with a
    cheap concat lambda) rather than transform+slice — slice copies O(n)
    tokens per element, measured 2× slower for n=3."""
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    sz = F.size(toks)
    m = F.greatest(sz - (n - 1), F.lit(0))
    shifted = [F.slice(toks, i + 1, m) for i in range(n)]
    joined = shifted[0]
    for nxt in shifted[1:]:
        joined = F.zip_with(joined, nxt, lambda acc, t: F.concat_ws(" ", acc, t))
    return F.array_distinct(
        F.when(sz < n, F.array(F.concat_ws(" ", toks))).otherwise(joined)
    )


def minhash_signatures(
    shingled: DataFrame, *, num_hashes: int = 64
) -> DataFrame:
    """(id, sh: array<string>) → (id, h0..h{k-1}): k minhashes per doc.

    Seeded family: xxhash64(shingle, seed_literal) — deterministic across
    runs and executors (identical values to the round-1 array_min/transform
    formulation). Computed by EXPLODING shingles and taking k codegen'd
    hash-agg mins in ONE pass: 64 interpreted higher-order-function
    traversals per row (round 1's shape, 38% of the bench) become one
    whole-stage-codegen scan; map-side partial aggregation collapses the
    shuffle to ~one 64-long row per doc per partition.
    """
    exploded = shingled.select("id", F.explode("sh").alias("g"))
    aggs = [
        F.min(F.xxhash64(F.col("g"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return exploded.groupBy("id").agg(*aggs)


def minhash_lsh_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    threshold: float = 0.7,
    max_band_bucket: int = 200,
) -> DataFrame:
    """→ (id_a, id_b, jaccard) near-duplicate pairs with exact verified
    shingle-jaccard ≥ threshold.

    LSH recall knob: bands=16 × rows=4 catches pairs with jaccard ≳ 0.5
    w.h.p. — candidates are verified exactly, so precision is 1.0 by
    construction.

    Scale shape (round-2 rework): the band self-join carries IDS ONLY —
    candidate pairs are deduped as bare (id_a, id_b) rows, and the shingle
    arrays are joined back exactly once for the exact-jaccard verify. At
    100 TB the band shuffle is 16 × (id + 8-byte bucket) per doc instead of
    16 × the full shingle mass.
    """
    rows_per_band = num_hashes // bands
    base = _spread(df.select(F.col(id_col).alias("id"), F.col(text_col)), "id").select(
        "id", _shingles(F.col(text_col), shingle_size).alias("sh")
    ).where(F.size("sh") > 0)
    # consumed by the signature pass and twice by the verify join.
    # DISK_ONLY, not the in-heap default: the shingle arrays are ~2-3× the
    # corpus text mass, and building a deserialized columnar cache of that
    # OOMs a single-host heap well before the 100 TB design point
    # (measured: 1.2M docs × 8× content ≈ 29 GB logical killed a 12 g heap
    # at 8 cores). Spilling the intermediate to spark.local.dir (tmpfs on
    # this sandbox, NVMe on a real cluster) keeps the heap for execution;
    # same fix as the pipeline's scratch-parquet materializer.
    base = base.persist(StorageLevel.DISK_ONLY)

    sig = minhash_signatures(base, num_hashes=num_hashes)

    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"h{b * rows_per_band + r}").cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))

    # banded feeds BOTH the bucket-size groupBy and the candidate join;
    # without a persist the whole shingle→signature→banding pipeline runs
    # twice (measured 4.9 s → 3.0 s warm / 11.6 s → 3.6 s cold at sf0.1
    # for the one-line fix). The cached rows are ids-only (id, band,
    # bucket — 3 longs × bands per doc), orders of magnitude smaller than
    # the signature pipeline they replace, so the persist is scale-safe
    # where recomputation is not.
    banded = banded.persist()

    # band-bucket skew guard: a bucket of B docs yields B² candidate
    # pairs — on low-diversity corpora (template text, boilerplate) a
    # single bucket can hold thousands of genuinely-similar docs and one
    # bucket alone melts the join (measured: 20k fixture docs → one
    # 3,977-doc bucket ≈ 8M pairs). Buckets over ``max_band_bucket``
    # switch to a STAR: each member pairs with the bucket's min id only —
    # B−1 pairs instead of B²/2. Verified star pairs + the transitive
    # dup_groups closure still recover full duplicate clusters; only the
    # exhaustive pairwise listing inside mega-clusters is (deliberately)
    # not enumerated.
    bsizes = banded.groupBy("band", "bucket").agg(
        F.count("*").alias("bn"), F.min("id").alias("rep")
    )
    sized = banded.join(bsizes, ["band", "bucket"])
    small = sized.where(F.col("bn") <= max_band_bucket)
    a = small.select("band", "bucket", F.col("id").alias("id_a"))
    b = small.select("band", "bucket", F.col("id").alias("id_b"))
    all_pairs = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    star_pairs = (
        sized.where((F.col("bn") > max_band_bucket) & (F.col("id") != F.col("rep")))
        .select(F.col("rep").alias("id_a"), F.col("id").alias("id_b"))
    )
    cand = all_pairs.unionByName(star_pairs).dropDuplicates(["id_a", "id_b"])

    # single shingle rejoin for the exact verify (ids-only until here)
    sh_a = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = cand.join(sh_a, "id_a").join(sh_b, "id_b")

    union_sz = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / union_sz.cast("double")
    out = (
        verified.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # materialize the (small) verified-pair set eagerly so the cached
    # shingle base can be released NOW — a long-lived session calling this
    # repeatedly must not accumulate shingle blocks until LRU pressure
    out = out.localCheckpoint(eager=True)
    base.unpersist()
    banded.unpersist()
    return out


def dup_groups_from_pairs(pairs: DataFrame, all_ids: DataFrame) -> DataFrame:
    """pairs(id_a, id_b) + ids(id) → (id, dup_group_id) via connected
    components (transitive closure of near-duplicate pairs)."""
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        vertices=all_ids,
    )
    return comp.select("id", F.col("component").alias("dup_group_id"))


# hash families for simhash: "fast" = xxhash64, 64-bit (production —
# cheapest per token); "portable" = first 15 hex chars of sha256 as a
# 60-bit int (reproducible in DuckDB/Trino SQL — same construction as
# textstats.fingerprint_col — used by the driver's oracle-checked query).
# Same operator code either way; only the token-hash expression differs.
SIMHASH_HASHES = {"fast": 64, "portable": 60}


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    hash_fn: str = "fast",
) -> DataFrame:
    """→ (id, sig): SimHash of the whitespace token multiset.

    Classic Charikar: signature bit i = sign of Σ_tokens (±1 by token-hash
    bit i). Round 1 expressed this as 64 separate interpreted F.aggregate
    folds per row (O(64·tokens) expression evals — flagged weak at scale);
    now it is ONE codegen pass: explode tokens, hash each once, ``bits``
    hash-agg conditional sums, then a single bit-assembly projection.
    """
    bits = SIMHASH_HASHES[hash_fn]
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    exploded = _spread(df.select(F.col(id_col).alias("id"), F.col(text_col)), "id").select(
        "id", F.explode(toks).alias("t")
    )
    if hash_fn == "portable":
        h = F.conv(F.substring(F.sha2(F.col("t"), 256), 1, 15), 16, 10).cast("long")
    else:
        h = F.xxhash64(F.col("t"))
    aggs = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{i}")
        for i in range(bits)
    ]
    sums = exploded.groupBy("id").agg(*aggs)

    sig = None
    for i in range(bits):
        # top bit of the 64-bit family lands on the sign bit — two's
        # complement keeps the arithmetic in range
        weight = 2**i if i < 63 else -(2**63)
        term = F.when(F.col(f"s{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(weight).cast("long")
        sig = term if sig is None else sig + term
    return sums.select("id", sig.alias("sig"))


def _hamming_blocks(bits: int, n_blocks: int) -> list[tuple[int, int]]:
    """Split ``bits`` into ``n_blocks`` contiguous (shift, width) blocks,
    widths differing by at most 1."""
    base, rem = divmod(bits, n_blocks)
    out, shift = [], 0
    for i in range(n_blocks):
        width = base + (1 if i < rem else 0)
        out.append((shift, width))
        shift += width
    return out


def simhash_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
    hash_fn: str = "fast",
) -> DataFrame:
    """→ (id_a, id_b, hamming) pairs with hamming(simhash) ≤ max_hamming.

    Pigeonhole blocking with ``max_hamming + 1`` blocks: if two signatures
    differ in ≤ max_hamming bits, at least one block is untouched, so the
    blocking is COMPLETE for any max_hamming (round 1 fixed 4 blocks, which
    silently lost recall for max_hamming > 3). Wider thresholds mean
    narrower block keys and larger candidate buckets — the usual
    recall/cost trade, now explicit. Exact hamming verify via
    bit_count(xor); the sig (one long) rides along in the join.
    """
    n_blocks = max_hamming + 1
    if n_blocks > 30:
        raise ValueError("max_hamming > 29 makes blocks narrower than 2 bits")
    sig_bits = SIMHASH_HASHES[hash_fn]
    sigs = simhash_signatures(df, text_col, id_col, hash_fn=hash_fn)
    blocks = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(blk).alias("block"),
                        F.shiftrightunsigned(F.col("sig"), shift)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for blk, (shift, width) in enumerate(
                        _hamming_blocks(sig_bits, n_blocks)
                    )
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", F.col("bk.block").alias("block"), F.col("bk.key").alias("key"))

    a = blocks.select("block", "key", F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = blocks.select("block", "key", F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    # verify BEFORE the pair dedup: hamming is a function of the pair, so
    # every duplicate of a pair passes or fails together and the distinct
    # set is unchanged — but the dedup Exchange now carries only the
    # passing pairs (ids + a small int) instead of every block collision
    # with both 8-byte sigs (measured 232k candidate rows -> 1.1k at
    # sf0.1 for max_hamming=3)
    return (
        a.join(b, ["block", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .dropDuplicates(["id_a", "id_b"])
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
    base = _spread(df.select(F.col(id_col).alias("id"), F.col(text_col)), "id").select(
        "id", _shingles(F.col(text_col), shingle_size).alias("sh")
    ).where(F.size("sh") > 0)
    # read by the explode and the per-doc profile; DISK_ONLY for the
    # same heap-safety reason as the minhash base above
    base = base.persist(StorageLevel.DISK_ONLY)
    jac = _shingle_overlap(base, max_block_size).select(
        "id_a", "id_b",
        (F.col("inter") / F.col("union")).alias("jaccard"),
    )
    out = jac.where(F.col("jaccard") >= threshold)
    # eager-materialize the small pair set, then release the shingle cache
    # (see minhash_lsh_duplicates — same repeated-invocation leak)
    out = out.localCheckpoint(eager=True)
    base.unpersist()
    return out


def _shingle_overlap(base: DataFrame, max_block_size: int) -> DataFrame:
    """(id, sh: distinct shingle set) → (id_a, id_b, inter, union) doubles
    for every pair sharing ≥ 1 non-hot shingle.

    Overlap counts come from the postings join itself: ``sh`` is distinct
    per doc, so the join on a shingle yields exactly one row per shared
    shingle and |A∩B| is a partial-aggregated COUNT — the pair shuffle
    carries two ids and a long instead of the two full shingle arrays the
    old verify join shipped (and re-shuffled through a dropDuplicates).
    Hot shingles (> max_block_size docs) stay out of the blocking join
    (the skew guard), but still count toward the overlap: each doc keeps
    its (rare) hot shingles as a small side array and the pair join adds
    |hotA ∩ hotB|. |A∪B| = |A| + |B| − |A∩B| (sets). All counts are the
    same integers the old array_intersect/array_union produced, so every
    downstream ratio is bit-identical."""
    exploded = base.select("id", F.explode("sh").alias("g"))
    hot = exploded.groupBy("g").count().where(F.col("count") > max_block_size).select("g")
    marked = exploded.join(
        F.broadcast(hot.withColumn("_hot", F.lit(1))), "g", "left"
    )
    pruned = marked.where(F.col("_hot").isNull()).select("id", "g")

    a = pruned.select("g", F.col("id").alias("id_a"))
    b = pruned.select("g", F.col("id").alias("id_b"))
    shared = (
        a.join(b, "g")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
    )
    # per-doc profile in ONE pass over the marked postings: count(*) is
    # |A| (sh is distinct) and the conditional collect_list keeps just
    # the (rare) hot shingles — collect_list drops the nulls
    prof = marked.groupBy("id").agg(
        F.count("*").alias("n"),
        F.collect_list(F.when(F.col("_hot") == 1, F.col("g"))).alias("hsh"),
    )
    pa = prof.select(
        F.col("id").alias("id_a"), F.col("n").alias("n_a"), F.col("hsh").alias("hsh_a")
    )
    pb = prof.select(
        F.col("id").alias("id_b"), F.col("n").alias("n_b"), F.col("hsh").alias("hsh_b")
    )
    hot_inter = F.size(F.array_intersect("hsh_a", "hsh_b")).cast("long")
    inter = F.col("n_shared") + hot_inter
    return (
        shared.join(pa, "id_a")
        .join(pb, "id_b")
        .select(
            "id_a", "id_b",
            inter.cast("double").alias("inter"),
            (F.col("n_a") + F.col("n_b") - inter).cast("double").alias("union"),
            F.col("n_a").cast("double").alias("n_a"),
            F.col("n_b").cast("double").alias("n_b"),
        )
    )


def select_representatives(
    members: DataFrame,
    *,
    id_col: str = "id",
    group_col: str = "dup_group_id",
    quality_col: str = "quality",
) -> DataFrame:
    """Duplicate-cluster resolution: pick ONE representative per dup
    group and mark the rest for dropping → (id, dup_group_id, quality,
    is_representative).

    ``members`` carries (id, dup_group_id, quality) — groups from any of
    the dedup family (exact sha groups, minhash/simhash/ngram transitive
    closures via :func:`dup_groups_from_pairs`), quality from any scorer
    (textstats.quality_features, code_quality.quality_metrics, or plain
    length). Highest quality wins, id ascending breaks ties, so the keep
    list is deterministic.

    This is the compaction step a training-data pipeline runs after
    near-dup detection: dedup emits clusters, this emits the keep/drop
    decision. One window shuffle on the group key; group sizes are dup-
    cluster sizes (bounded by the dedup operators' own skew guards), so
    no single partition inflates at scale.

    Callers may pass the FULL corpus where non-duplicate rows carry a
    NULL group id: NULL groups are treated as singletons (each such row
    is its own representative), not lumped into one window partition —
    which would both mark all-but-one unique row as droppable and funnel
    the whole non-dup corpus through a single task at scale.
    """
    w = Window.partitionBy(
        F.coalesce(
            F.col(group_col).cast("string"),
            F.concat(F.lit("\x1fsingleton\x1f"), F.col(id_col).cast("string")),
        )
    ).orderBy(F.col(quality_col).desc_nulls_last(), F.col(id_col).asc())
    return members.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("dup_group_id"),
        F.col(quality_col).alias("quality"),
        (F.row_number().over(w) == 1).alias("is_representative"),
    )


def contrastive_triplets(
    pairs: DataFrame,
    ids: DataFrame,
    *,
    num_buckets: int = 16,
    seed: str = "cp",
) -> DataFrame:
    """Contrastive training triplets from near-duplicate pairs:
    pairs(id_a, id_b) positives + ids(id) universe →
    (anchor, positive, negative).

    The mining step that turns dedup output into embedding-model
    training data: every near-dup pair is an (anchor, positive), and the
    negative is a hash-routed draw over the corpus (same bucket-argmin
    construction as linkpred.negative_samples — deterministic, engine-
    portable sha256, no RNG, no global ordering). Candidates equal to
    either pair member, or that are themselves a positive partner of the
    anchor (either orientation), are excluded BEFORE the argmin so every
    non-degenerate bucket yields a negative.

    Scale shape: one equi-join of (pairs × 1 draw) against ~n/B-row
    vertex buckets, one anti-join against the (small relative to corpus)
    positive-pair set, one bounded per-draw window.
    """
    from graphrag_rs_spark.operators.linkpred import _h60

    sep = F.lit("\x1f")
    p = pairs.select(
        F.col("id_a").alias("anchor"), F.col("id_b").alias("positive")
    )
    vb = ids.select(
        F.col("id").alias("negative"),
        (_h60(F.col("id").cast("string")) % num_buckets).alias("bucket"),
    )
    draws = p.select(
        "anchor",
        "positive",
        (
            _h60(
                F.concat(
                    F.lit(seed), sep, F.col("anchor").cast("string"),
                    sep, F.col("positive").cast("string"),
                )
            )
            % num_buckets
        ).alias("bucket"),
    )
    cand = (
        draws.join(vb, "bucket")
        .where(
            (F.col("negative") != F.col("anchor"))
            & (F.col("negative") != F.col("positive"))
        )
        .drop("bucket")
    )
    pos_sym = p.select("anchor", F.col("positive").alias("negative")).union(
        p.select(
            F.col("positive").alias("anchor"), F.col("anchor").alias("negative")
        )
    )
    cand = cand.join(pos_sym, ["anchor", "negative"], "left_anti")
    w = Window.partitionBy("anchor", "positive").orderBy(
        _h60(
            F.concat(
                F.col("anchor").cast("string"), sep,
                F.col("positive").cast("string"), sep,
                F.col("negative").cast("string"),
            )
        ).asc(),
        F.col("negative").asc(),
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("anchor", "positive", "negative")
    )


def duplicated_spans(
    df: DataFrame,
    *,
    length: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better" §3.1): find every token position whose
    ``length``-gram occurs MORE THAN ONCE anywhere in the corpus (other
    docs or elsewhere in the same doc), and merge the hit positions into
    maximal duplicated spans per doc → (id, span_start, span_end,
    span_tokens), token offsets 0-based, end exclusive.

    The paper builds a corpus suffix array on one machine; the
    distributed shape is the gram-occurrence groupBy: corpus-wide
    duplication of a fixed-length gram is just count(gram) > 1, and any
    duplicated substring of length >= ``length`` is exactly a run of
    duplicated grams — so merging overlapping hits reconstructs the
    paper's maximal-span semantics without any suffix array.

    Scale shape: one scan emits (gram_hash, id, pos) — hashes are
    portable 60-bit sha256 prefixes so the shuffle ships longs, not
    strings, and the DuckDB oracle replays them bit-for-bit (birthday
    bound: ~10^9 distinct grams ⇒ ~0.4 expected collisions corpus-wide,
    each marking one extra ``length``-token span — negligible for dedup
    purposes, widen the prefix if exactness at that scale matters). One
    partial-agg groupBy counts occurrences (hot grams are just big
    counts, never big groups), one shuffle join back to positions keeps
    only duplicated ones, and the span merge is a per-doc window over
    the (small) hit set. Nothing is quadratic; nothing collects.
    """
    from graphrag_rs_spark.operators.linkpred import _h60

    sep = F.lit("\x1f")
    toks = _spread(
        df.select(F.col(id_col).alias("id"), F.col(text_col)), "id"
    ).select(
        "id",
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
        ).alias("tokens"),
    )
    grams = toks.where(F.size("tokens") >= length).select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("tokens") - length + 1),
                lambda i: _h60(
                    F.array_join(F.slice(F.col("tokens"), i, length), "\x1f")
                ),
            )
        ).alias("pos", "g"),
    )
    counts = grams.groupBy("g").agg(F.count("*").alias("n"))
    dup = grams.join(counts.where(F.col("n") > 1).select("g"), "g").select(
        "id", "pos"
    )
    w = Window.partitionBy("id").orderBy("pos")
    spanned = dup.withColumn(
        "_new",
        F.when(
            F.col("pos") - F.lag("pos").over(w) <= length, F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn(
        "_span",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return spanned.groupBy("id", "_span").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + length).alias("span_end"),
    ).select(
        "id",
        F.col("span_start").cast("int").alias("span_start"),
        F.col("span_end").cast("int").alias("span_end"),
        (F.col("span_end") - F.col("span_start")).cast("int").alias("span_tokens"),
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_size: int = 3,
    threshold: float = 0.7,
    max_block_size: int = 200,
) -> DataFrame:
    """→ (id_a, id_b, containment_ab, containment_ba, jaccard): ordered
    pairs where max(containment) ≥ threshold, with containment_ab =
    |A∩B| / |A| (how much of A lives inside B).

    The ASYMMETRIC near-dup detector Jaccard cannot express: a document
    quoted whole inside a 10× larger one has jaccard ≈ 0.1 but
    containment_ab = 1.0 — the quote/subset/boilerplate-inclusion case
    (Broder's containment, the C of shingling's (r, C) pair).  Same
    scale shape as ngram_jaccard_pairs: shared-shingle blocking with
    the hot-shingle skew guard, ids-only candidate join, exact overlap
    counts aggregated from the postings join (_shingle_overlap).
    """
    base = _spread(
        df.select(F.col(id_col).alias("id"), F.col(text_col)), "id"
    ).select(
        "id", _shingles(F.col(text_col), shingle_size).alias("sh")
    ).where(F.size("sh") > 0)
    base = base.persist(StorageLevel.DISK_ONLY)
    out = (
        _shingle_overlap(base, max_block_size)
        .select(
            "id_a", "id_b",
            (F.col("inter") / F.col("n_a")).alias("containment_ab"),
            (F.col("inter") / F.col("n_b")).alias("containment_ba"),
            (F.col("inter") / F.col("union")).alias("jaccard"),
        )
        .where(
            F.greatest("containment_ab", "containment_ba") >= threshold
        )
        .select(
            "id_a", "id_b",
            F.round("containment_ab", 6).alias("containment_ab"),
            F.round("containment_ba", 6).alias("containment_ba"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )
    out = out.localCheckpoint(eager=True)
    base.unpersist()
    return out
