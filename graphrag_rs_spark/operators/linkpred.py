"""Link prediction over the entity graph — common-neighbor family scores.

A knowledge graph built by extraction is incomplete by construction (the
reference's own co-occurrence edges only connect entities that share a
chunk); link prediction ranks the NON-edges most likely to be real, which
drives "suggested relations", retrieval expansion, and extraction-recall
audits.  This implements the three standard neighborhood scores
(Liben-Nowell & Kleinberg, "The Link-Prediction Problem for Social
Networks"):

    common_neighbors(u,v) = |N(u) ∩ N(v)|
    jaccard(u,v)          = |N(u) ∩ N(v)| / |N(u) ∪ N(v)|
    adamic_adar(u,v)      = Σ_{w ∈ N(u)∩N(v)} 1 / ln(deg(w))

Spark shape: ONE wedge self-join of the symmetrized edge list on the
shared neighbor w (u < v), algebraic groupBy (count + sum — map-side
combine), one broadcastable degree join, and a left_anti against the edge
list to keep non-adjacent pairs only.  No UDFs, no driver loops.

Scale notes: the wedge join fans out Σ_w deg(w)² — a hub with deg 10⁶
alone yields 10¹² wedges.  ``max_hub_degree`` excludes such nodes from
SERVING as the shared neighbor (they still get scored as endpoints):
standard practice, because a hub's evidence value is ≈ 1/ln(10⁶) ≈ 0.07
per pair while its cost is quadratic — the same documented
blocking-contract shape as the MinHash band cap (dedup.py) and the
linking hot-block cap (linking.py).  ln(deg(w)) is safe: a shared
neighbor is adjacent to both u and v, so deg(w) ≥ 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def link_prediction_scores(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 1,
    max_hub_degree: int | None = None,
) -> DataFrame:
    """Undirected edges(src, dst) → (id_a, id_b, common_neighbors,
    jaccard, adamic_adar) for NON-adjacent pairs with at least
    ``min_common`` shared neighbors; id_a < id_b; scores rounded to 4dp.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    # one explode instead of a self-union: the upstream edge derivation
    # is evaluated once in this action (identical row multiset)
    from graphrag_rs_spark.iterutil import both_dirs

    sym = both_dirs(e).distinct().localCheckpoint(eager=True)
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("degree")
    )

    # wedge generator: w's adjacency list self-joined on w
    wedge_src = sym.select(F.col("src").alias("w"), F.col("dst").alias("n"))
    if max_hub_degree is not None:
        hubs = deg.where(F.col("degree") > max_hub_degree).select(
            F.col("id").alias("w")
        )
        wedge_src = wedge_src.join(F.broadcast(hubs), "w", "left_anti")
    wedge_src = wedge_src.join(
        F.broadcast(deg.select(F.col("id").alias("w"), "degree")), "w"
    )

    a = wedge_src.select("w", F.col("n").alias("id_a"), "degree")
    b = wedge_src.select("w", F.col("n").alias("id_b"))
    pairs = (
        a.join(b, "w")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("common_neighbors"),
            F.sum(1.0 / F.log(F.col("degree").cast("double"))).alias("_aa"),
        )
        .where(F.col("common_neighbors") >= min_common)
    )

    # keep non-adjacent pairs only (sym holds both orders, one semi-shape
    # left_anti on (id_a, id_b) suffices)
    non_adj = pairs.join(
        sym.select(F.col("src").alias("id_a"), F.col("dst").alias("id_b")),
        ["id_a", "id_b"],
        "left_anti",
    )

    da = deg.select(F.col("id").alias("id_a"), F.col("degree").alias("_dega"))
    db = deg.select(F.col("id").alias("id_b"), F.col("degree").alias("_degb"))
    return (
        non_adj.join(F.broadcast(da), "id_a")
        .join(F.broadcast(db), "id_b")
        .select(
            "id_a",
            "id_b",
            "common_neighbors",
            F.round(
                F.col("common_neighbors").cast("double")
                / (F.col("_dega") + F.col("_degb") - F.col("common_neighbors")),
                4,
            ).alias("jaccard"),
            F.round(F.col("_aa"), 4).alias("adamic_adar"),
        )
    )


def _h60(col):
    """Portable 60-bit hash (sha256 hex prefix) — same family as
    walks._h60 / textstats.fingerprint_col so DuckDB oracles can replay
    it with ('0x' || substr(sha256(s), 1, 15))::BIGINT."""
    return F.conv(F.substring(F.sha2(col, 256), 1, 15), 16, 10).cast("long")


def negative_samples(
    edges: DataFrame,
    *,
    k: int = 3,
    num_buckets: int = 16,
    seed: str = "ns",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic negative sampling for link-prediction training data:
    for every node with at least one edge, propose up to ``k`` non-edges
    → (src, neg_dst, sample_idx).

    Draws are hash-routed, not RNG: draw i for node u targets bucket
    H(seed␟u␟i) mod B of the hash-bucketed vertex table and takes the
    bucket member minimizing H(u␟i␟v) — uniform-ish over vertices,
    reproducible on any engine with sha256 (the DuckDB oracle replays
    every draw). Self-loops and existing edges (either orientation) are
    anti-joined away afterwards, so some draws yield fewer than ``k``
    rows — standard for hash-based negative sampling; callers wanting
    exactly k oversample and re-trim.

    Scale shape: no global ordering anywhere (a row_number over the full
    vertex set — the naive indexing — is a single-partition collapse at
    web scale). The draw join is (nodes × k) against vertex buckets of
    ~n/B rows each on an equi-key, and the per-draw argmin is a bounded
    window inside one (node, i, bucket) group. B tunes the fan-in.
    """
    sep = F.lit("\x1f")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    vb = verts.select(
        "id", (_h60(F.col("id")) % num_buckets).alias("bucket")
    )
    draws = verts.select(F.col("id").alias("src")).crossJoin(
        F.broadcast(
            verts.sparkSession.range(1, k + 1).select(
                F.col("id").cast("int").alias("sample_idx")
            )
        )
    )
    draws = draws.select(
        "src",
        "sample_idx",
        (
            _h60(
                F.concat(
                    F.lit(seed), sep, F.col("src"), sep,
                    F.col("sample_idx").cast("string"),
                )
            )
            % num_buckets
        ).alias("bucket"),
    )
    cand = draws.join(vb, "bucket").select(
        "src",
        "sample_idx",
        F.col("id").alias("neg_dst"),
        _h60(
            F.concat(
                F.col("src"), sep, F.col("sample_idx").cast("string"),
                sep, F.col("id"),
            )
        ).alias("_score"),
    )
    w = Window.partitionBy("src", "sample_idx").orderBy(
        F.col("_score").asc(), F.col("neg_dst").asc()
    )
    picked = (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .where(F.col("neg_dst") != F.col("src"))
        .select("src", "neg_dst", "sample_idx")
    )
    sym = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).select("src", F.col("dst").alias("neg_dst"))
    return picked.join(sym, ["src", "neg_dst"], "left_anti")


def sample_neighbors(
    edges: DataFrame,
    *,
    fan_out: int = 10,
    seed: str = "sn",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """GraphSAGE-style deterministic neighbor sampling → at most
    ``fan_out`` neighbors per source node: (src, dst, draw_rank).

    GNN mini-batch training can't explode hub nodes' full adjacency —
    every framework samples a fixed fan-out per node per layer.  Doing it
    INSIDE the engine (instead of in the training loop) means the sampled
    adjacency ships once, is identical across epochs/workers, and is
    reproducible months later: the draw key is the portable 60-bit
    sha256 of (src, dst, seed), so any engine — and any future rerun on
    any cluster size — selects the same neighbors.  Compose per layer
    with different seeds for multi-hop sampling.

    Scale shape: ONE window per source node ordered by the hash draw
    (map-side WindowGroupLimit prunes to fan_out before the shuffle on
    modern Spark); hubs cost fan_out rows downstream no matter their
    degree.  No RNG state, no collect.
    """
    draw = _h60(
        F.concat_ws(chr(31), F.col(src), F.col(dst), F.lit(seed))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(src).orderBy("_draw", dst)
    return (
        edges.select(src, dst)
        .distinct()
        .withColumn("_draw", draw)
        .withColumn("draw_rank", F.row_number().over(w))
        .where(F.col("draw_rank") <= int(fan_out))
        .drop("_draw")
    )


def to_coo_graph(
    edges: DataFrame, *, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Tensor-ready COO export → (src, src_idx, dst, dst_idx): every
    node mapped to a contiguous 0-based integer index (dense, ordered by
    node id), every edge rewritten to index space.

    GNN frameworks (PyG/DGL) want exactly this shape — an edge_index
    tensor of contiguous ints plus the id↔index dictionary (carried here
    on every row so one output feeds both).  Index assignment is
    row_number over the globally SORTED distinct node ids — fully
    deterministic (same graph → same indices on any cluster), and the
    sort is a distributed range-partitioned exchange; only the final
    rank numbering is a single-pass window, over the ids-only node
    frame (orders of magnitude smaller than the edges).  The edge rewrite
    is two broadcast-able joins against that node frame.
    """
    from pyspark.sql import Window

    nodes = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
        .withColumn(
            "idx",
            F.row_number().over(Window.orderBy("id")) - F.lit(1),
        )
    )
    n_src = nodes.select(F.col("id").alias(src), F.col("idx").alias("src_idx"))
    n_dst = nodes.select(F.col("id").alias(dst), F.col("idx").alias("dst_idx"))
    return (
        edges.select(src, dst)
        .join(F.broadcast(n_src), src)
        .join(F.broadcast(n_dst), dst)
        .select(src, "src_idx", dst, "dst_idx")
    )
