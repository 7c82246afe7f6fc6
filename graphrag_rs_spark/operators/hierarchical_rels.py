"""G9: hierarchical relationship clustering — multi-resolution communities
over the relationship (line-ish) graph.

Reference: graph/hierarchical_relationships.rs. Semantics transcribed:

- one node per relationship (triple);
- pairwise similarity (relationship_similarity :370-391):
      0.5 · [same relation type]
    + 0.3 · [same source OR same target]   (same SIDE only — subj↔obj
                                            crossings do not count)
    + 0.2 · temporal overlap ratio          (when both carry ranges)
  an edge exists iff similarity > 0.3 (build_relationship_graph :361),
  so same-pred pairs always connect (0.5) while a shared endpoint alone
  (exactly 0.3) does NOT — it needs temporal overlap on top;
- levels cluster the SAME graph at resolutions [1.0, 0.5, 0.2]
  (finest → coarsest, HierarchicalClusterer :211) with the shared
  modularity kernel (operators/communities.py);
- parent link: a level-k cluster's parent is the level-k+1 cluster
  holding the majority of its members (ties → smallest cluster id);
- per-cluster summary is extractive (top relation types + size), the
  deterministic stand-in for the reference's LLM summary slot;
- cohesion = mean intra-cluster pair similarity (with_cohesion :166).

Scale shape: the reference builds all O(n²) pairs. Distributed blocking
generates candidates from three keys (pred / source / target). A pred
shared by more than ``max_block_size`` relationships would be quadratic,
so oversized pred blocks are SALTED into sub-blocks (intra-sub-block
pairs only) — connectivity inside a big same-pred family is preserved
through the endpoint keys and modularity still coalesces it, while pair
fan-out stays O(n·max_block_size). Endpoint blocks use the same policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.communities import modularity_local_moving


def _with_rel_ids(triples: DataFrame) -> DataFrame:
    cols = ["subj", "pred", "obj"]
    extra = [c for c in ("valid_from", "valid_to") if c in triples.columns]
    return triples.select(
        F.concat_ws("|", *cols).alias("rel_id"), *cols, *extra
    ).dropDuplicates(["rel_id"])


def relationship_edges(
    triples: DataFrame, *, max_block_size: int = 200
) -> DataFrame:
    """→ (src, dst, weight): similarity edges between relationship nodes
    (weight = similarity, edges where similarity > 0.3)."""
    rels = _with_rel_ids(triples)
    has_temporal = "valid_from" in rels.columns and "valid_to" in rels.columns

    # all three key families ride ONE explode (the 3-way union scanned
    # rels three times per consumer)
    keyed = rels.select(
        "rel_id",
        F.explode(
            F.array(
                *[
                    F.concat(F.lit(prefix + ":"), F.col(col))
                    for prefix, col in (("p", "pred"), ("s", "subj"), ("o", "obj"))
                ]
            )
        ).alias("key"),
    )

    # salt oversized blocks: n_salt = ceil(block/max); pairs form within
    # (key, salt) only — bounded fan-out, deterministic. Only OVERSIZED
    # keys need their count (≤ rows/max_block_size of them by
    # construction — broadcast-safe at any scale, where broadcasting all
    # distinct keys is not); everyone else gets salt 0 via the coalesce
    # (ceil(bn/max) == 1 for bn ≤ max, so values are identical to the
    # previous full-sizes shuffle join).
    sizes = keyed.groupBy("key").agg(F.count("*").alias("bn"))
    hot = sizes.where(F.col("bn") > max_block_size)
    keyed = keyed.join(F.broadcast(hot), "key", "left").withColumn(
        "salt",
        F.pmod(
            F.xxhash64("rel_id"),
            F.greatest(
                F.ceil(F.coalesce(F.col("bn"), F.lit(1)) / F.lit(max_block_size)),
                F.lit(1),
            ),
        ),
    )

    a = keyed.select("key", "salt", F.col("rel_id").alias("id_a"))
    b = keyed.select("key", "salt", F.col("rel_id").alias("id_b"))
    cand = (
        a.join(b, ["key", "salt"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )

    side_cols = ["pred", "subj", "obj"] + (
        ["valid_from", "valid_to"] if has_temporal else []
    )
    ra = rels.select(F.col("rel_id").alias("id_a"), *[F.col(c).alias(f"{c}_a") for c in side_cols])
    rb = rels.select(F.col("rel_id").alias("id_b"), *[F.col(c).alias(f"{c}_b") for c in side_cols])
    pairs = cand.join(ra, "id_a").join(rb, "id_b")

    sim = (
        F.when(F.col("pred_a") == F.col("pred_b"), F.lit(0.5)).otherwise(F.lit(0.0))
        + F.when(
            (F.col("subj_a") == F.col("subj_b")) | (F.col("obj_a") == F.col("obj_b")),
            F.lit(0.3),
        ).otherwise(F.lit(0.0))
    )
    if has_temporal:
        # temporal_overlap :394-410 — overlap / mean(duration), clamped
        start = F.greatest("valid_from_a", "valid_from_b")
        end = F.least("valid_to_a", "valid_to_b")
        durs = (
            (F.col("valid_to_a") - F.col("valid_from_a"))
            + (F.col("valid_to_b") - F.col("valid_from_b"))
        ).cast("double") / 2.0
        overlap = F.when(
            F.col("valid_from_a").isNotNull()
            & F.col("valid_from_b").isNotNull()
            & (start < end),
            F.least((end - start).cast("double") / F.greatest(durs, F.lit(1.0)), F.lit(1.0)),
        ).otherwise(F.lit(0.0))
        sim = sim + F.lit(0.2) * overlap
    sim = F.least(sim, F.lit(1.0))

    return (
        pairs.withColumn("weight", sim)
        .where(F.col("weight") > 0.3)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "weight")
    )


def cluster_relationships(
    triples: DataFrame,
    *,
    resolutions: tuple[float, ...] = (1.0, 0.5, 0.2),
    max_block_size: int = 200,
    max_iterations: int = 12,
) -> DataFrame:
    """→ (level, rel_id, cluster_id, parent_cluster_id, resolution):
    one row per relationship per hierarchy level (level 0 = finest,
    resolution order per HierarchicalClusterer :211)."""
    e = relationship_edges(triples, max_block_size=max_block_size)
    # symmetrize with ONE explode instead of a self-union — the union
    # evaluated the whole salted pair-join pipeline twice in this single
    # action (same fix as pagerank_from_triples; identical row multiset)
    from graphrag_rs_spark.iterutil import both_dirs

    sym = (
        both_dirs(e, "weight")
        .groupBy("src", "dst")
        .agg(F.max("weight").alias("weight"))
        .localCheckpoint(eager=True)
    )
    all_ids = _with_rel_ids(triples).select(F.col("rel_id").alias("id"))

    levels: list[DataFrame] = []
    for lvl, res in enumerate(resolutions):
        labels = modularity_local_moving(
            sym, resolution=res, max_iterations=max_iterations,
            materialized=True,  # sym is checkpointed above — skip the copy
        )
        # isolated relationships (no similarity edges) are their own cluster
        labels = labels.unionByName(
            all_ids.join(labels, "id", "left_anti").select(
                "id", F.col("id").alias("label")
            )
        )
        levels.append(
            labels.select(
                F.lit(lvl).cast("long").alias("level"),
                F.col("id").alias("rel_id"),
                F.concat(F.lit(f"L{lvl}_"), F.xxhash64("label").cast("string")).alias(
                    "cluster_id"
                ),
                F.lit(float(res)).alias("resolution"),
            ).localCheckpoint(eager=True)
        )

    # parent = majority next-coarser cluster (ties → smallest parent id)
    out = []
    for lvl in range(len(levels)):
        cur = levels[lvl]
        if lvl + 1 < len(levels):
            nxt = levels[lvl + 1].select(
                "rel_id", F.col("cluster_id").alias("parent_cluster_id")
            )
            votes = (
                cur.join(nxt, "rel_id")
                .groupBy("cluster_id", "parent_cluster_id")
                .agg(F.count("*").alias("n"))
            )
            w = Window.partitionBy("cluster_id").orderBy(
                F.col("n").desc(), F.col("parent_cluster_id").asc()
            )
            parent = (
                votes.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select("cluster_id", "parent_cluster_id")
            )
            cur = cur.join(parent, "cluster_id", "left")
        else:
            cur = cur.withColumn("parent_cluster_id", F.lit(None).cast("string"))
        out.append(cur.select("level", "rel_id", "cluster_id", "parent_cluster_id", "resolution"))

    res_df = out[0]
    for df in out[1:]:
        res_df = res_df.unionByName(df)
    return res_df


def summarize_relationship_clusters(
    hierarchy: DataFrame,
    triples: DataFrame,
    *,
    top_types: int = 3,
    edges: DataFrame | None = None,
    max_block_size: int = 200,
) -> DataFrame:
    """→ (level, cluster_id, n_relationships, cohesion, summary):
    extractive per-cluster summary (top relation types) + cohesion =
    mean intra-cluster pair similarity.

    Pass ``edges`` (the symmetrized/combined frame is fine — weights are
    averaged) or at least the same ``max_block_size`` given to
    ``cluster_relationships``: cohesion must be computed over the SAME
    similarity edge set that produced the clusters, and recomputing with a
    different blocking cap silently scores a different graph."""
    rels = _with_rel_ids(triples).select("rel_id", "pred")
    members = hierarchy.join(rels, "rel_id")
    type_counts = members.groupBy("level", "cluster_id", "pred").agg(
        F.count("*").alias("n")
    )
    wt = Window.partitionBy("level", "cluster_id").orderBy(
        F.col("n").desc(), F.col("pred").asc()
    )
    tops = (
        type_counts.withColumn("rn", F.row_number().over(wt))
        .where(F.col("rn") <= top_types)
        .groupBy("level", "cluster_id")
        .agg(
            F.concat_ws(
                ", ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "pred", "n"))),
                    lambda s: F.concat(s["pred"], F.lit(" ("), s["n"].cast("string"), F.lit(")")),
                ),
            ).alias("top_type_line"),
            F.sum("n").alias("n_relationships"),
        )
    )

    # cohesion over intra-cluster similarity edges (reuse the caller's
    # edge frame when provided — avoids a full recompute AND a cap drift)
    e = edges if edges is not None else relationship_edges(
        triples, max_block_size=max_block_size
    )
    h = hierarchy.select("level", "rel_id", "cluster_id")
    intra = (
        e.join(h.withColumnRenamed("rel_id", "src").withColumnRenamed("cluster_id", "c_s"), "src")
        .join(
            h.select(
                F.col("level").alias("level_d"),
                F.col("rel_id").alias("dst"),
                F.col("cluster_id").alias("c_d"),
            ),
            "dst",
        )
        .where((F.col("level") == F.col("level_d")) & (F.col("c_s") == F.col("c_d")))
        .groupBy("level", F.col("c_s").alias("cluster_id"))
        .agg(F.avg("weight").alias("cohesion"))
    )

    return (
        tops.join(intra, ["level", "cluster_id"], "left")
        .select(
            "level",
            "cluster_id",
            "n_relationships",
            F.round(F.coalesce("cohesion", F.lit(0.0)), 4).alias("cohesion"),
            F.concat(
                F.col("n_relationships").cast("string"),
                F.lit(" relationships; top types: "),
                F.col("top_type_line"),
            ).alias("summary"),
        )
    )
