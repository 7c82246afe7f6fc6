"""G5: (Personalized) PageRank — iterative DataFrame joins.

Reference: graph/pagerank.rs builds a CSR sparse adjacency from
relationship confidences (core/mod.rs:845-887) with damping 0.85,
tol 1e-6, max 100 iterations, ``personalized: true`` by default
(pagerank.rs:17-52). Its iteration (pagerank_iteration_parallel,
pagerank.rs:~300):

    rank'(v) = (1-d)·reset(v) + d·( Σ_{u→v} rank(u)·w(u,v)/outw(u)
                                    + Σ_{dangling u} rank(u)/n )

- reset vector (build_reset_vector): uniform 1/n by default; when reset
  probabilities are supplied they are normalized to sum 1 and OVERRIDE
  the entries for those nodes while every other node KEEPS its 1/n
  default — a reference quirk (the vector then sums to >1) preserved
  here for parity.
- dangling nodes redistribute their mass uniformly (1/n to every node),
  NOT via the reset vector — also the reference's behavior.

Distributed form: one join+groupBy job per iteration. The dangling mass
is folded into the same job as a 1-row aggregate crossJoin (round 1 ran
a separate collect per iteration — two driver actions where one
suffices), and the convergence delta is probed every ``check_every``
iterations instead of every round. ``tol=0.0`` disables the probe
entirely and runs exactly ``max_iterations`` rounds (used by the
fixed-iteration DuckDB oracle). Rank state is truncated per iteration
with iterutil.cut_lineage (see iterutil.py for why localCheckpoint is
not sufficient for iterative planning cost).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.iterutil import cut_lineage


def pagerank(
    edges: DataFrame,
    *,
    damping: float = 0.85,
    max_iterations: int = 20,
    tol: float = 1e-6,
    check_every: int = 5,
    reset_probs: DataFrame | None = None,
) -> DataFrame:
    """edges(src, dst, weight) directed → (id, rank).

    ``reset_probs``: optional (id, prob) seed frame for personalized
    PageRank (pagerank.rs build_reset_vector). Without it, Σ ranks = 1.
    """
    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    if n == 0:
        return verts.withColumn("rank", F.lit(0.0))

    outw = edges.groupBy("src").agg(F.sum("weight").alias("outw"))
    norm_edges = (
        edges.join(outw, "src")
        .select("src", "dst", (F.col("weight") / F.col("outw")).alias("p"))
        .localCheckpoint(eager=True)
    )

    # reset vector: uniform 1/n, seed entries overridden by prob/total
    # (reference quirk: non-seed entries keep 1/n — see module docstring)
    if reset_probs is not None:
        total_row = reset_probs.agg(F.sum("prob").alias("t")).collect()[0]
        total = float(total_row["t"] or 0.0)
        if total > 0.0:
            reset = verts.join(
                reset_probs.select("id", (F.col("prob") / F.lit(total)).alias("r")),
                "id",
                "left",
            ).select("id", F.coalesce("r", F.lit(1.0 / n)).alias("reset"))
        else:
            reset = verts.select("id", F.lit(1.0 / n).alias("reset"))
    else:
        reset = verts.select("id", F.lit(1.0 / n).alias("reset"))
    reset = reset.localCheckpoint(eager=True)

    ranks = reset.select("id", F.lit(1.0 / n).alias("rank"))
    dangling = verts.join(
        norm_edges.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    ).localCheckpoint(eager=True)

    for i in range(max_iterations):
        # dangling mass as a 1-row aggregate, folded into the update job
        # via a broadcast crossJoin — no separate driver action
        dm = dangling.join(ranks, "id").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        contrib = (
            norm_edges.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("incoming"))
            .withColumnRenamed("dst", "id")
        )
        new_ranks = cut_lineage(
            reset.join(ranks.select("id", F.col("rank").alias("old_rank")), "id")
            .join(contrib, "id", "left")
            .crossJoin(F.broadcast(dm))
            .select(
                "id",
                (
                    F.lit(1.0 - damping) * F.col("reset")
                    + F.lit(damping)
                    * (F.coalesce("incoming", F.lit(0.0)) + F.col("_dm") / F.lit(float(n)))
                ).alias("rank"),
                "old_rank",
            ),
            tag="pagerank",
        )
        ranks = new_ranks.select("id", "rank")
        if tol > 0.0 and (i + 1) % check_every == 0:
            delta = new_ranks.agg(
                F.sum(F.abs(F.col("rank") - F.col("old_rank"))).alias("d")
            ).collect()[0]["d"]
            if delta is not None and delta < tol:
                break
    return ranks


def pagerank_from_triples(triples: DataFrame, **kwargs) -> DataFrame:
    """Undirected PageRank over the triple graph (weight = confidence),
    matching the reference's undirected projection (core/mod.rs:1054-1073)."""
    e = triples.select(
        F.col("subj").alias("src"), F.col("obj").alias("dst"),
        F.col("confidence").cast("double").alias("weight"),
    )
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"))
    return pagerank(sym, **kwargs)


def personalized_pagerank_from_triples(
    triples: DataFrame, seeds: DataFrame, **kwargs
) -> DataFrame:
    """PPR over the undirected triple graph with seed entities.

    ``seeds``: (id) or (id, prob) frame — ids without a prob column get
    uniform seed probability. Matches pagerank.rs's default
    ``personalized: true`` retrieval entry point.
    """
    if "prob" not in seeds.columns:
        seeds = seeds.select("id", F.lit(1.0).alias("prob"))
    return pagerank_from_triples(triples, reset_probs=seeds, **kwargs)
