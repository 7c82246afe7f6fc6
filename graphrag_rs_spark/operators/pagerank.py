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

Below ``collect_threshold`` edges the identical iteration runs on the
driver (same reset quirk, dangling handling, and tol/check_every break
cadence) — the scc.tarjan/kcenter guarded-small-path pattern.  The
composed retrieval paths run PPR over KGs extracted from a query's hit
set (tens of nodes); 10 distributed rounds on a 7-node graph cost ~10 s
of pure scheduling, the driver replay ~1 ms.  Float sums associate in a
different order than Spark's partial aggregation, so last-ulp drift vs
the distributed path is possible — consumers already round ranks (6 dp
on every board row), same tolerance class as the DuckDB oracle replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.iterutil import cut_lineage


def _pagerank_local(
    spark,
    rows,
    id_type,
    damping: float,
    max_iterations: int,
    tol: float,
    check_every: int,
    seed_rows,
) -> DataFrame:
    """Driver replay of the exact distributed iteration for small edge
    lists — same reset quirk, dangling redistribution, and break
    cadence."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        [StructField("id", id_type), StructField("rank", DoubleType())]
    )
    outw: dict = {}
    verts = set()
    for r in rows:
        verts.add(r["src"])
        verts.add(r["dst"])
        outw[r["src"]] = outw.get(r["src"], 0.0) + float(r["weight"])
    n = len(verts)
    if n == 0:
        return spark.createDataFrame([], out_schema)
    edges = [
        (r["src"], r["dst"], float(r["weight"]) / outw[r["src"]])
        for r in rows
    ]
    reset = {v: 1.0 / n for v in verts}
    if seed_rows is not None:
        total = sum(float(s["prob"]) for s in seed_rows)
        if total > 0.0:
            for s in seed_rows:
                if s["id"] in reset:
                    reset[s["id"]] = float(s["prob"]) / total
    ranks = {v: 1.0 / n for v in verts}
    dangling = [v for v in verts if v not in outw]
    for i in range(max_iterations):
        dm = sum(ranks[v] for v in dangling)
        incoming: dict = {}
        for s, d, p in edges:
            incoming[d] = incoming.get(d, 0.0) + ranks[s] * p
        new = {
            v: (1.0 - damping) * reset[v]
            + damping * (incoming.get(v, 0.0) + dm / n)
            for v in verts
        }
        if tol > 0.0 and (i + 1) % check_every == 0:
            delta = sum(abs(new[v] - ranks[v]) for v in verts)
            ranks = new
            if delta < tol:
                break
        else:
            ranks = new
    return spark.createDataFrame(list(ranks.items()), out_schema)


def pagerank(
    edges: DataFrame,
    *,
    damping: float = 0.85,
    max_iterations: int = 20,
    tol: float = 1e-6,
    check_every: int = 5,
    reset_probs: DataFrame | None = None,
    collect_threshold: int = 200_000,
) -> DataFrame:
    """edges(src, dst, weight) directed → (id, rank).

    ``reset_probs``: optional (id, prob) seed frame for personalized
    PageRank (pagerank.rs build_reset_vector). Without it, Σ ranks = 1.
    """
    # probe and collect fused into ONE action: limit(T+1).collect() both
    # answers "is it small?" and, when yes, already holds the edge list —
    # the separate count() probe re-ran the whole edge derivation (often
    # an extraction pipeline) a second time before collecting
    probe_rows = edges.select("src", "dst", "weight").limit(
        collect_threshold + 1
    ).collect()
    if len(probe_rows) <= collect_threshold:
        return _pagerank_local(
            edges.sparkSession,
            probe_rows,
            edges.schema["src"].dataType,
            damping,
            max_iterations,
            tol,
            check_every,
            reset_probs.select("id", "prob").collect()
            if reset_probs is not None
            else None,
        )
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
    matching the reference's undirected projection (core/mod.rs:1054-1073).

    Symmetrization rides ONE explode instead of a self-union: the union
    form evaluates the whole upstream triple derivation twice per action
    (Spark shares no non-materialized subtrees), which doubles the cost
    of every probe/collect when the triples come off an extraction
    pipeline. Row multiset is identical."""
    w = F.col("confidence").cast("double")
    return pagerank(
        triples.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("subj").alias("src"),
                        F.col("obj").alias("dst"),
                        w.alias("weight"),
                    ),
                    F.struct(
                        F.col("obj").alias("src"),
                        F.col("subj").alias("dst"),
                        w.alias("weight"),
                    ),
                )
            ).alias("_e")
        ).select("_e.src", "_e.dst", "_e.weight"),
        **kwargs,
    )


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
