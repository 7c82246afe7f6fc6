"""Eigenvector centrality — shifted integer power iteration.

The Perron eigenvector of the adjacency matrix, the classic "important
because your neighbours are important" score (Bonacich 1972) that
PageRank/Katz/HITS all descend from; this is the undamped original.
Power iteration on A alone oscillates on bipartite graphs (trees!), so
the iteration runs on A + I — the standard spectral shift, which keeps
the dominant eigenvector and makes convergence unconditional on
connected graphs.

Scores live in integer micro-units with max-normalization and FLOOR
division every round (x' = (x + Σ_nbr x) · UNIT div max), so every
engine replays every iterate bit-exactly — the same drift-free contract
as simrank/katz here.  ``div`` stays in long arithmetic end to end
(a double division would lose ulps exactly where the oracle must not).

Scale shape: one round = one equi-join matvec (edges ⋈ x on src, sum
by dst — partial-agg map-side combine) + a 1-row max broadcast joined
in-plan (no driver round trip), lineage cut per round.  The hub skew
of the matvec is the groupBy's problem, which AQE skew-split handles;
nothing materializes beyond the (id, score) frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.iterutil import cut_lineage

UNIT = 1_000_000


def _eigenvector_local(
    spark, edge_rows: list, id_type, iterations: int
) -> DataFrame:
    """Driver-exact replica of the shifted integer power rounds for
    graphs under the collect threshold (guarded small-path pattern).
    Long arithmetic with floor division throughout — bit-identical to
    the distributed path by construction (path-equality pinned in
    tests/test_eigen_katz_small_path.py)."""
    from pyspark.sql import types as T

    sym: dict = {}
    for s, d in edge_rows:
        if s == d:
            continue
        sym.setdefault(s, set()).add(d)
        sym.setdefault(d, set()).add(s)
    x = {v: UNIT for v in sym}
    for _ in range(iterations):
        y = {v: x[v] + sum(x[u] for u in sym[v]) for v in sym}
        m = max(y.values()) if y else 1
        x = {v: (val * UNIT) // m for v, val in y.items()}
    schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("score", T.LongType()),
        ]
    )
    return spark.createDataFrame(sorted(x.items()), schema)


def eigenvector_centrality(
    edges: DataFrame,
    *,
    iterations: int = 6,
    collect_threshold: int = 200_000,
) -> DataFrame:
    """edges(src, dst) undirected → (id, score long): micro-unit
    eigenvector centrality after ``iterations`` shifted power rounds
    from the all-ones vector.  The max-scoring node is always exactly
    UNIT; isolated self-loops are dropped with the usual src != dst
    filter.  Below ``collect_threshold`` edges the identical integer
    rounds run on the driver — each distributed round costs a matvec
    join + max broadcast + parquet cut of pure scheduling at board
    scale."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    # probe and collect fused into one action
    probe_rows = e.limit(collect_threshold + 1).collect()
    if len(probe_rows) <= collect_threshold:
        return _eigenvector_local(
            edges.sparkSession,
            [(r[0], r[1]) for r in probe_rows],
            edges.schema["src"].dataType,
            iterations,
        )
    sym = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
    )
    sym = cut_lineage(sym, tag="eigen")
    x = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.lit(UNIT).cast("long").alias("s"))
    )
    x = cut_lineage(x, tag="eigen")
    for rnd in range(1, iterations + 1):
        y = (
            sym.join(x.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("s").alias("nbr"))
            .join(x, "id")
            .select("id", (F.col("s") + F.col("nbr")).alias("y"))
        )
        m = y.agg(F.max("y").alias("m"))
        x = y.crossJoin(F.broadcast(m)).select(
            "id", F.expr(f"y * {UNIT}L div m").alias("s")
        )
        # cut every round: each round references x three times (matvec,
        # shift join, norm), so an uncut second round re-executes the
        # first thrice — measured 16 s -> 33 s when batching two rounds
        # per cut on the 120-node board graph
        x = cut_lineage(x, tag="eigen")
    return x.select("id", F.col("s").alias("score"))
