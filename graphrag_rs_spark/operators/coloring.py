"""Jones–Plassmann parallel greedy graph coloring.

The JP algorithm (Jones & Plassmann 1993) is the standard way to color
a graph with shuffle-parallel rounds: give every vertex a hash
priority; each round, every still-uncolored vertex that is a LOCAL
MAXIMUM among its uncolored neighbours picks the smallest color absent
from its already-colored neighbourhood.  Adjacent vertices can never
win the same round, so there are no conflicts to repair, and the
expected round count is O(log n / log log n) on bounded-degree graphs.

Scale shape: each round is two equi-joins (loser detection + used-color
collection) and one aggregation over the LIVE vertex set, which shrinks
every round — no driver-side state, no per-vertex Python.  Priorities
use the portable 60-bit sha256 family (linkpred._h60), so a SQL oracle
replays every round bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.iterutil import cut_lineage
from graphrag_rs_spark.operators.linkpred import _h60


def _jp_local(
    spark, edge_rows: list, id_type, seed: str, max_rounds: int
) -> DataFrame:
    """Driver-exact replica of the synchronous JP rounds for graphs
    under the collect threshold (guarded small-path pattern): the same
    (_h60(seed‖id), id) priority, the same winners-per-round / mex over
    EARLIER-round neighbour colors, the same max_rounds raise.  Only
    taken for all-ASCII string ids — the tie-break compares ids, and
    Python code-point order matches Spark's UTF8 binary order only on
    ASCII (the same guard class as the linker's non-ASCII parity fix)."""
    import hashlib

    from pyspark.sql import types as T

    def h60(s: str) -> int:
        return int(hashlib.sha256(s.encode()).hexdigest()[:15], 16)

    adj: dict = {}
    for s, d in edge_rows:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    prio = {v: h60(f"{seed}\x1f{v}") for v in adj}
    unc = set(adj)
    color: dict = {}
    rnd_of: dict = {}
    converged = False
    for rnd in range(1, max_rounds + 1):
        if not unc:
            converged = True
            break
        winners = [
            v
            for v in unc
            if all(
                (prio[u], u) < (prio[v], v)
                for u in adj[v]
                if u in unc and u != v
            )
        ]
        for v in winners:
            used = sorted({color[u] for u in adj[v] if u in color})
            c = 0
            for u in used:
                if u == c:
                    c += 1
            color[v] = c
            rnd_of[v] = rnd
        unc.difference_update(winners)
    if not converged and unc:
        raise RuntimeError(
            f"jones_plassmann_coloring did not converge in {max_rounds} rounds"
        )
    schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("color", T.IntegerType()),
            T.StructField("round", T.IntegerType()),
        ]
    )
    return spark.createDataFrame(
        [(v, color[v], rnd_of[v]) for v in color], schema
    )


def jones_plassmann_coloring(
    edges: DataFrame,
    *,
    seed: str = "jp",
    max_rounds: int = 40,
    collect_threshold: int = 200_000,
) -> DataFrame:
    """edges(src, dst) undirected → (id, color int, round int).

    color is the smallest non-negative integer not used by neighbours
    colored in EARLIER rounds (synchronous JP); round is 1-based and
    records when the vertex won — handy for plan/round diagnostics.
    Deterministic: priority = (_h60(seed‖id), id) descending.

    Below ``collect_threshold`` edges with all-ASCII string ids the
    identical rounds run on the driver (see :func:`_jp_local`) — the
    distributed loop pays ~4 join/agg jobs per round of pure scheduling
    on board-scale graphs.
    """
    from pyspark.sql import types as T

    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    if isinstance(edges.schema["src"].dataType, T.StringType):
        # probe and collect fused into one action
        probe_rows = e.limit(collect_threshold + 1).collect()
        if len(probe_rows) <= collect_threshold:
            rows = [(r[0], r[1]) for r in probe_rows]
            if all(
                v is not None and all(ord(ch) < 128 for ch in v)
                for rr in rows
                for v in rr
            ):
                return _jp_local(
                    edges.sparkSession,
                    rows,
                    edges.schema["src"].dataType,
                    seed,
                    max_rounds,
                )
    sym = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
    )
    sym = cut_lineage(sym, tag="jp-sym")
    prio = F.concat(F.lit(seed), F.lit("\x1f"), F.col("id"))
    unc = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("prio", _h60(prio))
    )
    unc = cut_lineage(unc, tag="jp")
    colored = None
    for rnd in range(1, max_rounds + 1):
        if unc.limit(1).count() == 0:
            break
        # losers: uncolored vertices with an uncolored neighbour of
        # strictly higher (prio, id)
        nbr = sym.join(
            unc.select(F.col("id").alias("src"), F.col("prio").alias("p_s")),
            "src",
        ).join(
            unc.select(F.col("id").alias("dst"), F.col("prio").alias("p_d")),
            "dst",
        )
        losers = (
            nbr.where(
                (F.col("p_d") > F.col("p_s"))
                | ((F.col("p_d") == F.col("p_s")) & (F.col("dst") > F.col("src")))
            )
            .select(F.col("src").alias("id"))
            .distinct()
        )
        winners = unc.join(losers, "id", "left_anti").select("id")
        # used colors: already-colored neighbours of each winner
        used = (
            sym.join(winners.withColumnRenamed("id", "src"), "src")
            .join(
                (
                    colored.select(
                        F.col("id").alias("dst"), F.col("color").alias("c")
                    )
                    if colored is not None
                    else winners.limit(0).select(
                        F.col("id").alias("dst"),
                        F.lit(0).cast("int").alias("c"),
                    )
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.array_sort(F.array_distinct(F.collect_list("c"))).alias("cs"))
        )
        new = (
            winners.join(used, "id", "left")
            .select(
                "id",
                F.aggregate(
                    F.coalesce("cs", F.array().cast("array<int>")),
                    F.lit(0).cast("int"),
                    lambda acc, c: F.when(c == acc, acc + 1).otherwise(acc),
                ).alias("color"),
                F.lit(rnd).cast("int").alias("round"),
            )
        )
        colored = (
            new if colored is None else colored.unionByName(new)
        )
        colored = cut_lineage(colored, tag="jp")
        unc = cut_lineage(unc.join(new, "id", "left_anti"), tag="jp")
    else:
        if unc.limit(1).count() > 0:
            raise RuntimeError(
                "jones_plassmann_coloring did not converge in "
                f"{max_rounds} rounds"
            )
    if colored is None:
        return sym.select(
            F.col("src").alias("id"),
            F.lit(0).cast("int").alias("color"),
            F.lit(0).cast("int").alias("round"),
        ).limit(0)
    return colored
