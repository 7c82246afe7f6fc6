"""Full k-core (coreness / shell) decomposition by ascending peeling.

coreness(v) = the largest k such that v belongs to the k-core (the
maximal subgraph of minimum degree ≥ k).  Batagelj–Zaveršnik peeling,
parallelized the standard way: for k ascending, repeatedly delete every
node whose current degree is below k (all at once — cascades settle in
a few inner rounds since each pass removes a full frontier); deleted
nodes get shell k−1.

Scale shape: every inner round is one degree aggregation and two
semi-joins over a strictly shrinking edge set, lineage-cut per round.
Total rounds = Σ_k (peel depth at k), bounded by the graph degeneracy
times the longest cascade — small for real-world graphs (web/social
degeneracy ≪ 1000).  For adversarial long-chain graphs the
locality-based algorithm (Montresor et al. 2013) trades rounds for
messages; this peeling form matches the reference suite's exact-peel
contract and raises rather than returning unconverged output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.iterutil import cut_lineage


def _core_decomposition_local(
    spark, edge_rows: list, id_type, max_k: int, max_inner: int
) -> DataFrame:
    """Driver-exact replica of the peel loop for graphs under the
    collect threshold (the scc.tarjan / kcenter / pagerank guarded
    small-path pattern): identical ascending-k batch peeling — victims
    are ALL nodes under degree k at once, degree counts DISTINCT live
    neighbours — and identical max_inner / max_k raise contracts.
    Pure integer math, so parity is exact by construction (path-equality
    pinned in tests/test_coreness_coloring_small_path.py)."""
    from pyspark.sql import types as T

    adj: dict = {}
    for s, d in edge_rows:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    nodes = set(adj)
    rows = []
    finished = False
    for k in range(1, max_k + 1):
        if not nodes:
            finished = True
            break
        settled = False
        for _ in range(max_inner):
            victims = [v for v in nodes if len(adj[v]) < k]
            if not victims:
                settled = True
                break
            for v in victims:
                for u in adj.pop(v):
                    adj[u].discard(v)
                nodes.discard(v)
                rows.append((v, k - 1))
        if not settled:
            raise RuntimeError(
                f"core_decomposition stage k={k} did not settle in "
                f"{max_inner} rounds"
            )
    if not finished:
        # mirrors the distributed for-else: the raise fires whenever the
        # k-loop exhausts its range without observing an empty node set
        raise RuntimeError(
            f"core_decomposition did not finish below max_k={max_k}"
        )
    if not rows:
        return spark.createDataFrame([], "id string, coreness int")
    schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("coreness", T.IntegerType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def core_decomposition(
    edges: DataFrame,
    *,
    max_k: int = 128,
    max_inner: int = 200,
    collect_threshold: int = 200_000,
) -> DataFrame:
    """edges(src, dst) undirected → (id, coreness int) for every node
    that appears in at least one (non-self-loop) edge.

    Below ``collect_threshold`` edges the identical peel runs on the
    driver: the distributed loop pays one degree-agg + two semi-join
    jobs per cascade round (~0.5 s scheduling each on an idle cluster),
    which dominates board-scale graphs whose whole peel is microseconds
    of arithmetic."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    # probe and collect fused into one action
    probe_rows = e.limit(collect_threshold + 1).collect()
    if len(probe_rows) <= collect_threshold:
        return _core_decomposition_local(
            edges.sparkSession,
            [(r[0], r[1]) for r in probe_rows],
            edges.schema["src"].dataType,
            max_k,
            max_inner,
        )
    sym = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
    )
    live = cut_lineage(sym, tag="coreness")
    nodes = live.select(F.col("src").alias("id")).distinct()
    nodes = cut_lineage(nodes, tag="coreness")
    out = None
    for k in range(1, max_k + 1):
        if nodes.limit(1).count() == 0:
            break
        for _ in range(max_inner):
            deg = (
                nodes.join(
                    live.groupBy(F.col("src").alias("id")).agg(
                        F.count("*").alias("d")
                    ),
                    "id",
                    "left",
                )
                .select("id", F.coalesce("d", F.lit(0)).alias("d"))
            )
            deg = cut_lineage(deg, tag="coreness")
            victims = deg.where(F.col("d") < k).select("id")
            if victims.limit(1).count() == 0:
                break
            shell = victims.withColumn(
                "coreness", F.lit(k - 1).cast("int")
            )
            out = shell if out is None else out.unionByName(shell)
            out = cut_lineage(out, tag="coreness")
            nodes = cut_lineage(
                nodes.join(victims, "id", "left_anti"), tag="coreness"
            )
            live = cut_lineage(
                live.join(
                    victims.withColumnRenamed("id", "src"),
                    "src",
                    "left_anti",
                ).join(
                    victims.withColumnRenamed("id", "dst"),
                    "dst",
                    "left_anti",
                ),
                tag="coreness",
            )
        else:
            raise RuntimeError(
                f"core_decomposition stage k={k} did not settle in "
                f"{max_inner} rounds"
            )
    else:
        raise RuntimeError(
            f"core_decomposition did not finish below max_k={max_k}"
        )
    if out is None:
        return edges.sparkSession.createDataFrame([], "id string, coreness int")
    return out
