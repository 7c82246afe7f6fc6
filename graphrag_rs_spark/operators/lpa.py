"""Synchronous label propagation — the cheap community method at scale.

Complements Leiden (operators/communities.py): LPA needs no modularity
math, no refinement — per round every node adopts the most frequent label
among its neighbors. On 100 TB-scale graphs it is the standard first-pass
clustering (GraphFrames ships exactly this) because each round is ONE
groupBy + ONE window over the edge list, embarrassingly parallel, and the
round count is small and fixed.

Determinism: classic async LPA is run-order dependent; this is the
SYNCHRONOUS variant with a total tie-break (count desc, then label asc),
so every round is a pure function of the previous labeling — the DuckDB
oracle replays rounds as unrolled CTEs and matches bit-for-bit. The cost
of synchrony is the known bipartite oscillation mode; fixed ``n_rounds``
(rather than convergence detection) keeps runs reproducible and bounded —
the reference's own iterative kernels pin iteration counts the same way
(pagerank.py:39 fixed 10 steps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphrag_rs_spark.iterutil import both_dirs, cut_lineage


def _label_propagation_local(
    spark, edge_rows: list, id_type, n_rounds: int
) -> DataFrame:
    """Driver-exact replica of the synchronous LPA rounds for graphs
    under the collect threshold (guarded small-path pattern): identical
    mode-of-neighbors update with the (count desc, label asc)
    tie-break. The tie-break compares labels (= ids), so the path is
    restricted by the caller to all-ASCII string ids or numeric ids —
    the JP-coloring ordering-guard class."""
    from pyspark.sql import types as T

    sym: dict = {}
    for s, d in edge_rows:
        sym.setdefault(s, set()).add(d)
        sym.setdefault(d, set()).add(s)
    labels = {v: v for v in sym}
    for _ in range(n_rounds):
        new = {}
        for v, nbrs in sym.items():
            counts: dict = {}
            for u in nbrs:
                lu = labels[u]
                counts[lu] = counts.get(lu, 0) + 1
            new[v] = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        labels = new
    schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("label", id_type),
        ]
    )
    return spark.createDataFrame(sorted(labels.items()), schema)


def label_propagation(
    edges: DataFrame, n_rounds: int = 5, *, collect_threshold: int = 200_000
) -> DataFrame:
    """edges(src, dst) undirected → (id, label) after ``n_rounds``
    synchronous rounds; initial label = own id; a node's new label is the
    mode of its NEIGHBORS' labels (count desc, label asc tie-break).

    Below ``collect_threshold`` edges with order-safe ids (numeric, or
    all-ASCII strings — the tie-break compares labels) the identical
    rounds run on the driver; each distributed round is a join + window
    + lineage cut of pure scheduling at board scale."""
    from pyspark.sql import types as T

    e = edges.select("src", "dst").distinct()
    id_dt = edges.schema["src"].dataType
    numeric_id = isinstance(
        id_dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
    )
    if numeric_id or isinstance(id_dt, T.StringType):
        # probe and collect fused into one action
        probe_rows = e.limit(collect_threshold + 1).collect()
        if len(probe_rows) <= collect_threshold:
            rows = [(r[0], r[1]) for r in probe_rows]
            ascii_ok = numeric_id or all(
                v is not None and all(ord(ch) < 128 for ch in v)
                for rr in rows
                for v in rr
            )
            if ascii_ok:
                return _label_propagation_local(
                    edges.sparkSession, rows, id_dt, n_rounds
                )
    sym = both_dirs(e).distinct().localCheckpoint(eager=True)
    labels = sym.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    )
    w = Window.partitionBy("id").orderBy(F.desc("c"), F.asc("label"))
    for r in range(n_rounds):
        nbr = sym.join(labels.withColumnRenamed("id", "dst"), "dst").select(
            F.col("src").alias("id"), "label"
        )
        labels = (
            nbr.groupBy("id", "label")
            .agg(F.count("*").alias("c"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("id", "label")
        )
        labels = cut_lineage(labels, "lpa")
    return labels


def lpa_round_ctes(
    edges_cte: str | None,
    n_rounds: int,
    *,
    prefix: str = "",
    edges_name: str = "e",
) -> str:
    """SQL replay: unrolled round CTEs over an ``{edges_name}(src,dst)``
    edge CTE (directed input; symmetrization + distinct happens here).
    Returns text defining ``{prefix}sym`` and ``{prefix}lab0..lab{n}``;
    select from ``{prefix}lab{n_rounds}``.

    ``prefix``/``edges_name`` let a query chain LPA levels (e.g. a second
    LPA pass over a contracted supergraph) without CTE-name collisions;
    pass ``edges_cte=None`` when the edge CTE is already defined upstream.
    """
    parts = [] if edges_cte is None else [edges_cte]
    parts += [
        f"""{prefix}sym AS (
            SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM {edges_name}
                UNION ALL SELECT dst, src FROM {edges_name})
        )""",
        f"{prefix}lab0 AS (SELECT DISTINCT src AS id, src AS label"
        f" FROM {prefix}sym)",
    ]
    for r in range(1, n_rounds + 1):
        parts.append(f"""{prefix}lab{r} AS (
            SELECT id, label FROM (
                SELECT g.src AS id, l.label, count(*) AS c,
                       row_number() OVER (
                           PARTITION BY g.src
                           ORDER BY count(*) DESC, l.label) AS rn
                FROM {prefix}sym g JOIN {prefix}lab{r - 1} l ON l.id = g.dst
                GROUP BY g.src, l.label
            ) WHERE rn = 1
        )""")
    return ",\n".join(parts)


def _seeded_local(
    spark, edge_rows: list, seed_rows: list, id_type, label_type, n_rounds: int
):
    """Driver-exact replica of the seeded freeze-once rounds; returns
    None (→ caller falls back to the distributed plan) on shapes the
    dict cannot mirror: NULL seed ids/labels, duplicate seed ids (their
    rows multiply both the vote count and the output join), or
    non-ASCII strings (the tie-break and output sort compare strings —
    the JP-coloring ordering-guard class)."""
    from pyspark.sql import types as T

    def _ascii_ok(v):
        return not isinstance(v, str) or all(ord(ch) < 128 for ch in v)

    seeds_map: dict = {}
    for i, l in seed_rows:
        if i is None or l is None or i in seeds_map:
            return None
        if not (_ascii_ok(i) and _ascii_ok(l)):
            return None
        seeds_map[i] = l
    adj: dict = {}
    nodes: set = set()
    for s, d in edge_rows:
        if not (_ascii_ok(s) and _ascii_ok(d)):
            return None
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
        nodes.add(s)
        nodes.add(d)

    labeled = {i: (l, 0) for i, l in seeds_map.items()}
    frontier = dict(seeds_map)
    for rnd in range(1, n_rounds + 1):
        votes: dict = {}
        for fnode, flabel in frontier.items():
            for nbr in adj.get(fnode, ()):
                if nbr in labeled:
                    continue
                counts = votes.setdefault(nbr, {})
                counts[flabel] = counts.get(flabel, 0) + 1
        if not votes:
            break
        adopted = {
            node: min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            for node, counts in votes.items()
        }
        for node, lab in adopted.items():
            labeled[node] = (lab, rnd)
        frontier = adopted

    rows = [
        (v, labeled[v][0], labeled[v][1]) if v in labeled else (v, None, None)
        for v in sorted(nodes)
    ]
    schema = T.StructType(
        [
            T.StructField("node", id_type),
            T.StructField("label", label_type),
            T.StructField("round", T.IntegerType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def seeded_label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    n_rounds: int = 5,
    collect_threshold: int = 200_000,
) -> DataFrame:
    """Semi-supervised label spreading (the seeded LPA of Zhu &
    Ghahramani 2002's hard-clamp family): propagate KNOWN labels from
    ``seeds(id, label)`` outward over the undirected graph →
    (node, label, round) — round = the hop at which the node was
    labeled (0 for seeds), NULL label/round for nodes never reached
    within ``n_rounds``.

    The KG-construction use: type inference — a gazetteer labels a few
    thousand entities, the co-occurrence graph labels the rest.
    Freeze-once semantics (a node's first-assigned label is permanent;
    seeds are clamped) with a total tie-break per adoption — majority
    of labeled neighbors, count desc then label asc — make every round
    a pure function of the previous state, so the DuckDB oracle
    replays rounds as unrolled CTEs and matches bit-for-bit. Unlike
    :func:`label_propagation` above (unsupervised, every node mutable)
    the labeled set only GROWS, so the per-round work is frontier ×
    edges, not graph × edges.

    Scale shape per round: one equi-join of the last frontier against
    the edge list, one partial-agg count per (node, label), one
    max_by-style min(struct) to pick the winner — ids and counts only,
    lineage cut per round. Below ``collect_threshold`` directed edges
    (and seeds) with order-safe ids/labels the identical rounds run on
    the driver (each distributed round is several fixed-cost jobs of
    pure scheduling at board scale); NULL/duplicate seeds and
    non-ASCII strings route to the distributed plan.
    """
    from pyspark.sql import types as T

    e0 = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    id_dt = edges.schema["src"].dataType
    label_dt = seeds.schema["label"].dataType
    _num = (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
    if (
        collect_threshold
        and isinstance(id_dt, _num + (T.StringType,))
        and isinstance(label_dt, _num + (T.StringType,))
    ):
        # probe and collect fused into one action (sibling pattern)
        probe_rows = e0.distinct().limit(collect_threshold + 1).collect()
        if (
            len(probe_rows) <= collect_threshold
            and n_rounds * max(len(probe_rows), 1) <= 20_000_000
        ):
            seed_rows = seeds.select("id", "label").limit(
                collect_threshold + 1
            ).collect()
            if len(seed_rows) <= collect_threshold:
                local = _seeded_local(
                    edges.sparkSession,
                    [(r[0], r[1]) for r in probe_rows],
                    [(r[0], r[1]) for r in seed_rows],
                    id_dt,
                    label_dt,
                    n_rounds,
                )
                if local is not None:
                    return local
    sym = both_dirs(e0).distinct().localCheckpoint(eager=True)
    nodes = sym.select(F.col("src").alias("node")).distinct()

    labeled = seeds.select(
        F.col("id").alias("node"),
        F.col("label"),
        F.lit(0).alias("round"),
    ).localCheckpoint(eager=True)
    frontier = labeled
    for rnd in range(1, n_rounds + 1):
        votes = (
            frontier.join(
                sym.withColumnRenamed("src", "node"), "node"
            )
            .select(F.col("dst").alias("node"), "label")
            .join(labeled.select("node"), "node", "left_anti")
            .groupBy("node", "label")
            .agg(F.count("*").alias("n"))
        )
        adopted = (
            votes.groupBy("node")
            .agg(F.min(F.struct((-F.col("n")).alias("neg"), F.col("label"))).alias("_w"))
            .select(
                "node",
                F.col("_w.label").alias("label"),
                F.lit(rnd).alias("round"),
            )
            .localCheckpoint(eager=True)
        )
        if adopted.limit(1).count() == 0:
            break
        labeled = labeled.unionByName(adopted).localCheckpoint(eager=True)
        frontier = adopted

    return nodes.join(labeled, "node", "left").select(
        "node", "label", F.col("round").cast("int").alias("round")
    )
