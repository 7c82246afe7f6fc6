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

from graphrag_rs_spark.iterutil import cut_lineage


def label_propagation(edges: DataFrame, n_rounds: int = 5) -> DataFrame:
    """edges(src, dst) undirected → (id, label) after ``n_rounds``
    synchronous rounds; initial label = own id; a node's new label is the
    mode of its NEIGHBORS' labels (count desc, label asc tie-break)."""
    e = edges.select("src", "dst").distinct()
    sym = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
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
