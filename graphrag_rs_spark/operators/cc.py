"""Connected components — iterative hashmin label propagation.

The shared kernel behind entity-linking cluster resolution (L1), community
refinement (G1 phase 3) and the CC fallback (graph/analytics.rs:97-130).
The reference walks an in-memory petgraph; at cluster scale we iterate
DataFrame joins (GraphFrames-style small-label-wins):

    label(v) ← min(label(v), min over neighbors u of label(u))

until fixpoint. Labels are the (string) vertex ids themselves, so the
result is deterministic under any partitioning/execution order: the
component label is the lexicographically smallest member id — a total-order
tie-break, stable across re-runs (SURVEY §7 determinism requirement).

Scale notes:
- each superstep is one shuffle (join) + one shuffle (groupBy min);
  iteration count is O(diameter) — name-similarity clusters have tiny
  diameters (2-4 supersteps typical)
- lineage is cut with an eager localCheckpoint every superstep, so the
  convergence probe and the next round read materialized state instead of
  re-executing a growing join lineage (else the plan doubles per round
  and the driver OOMs at scale)
- skewed (hot) vertices: the groupBy(min) is an algebraic aggregate, so
  map-side partial aggregation already collapses hot keys before the
  shuffle; AQE skew-join splitting handles the join side
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    *,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    max_iterations: int = 50,
) -> DataFrame:
    """edges(src, dst) [+ vertices(id)] → (id, component) with
    component = min vertex id (string order) in the component.

    Isolated vertices (in ``vertices`` but in no edge) map to themselves.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col("src") != F.col("dst")
    )
    # undirected: both directions
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()

    if vertices is not None:
        verts = vertices.select(F.col(id_col).alias("id")).distinct()
    else:
        verts = sym.select(F.col("src").alias("id")).distinct()

    labels = verts.select("id", F.col("id").alias("component"))
    sym = sym.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)

    for it in range(max_iterations):
        # neighbor minimum: join labels onto edge sources, aggregate at dst
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.min("component").alias("nbr_component"))
            .withColumnRenamed("dst", "id")
        )
        # eager checkpoint every superstep: the convergence probe and the
        # next iteration both read the materialized result instead of
        # re-executing the join lineage (GraphFrames-style cadence)
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
                (F.col("nbr_component") < F.col("component")).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break

    return labels
