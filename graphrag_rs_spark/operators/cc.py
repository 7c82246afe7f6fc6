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
    collect_threshold: int = 500_000,
) -> DataFrame:
    """edges(src, dst) [+ vertices(id)] → (id, component) with
    component = min vertex id (string order) in the component.

    Isolated vertices (in ``vertices`` but in no edge) map to themselves.

    Graphs whose raw edge AND vertex counts fit under
    ``collect_threshold`` are solved by a driver-side vectorized hashmin
    (numpy label propagation with pointer jumping) — the component label
    (min member id) is execution-order independent, so the result is
    identical by definition; what it saves is the ~2-action-per-
    superstep fixed cost that dominates small-to-medium graphs. The default
    crossover (500k) was re-measured after this sandbox's per-job fixed
    cost rose to ~1-2.5 s (gVisor serializes concurrent file syscalls
    per-process — see session.py). Memory bound: ~500k string-id edges ≈
    low hundreds of MB in the driver, well inside the configured heap;
    truly large graphs stay distributed. Set 0 to force the distributed
    path.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col("src") != F.col("dst")
    ).localCheckpoint(eager=True)

    if vertices is not None:
        verts = vertices.select(F.col(id_col).alias("id")).distinct()
    else:
        verts = e.select(F.col("src").alias("id")).union(
            e.select(F.col("dst").alias("id"))
        ).distinct()

    labels = verts.select("id", F.col("id").alias("component"))
    labels = labels.localCheckpoint(eager=True)

    if (
        collect_threshold
        and e.count() <= collect_threshold
        and labels.count() <= collect_threshold
    ):
        # driver small path works on the RAW directed edge list —
        # union(a,b) is symmetric, so the symmetrize+distinct shuffle the
        # distributed supersteps need is pure overhead here (one shuffle
        # + checkpoint of 2× the edges saved; threshold now bounds raw
        # edges, which only widens the small path — results are identical
        # on both paths by construction)
        from pyspark.sql.types import StructField, StructType

        import numpy as np
        import pandas as pd

        # Arrow both directions: toPandas / createDataFrame(pandas) are
        # ~10× faster than row-wise py4j collect at these sizes
        epdf = e.toPandas()
        vpdf = labels.select("id").toPandas()
        # parity with the distributed path when ``vertices`` is NOT a
        # superset of edge endpoints: a non-vertex endpoint has no label
        # there, so its edges propagate nothing and it never appears in
        # the output — drop those edges before labeling (otherwise a
        # ghost endpoint could bridge components or become a label).
        # Everything below is vectorized (the per-edge Python loop this
        # replaces was the small path's dominant cost at ~500k edges):
        # ids are coded against the SORTED vertex list so min-code ==
        # min-id, then hashmin label propagation with pointer jumping
        # runs in O(log n) numpy passes — same fixpoint as union-find.
        ids = np.sort(vpdf["id"].to_numpy())
        code = pd.Series(np.arange(len(ids)), index=ids)
        sc_ = epdf["src"].map(code)
        dc_ = epdf["dst"].map(code)
        ok = sc_.notna() & dc_.notna()
        sarr = sc_[ok].to_numpy(dtype=np.int64)
        darr = dc_[ok].to_numpy(dtype=np.int64)
        lab = np.arange(len(ids), dtype=np.int64)
        while True:
            prev = lab.copy()
            np.minimum.at(lab, sarr, lab[darr])
            np.minimum.at(lab, darr, lab[sarr])
            lab = np.minimum(lab, lab[lab])  # pointer jumping
            if np.array_equal(lab, prev):
                # at fixpoint every edge has equal labels on both ends and
                # labels only take component-member codes, so lab[v] IS the
                # component min — no separate compression pass needed
                break
        id_type = labels.schema["id"].dataType
        out = labels.sparkSession.createDataFrame(
            pd.DataFrame({"id": ids, "component": ids[lab]}),
            StructType(
                [
                    StructField("id", id_type, False),
                    StructField("component", id_type, False),
                ]
            ),
        )
        if len(ids) > 100_000:
            # very large results: materialize executor-side once — a
            # plain LocalRelation is re-shipped from the driver on every
            # scan (threshold raised 10k→100k: Arrow ships 100k pairs in
            # ~ms, while repartition+checkpoint is 2 jobs of fixed cost)
            out = out.repartition(e.sparkSession.sparkContext.defaultParallelism)
            out = out.localCheckpoint(eager=True)
        return out

    # undirected: both directions (distributed supersteps only) — one
    # explode instead of a self-union so the upstream edge derivation is
    # evaluated once in this action (identical row multiset)
    from graphrag_rs_spark.iterutil import both_dirs

    sym = both_dirs(e).distinct().localCheckpoint(eager=True)

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
