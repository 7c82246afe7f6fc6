"""Distributed minimum spanning forest — Borůvka rounds.

Borůvka's algorithm is the classic shuffle-parallel MST: every round,
each component picks its minimum outgoing edge (one map-side-combinable
aggregation), the picked edges merge components (a connected-components
pass over the COMPONENT graph, which shrinks geometrically), and the
component count at least halves — O(log V) rounds regardless of graph
size.  That is the shape that survives 100 TB: each round is one
groupBy over the live edge set plus a CC pass over a frame whose size
is the number of components, not the number of edges.

Determinism: edges are compared by the lexicographic key
(weight, src, dst), a strict total order, so the selected forest is
THE unique minimum spanning forest under that order — any other
MST algorithm respecting the same order (the oracle replays Prim)
must produce the identical edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.iterutil import cut_lineage


def _boruvka_local(spark, e_rows, max_rounds, id_type) -> DataFrame:
    """Driver replay of the distributed Borůvka rounds — identical
    (weight, a, b, c_dst) struct minima (Python tuple compare), identical
    min-label contraction (the CC kernel), identical convergence error."""
    from pyspark.sql.types import LongType, StructField, StructType

    from graphrag_rs_spark.kernel.communities import union_find_components

    e = {(r["src"], r["dst"], r["weight"]) for r in e_rows}
    sym = list(e) + [(d, s, w) for s, d, w in e]
    comp = {}
    for s, d, _w in sym:
        comp[s] = s
    chosen: set = set()
    for _ in range(max_rounds):
        picks: dict = {}
        for s, d, w in sym:
            cs, cd = comp[s], comp[d]
            if cs == cd:
                continue
            a, b = (s, d) if s < d else (d, s)
            t = (w, a, b, cd)
            cur = picks.get(cs)
            if cur is None or t < cur:
                picks[cs] = t
        if not picks:
            break
        for w, a, b, _cd in picks.values():
            chosen.add((a, b, w))
        merged = union_find_components(
            [(cs, t[3]) for cs, t in picks.items()], []
        )
        comp = {v: merged.get(c, c) for v, c in comp.items()}
    else:
        raise RuntimeError(
            f"boruvka_msf did not converge in {max_rounds} rounds"
        )
    schema = StructType(
        [
            StructField("src", id_type),
            StructField("dst", id_type),
            StructField("weight", LongType()),
        ]
    )
    return spark.createDataFrame(sorted(chosen), schema)


def boruvka_msf(
    edges: DataFrame,
    *,
    max_rounds: int = 20,
    collect_threshold: int = 500_000,
) -> DataFrame:
    """edges(src, dst, weight) → the minimum spanning forest
    (src, dst, weight), one row per tree edge, endpoints in the input's
    canonical orientation (src < dst recommended).

    Undirected semantics: each input row is one undirected edge; both
    directions are considered for "outgoing".  Ties are broken by the
    total order (weight, src, dst), making the forest unique.

    Small edge lists replay the identical rounds driver-side (each
    distributed round costs ~4 actions incl. a CC pass; parity pinned in
    tests/test_mst.py); NULL endpoints/weights keep the distributed plan
    (Python tuples cannot mirror Spark's null struct ordering).
    """
    from graphrag_rs_spark.operators.cc import connected_components

    e = (
        edges.select(
            "src", "dst", F.col("weight").cast("long").alias("weight")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    if collect_threshold:
        e_rows = e.limit(collect_threshold + 1).collect()
        if len(e_rows) <= collect_threshold and not any(
            r["src"] is None or r["dst"] is None or r["weight"] is None
            for r in e_rows
        ):
            return _boruvka_local(
                edges.sparkSession, e_rows, max_rounds,
                edges.schema["src"].dataType,
            )
    # canonical undirected id for output / dedupe of per-component picks
    sym = e.unionByName(
        e.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    comp = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    comp = cut_lineage(comp, tag="boruvka")
    chosen = None
    for _ in range(max_rounds):
        lab = (
            sym.join(
                comp.select(
                    F.col("id").alias("src"),
                    F.col("component").alias("c_src"),
                ),
                "src",
            )
            .join(
                comp.select(
                    F.col("id").alias("dst"),
                    F.col("component").alias("c_dst"),
                ),
                "dst",
            )
            .where(F.col("c_src") != F.col("c_dst"))
        )
        # min outgoing edge per component under (weight, src, dst):
        # orient canonically first so both directions agree on the key
        keyed = lab.select(
            "c_src",
            "c_dst",
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            "weight",
        )
        picks = (
            keyed.groupBy("c_src")
            .agg(F.min(F.struct("weight", "a", "b", "c_dst")).alias("m"))
            .select(
                F.col("m.a").alias("a"),
                F.col("m.b").alias("b"),
                F.col("m.weight").alias("weight"),
                F.col("c_src"),
                F.col("m.c_dst").alias("c_dst"),
            )
        )
        picks = cut_lineage(picks, tag="boruvka")
        if picks.limit(1).count() == 0:
            break
        new_edges = picks.select("a", "b", "weight").distinct()
        chosen = (
            new_edges
            if chosen is None
            else chosen.unionByName(new_edges).distinct()
        )
        chosen = cut_lineage(chosen, tag="boruvka")
        # contract: CC over the component graph (|components| rows)
        cgraph = picks.select(
            F.col("c_src").alias("src"), F.col("c_dst").alias("dst")
        )
        merged = connected_components(cgraph)
        comp = (
            comp.join(
                merged.withColumnRenamed("component", "newc")
                .withColumnRenamed("id", "component"),
                "component",
                "left",
            )
            .select(
                "id",
                F.coalesce("newc", "component").alias("component"),
            )
        )
        comp = cut_lineage(comp, tag="boruvka")
    else:
        raise RuntimeError(
            f"boruvka_msf did not converge in {max_rounds} rounds"
        )
    if chosen is None:
        return e.select("src", "dst", "weight").limit(0)
    return chosen.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "weight"
    )
