"""GNN-style feature propagation over the KG (no reference counterpart —
training-pipeline extension, same family as walks/linkpred: turning the
constructed graph into model inputs).

``feature_propagation`` runs K rounds of mean-aggregation smoothing

    h_{k+1}(v) = (h_k(v) + Σ_{u∈N(v)} h_k(u)) / (1 + |N(v)|)

over an undirected graph — the "SGC / LightGCN propagation" step that
precomputes message-passing features so the actual model trains on plain
vectors. Deterministic given the input (fixed rounds, no sampling), so a
DuckDB oracle can replay it in exploded (id, pos, val) form.

Scale shape: features are kept EXPLODED as (id, pos, val) rows during
propagation — one row per vector element — so each round is one key join
on the edge list plus one (id, pos) aggregation: all partial-aggregable,
nothing driver-side, no array UDFs. Re-assembly into array<double> is a
final sort-inside-group collect per id. For dim-d vectors the exploded
frame is d× the node count, the same blow-up any matmul-free distributed
SGC pays; d is bounded (embedding width), nodes are not — which is the
right side to scale on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.iterutil import cut_lineage


def feature_propagation(
    edges: DataFrame,
    features: DataFrame,
    *,
    rounds: int = 2,
    id_col: str = "id",
    feature_col: str = "features",
) -> DataFrame:
    """edges(src, dst) undirected + features(id, array<numeric>) →
    (id, features array<double>) after ``rounds`` of mean smoothing.

    Nodes missing from ``features`` are treated as absent from the graph
    (their rows are dropped by the join — supply zero vectors to include
    them); isolated nodes keep their own features (degree-0 ⇒ the update
    is h/1 = h).
    """
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    # one explode instead of a self-union: the upstream edge derivation
    # is evaluated once in this action (identical row multiset)
    from graphrag_rs_spark.iterutil import both_dirs

    sym = both_dirs(e).distinct().localCheckpoint(eager=True)
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("double").alias("_deg")
    )

    h = features.select(
        F.col(id_col).alias("id"),
        F.posexplode(feature_col).alias("pos", "val"),
    ).select("id", "pos", F.col("val").cast("double").alias("val"))

    for _ in range(rounds):
        nbr = (
            sym.join(h.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"), F.col("pos"))
            .agg(F.sum("val").alias("_nsum"))
        )
        h = cut_lineage(
            h.join(nbr, ["id", "pos"], "left")
            .join(deg, "id", "left")
            .select(
                "id",
                "pos",
                (
                    (F.col("val") + F.coalesce("_nsum", F.lit(0.0)))
                    / (F.lit(1.0) + F.coalesce("_deg", F.lit(0.0)))
                ).alias("val"),
            ),
            tag="featprop",
        )
    return h.groupBy("id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("val")))
            ),
            lambda s: s["val"],
        ).alias("features")
    )
