"""Deterministic anaphora resolution: nearest preceding antecedent.

The reference resolves entity mentions per chunk and leaves pronouns
unlinked (entity/extraction.rs mention layer); real KG construction
needs at least the deterministic recency heuristic — resolve each
anaphor (pronoun/determiner token) to the CLOSEST PRECEDING gazetteer
mention in the same document.  That recency rule is the classical
baseline every neural coref system is benchmarked against (Hobbs 1978's
first proposal; "last mentioned entity wins").

Spark-first shape: tokenization is one projection (split + posexplode),
and resolution is ONE window function — no self-join, no range join:
union mention rows and anaphor rows into a single (doc, pos) stream and
take ``last(mention, ignorenulls=True)`` over the preceding rows.  At
100 TB this is a map + one window shuffle partitioned by doc_id — the
same partitioning the chunker already uses, so AQE coalesces it; there
is no pairwise candidate blow-up at any scale.

Token positions are 1-based indices over NON-EMPTY lowercase tokens
(split on ``[^a-z0-9]+``), renumbered after the empty-token filter so
any engine that agrees on token ORDER replays identically regardless of
how its splitter treats leading/trailing separators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resolve_anaphora(
    chunks: DataFrame,
    gazetteer: DataFrame,
    *,
    anaphors: list[str],
    max_distance: int | None = None,
) -> DataFrame:
    """chunks(doc_id, content) + gazetteer(name, entity_type) →
    (doc_id, anaphor_pos, anaphor, antecedent, entity_type,
    antecedent_pos, distance).

    One row per anaphor occurrence that has at least one preceding
    gazetteer mention in the same document (unresolved anaphors are
    dropped — the caller left-joins if it wants them).  ALL occurrences
    of every gazetteer name are antecedent candidates; the winner is
    the one with the largest token position strictly below the
    anaphor's.  ``max_distance`` (token count) optionally prunes stale
    antecedents.  Gazetteer names that are themselves anaphors are
    rejected — one token can't be both.
    """
    if not anaphors:
        raise ValueError("anaphors must name at least one token")
    from graphrag_rs_spark.operators.extraction import GAZETTEER_MAX_ROWS

    if gazetteer.limit(GAZETTEER_MAX_ROWS + 1).count() > GAZETTEER_MAX_ROWS:
        raise ValueError(
            f"gazetteer exceeds {GAZETTEER_MAX_ROWS} rows — it is "
            "broadcast (see gazetteer_mentions for the rationale and "
            "the blocked alternative)"
        )
    an_set = {a.lower() for a in anaphors}
    clash = [
        r[0]
        for r in gazetteer.where(
            F.lower(F.col("name")).isin(*an_set)
        ).collect()
    ]
    if clash:
        raise ValueError(
            f"gazetteer names {clash!r} are also anaphors — a token "
            "cannot be both antecedent and anaphor"
        )

    toks = (
        chunks.select(
            "doc_id",
            F.posexplode(
                F.split(F.lower(F.col("content")), "[^a-z0-9]+")
            ).alias("_raw_pos", "tok"),
        )
        .where(F.col("tok") != "")
        .select(
            "doc_id",
            F.row_number()
            .over(Window.partitionBy("doc_id").orderBy("_raw_pos"))
            .alias("pos"),
            "tok",
        )
    )
    g = F.broadcast(
        # min(entity_type) per lowercased name: dropDuplicates would pick
        # a partition-order-dependent row when two differently-cased
        # names share a lowercase form — deterministic-by-construction
        gazetteer.select(
            F.lower(F.col("name")).alias("tok"), "entity_type"
        )
        .groupBy("tok")
        .agg(F.min("entity_type").alias("entity_type"))
    )
    stream = toks.join(g, "tok", "left").select(
        "doc_id",
        "pos",
        "tok",
        F.when(
            F.col("entity_type").isNotNull(),
            F.struct(
                F.col("pos").alias("a_pos"),
                F.col("tok").alias("name"),
                F.col("entity_type").alias("etype"),
            ),
        ).alias("mention"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    resolved = (
        stream.withColumn(
            "ante", F.last("mention", ignorenulls=True).over(w)
        )
        .where(F.col("tok").isin(*an_set) & F.col("ante").isNotNull())
        .select(
            "doc_id",
            F.col("pos").alias("anaphor_pos"),
            F.col("tok").alias("anaphor"),
            F.col("ante.name").alias("antecedent"),
            F.col("ante.etype").alias("entity_type"),
            F.col("ante.a_pos").alias("antecedent_pos"),
            (F.col("pos") - F.col("ante.a_pos")).alias("distance"),
        )
    )
    if max_distance is not None:
        resolved = resolved.where(F.col("distance") <= int(max_distance))
    return resolved
