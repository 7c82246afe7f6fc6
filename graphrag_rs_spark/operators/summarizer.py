"""Q5: extractive summarization — sentence scoring + top-k selection.

Reference: text/extractive_summarizer.rs:9-325 scores sentences by term
frequency/position and selects the top k. Distributed: explode sentences
with position, score = Σ normalized tf of non-stopword terms + a
position bonus for leading sentences, window top-k per doc, re-assembled
in source order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.keywords import STOP_WORDS


def extractive_summary(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "content",
    top_k_sentences: int = 3,
) -> DataFrame:
    """→ (doc_id, summary): top-k sentences per doc joined in source order."""
    stop = F.array(*[F.lit(w) for w in sorted(STOP_WORDS)])
    sents = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(
                F.transform(F.split(F.col(text_col), r"[.!?]"), lambda s: F.trim(s)),
                lambda s: s != "",
            )
        ).alias("pos", "sentence"),
    )
    toks = sents.withColumn(
        "terms",
        F.filter(
            F.split(F.lower("sentence"), r"[^a-z0-9']+"),
            lambda t: (F.length(t) >= 3) & ~F.array_contains(stop, t),
        ),
    )
    term_rows = toks.select("doc_id", "pos", F.explode_outer("terms").alias("term"))
    tf = term_rows.where(F.col("term").isNotNull()).groupBy("doc_id", "term").agg(
        F.count("*").alias("tf")
    )
    scored = (
        term_rows.join(tf, ["doc_id", "term"], "left")
        .groupBy("doc_id", "pos")
        .agg(F.coalesce(F.sum("tf"), F.lit(0)).alias("term_score"))
        .withColumn("score", F.col("term_score") + F.when(F.col("pos") == 0, 2).otherwise(0))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("pos").asc())
    picked = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_k_sentences)
        .join(sents, ["doc_id", "pos"])
    )
    return (
        picked.groupBy("doc_id")
        .agg(
            F.concat_ws(
                ". ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "sentence"))),
                    lambda s: s["sentence"],
                ),
            ).alias("summary")
        )
    )
