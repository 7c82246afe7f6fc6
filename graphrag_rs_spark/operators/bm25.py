"""Q1: BM25 scoring — classic DataFrame TF/DF aggregation.

Reference: retrieval/bm25.rs:30-260 builds in-memory inverted-index maps
with k1=1.2, b=0.75 (bm25.rs:51-53). Distributed form: explode tokens →
tf per (doc, term), df per term, score = Σ_q idf·tf·(k1+1) /
(tf + k1·(1-b+b·dl/avgdl)) — two shuffles (tf groupBy, final groupBy),
df and corpus stats ride broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """→ (doc_id, bm25) for docs matching ≥1 query term (Robertson idf:
    ln((N-df+0.5)/(df+0.5)+1))."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
        ).alias("tokens"),
    )
    stats = toks.agg(
        F.count("*").alias("n_docs"), F.avg(F.size("tokens")).alias("avgdl")
    )

    q = docs.sparkSession.createDataFrame([(t,) for t in query_terms], ["term"])
    tf = (
        toks.crossJoin(F.broadcast(q))
        .select(
            "doc_id",
            "term",
            F.size("tokens").alias("dl"),
            F.size(F.filter("tokens", lambda x: x == F.col("term"))).alias("tf"),
        )
        .where(F.col("tf") > 0)
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))

    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "score",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
            * (F.col("tf") * (K1 + 1))
            / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.sum("score"), round_to).alias("bm25")
    )
