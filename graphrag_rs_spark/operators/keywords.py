"""C10: TF-IDF keyword extraction — classic distributed TF/DF.

Reference: text/keyword_extraction.rs:9-151 computes tf×idf over in-memory
corpus maps with a stop-word filter (text/mod.rs:502-511) and takes top-k.
Distributed: explode tokens → tf groupBy, df groupBy-distinct, join,
window top-k per doc. Two shuffles + a bounded window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STOP_WORDS = frozenset(
    "the a an and or but in on at to for of with by from as is was are were "
    "be been being have has had do does did will would could should may "
    "might this that these those it its".split()
)


def tfidf_keywords(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "content",
    top_k: int = 5,
    min_token_len: int = 3,
) -> DataFrame:
    """→ (doc_id, keyword, tfidf, rank): top-k keywords per document."""
    stop = F.array(*[F.lit(w) for w in sorted(STOP_WORDS)])
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^a-z0-9']+"),
                lambda t: (F.length(t) >= min_token_len) & ~F.array_contains(stop, t),
            )
        ).alias("term"),
    )
    n_docs = docs.count()
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = toks.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count("*").alias("df")
    )
    scored = tf.join(df, "term").withColumn(
        "tfidf", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("doc_id", F.col("term").alias("keyword"), F.round("tfidf", 6).alias("tfidf"), "rank")
    )


def entity_salience(
    doc_entity_tf: DataFrame,
    *,
    doc_col: str = "doc_id",
    entity_col: str = "entity_id",
    tf_col: str = "tf",
    top_k: int | None = None,
) -> DataFrame:
    """Per-document entity salience = tf·idf over entity mentions →
    (doc_id, entity_id, tf, idf, salience, rank).

    ``doc_entity_tf`` carries one row per (doc, entity) with the mention
    count; idf = ln(N_docs / df_entity) with N as a 1-row broadcast
    aggregate (no driver action). Rank orders salience desc then entity
    asc inside each document — the deterministic "which entities is this
    document ABOUT" signal that feeds retrieval boosts and community
    labeling. One groupBy for df, one broadcast-augmented join, one
    bounded per-document window.
    """
    m = doc_entity_tf.select(
        F.col(doc_col).alias("doc_id"),
        F.col(entity_col).alias("entity_id"),
        F.col(tf_col).cast("double").alias("tf"),
    )
    nd = m.agg(F.count_distinct("doc_id").cast("double").alias("_n"))
    df_e = m.groupBy("entity_id").agg(F.count("*").cast("double").alias("_df"))
    idf = F.log(F.col("_n") / F.col("_df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("salience").desc(), F.col("entity_id").asc()
    )
    out = (
        m.join(df_e, "entity_id")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "entity_id",
            "tf",
            F.round(idf, 6).alias("idf"),
            F.round(F.col("tf") * idf, 6).alias("salience"),
        )
        .withColumn("rank", F.row_number().over(w))
    )
    if top_k is not None:
        out = out.where(F.col("rank") <= top_k)
    return out
