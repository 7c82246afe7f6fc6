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
    # ONE tokenize pass: dl + per-term tf as flat columns, checkpointed.
    # The previous shape re-tokenized the corpus three times per action
    # (the stats broadcast build, the df broadcast build, and the scored
    # scan each re-ran the split pipeline — Spark only dedups identical
    # subtrees at exchange level). per_doc is (id, dl, |q| ints) — tiny
    # relative to the text it summarizes, so materializing it is
    # scale-safe where three corpus scans are not.
    def _tf_col(term: str):
        # NB: the filter lambda must stay single-parameter (a second
        # parameter would be bound to the ARRAY INDEX by Spark's
        # higher-order-function protocol), hence this closure helper
        return F.size(F.filter("tokens", lambda x: x == F.lit(term)))

    per_doc = toks.select(
        "doc_id",
        F.size("tokens").alias("dl"),
        *[_tf_col(t).alias(f"_tf{i}") for i, t in enumerate(query_terms)],
    ).localCheckpoint(eager=True)

    stats = per_doc.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        per_doc.select(
            "doc_id",
            "dl",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("term"), F.col(f"_tf{i}").alias("tf")
                        )
                        for i, t in enumerate(query_terms)
                    ]
                )
            ).alias("_qt"),
        )
        .select("doc_id", F.col("_qt.term").alias("term"), "dl", F.col("_qt.tf").alias("tf"))
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


def hard_negatives(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DPR-style hard-negative mining (Karpukhin et al., 2020 §4.2: the
    strongest negatives for a retriever's training set are the top
    BM25 hits that are NOT the positive). queries = (query_id, terms
    array<string>, positive_id) → (query_id, neg_doc_id, rank,
    score_upm): per query, the top-``k`` BM25-scored corpus documents
    excluding the positive.

    Determinism: the float BM25 score is quantized to integer
    micro-units (``floor(score·1e6)``) BEFORE ranking, and rank order is
    (score_upm DESC, neg_doc_id ASC) — the cut is bit-stable across
    engines and partitionings (same policy as the ANN top-k rows).

    Scale shape: postings = one explode + (doc, term) partial-agg tf;
    the query side joins postings ON TERM — with millions of training
    queries this is the standard shuffle join keyed by term (skew =
    stopword terms; mine hard negatives from content words, or salt),
    then one window per query_id for the top-k. Corpus stats ride a
    broadcast 1-row frame. Nothing materializes |Q|×|D|."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda t: t != "",
        ).alias("tokens"),
    )
    stats = toks.agg(
        F.count("*").alias("n_docs"), F.avg(F.size("tokens")).alias("avgdl")
    )
    postings = (
        toks.select(
            "doc_id",
            F.size("tokens").alias("dl"),
            F.explode("tokens").alias("term"),
        )
        .groupBy("doc_id", "term", "dl")
        .agg(F.count("*").alias("tf"))
    )
    df = postings.groupBy("term").agg(F.count("*").alias("df"))

    qterms = queries.select(
        "query_id",
        "positive_id",
        F.explode(F.array_distinct("terms")).alias("term"),
    )
    per_term = (
        qterms.join(postings, "term")
        .where(F.col("doc_id") != F.col("positive_id"))
        .join(df, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (K1 + 1))
                / (
                    F.col("tf")
                    + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    scored = per_term.groupBy("query_id", "doc_id").agg(
        F.floor(F.sum("s") * 1e6).cast("long").alias("score_upm")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_upm"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("doc_id").alias("neg_doc_id"),
            "rank",
            "score_upm",
        )
    )
