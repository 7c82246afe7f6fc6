"""All-pairs document similarity — sparse TF-IDF cosine via inverted index.

Complements the near-dup family (dedup.py) at the other end of the
spectrum: MinHash/SimHash find ~identical documents; this finds *topically
similar* ones (cosine over TF-IDF), the relevance-style measure used for
corpus clustering, diversity sampling, and retrieval-bias audits.

Spark-first shape (the classic AllPairs/DISCO decomposition):

  docs → (doc, term, weight) postings, L2-normalized per doc
       → per-term self-join of posting lists (i < j) → partial products
       → groupBy (i, j) sum  =  exact cosine (vectors are unit-norm)

The per-term self-join is exact but costs Σ_t df(t)² — a stop-word with
df = 10⁶ alone is 10¹² pairs. ``max_df`` is the standard remedy: terms
with df > max_df contribute NO candidate pairs (their cosine contribution
is still counted *for pairs found via rarer terms*, via the second join),
so precision stays exact while recall is bounded by "every reported pair
shares ≥ 1 non-frequent term" — the same documented-blocking contract as
MinHash banding in dedup.py. With Zipfian text, df ≤ a few hundred covers
all high-cosine pairs except stop-word-only overlaps, which are below any
useful threshold anyway.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.textstats import _tokens


def tfidf_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (id, term, w) with w = tf · ln(1 + N/df), L2-normalized per doc.

    Two shuffles total: term-frequency groupBy and the df groupBy (the
    df side is vocabulary-sized and broadcast back).
    """
    tf = (
        docs.select(F.col(id_col).alias("id"),
                    F.explode(_tokens(F.col(text_col))).alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )
    n_docs = docs.select(F.countDistinct(id_col)).collect()[0][0]
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = F.col("tf") * F.log(F.lit(1.0) + F.lit(float(n_docs)) / F.col("df"))
    weighted = tf.join(F.broadcast(df_tbl), "term").select(
        "id", "term", "df", w.alias("w")
    )
    norm = weighted.groupBy("id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )
    return weighted.join(norm, "id").select(
        "id", "term", "df", (F.col("w") / F.col("norm")).alias("w")
    )


def allpairs_cosine(
    docs: DataFrame,
    *,
    threshold: float = 0.5,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (id_a, id_b, cosine) for pairs with cosine ≥ threshold, id_a < id_b.

    ``max_df=None`` is the exact path (every term generates candidates);
    with ``max_df`` set, pairs sharing ONLY terms of df > max_df are not
    reported (documented recall bound), but reported cosines stay exact —
    the verification join re-reads the FULL vectors of both sides.
    """
    post = tfidf_postings(docs, text_col, id_col).localCheckpoint(eager=True)
    gen = post if max_df is None else post.where(F.col("df") <= max_df)
    a = gen.select(F.col("term"), F.col("id").alias("id_a"))
    b = gen.select(F.col("term"), F.col("id").alias("id_b"))
    cand = (
        a.join(b, "term")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = post.select(F.col("id").alias("id_a"), "term", F.col("w").alias("wa"))
    vb = post.select(F.col("id").alias("id_b"), "term", F.col("w").alias("wb"))
    dots = (
        cand.join(va, "id_a")
        .join(vb, ["id_b", "term"])
        .groupBy("id_a", "id_b")
        .agg(F.round(F.sum(F.col("wa") * F.col("wb")), 4).alias("cosine"))
    )
    return dots.where(F.col("cosine") >= threshold - 1e-9)


def numpy_reference(texts: dict, threshold: float) -> dict:
    """Driver-side oracle for tests: same tokenizer contract (caller
    pre-tokenizes), same tf-idf, exact cosine."""
    from collections import Counter

    tfs = {i: Counter(toks) for i, toks in texts.items()}
    n = len(texts)
    dfc = Counter(t for c in tfs.values() for t in c)
    vecs = {}
    for i, c in tfs.items():
        v = {t: tf * math.log(1.0 + n / dfc[t]) for t, tf in c.items()}
        norm = math.sqrt(sum(x * x for x in v.values()))
        vecs[i] = {t: x / norm for t, x in v.items()}
    out = {}
    ids = sorted(vecs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = vecs[ids[x]], vecs[ids[y]]
            dot = round(sum(w * b[t] for t, w in a.items() if t in b), 4)
            if dot >= threshold - 1e-9:
                out[(ids[x], ids[y])] = dot
    return out
