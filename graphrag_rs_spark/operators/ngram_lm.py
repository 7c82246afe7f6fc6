"""N-gram language-model perplexity scoring (CCNet-style quality filter).

CCNet (Wenzek et al. 2020) ranks CommonCrawl documents by the perplexity
of a language model trained on clean text and keeps the low-perplexity
head — the single most load-bearing quality filter in that lineage
(CCNet → RedPajama → RefinedWeb).  This is the DataFrame-native version
with an order-2..3 count-based LM and add-k smoothing:

    p(w | h) = (c(h·w) + k) / (c(h) + k·V)

where V is the unigram vocabulary size, h the (n−1)-token history, and
token = lowercase word.  Document score = mean negative log₂-probability
over its n-grams (= log₂ perplexity); lower is more natural relative to
the training corpus.

Why counts, not Kneser-Ney: the filter needs a *ranking* that's stable,
explainable, and reproducible across engines; add-k is exactly
replayable in SQL (the DuckDB oracle re-derives the same model from the
same corpus), while KN's discount/backoff recursion is not worth the
oracle opacity for a keep/drop gate.  The knob that matters — what
corpus the model is trained on — is the caller's.

Scale shape (the model can be big — that's the point):
- **training** is two partial-agg groupBys over exploded grams (gram
  counts + history counts): map-side combine does the heavy lifting, the
  shuffle carries one row per DISTINCT gram, not per token.
- **scoring** joins document grams against the model on the gram key.
  The model is usually much smaller than the corpus but NOT
  broadcast-safe at web scale (10⁸⁺ distinct grams), so the join is a
  plain shuffle-hash join on the gram string; unseen grams fall back to
  the k/(c(h)+kV) floor via a left join + coalesce.  AQE picks
  broadcast automatically when a small training corpus makes the model
  tiny.
- no UDFs anywhere — tokenization, gram assembly, log arithmetic are all
  native column ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.mixture import ngrams_col


def _words(text_col) -> "F.Column":
    """Lowercase word tokens — the textstats tokenizer family (portable:
    split on non-alphanumeric-apostrophe runs, drop empties)."""
    return F.filter(
        F.split(F.lower(F.trim(text_col)), r"[^a-z0-9']+"),
        lambda t: t != "",
    )


def train_ngram_lm(
    corpus: DataFrame,
    *,
    n: int = 2,
    text_col: str = "text",
) -> dict[str, DataFrame]:
    """→ {"grams": (gram, hist, c_gram), "hists": (hist, c_hist),
    "vocab_size": 1-row DataFrame (v)}.

    ``gram`` is the space-joined n-gram, ``hist`` its first n−1 tokens
    (the unigram model uses the empty history ""). Counting is two
    groupBys with map-side partial aggregation; nothing is collected.
    """
    if n < 1:
        raise ValueError(f"n must be ≥ 1, got {n}")
    words = _words(F.col(text_col))
    grams = corpus.select(F.explode(ngrams_col(words, n)).alias("gram"))
    if n == 1:
        grams = grams.withColumn("hist", F.lit(""))
    else:
        # history = gram minus its last token (split on the LAST space)
        grams = grams.withColumn(
            "hist",
            F.expr(r"regexp_replace(gram, ' [^ ]+$', '')"),
        )
    gram_counts = grams.groupBy("gram", "hist").agg(
        F.count("*").alias("c_gram")
    )
    hist_counts = gram_counts.groupBy("hist").agg(
        F.sum("c_gram").alias("c_hist")
    )
    vocab = corpus.select(
        F.explode(_words(F.col(text_col))).alias("w")
    ).agg(F.countDistinct("w").alias("v"))
    return {"grams": gram_counts, "hists": hist_counts, "vocab_size": vocab}


def perplexity_scores(
    docs: DataFrame,
    model: dict[str, DataFrame],
    *,
    n: int = 2,
    k: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id_col, n_grams, logppl): mean −log₂ p(gram) with add-``k``
    smoothing; documents with fewer than n tokens get NULL logppl
    (no evidence either way — the caller's gate decides their fate).

    Unseen grams and unseen histories cost −log₂(k / (c_hist + k·V))
    with c_hist = 0 — the smoothing floor, never −inf.
    """
    words = _words(F.col(text_col))
    doc_grams = docs.select(
        F.col(id_col), F.explode(ngrams_col(words, n)).alias("gram")
    )
    if n == 1:
        doc_grams = doc_grams.withColumn("hist", F.lit(""))
    else:
        doc_grams = doc_grams.withColumn(
            "hist", F.expr(r"regexp_replace(gram, ' [^ ]+$', '')")
        )
    v = model["vocab_size"].select(F.col("v").cast("double").alias("v"))
    scored = (
        doc_grams.join(model["grams"], ["gram", "hist"], "left")
        .join(model["hists"], ["hist"], "left")
        .crossJoin(F.broadcast(v))
        .select(
            id_col,
            (
                -F.log2(
                    (F.coalesce(F.col("c_gram"), F.lit(0)) + F.lit(k))
                    / (F.coalesce(F.col("c_hist"), F.lit(0)) + F.lit(k) * F.col("v"))
                )
            ).alias("nll"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        F.avg("nll").alias("logppl"),
    )
    # left join back so gram-less docs keep a row (NULL logppl)
    return (
        docs.select(id_col)
        .join(per_doc, [id_col], "left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.round("logppl", 6).alias("logppl"),
        )
    )


def perplexity_prune(
    docs: DataFrame,
    model: dict[str, DataFrame],
    *,
    n: int = 2,
    k: float = 1.0,
    low: float = 0.25,
    high: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Perplexity-band data pruning (Marion et al., "When Less is More:
    Investigating Data Pruning for Pretraining LLMs", 2023 — their
    strongest selector keeps the MIDDLE perplexity band: the low tail is
    boilerplate, the high tail is noise). → the kept documents as
    (doc_id, n_grams, ppl_ub) where ppl_ub is mean n-gram −log₂ p in
    integer micro-bits.

    Exactness: each gram's nll is quantized to integer micro-bits
    (``floor(−log₂(p)·1e6)``) BEFORE the per-document reduction, so the
    sum and the mean (integer ``div``) are order-independent exact
    integers; the band thresholds are exact ``percentile()`` over those
    integers (Spark and DuckDB share the (n−1)·p interpolation rule),
    and membership is ``t_low ≤ ppl_ub ≤ t_high``. No float ever enters
    a reduction, so the kept SET is bit-stable across partitionings.

    Scale: scoring is the same joins as :func:`perplexity_scores`
    (model frames are vocab-bounded). The exact percentile is one
    global agg over doc-level integers — at 100 TB substitute
    ``percentile_approx`` (t-digest) for the thresholds; this operator
    pins the exact contract, same policy as the repo's quantile row.
    Documents with fewer than ``n`` tokens carry no evidence and are
    never kept (the curation gate upstream decides their fate).
    """
    words = _words(F.col(text_col))
    doc_grams = docs.select(
        F.col(id_col), F.explode(ngrams_col(words, n)).alias("gram")
    )
    if n == 1:
        doc_grams = doc_grams.withColumn("hist", F.lit(""))
    else:
        doc_grams = doc_grams.withColumn(
            "hist", F.expr(r"regexp_replace(gram, ' [^ ]+$', '')")
        )
    v = model["vocab_size"].select(F.col("v").cast("double").alias("v"))
    per_doc = (
        doc_grams.join(model["grams"], ["gram", "hist"], "left")
        .join(model["hists"], ["hist"], "left")
        .crossJoin(F.broadcast(v))
        .select(
            id_col,
            F.floor(
                -F.log2(
                    (F.coalesce(F.col("c_gram"), F.lit(0)) + F.lit(k))
                    / (
                        F.coalesce(F.col("c_hist"), F.lit(0))
                        + F.lit(k) * F.col("v")
                    )
                )
                * 1e6
            )
            .cast("long")
            .alias("nll_ub"),
        )
        .groupBy(id_col)
        .agg(F.count("*").alias("n_grams"), F.sum("nll_ub").alias("s"))
        .select(
            id_col,
            "n_grams",
            F.expr("s div n_grams").alias("ppl_ub"),
        )
    )
    bounds = per_doc.agg(
        F.expr(f"percentile(ppl_ub, {low})").alias("t_low"),
        F.expr(f"percentile(ppl_ub, {high})").alias("t_high"),
    )
    return (
        per_doc.crossJoin(F.broadcast(bounds))
        .where(
            (F.col("ppl_ub") >= F.col("t_low"))
            & (F.col("ppl_ub") <= F.col("t_high"))
        )
        .select(id_col, "n_grams", "ppl_ub")
    )
