"""RAKE keyphrase extraction (Rose et al. 2010) — pure column algebra.

Rapid Automatic Keyword Extraction: candidate phrases are the maximal
runs of non-stopword words between stopwords/punctuation; each word
scores degree/frequency over the document's phrases (degree = summed
length of the phrases it appears in, frequency = occurrence count);
a phrase scores the sum of its member word scores.  The classic
unsupervised keyphrase baseline — a different signal from TF-IDF
(keywords.py), which needs corpus statistics: RAKE is per-document and
rewards multi-word collocations.

Word scores are micro-units with FLOOR division (deg · UNIT div freq),
so phrase scores are exact longs and the DuckDB oracle replays the
whole computation bit-for-bit — no float ratios anywhere.

Scale shape: phrase splitting is a map-only regexp pipeline (lower →
punctuation→'|' → stopword→'|' → split/explode), word stats are one
partial-agg groupBy per (doc, word), scoring is one co-partitioned
equi-join back on (doc, word), and top-k is a per-doc window.  Nothing
global; every stage keys on doc_id or (doc_id, word).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

UNIT = 1_000_000

# compact English function-word list — shared LITERALLY with the DuckDB
# oracle (stopword_regex() below feeds both engines' regexes)
RAKE_STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "from", "has", "have", "in", "is", "it", "its", "of", "on", "or",
    "that", "the", "their", "this", "to", "was", "were", "which",
    "will", "with",
]


def stopword_regex() -> str:
    return r"\b(" + "|".join(RAKE_STOPWORDS) + r")\b"


def rake_keyphrases(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 5,
) -> DataFrame:
    """docs(id, text) → (doc_id, phrase, score long, rk int): the top-k
    RAKE phrases per document, ranked by (score desc, phrase asc)."""
    t = F.lower(F.col(text_col))
    t = F.regexp_replace(t, "[^a-z0-9 ]+", "|")
    t = F.regexp_replace(t, stopword_regex(), "|")
    seg = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(t, r"\|")).alias("seg"),
    )
    ph = (
        seg.select(
            "doc_id",
            F.regexp_extract_all("seg", F.lit("[a-z0-9]+"), F.lit(0)).alias(
                "words"
            ),
        )
        .where(F.size("words") > 0)
        .select(
            "doc_id",
            F.array_join("words", " ").alias("phrase"),
            "words",
            F.size("words").cast("long").alias("plen"),
        )
    )
    stats = (
        ph.select("doc_id", F.explode("words").alias("word"), "plen")
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("freq"), F.sum("plen").alias("deg"))
        .select(
            "doc_id", "word", F.expr(f"deg * {UNIT}L div freq").alias("ws")
        )
    )
    # identical phrases in a doc collapse to one candidate (their
    # occurrences already fed freq/deg above)
    pw = (
        ph.select("doc_id", "phrase")
        .dropDuplicates(["doc_id", "phrase"])
        .select(
            "doc_id", "phrase",
            F.explode(F.split("phrase", " ")).alias("word"),
        )
    )
    scored = (
        pw.join(stats, ["doc_id", "word"])
        .groupBy("doc_id", "phrase")
        .agg(F.sum("ws").alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("phrase").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_k)
        .select("doc_id", "phrase", "score", "rk")
    )
