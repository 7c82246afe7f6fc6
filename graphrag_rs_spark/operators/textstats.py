"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting.

All pure column expressions (no UDFs): these run on every document of a
100TB corpus, so they must stay inside whole-stage codegen. The reference's
closest analogs are its TF-IDF/stopword machinery (text/keyword_extraction.rs,
text/mod.rs:476-511); the rest are standard corpus-curation operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small, high-frequency function-word lists per language (n-gram-free
# heuristic language ID: argmax of stopword hit ratios)
STOPWORDS = {
    "en": "the a of and to in is it you that was for on are with as at be this".split(),
    "es": "el la de que y a en un ser se no haber por con su para es al lo como".split(),
    "de": "der die und in den von zu das mit sich des auf ist im dem nicht ein".split(),
    "fr": "le la de et les des en un du une que est pour qui dans par sur au".split(),
}


def _tokens(text_col) -> Column:
    return F.filter(
        F.split(F.lower(F.trim(text_col)), r"[^a-zA-Z0-9']+"), lambda t: t != ""
    )


def token_count_col(text_col, mode: str = "whitespace") -> Column:
    """Token counting: 'whitespace' or 'bpe_ish' (a BPE-flavored regex that
    splits words, numbers, and punctuation runs separately)."""
    if mode == "whitespace":
        t = F.split(F.trim(text_col), r"\s+")
        return F.when(F.trim(text_col) == "", F.lit(0)).otherwise(F.size(t))
    # BPE-ish: letter runs, digit runs, and single punctuation marks each
    # count as one token (RE2-compatible pattern — portable to the oracle)
    return F.size(
        F.regexp_extract_all(text_col, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), F.lit(0))
    )


def language_scores(text_col) -> dict[str, Column]:
    """Per-language stopword hit-ratio columns."""
    toks = _tokens(text_col)
    n = F.greatest(F.size(toks), F.lit(1))
    def _in_list(lit):
        return lambda t: F.array_contains(lit, t)

    out = {}
    for lang, words in STOPWORDS.items():
        lit = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, _in_list(lit)))
        out[lang] = hits.cast("double") / n.cast("double")
    return out


def language_id_col(text_col) -> Column:
    """argmax language by stopword ratio; 'und' (undetermined) when no
    language scores above 2% of tokens."""
    scores = language_scores(text_col)
    pairs = F.array(
        *[
            F.struct(score.alias("score"), F.lit(lang).alias("lang"))
            for lang, score in scores.items()
        ]
    )
    best = F.array_max(pairs)
    return F.when(best["score"] < 0.02, F.lit("und")).otherwise(best["lang"])


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features + composite score in [0,1]:
    length, mean word length, punctuation ratio, stopword ratio,
    uppercase ratio, digit ratio. Formula kept simple and SQL-portable
    (mirrored in the DuckDB oracle)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = F.split(F.trim(t), r"\s+")
    n_words = F.when(F.trim(t) == "", 0).otherwise(F.size(toks))
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    mean_word_len = n_chars.cast("double") / F.greatest(n_words, F.lit(1)).cast("double")

    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.filter(_tokens(t), lambda x: F.array_contains(en, x)))
    stop_ratio = stop_hits.cast("double") / F.greatest(n_words, F.lit(1)).cast("double")

    punct_ratio = n_punct.cast("double") / safe_chars
    upper_ratio = n_upper.cast("double") / safe_chars
    digit_ratio = n_digit.cast("double") / safe_chars

    # composite: reward length (saturating) + stopwords, penalize extremes
    length_score = F.least(n_words.cast("double") / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.4) * length_score
        + F.lit(0.3) * F.least(stop_ratio * 3, F.lit(1.0))
        + F.lit(0.3) * (1 - F.least(punct_ratio * 5 + digit_ratio * 2, F.lit(1.0)))
    )
    return df.select(
        "*",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(upper_ratio, 4).alias("upper_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def fingerprint_col(text_col, modulus: int = 2**31 - 1) -> Column:
    """Deterministic rolling document fingerprint over tokens:
    acc ← (acc * 31 + (h(token) mod m)) mod m,
    h(token) = first 15 hex chars of sha256(token) as a 60-bit int.

    The token hash is ENGINE-PORTABLE (sha256 + hex parse exist in Spark,
    DuckDB, Trino, ...), so the fingerprint is oracle-checkable — round 1
    used xxhash64, which no other engine reproduces. Overflow-safe under
    ANSI (acc < 2³¹, so acc*31 + h < 2³⁶). Order-SENSITIVE by design
    (unlike sha2-of-bytes it survives whitespace normalization)."""
    toks = _tokens(text_col)
    m = F.lit(modulus)

    def _tok_hash(t):
        return F.pmod(
            F.conv(F.substring(F.sha2(t, 256), 1, 15), 16, 10).cast("long"), m
        )

    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * 31 + _tok_hash(t), m),
    )
