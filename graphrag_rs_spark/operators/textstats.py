"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting.

All pure column expressions (no UDFs): these run on every document of a
100TB corpus, so they must stay inside whole-stage codegen. The reference's
closest analogs are its TF-IDF/stopword machinery (text/keyword_extraction.rs,
text/mod.rs:476-511); the rest are standard corpus-curation operators.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# small, high-frequency function-word lists per language (n-gram-free
# heuristic language ID: argmax of stopword hit ratios).  Lists are
# public knowledge (standard stopword inventories).  Latin-script lists
# are deliberately ASCII-only (diacritic-free subset) so the DuckDB
# oracle's `[^a-zA-Z0-9']+` tokenizer sees the identical stream on
# ASCII corpora; `ru` is Cyrillic — the Spark tokenizer keeps non-ASCII
# bytes inside tokens (whitespace-separated scripts work end-to-end),
# while the ASCII-oracle contract simply scores 0 for it on ASCII
# corpora (tests/test_textstats_langs.py documents both behaviors).
STOPWORDS = {
    "en": "the a of and to in is it you that was for on are with as at be this".split(),
    "es": "el la de que y a en un ser se no haber por con su para es al lo como".split(),
    "de": "der die und in den von zu das mit sich des auf ist im dem nicht ein".split(),
    "fr": "le la de et les des en un du une que est pour qui dans par sur au".split(),
    "it": "di che la il un a per e non sono le si con mi ho lo ma questo della".split(),
    "pt": "de a o que e do da em um para com uma os no se na por mais as dos".split(),
    "nl": "de het een en van ik te dat die in je niet zijn is was op aan met".split(),
    "sv": "och det att i jag hon som han den med var sig till men ett om du vi".split(),
    "da": "og i jeg det at en den til er som de med han af ikke der var mig".split(),
    "no": "og i jeg det at en et den til er som med han av ikke der noe meg".split(),
    "fi": "ja on ei se oli joka mutta niin kuin sen kun nyt jos ovat ole mina".split(),
    "pl": "i w nie na to z do tak jak co ale jest o mi tym po ma za od go".split(),
    "cs": "a v se na je to s z do o ale i pro tak by co jako za kdo ja".split(),
    "ro": "si in de la a cu pe este nu o un care mai pentru din sau dar ce sa".split(),
    "hu": "a az es nem hogy is egy ez van de ha meg csak mar el mi ki volt nekem".split(),
    "tr": "bir bu ve ne o da gibi ama ben daha var sen diye ki mi en bana sadece".split(),
    "id": "yang dan di itu dengan untuk tidak ini dari dalam akan pada juga saya kamu ke ada".split(),
    "sw": "na ya wa kwa ni za katika la kama hii ili kuwa yake wake sana hata kwamba".split(),
    "tl": "ang ng sa na ako ay mga hindi para ito kung siya ko ka naman may mo lang".split(),
    "ru": "и в не на я что он с как это она по но они к у же вы за бы".split(),
}


import string as _string

#: ASCII token delimiters: all punctuation except the apostrophe, plus
#: whitespace. Used with ``translate`` (a character-map pass, no regex
#: engine) — measured ~35x faster than splitting on ``[^a-z0-9']+``
#: (2ms/doc -> 0.05ms/doc on 17KB docs; the char-class regex scan was the
#: single largest cost of every text op at corpus scale).
TOKEN_DELIMS = _string.punctuation.replace("'", "") + _string.whitespace

#: characters counted as punctuation by quality/curation scoring — the
#: ASCII image of the old ``[^\w\s]`` class (apostrophe included).
PUNCT_CHARS = _string.punctuation


def _tokens(text_col) -> Column:
    """Tokenizer: lower-case, map ASCII delimiters to spaces via
    ``translate`` (no regex scan), split on the literal space run, drop
    empties. Identical to a ``[^a-z0-9']+`` regex split for ASCII text;
    non-ASCII bytes stay inside tokens (documented divergence — a 100 TB
    curation sweep cannot afford a general char-class regex pass per
    signal). The DuckDB oracles keep the ``[^a-z0-9']+`` regex split,
    which is provably identical on printable-ASCII corpora (every ASCII
    char outside ``[a-z0-9']`` is in TOKEN_DELIMS); the board verifies
    the equivalence end-to-end on every run."""
    return F.filter(
        F.split(
            F.translate(F.lower(text_col), TOKEN_DELIMS, " " * len(TOKEN_DELIMS)),
            " +",
        ),
        lambda t: t != "",
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


def _barred(toks_col) -> Column:
    """The token array as ``||tok1||tok2||…||``: every token flanked by a
    DOUBLE delimiter, so counting ``\\|word\\|`` occurrences is exact even
    for adjacent stopwords (each non-overlapping match consumes one bar per
    side and leaves the neighbor's bar intact). Tokens cannot contain bars
    ('|' is a delimiter)."""
    return F.concat(F.lit("||"), F.array_join(toks_col, "||"), F.lit("||"))


def _stopword_pat(words: list[str]) -> str:
    return r"\|(" + "|".join(words) + r")\|"


def stopword_hits(text_col, words: list[str]) -> Column:
    """Occurrences of any listed word in the token stream — ONE
    ``regexp_count`` over the barred token string instead of a per-token
    interpreted filter.

    The naive ``filter(tokens, array_contains(...))`` formulation runs in
    Catalyst's interpreted mode (higher-order lambdas don't codegen) at
    O(tokens x |list|) — measured ~17 ms/doc on 17 KB documents, which
    made language-ID the bottleneck of the whole curation sweep. The
    anchored alternation over the barred stream computes the SAME count
    (each token matches at most one listed word) at literal-prefix regex
    speed, and the pattern is RE2-portable (no lookarounds)."""
    return F.regexp_count(_barred(_tokens(text_col)), F.lit(_stopword_pat(words)))


def language_scores(text_col) -> dict[str, Column]:
    """Per-language stopword hit-ratio columns."""
    toks = _tokens(text_col)
    n = F.greatest(F.size(toks), F.lit(1))
    barred = _barred(toks)
    out = {}
    for lang, words in STOPWORDS.items():
        hits = F.regexp_count(barred, F.lit(_stopword_pat(words)))
        out[lang] = hits.cast("double") / n.cast("double")
    return out


#: language codes in sorted order — bit i of a word's mask = membership
#: in _LANGS[i]'s stopword list (≤ 64 languages fit a Python int mask)
_LANGS = sorted(STOPWORDS)
_WORD2MASK: dict[str, int] = {}
for _li, _lang in enumerate(_LANGS):
    for _w in STOPWORDS[_lang]:
        _WORD2MASK[_w] = _WORD2MASK.get(_w, 0) | (1 << _li)
#: Python mirror of the Spark ``translate`` call in ``_tokens``
_PY_DELIM_TBL = str.maketrans({c: " " for c in TOKEN_DELIMS})


def _langid_udf():
    """One-pass Arrow-batched language ID: per token, ONE dict probe
    yielding the word's language-membership bitmask, counts accumulated
    per language. Replaces |languages| regexp scans of the full token
    stream — the column formulation's cost is linear in the language
    inventory (21 scans after the round-5 broadening; measured 9.8 s →
    0.9 s warm at sf0.1 for the swap, outputs identical on the full
    corpus and pinned by tests/test_textstats_langs.py). Tokenization
    mirrors ``_tokens`` exactly: lower, translate ASCII delimiters to
    space, split on the ASCII space ONLY (a bare ``str.split()`` would
    also split non-ASCII whitespace, which Spark's ``split(' +')`` does
    not), drop empties."""
    langs = _LANGS
    n_langs = len(langs)
    get_mask = _WORD2MASK.get
    tbl = _PY_DELIM_TBL

    @F.pandas_udf("string")
    def langid(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = [
                x for x in (t or "").lower().translate(tbl).split(" ") if x
            ]
            n = max(len(toks), 1)
            counts = [0] * n_langs
            for tok in toks:
                m = get_mask(tok)
                if m:
                    while m:
                        b = m & -m
                        counts[b.bit_length() - 1] += 1
                        m ^= b
            # argmax by (ratio, code): ties break to the lexicographically
            # LARGEST code — same as array_max over (score, lang) structs
            best = max((c / n, langs[i]) for i, c in enumerate(counts))
            out.append("und" if best[0] < 0.02 else best[1])
        return pd.Series(out)

    return langid


def language_id_col(text_col, strategy: str = "udf") -> Column:
    """argmax language by stopword ratio; 'und' (undetermined) when no
    language scores above 2% of tokens.

    ``strategy="udf"`` (default): one Arrow-batched pass, cost independent
    of the language-inventory size. ``strategy="column"``: the pure
    column-expression formulation (one regexp_count per language) — kept
    as the no-Python path and as the parity reference for tests."""
    if strategy == "udf":
        return _langid_udf()(text_col)
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

    stop_hits = stopword_hits(t, STOPWORDS["en"])
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


def _grams(words: Column, n: int) -> Column:
    """Adjacent word n-grams joined by single spaces (empty array when the
    document has fewer than n words)."""
    size = F.size(words)
    if n == 2:
        g = F.zip_with(
            F.slice(words, 1, F.greatest(size - 1, F.lit(0))),
            F.slice(words, 2, F.greatest(size - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    elif n == 3:
        g = F.zip_with(
            F.zip_with(
                F.slice(words, 1, F.greatest(size - 2, F.lit(0))),
                F.slice(words, 2, F.greatest(size - 2, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
            F.slice(words, 3, F.greatest(size - 2, F.lit(0))),
            lambda ab, c: F.concat(ab, F.lit(" "), c),
        )
    else:  # pragma: no cover - only 2/3 used
        raise ValueError(f"unsupported n={n}")
    return F.when(size < n, F.array().cast("array<string>")).otherwise(g)


def repetition_signals(
    df: DataFrame, doc_id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1,
    public), the standard corpus-curation pre-filter for training data:

    - ``dup_word_bp``      — excess word occurrences / words (basis points)
    - ``top2_gram``/``top2_cnt``/``top2_char_bp`` — most frequent word
      2-gram (ties broken lexicographically) and the fraction of word-stream
      characters its occurrences cover
    - ``dup3_char_bp``     — fraction of word-stream characters inside
      3-grams that occur more than once (all occurrences counted)
    - ``n_lines``/``dup_line_bp``/``dup_line_char_bp`` — duplicate-line
      fraction by count and by character mass (lines = ``\\n``-split,
      whitespace-only lines dropped)

    All fractions are integer basis points (``x*10000 div denom``) so the
    numbers are bit-identical across engines (same trick as the quality
    score's ``score_bp``).

    Scale shape: one explode + hash-aggregate per gram family, keyed on
    (doc, gram) — map-side combine collapses the duplicates that matter, so
    shuffle mass is bounded by the *distinct* grams per doc, and every join
    back is on the ``doc_id`` grain. No UDFs, no driver loops.
    """
    t = F.col(text_col)
    words = _tokens(t)
    base = df.select(
        F.col(doc_id_col).alias("doc_id"),
        words.alias("words"),
        F.filter(
            F.split(t, r"\n"), lambda l: F.trim(l) != ""
        ).alias("lines"),
    )
    base = base.select(
        "doc_id",
        "words",
        "lines",
        F.size("words").cast("long").alias("n_words"),
        # word-stream character mass: words joined by single spaces
        F.length(F.concat_ws(" ", F.col("words"))).cast("long").alias("word_chars"),
        _grams(F.col("words"), 2).alias("g2"),
        _grams(F.col("words"), 3).alias("g3"),
    ).localCheckpoint(eager=True)  # four signal legs read it — tokenize once

    # dup words: excess occurrences = n_words - distinct words (array ops,
    # no shuffle — O(n) per doc)
    dup_words = base.select(
        "doc_id",
        "n_words",
        "word_chars",
        (F.col("n_words") - F.size(F.array_distinct("words"))).cast("long").alias(
            "n_dup_words"
        ),
    )

    # top 2-gram: explode → count per (doc, gram) → rank by (cnt desc,
    # gram asc); ASC tie-break needs a window (max(struct) would break DESC)
    from pyspark.sql import Window

    g2_counts = (
        base.select("doc_id", F.explode("g2").alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(), F.col("gram").asc())
    top2 = (
        g2_counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("gram").alias("top2_gram"),
            F.col("cnt").alias("top2_cnt"),
            (F.col("cnt") * F.length("gram")).cast("long").alias("top2_chars"),
        )
    )

    # duplicated 3-grams: character mass of all occurrences of grams seen >1
    g3_dup = (
        base.select("doc_id", F.explode("g3").alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").cast("long").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("cnt") > 1, F.col("cnt") * F.length("gram")).otherwise(0)
            ).cast("long").alias("dup3_chars")
        )
    )

    # duplicate lines: count + char mass of lines occurring more than once
    line_stats = (
        base.select("doc_id", F.explode("lines").alias("line"))
        .groupBy("doc_id", "line")
        .agg(F.count("*").cast("long").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_lines"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).cast("long").alias("n_dup_lines"),
            F.sum(F.col("cnt") * F.length("line")).cast("long").alias("line_chars"),
            F.sum(
                F.when(F.col("cnt") > 1, F.col("cnt") * F.length("line")).otherwise(0)
            ).cast("long").alias("dup_line_chars"),
        )
    )

    out = (
        dup_words.join(top2, "doc_id", "left")
        .join(g3_dup, "doc_id", "left")
        .join(line_stats, "doc_id", "left")
    )
    z = F.lit(0).cast("long")

    def _bp(num: Column, denom: Column) -> Column:
        # exact integer basis points: counts here stay far below 2^43, so
        # num*10000 is exactly representable as double and floor(a/b) equals
        # integer division for non-negative operands (== DuckDB's `//`)
        return F.floor(num * 10000 / F.greatest(denom, F.lit(1))).cast("long")

    return out.select(
        "doc_id",
        "n_words",
        _bp(F.col("n_dup_words"), F.col("n_words")).alias("dup_word_bp"),
        F.coalesce(F.col("top2_gram"), F.lit("")).alias("top2_gram"),
        F.coalesce(F.col("top2_cnt"), z).alias("top2_cnt"),
        _bp(F.coalesce(F.col("top2_chars"), z), F.col("word_chars")).alias(
            "top2_char_bp"
        ),
        _bp(F.coalesce(F.col("dup3_chars"), z), F.col("word_chars")).alias(
            "dup3_char_bp"
        ),
        F.coalesce(F.col("n_lines"), z).alias("n_lines"),
        _bp(F.coalesce(F.col("n_dup_lines"), z), F.coalesce(F.col("n_lines"), z)).alias(
            "dup_line_bp"
        ),
        _bp(
            F.coalesce(F.col("dup_line_chars"), z), F.coalesce(F.col("line_chars"), z)
        ).alias("dup_line_char_bp"),
    )


# PII scrubbing: patterns chosen to parse and behave identically under
# Java regex (Spark) and RE2 (DuckDB/most engines) — simple greedy character
# classes, no backtracking-dependent constructs. Applied IN ORDER (emails
# before IPv4 before digit-runs) so counts are unambiguous: each stage
# counts on the previous stage's redacted text, and replacement tokens
# contain no digits so later stages can't re-match them.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{7,15}\b", "<PHONE>"),
)


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails, IPv4 addresses, and long digit runs (phone-shaped),
    returning per-pattern match counts plus the redacted text. Pure
    ``regexp_count``/``regexp_replace`` column expressions — codegen'd,
    runs on every row of a 100 TB corpus with zero Python."""
    cur = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, token)
    return df.select("*", *counts, cur.alias("text_redacted"))


def curation_decision(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 20,
    min_score_bp: int = 5000,
    max_dup_word_bp: int = 6000,
    max_pii: int = 2,
    allowed_langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """The composed corpus-curation keep/drop decision a training-data
    pipeline runs over every document: language gate + integer quality
    score + duplicate-word repetition gate + length gate + PII budget,
    with an auditable ``drop_reasons`` trail (fixed order
    lang,quality,repeat,short,pii; empty when kept).

    Every signal is a pure column expression over the single input row —
    the whole decision is ONE parquet scan with zero shuffles and zero
    Python, entirely inside whole-stage codegen. At 100 TB this is a
    map-only pass whose cost is the scan itself.
    """
    t = F.col(text_col)

    # language gate (argmax stopword ratio, same family as language_id_col)
    lang = language_id_col(t)

    # integer quality score — identical arithmetic to the text_quality
    # board artifact (basis points, exact in any engine)
    n_chars = F.length(t).cast("long")
    ws = F.split(F.trim(t), r"\s+")
    n_words = F.when(F.trim(t) == "", 0).otherwise(F.size(ws)).cast("long")
    n_punct = (F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))).cast("long")
    n_digit = (F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))).cast("long")
    toks = _tokens(t)
    stop_hits = stopword_hits(t, STOPWORDS["en"]).cast("long")
    safe_w = F.greatest(n_words, F.lit(1))
    safe_c = F.greatest(n_chars, F.lit(1))
    score_bp = (
        40 * F.least(n_words, F.lit(100))
        + F.floor(F.least(stop_hits * 9000, safe_w * 3000) / safe_w)
        + 3000
        - F.floor(F.least(n_punct * 5 + n_digit * 2, safe_c) * 3000 / safe_c)
    ).cast("long")

    # repetition gate: duplicate-word mass (array ops, no shuffle)
    n_toks = F.size(toks).cast("long")
    dup_word_bp = F.floor(
        (n_toks - F.size(F.array_distinct(toks))) * 10000
        / F.greatest(n_toks, F.lit(1))
    ).cast("long")

    # PII budget: staged counts on progressively redacted text
    cur = t
    pii_total = F.lit(0).cast("long")
    for _, pat, token in PII_PATTERNS:
        pii_total = pii_total + F.regexp_count(cur, F.lit(pat)).cast("long")
        cur = F.regexp_replace(cur, pat, token)

    sig = df.select(
        "*",
        lang.alias("lang_pred"),
        score_bp.alias("score_bp"),
        n_words.alias("n_words"),
        dup_word_bp.alias("dup_word_bp"),
        pii_total.alias("pii_total"),
    )
    lang_ok = F.col("lang_pred").isin(*allowed_langs)
    reasons = F.array(
        F.when(~lang_ok, F.lit("lang")),
        F.when(F.col("score_bp") < min_score_bp, F.lit("quality")),
        F.when(F.col("dup_word_bp") > max_dup_word_bp, F.lit("repeat")),
        F.when(F.col("n_words") < min_words, F.lit("short")),
        F.when(F.col("pii_total") > max_pii, F.lit("pii")),
    )
    reasons = F.filter(reasons, lambda x: x.isNotNull())
    return sig.select(
        "*",
        F.when(F.size(reasons) == 0, F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("keep"),
        F.concat_ws(",", reasons).alias("drop_reasons"),
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


def readability_scores(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flesch reading-ease per doc → (doc_id, n_words, n_sentences,
    n_syllables, flesch_c100): 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words) in integer CENTI-POINTS (floor(score·100) —
    half-boundary round() diverges between engines; floor of the same
    double is bit-stable), the standard corpus-quality readability band
    filter. Syllables use the classic vowel-group approximation (runs
    of [aeiouy] — groups cannot span consonants or whitespace, so one
    whole-text regexp pass equals the per-word sum); sentence count =
    punctuation runs [.!?]+ floored at 1. Pure map-only codegen — zero
    shuffles, zero UDFs; docs with no words are dropped (the score is
    undefined).
    """
    words = token_count_col(F.col(text_col)).cast("long")
    syll = F.size(
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(r"[aeiouy]+"), F.lit(0)
        )
    ).cast("long")
    sents = F.greatest(
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(r"[.!?]+"), F.lit(0))
        ),
        F.lit(1),
    ).cast("long")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        words.alias("n_words"),
        sents.alias("n_sentences"),
        syll.alias("n_syllables"),
    ).where(F.col("n_words") > 0)
    return base.withColumn(
        "flesch_c100",
        F.floor(
            (
                F.lit(206.835)
                - F.lit(1.015) * F.col("n_words") / F.col("n_sentences")
                - F.lit(84.6) * F.col("n_syllables") / F.col("n_words")
            )
            * 100
        ).cast("long"),
    )


def zipf_slope(
    docs: DataFrame,
    *,
    text_col: str = "text",
    top_k: int = 50,
) -> DataFrame:
    """Zipf's-law fit over the corpus token frequency table → ONE row
    (k, sum_x, sum_y, sum_xy, sum_xx, slope_ppm): least-squares slope
    of ln(freq) against ln(rank) for the ``top_k`` most frequent
    tokens (Zipf's law predicts ≈ −1; a corpus that deviates hard is
    template/boilerplate-heavy — a WIMBD-family health check).

    Exactness: ln values are quantized to integer micro-units BEFORE
    summing, so every aggregation is order-independent integer math and
    any engine reproduces the row bit-for-bit; only the final slope is
    one double division (floor-quantized to ppm). Bounds: |x|,|y| <
    2^24 after quantization, k ≤ 10^4 ⇒ every sum < 2^62.

    Shape: one token-count groupBy (partial agg), a top-k window over
    the (already tiny) distinct-token space, one single-row reduce.
    """
    toks = docs.select(F.explode(_tokens(F.col(text_col))).alias("t"))
    freq = toks.groupBy("t").agg(F.count("*").alias("f"))
    # distributed top-k (TakeOrderedAndProject) FIRST, then rank the
    # k-row result — an unpartitioned row_number window would funnel the
    # whole vocabulary through one task
    top = (
        freq.orderBy(F.col("f").desc(), F.col("t").asc())
        .limit(top_k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("f").desc(), F.col("t").asc())
            ),
        )
    )
    q = top.select(
        F.floor(F.log(F.col("rank").cast("double")) * 1000000)
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("f").cast("double")) * 1000000)
        .cast("long")
        .alias("y"),
    )
    sums = q.agg(
        F.count("*").alias("k"),
        F.sum("x").alias("sum_x"),
        F.sum("y").alias("sum_y"),
        F.sum(F.col("x") * F.col("y")).alias("sum_xy"),
        F.sum(F.col("x") * F.col("x")).alias("sum_xx"),
    )
    denom = sums["k"] * F.col("sum_xx") - F.col("sum_x") * F.col("sum_x")
    num = sums["k"] * F.col("sum_xy") - F.col("sum_x") * F.col("sum_y")
    return sums.select(
        "k",
        "sum_x",
        "sum_y",
        "sum_xy",
        "sum_xx",
        F.floor(num.cast("double") * 1000000 / denom.cast("double"))
        .cast("long")
        .alias("slope_ppm"),
    )


def token_entropy(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram token entropy per document → (doc_id, n_tokens,
    n_distinct, entropy_mb): H = log2(n) − (Σ c·log2 c)/n over the word
    frequency histogram, floor-quantized to MILLIBITS (floor(H·1000) —
    the readability_scores floor-not-round contract; both engines sum
    the same doubles, floor blunts last-ulp association differences).

    The classic lexical-diversity / noise signal next to the Gopher
    repetition ratios: word-salad and template boilerplate sit at the
    entropy extremes that the quality filters cut. Token space is the
    shared nonempty-lowercase ``[^a-z0-9]+`` split (coref/proximity
    family). Scale shape: explode → (doc, tok) partial-agg count →
    per-doc partial-agg sum — two map-side-combinable shuffles keyed on
    doc id, no UDF, no in-row quadratic histogram. Docs with no tokens
    are dropped (H undefined).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
        ).alias("tok"),
    ).where(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    per = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.sum(F.col("c").cast("double") * F.log2(F.col("c").cast("double"))).alias("_clog"),
    )
    return per.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.floor(
            (F.log2(F.col("n_tokens").cast("double"))
             - F.col("_clog") / F.col("n_tokens"))
            * 1000
        ).cast("long").alias("entropy_mb"),
    )


def js_divergence(
    docs_a: DataFrame,
    docs_b: DataFrame,
    *,
    text_col: str = "text",
) -> DataFrame:
    """Jensen–Shannon divergence between two corpora's unigram
    distributions → ONE row (n_tokens_a, n_tokens_b, vocab_union,
    js_mb): JS(P,Q) = ½·KL(P‖M) + ½·KL(Q‖M), M = (P+Q)/2, in
    floor-quantized millibits (bounded [0, 1000] by construction —
    log base 2).

    The drift/contamination detector of the mixture family: a
    train/validation split with JS ≈ 0 shares a distribution; a rising
    JS between crawl snapshots flags topic drift before a model does.
    Zero-probability terms contribute 0 to their side's KL (the
    standard convention — p·log2(p/m) → 0 as p → 0).

    Scale shape: one token-histogram shuffle per side (partial-agg),
    a full-outer join on the term, totals as 1-row broadcast
    aggregates, one final scalar sum — no UDF, nothing vocabulary-sized
    on the driver.
    """
    def hist(df, name):
        return (
            df.select(
                F.explode(
                    F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
                ).alias("tok")
            )
            .where(F.col("tok") != "")
            .groupBy("tok")
            .agg(F.count("*").alias(name))
        )

    ha = hist(docs_a, "ca")
    hb = hist(docs_b, "cb")
    joined = ha.join(hb, "tok", "full_outer").select(
        "tok",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    joined = joined.localCheckpoint(eager=True)
    # ONE totals aggregate over the materialized histogram — separate
    # na/nb jobs would re-run the explodes + outer join once each
    tot = joined.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    p = F.col("ca").cast("double") / F.col("na")
    q = F.col("cb").cast("double") / F.col("nb")
    m = (p + q) / 2
    contrib = (
        F.when(F.col("ca") > 0, p * F.log2(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("cb") > 0, q * F.log2(q / m)).otherwise(F.lit(0.0))
    ) / 2
    return (
        joined.crossJoin(F.broadcast(tot))
        .agg(
            F.max("na").alias("n_tokens_a"),
            F.max("nb").alias("n_tokens_b"),
            F.count("*").alias("vocab_union"),
            F.floor(F.sum(contrib) * 1000).cast("long").alias("js_mb"),
        )
    )
