"""Distributed BPE training — learn subword merges from a corpus.

The reference counts tokens with a BPE-flavored regex
(textstats.token_count_col mirrors it); an actual trainable tokenizer is
the training-pipeline extension: given 100 TB of text, learn the merge
table that a downstream tokenizer ships with.

The scale insight (same as every published distributed BPE): after ONE
pass over the corpus (word count — shuffle on word), every iteration runs
on the VOCABULARY table (distinct words × weights, ~10⁵–10⁷ rows no
matter how big the corpus), so the merge loop costs vocab-sized shuffles,
not corpus-sized ones:

  words(word, wc)  →  symbols array  →  per-iteration:
      pair counts = explode(zip_with(slice₁, slice₂)) ⨯ wc, groupBy sum
      top pair    = orderBy(count desc, pair asc) limit 1   (deterministic)
      merge       = greedy left-to-right pair fusion over the symbol
                    arrays (Arrow pandas UDF — the scan is inherently
                    sequential per word; batch-vectorized across words)

``bpe_encode`` applies a learned merge table to text by encoding the
DISTINCT words (vocab-sized work) and joining back — the corpus is
never re-scanned per merge.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphrag_rs_spark.iterutil import cut_lineage
from graphrag_rs_spark.operators.textstats import _tokens

END = "</w>"  # classic end-of-word sentinel: merges can't cross words


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """corpus → (word, wc). The ONE corpus-sized shuffle."""
    return (
        docs.select(F.explode(_tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    return words.select(
        "word", "wc", F.concat(chars, F.array(F.lit(END))).alias("syms")
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """(word, wc, syms) → (left_sym, right_sym, pair_count), weighted by
    word count. zip_with over two slices — no posexplode double-explode."""
    n = F.size("syms")
    pairs = F.zip_with(
        F.slice("syms", 1, n - 1),
        F.slice("syms", 2, n - 1),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        vocab.where(n >= 2)
        .select("wc", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym"))
        .agg(F.sum("wc").alias("pair_count"))
    )


def _merge_vocab(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy left-to-right fusion of (left,right) → left+right in every
    symbol array — the sequential scan BPE is defined by, Arrow-batched."""
    from pyspark.sql.types import ArrayType, StringType

    merged = left + right

    @F.pandas_udf(ArrayType(StringType()))
    def fuse(col: pd.Series) -> pd.Series:
        def m(lst):
            out, i, n = [], 0, len(lst)
            while i < n:
                if i + 1 < n and lst[i] == left and lst[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(lst[i])
                    i += 1
            return out

        return col.apply(m)

    # cheap prefilter: only words containing the pair go through the UDF
    has_pair = F.arrays_overlap("syms", F.array(F.lit(left))) & F.arrays_overlap(
        "syms", F.array(F.lit(right))
    )
    untouched = vocab.where(~has_pair)
    touched = vocab.where(has_pair).withColumn("syms", fuse("syms"))
    return untouched.unionByName(touched)


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """→ ordered merge table [(left, right, pair_count)], length ≤ n_merges
    (shorter if the corpus runs dry). Tie-break: count desc, then (left,
    right) asc — fully deterministic."""
    # cut_lineage, NOT localCheckpoint: the merge loop references the
    # prior vocab twice per round (touched/untouched split) — exactly the
    # originStats planning blow-up iterutil.py documents
    vocab = cut_lineage(_initial_symbols(word_counts(docs, text_col)), "bpe")
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(vocab)
            .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_count"] < min_pair_count:
            break
        left, right, cnt = (
            top[0]["left_sym"], top[0]["right_sym"], int(top[0]["pair_count"])
        )
        merges.append((left, right, cnt))
        vocab = cut_lineage(_merge_vocab(vocab, left, right), "bpe")
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a merge table: encode the DISTINCT words once (classic
    rank-priority merge loop per word, Arrow-batched), then map the corpus
    through the word→pieces dictionary with one join.
    → (id_col, word, pieces array<string>) rows in document word order
    collapsed to distinct (doc, word) — callers needing running text
    re-explode from their own token stream."""
    from pyspark.sql.types import ArrayType, StringType

    ranks = {(l, r): i for i, (l, r, _c) in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def encode(col: pd.Series) -> pd.Series:
        def enc(word):
            syms = list(word) + [END]
            while len(syms) >= 2:
                best, best_rank = None, None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best, best_rank = i, r
                if best is None:
                    break
                syms[best : best + 2] = [syms[best] + syms[best + 1]]
            return syms

        return col.apply(enc)

    toks = docs.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("word")
    ).distinct()
    pieces = (
        toks.select("word").distinct().withColumn("pieces", encode("word"))
    )
    return toks.join(pieces, "word").select(id_col, "word", "pieces")


def spark_pair_counts_from_docs(
    spark: SparkSession, docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Convenience: corpus → first-iteration merge candidates."""
    return pair_counts(_initial_symbols(word_counts(docs, text_col)))
