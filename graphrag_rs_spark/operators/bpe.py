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


def _merge_vocab(vocab: DataFrame, pairs: list[tuple[str, str]]) -> DataFrame:
    """Greedy left-to-right fusion of each (left,right) → left+right in
    every symbol array, applied in list (= rank) order — the sequential
    scan BPE is defined by, Arrow-batched.  Batching pairwise
    symbol-disjoint pairs into ONE pass is exact: fusing (a,b) only
    removes a/b and inserts ab between their neighbors, so adjacencies of
    symbols outside {a,b} are untouched and each later scan sees exactly
    the arrays the sequential algorithm would have produced."""
    from pyspark.sql.types import ArrayType, StringType

    pairs = list(pairs)

    @F.pandas_udf(ArrayType(StringType()))
    def fuse(col: pd.Series) -> pd.Series:
        def m(lst):
            for left, right in pairs:
                merged = left + right
                out, i, n = [], 0, len(lst)
                while i < n:
                    if i + 1 < n and lst[i] == left and lst[i + 1] == right:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(lst[i])
                        i += 1
                lst = out
            return lst

        return col.apply(m)

    # cheap prefilter: only words containing some batched symbol go
    # through the UDF (arrays_overlap with the batch's symbol set)
    batch_syms = sorted({s for lr in pairs for s in lr})
    has_sym = F.arrays_overlap(
        "syms", F.array(*[F.lit(s) for s in batch_syms])
    )
    untouched = vocab.where(~has_sym)
    touched = vocab.where(has_sym).withColumn("syms", fuse("syms"))
    return untouched.unionByName(touched)


def _disjoint_batch(
    ranked: list[tuple[str, str, int]], batch_size: int
) -> list[tuple[str, str, int]]:
    """Prefix of the ranked candidate list that can be applied in one
    round: accept candidates in rank order (count desc, pair asc) while
    their symbols are disjoint from every previously accepted symbol;
    STOP at the first conflict (no skipping — a conflicting pair's count
    changes under the earlier merge, so it must be re-ranked next round).

    Exactness policy (round-5 verdict #6): when the accepted batch is
    pairwise symbol-disjoint, counts of later members are invariant under
    earlier members' fusions, so the batched outcome equals the
    sequential outcome UNLESS a merge-created pair (x, ab) would have
    outranked a later batch member.  Merge-created pairs are recounted
    next round; on natural-language corpora their counts are bounded by
    the creating pair's count, so divergence needs a near-tie — the
    fixture equivalence test pins the common case, and ``batch_size=1``
    is bit-exact sequential BPE by construction.
    """
    chosen: list[tuple[str, str, int]] = []
    seen: set[str] = set()
    for left, right, cnt in ranked:
        if len(chosen) >= batch_size:
            break
        if left in seen or right in seen:
            break
        chosen.append((left, right, cnt))
        seen.update((left, right, left + right))
    return chosen


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    batch_size: int = 1,
) -> list[tuple[str, str, int]]:
    """→ ordered merge table [(left, right, pair_count)], length ≤ n_merges
    (shorter if the corpus runs dry). Tie-break: count desc, then (left,
    right) asc — fully deterministic.

    ``batch_size=1`` is classic sequential BPE: one Spark job (pair count
    + argmax collect) per merge, so a production 32k-merge vocab costs
    32k rounds of scheduling latency. ``batch_size=m`` collects the top
    ranked pairs once per round and applies the longest pairwise
    symbol-disjoint PREFIX of that ranking in one fused pass (see
    ``_disjoint_batch`` for the exactness policy) — round count drops up
    to m× while counts stay corpus-exact because disjoint fusions cannot
    change each other's adjacencies."""
    # cut_lineage, NOT localCheckpoint: the merge loop references the
    # prior vocab twice per round (touched/untouched split) — exactly the
    # originStats planning blow-up iterutil.py documents
    vocab = cut_lineage(_initial_symbols(word_counts(docs, text_col)), "bpe")
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges:
        want = min(batch_size, n_merges - len(merges))
        # over-fetch so a mid-prefix conflict still leaves a full batch
        # visible for next-round ranking sanity (the batch itself only
        # ever takes the disjoint PREFIX)
        ranked = [
            (r["left_sym"], r["right_sym"], int(r["pair_count"]))
            for r in (
                pair_counts(vocab)
                .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
                .limit(max(1, want))
                .collect()
            )
            if r["pair_count"] >= min_pair_count
        ]
        if not ranked:
            break
        batch = _disjoint_batch(ranked, want)
        merges.extend(batch)
        vocab = cut_lineage(
            _merge_vocab(vocab, [(l, r) for l, r, _c in batch]), "bpe"
        )
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
