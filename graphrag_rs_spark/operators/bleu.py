"""Clipped n-gram precision (the BLEU core) between text pairs.

Modified n-gram precision (Papineni et al. 2002): for each candidate/
reference pair, each candidate n-gram counts at most as often as it
appears in the reference (the clip), precision_n = Σ clipped / Σ cand.
This is the workhorse of generation eval and of training-data quality
checks (e.g. detecting template-degenerate continuations against their
prompts).  The brevity penalty needs exp() — deliberately NOT computed
here: candidate/reference token lengths ship in the output so any
caller can apply its preferred BP form; everything emitted is exact
integer arithmetic in micro-units.

Scale shape: explode both sides to (pair, gram, count) — two map-only
passes with a partial-agg groupBy each — then ONE co-partitioned join
on (pair, gram) computes the clip, and one groupBy per pair sums.  No
global state, no UDF; keys are (pair_id, gram) throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNIT = 1_000_000


def _gram_counts(df: DataFrame, text_col: str, n: int) -> DataFrame:
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    sz = F.size(toks)
    m = F.greatest(sz - (n - 1), F.lit(0))
    shifted = [F.slice(toks, i + 1, m) for i in range(n)]
    joined = shifted[0]
    for nxt in shifted[1:]:
        joined = F.zip_with(joined, nxt, lambda a, t: F.concat_ws(" ", a, t))
    return (
        df.select("pair_id", F.explode(joined).alias("g"))
        .groupBy("pair_id", "g")
        .agg(F.count("*").alias("c"))
    )


def clipped_ngram_precision(
    pairs: DataFrame,
    *,
    cand_col: str = "candidate",
    ref_col: str = "reference",
    id_col: str = "pair_id",
    n: int = 2,
) -> DataFrame:
    """pairs(pair_id, candidate, reference) → (pair_id, matched, total,
    precision_micro, cand_len, ref_len) for order-``n`` grams.

    precision_micro = matched · 10^6 div total (0 when the candidate
    has no n-grams); lengths are whitespace token counts.
    """
    base = pairs.select(
        F.col(id_col).alias("pair_id"),
        F.col(cand_col).alias("_c"),
        F.col(ref_col).alias("_r"),
    )
    lens = base.select(
        "pair_id",
        F.size(F.split(F.lower(F.trim(F.col("_c"))), r"\s+")).cast("long").alias("cand_len"),
        F.size(F.split(F.lower(F.trim(F.col("_r"))), r"\s+")).cast("long").alias("ref_len"),
    )
    cg = _gram_counts(base.select("pair_id", F.col("_c").alias("t")), "t", n)
    rg = _gram_counts(base.select("pair_id", F.col("_r").alias("t")), "t", n)
    clipped = (
        cg.join(
            rg.select("pair_id", "g", F.col("c").alias("rc")),
            ["pair_id", "g"],
            "left",
        )
        .groupBy("pair_id")
        .agg(
            F.sum(F.least("c", F.coalesce("rc", F.lit(0)))).alias("matched"),
            F.sum("c").alias("total"),
        )
    )
    return (
        lens.join(clipped, "pair_id", "left")
        .select(
            "pair_id",
            F.coalesce("matched", F.lit(0)).cast("long").alias("matched"),
            F.coalesce("total", F.lit(0)).cast("long").alias("total"),
            F.when(
                F.coalesce("total", F.lit(0)) == 0, F.lit(0).cast("long")
            )
            .otherwise(
                F.expr(
                    f"coalesce(matched, 0L) * {UNIT}L div coalesce(total, 1L)"
                )
            )
            .alias("precision_micro"),
            "cand_len",
            "ref_len",
        )
    )
