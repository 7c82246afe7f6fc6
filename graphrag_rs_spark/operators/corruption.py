"""T5-style span corruption — deterministic masked (input, target) pairs.

Span-corruption pre-training (Raffel et al., "Exploring the Limits of
Transfer Learning with a Unified Text-to-Text Transformer", §3.1.4)
replaces contiguous token spans with sentinel tokens and asks the model
to emit the dropped spans after their sentinels. Production pipelines run
this as a bulk batch transform over the whole corpus; the reference has
no training-data surface at all, so this is a Spark-native extension in
the training-data family (dedup.py / mixture.py / packing.py).

Determinism (the whole point — shardable, resumable, oracle-checkable):
there is NO RNG. Tokens are whitespace-split and partitioned into fixed
blocks of ``block`` tokens; each block draws one portable 60-bit hash

    h = sha256(doc_id \\x1f block_index \\x1f seed)[:15 hex] as int

and is masked iff ``h % 3 == 0``, with span offset ``(h // 4) % (block-2)``
and span length ``1 + (h // 32) % 3`` (clipped to the block and the doc).
At most one span per block — spans can never overlap or touch across the
corpus, every shard computes its rows independently, and re-running any
subset of partitions reproduces byte-identical pairs (the checkpoint
story needs that). Expected mask rate ≈ (1/3) · 2/block ≈ 8 % of tokens
at the default block=8 — the T5 paper's 15 % corruption rate is reachable
by lowering ``block``; the knob is documented rather than hidden.

Spark shape: ONE map-only projection — token split, per-block hash, span
arithmetic, and the input/target rebuild are all nested array
``transform``/``filter``/``flatten`` expressions inside whole-stage
codegen. Zero shuffles, zero UDFs, zero driver state: at 100 TB this is
a pure scan whose cost is the parquet read plus sha256 per ~block tokens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"


def _h60(col: Column) -> Column:
    return F.conv(F.substring(F.sha2(col, 256), 1, 15), 16, 10).cast("long")


def span_corrupt(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    block: int = 8,
    seed: int = 42,
) -> DataFrame:
    """docs → (doc_id, n_tokens, n_masked, input_text, target_text).

    ``input_text``: the document with each masked span replaced by its
    sentinel ``<extra_id_K>`` (K = 0-based span order). ``target_text``:
    the dropped spans, each preceded by its sentinel, followed by the
    closing ``<extra_id_N>`` sentinel (T5's decoder format). Documents
    with no masked span emit an empty target and an untouched input.
    """
    if block < 4:
        raise ValueError("block must be >= 4 (span offset needs block-2 slots)")
    did = F.col(id_col).cast("string")
    # Tokens and spans are materialized as REAL COLUMNS in staged
    # projections, not inlined expressions: the per-token lambdas below
    # reference the span array, and an inlined span expression would be
    # re-evaluated (sha256 per block!) once per token — measured 20×
    # slower at sf0.1. Staged projections evaluate each once per row;
    # CollapseProject keeps them staged because they are expensive and
    # multiply referenced.
    toks_expr = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != "")
    staged = docs.withColumn("_toks", toks_expr)
    toks = F.col("_toks")
    n_tok = F.size(toks)
    n_blk = F.ceil(n_tok / F.lit(block)).cast("int")

    # one struct per block that actually masks a non-empty span:
    # (start, end) are 1-based token positions, end inclusive. Offset and
    # length use bit shifts (h >> 2, h >> 5), NOT float division — the
    # 60-bit hash exceeds double's 53-bit mantissa.
    def _span(blk: Column):
        h = _h60(
            F.concat_ws(SEP, did, blk.cast("string"), F.lit(str(seed)))
        )
        start = (blk.cast("long") * block
                 + F.shiftright(h, 2) % (block - 2) + 1)
        length = 1 + F.shiftright(h, 5) % 3
        end = F.least(
            start + length - 1,
            ((blk + 1) * block).cast("long"),
            n_tok.cast("long"),
        )
        return F.struct(
            (h % 3 == 0).alias("masked"),
            start.alias("start"),
            end.alias("end"),
        )

    # sequence() is clamped so the empty-doc case (n_blk = 0) cannot
    # generate a descending [0, -1] block range; the start <= n_tokens
    # filter then drops every candidate of an empty doc.
    spans_expr = F.filter(
        F.transform(F.sequence(F.lit(0), F.greatest(n_blk - 1, F.lit(0))), _span),
        lambda s: s["masked"]
        & (s["start"] >= 1)
        & (s["start"] <= n_tok.cast("long")),
    )
    staged = staged.withColumn("_spans", spans_expr)
    spans = F.col("_spans")

    def _sentinel(k: Column) -> Column:
        return F.concat(F.lit("<extra_id_"), k.cast("string"), F.lit(">"))

    # input: token kept unless inside a span; the span's FIRST position
    # emits the sentinel instead (transform -> array-of-arrays -> flatten
    # so a position can emit 0 or 1 strings).
    def _emit(x: Column, i0: Column):
        pos = (i0 + 1).cast("long")
        starting = F.filter(spans, lambda s: s["start"] == pos)
        inside = F.exists(
            spans, lambda s: (s["start"] <= pos) & (pos <= s["end"])
        )
        k = F.aggregate(
            spans,
            F.lit(0),
            lambda acc, s: acc + F.when(s["start"] < pos, 1).otherwise(0),
        )
        return (
            F.when(F.size(starting) > 0, F.array(_sentinel(k)))
            .when(inside, F.slice(F.array(x), 1, 0))
            .otherwise(F.array(x))
        )

    input_arr = F.flatten(F.transform(toks, _emit))
    target_arr = F.flatten(
        F.transform(
            spans,
            lambda s, k: F.concat(
                F.array(_sentinel(k)),
                F.slice(toks, s["start"].cast("int"), (s["end"] - s["start"] + 1).cast("int")),
            ),
        )
    )
    target_arr = F.when(
        F.size(spans) > 0,
        F.concat(target_arr, F.array(_sentinel(F.size(spans)))),
    ).otherwise(F.slice(F.array(F.lit("")), 1, 0))

    n_masked = F.aggregate(
        spans, F.lit(0).cast("long"), lambda acc, s: acc + (s["end"] - s["start"] + 1)
    )
    return staged.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_masked.alias("n_masked"),
        F.array_join(input_arr, " ").alias("input_text"),
        F.array_join(target_arr, " ").alias("target_text"),
    )
