"""Data-layout keys — clustering transforms for scan pruning.

Z-ordering maps multi-column predicates onto ONE sort key whose
ordering preserves locality in every interleaved dimension, so files
sorted/range-partitioned by the key carry tight min/max stats for ALL
the interleaved columns at once — the Delta/Iceberg `OPTIMIZE ZORDER`
primitive, expressed here as a pure codegen column so any writer
(`df.repartitionByRange(zkey).sortWithinPartitions(zkey).write`) gets
multi-dimensional data skipping from plain parquet min/max pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], *, bits: int = 16) -> Column:
    """Morton / Z-order interleave of ``len(cols)`` non-negative integer
    columns at ``bits`` bits each → one BIGINT sort key.

    Bit i of column j lands at output position ``i·k + (k−1−j)`` (k =
    number of columns), i.e. the columns' bits are interleaved
    round-robin from the LSB up, first column most significant within
    each round — the standard Morton layout. Total bits ``k·bits`` must
    fit 63 (signed long, non-negative). Inputs are masked to ``bits``
    bits (callers quantize/clamp first — the usual recipe is
    rank-or-scale into [0, 2^bits)).

    Pure integer shift/mask algebra — whole-stage codegen, no UDF, and
    bit-replayable by any engine (the oracle form is the same sum).
    """
    k = len(cols)
    if k == 0:
        raise ValueError("zorder_key needs at least one column")
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits = {k * bits} > 63 key bits")
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = (F.col(c) if isinstance(c, str) else c).cast("long")
        v = v.bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            out_pos = i * k + (k - 1 - j)
            key = key + F.shiftleft(
                F.shiftright(v, i).bitwiseAND(F.lit(1)), out_pos
            )
    return key
