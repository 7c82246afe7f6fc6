"""Sequence packing (operators/packing.py) vs a pure-Python reference."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.operators.packing import pack_sequences, packing_stats


def _ref_pack(rows, cap):
    """rows: [(id, shard, tokens)] → {id: seq} per the greedy rule."""
    out = {}
    by_shard: dict = {}
    for i, s, t in rows:
        by_shard.setdefault(s, []).append((i, t or 0))
    for s, docs in by_shard.items():
        docs.sort()
        fill, seq, first = 0, 0, True
        for i, t in docs:
            if not first and fill + t > cap:
                seq += 1
                fill = t
            else:
                fill += t
                first = False
            out[i] = seq
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, shard long, n_tokens long")


def test_greedy_packing_matches_reference(spark):
    rows = [
        (1, 0, 100), (2, 0, 100), (3, 0, 100),   # 100+100 | 100
        (4, 0, 250), (5, 0, 10),                 # 250 alone? 100+250>256 → yes
        (6, 1, 50), (7, 1, 50), (8, 1, 50),      # all fit in one
    ]
    got = {
        r["doc_id"]: r["seq"]
        for r in pack_sequences(_df(spark, rows), max_tokens=256).collect()
    }
    assert got == _ref_pack(rows, 256)
    # shard 0: [1,2] then [3] (100+100+100>256) wait 200+100>256 → seq1=[3,?]
    assert got[1] == got[2] == 0 and got[3] == 1


def test_oversize_doc_gets_own_sequence(spark):
    rows = [(1, 0, 999), (2, 0, 10), (3, 0, 999), (4, 0, 5)]
    got = {
        r["doc_id"]: r["seq"]
        for r in pack_sequences(_df(spark, rows), max_tokens=100).collect()
    }
    # 999 | 10 ... 999 pushes out, 5 can't share with 999
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_null_tokens_pack_as_zero(spark):
    df = spark.createDataFrame(
        [(1, 0, 60), (2, 0, None), (3, 0, 60)],
        "doc_id long, shard long, n_tokens long",
    )
    got = {r["doc_id"]: (r["seq"], r["n_tokens"]) for r in
           pack_sequences(df, max_tokens=100).collect()}
    assert got == {1: (0, 60), 2: (0, 0), 3: (1, 60)}


def test_shards_pack_independently_and_deterministically(spark):
    import random

    rng = random.Random(7)
    rows = [(i, i % 5, rng.randint(1, 300)) for i in range(400)]
    a = pack_sequences(_df(spark, rows), max_tokens=512).collect()
    b = pack_sequences(
        _df(spark, rows).repartition(13), max_tokens=512
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    got = {r["doc_id"]: r["seq"] for r in a}
    assert got == _ref_pack(rows, 512)


def test_packing_stats(spark):
    rows = [(1, 0, 100), (2, 0, 100), (3, 0, 300)]
    packed = pack_sequences(_df(spark, rows), max_tokens=256)
    stats = {
        (r["shard"], r["seq"]): (r["n_docs"], r["seq_tokens"], r["fill_frac"])
        for r in packing_stats(packed, max_tokens=256).collect()
    }
    assert stats[(0, 0)] == (2, 200, round(200 / 256, 6))
    assert stats[(0, 1)] == (1, 300, 1.0)  # oversize clamps to 1.0


def test_max_tokens_must_be_positive(spark):
    with pytest.raises(ValueError):
        pack_sequences(_df(spark, [(1, 0, 1)]), max_tokens=0)
