"""weighted_sssp / audio_dhash / interval_overlap_join — hand fixtures."""

from __future__ import annotations

import struct

import pytest

from pyspark.sql import functions as F


# ------------------------------------------------------------ weighted sssp
def _wedges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, w long")


def test_weighted_sssp_prefers_cheap_two_hop(spark):
    from graphrag_rs_spark.operators.traversal import weighted_sssp

    e = _wedges(spark, [("a", "b", 1), ("b", "c", 1), ("a", "c", 5)])
    srcs = spark.createDataFrame([("a",)], "id string")
    # 2 rounds reach the cheap a-b-c path
    d2 = {r["node"]: r["dist"]
          for r in weighted_sssp(e, srcs, n_rounds=2).collect()}
    assert d2 == {"a": 0, "b": 1, "c": 2}
    # 1 round only sees the direct (expensive) edge
    d1 = {r["node"]: r["dist"]
          for r in weighted_sssp(e, srcs, n_rounds=1).collect()}
    assert d1 == {"a": 0, "b": 1, "c": 5}


def test_weighted_sssp_directed_and_zero_rounds(spark):
    from graphrag_rs_spark.operators.traversal import weighted_sssp

    e = _wedges(spark, [("a", "b", 3)])
    src_b = spark.createDataFrame([("b",)], "id string")
    out = weighted_sssp(e, src_b, n_rounds=4, directed=True).collect()
    assert {(r["node"], r["dist"]) for r in out} == {("b", 0)}
    src_a = spark.createDataFrame([("a",)], "id string")
    out0 = weighted_sssp(e, src_a, n_rounds=0).collect()
    assert {(r["node"], r["dist"]) for r in out0} == {("a", 0)}
    with pytest.raises(ValueError):
        weighted_sssp(e, src_a, n_rounds=-1)


def test_weighted_sssp_parallel_edges_take_min(spark):
    from graphrag_rs_spark.operators.traversal import weighted_sssp

    e = _wedges(spark, [("a", "b", 7), ("a", "b", 2)])
    srcs = spark.createDataFrame([("a",)], "id string")
    d = {r["node"]: r["dist"]
         for r in weighted_sssp(e, srcs, n_rounds=1).collect()}
    assert d["b"] == 2


# -------------------------------------------------------------- audio dhash
def _wav8(samples: bytes, rate: int = 8000) -> bytes:
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate, 1, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(samples)) + samples)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id string, payload binary")


def test_audio_dhash_gain_invariant_and_flags(spark):
    from graphrag_rs_spark.operators.multimodal import audio_dhash

    base = bytes(128 + ((i * 13) % 60) - 30 for i in range(400))
    doubled = bytes(128 + 2 * (b - 128) for b in base)  # exact 2x gain
    rows = [
        ("base", _wav8(base)),
        ("loud", _wav8(doubled)),
        ("short", _wav8(bytes(range(40)))),   # 40 samples < 65 frames
        ("junk", b"not audio"),
    ]
    out = {r["media_id"]: (r["adhash"], r["decode_ok"])
           for r in audio_dhash(_media(spark, rows)).collect()}
    # envelope gradient survives uniform gain
    assert out["base"] == out["loud"] and out["base"][1] == "ok"
    assert out["short"] == (None, "too_short")
    assert out["junk"] == (None, "decode_error")
    assert -(1 << 63) <= out["base"][0] < (1 << 63)


def test_audio_dhash_deterministic_and_guard(spark):
    from graphrag_rs_spark.operators.multimodal import audio_dhash, make_wav

    rows = [(str(d), make_wav(40 + d, 8000)) for d in range(5)]
    h1 = sorted(map(tuple, audio_dhash(_media(spark, rows)).collect()))
    h2 = sorted(map(tuple, audio_dhash(_media(spark, rows)).collect()))
    assert h1 == h2
    with pytest.raises(ValueError):
        audio_dhash(_media(spark, rows), n_frames=70)


# --------------------------------------------------------- interval overlap
def test_interval_overlap_boundaries_and_multibucket(spark):
    from graphrag_rs_spark.operators.asof import interval_overlap_join

    # width 10; interval [5, 25) spans buckets 0,1,2
    iv = spark.createDataFrame(
        [("i1", 5, 25), ("empty", 30, 30)],  # degenerate drops out
        "iv_id string, s long, e long",
    )
    pt = spark.createDataFrame(
        [("at_start", 5), ("inside", 14), ("at_end", 25), ("before", 4)],
        "pt_id string, t long",
    )
    pairs = interval_overlap_join(
        iv, pt, start_col="s", end_col="e", time_col="t", bucket_width=10
    )
    got = sorted((r["iv_id"], r["pt_id"]) for r in pairs.collect())
    # half-open [s, e): start in, end out; each match exactly once
    assert got == [("i1", "at_start"), ("i1", "inside")]


def test_interval_overlap_no_duplicate_pairs(spark):
    from graphrag_rs_spark.operators.asof import interval_overlap_join

    iv = spark.createDataFrame([("i1", 0, 100)], "iv_id string, s long, e long")
    pt = spark.createDataFrame([("p", 50)], "pt_id string, t long")
    pairs = interval_overlap_join(
        iv, pt, start_col="s", end_col="e", time_col="t", bucket_width=7
    )
    assert pairs.count() == 1  # interval covers 15 buckets, pair emitted once
    with pytest.raises(ValueError):
        interval_overlap_join(
            iv, pt, start_col="s", end_col="e", time_col="t", bucket_width=0
        )
