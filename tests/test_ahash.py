"""image_ahash (operators/multimodal.py) — perceptual-hash invariants."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.operators.multimodal import image_ahash, make_png


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id string, payload binary")


def test_identical_images_same_hash_garbage_flagged(spark):
    a = make_png(12, 8, seed=5)
    rows = [("a", a), ("b", a), ("junk", b"not a png")]
    out = {r["media_id"]: (r["ahash"], r["decode_ok"])
           for r in image_ahash(_media(spark, rows)).collect()}
    assert out["a"] == out["b"] and out["a"][1] == "ok"
    assert out["junk"] == (None, "decode_error")


def test_hash_is_64bit_and_deterministic(spark):
    rows = [(str(d), make_png(8 + d % 8, 8, seed=d)) for d in range(6)]
    h1 = sorted(map(tuple, image_ahash(_media(spark, rows)).collect()))
    h2 = sorted(map(tuple, image_ahash(_media(spark, rows)).collect()))
    assert h1 == h2
    assert all(-(1 << 63) <= r[1] < (1 << 63) for r in h1)


def test_near_duplicates_land_close_in_hamming(spark):
    # same gradient, one-pixel-equivalent seed shift: tiny hamming gap;
    # a very different image (wide) should be farther on average
    rows = [("x", make_png(8, 8, seed=10)), ("y", make_png(8, 8, seed=10)),
            ("z", make_png(15, 8, seed=200))]
    out = {r["media_id"]: r["ahash"] & ((1 << 64) - 1)
           for r in image_ahash(_media(spark, rows)).collect()}
    assert bin(out["x"] ^ out["y"]).count("1") == 0


def test_grid_guard(spark):
    with pytest.raises(ValueError):
        image_ahash(_media(spark, [("a", make_png(8, 8))]), grid=9)
