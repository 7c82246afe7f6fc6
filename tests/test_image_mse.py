"""Pairwise image SSE (operators/multimodal.py: image_pair_mse)."""

from graphrag_rs_spark.operators.multimodal import image_pair_mse, make_png


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "pair_id string, payload_a binary, payload_b binary"
    )


def test_identical_images_score_zero(spark):
    png = make_png(8, 8, seed=3)
    out = image_pair_mse(_pairs(spark, [("p", png, png)])).collect()
    assert out[0].sse == 0
    assert out[0].n_px == 64
    assert out[0].decode_ok == "ok"


def test_shifted_seed_gives_constant_difference(spark):
    # same dims, pixel law (seed+x+y)%256: seed 0 vs 1 differs by 1
    # everywhere (no wraparound for 8x8 with seeds 0/1) -> sse = 64
    a = make_png(8, 8, seed=0)
    b = make_png(8, 8, seed=1)
    out = image_pair_mse(_pairs(spark, [("p", a, b)])).collect()
    assert out[0].sse == 64


def test_corrupt_payload_reports_decode_error(spark):
    png = make_png(8, 8, seed=0)
    out = image_pair_mse(
        _pairs(spark, [("p", png, b"not a png")])
    ).collect()
    assert out[0].decode_ok == "decode_error"
    assert out[0].sse is None


def test_different_sizes_align_on_the_grid(spark):
    # decoding succeeds and the score is finite even when widths differ
    a = make_png(9, 8, seed=5)
    b = make_png(12, 8, seed=5)
    out = image_pair_mse(_pairs(spark, [("p", a, b)])).collect()
    assert out[0].decode_ok == "ok"
    assert out[0].sse is not None and out[0].sse >= 0
