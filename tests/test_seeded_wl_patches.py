"""seeded_label_propagation / wl_labels / image_patches — hand fixtures."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _seeds(spark, rows):
    return spark.createDataFrame(rows, "id string, label string")


# --------------------------------------------------------------- seeded LPA
def test_seeded_lpa_hops_and_unreached(spark):
    from graphrag_rs_spark.operators.lpa import seeded_label_propagation

    # path a-b-c-d plus disconnected pair x-y; seed a:X
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")])
    out = {r["node"]: (r["label"], r["round"])
           for r in seeded_label_propagation(
               e, _seeds(spark, [("a", "X")]), n_rounds=5).collect()}
    assert out["a"] == ("X", 0)
    assert out["b"] == ("X", 1)
    assert out["c"] == ("X", 2)
    assert out["d"] == ("X", 3)
    assert out["x"] == (None, None) and out["y"] == (None, None)


def test_seeded_lpa_majority_and_tiebreak(spark):
    from graphrag_rs_spark.operators.lpa import seeded_label_propagation

    # m has two X-neighbors and one Y-neighbor -> majority X;
    # t has one X- and one Y-neighbor -> tie -> label asc -> X
    e = _edges(spark, [("s1", "m"), ("s2", "m"), ("s3", "m"),
                       ("s1", "t"), ("s3", "t")])
    seeds = _seeds(spark, [("s1", "X"), ("s2", "X"), ("s3", "Y")])
    out = {r["node"]: r["label"]
           for r in seeded_label_propagation(e, seeds, n_rounds=2).collect()}
    assert out["m"] == "X"
    assert out["t"] == "X"


def test_seeded_lpa_seeds_stay_clamped(spark):
    from graphrag_rs_spark.operators.lpa import seeded_label_propagation

    e = _edges(spark, [("a", "b")])
    seeds = _seeds(spark, [("a", "X"), ("b", "Y")])
    out = {r["node"]: (r["label"], r["round"])
           for r in seeded_label_propagation(e, seeds, n_rounds=3).collect()}
    assert out["a"] == ("X", 0) and out["b"] == ("Y", 0)


def test_seeded_lpa_small_path_equals_distributed(spark):
    from graphrag_rs_spark.operators.lpa import seeded_label_propagation

    # multi-seed graph with competition, ties, an unreached island and
    # an off-graph seed — every semantic corner the replay must mirror
    pairs = [(f"n{i}", f"n{(i * 7 + 3) % 40}") for i in range(40)]
    pairs += [("n1", "m1"), ("m1", "m2"), ("iso1", "iso2")]
    e = _edges(spark, [p for p in pairs if p[0] != p[1]])
    seeds = _seeds(spark, [("n0", "B"), ("n13", "A"), ("m2", "A"),
                           ("ghost", "Z")])
    small = {(r["node"], r["label"], r["round"])
             for r in seeded_label_propagation(e, seeds, n_rounds=4).collect()}
    dist = {(r["node"], r["label"], r["round"])
            for r in seeded_label_propagation(
                e, seeds, n_rounds=4, collect_threshold=0).collect()}
    assert small == dist


def test_seeded_lpa_null_and_duplicate_seeds_route_distributed(spark):
    from graphrag_rs_spark.operators.lpa import seeded_label_propagation

    e = _edges(spark, [("a", "b"), ("b", "c")])
    # duplicate seed id: rows multiply votes and the output join — the
    # driver dict cannot mirror that, so both paths must agree (i.e. the
    # guard must fall back to the distributed plan)
    dup = spark.createDataFrame([("a", "X"), ("a", "Y")], "id string, label string")
    small = sorted((r["node"], r["label"], r["round"])
                   for r in seeded_label_propagation(e, dup, n_rounds=2).collect())
    dist = sorted((r["node"], r["label"], r["round"])
                  for r in seeded_label_propagation(
                      e, dup, n_rounds=2, collect_threshold=0).collect())
    assert small == dist
    # NULL label routes too
    nul = spark.createDataFrame([("a", None)], "id string, label string")
    s2 = sorted((r["node"], r["label"], r["round"])
                for r in seeded_label_propagation(e, nul, n_rounds=2).collect())
    d2 = sorted((r["node"], r["label"], r["round"])
                for r in seeded_label_propagation(
                    e, nul, n_rounds=2, collect_threshold=0).collect())
    assert s2 == d2


# ---------------------------------------------------------------------- WL
def test_wl_colors_reflect_structural_roles(spark):
    from graphrag_rs_spark.operators.analytics import wl_labels

    # path a-b-c-d: ends {a,d} share a color, middles {b,c} share one
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    out = {r["node"]: r["wl_label"] for r in wl_labels(e).collect()}
    assert out["a"] == out["d"] and out["b"] == out["c"]
    assert out["a"] != out["b"]
    n_colors = wl_labels(e).select("n_colors").first()["n_colors"]
    assert n_colors == 2


def test_wl_regular_graph_is_monochrome_and_deterministic(spark):
    from graphrag_rs_spark.operators.analytics import wl_labels

    # 4-cycle: 2-regular, 1-WL cannot split it -> one color
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    o1 = sorted(map(tuple, wl_labels(e).collect()))
    o2 = sorted(map(tuple, wl_labels(e).collect()))
    assert o1 == o2
    assert len({l for _, l, _ in o1}) == 1


def test_wl_small_path_equals_distributed(spark):
    from graphrag_rs_spark.operators.analytics import wl_labels

    # irregular graph: varying degrees so the colors actually refine,
    # plus a disconnected triangle
    pairs = [(f"w{i}", f"w{(i * 3 + 1) % 17}") for i in range(17)]
    pairs += [("t1", "t2"), ("t2", "t3"), ("t3", "t1")]
    e = _edges(spark, [p for p in pairs if p[0] != p[1]])
    small = sorted(map(tuple, wl_labels(e, n_rounds=3).collect()))
    dist = sorted(map(tuple, wl_labels(e, n_rounds=3, collect_threshold=0).collect()))
    assert small == dist  # bit-identical colors AND n_colors


# ------------------------------------------------------------------ patches
def test_image_patches_exact_sums(spark):
    from graphrag_rs_spark.kernel.media import encode_png
    from graphrag_rs_spark.operators.multimodal import image_patches

    px = np.arange(16, dtype=np.uint8).reshape(4, 4)  # 4x4, grid 2
    media = spark.createDataFrame(
        [("a", encode_png(px)), ("junk", b"nope")],
        "media_id string, payload binary",
    )
    rows = image_patches(media, grid=2).collect()
    got = {(r["media_id"], r["py"], r["px"]):
           (r["n_px"], r["sum_i"], r["mean_cpm"]) for r in rows}
    # top-left patch = [[0,1],[4,5]] -> sum 10, mean 2.50
    assert got[("a", 0, 0)] == (4, 10, 250)
    assert got[("a", 0, 1)] == (4, 2 + 3 + 6 + 7, 450)
    assert got[("a", 1, 0)] == (4, 8 + 9 + 12 + 13, 1050)
    assert got[("a", 1, 1)] == (4, 10 + 11 + 14 + 15, 1250)
    # corrupt payload -> one sentinel row
    assert got[("junk", -1, -1)] == (0, 0, 0)
    assert len(got) == 5


def test_image_patches_grid_guard(spark):
    from graphrag_rs_spark.operators.multimodal import image_patches, make_png

    media = spark.createDataFrame(
        [("a", make_png(8, 8))], "media_id string, payload binary"
    )
    with pytest.raises(ValueError):
        image_patches(media, grid=0)
