"""Round-5 batch: rich_club / closeness / fan_metrics / semdedup /
bloom filter / image_dhash — hand-computed fixtures."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


# --------------------------------------------------------------- rich club
def test_rich_club_hand_graph(spark):
    from graphrag_rs_spark.operators.analytics import rich_club

    # triangle a-b-c plus pendant d-a: deg a=3, b=2, c=2, d=1
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("d", "a")])
    out = {r["k"]: (r["n_rich"], r["e_rich"], r["phi_ppm"])
           for r in rich_club(e, ks=(0, 1, 2, 3)).collect()}
    # k=0: all 4 nodes, all 4 edges -> 2*4/(4*3) = 0.666666
    assert out[0] == (4, 4, 666666)
    # k=1: {a,b,c}, induced triangle -> density 1
    assert out[1] == (3, 3, 1000000)
    # k=2: only a -> N<2 -> NULL phi
    assert out[2] == (1, 0, None)
    # k=3: no node of degree >3 -> no row at all
    assert 3 not in out


def test_rich_club_empty_ks_raises(spark):
    from graphrag_rs_spark.operators.analytics import rich_club

    with pytest.raises(ValueError):
        rich_club(_edges(spark, [("a", "b")]), ks=())


# -------------------------------------------------------------- closeness
def test_closeness_path_and_disconnected(spark):
    from graphrag_rs_spark.operators.traversal import closeness_centrality

    # path a-b-c-d plus disconnected pair e-f; n = 6
    e = _edges(
        spark, [("a", "b"), ("b", "c"), ("c", "d"), ("e", "f")]
    )
    srcs = spark.createDataFrame([("a",), ("e",)], "id string")
    out = {r["source"]: r for r in closeness_centrality(e, srcs).collect()}
    # a reaches b@1 c@2 d@3: sum=6, r=4 -> (3^2)/(6*5) = 0.3
    assert out["a"]["sum_dist"] == 6 and out["a"]["n_reached"] == 4
    assert out["a"]["closeness_ppm"] == 300000
    # e reaches f@1: sum=1, r=2 -> 1/(1*5) = 0.2
    assert out["e"]["closeness_ppm"] == 200000


def test_closeness_isolated_source_null(spark):
    from graphrag_rs_spark.operators.traversal import closeness_centrality

    e = _edges(spark, [("a", "b")])
    srcs = spark.createDataFrame([("z",)], "id string")
    rows = closeness_centrality(e, srcs).collect()
    assert len(rows) == 1 and rows[0]["closeness_ppm"] is None


# ------------------------------------------------------------ fan metrics
def test_fan_metrics_martin_instability(spark):
    from graphrag_rs_spark.operators.code_graph import fan_metrics

    dep = spark.createDataFrame(
        [("r", "a.py", "r", "b.py"),
         ("r", "a.py", "r", "c.py"),
         ("r", "b.py", "r", "c.py"),
         ("r", "a.py", "r", "b.py")],  # duplicate edge must dedupe
        "src_repo string, src_path string, dst_repo string, dst_path string",
    )
    out = {r["path"]: r for r in fan_metrics(dep).collect()}
    assert (out["a.py"]["fan_in"], out["a.py"]["fan_out"]) == (0, 2)
    assert (out["b.py"]["fan_in"], out["b.py"]["fan_out"]) == (1, 1)
    assert (out["c.py"]["fan_in"], out["c.py"]["fan_out"]) == (2, 0)
    assert out["a.py"]["instability_pm"] == 1000  # pure leaf glue
    assert out["b.py"]["instability_pm"] == 500
    assert out["c.py"]["instability_pm"] == 0     # load-bearing core


# ---------------------------------------------------------------- semdedup
def test_semdedup_first_id_kept_per_semantic_group(spark):
    from graphrag_rs_spark.operators.similarity import semdedup

    rows = [("a", [100.0, 0.0]), ("b", [100.0, 0.0]),
            ("c", [0.0, 100.0]), ("d", [0.0, 100.0])]
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    out = {r["id"]: r for r in
           semdedup(emb, n_centroids=2, n_iters=2, threshold=0.3).collect()}
    assert len(out) == 4
    # exactly the first id of each identical pair survives
    assert out["a"]["kept"] is True and out["b"]["kept"] is False
    assert out["c"]["kept"] is True and out["d"]["kept"] is False
    # dropped rows carry the cosine that killed them
    assert out["b"]["max_prior_cosine"] == 1.0
    assert out["d"]["max_prior_cosine"] == 1.0
    # clusters agree within each pair
    assert out["a"]["cluster"] == out["b"]["cluster"]
    assert out["c"]["cluster"] == out["d"]["cluster"]


def test_semdedup_threshold_gates_pruning(spark):
    from graphrag_rs_spark.operators.similarity import semdedup

    rows = [("a", [100.0, 0.0]), ("b", [100.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    out = semdedup(emb, n_centroids=1, n_iters=1, threshold=1.5)
    assert all(r["kept"] for r in out.collect())  # nothing exceeds tau


# ------------------------------------------------------------------- bloom
def test_bloom_no_false_negatives_and_deterministic(spark):
    from graphrag_rs_spark.operators.sketches import bloom_bits, bloom_probe

    members = spark.createDataFrame(
        [(f"tok{i}",) for i in range(200)], "key string"
    )
    strangers = spark.createDataFrame(
        [(f"other{i}",) for i in range(200)], "key string"
    )
    bits = bloom_bits(members, m_bits=4096, k_hashes=4)
    b1 = sorted(r["bit"] for r in bits.collect())
    b2 = sorted(r["bit"] for r in bloom_bits(members, m_bits=4096,
                                             k_hashes=4).collect())
    assert b1 == b2 and len(b1) <= 800 and all(0 <= b < 4096 for b in b1)

    probed = bloom_probe(members.union(strangers), bits,
                         m_bits=4096, k_hashes=4)
    got = {r["key"]: r["bloom_hit"] for r in probed.collect()}
    # the one-sided guarantee: every true member hits
    assert all(got[f"tok{i}"] for i in range(200))
    # at 200 keys in 4096 bits the FPR bound (1-e^{-kn/m})^k is ~0.1%;
    # all 200 strangers passing would mean the filter is broken
    assert sum(got[f"other{i}"] for i in range(200)) < 50


# ------------------------------------------------------------------- dhash
def test_dhash_brightness_shift_invariant(spark):
    from graphrag_rs_spark.kernel.media import encode_png
    from graphrag_rs_spark.operators.multimodal import image_dhash

    rng = np.random.RandomState(7)
    px = rng.randint(20, 200, size=(16, 16)).astype(np.uint8)
    base = encode_png(px)
    brighter = encode_png(px + 30)  # no clipping: max 229
    media = spark.createDataFrame(
        [("base", base), ("bright", brighter), ("junk", b"nope")],
        "media_id string, payload binary",
    )
    out = {r["media_id"]: (r["dhash"], r["decode_ok"])
           for r in image_dhash(media).collect()}
    # horizontal gradients are shift-invariant: identical hash
    assert out["base"] == out["bright"] and out["base"][1] == "ok"
    assert out["junk"] == (None, "decode_error")
    assert -(1 << 63) <= out["base"][0] < (1 << 63)


def test_dhash_grid_guard(spark):
    from graphrag_rs_spark.operators.multimodal import image_dhash, make_png

    media = spark.createDataFrame(
        [("a", make_png(8, 8))], "media_id string, payload binary"
    )
    with pytest.raises(ValueError):
        image_dhash(media, grid=9)
