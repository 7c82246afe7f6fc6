"""token_window_pairs (banded proximity join) and exact_bow_groups."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.dedup import exact_bow_groups
from graphrag_rs_spark.operators.relationships import token_window_pairs


def _chunks(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, content string")


def _gaz(spark, names):
    return spark.createDataFrame(
        [(n, "CONCEPT") for n in names], "name string, entity_type string"
    )


def test_window_pairs_counts_and_min_gap(spark):
    c = _chunks(spark, [("d1", "ant x bee x x ant bee")])
    # tokens: ant(1) x(2) bee(3) x(4) x(5) ant(6) bee(7)
    out = {
        (r["subj"], r["obj"]): (r["pair_count"], r["min_gap"])
        for r in token_window_pairs(
            c, _gaz(spark, ["ant", "bee"]), window=3
        ).collect()
    }
    # within 3: (1,3) gap2, (3,6) gap3, (6,7) gap1 — (1,6) gap5 and
    # (1,7)/(3,7)... (3,7) gap4 out; same-name (1,6) excluded anyway
    assert out == {("ant", "bee"): (3, 1)}


def test_window_pairs_match_naive_join(spark):
    # property: banded join == naive quadratic join on a wordy fixture
    docs = [
        ("d%d" % i, " ".join(["ant", "x", "bee", "cow", "y"] * 7))
        for i in range(4)
    ] + [("dz", "cow bee " + "z " * 30 + "ant cow")]
    c = _chunks(spark, docs)
    g = _gaz(spark, ["ant", "bee", "cow"])
    for w in (1, 2, 5, 13):
        banded = {
            tuple(r)
            for r in token_window_pairs(c, g, window=w).collect()
        }
        # naive: all pairs, positions measured in the FULL token stream
        full = (
            c.select(
                "doc_id",
                F.posexplode(
                    F.split(F.lower("content"), "[^a-z0-9]+")
                ).alias("p", "tok"),
            )
            .where(F.col("tok") != "")
            .select(
                "doc_id",
                F.row_number().over(
                    Window.partitionBy("doc_id").orderBy("p")
                ).alias("pos"),
                "tok",
            )
            .where(F.col("tok").isin("ant", "bee", "cow"))
        )
        a = full.select("doc_id", F.col("pos").alias("pa"), F.col("tok").alias("na"))
        b = full.select("doc_id", F.col("pos").alias("pb"), F.col("tok").alias("nb"))
        naive = {
            tuple(r)
            for r in a.join(b, "doc_id")
            .where(
                (F.col("pb") > F.col("pa"))
                & (F.col("pb") - F.col("pa") <= w)
                & (F.col("na") != F.col("nb"))
            )
            .select(
                F.least("na", "nb").alias("subj"),
                F.greatest("na", "nb").alias("obj"),
                (F.col("pb") - F.col("pa")).alias("gap"),
            )
            .groupBy("subj", "obj")
            .agg(F.count("*").alias("pair_count"), F.min("gap").alias("min_gap"))
            .collect()
        }
        assert banded == naive, f"window={w}"


def test_window_pairs_rejects_bad_window(spark):
    with pytest.raises(ValueError):
        token_window_pairs(
            _chunks(spark, [("d", "x")]), _gaz(spark, ["x"]), window=0
        )


def test_bow_groups_order_and_punct_invariant(spark):
    df = spark.createDataFrame(
        [
            ("a", "the cat sat"),
            ("b", "sat... THE cat!"),   # same multiset
            ("c", "the cat sat sat"),   # different multiplicity
            ("d", "unrelated words"),
        ],
        "doc_id string, text string",
    )
    out = {r["id"]: (r["bow_group_id"], r["group_size"])
           for r in exact_bow_groups(df).collect()}
    assert out["a"] == ("a", 2) and out["b"] == ("a", 2)
    assert out["c"] == ("c", 1) and out["d"] == ("d", 1)


def test_token_entropy_hand_values(spark):
    import math

    from graphrag_rs_spark.operators.textstats import token_entropy

    df = spark.createDataFrame(
        [
            ("u", "a b c d"),          # uniform: H = 2 bits
            ("r", "a a a a"),          # degenerate: H = 0
            ("m", "a a b"),            # H = log2(3) - (2*1)/3
            ("e", "...!!!"),           # no tokens: dropped
        ],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert set(out) == {"u", "r", "m"}
    assert (out["u"]["n_tokens"], out["u"]["n_distinct"]) == (4, 4)
    assert out["u"]["entropy_mb"] == 2000
    assert out["r"]["entropy_mb"] == 0
    want_m = math.floor((math.log2(3) - 2 * math.log2(2) / 3) * 1000)
    assert out["m"]["entropy_mb"] == want_m


def test_key_skew_profile_buckets(spark):
    from graphrag_rs_spark.operators.analytics import key_skew_profile
    import pytest as _pytest

    rows = [("hot",)] * 1234 + [("warm",)] * 25 + [("a",), ("b",), ("c",)]
    df = spark.createDataFrame(rows, "k string")
    out = {r["bucket_digits"]: r for r in key_skew_profile(df, ["k"]).collect()}
    assert set(out) == {1, 2, 4}
    assert out[4]["n_keys"] == 1 and out[4]["max_count"] == 1234
    assert out[2]["min_count"] == 25
    assert out[1]["n_keys"] == 3 and out[1]["rows_total"] == 3
    with _pytest.raises(ValueError):
        key_skew_profile(df, [])


def test_image_entropy_real_decode(spark):
    import math

    from graphrag_rs_spark.operators.multimodal import image_entropy, make_png

    # the decoded-pixel entropy must equal the value derived from the
    # generative pixel law — the codec-independence the oracle relies on
    media = spark.createDataFrame(
        [("a", make_png(8, 8, seed=3)), ("bad", b"notapng")],
        "media_id string, payload binary",
    )
    out = {r["media_id"]: r for r in image_entropy(media).collect()}
    # hand histogram from the pixel law (3+x+y) % 256, x,y in [0,8)
    from collections import Counter

    c = Counter((3 + x + y) % 256 for x in range(8) for y in range(8))
    n = sum(c.values())
    h = math.log2(n) - sum(v * math.log2(v) for v in c.values()) / n
    assert out["a"]["n_pixels"] == 64
    assert out["a"]["n_distinct"] == len(c)
    assert out["a"]["entropy_mb"] == math.floor(h * 1000)
    assert out["bad"]["entropy_mb"] is None  # decode failure -> nulls


def test_edge_support_hand_counts(spark):
    import pytest as _pytest

    from graphrag_rs_spark.operators.analytics import edge_support

    # 4-clique + pendant: clique edges support 2, pendant edge 0
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
         ("c", "d"), ("d", "p"), ("a", "a")],
        "src string, dst string",
    )
    out = {(r["src"], r["dst"]): r["support"] for r in edge_support(e).collect()}
    assert out[("d", "p")] == 0
    assert all(out[k] == 2 for k in out if k != ("d", "p"))
    with _pytest.raises(ValueError, match="max_degree"):
        edge_support(e, max_degree=2)


def test_audio_entropy_matches_sample_law(spark):
    import math
    from collections import Counter

    from graphrag_rs_spark.operators.multimodal import audio_entropy, make_wav

    media = spark.createDataFrame(
        [("a", make_wav(40, 8000)), ("bad", b"RIFFxxxx")],
        "media_id string, payload binary",
    )
    out = {r["media_id"]: r for r in audio_entropy(media).collect()}
    n = 8000 * 40 // 1000
    c = Counter(abs(((i * 7) % 256) - 128) for i in range(n))
    h = math.log2(n) - sum(v * math.log2(v) for v in c.values()) / n
    assert out["a"]["n_samples"] == n
    assert out["a"]["n_distinct"] == len(c)
    assert out["a"]["entropy_mb"] == math.floor(h * 1000)
    assert out["bad"]["entropy_mb"] is None


def test_js_divergence_hand_values(spark):
    import math

    from graphrag_rs_spark.operators.textstats import js_divergence

    a = spark.createDataFrame([("1", "x x y")], "doc_id string, text string")
    b = spark.createDataFrame([("2", "x y y")], "doc_id string, text string")
    row = js_divergence(a, b).collect()[0]
    assert (row["n_tokens_a"], row["n_tokens_b"], row["vocab_union"]) == (3, 3, 2)
    # p=(2/3,1/3), q=(1/3,2/3), m=(1/2,1/2)
    js = 0.5 * ((2/3) * math.log2((2/3) / 0.5) + (1/3) * math.log2((1/3) / 0.5)) \
       + 0.5 * ((1/3) * math.log2((1/3) / 0.5) + (2/3) * math.log2((2/3) / 0.5))
    assert row["js_mb"] == math.floor(js * 1000)
    # identical corpora: JS = 0; disjoint corpora: JS = 1 bit
    same = js_divergence(a, a).collect()[0]
    assert same["js_mb"] == 0
    c = spark.createDataFrame([("3", "z z z")], "doc_id string, text string")
    disjoint = js_divergence(a, c).collect()[0]
    assert disjoint["js_mb"] == 1000
