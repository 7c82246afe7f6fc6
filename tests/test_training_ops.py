"""Training-data operators: dedup family, similarity search, text stats,
multimodal plumbing — correctness on constructed cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_exact_duplicates(spark):
    from graphrag_rs_spark.operators.dedup import exact_duplicates

    df = _docs(spark, ["same text here", "same text here", "different"])
    rows = {r["id"]: (r["dup_group_id"], r["group_size"]) for r in
            exact_duplicates(df, "text", "doc_id").collect()}
    assert rows[0] == (0, 2)
    assert rows[1] == (0, 2)
    assert rows[2] == (2, 1)


def test_minhash_finds_near_dups(spark):
    from graphrag_rs_spark.operators.dedup import minhash_lsh_duplicates

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy")
    far = "completely different content about spark dataframes and shuffles " * 5
    df = _docs(spark, [base, near, far])
    pairs = {(r["id_a"], r["id_b"]) for r in
             minhash_lsh_duplicates(df, "text", "doc_id", threshold=0.5).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_minhash_agrees_with_exact_jaccard(spark):
    from graphrag_rs_spark.operators.dedup import (
        minhash_lsh_duplicates,
        ngram_jaccard_pairs,
    )

    # 40 distinct base words; each doc changes one word → pairwise shingle
    # jaccard ≈ 0.74, comfortably above threshold and inside LSH recall
    texts = []
    base_words = [f"word{k}" for k in range(40)]
    for i in range(12):
        words = list(base_words)
        words[(i * 3) % len(words)] = f"variant{i}"
        texts.append(" ".join(words))
    df = _docs(spark, texts)
    lsh = {(r["id_a"], r["id_b"]) for r in
           minhash_lsh_duplicates(df, "text", "doc_id", threshold=0.6).collect()}
    exact = {(r["id_a"], r["id_b"]) for r in
             ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.6,
                                 max_block_size=10_000).collect()}
    # LSH candidates are exact-verified → no false positives; recall high
    assert lsh <= exact
    assert len(exact) > 0
    assert len(lsh) / len(exact) >= 0.9


def test_simhash_near_identical(spark):
    from graphrag_rs_spark.operators.dedup import simhash_duplicates

    # simhash needs many distinct tokens for a stable signature: with few
    # distinct words the per-bit sums sit near zero and single-token edits
    # flip many bits. 200 distinct words, one changed → hamming stays small.
    base = " ".join(f"tok{k}" for k in range(200))
    near = base.replace("tok100", "changed", 1)
    far = " ".join(f"other{k}" for k in range(200, 400))
    df = _docs(spark, [base, near, far])
    pairs = {(r["id_a"], r["id_b"]) for r in
             simhash_duplicates(df, "text", "doc_id", max_hamming=6).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs


def test_cosine_topk_bruteforce_exact(spark):
    import numpy as np

    from graphrag_rs_spark.operators.similarity import cosine_topk_bruteforce

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((30, 8)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        ["vec_id", "embedding"],
    )
    got = cosine_topk_bruteforce(df, k=3).collect()
    # verify one query against numpy
    q = 0
    sims = vecs @ vecs[q] / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[q]))
    sims[q] = -2
    want = list(np.argsort(-sims)[:3])
    got_q = [r["neighbor_id"] for r in sorted(
        (r for r in got if r["query_id"] == q), key=lambda r: r["rank"]
    )]
    assert got_q == want
    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append(r)
    assert all(len(v) == 3 for v in by_query.values())


def test_lsh_topk_recall(spark):
    import numpy as np

    from graphrag_rs_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_lsh,
    )

    rng = np.random.default_rng(11)
    # clustered data so LSH buckets are meaningful
    centers = rng.standard_normal((5, 16)) * 4
    vecs = np.vstack([c + rng.standard_normal((12, 16)) * 0.3 for c in centers])
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        ["vec_id", "embedding"],
    )
    exact = {(r["query_id"], r["neighbor_id"]) for r in
             cosine_topk_bruteforce(df, k=3).collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in
              cosine_topk_lsh(df, dim=16, k=3, n_planes=8, n_tables=6).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall}"


def test_lsh_portable_planes_exact_and_recall(spark):
    """The portable (sha256 + fixed-point) plane family: deterministic ±1
    matrix, summation-order-exact projections, and recall on par with the
    gaussian family — this is the family the DuckDB oracle replays."""
    import numpy as np

    from graphrag_rs_spark.operators.similarity import (
        PORTABLE_SCALE,
        cosine_topk_bruteforce,
        cosine_topk_lsh,
        portable_planes,
    )

    p1 = portable_planes(16, 8, 3)
    p2 = portable_planes(16, 8, 3)
    assert np.array_equal(p1, p2)
    assert set(np.unique(p1)) == {-1.0, 1.0}
    assert not np.array_equal(p1, portable_planes(16, 8, 4))

    # fixed-point projection is exact in any summation order: BLAS matmul
    # == sequential fold, bit-for-bit
    rng = np.random.default_rng(7)
    m = np.floor(rng.standard_normal((40, 16)) * PORTABLE_SCALE)
    blas = m @ p1.T
    seq = np.array([[sum(row[d] * p1[p, d] for d in range(16))
                     for p in range(8)] for row in m])
    assert np.array_equal(blas, seq)

    centers = rng.standard_normal((5, 16)) * 4
    vecs = np.vstack([c + rng.standard_normal((12, 16)) * 0.3 for c in centers])
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        ["vec_id", "embedding"],
    )
    exact = {(r["query_id"], r["neighbor_id"]) for r in
             cosine_topk_bruteforce(df, k=3).collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in
              cosine_topk_lsh(df, dim=16, k=3, n_planes=8, n_tables=6,
                              plane_fn="portable").collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"portable LSH recall {recall}"


def test_embedding_cosine_duplicates(spark):
    from graphrag_rs_spark.operators.similarity import embedding_cosine_duplicates

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
        ],
        ["vec_id", "embedding"],
    )
    pairs = {(r["id_a"], r["id_b"]) for r in
             embedding_cosine_duplicates(df, dim=4, threshold=0.99).collect()}
    assert pairs == {(0, 1)}


def test_language_id(spark):
    from graphrag_rs_spark.operators.textstats import language_id_col

    df = _docs(spark, [
        "the cat is on the mat and it is a good day for the park",
        "el gato es un animal que vive en la casa de la familia",
        "der Hund ist in dem Haus und die Katze ist auf dem Dach",
        "xqz kvw pflm zzz qqq",
    ])
    got = {r["doc_id"]: r["lang"] for r in
           df.select("doc_id", language_id_col(F.col("text")).alias("lang")).collect()}
    assert got[0] == "en"
    assert got[1] == "es"
    assert got[2] == "de"
    assert got[3] == "und"


def test_quality_and_tokens(spark):
    from graphrag_rs_spark.operators.textstats import (
        quality_features,
        token_count_col,
    )

    df = _docs(spark, ["The quick brown fox, it is the best of the foxes!", ""])
    qf = {r["doc_id"]: r for r in quality_features(df, "text").collect()}
    assert qf[0]["n_words"] == 11
    assert 0 < qf[0]["quality_score"] <= 1
    assert qf[1]["n_words"] == 0
    toks = df.select(
        "doc_id",
        token_count_col(F.col("text"), "whitespace").alias("ws"),
        token_count_col(F.col("text"), "bpe_ish").alias("bpe"),
    ).collect()
    t0 = next(r for r in toks if r["doc_id"] == 0)
    assert t0["ws"] == 11
    assert t0["bpe"] == 13  # 11 words + comma + bang


def test_fingerprint_props(spark):
    from graphrag_rs_spark.operators.textstats import fingerprint_col

    df = _docs(spark, ["a b c", "a  b   c", "c b a", "totally different words"])
    fp = {r["doc_id"]: r["f"] for r in
          df.select("doc_id", fingerprint_col(F.col("text")).alias("f")).collect()}
    assert fp[0] == fp[1]      # whitespace-insensitive
    assert fp[0] != fp[2]      # order-sensitive
    assert fp[0] != fp[3]


def test_multimodal_features_and_frames(spark):
    from graphrag_rs_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_image_features,
        sample_video_frames,
    )

    from graphrag_rs_spark.operators.multimodal import make_png

    rows = [
        ("img1", "image", "png", make_png(32, 32, seed=1), 32, 32, None),
        ("img2", "image", "png", None, None, None, None),
        ("vid1", "video", "mp4", b"\x00" * 256, None, None, 3500),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    feats = {r["media_id"]: r for r in extract_image_features(media, dim=16).collect()}
    assert set(feats) == {"img1", "img2"}
    assert len(feats["img1"]["feature"]) == 16
    assert feats["img1"]["decode_ok"] == "ok"       # real PNG header accepted
    assert feats["img2"]["decode_ok"] == "decode_error"  # null payload rejected
    # determinism: same payload → same feature
    feats2 = {r["media_id"]: r for r in extract_image_features(media, dim=16).collect()}
    assert feats["img1"]["feature"] == feats2["img1"]["feature"]

    frames = sample_video_frames(media, every_ms=1000, max_frames=16).collect()
    assert {r["media_id"] for r in frames} == {"vid1"}
    assert sorted(r["frame_ts_ms"] for r in frames) == [0, 1000, 2000, 3000]


def test_bm25_monotonic(spark):
    from graphrag_rs_spark.operators.bm25 import bm25_scores

    df = _docs(spark, [
        "spark spark spark engine",
        "spark engine",
        "nothing relevant here",
    ])
    got = {r["doc_id"]: r["bm25"] for r in
           bm25_scores(df, ["spark"], id_col="doc_id", text_col="text").collect()}
    assert set(got) == {0, 1}
    assert got[0] > got[1] > 0


def test_png_wav_header_decode_roundtrip(spark):
    from graphrag_rs_spark.operators.multimodal import (
        decode_png_header,
        decode_wav_header,
        make_png,
        make_wav,
        probe_media,
    )

    # pure-python round trips
    assert decode_png_header(make_png(17, 9, seed=3)) == (17, 9)
    assert decode_png_header(b"not a png") is None
    assert decode_wav_header(make_wav(750)) == 750
    assert decode_wav_header(b"RIFFxxxx") is None

    media = spark.createDataFrame(
        [
            ("m1", "image", make_png(12, 5)),
            ("m2", "audio", make_wav(400)),
            ("m3", "image", b"garbage"),
        ],
        "media_id string, modality string, payload binary",
    )
    got = {r["media_id"]: r for r in probe_media(media).collect()}
    assert (got["m1"]["width"], got["m1"]["height"], got["m1"]["decode_ok"]) == (12, 5, "ok")
    assert (got["m2"]["duration_ms"], got["m2"]["decode_ok"]) == (400, "ok")
    assert got["m3"]["decode_ok"] == "decode_error"


def test_simhash_hash_families_agree_on_pairs(spark):
    from graphrag_rs_spark.operators.dedup import simhash_duplicates

    base = " ".join(f"tok{k}" for k in range(200))
    near = base.replace("tok100", "changed", 1)
    far = " ".join(f"other{k}" for k in range(200, 400))
    df = _docs(spark, [base, near, far])
    for fn in ("fast", "portable"):
        pairs = {(r["id_a"], r["id_b"]) for r in
                 simhash_duplicates(df, "text", "doc_id", max_hamming=6, hash_fn=fn).collect()}
        assert (0, 1) in pairs, fn
        assert (0, 2) not in pairs, fn


def test_repetition_signals(spark):
    from graphrag_rs_spark.operators.textstats import repetition_signals

    df = _docs(
        spark,
        [
            # two identical lines + one unique: hand-checked literals
            "the cat sat on the mat the cat sat again\n"
            "the cat sat on the mat the cat sat again\nunique line",
            "hello world",
            "",
            "a a a a a a",
        ],
    )
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}

    r0 = got[0]
    # 22 words, 8 distinct -> 14 dup words -> floor(14*10000/22)
    assert (r0["n_words"], r0["dup_word_bp"]) == (22, 6363)
    # "cat sat" occurs 4x (7 chars); word-stream chars = 93
    assert (r0["top2_gram"], r0["top2_cnt"], r0["top2_char_bp"]) == ("cat sat", 4, 3010)
    assert r0["dup3_char_bp"] == 18709
    # 3 non-blank lines, 2 identical (40 chars each), 91 line chars total
    assert (r0["n_lines"], r0["dup_line_bp"], r0["dup_line_char_bp"]) == (3, 6666, 8791)

    r1 = got[1]
    # single 2-gram covers the whole word stream; no 3-gram, no dup lines
    assert (r1["top2_gram"], r1["top2_cnt"], r1["top2_char_bp"]) == ("hello world", 1, 10000)
    assert (r1["dup_word_bp"], r1["dup3_char_bp"], r1["dup_line_bp"]) == (0, 0, 0)

    r2 = got[2]
    # empty doc: everything zero, empty top gram, zero lines
    assert (r2["n_words"], r2["top2_gram"], r2["top2_cnt"], r2["n_lines"]) == (0, "", 0, 0)

    r3 = got[3]
    # overlapping "a a" grams legitimately exceed 10000 bp (count * gram
    # chars over word-stream chars — the standard Gopher-filter accounting)
    assert (r3["dup_word_bp"], r3["top2_cnt"], r3["top2_char_bp"]) == (8333, 5, 13636)


def test_pii_scrub(spark):
    from graphrag_rs_spark.operators.textstats import pii_scrub

    df = _docs(
        spark,
        [
            "mail bob@example.com and alice.smith+x@sub.domain.org today",
            "host 192.168.1.1 and 10.0.0.255 up",
            "call 5551234567 or +44 7911123456 now",
            "clean text with short 123 and 12.5 numbers",
            "mixed a@b.co 1.2.3.4 9876543210",
        ],
    )
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}

    assert (got[0]["n_email"], got[0]["text_redacted"]) == (
        2, "mail <EMAIL> and <EMAIL> today")
    assert (got[1]["n_ipv4"], got[1]["text_redacted"]) == (
        2, "host <IP> and <IP> up")
    # 7-15 digit runs redact; the +44 prefix stays (digits-only matcher)
    assert (got[2]["n_phone"], got[2]["text_redacted"]) == (
        2, "call <PHONE> or +44 <PHONE> now")
    # short digit runs and decimals survive
    assert (got[3]["n_email"], got[3]["n_ipv4"], got[3]["n_phone"]) == (0, 0, 0)
    assert got[3]["text_redacted"] == "clean text with short 123 and 12.5 numbers"
    # stages see the previous stage's redaction: tokens carry no digits,
    # so the IP inside a redacted email can't double-count
    assert (got[4]["n_email"], got[4]["n_ipv4"], got[4]["n_phone"]) == (1, 1, 1)
    assert got[4]["text_redacted"] == "mixed <EMAIL> <IP> <PHONE>"


def test_curation_decision(spark):
    from graphrag_rs_spark.operators.textstats import curation_decision

    good = ("the cat and the dog are with a fox in the yard and it is "
            "a fine day for all of them to be out in the sun again")
    df = _docs(
        spark,
        [
            good,                                  # keeps: en, long, varied
            "el la de que y a en un ser se no haber por con su",  # lang
            "a a a a a a a a a a a a a a a a a a a a a a",        # repeat
            "tiny",                                               # short
            good + " mail a@b.co or c@d.org or e@f.io today",     # pii > 2
        ],
    )
    got = {r["doc_id"]: r for r in curation_decision(df).collect()}
    assert (got[0]["keep"], got[0]["drop_reasons"]) == (1, "")
    assert got[1]["keep"] == 0 and "lang" in got[1]["drop_reasons"]
    assert got[2]["keep"] == 0 and "repeat" in got[2]["drop_reasons"]
    assert got[3]["keep"] == 0 and "short" in got[3]["drop_reasons"]
    assert got[4]["keep"] == 0 and got[4]["drop_reasons"] == "pii"
    assert got[4]["pii_total"] == 3
    # reasons come in fixed order (lang first) for multi-reason docs:
    # 'a' is a stopword in BOTH en and es, and equal-ratio ties go to the
    # lexicographically larger language — so the repeat doc also fails lang
    assert got[2]["drop_reasons"] == "lang,repeat"


def _clustered_vecs(n_clusters=4, per_cluster=30, dim=16):
    # deterministic clustered corpus: orthogonal-ish centers + small
    # per-vector perturbation (no RNG — hash-free arithmetic)
    vecs = []
    vid = 0
    for c in range(n_clusters):
        center = [10.0 if d % n_clusters == c else 0.0 for d in range(dim)]
        for i in range(per_cluster):
            v = [center[d] + 0.01 * ((vid * 31 + d * 7) % 11 - 5) for d in range(dim)]
            vecs.append((vid, v))
            vid += 1
    return vecs


def test_ivf_full_probe_equals_bruteforce(spark):
    from graphrag_rs_spark.operators.similarity import (
        cosine_topk_bruteforce, cosine_topk_ivf, train_ivf_centroids,
    )

    df = spark.createDataFrame(
        _clustered_vecs(), "vec_id long, embedding array<double>"
    )
    cents = train_ivf_centroids(df, n_centroids=4, n_iters=2)
    bf = {(r["query_id"], r["neighbor_id"], r["rank"])
          for r in cosine_topk_bruteforce(df, k=3).collect()}
    # probing every bucket covers every member: provably exact
    full = {(r["query_id"], r["neighbor_id"], r["rank"])
            for r in cosine_topk_ivf(
                df, dim=16, k=3, n_centroids=4, n_probe=4, centroids=cents
            ).collect()}
    assert full == bf


def test_ivf_recall_on_clustered_data(spark):
    from graphrag_rs_spark.operators.similarity import (
        cosine_topk_bruteforce, cosine_topk_ivf,
    )

    df = spark.createDataFrame(
        _clustered_vecs(), "vec_id long, embedding array<double>"
    )
    bf = {(r["query_id"], r["neighbor_id"])
          for r in cosine_topk_bruteforce(df, k=3).collect()}
    iv = {(r["query_id"], r["neighbor_id"])
          for r in cosine_topk_ivf(
              df, dim=16, k=3, n_centroids=4, n_probe=1, n_iters=3
          ).collect()}
    recall = len(bf & iv) / len(bf)
    # on separable clusters even a single probe recovers nearly all true
    # neighbors (they share the query's cluster by construction)
    assert recall >= 0.9, recall


def test_select_representatives(spark):
    """Highest quality wins per group, id ascending breaks ties,
    singletons are their own representative."""
    from graphrag_rs_spark.operators.dedup import select_representatives

    members = spark.createDataFrame(
        [
            ("d1", "g1", 10),   # beaten by d2
            ("d2", "g1", 99),   # winner
            ("d3", "g1", 99),   # same quality, higher id → loses tie
            ("d9", "g9", 1),    # singleton
            ("dn", "g1", None), # null quality sorts last
        ],
        ["id", "dup_group_id", "quality"],
    )
    out = {r["id"]: r["is_representative"] for r in
           select_representatives(members).collect()}
    assert out == {"d1": False, "d2": True, "d3": False,
                   "d9": True, "dn": False}


def test_select_representatives_null_groups_are_singletons(spark):
    """Full-corpus input where non-dup rows carry a NULL group id: every
    NULL-group row must be its own representative, not funneled into one
    window partition where only one survives (round-4 ADVICE)."""
    from graphrag_rs_spark.operators.dedup import select_representatives

    members = spark.createDataFrame(
        [
            ("u1", None, 5),
            ("u2", None, 3),
            ("u3", None, None),
            ("d1", "g1", 1),
            ("d2", "g1", 2),
        ],
        "id string, dup_group_id string, quality long",
    )
    rows = select_representatives(members).collect()
    out = {r["id"]: r["is_representative"] for r in rows}
    assert out == {"u1": True, "u2": True, "u3": True,
                   "d1": False, "d2": True}
    # group ids pass through untouched (NULL stays NULL)
    assert {r["id"]: r["dup_group_id"] for r in rows}["u1"] is None


def test_repo_curation_rollup(spark):
    """A repo below the keep floor is dropped wholesale; healthy repos
    and the min_files floor behave per the documented gates."""
    from graphrag_rs_spark.operators.code_quality import repo_curation_rollup

    rows = [
        # bad repo: 2 of 3 files vendored → keep_frac 1/3 < 0.5
        ("bad", "vendor/a.py", "x = 1\n"),
        ("bad", "vendor/b.py", "x = 2\n"),
        ("bad", "src/c.py", "x = 3\n"),
        # good repo: all clean
        ("good", "src/a.py", "x = 1\n"),
        ("good", "src/b.py", "x = 2\n"),
        # tiny repo: clean but below min_files
        ("tiny", "src/solo.py", "x = 1\n"),
    ]
    files = spark.createDataFrame(rows, ["repo", "path", "content"])
    out = {r["repo"]: r for r in repo_curation_rollup(
        files, min_keep_frac=0.5, min_files=2
    ).collect()}
    assert not out["bad"]["repo_keep"] and out["bad"]["n_vendored"] == 2
    assert out["good"]["repo_keep"] and out["good"]["keep_frac"] == 1.0
    assert not out["tiny"]["repo_keep"]  # min_files floor


def test_contrastive_triplets(spark):
    """Every (anchor, positive) input pair yields at most one triplet;
    the negative is never a pair member nor a positive partner of the
    anchor; deterministic across calls."""
    from graphrag_rs_spark.operators.dedup import contrastive_triplets

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (5, 6)], ["id_a", "id_b"]
    )
    ids = spark.createDataFrame([(i,) for i in range(1, 20)], ["id"])
    out = contrastive_triplets(pairs, ids).collect()
    assert 1 <= len(out) <= 3
    banned = {1: {1, 2, 3}, 5: {5, 6}}
    for r in out:
        assert r["negative"] not in banned.get(r["anchor"], set()) | {
            r["positive"]
        }
    again = contrastive_triplets(pairs, ids).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_quantize_embeddings_bounds_and_extremes(spark):
    from graphrag_rs_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 1.0]), (2, [0.0, 0.0]), (3, [-2.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    # max-magnitude element maps to exactly +/-127
    assert rows[1]["qvec"][3] == 127 and rows[1]["qvec"][1] == -127
    assert rows[3]["qvec"][0] == -127
    # zero vector -> all zeros, scale 0
    assert rows[2]["qvec"] == [0, 0] and rows[2]["qscale"] == 0.0
    # dequantization error bounded by one scale step, values in range
    for r in rows.values():
        s = r["qscale"]
        for v, q in zip(r["embedding"], r["qvec"]):
            assert -127 <= q <= 127
            assert abs(v - q * s) <= s + 1e-12


def test_quantized_cosine_preserves_ranking(spark):
    import numpy as np

    from graphrag_rs_spark.operators.similarity import quantize_embeddings

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 16).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    deq = np.array(
        [np.array(rows[i]["qvec"]) * rows[i]["qscale"] for i in range(40)]
    )

    def topk(mat, q, k=5):
        sims = mat @ mat[q] / (
            np.linalg.norm(mat, axis=1) * np.linalg.norm(mat[q]) + 1e-12
        )
        return set(np.argsort(-sims)[1 : k + 1].tolist())

    overlap = [
        len(topk(vecs.astype("float64"), q) & topk(deq, q)) / 5.0
        for q in range(10)
    ]
    assert sum(overlap) / len(overlap) >= 0.8  # int8 keeps rankings


def test_quantized_topk_recall_vs_bruteforce(spark):
    import numpy as np

    from graphrag_rs_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_quantized,
    )

    rng = np.random.RandomState(11)
    vecs = rng.randn(60, 16).astype("float64")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    q = df.where(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(df, q, k=5).collect()
    }
    quant = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_quantized(df, q, k=5, n_candidates=20).collect()
    }
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.9, recall  # int8 candidates barely lose anything


def test_ngram_containment_pairs(spark):
    from graphrag_rs_spark.operators.dedup import ngram_containment_pairs

    small = "the quick brown fox jumps over the lazy dog"
    big = small + " and then it kept running far away into the woods tonight"
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "completely unrelated text about spark")],
        "doc_id long, text string",
    )
    rows = {
        (r["id_a"], r["id_b"]): (
            r["containment_ab"], r["containment_ba"], r["jaccard"]
        )
        for r in ngram_containment_pairs(docs, threshold=0.9).collect()
    }
    assert set(rows) == {(1, 2)}
    c_ab, c_ba, jac = rows[(1, 2)]
    assert c_ab == 1.0      # the small doc is fully contained
    assert c_ba < 1.0       # the container is not contained in the small
    assert jac < 0.9        # jaccard alone would have missed this pair


def test_shingle_overlap_hot_leg_matches_array_verify(spark):
    """_shingle_overlap counts hot shingles through the per-doc side
    array (they are pruned from the blocking join by the skew guard);
    values must equal the old full-array intersect/union verify for
    pairs that share at least one NON-hot shingle."""
    from graphrag_rs_spark.operators.dedup import (
        _shingles,
        ngram_jaccard_pairs,
    )

    # shingle "h1 h2 h3" appears in all 4 docs -> hot at max_block_size=2;
    # the run "a{i+1} b{i+1} c{i+1}" is a non-hot shingle shared by docs
    # i and i+1 only, so consecutive docs are candidates
    texts = [
        f"h1 h2 h3 a{i} b{i} c{i} a{i + 1} b{i + 1} c{i + 1}"
        for i in range(4)
    ]
    df = _docs(spark, texts)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "text", "doc_id", threshold=0.0, max_block_size=2
        ).collect()
    }
    assert got, "fixture must produce pairs through non-hot shingles"

    # brute-force the OLD algebra: candidate pairs share >=1 non-hot
    # shingle; values from full distinct-set intersection/union
    sh = {
        r["id"]: set(r["sh"])
        for r in df.select(
            F.col("doc_id").alias("id"), _shingles(F.col("text"), 3).alias("sh")
        ).collect()
    }
    from collections import Counter

    freq = Counter(g for s in sh.values() for g in s)
    hot = {g for g, n in freq.items() if n > 2}
    expect = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = sh[a] & sh[b]
            if not (inter - hot):
                continue  # blocked only by hot shingles -> no candidate
            expect[(a, b)] = len(inter) / len(sh[a] | sh[b])
    assert got == expect  # exact float equality: same integer ratios
