"""Corpus-mixture curation ops: boilerplate detection + stratified
sampling (operators/mixture.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from graphrag_rs_spark.operators.mixture import (
    SAMPLE_MOD,
    boilerplate_scores,
    mixture_sample,
    ngrams_col,
    uniform_ppm_col,
)


def _py_u(key: str, seed: str) -> int:
    h = hashlib.sha256(f"{key}:{seed}".encode()).hexdigest()
    return int(h[:15], 16) % SAMPLE_MOD


def test_ngrams_col_generic_n(spark):
    df = spark.createDataFrame(
        [("a b c d e",), ("a b",), ("",)], ["text"]
    ).select(ngrams_col(F.split("text", " "), 3).alias("g"))
    rows = [r["g"] for r in df.collect()]
    assert rows[0] == ["a b c", "b c d", "c d e"]
    assert rows[1] == []
    # empty text splits to [''] (1 token) -> fewer than n -> empty
    assert rows[2] == []


def test_ngrams_col_null_text_yields_no_grams(spark):
    # ANSI size(NULL) is NULL: an unguarded `size < n` falls through and
    # manufactures a NULL gram (caught by a live probe) — must be empty
    from graphrag_rs_spark.operators.textstats import _tokens

    df = spark.createDataFrame([(1, None), (2, "")], ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", ngrams_col(_tokens(F.col("text")), 2).alias("g")
        ).collect()
    }
    assert out[1]["g"] == [] and out[2]["g"] == []


def test_boilerplate_null_text_row_scores_zero(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, "a b c"), (3, "a b c")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in boilerplate_scores(docs, n=2, min_docs=2).collect()}
    assert out[1]["n_grams"] == 0 and out[1]["boilerplate_bp"] == 0
    assert out[2]["n_common"] == 2


def test_boilerplate_handbuilt_corpus(spark):
    # "common tri gram" appears in docs 1,2,3 (>=3) — boilerplate;
    # every other gram is unique to its doc
    docs = spark.createDataFrame(
        [
            (1, "common tri gram alpha beta"),
            (2, "common tri gram gamma delta"),
            (3, "prefix common tri gram"),
            (4, "totally unrelated text here"),
            (5, "xy"),  # fewer than 3 tokens -> zero grams
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in boilerplate_scores(docs, n=3, min_docs=3).collect()
    }
    # doc1 grams: [common tri gram, tri gram alpha, gram alpha beta]
    assert out[1]["n_grams"] == 3 and out[1]["n_common"] == 1
    assert out[1]["boilerplate_bp"] == 3333
    assert out[3]["n_grams"] == 2 and out[3]["n_common"] == 1
    assert out[3]["boilerplate_bp"] == 5000
    assert out[4]["n_common"] == 0 and out[4]["boilerplate_bp"] == 0
    assert out[5]["n_grams"] == 0 and out[5]["boilerplate_bp"] == 0


def test_boilerplate_counts_distinct_docs_not_occurrences(spark):
    # the same gram repeated many times INSIDE one doc must count that
    # doc once toward document frequency
    docs = spark.createDataFrame(
        [
            (1, "x y z x y z x y z x y z"),
            (2, "unrelated words entirely different"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in boilerplate_scores(docs, n=3, min_docs=2).collect()}
    assert out[1]["n_common"] == 0  # df("x y z") == 1, not 4


def test_uniform_draw_matches_reference_hash(spark):
    df = spark.range(0, 50).select(
        "id", uniform_ppm_col(F.col("id"), "mix-v1").alias("u")
    )
    for r in df.collect():
        assert r["u"] == _py_u(str(r["id"]), "mix-v1")


def test_mixture_sample_deterministic_across_partitioning(spark):
    rows = [(i, ["en", "de", "zh"][i % 3], f"src{i % 4}") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "source"])
    kwargs = dict(rates_ppm={"en": 700_000, "de": 400_000}, default_ppm=150_000,
                  domain_cap=10, seed="s1")
    a = sorted(map(tuple, mixture_sample(df.repartition(1), **kwargs).collect()))
    b = sorted(map(tuple, mixture_sample(df.repartition(17), **kwargs).collect()))
    assert a == b and len(a) > 0


def test_mixture_sample_rate_and_cap_semantics(spark):
    rows = [(i, "en" if i % 2 else "zh", "only-domain") for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "source"])
    out = mixture_sample(
        df, rates_ppm={"en": 1_000_000}, default_ppm=0, domain_cap=7, seed="s2"
    ).collect()
    # zh rate 0 -> none kept; en rate 1.0 -> all pass the gate; cap trims to 7
    assert all(r["stratum"] == "en" for r in out)
    assert len(out) == 7
    assert sorted(r["domain_rank"] for r in out) == list(range(1, 8))
    # the 7 kept are exactly the 7 lowest-u en docs
    en_u = sorted(
        (_py_u(str(i), "s2"), i) for i in range(400) if i % 2
    )[:7]
    assert sorted(r["doc_id"] for r in out) == sorted(i for _, i in en_u)


def test_mixture_rate_gate_expected_fraction(spark):
    # u is (empirically) uniform: a 50% rate keeps ~half, binomial bound
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang"),
        (F.col("id") % 20).cast("string").alias("source"),
    )
    out = mixture_sample(df, rates_ppm={"en": 500_000}, seed="s3").count()
    assert 850 <= out <= 1150


def test_span_dedup_first_occurrence_wins(spark):
    from graphrag_rs_spark.operators.mixture import span_dedup

    footer = "this footer is long enough to dedup"
    docs = spark.createDataFrame(
        [
            (1, f"unique alpha body line one\n{footer}"),
            (2, f"{footer}\nunique beta body line two"),
            (3, f"unique gamma body line three\n{footer}\ntail line body four"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in span_dedup(docs, min_words=4).collect()}
    # doc 1 (lowest doc_id) keeps the footer; docs 2 and 3 lose it
    assert out[1]["text"] == f"unique alpha body line one\n{footer}"
    assert out[1]["n_removed"] == 0
    assert out[2]["text"] == "unique beta body line two"
    assert out[2]["n_removed"] == 1 and out[2]["n_lines"] == 2
    assert out[3]["text"] == "unique gamma body line three\ntail line body four"
    assert out[3]["n_removed"] == 1 and out[3]["n_lines"] == 3


def test_span_dedup_position_breaks_ties_within_doc(spark):
    from graphrag_rs_spark.operators.mixture import span_dedup

    dup = "repeated span inside one document"
    docs = spark.createDataFrame([(7, f"{dup}\nmiddle line body words\n{dup}")],
                                 ["doc_id", "text"])
    (row,) = span_dedup(docs, min_words=4).collect()
    # first occurrence (pos 0) survives, pos 2 removed
    assert row["text"] == f"{dup}\nmiddle line body words"
    assert row["n_removed"] == 1


def test_span_dedup_short_lines_never_dedup(spark):
    from graphrag_rs_spark.operators.mixture import span_dedup

    docs = spark.createDataFrame(
        [(1, "short\n\nshort"), (2, "short\nx y")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in span_dedup(docs, min_words=4).collect()}
    # "short" and "" are below min_words: every copy survives everywhere
    assert out[1]["text"] == "short\n\nshort" and out[1]["n_removed"] == 0
    assert out[2]["text"] == "short\nx y" and out[2]["n_removed"] == 0


def test_span_dedup_null_and_empty_text(spark):
    from graphrag_rs_spark.operators.mixture import span_dedup

    docs = spark.createDataFrame([(1, None), (2, "")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in span_dedup(docs).collect()}
    assert out[1]["text"] == "" and out[1]["n_lines"] == 1
    assert out[2]["text"] == "" and out[2]["n_removed"] == 0


def test_span_dedup_deterministic_across_partitioning(spark):
    from graphrag_rs_spark.operators.mixture import span_dedup

    shared = "a shared footer line across many docs"
    rows = [(i, f"doc {i} unique body line\n{shared}") for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(map(tuple, span_dedup(df.repartition(1)).collect()))
    b = sorted(map(tuple, span_dedup(df.repartition(13)).collect()))
    assert a == b
    kept_footer = [r for r in a if shared in r[1]]
    assert len(kept_footer) == 1 and kept_footer[0][0] == 0


def test_hash_split_deterministic_and_stable_under_growth(spark):
    from graphrag_rs_spark.operators.mixture import hash_split

    small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"]: r["split"] for r in hash_split(small, "doc_id").collect()}
    s2 = {r["doc_id"]: r["split"] for r in hash_split(big, "doc_id").collect()}
    # membership is a pure function of the key: growing the corpus never
    # migrates an existing document between splits
    assert all(s2[k] == v for k, v in s1.items())
    frac = sum(1 for v in s2.values() if v == "train") / len(s2)
    assert 0.85 < frac < 0.95
    assert set(s2.values()) == {"train", "val", "test"}


def test_hash_split_fraction_validation(spark):
    import pytest as _pytest

    from graphrag_rs_spark.operators.mixture import hash_split

    df = spark.range(3).withColumnRenamed("id", "doc_id")
    with _pytest.raises(ValueError):
        hash_split(df, "doc_id", {"train": 0.5, "val": 0.1})
