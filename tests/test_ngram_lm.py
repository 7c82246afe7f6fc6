"""N-gram LM perplexity filter (operators/ngram_lm.py) vs pure Python."""

from __future__ import annotations

import math
import re

import pytest

from graphrag_rs_spark.operators.ngram_lm import perplexity_scores, train_ngram_lm


def _tok(s):
    return [t for t in re.split(r"[^a-z0-9']+", s.lower().strip()) if t]


def _ref_model(texts, n=2):
    grams, hists, vocab = {}, {}, set()
    for s in texts:
        ws = _tok(s)
        vocab.update(ws)
        for i in range(len(ws) - n + 1):
            g = " ".join(ws[i : i + n])
            h = " ".join(ws[i : i + n - 1])
            grams[(g, h)] = grams.get((g, h), 0) + 1
            hists[h] = hists.get(h, 0) + 1
    return grams, hists, len(vocab)


def _ref_logppl(text, model, n=2, k=1.0):
    grams, hists, v = model
    ws = _tok(text)
    nlls = []
    for i in range(len(ws) - n + 1):
        g = " ".join(ws[i : i + n])
        h = " ".join(ws[i : i + n - 1])
        p = (grams.get((g, h), 0) + k) / (hists.get(h, 0) + k * v)
        nlls.append(-math.log2(p))
    return (len(nlls), sum(nlls) / len(nlls)) if nlls else (0, None)


CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "the cat and the dog play",
]


def _df(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_training_counts(spark):
    model = train_ngram_lm(_df(spark, CORPUS), n=2)
    grams = {
        (r["gram"], r["hist"]): r["c_gram"] for r in model["grams"].collect()
    }
    ref_grams, ref_hists, ref_v = _ref_model(CORPUS)
    assert grams == ref_grams
    hists = {r["hist"]: r["c_hist"] for r in model["hists"].collect()}
    assert hists == ref_hists
    assert model["vocab_size"].collect()[0]["v"] == ref_v


@pytest.mark.parametrize("n", [1, 2, 3])
def test_scores_match_reference(spark, n):
    train = _df(spark, CORPUS)
    model = train_ngram_lm(train, n=n)
    ref = _ref_model(CORPUS, n=n)
    score_texts = [
        "the cat sat on the log",        # in-distribution
        "quantum flux capacitors hum",   # out-of-distribution
        "the",                           # too short for n≥2
        "",                              # empty
    ]
    got = {
        r["doc_id"]: (r["n_grams"], r["logppl"])
        for r in perplexity_scores(
            _df(spark, score_texts, start=100), model, n=n
        ).collect()
    }
    for i, t in enumerate(score_texts):
        exp_n, exp_ppl = _ref_logppl(t, ref, n=n)
        assert got[100 + i][0] == exp_n, t
        if exp_ppl is None:
            assert got[100 + i][1] is None, t
        else:
            assert got[100 + i][1] == pytest.approx(exp_ppl, abs=1e-6), t


def test_in_distribution_scores_lower(spark):
    model = train_ngram_lm(_df(spark, CORPUS), n=2)
    scores = {
        r["doc_id"]: r["logppl"]
        for r in perplexity_scores(
            _df(spark, ["the cat sat on the mat", "zebra xylophone quartz vortex"],
                start=0),
            model,
        ).collect()
    }
    assert scores[0] < scores[1]


def test_invalid_n_raises(spark):
    with pytest.raises(ValueError):
        train_ngram_lm(_df(spark, CORPUS), n=0)
