"""Distributed BPE vs a pure-Python Sennrich-style reference."""

import pytest

from graphrag_rs_spark.operators.bpe import (
    END,
    bpe_encode,
    bpe_train,
    pair_counts,
    word_counts,
    _initial_symbols,
)

DOCS = [
    (0, "low low low low low lower lower newest newest newest"),
    (1, "newest newest newest widest widest widest new new"),
    (2, "lowest, lowest; NEW new!"),
]


def _ref_word_counts():
    counts = {}
    for _i, text in DOCS:
        for raw in text.lower().replace(",", " ").replace(";", " ").replace(
            "!", " "
        ).split():
            counts[raw] = counts.get(raw, 0) + 1
    return counts


def _ref_train(n_merges, min_pair_count=2):
    vocab = {
        tuple(list(w) + [END]): c for w, c in _ref_word_counts().items()
    }
    merges = []
    for _ in range(n_merges):
        pc = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        (left, right), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((left, right, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_word_counts(spark, docs):
    got = {r["word"]: r["wc"] for r in word_counts(docs).collect()}
    assert got == _ref_word_counts()


def test_pair_counts_first_iteration(spark, docs):
    vocab = _initial_symbols(word_counts(docs))
    got = {
        (r["left_sym"], r["right_sym"]): r["pair_count"]
        for r in pair_counts(vocab).collect()
    }
    ref = {}
    for w, c in _ref_word_counts().items():
        syms = list(w) + [END]
        for a, b in zip(syms, syms[1:]):
            ref[(a, b)] = ref.get((a, b), 0) + c
    assert got == ref


@pytest.mark.parametrize("n_merges", [1, 5, 15])
def test_train_matches_reference(spark, docs, n_merges):
    assert bpe_train(docs, n_merges) == _ref_train(n_merges)


def test_train_runs_dry(spark, docs):
    # enough iterations to exhaust every pair with count >= 2
    merges = bpe_train(docs, 500)
    assert merges == _ref_train(500)
    assert 0 < len(merges) < 500
    assert all(c >= 2 for _l, _r, c in merges)


def test_encode_applies_merge_ranks(spark, docs):
    merges = bpe_train(docs, 10)
    enc = {
        r["word"]: r["pieces"]
        for r in bpe_encode(docs, merges).collect()
    }
    # every word's pieces re-concatenate to word + END
    for w, pieces in enc.items():
        assert "".join(pieces) == w + END
    # the most frequent words should have fused into few pieces
    assert len(enc["low"]) <= 3
    assert len(enc["newest"]) <= 4
    # rank priority: replay one word by hand with the classic algorithm
    ranks = {(l, r): i for i, (l, r, _c) in enumerate(merges)}
    syms = list("lowest") + [END]
    while True:
        cands = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(syms, syms[1:]))
            if (a, b) in ranks
        ]
        if not cands:
            break
        _rank, i = min(cands)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    assert enc["lowest"] == syms
