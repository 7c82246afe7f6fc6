"""T5 span corruption (operators/corruption.py) — structural invariants.

The oracle sweep (`text_span_corruption`) pins the exact arithmetic vs
DuckDB; these tests pin the *contract*: reconstructability (input +
target = original), sentinel numbering, determinism, and edge cases.
"""

from __future__ import annotations

import re

from graphrag_rs_spark.operators.corruption import span_corrupt

SENT = re.compile(r"<extra_id_(\d+)>")


def _reconstruct(input_text: str, target_text: str) -> str:
    """Splice the target's spans back into the input at their sentinels."""
    spans: dict[int, list[str]] = {}
    cur = None
    for tok in target_text.split():
        m = SENT.fullmatch(tok)
        if m:
            cur = int(m.group(1))
            spans[cur] = []
        else:
            spans[cur].append(tok)
    out: list[str] = []
    for tok in input_text.split():
        m = SENT.fullmatch(tok)
        if m:
            out.extend(spans.get(int(m.group(1)), []))
        else:
            out.append(tok)
    return " ".join(out)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_reconstruction_and_counts(spark):
    docs = [
        (f"d{i}", " ".join(f"w{i}_{j}" for j in range(n)))
        for i, n in enumerate([0, 1, 3, 7, 8, 9, 16, 40, 100, 257])
    ]
    out = {
        r["doc_id"]: r
        for r in span_corrupt(_frame(spark, docs), block=8, seed=42).collect()
    }
    assert set(out) == {d for d, _ in docs}
    any_masked = False
    for doc_id, text in docs:
        r = out[doc_id]
        toks = text.split()
        assert r["n_tokens"] == len(toks)
        # input + target reconstructs the original token stream exactly
        assert _reconstruct(r["input_text"], r["target_text"]) == text.strip()
        # n_masked = tokens dropped from the input
        kept = [t for t in r["input_text"].split() if not SENT.fullmatch(t)]
        assert r["n_masked"] == len(toks) - len(kept)
        # sentinels in input are 0..K-1 in order; target ends with <extra_id_K>
        in_sents = [int(m.group(1)) for m in SENT.finditer(r["input_text"])]
        assert in_sents == list(range(len(in_sents)))
        if in_sents:
            any_masked = True
            tgt = r["target_text"].split()
            assert tgt[-1] == f"<extra_id_{len(in_sents)}>"
        else:
            assert r["target_text"] == ""
            assert r["input_text"] == text.strip()
    assert any_masked, "fixture too small to exercise masking"


def test_deterministic_and_seed_sensitive(spark):
    docs = [(f"d{i}", " ".join(f"t{j}" for j in range(50))) for i in range(20)]
    a = sorted(map(tuple, span_corrupt(_frame(spark, docs), seed=1).collect()))
    b = sorted(map(tuple, span_corrupt(_frame(spark, docs), seed=1).collect()))
    c = sorted(map(tuple, span_corrupt(_frame(spark, docs), seed=2).collect()))
    assert a == b
    assert a != c


def test_block_floor_raises(spark):
    import pytest

    with pytest.raises(ValueError):
        span_corrupt(_frame(spark, [("d", "a b c")]), block=3)
