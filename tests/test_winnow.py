"""Winnowing fingerprints + clone detection (operators/winnow.py).

Ground truth: a pure-Python transcription of the MOSS selection rule
(Schleimer et al. 2003) over the same sha256-prefix hash family.
"""

from __future__ import annotations

import hashlib
import re

import pytest

from graphrag_rs_spark.operators.winnow import clone_pairs, winnow_fingerprints


def _ref_fps(s: str, k: int = 12, w: int = 8) -> set[int]:
    s = re.sub(r"\s+", "", s).lower()
    if len(s) < k:
        return set()
    hs = [
        int(hashlib.sha256(s[i : i + k].encode()).hexdigest()[:15], 16)
        for i in range(len(s) - k + 1)
    ]
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}


BODY = "def add(a, b):\n    return a + b\n\nprint(add(1, 2))\n"


def _files(spark, rows):
    return spark.createDataFrame(rows, ["path", "content"])


def test_fingerprints_match_pure_python_reference(spark):
    texts = {
        "a.py": BODY,
        "b.rs": "pub fn mul(x: u64, y: u64) -> u64 { x * y }\n",
        "c.md": "short but still longer than twelve characters after squeeze",
    }
    got: dict[str, set[int]] = {}
    for r in winnow_fingerprints(_files(spark, list(texts.items()))).collect():
        got.setdefault(r["path"], set()).add(r["fp"])
    for path, text in texts.items():
        assert got[path] == _ref_fps(text), path


def test_edge_cases_short_empty_null(spark):
    rows = winnow_fingerprints(
        _files(
            spark,
            [
                ("tiny", "x=1"),          # < k after squeeze → no rows
                ("empty", ""),
                ("null", None),
                ("exact_k", "abcdefghijkl"),  # exactly k chars → 1 gram → 1 fp
            ],
        )
    ).collect()
    by_path = {}
    for r in rows:
        by_path.setdefault(r["path"], []).append(r["fp"])
    assert set(by_path) == {"exact_k"}
    assert by_path["exact_k"] == [
        int(hashlib.sha256(b"abcdefghijkl").hexdigest()[:15], 16)
    ]


def test_whitespace_and_case_invariance(spark):
    loose = "def  Add (a, b):\n\treturn   A + B\n"
    tight = "defadd(a,b):returna+b"
    got = {}
    for r in winnow_fingerprints(
        _files(spark, [("loose", loose), ("tight", tight)])
    ).collect():
        got.setdefault(r["path"], set()).add(r["fp"])
    assert got["loose"] == got["tight"]


def test_guarantee_shared_block_detected(spark):
    # MOSS guarantee: a shared substring of ≥ k+w-1 normalized chars
    # yields at least one shared fingerprint
    block = "acc=sum(v*i for i in range(10))"  # 29 chars squeezed ≥ 19
    pairs = clone_pairs(
        _files(
            spark,
            [
                ("x.py", "prefix_completely_unrelated_left\n" + block),
                ("y.py", block + "\nsuffix_totally_other_right_side"),
                ("z.py", "no overlap with anything else here at all"),
            ],
        ),
        min_similarity=0.01,
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert ("x.py", "y.py") in got
    assert not any("z.py" in p for p in got)


def test_reformatted_copy_scores_full_containment(spark):
    pairs = clone_pairs(
        _files(
            spark,
            [
                ("orig.py", BODY),
                ("copy.py", "# reformatted copy\ndef add(a,b): return a+b\nprint(add(1,2))\n"),
            ],
        ),
        min_similarity=0.5,
    ).collect()
    assert len(pairs) == 1
    assert pairs[0]["sim"] == 1.0  # orig ⊆ copy → containment 1.0


def test_hot_fingerprint_guard_drops_boilerplate(spark):
    # the same license header in EVERY file must not produce O(B²) pairs
    header = "licensed under the apache license version 2.0 see notice file"
    rows = [(f"f{i}.py", header + f"\nunique_tail_{i}_{i * 7}") for i in range(12)]
    pairs = clone_pairs(
        _files(spark, rows), min_similarity=0.01, max_fp_bucket=5
    ).collect()
    # header fps live in 12 > 5 files → guarded away; tails are unique
    assert pairs == []


@pytest.mark.parametrize("k,w", [(5, 4), (12, 8)])
def test_parametrized_k_window(spark, k, w):
    text = "the quick brown fox jumps over the lazy dog repeatedly"
    got = {
        r["fp"]
        for r in winnow_fingerprints(
            _files(spark, [("t", text)]), k=k, window=w
        ).collect()
    }
    assert got == _ref_fps(text, k=k, w=w)


@pytest.mark.parametrize("k,w", [(5, 4), (12, 8)])
def test_strategies_bit_identical(spark, k, w):
    # the codegen explode plan and the map-only array plan are two
    # physical strategies for the SAME sketch — (id, fp) sets must match
    # exactly, including the short-string edges (< k chars: no rows;
    # < w grams: single global min)
    rows = [
        ("a", "the quick brown fox jumps over the lazy dog repeatedly"),
        ("b", "def add(a, b):\n    return a + b\n" * 3),
        ("tiny", "xy"),                      # shorter than k -> no rows
        ("short", "abcdefff"),               # few grams -> one window
        ("empty", ""),
        ("null", None),
    ]
    df = _files(spark, rows)
    got_explode = {
        (r["path"], r["fp"])
        for r in winnow_fingerprints(df, k=k, window=w,
                                     strategy="explode").collect()
    }
    got_array = {
        (r["path"], r["fp"])
        for r in winnow_fingerprints(df, k=k, window=w,
                                     strategy="array").collect()
    }
    assert got_explode == got_array
    assert any(p == "a" for p, _ in got_explode)
    assert not any(p in ("tiny", "empty", "null") for p, _ in got_explode)
