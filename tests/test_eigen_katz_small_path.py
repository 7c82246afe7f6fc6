"""eigenvector_centrality / katz_centrality guarded driver small paths:
bit-identical (eigenvector, integer math) or 6-dp-identical (katz,
float) to the distributed rounds (collect_threshold=0 forces those)."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.operators.analytics import katz_centrality
from graphrag_rs_spark.operators.eigenvector import (
    UNIT,
    eigenvector_centrality,
)

CASES = [
    [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
    [("a", "b")],
    [("h", "s1"), ("h", "s2"), ("h", "s3"), ("a", "a"), ("h", "s1")],
]


@pytest.mark.parametrize("pairs", CASES)
def test_eigenvector_paths_bit_identical(pairs, spark):
    e = spark.createDataFrame(pairs, "src string, dst string")
    small = sorted(tuple(r) for r in eigenvector_centrality(e).collect())
    dist = sorted(
        tuple(r)
        for r in eigenvector_centrality(e, collect_threshold=0).collect()
    )
    assert small == dist
    if small:
        assert max(s for _, s in small) == UNIT


@pytest.mark.parametrize("pairs", CASES)
def test_katz_paths_equal_at_6dp(pairs, spark):
    e = spark.createDataFrame(pairs, "src string, dst string")
    small = {
        r["id"]: round(r["katz"], 6) for r in katz_centrality(e).collect()
    }
    dist = {
        r["id"]: round(r["katz"], 6)
        for r in katz_centrality(e, collect_threshold=0).collect()
    }
    assert small == dist


CASES_LPA = [
    [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
    [("x", "y")],
    [("a", "a"), ("a", "b")],          # self-loop kept by LPA semantics
    [("h", "s1"), ("h", "s2"), ("h", "s3"), ("s1", "s2")],
]


@pytest.mark.parametrize("pairs", CASES_LPA)
def test_lpa_paths_identical(pairs, spark):
    from graphrag_rs_spark.operators.lpa import label_propagation

    e = spark.createDataFrame(pairs, "src string, dst string")
    small = sorted(tuple(r) for r in label_propagation(e).collect())
    dist = sorted(
        tuple(r)
        for r in label_propagation(e, collect_threshold=0).collect()
    )
    assert small == dist


def test_lpa_non_ascii_falls_back_and_matches(spark):
    from graphrag_rs_spark.operators.lpa import label_propagation

    e = spark.createDataFrame(
        [("é", "b"), ("b", "ç")], "src string, dst string"
    )
    small = sorted(tuple(r) for r in label_propagation(e).collect())
    dist = sorted(
        tuple(r)
        for r in label_propagation(e, collect_threshold=0).collect()
    )
    assert small == dist
