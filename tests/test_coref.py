"""resolve_anaphora (operators/coref.py) — hand fixtures."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.operators.coref import resolve_anaphora


def _chunks(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, content string")


def _gaz(spark, names):
    return spark.createDataFrame(
        [(n, "PERSON") for n in names], "name string, entity_type string"
    )


def test_nearest_preceding_wins(spark):
    c = _chunks(
        spark, [("d1", "Alice met Bob, then IT happened near it again.")]
    )
    out = resolve_anaphora(
        c, _gaz(spark, ["alice", "bob"]), anaphors=["it"]
    ).collect()
    # tokens: alice met bob then it happened near it again
    #          1     2   3   4    5  6        7    8  9
    assert [(r["anaphor_pos"], r["antecedent"], r["antecedent_pos"], r["distance"])
            for r in sorted(out, key=lambda r: r["anaphor_pos"])] == [
        (5, "bob", 3, 2),
        (8, "bob", 3, 5),
    ]


def test_unresolved_anaphor_dropped_and_max_distance(spark):
    c = _chunks(spark, [("d1", "it came before alice and it after")])
    out = resolve_anaphora(c, _gaz(spark, ["alice"]), anaphors=["it"]).collect()
    # first 'it' (pos 1) has no preceding mention -> dropped
    assert [(r["anaphor_pos"], r["antecedent"]) for r in out] == [(6, "alice")]
    near = resolve_anaphora(
        c, _gaz(spark, ["alice"]), anaphors=["it"], max_distance=1
    ).collect()
    assert near == []  # distance 2 pruned


def test_all_occurrences_are_candidates(spark):
    # second occurrence of the SAME name must win over the first
    c = _chunks(spark, [("d1", "alice x y alice z it")])
    out = resolve_anaphora(c, _gaz(spark, ["alice"]), anaphors=["it"]).collect()
    assert [(r["antecedent_pos"], r["distance"]) for r in out] == [(4, 2)]


def test_per_document_isolation(spark):
    c = _chunks(spark, [("d1", "alice spoke"), ("d2", "it replied")])
    out = resolve_anaphora(c, _gaz(spark, ["alice"]), anaphors=["it"]).collect()
    assert out == []  # d2's anaphor can't see d1's mention


def test_anaphor_gazetteer_clash_raises(spark):
    c = _chunks(spark, [("d1", "x")])
    with pytest.raises(ValueError, match="cannot be both"):
        resolve_anaphora(c, _gaz(spark, ["it"]), anaphors=["it"])
    with pytest.raises(ValueError, match="at least one"):
        resolve_anaphora(c, _gaz(spark, ["alice"]), anaphors=[])


def test_case_and_punctuation_normalized(spark):
    c = _chunks(spark, [("d1", "ALICE!! ...IT")])
    out = resolve_anaphora(c, _gaz(spark, ["Alice"]), anaphors=["It"]).collect()
    assert [(r["anaphor"], r["antecedent"], r["distance"]) for r in out] == [
        ("it", "alice", 1)
    ]
