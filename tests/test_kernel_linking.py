"""Engine-independent literal expectations from the reference's own tests
(string_similarity_linker.rs:468-614) — FIXTURES.md §5."""

from graphrag_rs_spark.kernel.linking import (
    compute_similarity,
    jaccard_similarity,
    jaro_winkler_similarity,
    levenshtein_distance,
    levenshtein_similarity,
    normalize_string,
    soundex,
)


def test_levenshtein_reference_values():
    assert levenshtein_distance("kitten", "sitting") == 3
    assert levenshtein_distance("saturday", "sunday") == 3
    assert levenshtein_distance("", "abc") == 3
    assert levenshtein_distance("abc", "") == 3
    assert levenshtein_distance("same", "same") == 0


def test_soundex_reference_values():
    assert soundex("Robert") == "R163"
    assert soundex("Rupert") == "R163"
    assert soundex("Smith") == "S530"
    assert soundex("Smyth") == "S530"


def test_normalize_reference_values():
    assert normalize_string("John  Smith!") == "john smith"
    assert normalize_string("ACME Corp.") == "acme corp"


def test_jaro_winkler_reference_values():
    assert jaro_winkler_similarity("martha", "marhta") > 0.9
    assert jaro_winkler_similarity("abc", "abc") == 1.0
    assert jaro_winkler_similarity("", "abc") == 0.0


def test_jaccard():
    assert jaccard_similarity("new york city", "new york") == 2 / 3
    assert jaccard_similarity("", "") == 1.0


def test_levenshtein_similarity_gate():
    # distance > max_edit_distance (2) → 0.0 (linker :186-200)
    assert levenshtein_similarity("kitten", "sitting") == 0.0
    assert levenshtein_similarity("jon smith", "jhon smith") > 0.8


def test_compute_similarity_type_gate_and_exact():
    assert compute_similarity("Acme", "Acme", "PERSON", "ORGANIZATION") == 0.0
    assert compute_similarity("ACME Corp.", "acme corp", "ORGANIZATION", "ORGANIZATION") == 1.0
    # typo-tolerant canonical match (linker tests :528-562)
    assert (
        compute_similarity("Jon Smith", "Jhon Smith", "PERSON", "PERSON") >= 0.85
    )
