"""Extractor spec tests mirroring the reference's inline tests
(entity/mod.rs:1110-1154) plus quirk pins from SURVEY §2.3."""

from graphrag_rs_spark.kernel.extraction import (
    calculate_confidence,
    clean_word,
    entity_id,
    extract_entities_from_chunk,
    find_mentions,
    infer_relationship_type,
    is_likely_person_word,
    normalize_name,
)


def _names(ents, etype=None):
    return {e["name"] for e in ents if etype is None or e["entity_type"] == etype}


def test_person_and_org_extraction():
    # mirrors entity/mod.rs test: persons + orgs found in a rich sentence.
    # NOTE the reference's suffix matcher backtracks only to the previous
    # space (entity/mod.rs:521), which IS the space right before the suffix —
    # so suffix-matched org names are the bare suffix token ("Corp"), not
    # "Acme Corp". Quirk preserved for P/R parity.
    text = "Dr. John Smith works for Acme Corp in New York."
    ents = extract_entities_from_chunk(text)
    assert "John Smith" in _names(ents, "PERSON")
    assert "Corp" in _names(ents, "ORGANIZATION")
    assert "New York" in _names(ents, "LOCATION")


def test_title_based_confidence():
    ents = extract_entities_from_chunk("Dr. Watson arrived.")
    watson = [e for e in ents if e["name"] == "Watson"]
    assert watson and abs(watson[0]["confidence"] - 0.9) < 1e-6


def test_two_word_name_confidence():
    ents = extract_entities_from_chunk("Alice Johnson spoke.")
    aj = [e for e in ents if e["name"] == "Alice Johnson"]
    # 0.5 base + 0.2 two words + 0.1 capitalized = 0.8
    assert aj and abs(aj[0]["confidence"] - 0.8) < 1e-6


def test_org_first_occurrence_only():
    # reference quirk: text.find → only the FIRST "Corp" match per chunk,
    # and the extracted name is the bare suffix (see note above) — so two
    # "... Corp" companies collapse into a single "Corp" entity
    text = "Acme Corp met Zeta Corp yesterday."
    ents = extract_entities_from_chunk(text)
    orgs = _names(ents, "ORGANIZATION")
    assert orgs == {"Corp"}
    # but the *mentions* cover both occurrences (find-all, entity/mod.rs:613-625)
    corp = [e for e in ents if e["name"] == "Corp"][0]
    assert len(corp["mentions"]) == 2


def test_org_suffix_no_preceding_space_keeps_token():
    # when the suffix is glued to the name ("AcmeCorp"), the backtrack
    # reaches the token start and the full token is extracted
    ents = extract_entities_from_chunk("They acquired AcmeCorp last week.")
    assert "AcmeCorp" in _names(ents, "ORGANIZATION")


def test_org_confidence():
    ents = extract_entities_from_chunk("He joined Initech LLC recently.")
    org = [e for e in ents if e["entity_type"] == "ORGANIZATION"]
    # 0.5 + 0.3 (LLC) + 0.1 (capitalized) = 0.9
    assert org and abs(org[0]["confidence"] - 0.9) < 1e-6


def test_university_prefix():
    ents = extract_entities_from_chunk("She studies at the University of Chicago. Classes began.")
    orgs = _names(ents, "ORGANIZATION")
    assert "University of Chicago" in orgs


def test_location_confidence():
    ents = extract_entities_from_chunk("They visited Boston.")
    loc = [e for e in ents if e["entity_type"] == "LOCATION"]
    # 0.5 + 0.3 known + 0.1 capitalized = 0.9
    assert loc and abs(loc[0]["confidence"] - 0.9) < 1e-6


def test_normalize_name_drops_spaces():
    # reference quirk (entity/mod.rs:779-785): spaces are filtered out
    # before the space→underscore replace, so ids have no separators
    assert normalize_name("John Smith") == "johnsmith"
    assert entity_id("John Smith", "PERSON") == "PERSON_johnsmith"
    assert normalize_name("O'Brien & Co.") == "obrienco"


def test_clean_word():
    assert clean_word("Smith,") == "Smith"
    assert clean_word("O'Connor's") == "O'Connor's"  # inner apostrophes kept
    assert clean_word("O'Connor'") == "O'Connor"  # trailing apostrophe stripped
    assert clean_word("word!") == "word"


def test_is_likely_person_word():
    assert is_likely_person_word("Johnson")
    assert is_likely_person_word("McBain")
    assert not is_likely_person_word("a")
    assert not is_likely_person_word("it")
    assert not is_likely_person_word("word")  # not capitalized


def test_find_mentions_non_overlapping():
    assert find_mentions("aaa", "aa") == [(0, 2)]
    assert find_mentions("Tom met Tom", "Tom") == [(0, 3), (8, 11)]


def test_mentionless_entity_excluded_from_pairs():
    # "John    Smith" (multiple spaces): two-word extraction yields
    # "John Smith" which does NOT literally occur → zero mentions
    ents = extract_entities_from_chunk("John    Smith visited.")
    js = [e for e in ents if e["name"] == "John Smith"]
    assert js and js[0]["mentions"] == []


def test_dedupe_max_confidence():
    # same entity found by two phases keeps max confidence
    text = "Dr. Johnson met Johnson again."
    ents = extract_entities_from_chunk(text)
    js = [e for e in ents if e["name"] == "Johnson"]
    assert len(js) == 1
    assert js[0]["confidence"] == 0.9


def test_confidence_threshold_filter():
    # single capitalized name-word: 0.5 + 0.1 = 0.6 >= 0.6 passes;
    # with a higher threshold it is dropped
    assert _names(extract_entities_from_chunk("Anderson spoke."), "PERSON") == {"Anderson"}
    assert _names(extract_entities_from_chunk("Anderson spoke.", min_confidence=0.7), "PERSON") == set()


def test_relationship_typing():
    assert infer_relationship_type("PERSON", "ORGANIZATION", "she works for them") == "WORKS_FOR"
    assert infer_relationship_type("ORGANIZATION", "PERSON", "founded in 1999") == "LEADS"
    assert infer_relationship_type("PERSON", "ORGANIZATION", "nothing special") == "ASSOCIATED_WITH"
    assert infer_relationship_type("PERSON", "LOCATION", "he is from there") == "BORN_IN"
    assert infer_relationship_type("PERSON", "LOCATION", "lives in town") == "LOCATED_IN"
    assert infer_relationship_type("ORGANIZATION", "LOCATION", "headquartered there") == "HEADQUARTERED_IN"
    assert infer_relationship_type("ORGANIZATION", "LOCATION", "plain") == "LOCATED_IN"
    assert infer_relationship_type("PERSON", "PERSON", "they married") == "MARRIED_TO"
    assert infer_relationship_type("PERSON", "PERSON", "colleague of hers") == "COLLEAGUE_OF"
    assert infer_relationship_type("PERSON", "PERSON", "plain") == "KNOWS"
    assert infer_relationship_type("LOCATION", "LOCATION", "x") == "RELATED_TO"


def test_calculate_confidence_caps_at_one():
    assert calculate_confidence("Dr. ABC University Inc Corp LLC", "ORGANIZATION") <= 1.0
