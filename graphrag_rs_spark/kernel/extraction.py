"""Pattern/gazetteer entity extraction + relation typing — behavioral spec.

Transcribed semantics of the reference's deterministic ("algorithmic")
extractor ``EntityExtractor`` (/root/reference/graphrag-core/src/entity/mod.rs):

- extract_from_chunk dispatch + dedupe + threshold   entity/mod.rs:114-173
- person extraction, 4 phases                        entity/mod.rs:176-499
- organization extraction (suffix/prefix gazetteer)  entity/mod.rs:502-566
- location extraction (known-location gazetteer)     entity/mod.rs:569-600
- concept/event/object/generic extraction            entity/mod.rs:917-1089
- mention offsets (all occurrences, non-overlapping) entity/mod.rs:603-631
- confidence scoring                                 entity/mod.rs:721-759
- entity id normalization                            entity/mod.rs:779-785
- per-chunk dedupe by (name, type)                   entity/mod.rs:788-809
- relation-type inference                            entity/mod.rs:841-879

Reference quirks preserved deliberately (they matter for P/R parity):
- org suffixes match only the FIRST occurrence per suffix per chunk
  (``text.find``, entity/mod.rs:519) and match inside words ("Incredible"
  contains "Inc");
- entity-id normalization drops spaces entirely ("John Smith" →
  "PERSON_johnsmith") because the filter removes non-alphanumerics before
  the space→underscore replace (entity/mod.rs:779-785);
- entities whose (cleaned) name does not literally occur in the chunk text
  get zero mentions and therefore never participate in relationships
  (build.rs:579-583).

Everything here is a pure function of the chunk content — embarrassingly
parallel, executed batch-wise inside Arrow UDFs.
"""

from __future__ import annotations

# --- static gazetteers (entity/mod.rs:182-296,358-371,504-515,571-582) ---

PERSON_TITLES = frozenset(
    "mr mrs ms dr prof professor sir lady lord captain major colonel general "
    "admiral judge father mother brother sister aunt uncle grandfather grandmother".split()
)

NON_PERSON_WORDS = frozenset(
    "chapter the and but or in on at to for with by from about into through "
    "during before after above below up down out off over under again further "
    "then once here there when where why how all any both each few more most "
    "other some such only own same so than too very can will just should now "
    "temptations strategic movements decides upon whitewashing "
    "saturday monday tuesday wednesday thursday friday sunday "
    "january february march april may june july august september october "
    "november december adventures complete".split()
)

KNOWN_NAMES = (
    "Entity Name", "Second Entity", "Guardian Entity", "Friend Entity",
    "Companion Entity", "Third Entity", "Fourth Entity", "Fifth Entity",
    "Sixth Entity", "Seventh Entity", "Eighth Entity", "Ninth Entity",
)

ORG_SUFFIXES = (
    "Inc", "Corp", "LLC", "Ltd", "Company", "Corporation", "Group",
    "Solutions", "Technologies",
)
ORG_PREFIXES = ("University of", "Institute of", "Department of")
ORG_INDICATORS = (
    "Inc", "Corp", "LLC", "Ltd", "Company", "Corporation", "University",
    "Institute",
)

KNOWN_LOCATIONS = (
    "United States", "New York", "California", "London", "Paris", "Tokyo",
    "Berlin", "Washington", "Boston", "Chicago",
)

NAME_ENDINGS = ("son", "sen", "ton", "ham", "ford", "ley", "ment", "ard", "ert")
NAME_PREFIXES = ("mc", "mac", "o'", "de", "van", "von", "la", "le")
SHORT_NON_NAMES = frozenset(
    "it is as at be by do go he if in me my no of on or so to up us we".split()
)

CONCEPT_INDICATORS = (
    "Theory", "Concept", "Principle", "Philosophy", "Doctrine", "Idea",
    "Method", "Approach", "Framework", "Model", "Paradigm", "Thesis",
)
EVENT_WORDS = (
    "meeting", "conference", "ceremony", "celebration", "festival",
    "competition", "war", "battle", "expedition", "journey", "trial",
)
OBJECT_WORDS = (
    "sword", "shield", "book", "manuscript", "scroll", "tablet", "ring",
    "crown", "treasure", "coin", "tool", "weapon",
)
COMMON_WORDS = frozenset(
    "the and but or in on at to for with by from about into through during "
    "before after above below up down out off over under again further then "
    "once here there when where why how all any both each few more most other "
    "some such only own same so than too very can will just should now could "
    "would said says told asked replied".split()
)

# type aliases accepted by the dispatcher (entity/mod.rs:136-160)
_PERSON_TYPES = {"PERSON", "CHARACTER", "RESEARCHER", "SPEAKER", "DIALOGUE_SPEAKER"}
_ORG_TYPES = {"ORGANIZATION", "INSTITUTION", "BRAND", "COMPANY"}
_LOC_TYPES = {"LOCATION", "SETTING", "PLACE"}
_CONCEPT_TYPES = {"CONCEPT", "THEORY", "THEME", "ARGUMENT", "IDEA"}
_EVENT_TYPES = {"EVENT", "EXPERIMENT", "HAPPENING"}
_OBJECT_TYPES = {"OBJECT", "TOOL", "ARTIFACT", "ITEM"}


# --- word-level helpers (entity/mod.rs:633-718) ---
# perf: these run on every token of a 100TB corpus inside Arrow batches —
# the regexes are C-speed equivalents of the reference's char loops, and
# the person-word check is memoized (token vocabulary is tiny vs corpus)

import functools
import re as _re

# chars to REMOVE: anything that is not unicode-alphabetic or apostrophe
# ([^\W\d_] == unicode alphabetic)
_NON_ALPHA_APOS = _re.compile(r"(?:[\W\d_](?<!'))+")
_ALPHA_APOS_FULL = _re.compile(r"(?:[^\W\d_]|')+")


@functools.lru_cache(maxsize=1 << 16)
def clean_word(word: str) -> str:
    """Keep alphabetic chars + apostrophes, strip trailing apostrophes.

    Memoized: the regex sub runs once per DISTINCT token, not per
    occurrence — token frequency is Zipfian, so the hit rate is high and
    this is the single hottest call in the extraction kernel (profiled:
    ~20% of extract_entities_from_chunk before memoization)."""
    return _NON_ALPHA_APOS.sub("", word).rstrip("'")


@functools.lru_cache(maxsize=1 << 16)
def _clean_lower(word: str) -> "tuple[str, str]":
    """(clean_word(w), clean_word(w).lower()) in one cached step."""
    c = clean_word(word)
    return c, c.lower()


def is_capitalized(word: str) -> bool:
    return bool(word) and word[0].isupper()


@functools.lru_cache(maxsize=65536)
def is_likely_person_word(word: str) -> bool:
    if len(word) < 2:
        return False
    wl = word.lower()
    if len(word) <= 2 and wl in SHORT_NON_NAMES:
        return False
    is_proper = word[0].isupper() and _ALPHA_APOS_FULL.fullmatch(word) is not None
    if not is_proper:
        return False
    return (
        len(word) >= 3
        or wl.endswith(NAME_ENDINGS)
        or wl.startswith(NAME_PREFIXES)
    )


def is_likely_organization(name: str) -> bool:
    return any(ind in name for ind in ORG_INDICATORS)


def is_known_location(name: str) -> bool:
    return any(loc in name for loc in KNOWN_LOCATIONS)


def calculate_confidence(name: str, entity_type: str) -> float:
    """Base 0.5 + type-specific bonuses, capped at 1.0 (entity/mod.rs:721-759)."""
    confidence = 0.5
    if entity_type == "PERSON":
        if "Dr." in name or "Prof." in name:
            confidence += 0.3
        if len(name.split()) == 2:
            confidence += 0.2
    elif entity_type == "ORGANIZATION":
        if "Inc" in name or "Corp" in name or "LLC" in name:
            confidence += 0.3
        if "University" in name or "Institute" in name:
            confidence += 0.2
    elif entity_type == "LOCATION":
        if "," in name:
            confidence += 0.2
        if is_known_location(name):
            confidence += 0.3
    if name and name[0].isupper():
        confidence += 0.1
    return min(confidence, 1.0)


def normalize_name(name: str) -> str:
    """Entity-id normalization (entity/mod.rs:779-785).

    Lowercase, then keep only alphanumerics/underscore — spaces are DROPPED
    (the reference filters before its space→underscore replace, so the
    replace is a no-op).
    """
    return "".join(c for c in name.lower() if c.isalnum() or c == "_")


def entity_id(name: str, entity_type: str) -> str:
    """``{TYPE}_{normalized_name}`` (entity/mod.rs:611)."""
    return f"{entity_type}_{normalize_name(name)}"


def find_mentions(text: str, name: str) -> list[tuple[int, int]]:
    """All non-overlapping occurrences of ``name`` (entity/mod.rs:613-625)."""
    mentions = []
    start = 0
    while True:
        pos = text.find(name, start)
        if pos == -1:
            break
        mentions.append((pos, pos + len(name)))
        start = pos + len(name)
    return mentions


# --- per-type extraction (each yields (name, type, confidence)) ---

# known names preprocessed to lowercase word tuples (all are 2 words)
_KNOWN_NAME_TUPLES = {
    tuple(w.lower() for w in name.split()): name for name in KNOWN_NAMES
}


def _extract_persons(text: str, min_confidence: float) -> list[tuple[str, str, float]]:
    out: list[tuple[str, str, float]] = []
    words = text.split()
    n = len(words)
    # precompute per-token derivations once (each phase reuses them);
    # one memoized lookup yields both the clean and lowered forms
    cleans = []
    lowers = []
    for w in words:
        c, low = _clean_lower(w)
        cleans.append(c)
        lowers.append(low)
    # raw-word capitalization, computed once (phases 2-4 re-test the same
    # indices; 911k is_capitalized calls/200 docs profiled before this)
    caps = [bool(w) and w[0].isupper() for w in words]
    processed: set[int] = set()

    # PHASE 1: known-name gazetteer, word-index claiming (entity/mod.rs:349-407)
    for i in range(n):
        if i in processed or i + 1 >= n:
            continue
        name = _KNOWN_NAME_TUPLES.get((lowers[i], lowers[i + 1]))
        if name is not None:
            if 0.95 >= min_confidence:
                out.append((name, "PERSON", 0.95))
            processed.add(i)
            processed.add(i + 1)

    # PHASE 2: title-based (entity/mod.rs:409-457)
    for i in range(n):
        if i in processed:
            continue
        if lowers[i] in PERSON_TITLES and i + 1 < n and (i + 1) not in processed:
            next_word = cleans[i + 1]
            if caps[i + 1] and is_likely_person_word(next_word):
                if i + 2 < n and (i + 2) not in processed:
                    third = cleans[i + 2]
                    if caps[i + 2] and is_likely_person_word(third):
                        processed.add(i + 2)
                        name = f"{next_word} {third}"
                    else:
                        name = next_word
                else:
                    name = next_word
                if 0.9 >= min_confidence:
                    out.append((name, "PERSON", 0.9))
                processed.add(i)
                processed.add(i + 1)

    # PHASE 3: two-word First Last (entity/mod.rs:459-499)
    for i in range(n - 1):
        if i in processed or (i + 1) in processed:
            continue
        first, second = cleans[i], cleans[i + 1]
        if (
            caps[i]
            and caps[i + 1]
            and is_likely_person_word(first)
            and is_likely_person_word(second)
            and lowers[i] not in NON_PERSON_WORDS
            and lowers[i + 1] not in NON_PERSON_WORDS
        ):
            name = f"{first} {second}"
            parts = name.split()
            if len(parts) == 2 and all(is_capitalized(p) for p in parts):
                conf = calculate_confidence(name, "PERSON")
                if conf >= min_confidence:
                    out.append((name, "PERSON", conf))
                processed.add(i)
                processed.add(i + 1)

    # PHASE 4: single capitalized name-shaped words (entity/mod.rs:324-344)
    for i in range(n):
        if i in processed:
            continue
        word = cleans[i]
        if len(word) < 2 or lowers[i] in NON_PERSON_WORDS:
            continue
        if caps[i] and is_likely_person_word(word):
            conf = calculate_confidence(word, "PERSON")
            if conf >= min_confidence:
                out.append((word, "PERSON", conf))
    return out


def _extract_organizations(text: str, min_confidence: float) -> list[tuple[str, str, float]]:
    out: list[tuple[str, str, float]] = []
    # first occurrence per suffix only (entity/mod.rs:517-538)
    for suffix in ORG_SUFFIXES:
        pos = text.find(suffix)
        if pos != -1:
            sp = text.rfind(" ", 0, pos)
            start = sp + 1 if sp != -1 else 0
            name = text[start : pos + len(suffix)].strip()
            if name and is_likely_organization(name):
                conf = calculate_confidence(name, "ORGANIZATION")
                if conf >= min_confidence:
                    out.append((name, "ORGANIZATION", conf))
    # prefixes: scan to '.' or +50 chars (entity/mod.rs:540-563)
    for prefix in ORG_PREFIXES:
        pos = text.find(prefix)
        if pos != -1:
            dot = text.find(".", pos)
            end = dot if dot != -1 else min(len(text), pos + 50)
            name = text[pos:end].strip()
            if name and len(name) > len(prefix):
                conf = calculate_confidence(name, "ORGANIZATION")
                if conf >= min_confidence:
                    out.append((name, "ORGANIZATION", conf))
    return out


def _extract_locations(text: str, min_confidence: float) -> list[tuple[str, str, float]]:
    out = []
    for location in KNOWN_LOCATIONS:
        if location in text:
            conf = calculate_confidence(location, "LOCATION")
            if conf >= min_confidence:
                out.append((location, "LOCATION", conf))
    return out


def _extract_concepts(
    text: str, min_confidence: float, entity_type: str
) -> list[tuple[str, str, float]]:
    out = []
    for raw in text.split():
        cw = clean_word(raw)
        if any(ind in cw for ind in CONCEPT_INDICATORS) and 0.75 >= min_confidence:
            out.append((cw, entity_type, 0.75))
        if is_capitalized(raw) and len(raw) > 4:
            cw2 = clean_word(raw)
            if cw2.lower() not in COMMON_WORDS and 0.6 >= min_confidence:
                out.append((cw2, entity_type, 0.6))
    return out


def _extract_by_wordlist(
    text: str, min_confidence: float, wordlist: tuple[str, ...],
    entity_type: str, confidence: float,
) -> list[tuple[str, str, float]]:
    lower = text.lower()
    return [
        (w, entity_type, confidence)
        for w in wordlist
        if w in lower and confidence >= min_confidence
    ]


def _extract_generic(
    text: str, min_confidence: float, entity_type: str
) -> list[tuple[str, str, float]]:
    out = []
    for raw in text.split():
        if is_capitalized(raw) and len(raw) > 3:
            cw = clean_word(raw)
            if cw.lower() not in COMMON_WORDS and 0.5 >= min_confidence:
                out.append((cw, entity_type, 0.5))
    return out


# --- the per-chunk entry point (entity/mod.rs:114-173) ---

def extract_entities_from_chunk(
    text: str,
    min_confidence: float = 0.6,
    entity_types: tuple[str, ...] = ("PERSON", "ORGANIZATION", "LOCATION"),
    allowed_patterns: tuple = (),
    excluded_patterns: tuple = (),
) -> list[dict]:
    """Extract deduped entities from one chunk's text.

    Returns a list of dicts:
    ``{entity_id, name, entity_type, confidence, mentions: [(start, end)]}``
    deduped by (name, type) with max confidence, filtered to
    ``confidence >= min_confidence``. ``mentions`` are all literal
    occurrences of the name in ``text``; may be empty if the cleaned name
    never occurs verbatim (a reference quirk that excludes the entity from
    relationship pairing).
    """
    raw: list[tuple[str, str, float]] = []
    for etype in entity_types:
        if etype in _PERSON_TYPES:
            raw.extend(_extract_persons(text, min_confidence))
        elif etype in _ORG_TYPES:
            raw.extend(_extract_organizations(text, min_confidence))
        elif etype in _LOC_TYPES:
            raw.extend(_extract_locations(text, min_confidence))
        elif etype in _CONCEPT_TYPES:
            raw.extend(_extract_concepts(text, min_confidence, etype))
        elif etype in _EVENT_TYPES:
            raw.extend(_extract_by_wordlist(text, min_confidence, EVENT_WORDS, "EVENT", 0.7))
        elif etype in _OBJECT_TYPES:
            raw.extend(_extract_by_wordlist(text, min_confidence, OBJECT_WORDS, "OBJECT", 0.65))
        else:
            raw.extend(_extract_generic(text, min_confidence, etype))

    # pattern allow/deny filtering (entity/mod.rs:882-915)
    if allowed_patterns or excluded_patterns:
        import re

        allowed = [re.compile(p) for p in allowed_patterns]
        excluded = [re.compile(p) for p in excluded_patterns]
        raw = [
            r
            for r in raw
            if (not allowed or any(p.search(r[0]) for p in allowed))
            and not any(p.search(r[0]) for p in excluded)
        ]

    # dedupe by (name, type), max confidence (entity/mod.rs:788-809)
    merged: dict[tuple[str, str], float] = {}
    for name, etype, conf in raw:
        key = (name, etype)
        if key not in merged or conf > merged[key]:
            merged[key] = conf

    out = []
    for (name, etype), conf in merged.items():
        if conf >= min_confidence:
            out.append(
                {
                    "entity_id": entity_id(name, etype),
                    "name": name,
                    "entity_type": etype,
                    "confidence": conf,
                    "mentions": find_mentions(text, name),
                }
            )
    return out


# --- relation typing (entity/mod.rs:841-879) ---

def infer_relationship_type(type1: str, type2: str, context: str) -> str:
    """Type-pair + context-keyword relation inference. Symmetric in (type1, type2)."""
    pair = {type1, type2}
    if pair == {"PERSON", "ORGANIZATION"}:
        if "works for" in context or "employed by" in context:
            return "WORKS_FOR"
        if "founded" in context or "CEO" in context:
            return "LEADS"
        return "ASSOCIATED_WITH"
    if pair == {"PERSON", "LOCATION"}:
        if "born in" in context or "from" in context:
            return "BORN_IN"
        if "lives in" in context or "based in" in context:
            return "LOCATED_IN"
        return "ASSOCIATED_WITH"
    if pair == {"ORGANIZATION", "LOCATION"}:
        if "headquartered" in context or "based in" in context:
            return "HEADQUARTERED_IN"
        return "LOCATED_IN"
    if type1 == "PERSON" and type2 == "PERSON":
        if "married" in context or "spouse" in context:
            return "MARRIED_TO"
        if "colleague" in context or "partner" in context:
            return "COLLEAGUE_OF"
        return "KNOWS"
    return "RELATED_TO"
