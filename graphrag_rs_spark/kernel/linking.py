"""String-similarity metrics — behavioral spec of the reference linker.

Transcribed from /root/reference/graphrag-core/src/entity/string_similarity_linker.rs:
- normalize_string           :167-184
- levenshtein similarity     :186-245 (native F.levenshtein on the Spark side)
- jaro / jaro-winkler        :247-322 (pandas-UDF vectorized on the Spark side)
- token jaccard              :324-341 (array fns on the Spark side)
- soundex                    :352-405 (native F.soundex on the Spark side —
  NOTE the reference's simplified soundex differs from standard soundex in
  that it does NOT skip H/W between same-coded consonants and drops the
  first letter's code-dedup; for gazetteer-free names the 4-char codes agree
  on the reference's own test vectors, which we pin in tests)
- max-combiner + type gate   :127-165

These run in the oracle and inside the scoring pandas UDF; candidate
*generation* (blocking) is distributed (operators/linking.py).
"""

from __future__ import annotations

import re


def normalize_string(s: str) -> str:
    """Lowercase, strip punctuation, collapse whitespace (linker :167-184)."""
    s = s.lower()
    s = "".join(c for c in s if c.isalnum() or c.isspace())
    return " ".join(s.split())


_ASCII_STRIP_RE = re.compile(r"[^a-z0-9\s]", re.ASCII)
_ASCII_WS_RE = re.compile(r"\s+", re.ASCII)


def spark_normalize_string(s: str) -> str:
    """Bit-exact Python mirror of operators.linking.normalized_name_col —
    ``lower()`` then ``regexp_replace(r"[^a-z0-9\\s]", "")`` then collapse
    ``\\s+`` and ``trim`` — used ONLY by the sequential small-input linker so
    its norms match the distributed path byte for byte.

    This differs from the reference-transcribed :func:`normalize_string`
    above on non-ASCII input: Java regex ``\\s`` and the ``[a-z0-9]`` class
    are ASCII-only, so 'Zoë Café' → 'zo caf' here but 'zoë café' there.
    Parity with the distributed plan is what the small-input fast path
    promises, so the ASCII mirror is the correct choice (the kernel
    normalize_string stays the reference-semantics oracle for
    compute_similarity). Java ``\\s`` = [ \\t\\n\\x0B\\f\\r] = Python
    ``re.ASCII`` ``\\s``; Spark ``trim`` strips ' ' only, and after the
    whitespace collapse the string's only whitespace IS ' '.
    """
    s = s.lower()
    s = _ASCII_STRIP_RE.sub("", s)
    return _ASCII_WS_RE.sub(" ", s).strip(" ")


def levenshtein_distance(s1: str, s2: str) -> int:
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1, 1):
        cur = [i]
        for j, c2 in enumerate(s2, 1):
            cost = 0 if c1 == c2 else 1
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost))
        prev = cur
    return prev[-1]


def levenshtein_similarity(s1: str, s2: str, max_edit_distance: int = 2) -> float:
    d = levenshtein_distance(s1, s2)
    if d > max_edit_distance:
        return 0.0
    max_len = max(len(s1), len(s2))
    if max_len == 0:
        return 1.0
    return 1.0 - d / max_len


def jaro_similarity(s1: str, s2: str) -> float:
    if s1 == s2:
        # jaro(s, s) is 1.0 by definition (all chars match in place, zero
        # transpositions) — skip the O(len·window) matching loops; equal
        # pairs dominate blocked candidate sets on deduplicated corpora
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_distance = max(max(len1, len2) // 2 - 1, 0)
    s1_matches = [False] * len1
    s2_matches = [False] * len2
    matches = 0
    for i in range(len1):
        lo = max(i - match_distance, 0)
        hi = min(i + match_distance + 1, len2)
        for j in range(lo, hi):
            if s2_matches[j] or s1[i] != s2[j]:
                continue
            s1_matches[i] = True
            s2_matches[j] = True
            matches += 1
            break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(len1):
        if not s1_matches[i]:
            continue
        while not s2_matches[k]:
            k += 1
        if s1[i] != s2[k]:
            transpositions += 1
        k += 1
    m = float(matches)
    return (m / len1 + m / len2 + (m - transpositions / 2.0) / m) / 3.0


def jaro_winkler_similarity(s1: str, s2: str) -> float:
    jaro = jaro_similarity(s1, s2)
    prefix_len = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 != c2:
            break
        prefix_len += 1
    return jaro + prefix_len * 0.1 * (1.0 - jaro)


def jaccard_similarity(s1: str, s2: str) -> float:
    t1, t2 = set(s1.split()), set(s2.split())
    if not t1 and not t2:
        return 1.0
    union = len(t1 | t2)
    if union == 0:
        return 0.0
    return len(t1 & t2) / union


_SOUNDEX_CODES = {
    **dict.fromkeys("BFPV", "1"),
    **dict.fromkeys("CGJKQSXZ", "2"),
    **dict.fromkeys("DT", "3"),
    "L": "4",
    **dict.fromkeys("MN", "5"),
    "R": "6",
}


def soundex(s: str) -> str:
    """Simplified soundex (linker :352-405): 4 chars, first-letter kept."""
    if not s:
        return ""
    chars = s.upper()
    result = chars[0] if chars[0].isalpha() else ""
    prev_code = _SOUNDEX_CODES.get(chars[0], "0")
    for c in chars[1:]:
        code = _SOUNDEX_CODES.get(c, "0")
        # reference quirk: prev_code only updates when a code is emitted, so
        # vowels do NOT reset the dedup (unlike standard soundex)
        if code != "0" and code != prev_code:
            result += code
            prev_code = code
        if len(result) >= 4:
            break
    return result.ljust(4, "0")


def spark_soundex(s: str) -> str:
    """Bit-exact Python mirror of Spark SQL's native ``soundex`` expression,
    used ONLY by the sequential small-input linker so its blocking keys
    match the distributed path's ``F.soundex`` exactly (the reference-
    transcribed :func:`soundex` above keeps its own quirk semantics and is
    a DIFFERENT function). Semantics pinned empirically against Spark 4.1
    and asserted by tests/test_linking.py::test_spark_soundex_parity:

    - empty string -> empty string; non-letter first char -> input unchanged
    - first letter kept upper-cased; later letters coded BFPV=1 CGJKQSXZ=2
      DT=3 L=4 MN=5 R=6
    - adjacent same codes collapse; H/W are skipped and do NOT break
      adjacency; vowels (AEIOUY) and non-letters (digits) DO break it
    - result truncated/padded to 4 chars
    - "letter" means ASCII [A-Za-z] ONLY: Spark's expression walks UTF-8
      *bytes* ('a'<=b<=\'z\' / 'A'<=b<=\'Z\'), so 'é' is a non-letter there
      (each of its bytes falls outside the range) — Python ``isalpha`` would
      wrongly accept it, diverging on the first-char gate
    """
    if not s:
        return s
    first = s[0]
    if not ("a" <= first <= "z" or "A" <= first <= "Z"):
        return s
    out = [first.upper()]
    prev = _SOUNDEX_CODES.get(first.upper(), "")
    for ch in s[1:]:
        u = ch.upper()
        if not ("A" <= u <= "Z"):
            prev = ""  # digit/punct/non-ASCII: separator — resets the dedup
            continue
        if u in "HW":
            continue  # ignored AND transparent to adjacency
        code = _SOUNDEX_CODES.get(u)
        if code is None:
            prev = ""  # vowel: not emitted, resets the dedup
            continue
        if code != prev:
            out.append(code)
            prev = code
            if len(out) == 4:
                break
    return "".join(out).ljust(4, "0")


def compute_similarity(
    name1: str,
    name2: str,
    type1: str,
    type2: str,
    *,
    fuzzy_matching: bool = True,
    use_phonetic: bool = False,
    max_edit_distance: int = 2,
) -> float:
    """Max over enabled metrics, 0 across types, 1 on normalized exact match
    (linker :127-165)."""
    if type1 != type2:
        return 0.0
    n1, n2 = normalize_string(name1), normalize_string(name2)
    if n1 == n2:
        return 1.0
    scores = []
    if fuzzy_matching:
        scores.append(levenshtein_similarity(n1, n2, max_edit_distance))
    scores.append(jaro_winkler_similarity(n1, n2))
    scores.append(jaccard_similarity(n1, n2))
    if use_phonetic:
        scores.append(0.9 if soundex(n1) == soundex(n2) else 0.0)
    return max(scores) if scores else 0.0
