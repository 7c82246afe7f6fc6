"""C5 kernel: semantic chunking — behavioral transcription of the
reference's SemanticChunker (text/semantic_chunking.rs).

Pure per-document Python (wrapped in an Arrow batch by
operators/chunking.py, same pattern as kernel/chunking.py). Pinned
reference semantics:

- sentence split (semantic_chunking.rs:125-164): line-based; blank lines
  flush the current sentence; within a line, split_inclusive on .!? with
  per-part trim, parts joined by single spaces; a part not ending in
  punctuation carries into the next part/line.
- per-sentence embedding = mean of per-word hash vectors, L2-normalized
  (vector/mod.rs:601-638 EmbeddingGenerator). The reference derives word
  vectors from Rust's DefaultHasher (not reproducible outside Rust); we
  keep the same construction — deterministic per-(word, dim-index) hash
  mapped to [-1, 1] — using blake2b, so values differ but the design and
  all downstream semantics match.
- distance series: 1 − cosine(sent[i], sent[i+buffer]) for each i
  (semantic_chunking.rs:178-192).
- breakpoint threshold (semantic_chunking.rs:213-259):
  percentile → sorted[min(floor(len·p/100), len-1)];
  stddev     → mean + t·σ (population σ);
  absolute   → t. Breakpoint at i+1 wherever diff[i] > threshold.
- chunk assembly (semantic_chunking.rs:260-309): segments between
  breakpoints; a segment shorter than min_chunk_size sentences is MERGED
  FORWARD (the reference `continue`s without advancing start, a quirk we
  preserve); segments longer than max_chunk_size are split into
  max_chunk_size-sentence pieces; sentences joined by " ".
"""

from __future__ import annotations

import hashlib
import math

_WORD_VEC_CACHE: dict[tuple[str, int, str], list[float]] = {}


def split_sentences(text: str) -> list[str]:
    """semantic_chunking.rs:125-164 — line-based sentence splitter."""
    sentences: list[str] = []
    current = ""
    for line in text.splitlines():
        line = line.strip()
        if not line:
            if current:
                sentences.append(current.strip())
                current = ""
            continue
        for part in _split_inclusive(line, ".!?"):
            part = part.strip()
            if not part:
                continue
            current += part + " "
            if part.endswith((".", "!", "?")):
                sentences.append(current.strip())
                current = ""
    if current.strip():
        sentences.append(current.strip())
    return sentences


def _split_inclusive(s: str, seps: str) -> list[str]:
    """Rust's split_inclusive: separators stay attached to the left part."""
    out, start = [], 0
    for i, ch in enumerate(s):
        if ch in seps:
            out.append(s[start : i + 1])
            start = i + 1
    if start < len(s):
        out.append(s[start:])
    return out


def _word_vector(word: str, dim: int, hash_fn: str = "fast") -> list[float]:
    """Deterministic hash vector in [-1,1]^dim (vector/mod.rs:640-660
    construction; blake2b in place of Rust's DefaultHasher).

    ``hash_fn="portable"`` derives each component from the first 15 hex
    chars of sha256 — reproducible in ANY engine with a sha256 function
    (the DuckDB oracle recomputes it exactly; same pattern as the simhash
    portable family, operators/dedup.py). "fast" (blake2b-8) stays the
    production default.
    """
    key = (word, dim, hash_fn)
    cached = _WORD_VEC_CACHE.get(key)
    if cached is not None:
        return cached
    vec = []
    for i in range(dim):
        if hash_fn == "portable":
            hx = hashlib.sha256(f"{word}\x00{i}".encode("utf-8")).hexdigest()
            # cast-to-double FIRST, then divide: matches the SQL engines'
            # BIGINT→DOUBLE cast + double division (Python's int/int is
            # correctly-rounded in one step and can differ by 1 ulp)
            v = float(int(hx[:15], 16)) / float(2**60)  # [0, 1)
        else:
            h = hashlib.blake2b(
                f"{word}\x00{i}".encode("utf-8"), digest_size=8
            ).digest()
            v = int.from_bytes(h, "big") / float(2**64)  # [0, 1)
        vec.append(v * 2.0 - 1.0)
    if len(_WORD_VEC_CACHE) < 200_000:  # bound executor-side cache
        _WORD_VEC_CACHE[key] = vec
    return vec


def sentence_embedding(
    sentence: str, dim: int = 64, hash_fn: str = "fast"
) -> list[float]:
    """Mean of word vectors, unit-normalized (vector/mod.rs:601-638).
    dim defaults to 64 here (the reference test uses 384; cosine between
    hash vectors is dimension-stable and 6× cheaper at 64)."""
    words = sentence.split()
    if not words:
        return [0.0] * dim
    acc = [0.0] * dim
    for w in words:
        wv = _word_vector(w.lower(), dim, hash_fn)
        for i in range(dim):
            acc[i] += wv[i]
    n = float(len(words))
    acc = [v / n for v in acc]
    norm = math.sqrt(sum(v * v for v in acc))
    if norm > 0:
        acc = [v / norm for v in acc]
    return acc


def _cosine(a: list[float], b: list[float]) -> float:
    dot = sum(x * y for x, y in zip(a, b))
    ma = math.sqrt(sum(x * x for x in a))
    mb = math.sqrt(sum(y * y for y in b))
    if ma == 0.0 or mb == 0.0:
        return 0.0
    return dot / (ma * mb)


def determine_breakpoints(
    diffs: list[float], strategy: str, threshold_amount: float
) -> list[int]:
    """semantic_chunking.rs:213-259."""
    if not diffs:
        return []
    if strategy == "percentile":
        s = sorted(diffs)
        idx = min(int(len(s) * threshold_amount / 100.0), len(s) - 1)
        threshold = s[idx]
    elif strategy == "stddev":
        mean = sum(diffs) / len(diffs)
        var = sum((x - mean) ** 2 for x in diffs) / len(diffs)
        threshold = mean + threshold_amount * math.sqrt(var)
    elif strategy == "absolute":
        threshold = threshold_amount
    else:
        raise ValueError(f"unknown breakpoint strategy: {strategy}")
    return [i + 1 for i, d in enumerate(diffs) if d > threshold]


def semantic_chunk_text(
    text: str,
    *,
    strategy: str = "percentile",
    threshold_amount: float = 95.0,
    min_chunk_size: int = 1,
    max_chunk_size: int = 0,
    buffer_size: int = 1,
    dim: int = 64,
    hash_fn: str = "fast",
) -> list[tuple[int, str, int, int]]:
    """→ [(idx, content, start_sentence, end_sentence)] — defaults mirror
    SemanticChunkerConfig::default (semantic_chunking.rs:64-74)."""
    sentences = split_sentences(text)
    if not sentences:
        return []
    if len(sentences) == 1:
        return [(0, text, 0, 1)]

    embeddings = [sentence_embedding(s, dim, hash_fn) for s in sentences]
    diffs = [
        1.0 - _cosine(embeddings[i], embeddings[i + buffer_size])
        for i in range(max(0, len(embeddings) - buffer_size))
    ]
    breakpoints = determine_breakpoints(diffs, strategy, threshold_amount)

    out: list[tuple[int, str, int, int]] = []
    start = 0
    idx = 0
    for end in [*breakpoints, len(sentences)]:
        if end <= start:
            continue
        count = end - start
        if count < min_chunk_size:
            continue  # reference quirk: short segment merges forward
        if max_chunk_size > 0 and count > max_chunk_size:
            sub = start
            while sub < end:
                sub_end = min(sub + max_chunk_size, end)
                out.append((idx, " ".join(sentences[sub:sub_end]), sub, sub_end))
                idx += 1
                sub = sub_end
        else:
            out.append((idx, " ".join(sentences[start:end]), start, end))
            idx += 1
        start = end
    return out
