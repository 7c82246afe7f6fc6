"""C6 remainder: BoundaryAwareChunkingStrategy (BAR-RAG) kernel.

Pure per-document transcription of the reference's boundary-aware path:

- boundary detection  — text/boundary_detection.rs:131-378 (five detectors:
  sentence [abbreviation-aware, min length 10], paragraph [\\n\\s*\\n],
  heading [markdown / RST underline / ALL-CAPS / marker words], list
  transitions, code blocks [``` fences + 4-space indents]; sorted by
  position, consecutive-duplicate positions deduped keeping the first);
- coherence scoring   — text/semantic_coherence.rs:118-196 (adjacent-pair
  cosine avg weighted 0.7 + window-3 all-pairs avg weighted 0.3, over the
  first 20 sentences; <2 sentences ⇒ 1.0);
- greedy split search — semantic_coherence.rs:214-305 find_optimal_split
  (start with no splits; repeatedly add the candidate boundary that most
  improves mean chunk coherence; stop when none improves or a split would
  create a chunk with <2 sentences [validate → pop+break]; ≤100 iters);
- size enforcement    — chunking_strategies.rs:438-526 (chunks >2000 chars
  re-split at sentence punctuation with '.' re-appended and cumulative
  offsets; chunks <200 chars merged into the previous chunk with a space).

The reference scores coherence with a pluggable EmbeddingProvider; the
deterministic stand-in here is the same hash sentence embedding used by the
C5 semantic chunker (kernel/semantic.sentence_embedding ← vector/mod.rs
:601-660) — LLM/API embedding providers are the surveyed out-of-scope slot
(SURVEY §7 / S7). Quirks preserved: the scorer's own sentence splitter
(semantic_coherence.rs:378-414 — boundary at [.!?]+whitespace, fragments
≤3 chars dropped except a punctuation-terminated fragment at end-of-text),
RST heading positions point at the UNDERLINE line, heading line offsets
assume LF line endings, split_large_chunk's last sub-chunk inherits the
parent's end offset even when lengths drift.
"""

from __future__ import annotations

import re

from graphrag_rs_spark.kernel.semantic import sentence_embedding

# --- boundary detection (boundary_detection.rs) ---

_SENTENCE_END = re.compile(r"[.!?]+\s+")
_MD_HEADING = re.compile(r"^#{1,6}\s+.+$")
_NUMBERED_LIST = re.compile(r"^\d+[.)]\s+")
_BULLET_LIST = re.compile(r"^[\-\*\+]\s+")
_CODE_FENCE = re.compile(r"^```")
_RST_UNDERLINE = re.compile(r'^[=\-~^"]+\s*$')
_PARAGRAPH = re.compile(r"\n\s*\n")

_ABBREVIATIONS = (
    "Dr.", "Mr.", "Mrs.", "Ms.", "Prof.", "Sr.", "Jr.", "etc.", "e.g.",
    "i.e.", "vs.", "cf.", "Jan.", "Feb.", "Mar.", "Apr.", "Jun.", "Jul.",
    "Aug.", "Sep.", "Oct.", "Nov.", "Dec.",
)

_HEADING_MARKERS = ("Chapter", "Section", "Introduction", "Conclusion")

MIN_SENTENCE_LENGTH = 10

# boundary tuple: (position, type, confidence) — context dropped (unused
# by the chunking path)
SENTENCE, PARAGRAPH, HEADING, LIST, CODE_BLOCK = range(5)


def _sentence_boundaries(text: str) -> list[tuple[int, int, float]]:
    out: list[tuple[int, int, float]] = []
    for m in _SENTENCE_END.finditer(text):
        pos = m.start()
        # endswith with an end bound — no O(n) prefix copy per match
        # (the reference slices &text[..position]; same predicate)
        if any(text.endswith(a[:-1], 0, pos) for a in _ABBREVIATIONS):
            continue
        start = out[-1][0] if out else 0
        if pos - start >= MIN_SENTENCE_LENGTH:
            out.append((m.end(), SENTENCE, 0.9))
    return out


def _paragraph_boundaries(text: str) -> list[tuple[int, int, float]]:
    return [(m.end(), PARAGRAPH, 1.0) for m in _PARAGRAPH.finditer(text)]


def _heading_boundaries(text: str) -> list[tuple[int, int, float]]:
    out: list[tuple[int, int, float]] = []
    lines = text.split("\n")
    pos = 0
    for i, line in enumerate(lines):
        t = line.strip()
        if _MD_HEADING.match(line):
            out.append((pos, HEADING, 0.95))
        if i > 0 and _RST_UNDERLINE.match(t):
            prev = lines[i - 1].strip()
            if prev and len(t) >= len(prev):
                out.append((pos, HEADING, 0.9))
        if (
            len(t) > 3
            and all(c.isupper() or c.isspace() or c.isnumeric() for c in t)
            and any(c.isalpha() for c in t)
        ):
            out.append((pos, HEADING, 0.7))
        for marker in _HEADING_MARKERS:
            if t.startswith(marker):
                out.append((pos, HEADING, 0.85))
                break
        pos += len(line) + 1
    return out


def _list_boundaries(text: str) -> list[tuple[int, int, float]]:
    out: list[tuple[int, int, float]] = []
    pos = 0
    in_list = False
    for line in text.split("\n"):
        t = line.strip()
        is_item = bool(_NUMBERED_LIST.match(t) or _BULLET_LIST.match(t))
        if is_item and not in_list:
            out.append((pos, LIST, 0.9))
            in_list = True
        if not is_item and in_list and t:
            out.append((pos, LIST, 0.9))
            in_list = False
        pos += len(line) + 1
    return out


def _code_block_boundaries(text: str) -> list[tuple[int, int, float]]:
    out: list[tuple[int, int, float]] = []
    pos = 0
    in_block = False
    for line in text.split("\n"):
        t = line.strip()
        if _CODE_FENCE.match(t):
            out.append((pos, CODE_BLOCK, 1.0))
            in_block = not in_block
        if not in_block and line.startswith("    ") and t:
            out.append((pos, CODE_BLOCK, 0.7))
        pos += len(line) + 1
    return out


def detect_boundaries(text: str) -> list[tuple[int, int, float]]:
    """→ [(position, type, confidence)] sorted by position, consecutive
    duplicate positions deduped keeping the FIRST (detector order:
    sentence, paragraph, heading, list, code — boundary_detection.rs:131).
    Python's sort is stable, matching Rust's sort_by_key."""
    bounds = (
        _sentence_boundaries(text)
        + _paragraph_boundaries(text)
        + _heading_boundaries(text)
        + _list_boundaries(text)
        + _code_block_boundaries(text)
    )
    bounds.sort(key=lambda b: b[0])
    out: list[tuple[int, int, float]] = []
    for b in bounds:
        if not out or out[-1][0] != b[0]:
            out.append(b)
    return out


# --- coherence scorer (semantic_coherence.rs) ---

MAX_SENTENCES_PER_CHUNK = 20
MIN_SENTENCES_PER_CHUNK = 2
COHERENCE_WINDOW = 3
ADJACENCY_WEIGHT = 0.7


def _scorer_sentences(text: str) -> list[str]:
    """The scorer's own splitter (semantic_coherence.rs:378-414)."""
    out: list[str] = []
    cur: list[str] = []
    n = len(text)
    for i, ch in enumerate(text):
        cur.append(ch)
        if ch in ".!?":
            if i + 1 < n:
                if text[i + 1].isspace():
                    t = "".join(cur).strip()
                    if t and len(t) > 3:
                        out.append(t)
                        cur = []
            else:
                t = "".join(cur).strip()
                if t:
                    out.append(t)
                    cur = []
    t = "".join(cur).strip()
    if t and len(t) > 3:
        out.append(t)
    return out


def _cosine(a: list[float], b: list[float]) -> float:
    dot = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(x * x for x in b) ** 0.5
    if na == 0.0 or nb == 0.0:
        return 0.0
    return max(-1.0, min(1.0, dot / (na * nb)))


def _calculate_coherence(embeddings: list[list[float]]) -> float:
    if len(embeddings) < 2:
        return 1.0
    adj = [
        _cosine(embeddings[i], embeddings[i + 1])
        for i in range(len(embeddings) - 1)
    ]
    adjacent_avg = sum(adj) / len(adj)
    win: list[float] = []
    half = COHERENCE_WINDOW // 2
    for i in range(len(embeddings)):
        lo = max(0, i - half)
        hi = min(i + half + 1, len(embeddings))
        for j in range(lo, hi):
            if i != j:
                win.append(_cosine(embeddings[i], embeddings[j]))
    window_avg = (sum(win) / len(win)) if win else adjacent_avg
    c = ADJACENCY_WEIGHT * adjacent_avg + (1.0 - ADJACENCY_WEIGHT) * window_avg
    return max(0.0, min(1.0, c))


def score_chunk_coherence(text: str, *, dim: int = 64, hash_fn: str = "fast") -> float:
    """semantic_coherence.rs:118-152 with the hash-embedding stand-in."""
    sentences = _scorer_sentences(text)
    if len(sentences) < 2:
        return 1.0
    sentences = sentences[:MAX_SENTENCES_PER_CHUNK]
    embeddings = [sentence_embedding(s, dim, hash_fn) for s in sentences]
    return _calculate_coherence(embeddings)


def _chunks_for_splits(
    text: str, splits: list[int], cache: dict, *, dim: int, hash_fn: str
) -> list[tuple[int, int, float, int]]:
    """→ [(start, end, coherence, n_sentences)] for 0|splits|len(text).
    Span-keyed cache: the greedy loop rescores the same spans many times."""
    bounds = [0] + splits + [len(text)]
    out = []
    for i in range(len(bounds) - 1):
        start, end = bounds[i], bounds[i + 1]
        hit = cache.get((start, end))
        if hit is None:
            piece = text[start:end]
            hit = (
                score_chunk_coherence(piece, dim=dim, hash_fn=hash_fn),
                len(_scorer_sentences(piece)),
            )
            cache[(start, end)] = hit
        out.append((start, end, hit[0], hit[1]))
    return out


def find_optimal_split(
    text: str,
    candidates: list[int],
    *,
    dim: int = 64,
    hash_fn: str = "fast",
    max_iterations: int = 100,
) -> list[tuple[int, int, float, int]]:
    """Greedy mean-coherence maximization (semantic_coherence.rs:214-305).
    → final [(start, end, coherence, n_sentences)]."""
    cache: dict = {}
    if not candidates:
        piece_score = score_chunk_coherence(text, dim=dim, hash_fn=hash_fn)
        return [(0, len(text), piece_score, len(_scorer_sentences(text)))]

    splits: list[int] = []
    for _ in range(max_iterations):
        current = _chunks_for_splits(text, splits, cache, dim=dim, hash_fn=hash_fn)
        best_score = sum(c[2] for c in current) / len(current)
        best_new = None
        for b in candidates:
            if b in splits:
                continue
            test = sorted(splits + [b])
            chunks = _chunks_for_splits(text, test, cache, dim=dim, hash_fn=hash_fn)
            score = sum(c[2] for c in chunks) / len(chunks)
            if score > best_score:
                best_score = score
                best_new = b
        if best_new is None:
            break
        splits = sorted(splits + [best_new])
        # minimum-size validation: every chunk needs ≥2 scorer-sentences
        chunks = _chunks_for_splits(text, splits, cache, dim=dim, hash_fn=hash_fn)
        if any(c[3] < MIN_SENTENCES_PER_CHUNK for c in chunks):
            splits.remove(best_new)
            break
    return _chunks_for_splits(text, splits, cache, dim=dim, hash_fn=hash_fn)


# --- size enforcement (chunking_strategies.rs:438-526) ---

def _split_large(
    content: str, start_offset: int, end_offset: int, max_chars: int
) -> list[tuple[str, int, int]]:
    sentences = [s for s in re.split(r"[.!?]", content) if s.strip()]
    if not sentences:
        # deviation from the reference (:470-526, which returns an empty
        # list here and silently DROPS the chunk): an oversized chunk
        # with no sentence punctuation — punctuation runs, ASCII art —
        # is emitted unsplit rather than losing its span of the document
        return [(content, start_offset, end_offset)]
    out: list[tuple[str, int, int]] = []
    cur = ""
    cur_start = start_offset
    for s in sentences:
        if cur and len(cur) + len(s) > max_chars:
            end = cur_start + len(cur)
            out.append((cur, cur_start, end))
            cur_start = end
            cur = ""
        cur += s + "."
    if cur:
        out.append((cur, cur_start, end_offset))
    return out


def _enforce_sizes(
    chunks: list[tuple[str, int, int]], max_chars: int, min_chars: int
) -> list[tuple[str, int, int]]:
    result: list[tuple[str, int, int]] = []
    for content, start, end in chunks:
        if len(content) > max_chars:
            result.extend(_split_large(content, start, end, max_chars))
        elif len(content) < min_chars and result:
            pc, ps, _pe = result.pop()
            result.append((pc + " " + content, ps, end))
        else:
            result.append((content, start, end))
    return result


def boundary_aware_chunk_text(
    text: str,
    *,
    max_chunk_chars: int = 2000,
    min_chunk_chars: int = 200,
    dim: int = 64,
    hash_fn: str = "fast",
) -> list[tuple[int, str, int, int]]:
    """BAR-RAG boundary-aware chunking (chunking_strategies.rs:324-371
    chunk_async) → [(idx, content, start_offset, end_offset)].

    Split candidates are Paragraph/Heading/CodeBlock boundary positions;
    the greedy coherence search picks the subset that maximizes mean chunk
    coherence; size constraints are enforced last. Offsets are TRUE source
    offsets except inside re-split oversized chunks (cumulative, the
    reference's split_large_chunk bookkeeping)."""
    if not text:
        return []
    candidates = [
        p for p, t, _c in detect_boundaries(text) if t in (PARAGRAPH, HEADING, CODE_BLOCK)
    ]
    # drop degenerate edge positions: a split at 0/len produces an empty
    # chunk (the reference's create_chunks would score an empty string)
    candidates = [p for p in candidates if 0 < p < len(text)]
    scored = find_optimal_split(text, candidates, dim=dim, hash_fn=hash_fn)
    chunks = [(text[s:e], s, e) for s, e, _score, _n in scored]
    sized = _enforce_sizes(chunks, max_chunk_chars, min_chunk_chars)
    return [(i, c, s, e) for i, (c, s, e) in enumerate(sized)]
