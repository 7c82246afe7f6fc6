"""Sliding-window chunker with sentence/word boundary preference.

Behavioral spec of the reference's default (legacy) chunker
``TextProcessor::chunk_text`` (/root/reference/graphrag-core/src/text/mod.rs:141-186):

- window: ``end = min(start + chunk_size, len)``
- if not at end-of-text, prefer the last sentence boundary (``. ! ?``
  followed by whitespace/end) within the final 200 chars of the window
  (text/mod.rs:284-327); else the last space within the final 50 chars
  (text/mod.rs:330-346); else cut at ``end``
- whitespace-only chunks are dropped (and do not consume a chunk index)
- next window: ``start = max(start + 1, actual_end - overlap)``
  (text/mod.rs:174-182)
- chunk ids are assigned by the caller as ``{doc_id}_{idx}`` (text/mod.rs:161)
"""

from __future__ import annotations

_SENTENCE_ENDINGS = frozenset(".!?")


def _find_sentence_boundary(text: str, start: int, end: int) -> int | None:
    """Last sentence end in the final 200 chars of text[start:end], else word boundary."""
    if start >= end:
        return None
    window = text[start:end]
    search_start = max(len(window) - 200, 0)
    search_text = window[search_start:]

    last_boundary = None
    for i, ch in enumerate(search_text):
        if ch in _SENTENCE_ENDINGS:
            next_pos = i + 1
            if next_pos >= len(search_text) or search_text[next_pos].isspace():
                last_boundary = start + search_start + next_pos
    if last_boundary is not None:
        return last_boundary
    return _find_word_boundary(text, start, end)


def _find_word_boundary(text: str, start: int, end: int) -> int | None:
    """Last space in the final 50 chars of text[start:end]."""
    if start >= end:
        return None
    window = text[start:end]
    search_start = max(len(window) - 50, 0)
    pos = window[search_start:].rfind(" ")
    if pos == -1:
        return None
    return start + search_start + pos


def chunk_text(
    text: str, chunk_size: int = 512, overlap: int = 64
) -> list[tuple[int, str, int, int]]:
    """Chunk ``text`` into overlapping windows.

    Returns ``[(chunk_idx, content, start_offset, end_offset)]`` with offsets
    into ``text`` (end exclusive). Deterministic pure function — safe to run
    per-row on any executor.
    """
    if not text:
        return []
    chunks: list[tuple[int, str, int, int]] = []
    n = len(text)
    start = 0
    counter = 0
    while start < n:
        end = min(start + chunk_size, n)
        if end < n:
            boundary = _find_sentence_boundary(text, start, end)
            actual_end = boundary if boundary is not None else end
        else:
            actual_end = end

        content = text[start:actual_end]
        if content.strip():
            chunks.append((counter, content, start, actual_end))
            counter += 1

        if actual_end >= n:
            break
        overlap_start = max(actual_end - overlap, 0)
        start = max(start + 1, overlap_start)
    return chunks
