"""C2/C3: hierarchical (recursive-separator) chunker — behavioral spec.

Transcribed from ``HierarchicalChunker::chunk_text``
(/root/reference/graphrag-core/src/text/chunking.rs:48-152) and the
``chunk_text_hierarchical`` wrapper (text/mod.rs:106-138):

- separator priority: "\\n\\n", "\\n", ". ", "! ", "? ", "; ", ": ", " ", ""
  (chunking.rs:17-28)
- the chosen boundary must exceed ¼ of the window (chunking.rs:119)
- chunks whose trimmed length < min_chunk_size (default 50) are DROPPED
  (chunking.rs:63,79)
- next start = end - overlap, snapped backward to a word boundary
  (chunking.rs:88-98)
- wrapper quirk preserved: offsets are CUMULATIVE CHUNK LENGTHS, not true
  source positions (text/mod.rs:113-121) — because dropped-short and
  overlapped regions are not accounted, start/end drift from the source;
  golden parity requires reproducing that drift.

Deviation (documented): the reference has no forward-progress guard — a
pathological window could make ``next_start <= start`` and loop forever;
we clamp to ``start + 1``. Unreachable on text where some separator exists
past the ¼ mark, so parity is unaffected on real corpora.
"""

from __future__ import annotations

SEPARATORS = ("\n\n", "\n", ". ", "! ", "? ", "; ", ": ", " ")


def _word_boundary_backward(text: str, pos: int) -> int:
    while pos > 0:
        if pos - 1 < len(text) and text[pos - 1].isspace():
            return pos
        pos -= 1
    return pos


def _find_optimal_boundary(text: str, start: int, max_end: int) -> int:
    window = text[start:max_end]
    for sep in SEPARATORS:
        sep_pos = window.rfind(sep)
        if sep_pos != -1:
            boundary = start + sep_pos + len(sep)
            if boundary > start + (max_end - start) // 4:
                return boundary
    return _word_boundary_backward(text, max_end)


def chunk_text_hierarchical_raw(
    text: str, chunk_size: int = 512, overlap: int = 64, min_chunk_size: int = 50
) -> list[str]:
    """The raw splitter (chunking.rs:48-102): returns chunk strings."""
    chunks: list[str] = []
    start = 0
    n = len(text)
    while start < n:
        end = min(start + chunk_size, n)
        if end >= n:
            chunk = text[start:]
            if len(chunk.strip()) >= min_chunk_size:
                chunks.append(chunk)
            break
        optimal = _find_optimal_boundary(text, start, end)
        if optimal > start:
            end = optimal
        chunk = text[start:end]
        if len(chunk.strip()) >= min_chunk_size:
            chunks.append(chunk)
        if end >= n:
            break
        next_start = max(end - overlap, 0)
        next_start = _word_boundary_backward(text, next_start)
        start = max(next_start, start + 1)  # forward-progress guard (deviation)
    return chunks


def chunk_text_hierarchical(
    text: str, chunk_size: int = 512, overlap: int = 64, min_chunk_size: int = 50
) -> list[tuple[int, str, int, int]]:
    """The wrapper (text/mod.rs:106-138): assigns indices and CUMULATIVE
    offsets; whitespace-only chunks consume offset but no index."""
    out = []
    counter = 0
    current_pos = 0
    for chunk in chunk_text_hierarchical_raw(text, chunk_size, overlap, min_chunk_size):
        if chunk.strip():
            start = current_pos
            end = start + len(chunk)
            current_pos += len(chunk)
            out.append((counter, chunk, start, end))
            counter += 1
        else:
            current_pos += len(chunk)
    return out
