"""Late-chunking kernel helpers (text/late_chunking.rs).

Late Chunking (Jina AI, 2024) embeds the WHOLE document in one forward
pass and pools per-chunk span representations, so each chunk's embedding
sees full-document context. The strategy side — precise spans, relative
positions, and context-window sectioning — is pure text bookkeeping,
transcribed here; the embedding forward pass is a pluggable provider
(surveyed out of scope, SURVEY §7 / S7).

Semantics transcribed:
- 1 token ≈ 4 chars estimate (late_chunking.rs:136-139);
- fits_in_context ⇔ estimated tokens ≤ max_doc_tokens (:142-144);
- split_into_sections (:147-172): greedy paragraph (\\n\\n) grouping into
  sections each under max_doc_tokens·4 chars, sections trimmed;
- chunk spans (:168-213): HierarchicalChunker(min_size=50) raw chunks,
  cumulative offsets, whitespace-only chunks consume offset but emit
  nothing, position_in_document = start / max(len(text), 1).
"""

from __future__ import annotations

from graphrag_rs_spark.kernel.hierarchical import chunk_text_hierarchical


def estimate_tokens(text: str) -> int:
    return len(text) // 4


def fits_in_context(text: str, max_doc_tokens: int = 8192) -> bool:
    return estimate_tokens(text) <= max_doc_tokens


def split_into_sections(text: str, max_doc_tokens: int = 8192) -> list[str]:
    """Greedy paragraph grouping under the context window (:147-172)."""
    if fits_in_context(text, max_doc_tokens):
        return [text]
    max_chars = max_doc_tokens * 4
    sections: list[str] = []
    cur = ""
    for paragraph in text.split("\n\n"):
        needed = len(cur) + (0 if not cur else 2) + len(paragraph)
        if needed > max_chars and cur:
            sections.append(cur.strip())
            cur = ""
        if cur:
            cur += "\n\n"
        cur += paragraph
    if cur.strip():
        sections.append(cur.strip())
    return sections


def late_chunk_text(
    text: str,
    chunk_size: int = 512,
    overlap: int = 64,
    max_doc_tokens: int = 8192,
) -> list[tuple[int, int, str, int, int, float]]:
    """→ [(seq, section_id, content, start, end, position)] — spans and
    positions are SECTION-relative (each section is one attention
    context; the reference applies chunk() per section when a document
    exceeds the window)."""
    out: list[tuple[int, int, str, int, int, float]] = []
    seq = 0
    for section_id, section in enumerate(split_into_sections(text, max_doc_tokens)):
        doc_len = max(len(section), 1)
        for _idx, content, start, end in chunk_text_hierarchical(
            section, chunk_size, overlap, min_chunk_size=50
        ):
            out.append(
                (seq, section_id, content, start, end, start / doc_len)
            )
            seq += 1
    return out
