"""C6 remainder: boundary-aware (BAR-RAG) + late chunking strategies.

Boundary-detector cases mirror the reference's own unit tests
(text/boundary_detection.rs:420-503); greedy-coherence and size-
enforcement cases pin the chunking_strategies.rs/semantic_coherence.rs
rules with the deterministic hash-embedding provider stand-in."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.kernel.boundary import (
    CODE_BLOCK,
    HEADING,
    LIST,
    PARAGRAPH,
    SENTENCE,
    _enforce_sizes,
    _scorer_sentences,
    _sentence_boundaries,
    boundary_aware_chunk_text,
    detect_boundaries,
    find_optimal_split,
    score_chunk_coherence,
)
from graphrag_rs_spark.kernel.late import (
    estimate_tokens,
    fits_in_context,
    late_chunk_text,
    split_into_sections,
)


# --- boundary detection (reference test literals) ---

def test_abbreviation_handling():
    # boundary_detection.rs:425-433 — only the real sentence end fires
    text = "Dr. Smith went to the store. He bought milk."
    assert len(_sentence_boundaries(text)) == 1


def test_paragraph_detection():
    # boundary_detection.rs:436-444 tests the paragraph detector directly
    from graphrag_rs_spark.kernel.boundary import _paragraph_boundaries

    text = "First paragraph.\n\nSecond paragraph.\n\nThird paragraph."
    assert len(_paragraph_boundaries(text)) == 2


def test_markdown_heading_detection():
    # boundary_detection.rs:446-457 tests the heading detector directly
    from graphrag_rs_spark.kernel.boundary import _heading_boundaries

    text = "# Main Heading\n\n## Subheading\n\n### Sub-subheading"
    assert len(_heading_boundaries(text)) >= 3


def test_dedup_keeps_first_detector_type():
    """Reference quirk (boundary_detection.rs:154-156): detectors append
    in order sentence→paragraph→heading and same-position duplicates keep
    the FIRST — so a paragraph break right after sentence punctuation is
    typed Sentence and a heading right after a paragraph break is typed
    Paragraph. Split candidates (Paragraph/Heading/CodeBlock) vanish at
    those positions."""
    text = "First paragraph.\n\nSecond paragraph."
    bounds = detect_boundaries(text)
    pos = text.find("Second")
    typed = [t for p, t, _c in bounds if p == pos]
    assert typed == [SENTENCE]  # paragraph boundary swallowed

    text2 = "# Main Heading\n\n## Subheading"
    pos2 = text2.find("## ")
    typed2 = [t for p, t, _c in detect_boundaries(text2) if p == pos2]
    assert typed2 == [PARAGRAPH]  # heading swallowed by paragraph


def test_list_detection():
    text = "Regular text\n- Item 1\n- Item 2\n* Item 3\nMore text"
    lists = [b for b in detect_boundaries(text) if b[1] == LIST]
    assert len(lists) == 2  # start + end transitions


def test_code_block_detection():
    text = "Some text\n```python\ncode here\n```\nMore text"
    code = [b for b in detect_boundaries(text) if b[1] == CODE_BLOCK]
    assert len(code) == 2


def test_boundaries_sorted_and_deduped():
    text = "# HEADING ONE\n\nBody sentence one here. Body sentence two here.\n\n- item\n"
    bounds = detect_boundaries(text)
    positions = [b[0] for b in bounds]
    assert positions == sorted(positions)
    assert len(positions) == len(set(positions))  # dedup kept first per pos


def test_sentence_min_length_gate():
    # short fragments (<10 chars since last boundary) are not boundaries
    assert _sentence_boundaries("Hi. Go. Stop now please. ") != []
    assert len(_sentence_boundaries("Hi. Go. ")) == 0


# --- coherence scorer ---

def test_single_sentence_is_perfectly_coherent():
    assert score_chunk_coherence("One lone sentence without an end") == 1.0


def test_scorer_sentence_splitter_quirks():
    # fragments ≤3 chars are NOT flushed (they stay in the buffer and
    # merge into the next sentence — semantic_coherence.rs:389-397 only
    # clears current_sentence when it pushes); a punctuation-terminated
    # fragment at end-of-text is kept regardless of length
    assert _scorer_sentences("Hi. A much longer sentence here. Ok.") == [
        "Hi. A much longer sentence here.",
        "Ok.",
    ]
    # unterminated trailing fragment needs len > 3
    assert _scorer_sentences("A full sentence. abc") == ["A full sentence."]
    assert _scorer_sentences("A full sentence. abcd") == [
        "A full sentence.",
        "abcd",
    ]


def test_repeated_sentences_score_higher_than_mixed():
    same = "Alpha beta gamma delta. Alpha beta gamma delta. Alpha beta gamma delta."
    mixed = "Alpha beta gamma delta. Quux zork frobnicate mumble. Red green blue yellow."
    assert score_chunk_coherence(same) > score_chunk_coherence(mixed)


# --- greedy optimal split ---

# para A ends UNPUNCTUATED: a paragraph break right after sentence
# punctuation is typed Sentence by the dedup quirk and would not be a
# split candidate (see test_dedup_keeps_first_detector_type)
A = (
    "Alpha beta gamma delta epsilon. Alpha beta gamma delta epsilon. "
    "Alpha beta gamma delta epsilon"
)
B = (
    "Zork quux frobnicate mumble xyzzy. Zork quux frobnicate mumble xyzzy. "
    "Zork quux frobnicate mumble xyzzy."
)


def test_greedy_split_picks_topic_boundary():
    text = A + "\n\n" + B
    split_pos = text.find("\n\n") + 2
    chunks = boundary_aware_chunk_text(text, min_chunk_chars=10)
    assert len(chunks) == 2
    assert chunks[0][2] == 0 and chunks[0][3] == split_pos
    assert chunks[1][2] == split_pos and chunks[1][3] == len(text)
    assert chunks[0][1] + chunks[1][1] == text  # true source spans


def test_min_sentence_validation_blocks_split():
    # second paragraph has ONE scorer-sentence → a split would create a
    # <2-sentence chunk → validation pops it and stops (single chunk out)
    text = A + "\n\nLone closer sentence here."
    chunks = boundary_aware_chunk_text(text, min_chunk_chars=10)
    assert len(chunks) == 1
    assert chunks[0][1] == text


def test_no_candidates_single_chunk():
    text = "Only one paragraph of text. With two sentences inside."
    chunks = boundary_aware_chunk_text(text, min_chunk_chars=10)
    assert len(chunks) == 1


# --- size enforcement ---

def test_enforce_merges_small_into_previous():
    out = _enforce_sizes(
        [("x" * 250, 0, 250), ("tiny", 250, 254)], max_chars=2000, min_chars=200
    )
    assert len(out) == 1
    assert out[0] == ("x" * 250 + " tiny", 0, 254)


def test_enforce_splits_large_at_sentences():
    content = ("Word one two three four five. " * 20).strip()  # 599 chars
    out = _enforce_sizes([(content, 0, len(content))], max_chars=200, min_chars=10)
    assert len(out) > 1
    assert all(len(c) <= 200 + 40 for c, _s, _e in out)
    # cumulative offsets: each piece starts where the previous ended
    for (c1, s1, e1), (_c2, s2, _e2) in zip(out, out[1:]):
        assert s2 == e1
    assert out[-1][2] == len(content)  # last inherits parent end (quirk)


# --- late chunking kernel ---

def test_estimate_tokens_literals():
    # late_chunking.rs:129-131
    assert estimate_tokens("a" * 400) == 100
    assert estimate_tokens("") == 0


def test_fits_in_context():
    assert fits_in_context("tiny", 8192)
    assert not fits_in_context("x" * 100, 20)


def test_split_into_sections_short_doc_identity():
    text = "Paragraph one.\n\nParagraph two."
    assert split_into_sections(text, 8192) == [text]


def test_split_into_sections_long_doc():
    paras = [f"Paragraph {i} " + "pad " * 30 for i in range(6)]
    text = "\n\n".join(paras)
    max_tokens = 60  # 240 chars per section
    sections = split_into_sections(text, max_tokens)
    assert len(sections) > 1
    assert all(len(s) <= max_tokens * 4 for s in sections)
    combined = "\n\n".join(sections)
    for i in range(6):
        assert f"Paragraph {i}" in combined


def test_late_chunk_positions_section_relative():
    para = ("Sentence number one for padding. " * 5).strip()  # ~165 chars
    text = "\n\n".join([para] * 8)
    out = late_chunk_text(text, chunk_size=100, overlap=10, max_doc_tokens=100)
    assert len(out) > 2
    sections = {sec for _q, sec, *_ in out}
    assert len(sections) > 1  # forced sectioning at 400 chars
    seqs = [q for q, *_ in out]
    assert seqs == list(range(len(out)))
    for _q, _sec, content, start, end, pos in out:
        assert 0.0 <= pos < 1.0
        assert end - start == len(content)


# --- Spark operators ---

@pytest.fixture(scope="module")
def docs_df(spark):
    text = A + "\n\n" + B
    return spark.createDataFrame(
        [("d1", text), ("d2", "Short single paragraph. Two sentences in it.")],
        ["doc_id", "content"],
    )


def test_chunk_documents_boundary_strategy(spark, docs_df):
    from graphrag_rs_spark.config import PipelineConfig
    from graphrag_rs_spark.operators.chunking import chunk_documents

    rows = (
        chunk_documents(
            docs_df,
            PipelineConfig(boundary_min_chunk_chars=10),
            strategy="boundary",
        )
        .orderBy("chunk_id")
        .collect()
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc["d1"]) == 2
    assert len(by_doc["d2"]) == 1
    assert by_doc["d1"][0]["chunk_id"] == "d1_0"
    got = "".join(r["content"] for r in by_doc["d1"])
    assert got == A + "\n\n" + B


def test_late_chunk_documents_operator(spark):
    from graphrag_rs_spark.config import PipelineConfig
    from graphrag_rs_spark.operators.chunking import late_chunk_documents

    para = ("Sentence number one for padding. " * 5).strip()
    text = "\n\n".join([para] * 8)
    df = spark.createDataFrame([("d1", text)], ["doc_id", "content"])
    rows = late_chunk_documents(
        df, PipelineConfig(late_chunk_size=100, late_chunk_overlap=10,
                           late_max_doc_tokens=100)
    ).orderBy("chunk_id").collect()
    assert rows
    assert all(r["chunk_id"].startswith("d1_lc_") for r in rows)
    assert len({r["section_id"] for r in rows}) > 1
    assert all(0.0 <= r["position_in_document"] < 1.0 for r in rows)
