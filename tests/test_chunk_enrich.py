"""C5 semantic chunker + C6 chunk enricher."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphrag_rs_spark.kernel.semantic import (
    determine_breakpoints,
    semantic_chunk_text,
    split_sentences,
)


def test_split_sentences_reference_literal():
    # reference's own test text (semantic_chunking.rs tests)
    text = "This is sentence one. This is sentence two! Is this sentence three?"
    assert split_sentences(text) == [
        "This is sentence one.",
        "This is sentence two!",
        "Is this sentence three?",
    ]


def test_split_sentences_blank_lines_and_carry():
    text = "Line one no punct\ncontinues here.\n\nNext para."
    assert split_sentences(text) == ["Line one no punct continues here.", "Next para."]


def test_single_sentence_passthrough():
    out = semantic_chunk_text("Just one sentence.")
    assert out == [(0, "Just one sentence.", 0, 1)]


def test_breakpoint_strategies():
    diffs = [0.1, 0.2, 0.9, 0.15]
    # absolute: > 0.5 → breakpoint after index 2
    assert determine_breakpoints(diffs, "absolute", 0.5) == [3]
    # percentile 95 over 4 values: sorted[min(3,3)] = 0.9 → diff > 0.9 never
    assert determine_breakpoints(diffs, "percentile", 95.0) == []
    # percentile 50: sorted[2] = 0.2 → diffs 0.9 breaks
    assert determine_breakpoints(diffs, "percentile", 50.0) == [3]
    # stddev 0 → threshold = mean (0.3375): 0.9 breaks
    assert determine_breakpoints(diffs, "stddev", 0.0) == [3]


def test_min_chunk_merges_forward():
    # absolute threshold 0: every inter-sentence diff (>0 for distinct
    # hash embeddings) is a breakpoint → all-singleton segments; with
    # min_chunk_size=2 the reference quirk merges each short segment into
    # the following one → pairs
    text = "Alpha one. Totally different two. Unrelated three. Final four."
    out = semantic_chunk_text(
        text, strategy="absolute", threshold_amount=0.0, min_chunk_size=2
    )
    assert [(c[2], c[3]) for c in out] == [(0, 2), (2, 4)]


def test_max_chunk_splits():
    text = "One. Two. Three. Four. Five."
    # threshold 2.0: no diff exceeds it (1-cos ≤ 2) → one segment of 5,
    # max 2 → pieces of 2,2,1
    out = semantic_chunk_text(
        text, strategy="absolute", threshold_amount=2.0, max_chunk_size=2
    )
    assert [(c[2], c[3]) for c in out] == [(0, 2), (2, 4), (4, 5)]
    assert out[0][1] == "One. Two."


def test_semantic_chunker_deterministic():
    text = "Dogs bark loudly. Cats meow often. Stocks fell today. Bonds rallied."
    a = semantic_chunk_text(text, strategy="percentile", threshold_amount=50.0)
    b = semantic_chunk_text(text, strategy="percentile", threshold_amount=50.0)
    assert a == b
    assert sum(c[3] - c[2] for c in a) == 4  # covers all sentences


def test_chunk_documents_semantic_strategy(spark):
    from graphrag_rs_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [("d1", "First thought here. Second thought there. Third idea now.")],
        ["doc_id", "content"],
    )
    chunks = chunk_documents(docs, strategy="semantic").collect()
    assert len(chunks) >= 1
    assert all(r["chunk_id"].startswith("d1_") for r in chunks)
    # offsets carry sentence indices for the semantic strategy
    assert max(r["end_offset"] for r in chunks) == 3


MD_DOC = (
    "# Chapter One\n"
    "Intro text for the chapter, long enough to matter here.\n"
    "## Section A\n"
    "Body of section A. It talks about alpha topics and alpha things. "
    "It keeps talking for quite a while so the summary kicks in properly, "
    "adding more and more alpha-flavored content to cross the threshold.\n"
    "### Sub A1\n"
    "Subsection body mentioning beta.\n"
    "## Section B\n"
    "Short b body.\n"
)


def test_enrich_chunks_heading_path_and_metadata(spark):
    from graphrag_rs_spark.operators.enrich import enrich_chunks, extract_headings

    docs = spark.createDataFrame([("d1", MD_DOC)], ["doc_id", "content"])
    heads = {(r["level"], r["title"]): r["offset"] for r in extract_headings(docs).collect()}
    assert (1, "Chapter One") in heads and (2, "Section A") in heads
    assert (3, "Sub A1") in heads and (2, "Section B") in heads

    sec_a_off = heads[(2, "Section A")]
    sub_off = heads[(3, "Sub A1")]
    sec_b_off = heads[(2, "Section B")]
    chunks = spark.createDataFrame(
        [
            ("c0", "d1", MD_DOC[14:sec_a_off], 14, sec_a_off),      # chapter intro
            ("c1", "d1", MD_DOC[sec_a_off:sub_off], sec_a_off, sub_off),  # section A body
            ("c2", "d1", MD_DOC[sec_b_off:], sec_b_off, len(MD_DOC)),     # section B
        ],
        ["chunk_id", "doc_id", "content", "start_offset", "end_offset"],
    )
    out = {r["chunk_id"]: r for r in enrich_chunks(chunks, docs).collect()}

    assert out["c0"]["chapter"] == "Chapter One"
    assert out["c0"]["section"] is None
    assert out["c1"]["chapter"] == "Chapter One"
    assert out["c1"]["section"] == "Section A"
    assert out["c2"]["section"] == "Section B"
    assert out["c2"]["subsection"] is None  # Sub A1 precedes Section B

    # keywords: top-k tf-idf terms of the chunk, "alpha" should surface
    assert "alpha" in out["c1"]["keywords"]
    # summary only for chunks > 150 chars
    assert out["c1"]["summary"] is not None
    assert len(out["c1"]["summary"]) <= 150
    assert out["c2"]["summary"] is None
    # position in [0, 1), increasing with offset
    assert 0.0 < out["c0"]["position_in_document"] < out["c2"]["position_in_document"] < 1.0


def test_extract_headings_html(spark):
    from graphrag_rs_spark.operators.enrich import extract_headings

    html = "<html><body><h1 class='t'>Chapter 1</h1>\n<p>x</p>\n<h2>Section <b>1.1</b></h2></body></html>"
    docs = spark.createDataFrame([("d1", html)], ["doc_id", "content"])
    got = {(r["level"], r["title"]): r["offset"]
           for r in extract_headings(docs, fmt="html").collect()}
    assert (1, "Chapter 1") in got
    assert (2, "Section 1.1") in got          # inner tags stripped
    assert got[(1, "Chapter 1")] == html.index("<h1")


def test_extract_headings_plaintext(spark):
    from graphrag_rs_spark.operators.enrich import extract_headings

    txt = (
        "My Chapter\n"
        "==========\n"
        "body text here\n"
        "A Section Title\n"
        "---------------\n"
        "more body\n"
        "SHORT CAPS\n"
        "THIS IS A MEDIUM LENGTH CAPS LINE\n"
        "lower case line\n"
    )
    docs = spark.createDataFrame([("d1", txt)], ["doc_id", "content"])
    got = {(r["level"], r["title"]) for r in extract_headings(docs, fmt="plaintext").collect()}
    assert (1, "My Chapter") in got            # === underline
    assert (2, "A Section Title") in got       # --- underline
    assert (1, "SHORT CAPS") in got            # ALL CAPS < 20 chars
    assert (2, "THIS IS A MEDIUM LENGTH CAPS LINE") in got
    assert all(t != "lower case line" for _, t in got)
