"""Chunker spec tests mirroring the reference's inline tests
(text/mod.rs:566-645, tests/text_pipeline_fixtures.rs:92-104)."""

from graphrag_rs_spark.kernel.chunking import chunk_text


def test_empty_and_whitespace():
    assert chunk_text("") == []
    assert chunk_text("   \n\t  ") == []


def test_short_text_single_chunk():
    chunks = chunk_text("Hello world.", 512, 64)
    assert len(chunks) == 1
    idx, content, start, end = chunks[0]
    assert (idx, content, start, end) == (0, "Hello world.", 0, 12)


def test_chunk_size_bound():
    text = "word " * 1000
    for _, content, _, _ in chunk_text(text, 512, 64):
        assert len(content) <= 512


def test_sentence_boundary_preference():
    # a sentence ending inside the LAST 200 chars of the window wins
    # (text/mod.rs:300-305 searches only the window tail)
    text = ("a" * 400) + ". " + ("b" * 400)
    chunks = chunk_text(text, 512, 64)
    # first chunk should end right after the period (position 401)
    assert chunks[0][1].endswith(".")
    assert chunks[0][3] == 401


def test_sentence_boundary_outside_tail_ignored():
    # a period before the 200-char tail is NOT used; falls back to word/char
    text = ("a" * 300) + ". " + ("b" * 400)  # period at 300, window [0,512)
    chunks = chunk_text(text, 512, 64)
    # tail [312,512) is all 'b' — no sentence or word boundary → hard cut,
    # except the space at 301 is also outside the 50-char word window
    assert chunks[0][3] == 512


def test_overlap_and_coverage():
    text = ("x" * 100 + " ") * 30  # 3030 chars, only word boundaries
    chunks = chunk_text(text, 512, 64)
    assert len(chunks) > 1
    # every consecutive pair overlaps by >= 0 and starts before previous end
    for (_, _, s1, e1), (_, _, s2, _) in zip(chunks, chunks[1:]):
        assert s2 <= e1
        assert s2 > s1
    # full coverage: last chunk reaches end of text
    assert chunks[-1][3] == len(text)


def test_offsets_slice_back():
    text = "First sentence. Second sentence! Third sentence? " * 50
    for _, content, start, end in chunk_text(text, 256, 32):
        assert text[start:end] == content


def test_indices_sequential():
    text = "Some sentence here. " * 200
    idxs = [i for i, _, _, _ in chunk_text(text, 512, 64)]
    assert idxs == list(range(len(idxs)))
