"""Property-based tests (hypothesis) over the pure-Python kernels — no
SparkSession needed, so these run in milliseconds and fuzz the invariants
the golden tests can't enumerate."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from graphrag_rs_spark.kernel.chunking import chunk_text
from graphrag_rs_spark.kernel.linking import (
    jaro_winkler_similarity,
    normalize_string,
    soundex,
)
from graphrag_rs_spark.kernel.semantic import semantic_chunk_text, split_sentences

text_st = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "Zs"), include_characters=".!? \n"
    ),
    max_size=3000,
)


@given(text_st, st.integers(64, 600), st.integers(0, 63))
@settings(max_examples=150, deadline=None)
def test_chunk_text_invariants(text, chunk_size, overlap):
    chunks = chunk_text(text, chunk_size, overlap)
    n = len(text)
    prev_start = -1
    for i, (idx, content, start, end) in enumerate(chunks):
        assert 0 <= start < end <= n
        assert content == text[start:end]
        assert content.strip()                      # whitespace-only dropped
        assert end - start <= chunk_size
        assert start > prev_start                   # strictly advancing
        prev_start = start
    assert [c[0] for c in chunks] == list(range(len(chunks)))  # dense ids
    # every non-space char of the text is covered by at least one chunk
    covered = [False] * n
    for _, _, s, e in chunks:
        for k in range(s, e):
            covered[k] = True
    for k, ch in enumerate(text):
        if not ch.isspace() and not covered[k]:
            # only permissible when the char sits in a whitespace-only
            # region that the chunker dropped entirely
            assert not text[k:].strip() or not text[: k + 1].strip() or False, (
                f"uncovered non-space char at {k}"
            )


@given(text_st)
@settings(max_examples=100, deadline=None)
def test_split_sentences_invariants(text):
    sents = split_sentences(text)
    for s in sents:
        assert s == s.strip() and s != ""


@given(text_st)
@settings(max_examples=50, deadline=None)
def test_semantic_chunk_coverage(text):
    out = semantic_chunk_text(text, strategy="absolute", threshold_amount=2.0)
    sents = split_sentences(text)
    if sents:
        # threshold 2.0 → no breakpoints → one chunk covering all sentences
        # (unless max splits, not set here)
        assert sum(c[3] - c[2] for c in out) == len(sents)
        assert [c[0] for c in out] == list(range(len(out)))
    else:
        assert out == []


@given(st.text(max_size=40), st.text(max_size=40))
@settings(max_examples=300, deadline=None)
def test_jaro_winkler_properties(a, b):
    s = jaro_winkler_similarity(a, b)
    assert 0.0 <= s <= 1.0
    assert s == jaro_winkler_similarity(b, a)       # symmetric
    if a == b and a:
        assert s == 1.0


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=30))
@settings(max_examples=200, deadline=None)
def test_soundex_shape(word):
    # the kernel is a pinned reference transcription: it keys off the FIRST
    # CHARACTER (kept only if alphabetic), pads to 4 with zeros
    code = soundex(word)
    if not word:
        assert code == ""
    else:
        assert len(code) == 4
        if word[0].isalpha():
            assert code[0] == word[0].upper()
            assert all(c.isdigit() for c in code[1:])
        else:
            assert all(c.isdigit() for c in code)


@given(st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent(s):
    once = normalize_string(s)
    assert normalize_string(once) == once
    assert once == once.strip()


# --- C6 boundary-aware chunker invariants ---

@given(text_st)
@settings(max_examples=40, deadline=None)
def test_boundary_chunks_partition_text(text):
    from graphrag_rs_spark.kernel.boundary import boundary_aware_chunk_text

    chunks = boundary_aware_chunk_text(text, min_chunk_chars=10)
    if not text:
        assert chunks == []
        return
    assert chunks, "non-empty text must yield at least one chunk"
    # indices sequential; before size-enforcement rewrites, spans cover
    # the text in order — after merging/splitting, content is non-empty
    # and offsets are monotonic with end >= start
    assert [c[0] for c in chunks] == list(range(len(chunks)))
    for _i, content, s, e in chunks:
        assert content
        assert 0 <= s <= e
    for (_, _, _, e1), (_, _, s2, _) in zip(chunks, chunks[1:]):
        assert s2 >= e1 - 1  # merged chunks may share the boundary char


@given(text_st)
@settings(max_examples=40, deadline=None)
def test_boundary_chunking_deterministic(text):
    from graphrag_rs_spark.kernel.boundary import boundary_aware_chunk_text

    assert boundary_aware_chunk_text(text, min_chunk_chars=10) == (
        boundary_aware_chunk_text(text, min_chunk_chars=10)
    )


@given(text_st, st.integers(20, 200))
@settings(max_examples=40, deadline=None)
def test_late_chunk_invariants(text, max_tokens):
    from graphrag_rs_spark.kernel.late import late_chunk_text, split_into_sections

    sections = split_into_sections(text, max_tokens)
    assert all(sec.strip() for sec in sections) or sections == [text]
    out = late_chunk_text(text, 100, 10, max_tokens)
    seqs = [q for q, *_ in out]
    assert seqs == list(range(len(out)))
    for _q, sec, content, start, end, pos in out:
        assert end - start == len(content)
        assert 0.0 <= pos < 1.0
        assert sec >= 0


# --- media codec round trips ---

@given(
    st.integers(1, 12), st.integers(1, 12),
    st.sampled_from([1, 2, 3, 4]), st.integers(0, 2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_encode_decode_roundtrip(w, h, channels, seed):
    import numpy as np

    from graphrag_rs_spark.kernel.media import decode_png, encode_png

    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert (decode_png(encode_png(px)) == px).all()


@given(st.integers(1, 500), st.sampled_from([8000, 16000, 44100]))
@settings(max_examples=40, deadline=None)
def test_wav_duration_roundtrip(duration_ms, rate):
    from graphrag_rs_spark.kernel.media import decode_wav
    from graphrag_rs_spark.operators.multimodal import decode_wav_header, make_wav

    wav = make_wav(duration_ms, sample_rate=rate)
    decoded = decode_wav(wav)
    assert decoded is not None
    got_rate, samples = decoded
    assert got_rate == rate
    assert len(samples) == rate * duration_ms // 1000
    # header-only probe agrees with the full decode
    assert decode_wav_header(wav) == len(samples) * 1000 // rate
