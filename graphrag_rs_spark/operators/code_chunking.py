"""C4: code-aware chunking — per-``lang`` dispatch over the source corpus.

Reference: RustCodeChunkingStrategy (text/chunking_strategies.rs:145-255)
parses with tree-sitter and chunks at item boundaries
(function/impl/struct/enum/mod/trait), min-size filtered, falling back to
a single chunk. tree-sitter isn't available in this container, so the
boundary detector is a regex item-splitter with the same boundary set —
the Spark-side contract (per-lang dispatch, chunk schema, batching) is the
real thing and a tree-sitter-backed splitter drops straight in.

Dispatch is data-driven: rows are routed on the ``lang`` column inside one
``mapInPandas`` pass (no per-lang job), so a mixed-language corpus is one
scan, and the text fallback (kernel C1) covers everything else.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from graphrag_rs_spark.config import DEFAULT_CONFIG, PipelineConfig
from graphrag_rs_spark.kernel.chunking import chunk_text
from graphrag_rs_spark.schemas import CHUNKS_SCHEMA

# item-boundary patterns per language (start-of-line anchored top-level
# definitions — the same item set tree-sitter yields for these grammars)
_BOUNDARIES = {
    "rust": re.compile(
        r"^(?:pub(?:\([^)]*\))?\s+)?(?:async\s+)?(?:unsafe\s+)?"
        r"(?:fn|impl|struct|enum|mod|trait)\s",
        re.M,
    ),
    "python": re.compile(r"^(?:async\s+def|def|class)\s|^@\w", re.M),
    "markdown": re.compile(r"^#{1,6}\s", re.M),
    "go": re.compile(r"^(?:func|type|var|const)\s", re.M),
    "javascript": re.compile(
        r"^(?:export\s+)?(?:default\s+)?(?:async\s+)?"
        r"(?:function\s|class\s|const\s|let\s|var\s)",
        re.M,
    ),
    "typescript": re.compile(
        r"^(?:export\s+)?(?:default\s+)?(?:declare\s+)?(?:abstract\s+)?(?:async\s+)?"
        r"(?:function\s|class\s|interface\s|type\s|enum\s|namespace\s|const\s|let\s|var\s)",
        re.M,
    ),
    "java": re.compile(
        r"^(?:(?:public|private|protected|abstract|final|static|sealed)\s+)*"
        r"(?:class|interface|enum|record|@interface)\s",
        re.M,
    ),
    "c": re.compile(
        # type/aggregate definitions, or a K&R-style function definition
        # starting at column 0 (identifier chain + parameter list, no ';')
        r"^(?:(?:static|inline|extern|const)\s+)*"
        r"(?:struct|enum|union|typedef)\s"
        r"|^[A-Za-z_][\w\s\*]*[\w\*]\s+\**[A-Za-z_]\w*\s*\([^;]*$",
        re.M,
    ),
}

# plug-point: a real parser-backed splitter (e.g. tree-sitter, when the
# runtime has it) registers here and takes precedence over the regex
# boundary set for its language — the operator below dispatches through
# this registry, so swapping splitters needs NO operator changes.
# signature: (text, min_chunk_size) -> [(idx, content, start, end)]
_CUSTOM_SPLITTERS: dict = {}


def register_splitter(lang: str, splitter) -> None:
    """Register a parser-backed splitter for ``lang`` (tree-sitter seam).
    Pass ``None`` to unregister."""
    if splitter is None:
        _CUSTOM_SPLITTERS.pop(lang, None)
    else:
        _CUSTOM_SPLITTERS[lang] = splitter


def split_code(text: str, lang: str, min_chunk_size: int = 50) -> list[tuple[int, str, int, int]]:
    """Split at item boundaries; merge fragments below min_chunk_size into
    the previous chunk; single chunk when no boundaries (the reference's
    fallback, chunking_strategies.rs:239-247)."""
    if not text or not text.strip():
        return []
    custom = _CUSTOM_SPLITTERS.get(lang)
    if custom is not None:
        return custom(text, min_chunk_size)
    pat = _BOUNDARIES.get(lang)
    if pat is None:
        return chunk_text(text)
    starts = [m.start() for m in pat.finditer(text)]
    if not starts:
        return [(0, text, 0, len(text))]
    if starts[0] != 0:
        starts = [0] + starts
    bounds = starts + [len(text)]
    raw = list(zip(bounds, bounds[1:]))
    # merge fragments below min_chunk_size FORWARD (a leading doc comment
    # attaches to the item it documents); the trailing fragment merges back
    spans: list[tuple[int, int]] = []
    carry_start: int | None = None
    for s, e in raw:
        s0 = carry_start if carry_start is not None else s
        if (e - s0) < min_chunk_size:
            carry_start = s0
            continue
        spans.append((s0, e))
        carry_start = None
    if carry_start is not None:
        if spans:
            spans[-1] = (spans[-1][0], len(text))
        else:
            spans.append((carry_start, len(text)))
    out = []
    idx = 0
    for s, e in spans:
        content = text[s:e]
        if content.strip():
            out.append((idx, content, s, e))
            idx += 1
    return out


def chunk_code_documents(
    documents: DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """documents(doc_id, lang, content) → chunks, dispatching the splitter
    on ``lang`` per row; non-code langs fall back to the C1 chunker."""
    min_size = config.min_chunk_size
    chunk_size, overlap = config.chunk_size, config.chunk_overlap
    # snapshot the registry BY VALUE: python workers re-import this module
    # with an empty registry, so the closure must carry the registered
    # splitters (cloudpickle serializes them) rather than look them up
    custom = dict(_CUSTOM_SPLITTERS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, docs, contents, starts, ends = [], [], [], [], []
            for doc_id, lang, content in zip(pdf["doc_id"], pdf["lang"], pdf["content"]):
                if content is None:
                    continue
                sp = custom.get(lang)
                if sp is not None:
                    pieces = sp(content, min_size)
                elif lang in _BOUNDARIES:
                    pieces = split_code(content, lang, min_size)
                else:
                    pieces = chunk_text(content, chunk_size, overlap)
                for idx, text, s, e in pieces:
                    ids.append(f"{doc_id}_{idx}")
                    docs.append(doc_id)
                    contents.append(text)
                    starts.append(s)
                    ends.append(e)
            yield pd.DataFrame(
                {
                    "chunk_id": pd.Series(ids, dtype="string"),
                    "doc_id": pd.Series(docs, dtype="string"),
                    "content": pd.Series(contents, dtype="string"),
                    "start_offset": pd.Series(starts, dtype="int64"),
                    "end_offset": pd.Series(ends, dtype="int64"),
                }
            )

    return documents.select("doc_id", "lang", "content").mapInPandas(
        run, schema=CHUNKS_SCHEMA
    )
