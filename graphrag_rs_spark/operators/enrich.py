"""C6: ChunkEnricher — chapter/section/subsection, keywords, summary,
position metadata on the chunks table.

Reference: text/chunk_enricher.rs enrich_single_chunk (:79-140):
1. parse the document's heading structure once (layout parser),
2. per chunk, resolve the heading path in effect at its start offset →
   chapter / section / subsection (path levels 1-3) + structural level,
3. TF-IDF top-5 keywords of the chunk content,
4. extractive summary when the chunk exceeds 150 chars (bounded ~150),
5. position_in_document = start_offset / len(document).

Distributed shape: heading extraction is a pure per-document function →
one Arrow ``mapInPandas`` pass emitting a (doc_id, offset, level, title)
headings table; the path resolution is an AS-OF window (chunks and
headings unioned into one per-doc offset timeline, latest title per
level carried forward with last-ignorenulls — linear per doc, no
chunk×heading join; each level nested inside the previous is enforced
afterwards); keywords reuse the C10 TF-IDF operator with chunks as the
corpus (distributed DF/TF — the reference computes per-chunk maps in
memory); summaries reuse the Q5 extractive summarizer (top-2 sentences,
truncated to ~150 chars like the reference's max_length).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from graphrag_rs_spark.operators.keywords import tfidf_keywords
from graphrag_rs_spark.operators.summarizer import extractive_summary

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*)$")
_HTML_H_RE = re.compile(r"<h([1-6])[^>]*>(.*?)</h\1>", re.IGNORECASE | re.DOTALL)


def _plaintext_headings(content: str) -> list[tuple[int, int, str]]:
    """Plaintext heading heuristics (text/parsers/plaintext.rs:147-210 +
    text/analysis.rs): setext-style underlines (=== level 1, --- level 2,
    ___ level 3, ≥3 chars) and ALL-CAPS lines (≥5 chars; <20 chars →
    level 1, <40 → 2, else 3). Offsets here are TRUE source offsets (the
    reference's current_offset bookkeeping skips advancing on heading
    lines — a bug we do not reproduce; the enricher consumes offsets
    positionally so correctness matters more than quirk parity)."""
    out = []
    lines = content.splitlines(keepends=True)
    pos = 0
    i = 0
    while i < len(lines):
        raw = lines[i]
        trimmed = raw.strip()
        if not trimmed:
            pos += len(raw)
            i += 1
            continue
        level = None
        if i + 1 < len(lines):
            nxt = lines[i + 1].strip()
            if len(nxt) >= 3:
                if set(nxt) == {"="}:
                    level = 1
                elif set(nxt) == {"-"}:
                    level = 2
                elif set(nxt) == {"_"}:
                    level = 3
        skip_next = level is not None
        if level is None and len(trimmed) >= 5:
            letters = [c for c in trimmed if c.isalpha()]
            if letters and trimmed.upper() == trimmed:
                level = 1 if len(trimmed) < 20 else (2 if len(trimmed) < 40 else 3)
        if level is not None:
            out.append((pos, level, trimmed))
        pos += len(raw)
        if skip_next:
            pos += len(lines[i + 1])
            i += 1
        i += 1
    return out


def _detect_headings(content: str, fmt: str) -> list[tuple[int, int, str]]:
    """→ [(offset, level, title)] for one document."""
    if fmt == "markdown":
        out, pos = [], 0
        for line in content.splitlines(keepends=True):
            m = _HEADING_RE.match(line.rstrip("\n"))
            if m:
                out.append((pos, len(m.group(1)), m.group(2).strip()))
            pos += len(line)
        return out
    if fmt == "html":
        return [
            (m.start(), int(m.group(1)), re.sub(r"<[^>]+>", "", m.group(2)).strip())
            for m in _HTML_H_RE.finditer(content)
        ]
    if fmt == "plaintext":
        return _plaintext_headings(content)
    raise ValueError(f"unknown layout format: {fmt}")

HEADINGS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("offset", LongType(), False),
        StructField("level", LongType(), False),
        StructField("title", StringType(), False),
    ]
)


def extract_headings(
    documents: DataFrame, *, text_col: str = "content", fmt: str = "markdown"
) -> DataFrame:
    """documents(doc_id, content) → (doc_id, offset, level, title): the
    layout-parser surface the enricher consumes (C11, text/parsers/*).
    ``fmt``: "markdown" (# headings), "html" (<h1>-<h6> tags), or
    "plaintext" (setext underlines + ALL-CAPS heuristics)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            docs, offs, levels, titles = [], [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf[text_col]):
                if content is None:
                    continue
                for pos, level, title in _detect_headings(content, fmt):
                    docs.append(doc_id)
                    offs.append(pos)
                    levels.append(level)
                    titles.append(title)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(docs, dtype="string"),
                    "offset": pd.Series(offs, dtype="int64"),
                    "level": pd.Series(levels, dtype="int64"),
                    "title": pd.Series(titles, dtype="string"),
                }
            )

    return documents.select("doc_id", F.col(text_col)).mapInPandas(
        run, schema=HEADINGS_SCHEMA
    )


def _asof_headings(chunks: DataFrame, headings: DataFrame) -> DataFrame:
    """Heading path in effect at each chunk's start offset — ONE as-of
    window pass per document instead of three per-level range joins.

    The old shape (chunks ⋈ headings-of-level on doc_id, then
    offset ≤ start_offset + top-1 window) multiplied each doc's chunks by
    its headings of that level: a heading-dense 100k-chunk doc made one
    doc's intermediate pairs explode. Here chunks and headings are
    UNIONED into one per-doc timeline ordered by offset — headings sort
    before chunks on ties, so a heading AT the chunk start applies — and
    ``last(..., ignorenulls=True)`` carries each level's latest title
    forward. Linear per doc, one shuffle, all three levels in one pass
    (the classic streaming as-of pattern)."""
    h = headings.where(F.col("level").isin(1, 2, 3)).select(
        "doc_id",
        F.col("offset").alias("pos"),
        F.lit(0).alias("is_chunk"),
        F.lit(None).cast("string").alias("chunk_id"),
        *[
            F.when(F.col("level") == lv, F.col("title")).alias(f"_t{lv}")
            for lv in (1, 2, 3)
        ],
        *[
            F.when(F.col("level") == lv, F.col("offset")).alias(f"_o{lv}")
            for lv in (1, 2, 3)
        ],
        F.col("title").alias("_tie"),
    )
    c = chunks.select(
        "doc_id",
        F.col("start_offset").cast("long").alias("pos"),
        F.lit(1).alias("is_chunk"),
        "chunk_id",
        *[F.lit(None).cast("string").alias(f"_t{lv}") for lv in (1, 2, 3)],
        *[F.lit(None).cast("long").alias(f"_o{lv}") for lv in (1, 2, 3)],
        F.lit("").alias("_tie"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos", "is_chunk", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = h.unionByName(c).select(
        "chunk_id",
        "is_chunk",
        F.last("_t1", ignorenulls=True).over(w).alias("chapter"),
        F.last("_o1", ignorenulls=True).over(w).alias("chapter_off"),
        F.last("_t2", ignorenulls=True).over(w).alias("section"),
        F.last("_o2", ignorenulls=True).over(w).alias("section_off"),
        F.last("_t3", ignorenulls=True).over(w).alias("subsection"),
        F.last("_o3", ignorenulls=True).over(w).alias("subsection_off"),
    )
    return carried.where(F.col("is_chunk") == 1).drop("is_chunk")


def enrich_chunks(
    chunks: DataFrame,
    documents: DataFrame,
    *,
    doc_text_col: str = "content",
    top_keywords: int = 5,
    summary_min_chars: int = 150,
    summary_max_chars: int = 150,
) -> DataFrame:
    """chunks + documents → chunks with chapter / section / subsection /
    keywords / summary / position_in_document columns filled
    (chunk_enricher.rs:79-140). Nesting is enforced: a section only
    applies if it appears at/after its chapter, a subsection at/after its
    section (heading-path semantics of get_heading_path)."""
    headings = extract_headings(documents, text_col=doc_text_col)
    paths = _asof_headings(chunks, headings)

    kw = (
        tfidf_keywords(
            chunks, id_col="chunk_id", text_col="content", top_k=top_keywords
        )
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "keyword"))),
                lambda s: s["keyword"],
            ).alias("keywords")
        )
        .withColumnRenamed("doc_id", "chunk_id")
    )

    long_chunks = chunks.where(F.length("content") > summary_min_chars).select(
        "chunk_id", "content"
    )
    summ = extractive_summary(
        long_chunks, id_col="chunk_id", text_col="content", top_k_sentences=2
    ).select(
        F.col("doc_id").alias("chunk_id"),
        F.substring(F.col("summary"), 1, summary_max_chars).alias("summary"),
    )

    doc_len = documents.select(
        "doc_id", F.greatest(F.length(doc_text_col), F.lit(1)).alias("_doc_len")
    )

    out = (
        chunks.join(paths, "chunk_id", "left")
        .join(kw, "chunk_id", "left")
        .join(summ, "chunk_id", "left")
        .join(doc_len, "doc_id", "left")
        .select(
            *chunks.columns,
            "chapter",
            # nesting: section must start at/after its chapter, subsection
            # at/after its section — otherwise it belongs to an earlier arc
            F.when(
                F.col("section_off") >= F.coalesce("chapter_off", F.lit(-1)),
                F.col("section"),
            ).alias("section"),
            F.when(
                F.col("subsection_off") >= F.coalesce("section_off", F.lit(-1)),
                F.col("subsection"),
            ).alias("subsection"),
            F.coalesce("keywords", F.array().cast("array<string>")).alias("keywords"),
            "summary",
            (
                F.col("start_offset").cast("double") / F.col("_doc_len").cast("double")
            ).alias("position_in_document"),
        )
    )
    return out
