"""E15/E16 seam: iterative gleaning extraction with a pluggable provider.

Reference: entity/gleaning_extractor.rs — extract_with_gleaning
(:116-230) runs round 1 extraction, then up to ``max_gleaning_rounds``
(default 4, :44) continuation rounds; each round optionally asks the
provider whether extraction is complete (:163-181), stops when a round
yields nothing new (:199-207), and merges entities keyed by lowercase
name keeping the STRICTLY longer description (merge_entity_data
:245-285). Relationships are appended across rounds (:215).

The reference's provider is an LLM client; here the provider is any
picklable object with the same three-method surface, dispatched inside
``mapInPandas`` so each round is ONE Arrow-batched distributed pass over
the still-active chunks. The round loop itself is driver-side — the
reference's per-chunk loop becomes a per-round barrier with per-chunk
early exit (a chunk that is complete, or yields nothing new, drops out
of the active set), which preserves per-chunk results exactly while
keeping every hot path distributed. No LLM client ships in this repo
(surveyed out of scope, SURVEY §2 E15-E18); tests drive the seam with a
deterministic mock.

Scale shape: each round shuffles only (active chunks ⋈ accumulated
entities for those chunks) — the active set shrinks monotonically, and
rounds are bounded by ``max_rounds`` (4), so total work is ≤ 4 passes
over the corpus with map-side-only provider calls. The source corpus is
scanned exactly once (base is cached; later rounds semi-join the cache),
each round's provider pass runs exactly once per active chunk (the mixed
output is lineage-cut before the entity/relationship split), and the
per-round state merge is lineage-cut so plans stay flat across rounds.
"""

from __future__ import annotations

from typing import Iterable, NamedTuple, Protocol

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..iterutil import cut_lineage
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)


class GleaningProvider(Protocol):
    """The llm_extractor surface (gleaning_extractor.rs:139-198).

    Entities are dicts with keys ``name``, ``entity_type``,
    ``description``, ``confidence``; relationships are dicts with keys
    ``source``, ``target``, ``description``, ``strength``.
    """

    def extract(self, content: str) -> tuple[list[dict], list[dict]]:
        """Round-1 initial extraction (extract_from_chunk)."""
        ...

    def check_complete(self, content: str, known: list[dict]) -> bool:
        """Completion probe given entities found so far (check_completion)."""
        ...

    def extract_additional(
        self, content: str, known: list[dict]
    ) -> tuple[list[dict], list[dict]]:
        """Continuation round: only NEW entities/relationships."""
        ...


GLEANED_ENTITIES_SCHEMA = StructType(
    [
        StructField("chunk_id", StringType(), False),
        StructField("name", StringType(), False),
        StructField("entity_type", StringType(), False),
        StructField("description", StringType(), False),
        StructField("confidence", DoubleType(), False),
        StructField("round", IntegerType(), False),
    ]
)

GLEANED_RELATIONSHIPS_SCHEMA = StructType(
    [
        StructField("chunk_id", StringType(), False),
        StructField("source", StringType(), False),
        StructField("target", StringType(), False),
        StructField("description", StringType(), False),
        StructField("strength", DoubleType(), False),
        StructField("round", IntegerType(), False),
    ]
)


def _round_pass(
    active: DataFrame, provider: GleaningProvider, round_idx: int
) -> tuple[DataFrame, DataFrame]:
    """One distributed pass: (chunk_id, content[, known]) → entity and
    relationship rows emitted this round. ``known`` is the accumulated
    per-chunk entity state (absent on round 1)."""
    first = round_idx == 1
    with_known = "known" in active.columns

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            ents: list[tuple] = []
            rels: list[tuple] = []
            for row in pdf.itertuples(index=False):
                cid, content = row.chunk_id, row.content
                if first:
                    e, r = provider.extract(content)
                else:
                    # Arrow hands the array column back as a numpy array
                    # (None when the left join found no state)
                    raw = row.known if with_known else None
                    known = [dict(k) for k in raw] if raw is not None else []
                    if provider.check_complete(content, known):
                        continue
                    e, r = provider.extract_additional(content, known)
                for d in e:
                    ents.append(
                        (cid, d["name"], d["entity_type"],
                         d.get("description", ""), float(d.get("confidence", 1.0)))
                    )
                for d in r:
                    rels.append(
                        (cid, d["source"], d["target"],
                         d.get("description", ""), float(d.get("strength", 1.0)))
                    )
            yield pd.DataFrame(
                {
                    "chunk_id": [x[0] for x in ents] + [x[0] for x in rels],
                    "name": [x[1] for x in ents] + [x[1] for x in rels],
                    "entity_type": [x[2] for x in ents] + [""] * len(rels),
                    "description": [x[3] for x in ents] + [x[3] for x in rels],
                    "confidence": [x[4] for x in ents] + [x[4] for x in rels],
                    "target": [""] * len(ents) + [x[2] for x in rels],
                    "is_rel": [False] * len(ents) + [True] * len(rels),
                }
            )

    # one UDF pass emitting both row kinds, split after. The pass is
    # MATERIALIZED (cut_lineage) before splitting: the ents/rels filters
    # below are two separate frames, and without the cut each would
    # re-execute the mapInPandas on evaluation — the provider would run
    # twice per chunk per round (tests/test_gleaning.py pins the call
    # count). The cut also keeps every later round's plan a flat parquet
    # scan instead of a growing mapInPandas chain.
    mixed_schema = StructType(
        [
            StructField("chunk_id", StringType(), False),
            StructField("name", StringType(), False),
            StructField("entity_type", StringType(), False),
            StructField("description", StringType(), False),
            StructField("confidence", DoubleType(), False),
            StructField("target", StringType(), False),
            StructField("is_rel", BooleanType(), False),
        ]
    )
    out = cut_lineage(
        active.mapInPandas(run, schema=mixed_schema), f"glean-r{round_idx}"
    )
    ents = (
        out.where(~F.col("is_rel"))
        .select(
            "chunk_id", "name", "entity_type", "description", "confidence",
            F.lit(round_idx).alias("round"),
        )
    )
    rels = (
        out.where(F.col("is_rel"))
        .select(
            "chunk_id",
            F.col("name").alias("source"),
            F.col("target"),
            "description",
            F.col("confidence").alias("strength"),
            F.lit(round_idx).alias("round"),
        )
    )
    return ents, rels


def _merge_entities(state: DataFrame, new: DataFrame) -> DataFrame:
    """merge_entity_data (gleaning_extractor.rs:245-285): key = lowercase
    name per chunk; a NEW row replaces an existing one only when its
    description is STRICTLY longer, otherwise the earlier row is kept."""
    both = state.unionByName(new)
    w = Window.partitionBy("chunk_id", F.lower(F.col("name"))).orderBy(
        F.length("description").desc(), F.col("round").asc(), F.col("name").asc()
    )
    return both.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


class GleaningResult(NamedTuple):
    entities: DataFrame
    relationships: DataFrame
    rounds_run: int


def gleaning_extract(
    chunks: DataFrame,
    provider: GleaningProvider,
    *,
    max_rounds: int = 4,
    use_completion_check: bool = True,
    id_col: str = "chunk_id",
    content_col: str = "content",
) -> GleaningResult:
    """Iterative gleaning over ``chunks`` with a pluggable provider.

    → (entities, relationships, rounds_run); entities carry the
    length-based merge result, relationships the cross-round append.
    """
    # the corpus is scanned ONCE: base is cached here and every round's
    # active frame is a (cached base ⋈ tiny emitted set) semi-join — no
    # round re-reads the source (tests/test_gleaning.py pins the plan)
    base = chunks.select(
        F.col(id_col).cast("string").alias("chunk_id"),
        F.col(content_col).alias("content"),
    ).persist()
    if not use_completion_check:
        provider = _NoCompletionCheck(provider)

    ents, rels = _round_pass(base, provider, 1)
    state = ents
    all_rels = rels
    active = base
    rounds_run = 1
    for round_idx in range(2, max_rounds + 1):
        known = state.groupBy("chunk_id").agg(
            F.collect_list(
                F.create_map(
                    F.lit("name"), F.col("name"),
                    F.lit("entity_type"), F.col("entity_type"),
                    F.lit("description"), F.col("description"),
                )
            ).alias("known")
        )
        staged = active.join(known, "chunk_id", "left")
        new_ents, new_rels = _round_pass(staged, provider, round_idx)
        # stop when the whole round found nothing (reference :199-207 per
        # chunk; globally: no active chunk produced anything). new_ents /
        # new_rels are parquet scans (the round pass is lineage-cut), so
        # this probe does not re-run the provider.
        emitted = (
            new_ents.select("chunk_id").union(new_rels.select("chunk_id")).distinct()
        )
        rounds_run = round_idx
        if emitted.isEmpty():
            break
        # cut per round: the merge window references the prior state, and
        # an uncut chain grows the plan linearly with rounds
        state = cut_lineage(_merge_entities(state, new_ents), "glean-state")
        all_rels = all_rels.unionByName(new_rels)
        # per-chunk early exit: only chunks that still yield rows stay hot
        active = base.join(emitted, "chunk_id", "left_semi")

    base.unpersist()
    return GleaningResult(
        entities=state.select(
            "chunk_id", "name", "entity_type", "description", "confidence"
        ),
        relationships=all_rels.select(
            "chunk_id", "source", "target", "description", "strength", "round"
        ),
        rounds_run=rounds_run,
    )


class _NoCompletionCheck:
    """Wrapper honoring use_llm_completion_check=false (config :27)."""

    def __init__(self, inner: GleaningProvider):
        self._inner = inner

    def extract(self, content):
        return self._inner.extract(content)

    def check_complete(self, content, known):
        return False

    def extract_additional(self, content, known):
        return self._inner.extract_additional(content, known)
