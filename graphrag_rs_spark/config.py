"""Pipeline configuration.

Defaults mirror the reference's config defaults:
- chunk_size=512, chunk_overlap=64   (config/setconfig.rs:1177-1182)
- min_chunk_size=50                  (config/setconfig.rs:1183-1185)
- entity min_confidence=0.6          (config/setconfig.rs:1450-1452)
- relationship confidence=0.5        (config/setconfig.rs:1884)
- linking min_similarity=0.85, max_edit_distance=2
                                     (entity/string_similarity_linker.rs:40-52)
- leiden resolution=1.0, max_levels=5, max_iterations bounded
                                     (graph/leiden.rs:429-463)
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # chunking (reference text/mod.rs:141-186)
    chunk_size: int = 512
    chunk_overlap: int = 64
    min_chunk_size: int = 50

    # semantic chunking C5 (reference text/semantic_chunking.rs:64-74)
    semantic_breakpoint_strategy: str = "percentile"  # percentile|stddev|absolute
    semantic_threshold_amount: float = 95.0
    semantic_min_sentences: int = 1
    semantic_max_sentences: int = 0  # 0 = unlimited
    # word-vector hash family: "fast" (blake2b) | "portable" (sha256 —
    # reproducible in the DuckDB oracle; see kernel/semantic._word_vector)
    semantic_hash_fn: str = "fast"

    # boundary-aware chunking C6/BAR-RAG (chunking_strategies.rs:307-320
    # with_defaults: max 2000 / min 200 chars)
    boundary_max_chunk_chars: int = 2000
    boundary_min_chunk_chars: int = 200

    # late chunking (late_chunking.rs:46-74 LateChunkingConfig::default:
    # 512-char chunks, 64 overlap, 8192-token [≈4 chars/token] context)
    late_chunk_size: int = 512
    late_chunk_overlap: int = 64
    late_max_doc_tokens: int = 8192

    # entity extraction (reference entity/mod.rs:114-173)
    min_confidence: float = 0.6
    entity_types: tuple[str, ...] = ("PERSON", "ORGANIZATION", "LOCATION")
    allowed_patterns: tuple[str, ...] = ()
    excluded_patterns: tuple[str, ...] = ()

    # relationships (reference graphrag/build.rs:557-624)
    extract_relationships: bool = True
    relationship_confidence: float = 0.5
    # cap on context_chunk_ids per triple (the reference keeps an unbounded
    # Vec<ChunkId> in memory; unbounded collect_set concentrates hot triples
    # into single reduce tasks at scale — kept deterministic as the K
    # lexicographically-smallest chunk ids)
    max_context_chunks: int = 128

    # entity linking (reference entity/string_similarity_linker.rs:17-52)
    link_min_similarity: float = 0.85
    link_max_edit_distance: int = 2
    link_fuzzy_matching: bool = True
    link_use_phonetic: bool = False
    # entity sets at or under this row count are linked by the exact
    # sequential mirror in the driver (one collect instead of ~26 jobs of
    # blocking/scoring/CC fixed cost — the reference linker itself is an
    # in-memory sweep, string_similarity_linker.rs:68-124). Output is
    # bit-identical to the distributed path (parity-tested). 0 disables.
    link_small_input_rows: int = 10_000

    # communities (reference graph/leiden.rs:429-463)
    community_max_iterations: int = 20
    community_seed: int = 42
    community_resolution: float = 1.0        # leiden.rs:444 (default 1.0)
    community_min_improvement: float = 0.001  # leiden.rs:461
    # leiden.rs:433 declares max_cluster_size=10 but the reference algorithm
    # never enforces it; None = unbounded (set to gate moves into full
    # communities)
    community_max_cluster_size: int | None = None
    # graphs whose symmetric edge list fits under this bound are clustered
    # by the exact sequential kernel in the driver (the reference itself is
    # in-memory, leiden.rs:465-783) — byte-identical output, none of the
    # per-superstep distributed fixed cost. 0/None disables the fast path.
    community_small_graph_edges: int = 100_000

    # distributed-execution knobs (no analog in the single-process reference)
    shuffle_partitions: int = 32
    arrow_max_records_per_batch: int = 256
    salt_buckets: int = 8             # skew salting for hot keys in two-phase aggs

    extra: dict = field(default_factory=dict, compare=False)


DEFAULT_CONFIG = PipelineConfig()
