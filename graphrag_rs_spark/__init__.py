"""graphrag_rs_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of automataIA/graphrag-rs
(reference surveyed in SURVEY.md) as idiomatic Spark DataFrame pipelines:

- chunking (overlapping sliding windows) as Arrow-batched ``mapInPandas``
- pattern/gazetteer entity extraction as vectorized pandas UDFs
- co-occurrence triple generation as a mentions self-join (JVM-side)
- entity linking/canonicalization as blocking + connected components
- Leiden-style communities as iterative DataFrame label propagation
- per-partition checkpoint/lineage/metrics for resumable runs

The reference is a single-process Rust engine; nothing here is a port — the
``kernel`` package holds the *behavioral spec* (pure functions transcribed
from the reference's documented semantics and unit-tested against its own
literal test expectations), and ``operators`` holds the distributed
Spark-first implementations.
"""

__version__ = "0.1.0"

from graphrag_rs_spark.config import PipelineConfig  # noqa: F401
