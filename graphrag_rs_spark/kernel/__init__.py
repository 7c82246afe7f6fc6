"""Pure-Python behavioral spec of the reference's per-chunk text operators.

These are deterministic, side-effect-free functions of their inputs. They are
the *semantics contract*: transcribed from the reference's documented
behavior (file:line cited per function) and unit-tested against the
reference's own literal test expectations (tests/test_kernel_*.py).

They run in two places:
- inside Arrow-batched pandas UDFs on executors (operators/*.py), and
- in the single-threaded oracle (oracle/pipeline.py) that produces golden
  outputs for P/R scoring of the distributed pipeline.

Everything *between* these functions — dedupe, thresholds, joins, pair
generation, linking, communities — is implemented twice on purpose:
sequentially in the oracle and distributed in operators/, so the golden
tests exercise real distributed-vs-sequential differences.

NOTE on offsets: the reference indexes UTF-8 bytes with char-boundary
snapping; we index Python code points. Identical for ASCII corpora (all
fixtures are ASCII by construction).
"""

from graphrag_rs_spark.kernel.chunking import chunk_text  # noqa: F401
from graphrag_rs_spark.kernel.extraction import (  # noqa: F401
    extract_entities_from_chunk,
    infer_relationship_type,
    normalize_name,
)
