"""Host scaling ceiling: pure-Python N-process microbench (no Spark, no
JVM) that bounds what ANY engine can achieve on this machine.

Each worker process runs the extraction kernel (chunk_text +
extract_entities_from_chunk) over a PRIVATE in-memory corpus — zero
shared state, zero IPC after fork — so per-core throughput retention
from 1 → P processes measures the HOST (scheduler, memory bandwidth,
hypervisor syscall serialization), not the engine. The N→4N pipeline
efficiency should be read against this number: pipeline_eff /
host_ceiling ≈ the engine's own share.

Usage: python bench/host_ceiling.py [--procs 1,8,32] [--docs-per-proc 600]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(args):
    docs_per_proc, seed = args
    from graphrag_rs_spark.fixtures import generate_corpus
    from graphrag_rs_spark.kernel.chunking import chunk_text
    from graphrag_rs_spark.kernel.extraction import extract_entities_from_chunk

    corpus = [
        r["content"]
        for r in generate_corpus(
            n_docs=docs_per_proc, seed=seed, include_edge_cases=False
        )
        if r["content"]
    ]
    t0 = time.time()
    n_mentions = 0
    for text in corpus:
        for chunk in chunk_text(text, chunk_size=800, overlap=100):
            n_mentions += len(extract_entities_from_chunk(chunk[1], 0.4))
    dt = time.time() - t0
    return len(corpus), n_mentions, dt


def measure(procs: int, docs_per_proc: int) -> dict:
    # wall = the slowest worker's own kernel time (corpus generation, pool
    # startup and imports excluded) — workers run concurrently, so this is
    # the binding wall for the compute itself
    with mp.Pool(procs) as pool:
        results = pool.map(
            _worker, [(docs_per_proc, 1000 + i) for i in range(procs)]
        )
    wall = max(r[2] for r in results)
    total_docs = sum(r[0] for r in results)
    return {
        "procs": procs,
        "docs": total_docs,
        "wall_sec": round(wall, 2),
        "docs_per_sec_total": round(total_docs / wall, 1),
        "docs_per_sec_per_core": round(total_docs / wall / procs, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,8,32")
    ap.add_argument("--docs-per-proc", type=int, default=600)
    args = ap.parse_args()
    legs = [
        measure(int(p), args.docs_per_proc) for p in args.procs.split(",")
    ]
    out = {"legs": legs}
    if len(legs) >= 2:
        lo, hi = legs[-2], legs[-1]
        out["per_core_retention"] = round(
            hi["docs_per_sec_per_core"] / lo["docs_per_sec_per_core"], 3
        )
        out["note"] = (
            f"host ceiling {lo['procs']}->{hi['procs']} procs; any "
            f"{lo['procs']}->{hi['procs']}-core workload on this machine "
            "is bounded by this retention with ZERO engine involvement"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
