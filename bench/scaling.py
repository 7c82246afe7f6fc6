"""Two-cluster-size scaling evidence (BASELINE.md protocol).

No multi-node cluster exists in this sandbox, so the north rule's N→4N
executor criterion is evidenced by running the IDENTICAL KG-construction
job on the IDENTICAL input at two local parallelism levels (local[N] and
local[4N], shuffle partitions scaled proportionally) and reporting
triples/sec at both plus scaling efficiency = (T_N / T_4N) / 4.

Each measurement runs in its own subprocess (fresh JVM — no warm-cache
bleed between configurations). Usage:

    python bench/scaling.py [--n 8] [--docs 20000] [--repeats 1]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO"])
from graphrag_rs_spark.pipeline import build_graph
from graphrag_rs_spark.session import get_spark

cpus = int(os.environ["CPUS"])
n_docs = int(os.environ["DOCS"])
parquet_dir = os.environ["CORPUS_PARQUET"]

spark = get_spark(app_name=f"scaling-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus * 2)
spark.sparkContext.setLogLevel("ERROR")

src = spark.read.parquet(parquet_dir)
src.count()  # warm the scan; generation/IO excluded from the measurement

t0 = time.time()
tables = build_graph(src, materialize=True)  # UDF stages run exactly once
n_triples = tables.triples.count()
wall = time.time() - t0

n_mentions = tables.mentions.count()
print(json.dumps({
    "cpus": cpus, "docs": n_docs, "wall_sec": round(wall, 2),
    "triples": n_triples, "mentions": n_mentions,
    "triples_per_sec": round(n_triples / wall, 1),
}))
spark.stop()
"""


def run_one(cpus: int, docs: int, corpus_parquet: str) -> dict:
    env = dict(
        os.environ,
        REPO=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        CPUS=str(cpus),
        DOCS=str(docs),
        CORPUS_PARQUET=corpus_parquet,
    )
    out = subprocess.run(
        [sys.executable, "-c", WORKER], env=env, capture_output=True, text=True,
        timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="small parallelism N (big = 4N)")
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--density", type=float, default=0.25, help="entity density (realistic corpora ~0.25)")
    ap.add_argument("--doc-scale", dest="doc_scale", type=int, default=1, help="per-doc content multiplier")
    args = ap.parse_args()

    # materialize the corpus once so both runs read identical parquet
    corpus_dir = os.path.join(
        tempfile.gettempdir(),
        f"scaling_corpus_{args.docs}_d{args.density}_s{args.doc_scale}",
    )
    if not os.path.exists(corpus_dir):
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from graphrag_rs_spark.fixtures import generate_corpus_distributed
        from graphrag_rs_spark.session import get_spark

        spark = get_spark(app_name="corpus-gen", master="local[32]")
        spark.sparkContext.setLogLevel("ERROR")
        generate_corpus_distributed(
            spark, args.docs, seed=42, entity_density=args.density,
            doc_scale=args.doc_scale, partitions=256,
        ).write.mode("overwrite").parquet(corpus_dir)
        spark.stop()

    results = {}
    for cpus in (args.n, args.n * 4):
        best = None
        for _ in range(args.repeats):
            r = run_one(cpus, args.docs, corpus_dir)
            if best is None or r["wall_sec"] < best["wall_sec"]:
                best = r
        results[cpus] = best
        print(json.dumps(best), flush=True)

    small, big = results[args.n], results[args.n * 4]
    eff = (small["wall_sec"] / big["wall_sec"]) / 4
    print(
        json.dumps(
            {
                "scaling": f"local[{args.n}] -> local[{args.n * 4}]",
                "t_n_sec": small["wall_sec"],
                "t_4n_sec": big["wall_sec"],
                "triples_per_sec_n": small["triples_per_sec"],
                "triples_per_sec_4n": big["triples_per_sec"],
                "efficiency": round(eff, 3),
                "target": 0.8,
            }
        )
    )


if __name__ == "__main__":
    main()
