"""Two-cluster-size scaling evidence (BASELINE.md protocol).

No multi-node cluster exists in this sandbox, so the north rule's N→4N
executor criterion is evidenced by running the IDENTICAL KG-construction
job on the IDENTICAL input at two cluster sizes and reporting triples/sec
at both plus scaling efficiency = (T_N / T_4N) / 4.

Two modes:

- ``--mode local-cluster`` (default): Spark's pseudo-cluster master
  ``local-cluster[E,4,mem]`` spawns E REAL executor JVM processes with 4
  cores each — the faithful reading of the rule's "N and 4N executors",
  and the only honest one on this sandbox: gVisor serializes syscalls
  (notably sockets: ~250 MB/s aggregate for 32 threads in ONE process vs
  ~3-9 GB/s for 32 processes), so a single local[32] JVM hits a
  per-process ceiling no real multi-executor deployment has. Executor
  counts scale 4× between the legs; cores/executor, memory/executor and
  shuffle partitions per core are held fixed.
- ``--mode local``: the round-1/2 protocol (local[N] vs local[4N], one
  JVM) — kept for comparison; on this sandbox it now measures the
  per-process syscall ceiling, not the engine.

Each measurement runs in its own subprocess (fresh JVMs — no warm-cache
bleed between configurations). Usage:

    python bench/scaling.py [--n 8] [--docs 400000] [--doc-scale 8] \
        [--density 0.1] [--mode local-cluster] [--repeats 1]
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
mode = os.environ.get("MODE", "local-cluster")

if mode == "local-cluster":
    # cores/executor and memory/executor held constant across legs: the
    # cluster grows by EXECUTOR COUNT only, like adding nodes
    n_exec = cpus // 4
    master = f"local-cluster[{n_exec},4,6144]"
    extra = {
        "spark.executor.memory": "6g",
        "spark.executorEnv.PYTHONPATH": os.environ["REPO"],
    }
else:
    master = f"local[{cpus}]"
    extra = {}

spark = get_spark(app_name=f"scaling-{cpus}", master=master,
                  shuffle_partitions=cpus * 2, extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")

# even task waves on both legs: split the input into 4*cores scan tasks
# (matches how a production reader sizes splits to the cluster; without
# this the small leg gets ragged 2.25-wave scheduling noise)
total_bytes = sum(
    os.path.getsize(os.path.join(parquet_dir, p))
    for p in os.listdir(parquet_dir) if p.endswith(".parquet")
)
split = max(1 << 20, total_bytes // (cpus * 4))
spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))

src = spark.read.parquet(parquet_dir)
src.count()  # warm the scan; generation/IO excluded from the measurement

t0 = time.time()
tables = build_graph(src, materialize=True)  # UDF stages run exactly once
n_triples = tables.triples.count()
wall = time.time() - t0

n_mentions = tables.mentions.count()
print(json.dumps({
    "cpus": cpus, "docs": n_docs, "wall_sec": round(wall, 2),
    "triples": n_triples, "mentions": n_mentions, "mode": mode,
    "master": master,
    "triples_per_sec": round(n_triples / wall, 1),
}))
spark.stop()
"""


def run_one(cpus: int, docs: int, corpus_parquet: str, mode: str) -> dict:
    env = dict(
        os.environ,
        REPO=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        CPUS=str(cpus),
        DOCS=str(docs),
        CORPUS_PARQUET=corpus_parquet,
        MODE=mode,
        SPARK_HOME=os.environ.get("SPARK_HOME", "/opt/spark"),
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
    ap.add_argument("--n", type=int, default=8, help="small leg cores (big = 4N; local-cluster uses N/4 executors x 4 cores)")
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--density", type=float, default=0.25, help="entity density (realistic corpora ~0.25)")
    ap.add_argument("--doc-scale", dest="doc_scale", type=int, default=1, help="per-doc content multiplier")
    ap.add_argument("--mode", choices=("local-cluster", "local"), default="local-cluster")
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
            r = run_one(cpus, args.docs, corpus_dir, args.mode)
            if best is None or r["wall_sec"] < best["wall_sec"]:
                best = r
        results[cpus] = best
        print(json.dumps(best), flush=True)

    small, big = results[args.n], results[args.n * 4]
    eff = (small["wall_sec"] / big["wall_sec"]) / 4
    print(
        json.dumps(
            {
                "scaling": f"{small['master']} -> {big['master']}",
                "mode": args.mode,
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
