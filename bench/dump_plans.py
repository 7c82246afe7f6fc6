"""Dump .explain("formatted") for declared queries to plans/<tag>/.

Usage:
    python bench/dump_plans.py --tag r06 --suffix before --only ann_pq_topk,...

Writes plans/<tag>/<name>_<suffix>.txt for each query. NB: building a
query's DataFrame can itself run Spark jobs (several query constructors
eagerly checkpoint small derived frames), so this is plan capture, not a
zero-cost operation. --only is required.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="r06")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from graphrag_rs_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="dump-plans", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in args.only.split(",") if n]
    if not names:
        ap.error("--only is required (comma-separated query names)")
    q = entry.queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.tag,
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        if name not in q:
            print(f"SKIP unknown query {name}")
            continue
        df = q[name](spark, args.sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
