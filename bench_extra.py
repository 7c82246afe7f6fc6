"""Supplementary benchmarks (round 6) — NOT part of the frozen driver
contract (bench.py is the measured artifact; this file exists for
optimization evidence per the guide's "measure first").

Modes:
  --all          time the Spark side of every declared query (count()),
                 one or more reps, sorted slowest-first
  --only a,b,c   time just those queries
  --noop         use a noop-sink write instead of count() (computes every
                 column; count() can prune)

Usage:
    python bench_extra.py --sf /root/testdata/sf0.1 --all --reps 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--only", default="")
    ap.add_argument("--noop", action="store_true")
    args = ap.parse_args()

    from graphrag_rs_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench-extra", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    q = entry.queries()
    names = [n for n in args.only.split(",") if n] or (sorted(q) if args.all else [])
    spark.read.parquet(f"{args.sf}/documents.parquet").count()  # warm session

    results: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        times, rows, err = [], None, None
        for _ in range(max(1, args.reps)):
            t0 = time.time()
            try:
                df = q[name](spark, args.sf)
                if args.noop:
                    df.write.format("noop").mode("overwrite").save()
                    rows = -1
                else:
                    rows = df.count()
            except Exception as ex:  # noqa: BLE001 — record and continue
                err = f"{type(ex).__name__}: {ex}"[:200]
                break
            times.append(round(time.time() - t0, 3))
        results[name] = {"min": min(times) if times else None, "all": times,
                         "rows": rows, "err": err}
        spark.sparkContext.setJobDescription(None)

    ranked = sorted(results.items(), key=lambda kv: -(kv[1]["min"] or 999))
    for name, r in ranked:
        if r["err"]:
            print(f"{name:32s} ERR {r['err']}")
        else:
            print(f"{name:32s} {r['min']:8.3f}s rows={r['rows']} all={r['all']}")
    total = sum(r["min"] or 0 for r in results.values())
    print(json.dumps({"n": len(results), "total_min_sec": round(total, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
