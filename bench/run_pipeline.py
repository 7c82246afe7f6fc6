"""spark-submit entry point for the KG-construction pipeline.

    python bench/package.py                       # builds dist/graphrag_rs_spark.zip
    spark-submit --master local[32] \
        --py-files dist/graphrag_rs_spark.zip \
        bench/run_pipeline.py \
        --input /path/to/source_parquet --workspace /path/to/workspace \
        [--link] [--communities] [--incremental]

On a real cluster, swap --master and point --input at the Iceberg source
table; the pipeline code is identical (the north rule's deployment shape).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="source parquet/table path")
    ap.add_argument("--workspace", required=True, help="output workspace dir")
    ap.add_argument("--link", action="store_true")
    ap.add_argument("--communities", action="store_true")
    ap.add_argument("--incremental", action="store_true",
                    help="only process docs whose content sha changed")
    ap.add_argument("--sf", default=None, help="unused; driver-protocol compat")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from graphrag_rs_spark.checkpoint import changed_documents, run_checkpointed

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    source = spark.read.parquet(args.input)
    if args.incremental:
        changed = changed_documents(source, args.workspace)
        n = changed.count()
        print(json.dumps({"incremental_changed_docs": n}))
        if n == 0:
            return
        source = changed.select("repo", "path", "commit", "lang", "content")

    t0 = time.time()
    tables = run_checkpointed(
        source, args.workspace, link=args.link, communities=args.communities
    )
    stats = {name: df.count() for name, df in tables.items()}
    print(
        json.dumps(
            {"wall_sec": round(time.time() - t0, 2), "tables": stats}
        )
    )


if __name__ == "__main__":
    main()
