"""Pre-flight replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at the given SF dir and
compares row count + column names + order-insensitive value multiset
against its ``oracle_sql()`` DuckDB result — the same three checks the
driver records in CORRECTNESS_r{N}.json, but runnable locally at sf0.01
(the driver's scale; tests/test_entry_contract.py covers sf0.001).

Usage:
    python bench/oracle_sweep.py [--sf /root/testdata/sf0.01] [--only name,...]

Prints one JSON board line per query plus a summary, exit 1 on any
failure.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_normalize(x) for x in v)
    return v


def _multiset(rows):
    out = {}
    for r in rows:
        key = tuple(_normalize(v) for v in r)
        out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="", help="comma-separated query names")
    ap.add_argument("--skip", default="", help="comma-separated query names to leave out")
    ap.add_argument(
        "--spark-only", action="store_true",
        help="run only the Spark side (wall + row count, no DuckDB compare) "
        "— for big-SF budget checks where an oracle's own SQL replay is "
        "the slow side (e.g. lambda-heavy list ops at sf0.1)",
    )
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument(
        "--oracle-timeout", type=float, default=0.0,
        help="seconds before a DuckDB oracle replay is interrupted and the "
        "row recorded as oracle_timeout (0 = no limit). The Spark side is "
        "never interrupted — this bounds only the single-threaded SQL "
        "replay, whose exact gate at big SFs is the sf0.01 sweep + board.",
    )
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry_mod
    from graphrag_rs_spark.session import get_spark

    spark = get_spark(
        app_name="oracle-sweep",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus) if args.cpus.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = sorted(queries)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]
    if args.skip:
        names = [n for n in names if n not in set(args.skip.split(","))]

    board: dict[str, dict] = {}
    n_exact = n_rows_only = n_fail = 0
    for name in names:
        t0 = time.time()
        row: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            sdf = queries[name](spark, args.sf)
            spark_cols = [c.lower() for c in sdf.columns]
            spark_rows = [tuple(r) for r in sdf.collect()]
            row["spark_rows"] = len(spark_rows)
            if args.spark_only:
                row["err"] = "spark_only"
                n_rows_only += 1
            elif name not in oracles:
                row["err"] = "no_oracle"
                n_rows_only += 1
            else:
                timer = None
                if args.oracle_timeout > 0:
                    import threading

                    timer = threading.Timer(args.oracle_timeout, duck.interrupt)
                    timer.start()
                try:
                    res = duck.execute(oracles[name])
                    duck_cols = [d[0].lower() for d in res.description]
                    duck_rows = res.fetchall()
                except duckdb.InterruptException:
                    row["err"] = f"oracle_timeout>{args.oracle_timeout}s"
                    n_rows_only += 1
                    row["sec"] = round(time.time() - t0, 2)
                    board[name] = row
                    print(json.dumps({name: row}), flush=True)
                    continue
                finally:
                    if timer is not None:
                        timer.cancel()
                row["oracle_rows"] = len(duck_rows)
                row["rows_match"] = len(spark_rows) == len(duck_rows)
                row["schema_match"] = sorted(spark_cols) == sorted(duck_cols)
                if row["schema_match"]:
                    idx = [duck_cols.index(c) for c in spark_cols]
                    aligned = [tuple(r[i] for i in idx) for r in duck_rows]
                    row["hash_match"] = _multiset(spark_rows) == _multiset(aligned)
                else:
                    row["hash_match"] = False
                ok = row["rows_match"] and row["schema_match"] and row["hash_match"]
                n_exact += int(bool(ok))
                n_fail += int(not ok)
        except Exception as exc:  # noqa: BLE001 - board records the failure
            row["err"] = f"{type(exc).__name__}: {exc}"[:300]
            n_fail += 1
        row["sec"] = round(time.time() - t0, 2)
        board[name] = row
        status = (
            "PASS" if row["err"] is None and row["hash_match"]
            else (
                "rows-only" if row["err"] in ("no_oracle", "spark_only")
                else "FAIL"
            )
        )
        print(json.dumps({name: row}), flush=True)
        if status == "FAIL":
            print(f"### FAIL {name}", file=sys.stderr, flush=True)

    print(
        json.dumps(
            {
                "summary": {
                    "sf": args.sf, "queries": len(names), "exact_pass": n_exact,
                    "rows_only": n_rows_only, "fail": n_fail,
                }
            }
        ),
        flush=True,
    )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
