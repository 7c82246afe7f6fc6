"""Single-threaded oracle producing golden outputs for P/R scoring."""

from graphrag_rs_spark.oracle.pipeline import build_golden  # noqa: F401
