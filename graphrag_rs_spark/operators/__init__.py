"""Distributed Spark-first operators — the engine proper."""
