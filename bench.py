"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "triples_per_sec": ...}

Headline = the KG-construction path (the north metric is triples/sec):
chunk → extract → triples on the testdata documents table, plus an
entity-rich fixture corpus (the word-salad testdata text exercises chunker
cost but yields few pattern entities; the fixture corpus measures realistic
extraction + pair-join throughput), plus the training-data operators.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
FIXTURE_DOCS = int(os.environ.get("SPARK_GRAFT_FIXTURE_DOCS", "4000"))


def _scaling_record() -> dict | None:
    """SCALING.json (written by the scaling/host-ceiling protocol runs),
    embedded verbatim — None when no record exists."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def env_fingerprint() -> dict:
    """~0.5 s machine fingerprint so cross-round bench comparisons are
    like-for-like (BENCH.md: a mid-round-3 reboot changed identical-commit
    walls 3-5× — the discriminator is the per-PROCESS concurrent-syscall
    ceiling, which this measures directly: small-file create/stat/unlink
    ops/s on one thread vs. total across 16 threads in this process)."""
    import tempfile
    import threading

    def ops_in(seconds: float, stop_at: list) -> int:
        n = 0
        with tempfile.TemporaryDirectory() as d:
            t_end = time.time() + seconds
            while time.time() < t_end and not stop_at:
                p = os.path.join(d, f"f{n}")
                with open(p, "w") as fh:
                    fh.write("x")
                os.stat(p)
                os.unlink(p)
                n += 1
        return n

    t0 = time.time()
    one = ops_in(0.2, [])
    single = round(one / 0.2)
    counts = [0] * 16
    threads = []

    def worker(i):
        counts[i] = ops_in(0.2, [])

    for i in range(16):
        th = threading.Thread(target=worker, args=(i,))
        th.start()
        threads.append(th)
    for th in threads:
        th.join()
    return {
        "file_ops_per_sec_1thread": single,
        "file_ops_per_sec_16threads_total": round(sum(counts) / 0.2),
        "os_cpus": os.cpu_count(),
        "fingerprint_sec": round(time.time() - t0, 2),
    }


def main() -> None:
    from graphrag_rs_spark.operators.chunking import chunk_documents
    from graphrag_rs_spark.operators.extraction import extract_mentions, rollup_entities
    from graphrag_rs_spark.operators.linking import link_entities
    from graphrag_rs_spark.session import get_spark

    spark = get_spark(
        app_name="graphrag-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS) if CPUS.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

    timings: dict[str, float] = {}
    counters: dict[str, int] = {}
    attempts: dict[str, list[float]] = {}
    # the sandbox serializes concurrent file syscalls per-process (see
    # session.py), which makes single-JVM wall times swing several-fold in
    # waves uncorrelated with the plan. Each query runs REPS times and the
    # headline takes the min (the undisturbed measurement); every attempt
    # is disclosed in the JSON so variance is visible, not hidden.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

    def bench(name, fn):
        best = None
        for _ in range(max(1, reps)):
            t0 = time.time()
            counters[name] = fn()
            dt = round(time.time() - t0, 3)
            attempts.setdefault(name, []).append(dt)
            best = dt if best is None else min(best, dt)
        timings[name] = best

    # 1. chunk + pattern-extract the testdata documents (UDF cost path)
    tds = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"), F.col("text").alias("content")
    )

    def q_chunk_extract():
        chunks = chunk_documents(tds)
        mentions = extract_mentions(chunks)
        return mentions.count()

    bench("chunk_extract_testdata", q_chunk_extract)

    # 1b. code-corpus KG triples — the north-star input shape (repo, path,
    # lang, content): imports + defs + call resolution + dependency edges,
    # all regex/join DataFrame algebra (operators/code_graph.py)
    from __spark_entry__ import _code_corpus
    from graphrag_rs_spark.operators.code_graph import code_triples

    code_files = _code_corpus(spark, SF_DIR).localCheckpoint(eager=True)

    def q_code_triples():
        return code_triples(code_files).count()

    bench("code_triples", q_code_triples)

    # 2. full KG pipeline (fused path) on the entity-rich fixture corpus
    from graphrag_rs_spark.fixtures import generate_corpus_distributed
    from graphrag_rs_spark.pipeline import build_graph

    src = generate_corpus_distributed(
        spark, FIXTURE_DOCS, seed=42, entity_density=0.25,
        partitions=int(CPUS) * 2 if CPUS.isdigit() else 64,
    ).localCheckpoint(eager=True)  # exclude generation from timing

    fixture_state = {}

    def q_kg_pipeline():
        tables = build_graph(src, materialize=True)
        n = tables.triples.count()
        fixture_state["mentions"] = tables.mentions
        fixture_state["tables"] = tables
        fixture_state["triples_n"] = n
        return n

    bench("kg_pipeline_fixture", q_kg_pipeline)

    # 3. linking + canonicalization on the fixture entities
    def q_linking():
        entities = rollup_entities(fixture_state["mentions"])
        clusters = link_entities(entities)
        return clusters.count()

    bench("entity_linking_fixture", q_linking)

    # 3b. linking at volume: synthetic 50k-entity catalog with name variants
    # (typos/punctuation/suffix noise) — exercises blocking + CC at a size
    # where an O(n²) sweep would need 1.25B comparisons
    def q_linking_50k():
        n = int(os.environ.get("SPARK_GRAFT_LINK_ENTITIES", "50000"))
        base = spark.range(n).select(
            F.concat(F.lit("PERSON_p"), F.col("id")).alias("entity_id"),
            F.concat(
                F.lit("Person"), (F.col("id") % (n // 10)).cast("string"),
                F.when(F.col("id") % 7 == 0, F.lit(" Jr")).otherwise(F.lit("")),
                F.when(F.col("id") % 11 == 0, F.lit(".")).otherwise(F.lit("")),
            ).alias("name"),
            F.lit("PERSON").alias("entity_type"),
            (F.lit(0.5) + (F.col("id") % 50).cast("float") / 100).alias("confidence"),
            F.lit(1).cast("long").alias("mention_count"),
        )
        return link_entities(base).select("canonical_id").distinct().count()

    bench("entity_linking_50k", q_linking_50k)

    # 3c. communities on the fixture graph (LP + CC refinement)
    def q_communities():
        from graphrag_rs_spark.operators.communities import detect_communities

        tables = fixture_state.get("tables")
        if tables is None:
            return 0
        return detect_communities(tables.triples).select("community_id").distinct().count()

    bench("communities_fixture", q_communities)

    # 4. training-data ops on testdata
    def q_dedup_minhash():
        from graphrag_rs_spark.operators.dedup import minhash_lsh_duplicates

        return minhash_lsh_duplicates(
            docs, text_col="text", id_col="doc_id", threshold=0.5
        ).count()

    bench("dedup_minhash", q_dedup_minhash)

    def q_ann_lsh():
        from graphrag_rs_spark.operators.similarity import cosine_topk_lsh

        return cosine_topk_lsh(emb, dim=64, k=5).count()

    bench("ann_lsh_topk", q_ann_lsh)

    def q_agg_join():
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        return (
            lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
            .groupBy("l_returnflag", "o_orderpriority")
            .agg(F.sum("l_extendedprice").alias("s"), F.count("*").alias("n"))
            .count()
        )

    bench("rel_agg_join", q_agg_join)

    # 5. corpus-curation sweep: the composed keep/drop decision (langid +
    # quality + repetition + PII budget) — a map-only pass whose cost IS
    # the scan; measures per-doc signal throughput at sf
    def q_curation_sweep():
        from graphrag_rs_spark.operators.textstats import curation_decision

        return curation_decision(docs).where(F.col("keep") == 1).count()

    bench("text_curation_sweep", q_curation_sweep)

    # 5b. cross-document boilerplate index (inverted-index shape: explode
    # hashed grams, window doc-frequency, per-doc rollup)
    def q_boilerplate():
        from graphrag_rs_spark.operators.mixture import boilerplate_scores

        return boilerplate_scores(docs, n=3, min_docs=3).where(
            F.col("boilerplate_bp") > 5000
        ).count()

    bench("text_boilerplate", q_boilerplate)

    # 5c. winnowing clone sweep over the code corpus (map-only sketch +
    # ids-only pair join): fingerprint every file, count candidate clone
    # pairs at sim ≥ 0.2 — the sketch cost is linear in content bytes
    def q_code_clones():
        from graphrag_rs_spark.operators.winnow import clone_pairs

        return clone_pairs(
            code_files, min_similarity=0.2, max_fp_bucket=50, id_col="path"
        ).count()

    bench("code_clone_pairs", q_code_clones)

    # 6. composed retrieval ask-path (BM25 + cosine + PPR legs fused by
    # RRF) and the north-star code-KG dependency edges — both have
    # correctness board rows; benched here so their walls get history
    from __spark_entry__ import queries as entry_queries

    entry_q = entry_queries()

    def q_ask_hybrid():
        return entry_q["rel_ask_hybrid"](spark, SF_DIR).count()

    bench("rel_ask_hybrid", q_ask_hybrid)

    def q_code_dependency_edges():
        return entry_q["code_dependency_edges"](spark, SF_DIR).count()

    bench("code_dependency_edges", q_code_dependency_edges)

    def q_code_dup_files():
        # The-Stack step 1 over the code corpus: sha256 exact-dup groups
        return entry_q["code_dup_files"](spark, SF_DIR).count()

    bench("code_dup_files", q_code_dup_files)

    def q_code_chunking():
        # C4 item-boundary chunking wall over the full code corpus
        return entry_q["code_chunking"](spark, SF_DIR).count()

    bench("code_chunking", q_code_chunking)

    def q_exactsubstr():
        # ExactSubstr dedup (Lee et al. 2022): corpus-wide duplicated
        # 8-gram spans — the heaviest gram-shuffle in the dedup family
        return entry_q["text_exactsubstr_spans"](spark, SF_DIR).count()

    bench("text_exactsubstr_spans", q_exactsubstr)

    def q_ann_pq():
        # IVF-PQ ANN: joint integer Lloyd training + ADC bucket scoring
        return entry_q["ann_pq_topk"](spark, SF_DIR).count()

    bench("ann_pq_topk", q_ann_pq)

    total = round(sum(timings.values()), 3)
    kg_secs = timings["kg_pipeline_fixture"]
    triples_per_sec = round(fixture_state["triples_n"] / kg_secs, 1) if kg_secs else 0.0
    print(
        json.dumps(
            {
                "metric": "kg-construction headline (chunk+extract+triples) + ops",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "reps": reps,
                "attempts": attempts,
                "counters": counters,
                "triples_per_sec": triples_per_sec,
                "code_triples_per_sec": round(
                    counters["code_triples"] / timings["code_triples"], 1
                ) if timings.get("code_triples") else 0.0,
                "cpus": CPUS,
                "fixture_docs": FIXTURE_DOCS,
                "env": env_fingerprint(),
                # engine-share scaling gate (BASELINE.md round-5 protocol):
                # SCALING.json is written by the bench/scaling.py +
                # bench/host_ceiling.py same-day runs and embedded verbatim
                # so BENCH_rN.json carries pipeline_eff, host_ceiling and
                # engine_share alongside the walls
                "scaling": _scaling_record(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
