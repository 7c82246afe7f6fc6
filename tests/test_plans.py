"""Physical-plan audits: the optimizations we rely on must actually appear
in the plan — filter pushdown to the parquet scan, column pruning,
broadcast for dim joins, whole-stage codegen on hot relational paths, and
map-side partial aggregation. Catches regressions that correctness tests
can't see (a plan that scans every column still returns the right rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def parquet_docs(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "docs")
    from graphrag_rs_spark.fixtures import generate_corpus
    from graphrag_rs_spark.schemas import SOURCE_SCHEMA

    spark.createDataFrame(
        generate_corpus(n_docs=30, include_edge_cases=False), SOURCE_SCHEMA
    ).write.parquet(path)
    return spark.read.parquet(path)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark, parquet_docs):
    df = parquet_docs.where(F.col("lang") == "rust").select("repo", "path")
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "lang" in plan.split("PushedFilters")[1][:200]


def test_column_pruning(spark, parquet_docs):
    df = parquet_docs.select("repo", "path")
    plan = _plan(df)
    # ReadSchema must not include the wide content column
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "content" not in read_schema


def test_fused_extraction_prunes_columns(spark, parquet_docs):
    from graphrag_rs_spark.operators.extraction import extract_mentions_fused
    from graphrag_rs_spark.operators.ingest import ingest_documents

    df = extract_mentions_fused(ingest_documents(parquet_docs))
    plan = _plan(df)
    # the scan feeding the UDF needs only the identity + content columns
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "content" in read_schema
    assert "lang" not in read_schema


def test_broadcast_dim_join(spark, parquet_docs):
    gaz = spark.createDataFrame([("alpha", "CONCEPT")], ["name", "entity_type"])
    from graphrag_rs_spark.operators.extraction import gazetteer_mentions

    chunks = parquet_docs.select(
        F.col("path").alias("chunk_id"), F.col("path").alias("doc_id"),
        F.col("content"),
    )
    plan = _plan(gazetteer_mentions(chunks, gaz))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_triple_rewrite_broadcasts_cluster_map(spark):
    from graphrag_rs_spark.operators.linking import rewrite_triples

    triples = spark.createDataFrame(
        [("a", "KNOWS", "b", 0.5, ["c1"])],
        "subj string, pred string, obj string, confidence float, context_chunk_ids array<string>",
    )
    clusters = spark.createDataFrame(
        [("a", "a", "a")], ["entity_id", "canonical_id", "cluster_id"]
    )
    plan = _plan(rewrite_triples(triples, clusters))
    assert "BroadcastExchange" in plan


def test_triple_rewrite_shuffle_fallback_above_threshold(spark):
    # above ``broadcast_rows`` the id→canonical map must NOT be pinned as a
    # broadcast (a full entity-sized map OOMs executors at scale): the join
    # falls back to a plain shuffle join, and results stay identical because
    # identity rows are redundant under the left join's coalesce
    from graphrag_rs_spark.operators.linking import rewrite_triples

    triples = spark.createDataFrame(
        [("a", "KNOWS", "b", 0.5, ["c1"]), ("b", "KNOWS", "c", 0.4, ["c2"])],
        "subj string, pred string, obj string, confidence float, context_chunk_ids array<string>",
    )
    clusters = spark.createDataFrame(
        [("b", "a", "a"), ("a", "a", "a")],
        ["entity_id", "canonical_id", "cluster_id"],
    )
    out = rewrite_triples(triples, clusters, broadcast_rows=0)
    plan = _plan(out)
    assert "BroadcastHashJoin" not in plan
    rows = {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}
    # b→a: (a,KNOWS,b)→(a,a) self-loop dropped; (b,KNOWS,c)→(a,KNOWS,c) kept
    assert rows == {("a", "KNOWS", "c")}
    # sanity on the broadcast path: same inputs, same (empty) result
    rows_b = {
        (r["subj"], r["pred"], r["obj"])
        for r in rewrite_triples(triples, clusters).collect()
    }
    assert rows_b == rows


def test_map_side_partial_aggregation(spark, parquet_docs):
    # AQE formatted plans don't label WholeStageCodegen spans; the property
    # that matters at scale is the partial (map-side) aggregate before the
    # exchange — hot keys combine before shuffling
    df = (
        parquet_docs.where(F.col("lang") == "text")
        .groupBy("repo")
        .agg(F.count("*").alias("n"))
    )
    plan = _plan(df)
    assert "partial_count" in plan
    assert plan.index("partial_count") < plan.index("Exchange") or "Exchange" in plan


def test_triples_partial_aggregation(spark, parquet_docs):
    """The context dedupe must show a partial (map-side) aggregation before
    the exchange — hot keys collapse before shuffling."""
    from graphrag_rs_spark.operators.extraction import extract_mentions_fused
    from graphrag_rs_spark.operators.ingest import ingest_documents
    from graphrag_rs_spark.operators.relationships import extract_triples_fused

    flagged = extract_mentions_fused(ingest_documents(parquet_docs))
    plan = _plan(extract_triples_fused(flagged))
    # ObjectHashAggregate (collect_set/list) appears in partial + final pairs
    assert plan.count("ObjectHashAggregate") >= 2 or plan.count("HashAggregate") >= 2


def test_minhash_band_join_ships_ids_only(spark, parquet_docs):
    """The band self-join must NOT shuffle the shingle arrays — round 2's
    ids-only rework. Assert no Exchange in the plan carries the `sh`
    column (shingles are rejoined once, AFTER the pair dedupe)."""
    from graphrag_rs_spark.operators.dedup import minhash_lsh_duplicates

    docs = parquet_docs.select(F.col("path").alias("doc_id"), F.col("content").alias("text"))
    plan = _plan(minhash_lsh_duplicates(docs, "text", "doc_id"))
    # structural check on the formatted plan: every Exchange node's Input
    # list that contains band/bucket must not also contain sh
    import re
    for m in re.finditer(r"\(\d+\) Exchange[\s\S]*?Input \[\d+\]: \[([^\]]*)\]", plan):
        cols = m.group(1)
        if "band" in cols and "bucket" in cols:
            assert "sh#" not in cols, f"band exchange carries shingles: {cols}"


def test_simhash_single_pass_signature(spark, parquet_docs):
    """Signatures come from ONE explode + hash-aggregate pass (64 partial
    sums), not 64 interpreted per-row folds: the plan must contain a
    partial aggregate over the exploded tokens."""
    from graphrag_rs_spark.operators.dedup import simhash_signatures

    docs = parquet_docs.select(F.col("path").alias("doc_id"), F.col("content").alias("text"))
    plan = _plan(simhash_signatures(docs, "text", "doc_id"))
    assert "Generate explode" in plan or "Generate" in plan
    assert "partial_sum" in plan


def test_find_canonical_blocks_not_cartesian(spark):
    """L9 must block the dictionary join — no CartesianProduct, no
    BroadcastNestedLoopJoin over the full mention×dictionary space."""
    from graphrag_rs_spark.operators.linking import find_canonical

    mentions = spark.createDataFrame([("Jon Smith", "PERSON")], ["name", "entity_type"])
    dictionary = spark.createDataFrame(
        [("PERSON_jonsmith", "Jon Smith", "PERSON", 0.9, 1)],
        "entity_id string, name string, entity_type string, confidence float, mention_count long",
    )
    plan = _plan(find_canonical(mentions, dictionary))
    assert "CartesianProduct" not in plan


def test_enrich_heading_asof_no_range_join(spark):
    """Heading-path resolution must be ONE as-of window pass, not a
    chunks×headings range join (the round-2 verdict scale caveat: a
    heading-dense doc made one doc's join pairs explode). The plan for
    the as-of stage must contain a Window and NO join at all."""
    from graphrag_rs_spark.operators.enrich import _asof_headings, extract_headings

    docs = spark.createDataFrame(
        [("d1", "# A\ntext\n## B\nmore text here\n### C\ntail")],
        ["doc_id", "content"],
    )
    chunks = spark.createDataFrame(
        [("c1", "d1", 5, "text"), ("c2", "d1", 20, "more")],
        ["chunk_id", "doc_id", "start_offset", "content"],
    )
    df = _asof_headings(chunks, extract_headings(docs))
    plan = _plan(df)
    assert "Window" in plan
    assert "Join" not in plan, plan
    # and it resolves the same paths the per-level semantics demand
    rows = {r["chunk_id"]: (r["chapter"], r["section"], r["subsection"])
            for r in df.collect()}
    assert rows["c1"] == ("A", None, None)
    assert rows["c2"] == ("A", "B", None)


def test_gazetteer_size_guard(spark):
    """A big dictionary must fail fast, not silently broadcast into an
    O(chunks x dict) nested-loop contains scan."""
    from graphrag_rs_spark.operators.extraction import gazetteer_mentions

    chunks = spark.createDataFrame(
        [("c1", "d1", "alpha text")], ["chunk_id", "doc_id", "content"]
    )
    big = spark.range(20_001).select(
        F.concat(F.lit("name"), F.col("id")).alias("name"),
        F.lit("CONCEPT").alias("entity_type"),
    )
    with pytest.raises(ValueError, match="gazetteer has more than"):
        gazetteer_mentions(chunks, big)
    # small dictionaries still work
    small = spark.createDataFrame([("alpha", "CONCEPT")], ["name", "entity_type"])
    assert gazetteer_mentions(chunks, small).count() == 1


def test_cross_doc_fuzzy_plan_no_cartesian(spark):
    """Fuzzy cross-doc linking must stay blocked: key equi-joins only,
    never a nested-loop/cartesian pairing of names."""
    from graphrag_rs_spark.operators.cross_doc import _fuzzy_clusters

    ents = spark.createDataFrame(
        [("e1", "Apple Inc"), ("e2", "Apple Inc."), ("e3", "Zebra")],
        ["entity_id", "name"],
    )
    plan = _plan(_fuzzy_clusters(ents, 0.85))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_semantic_merge_plan_no_cartesian(spark):
    from graphrag_rs_spark.operators.semantic_merging import semantic_merge_decisions

    ents = spark.createDataFrame(
        [("e1", "Apple", "ORG", 0.9), ("e2", "Apple Inc", "ORG", 0.8)],
        ["entity_id", "name", "entity_type", "confidence"],
    )
    groups = spark.createDataFrame([("e1", "g1"), ("e2", "g1")], ["id", "dup_group_id"])
    plan = _plan(semantic_merge_decisions(ents, groups))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_curation_decision_is_map_only(spark, parquet_docs):
    # the composed keep/drop gate must stay a single scan-project pass:
    # any Exchange here would turn a 100 TB map-only sweep into a shuffle
    from graphrag_rs_spark.operators.textstats import curation_decision

    df = curation_decision(
        parquet_docs.select("repo", "path", F.col("content").alias("text"))
    )
    plan = _plan(df)
    assert "Exchange" not in plan
    # scan + project only — no joins, aggregates, or sorts sneak in
    # (the array higher-order fns keep the projection out of codegen,
    # but it is still a single JVM-side narrow pass)
    assert "Join" not in plan and "Aggregate" not in plan and "Sort" not in plan
    assert "Scan parquet" in plan


def test_boilerplate_single_text_scan(spark, parquet_docs):
    # the doc-frequency index must ride a window count, not a groupBy +
    # self-join: the join formulation recomputes the tokenize/explode
    # subtree (a second full scan of the 100 TB text column). Exactly one
    # scan may read the text column; the zero-gram restore join probes
    # with ids only.
    from graphrag_rs_spark.operators.mixture import boilerplate_scores

    df = boilerplate_scores(
        parquet_docs.select(
            F.col("path").alias("doc_id"), F.col("content").alias("text")
        ),
        n=3,
        min_docs=2,
    )
    plan = _plan(df)
    # detail sections: "(N) Scan parquet" followed by its ReadSchema
    import re

    scans = re.findall(r"\(\d+\) Scan parquet.*?ReadSchema: (\S+)", plan, re.S)
    assert len(scans) == 2, scans  # gram pass + ids-only restore
    assert sum("content" in s for s in scans) == 1, (
        "text column must be scanned exactly once: " + str(scans)
    )
    # the zero-gram restore must not reread text (ids only)
    assert any(s == "struct<path:string>" for s in scans), scans
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_mixture_rate_gate_is_map_only_prefilter(spark, parquet_docs):
    # the stratified rate gate must run BEFORE the domain-cap window so
    # the only shuffle sees post-sample survivors, and as a pushable
    # filter on the scan side (no Exchange under the Filter)
    from graphrag_rs_spark.operators.mixture import mixture_sample

    df = mixture_sample(
        parquet_docs.select(
            F.col("path").alias("doc_id"),
            F.col("repo").alias("lang"),
            F.col("repo").alias("source"),
        ),
        rates_ppm={"r": 500_000},
        default_ppm=100_000,
        domain_cap=5,
    )
    plan = _plan(df)
    import re

    # exactly one Exchange: the window's hash partitioning on domain
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1
    # the u < rate gate runs directly on the scan output, pre-shuffle
    tree = plan.split("(1) Scan parquet")[0]
    scan_side = tree.split("Exchange")[-1]  # nodes BELOW the exchange
    assert "Filter" in scan_side
    # Spark 4 bonus pinned: the domain cap's top-k runs map-side too
    assert "WindowGroupLimit" in scan_side


def test_negative_samples_no_cartesian(spark):
    """The draw join must be an equi-join on bucket — a cartesian/BNLJ
    against the vertex table would explode at scale. The only nested-loop
    allowed is the intentional k-row broadcast of sample indices."""
    from graphrag_rs_spark.operators.linkpred import negative_samples

    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(30)], ["src", "dst"]
    )
    plan = _plan(negative_samples(edges, k=3, num_buckets=8))
    assert "CartesianProduct" not in plan
    # bucket must appear as a join key (sort-merge or shuffled hash)
    assert "bucket" in plan


def test_contrastive_triplets_no_cartesian(spark):
    from graphrag_rs_spark.operators.dedup import contrastive_triplets

    pairs = spark.createDataFrame([(1, 2), (3, 4)], ["id_a", "id_b"])
    ids = spark.createDataFrame([(i,) for i in range(50)], ["id"])
    plan = _plan(contrastive_triplets(pairs, ids))
    assert "CartesianProduct" not in plan
    assert "bucket" in plan


def test_featprop_partial_aggregation(spark):
    """The neighbor-sum per (id, pos) must partially aggregate map-side
    (two HashAggregate levels) — this is what keeps the exploded
    propagation one shuffle of (id, pos, partial) per round."""
    from graphrag_rs_spark.operators.featprop import feature_propagation

    edges = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    feats = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("b", [0.0, 1.0]), ("c", [3.0, 0.0])],
        ["id", "features"],
    )
    plan = _plan(feature_propagation(edges, feats, rounds=1))
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_select_representatives_single_window(spark):
    """One window over the group key — no joins, no extra shuffles."""
    from graphrag_rs_spark.operators.dedup import select_representatives

    members = spark.createDataFrame(
        [("a", "g", 1)], ["id", "dup_group_id", "quality"]
    )
    plan = _plan(select_representatives(members))
    assert "Window" in plan
    assert "Join" not in plan


@pytest.fixture(scope="module")
def parquet_code(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans_code") / "files")
    spark.createDataFrame(
        [
            (
                f"r{i % 3}",
                (f"tests/test_f{i}.py" if i % 4 == 0 else f"src/f{i}.py"),
                "python",
                f"import m{i % 5}\nx = {i}\n",
            )
            for i in range(30)
        ],
        "repo string, path string, lang string, content string",
    ).write.parquet(path)
    return spark.read.parquet(path)


def _read_schemas(plan: str) -> list[str]:
    return [s.split("\n")[0] for s in plan.split("ReadSchema: ")[1:]]


def _node_no(plan: str, predicate) -> int:
    """Smallest detail-node number whose block satisfies predicate.
    Nodes are numbered bottom-up (children first), so 'runs earlier'
    == 'smaller number'."""
    import re

    best = None
    for m in re.finditer(r"\n\((\d+)\) (\w+)", plan):
        end = plan.find("\n(", m.end())
        block = plan[m.start(): end if end != -1 else len(plan)]
        if predicate(int(m.group(1)), m.group(2), block):
            n = int(m.group(1))
            best = n if best is None else min(best, n)
    assert best is not None, "no matching plan node"
    return best


def _partial_before_exchange(plan: str) -> bool:
    agg = _node_no(plan, lambda n, op, b: "partial_count" in b)
    exch = _node_no(plan, lambda n, op, b: op == "Exchange")
    return agg < exch


def test_duplicate_file_groups_combines_map_side(spark, parquet_code):
    from graphrag_rs_spark.operators.code_quality import duplicate_file_groups

    plan = _plan(duplicate_file_groups(parquet_code))
    # two-phase distinct-repo agg: the partial combine must run BEFORE the
    # first exchange so only (sha, repo, partial counts) rows ship
    assert "partial_count" in plan
    assert _partial_before_exchange(plan)


def test_external_api_usage_prunes_stem_side(spark, parquet_code):
    from graphrag_rs_spark.operators.code_graph import external_api_usage

    plan = _plan(external_api_usage(parquet_code))
    schemas = _read_schemas(plan)
    # the stem (provider) scan must not read the wide content column —
    # only the import-extraction side touches it
    assert sum("content" in s for s in schemas) == 1, schemas
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan


def test_test_link_edges_never_reads_content(spark, parquet_code):
    from graphrag_rs_spark.operators.code_graph import test_link_edges

    plan = _plan(test_link_edges(parquet_code))
    # linking is purely path-based: content pruned from EVERY scan
    assert all("content" not in s for s in _read_schemas(plan))
    assert "CartesianProduct" not in plan


def test_line_churn_partial_aggregation(spark, parquet_code):
    from graphrag_rs_spark.operators.diff import line_churn

    new = parquet_code.withColumn("content", F.concat("content", F.lit("z\n")))
    plan = _plan(line_churn(parquet_code, new))
    # per-(keys, line) counts combine map-side before each exchange
    assert "partial_count" in plan
    assert _partial_before_exchange(plan)


def test_identifier_subtokens_partial_aggregation(spark, parquet_code):
    from graphrag_rs_spark.operators.code_graph import (
        extract_defs,
        identifier_subtokens,
    )

    plan = _plan(identifier_subtokens(extract_defs(parquet_code)))
    assert "partial_count" in plan
    assert _partial_before_exchange(plan)


def test_unused_imports_no_exchange(spark, parquet_code):
    from graphrag_rs_spark.operators.code_graph import unused_imports

    plan = _plan(unused_imports(parquet_code))
    # map-only contract: import array + token array in one projection,
    # explode, filter — never a shuffle
    assert "Exchange" not in plan


def test_doc_coverage_partial_aggregation(spark, parquet_code):
    from graphrag_rs_spark.operators.code_quality import doc_coverage

    import re

    plan = _plan(doc_coverage(parquet_code))
    # exactly the (repo, lang) groupBy shuffles (each node prints once
    # in the detail section as "(n) Exchange")
    assert len(re.findall(r"\n\(\d+\) Exchange", plan)) == 1
    agg = _node_no(plan, lambda n, op, b: op == "HashAggregate" and "partial" in b)
    exch = _node_no(plan, lambda n, op, b: op == "Exchange")
    assert agg < exch


def test_tech_debt_prefilter_before_explode(spark, parquet_code):
    from graphrag_rs_spark.operators.code_quality import tech_debt_markers

    plan = _plan(tech_debt_markers(parquet_code))
    assert "Exchange" not in plan  # map-only
    # formatted-plan numbering is leaf-first: the file-level rlike
    # pre-filter must carry a SMALLER number than the Generate so
    # marker-free files never explode their lines
    gen = _node_no(plan, lambda n, op, b: op == "Generate")
    filt = _node_no(
        plan, lambda n, op, b: op == "Filter" and "RLIKE" in b and "content" in b
    )
    assert filt < gen


def test_rake_no_cartesian(spark):
    from graphrag_rs_spark.operators.rake import rake_keyphrases

    docs = spark.createDataFrame(
        [(i, f"alpha beta {i} and gamma delta") for i in range(20)],
        "doc_id long, text string",
    )
    plan = _plan(rake_keyphrases(docs))
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_token_window_pairs_no_cartesian_broadcast_gaz(spark):
    from graphrag_rs_spark.operators.relationships import token_window_pairs

    c = spark.createDataFrame(
        [("d", "spark joins the stream")], "doc_id string, content string"
    )
    g = spark.createDataFrame(
        [("spark", "CONCEPT"), ("stream", "CONCEPT")],
        "name string, entity_type string",
    )
    plan = _plan(token_window_pairs(c, g, window=5))
    # the gazetteer join broadcasts, the pair join is a (doc, band)
    # equi-join — never a cartesian product
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_resolve_anaphora_single_window_no_pair_join(spark):
    from graphrag_rs_spark.operators.coref import resolve_anaphora

    c = spark.createDataFrame(
        [("d", "alice said it")], "doc_id string, content string"
    )
    g = spark.createDataFrame(
        [("alice", "PERSON")], "name string, entity_type string"
    )
    plan = _plan(resolve_anaphora(c, g, anaphors=["it"]))
    # resolution is ONE window over the token stream: the only join in
    # the plan is the broadcast gazetteer lookup — no self-join, no
    # range join, no cartesian
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Window") >= 1


def test_exact_bow_groups_single_exchange_partial_agg(spark):
    from graphrag_rs_spark.operators.dedup import exact_bow_groups

    df = spark.createDataFrame(
        [("a", "x y"), ("b", "y x")], "doc_id string, text string"
    )
    plan = _plan(exact_bow_groups(df))
    # group stats aggregate partially map-side before the hash shuffle
    assert "partial_count" in plan or "partial" in plan.lower()
    assert "CartesianProduct" not in plan
