"""Entity linking: blocking completeness, scoring parity, CC clustering,
canonical selection, triple rewrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.config import PipelineConfig
from graphrag_rs_spark.operators.cc import connected_components
from graphrag_rs_spark.operators.linking import (
    candidate_pairs,
    link_entities,
    rewrite_triples,
    score_pairs,
)
from graphrag_rs_spark.oracle.linker import cluster_pairs, link_entities_greedy
from graphrag_rs_spark.schemas import ENTITIES_SCHEMA


def _entities(spark, rows):
    data = [
        {
            "entity_id": r[0],
            "name": r[1],
            "entity_type": r[2],
            "confidence": float(r[3]),
            "mention_count": 1,
        }
        for r in rows
    ]
    return spark.createDataFrame(data, schema=ENTITIES_SCHEMA)


REF_CASES = [
    # typo-tolerant canonical match (string_similarity_linker.rs:528-562)
    ("PERSON_jonsmith", "Jon Smith", "PERSON", 0.9),
    ("PERSON_jhonsmith", "Jhon Smith", "PERSON", 0.7),
    # exact-after-normalization (ACME Corp. vs acme corp, :520-525)
    ("ORGANIZATION_acmecorp", "ACME Corp.", "ORGANIZATION", 0.95),
    ("ORGANIZATION_acmecorp2", "acme corp", "ORGANIZATION", 0.6),
    # near-dup locations (:564-613): "New York" vs "New York City"
    ("LOCATION_newyork", "New York", "LOCATION", 0.9),
    ("LOCATION_newyorkcity", "New York City", "LOCATION", 0.8),
    # unrelated
    ("PERSON_alicejohnson", "Alice Johnson", "PERSON", 0.8),
    ("ORGANIZATION_initech", "Initech", "ORGANIZATION", 0.9),
    # type gate: same name, different type must NOT link
    ("PERSON_berlin", "Berlin", "PERSON", 0.6),
    ("LOCATION_berlin", "Berlin", "LOCATION", 0.9),
]


def test_cc_basic(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["src", "dst"]
    )
    verts = spark.createDataFrame([(v,) for v in "abcxyz"], ["id"])
    got = {
        (r["id"], r["component"])
        for r in connected_components(edges, verts).collect()
    }
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"),
        ("x", "x"), ("y", "x"), ("z", "z"),
    }


def test_cc_chain_converges(spark):
    # long path exercises multiple supersteps + checkpoint cadence
    n = 24
    edges = spark.createDataFrame(
        [(f"v{i:02d}", f"v{i+1:02d}") for i in range(n)], ["src", "dst"]
    )
    comp = connected_components(edges)
    assert comp.select("component").distinct().count() == 1
    assert comp.count() == n + 1


def test_blocking_catches_reference_pairs(spark):
    ents = _entities(spark, REF_CASES)
    pairs = {(r["id_a"], r["id_b"]) for r in candidate_pairs(ents).collect()}
    must_have = [
        ("PERSON_jhonsmith", "PERSON_jonsmith"),
        ("ORGANIZATION_acmecorp", "ORGANIZATION_acmecorp2"),
        ("LOCATION_newyork", "LOCATION_newyorkcity"),
    ]
    for a, b in must_have:
        assert (min(a, b), max(a, b)) in pairs


def test_scoring_matches_kernel(spark):
    from graphrag_rs_spark.kernel.linking import compute_similarity

    ents = _entities(spark, REF_CASES)
    scored = score_pairs(candidate_pairs(ents)).collect()
    names = {r[0]: (r[1], r[2]) for r in REF_CASES}
    for row in scored:
        name_a, type_a = names[row["id_a"]]
        name_b, type_b = names[row["id_b"]]
        want = compute_similarity(name_a, name_b, type_a, type_b)
        assert row["similarity"] == pytest.approx(want, abs=1e-6), (
            row["id_a"], row["id_b"],
        )


def test_link_entities_matches_greedy_pair_f1(spark):
    ents = _entities(spark, REF_CASES)
    clusters = link_entities(ents).collect()
    got_links = {
        r["entity_id"]: r["canonical_id"]
        for r in clusters
        if r["entity_id"] != r["canonical_id"]
    }
    all_ids = [r[0] for r in REF_CASES]
    golden_links = link_entities_greedy(
        [
            {"entity_id": r[0], "name": r[1], "entity_type": r[2], "confidence": r[3]}
            for r in REF_CASES
        ]
    )
    got_pairs = cluster_pairs(got_links, all_ids)
    want_pairs = cluster_pairs(golden_links, all_ids)
    # transitive-closure differences tolerated (FIXTURES.md §2); on this
    # fixture there are none
    assert got_pairs == want_pairs
    # canonical = max-confidence member
    canon = {r["entity_id"]: r["canonical_id"] for r in clusters}
    assert canon["PERSON_jhonsmith"] == "PERSON_jonsmith"
    assert canon["ORGANIZATION_acmecorp2"] == "ORGANIZATION_acmecorp"
    # type gate held
    assert canon["PERSON_berlin"] == "PERSON_berlin"
    assert canon["LOCATION_berlin"] == "LOCATION_berlin"


def test_every_entity_exactly_once(spark):
    ents = _entities(spark, REF_CASES)
    clusters = link_entities(ents)
    assert clusters.count() == len(REF_CASES)
    assert clusters.select("entity_id").distinct().count() == len(REF_CASES)


def test_rewrite_triples(spark):
    clusters = spark.createDataFrame(
        [
            ("PERSON_jhonsmith", "PERSON_jonsmith", "PERSON_jhonsmith"),
            ("PERSON_jonsmith", "PERSON_jonsmith", "PERSON_jhonsmith"),
            ("LOCATION_boston", "LOCATION_boston", "LOCATION_boston"),
        ],
        ["entity_id", "canonical_id", "cluster_id"],
    )
    triples = spark.createDataFrame(
        [
            ("PERSON_jhonsmith", "BORN_IN", "LOCATION_boston", 0.5, ["c1"]),
            ("PERSON_jonsmith", "BORN_IN", "LOCATION_boston", 0.5, ["c2"]),
            # self-loop after canonicalization → dropped
            ("PERSON_jhonsmith", "KNOWS", "PERSON_jonsmith", 0.5, ["c3"]),
        ],
        ["subj", "pred", "obj", "confidence", "context_chunk_ids"],
    )
    got = rewrite_triples(triples, clusters).collect()
    assert len(got) == 1
    row = got[0]
    assert (row["subj"], row["pred"], row["obj"]) == (
        "LOCATION_boston", "BORN_IN", "PERSON_jonsmith",
    )
    assert sorted(row["context_chunk_ids"]) == ["c1", "c2"]


def test_link_fixture_corpus_pair_f1(spark):
    """Corpus-scale golden: distributed blocking+CC vs the greedy reference
    sweep on the entities extracted from the full fixture corpus (includes
    the near-dup edge cases). Scored by cluster-pair F1 ≥ 0.9 — greedy
    order-dependence vs transitive CC is the documented tolerance."""
    from graphrag_rs_spark.fixtures import generate_corpus
    from graphrag_rs_spark.oracle import build_golden

    corpus = generate_corpus(n_docs=20, seed=42, include_edge_cases=True)
    golden_entities = build_golden(corpus)["entities"]
    ents = spark.createDataFrame(
        [
            {
                "entity_id": e["entity_id"],
                "name": e["name"],
                "entity_type": e["entity_type"],
                "confidence": float(e["confidence"]),
                "mention_count": e["mention_count"],
            }
            for e in golden_entities
        ],
        schema=ENTITIES_SCHEMA,
    )
    clusters = link_entities(ents).collect()
    got_links = {
        r["entity_id"]: r["canonical_id"]
        for r in clusters
        if r["entity_id"] != r["canonical_id"]
    }
    all_ids = [e["entity_id"] for e in golden_entities]
    golden_links = link_entities_greedy(
        [
            {k: e[k] for k in ("entity_id", "name", "entity_type", "confidence")}
            for e in golden_entities
        ]
    )
    got_pairs = cluster_pairs(got_links, all_ids)
    want_pairs = cluster_pairs(golden_links, all_ids)
    assert want_pairs, "oracle found no links — fixture lost its near-dups"

    # (1) CC never misses a greedy link (greedy links ARE threshold edges)
    assert want_pairs <= got_pairs, want_pairs - got_pairs

    # (2) CC equals EXACTLY the transitive closure of the reference's
    # pairwise similarity relation — every extra merge is justified by a
    # path of ≥τ edges (e.g. "Alice Johnson"–"Johnson Alice" bridges two
    # clusters the order-dependent greedy sweep keeps apart; FIXTURES.md §2
    # documents this as the tolerated deviation)
    import itertools

    from graphrag_rs_spark.kernel.linking import compute_similarity

    parent = {e["entity_id"]: e["entity_id"] for e in golden_entities}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(golden_entities, 2):
        if compute_similarity(
            a["name"], b["name"], a["entity_type"], b["entity_type"]
        ) >= 0.85:
            parent[find(a["entity_id"])] = find(b["entity_id"])
    closure_groups: dict[str, list[str]] = {}
    for eid in all_ids:
        closure_groups.setdefault(find(eid), []).append(eid)
    closure_pairs = set()
    for members in closure_groups.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                closure_pairs.add((ms[i], ms[j]))
    assert got_pairs == closure_pairs


def test_link_config_threshold(spark):
    # at min_similarity=1.0 only exact-normalized matches link
    ents = _entities(spark, REF_CASES)
    cfg = PipelineConfig(link_min_similarity=1.0)
    canon = {
        r["entity_id"]: r["canonical_id"] for r in link_entities(ents, cfg).collect()
    }
    assert canon["ORGANIZATION_acmecorp2"] == "ORGANIZATION_acmecorp"  # exact after norm
    assert canon["PERSON_jhonsmith"] == "PERSON_jhonsmith"  # typo no longer links


def test_canonical_name_most_frequent_then_longest(spark):
    # L10 (corpus/entity_linker.rs:524-536): name frequency wins, then length
    ents = _entities(spark, [
        ("PERSON_a1", "Jon Smith", "PERSON", 0.5),
        ("PERSON_a2", "Jon Smith", "PERSON", 0.6),
        ("PERSON_a3", "Jon Smithe", "PERSON", 0.99),  # max confidence, rare name
    ])
    rows = link_entities(ents).collect()
    assert len({r["cluster_id"] for r in rows}) == 1
    # canonical id = max-confidence member; canonical NAME = most frequent
    assert all(r["canonical_id"] == "PERSON_a3" for r in rows)
    assert all(r["canonical_name"] == "Jon Smith" for r in rows)


def test_canonical_name_length_tiebreak(spark):
    ents = _entities(spark, [
        ("PERSON_b1", "Jon Smith", "PERSON", 0.5),
        ("PERSON_b2", "Jonn Smith", "PERSON", 0.5),  # 1 edit, same freq, longer
    ])
    rows = link_entities(ents).collect()
    assert len({r["cluster_id"] for r in rows}) == 1
    assert all(r["canonical_name"] == "Jonn Smith" for r in rows)


def test_find_canonical_exact_fuzzy_and_type_gate(spark):
    from graphrag_rs_spark.operators.linking import find_canonical

    dictionary = _entities(spark, [
        ("PERSON_jonsmith", "Jon Smith", "PERSON", 0.9),
        ("ORGANIZATION_acme", "ACME Corp", "ORGANIZATION", 0.9),
        ("PERSON_mariacurie", "Maria Curie", "PERSON", 0.9),
    ])
    mentions = spark.createDataFrame(
        [
            ("jon smith", "PERSON"),        # exact after normalization
            ("Jhon Smith", "PERSON"),       # typo -> fuzzy match
            ("ACME Corp", "PERSON"),        # right name, wrong type -> no link
            ("Zzyzx Quux", "PERSON"),       # nothing similar -> no link
        ],
        ["name", "entity_type"],
    )
    got = {
        (r["name"], r["entity_type"]): (r["canonical_id"], r["similarity"])
        for r in find_canonical(mentions, dictionary).collect()
    }
    assert got[("jon smith", "PERSON")][0] == "PERSON_jonsmith"
    assert got[("jon smith", "PERSON")][1] == 1.0
    assert got[("Jhon Smith", "PERSON")][0] == "PERSON_jonsmith"
    assert ("ACME Corp", "PERSON") not in got
    assert ("Zzyzx Quux", "PERSON") not in got


def test_cc_non_superset_vertices_paths_agree(spark):
    """Review regression: when `vertices` is NOT a superset of edge
    endpoints, the union-find fast path must match the distributed path —
    edges touching a non-vertex endpoint propagate nothing, and the ghost
    endpoint never appears in the output or bridges components."""
    edges = spark.createDataFrame([("a", "x"), ("x", "b")], ["src", "dst"])
    verts = spark.createDataFrame([("a",), ("b",)], ["id"])

    fast = {(r["id"], r["component"])
            for r in connected_components(edges, verts).collect()}
    dist = {(r["id"], r["component"])
            for r in connected_components(edges, verts, collect_threshold=0).collect()}
    assert fast == dist == {("a", "a"), ("b", "b")}


# --- sequential small-input path: bit-parity vs the distributed path ---

def _both_paths(spark, rows, **cfg_kwargs):
    ents = _entities(spark, rows)
    seq = link_entities(ents, PipelineConfig(**cfg_kwargs))
    dist = link_entities(
        ents, PipelineConfig(link_small_input_rows=0, **cfg_kwargs)
    )
    key = lambda r: (r[0], r[1], r[2], r[3])
    return sorted(map(tuple, seq.collect()), key=key), sorted(
        map(tuple, dist.collect()), key=key
    )


def test_sequential_matches_distributed_reference_cases(spark):
    seq, dist = _both_paths(spark, REF_CASES)
    assert seq == dist


def test_sequential_matches_distributed_phonetic_config(spark):
    seq, dist = _both_paths(
        spark, REF_CASES, link_use_phonetic=True, link_min_similarity=0.8
    )
    assert seq == dist


def test_sequential_matches_distributed_variant_family(spark):
    # the 50k-bench generator shape at a parity-testable size: 300 entities
    # in 30 ground-truth families with Jr/./punctuation noise
    rows = []
    for i in range(300):
        name = f"Person{i % 30}" + (" Jr" if i % 7 == 0 else "") + (
            "." if i % 11 == 0 else ""
        )
        rows.append((f"PERSON_p{i}", name, "PERSON", 0.5 + (i % 50) / 100))
    seq, dist = _both_paths(spark, rows)
    assert seq == dist
    assert len(seq) == 300  # every entity exactly once
    # NOTE: at this size the "jr" token block is under the hot-block cap, so
    # Jr-suffixed names legitimately chain families together (at 50k rows
    # that token is hot and dropped, which is why the bench gets exactly
    # n/10 clusters there) — cluster count is NOT asserted here, only
    # bit-parity between the two paths


def test_sequential_matches_distributed_hot_block_guard(spark):
    # 150 entities sharing the token "corp" (> max_block_size=100): the
    # guard drops the hot token key on both paths; pairs must still form
    # via the distinct-name tokens and both paths must agree exactly
    rows = [
        (f"ORGANIZATION_o{i}", f"Name{i % 40} corp", "ORGANIZATION", 0.9)
        for i in range(150)
    ]
    seq, dist = _both_paths(spark, rows)
    assert seq == dist


def test_sequential_matches_distributed_edge_names(spark):
    rows = [
        ("PERSON_a", "", "PERSON", 0.9),          # empty name
        ("PERSON_b", "", "PERSON", 0.8),          # empty pairs with empty
        ("PERSON_c", "3M", "PERSON", 0.7),        # digit-leading token
        ("PERSON_d", "3M Co", "PERSON", 0.6),
        ("PERSON_e", "x", "PERSON", 0.5),         # single char
        ("ORGANIZATION_f", "", "ORGANIZATION", 0.4),  # empty, other type
    ]
    seq, dist = _both_paths(spark, rows)
    assert seq == dist


def test_sequential_matches_distributed_non_ascii(spark):
    # ADVICE r03 (high): the distributed norm is ASCII-regex based
    # ('Zoë Café' → 'zo caf') while kernel normalize_string is Unicode
    # ('zoë café') — the sequential path must mirror the DISTRIBUTED
    # semantics or linking output silently changes when the row count
    # crosses link_small_input_rows. NBSP (\xa0) is NOT Java \s, so it is
    # stripped (not a token separator): 'Jon\xa0Smith' norms to 'jonsmith'.
    rows = [
        ("PERSON_zoe1", "Zoë Café", "PERSON", 0.9),
        ("PERSON_zoe2", "Zoe Cafe", "PERSON", 0.8),
        ("PERSON_zoe3", "Zo Caf", "PERSON", 0.7),
        ("PERSON_nbsp", "Jon\u00a0Smith", "PERSON", 0.9),
        ("PERSON_plain", "Jon Smith", "PERSON", 0.8),
        ("PERSON_accent", "émile zola", "PERSON", 0.85),
        ("PERSON_noaccent", "mile zola", "PERSON", 0.65),
        ("ORGANIZATION_uni", "Münster Universität", "ORGANIZATION", 0.9),
    ]
    for extra in ({}, {"link_use_phonetic": True}):
        seq, dist = _both_paths(spark, rows, link_min_similarity=0.8, **extra)
        assert seq == dist
    # the ASCII mirror links the stripped equivalents exactly-on-norm
    seq, _ = _both_paths(spark, rows, link_min_similarity=0.99)
    clusters = {r[0]: r[2] for r in seq}
    assert clusters["PERSON_zoe1"] == clusters["PERSON_zoe3"]


def test_sequential_null_confidence(spark):
    # ADVICE r03 (low): a NULL confidence must not crash the sequential
    # path; canonical selection mirrors desc() = nulls-last ordering
    data = [
        ("PERSON_a", "Jon Smith", "PERSON", None, 1),
        ("PERSON_b", "Jon Smith", "PERSON", 0.5, 1),
        ("PERSON_c", "Jhon Smith", "PERSON", None, 1),
    ]
    schema = (
        "entity_id string, name string, entity_type string, "
        "confidence float, mention_count long"
    )
    ents = spark.createDataFrame(data, schema=schema)
    seq = link_entities(ents, PipelineConfig())
    dist = link_entities(ents, PipelineConfig(link_small_input_rows=0))
    key = lambda r: tuple(r)
    seq_rows = sorted(map(tuple, seq.collect()), key=key)
    assert seq_rows == sorted(map(tuple, dist.collect()), key=key)
    # max-confidence member wins over both nulls
    assert all(r[1] == "PERSON_b" for r in seq_rows)


def test_spark_soundex_parity(spark):
    """kernel.spark_soundex must equal F.soundex over the blocking-key
    domain (normalized names: [a-z0-9 ]) plus pinned semantic probes."""
    from graphrag_rs_spark.kernel.linking import spark_soundex

    vocab = [
        "", "a", "3m", "42", "smith", "smyth", "robert", "rupert",
        "ashcraft", "ashcroft", "tymczak", "pfister", "honeyman", "x1a",
        "aaa", "hhh", "wh", "bfpv", "o", "ieee", "person7", "p7x", "acme",
        "llc", "jr", "co", "p1p", "php", "pap", "pyp", "pwp", "p12345p",
        "a1", "zzzzzzz", "s1m1t1h", "mc3donald",
        # non-ASCII: Spark soundex walks bytes, so é is a non-letter there
        # (first-char gate returns input unchanged; mid-string it resets
        # the dedup like a digit) — ADVICE r03
        "émile", "zoë", "café", "müller", "née", "ß", "a b", "æon",
    ]
    # plus every first-token of the fixture corpus names
    from graphrag_rs_spark.fixtures import generate_corpus
    from graphrag_rs_spark.kernel.linking import normalize_string

    for d in generate_corpus(n_docs=12, seed=42):
        for w in normalize_string(d["content"])[:2000].split(" "):
            if w:
                vocab.append(w)
    vocab = sorted(set(vocab))
    df = spark.createDataFrame([(v,) for v in vocab], "s string")
    got = {r["s"]: r["x"] for r in df.select("s", F.soundex("s").alias("x")).collect()}
    for v in vocab:
        assert spark_soundex(v) == got[v], repr(v)


def test_acronym_candidates(spark):
    from graphrag_rs_spark.operators.linking import acronym_candidates

    canonical = spark.createDataFrame(
        [("World Health Organization",), ("United Nations",), ("Japan",)],
        "name string",
    )
    mentions = spark.createDataFrame(
        [("WHO",), ("who",), ("UN",), ("J",), ("WHAT",), ("World",)],
        "mention string",
    )
    rows = {
        (r["mention"], r["name"])
        for r in acronym_candidates(canonical, mentions).collect()
    }
    assert rows == {
        ("WHO", "World Health Organization"),
        ("who", "World Health Organization"),  # case-folded match
        ("UN", "United Nations"),
        # "J" blocked by min_words; "WHAT"/"World" match no initials
    }


def test_linking_cc_hub_key_bounded_skew(spark):
    """North-rule skew validation (r05 VERDICT item 8): a celebrity name
    shared by thousands of entities must not melt the candidate join or
    the CC that follows. The hot-block guard drops indiscriminate keys,
    so pair fan-out stays near-linear and per-partition work (the task-
    time proxy observable without a listener) stays balanced."""
    from pyspark.sql import functions as F

    from graphrag_rs_spark.operators.cc import connected_components
    from graphrag_rs_spark.operators.linking import candidate_pairs, score_pairs

    n, hub = 20_000, 4_000
    ents = spark.range(n).select(
        F.concat(F.lit("E"), F.col("id")).alias("entity_id"),
        F.when(F.col("id") < hub, F.lit("Celebrity Hubperson"))
        .otherwise(F.concat(F.lit("Unique Name"), F.col("id").cast("string")))
        .alias("name"),
        F.lit("PERSON").alias("entity_type"),
        F.lit(0.9).alias("confidence"),
    )
    pairs = candidate_pairs(ents).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    # the celebrity block alone would be ~8M pairs; the guard caps blocks
    # at 100 members, so total pair fan-out stays near-linear in n
    assert n_pairs < 20 * n, n_pairs

    by_part = (
        pairs.withColumn("p", F.spark_partition_id())
        .groupBy("p").count().collect()
    )
    sizes = sorted(r["count"] for r in by_part)
    if len(sizes) >= 4 and sizes[len(sizes) // 2] > 0:
        ratio = sizes[-1] / sizes[len(sizes) // 2]
        # bounded max/median partition work — no single hot task
        assert ratio < 10, (ratio, sizes[-5:])

    edges = (
        score_pairs(pairs)
        .where(F.col("similarity") >= 0.85)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    comp = connected_components(
        edges, vertices=ents.select(F.col("entity_id").alias("id"))
    )
    # completes without a straggler explosion and covers every entity
    assert comp.count() == n
