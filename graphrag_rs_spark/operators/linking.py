"""L1-L12: entity linking & canonicalization — blocking + scoring + CC.

The reference links entities with a greedy O(n²) single-pass sweep
(string_similarity_linker.rs:68-124) — explicitly NOT portable to scale
(SURVEY §4). The Spark-first re-expression:

1. **normalize** names with native column fns (linker :167-184 semantics)
2. **block** candidate pairs instead of the n² cross join: a pair is a
   candidate if it shares (entity_type, blocking-key) for any of
   - a name token            (catches jaccard & multi-word jaro-winkler)
   - soundex(first token)    (catches typo/phonetic variants, native F.soundex)
   - normalized 4-char prefix (catches levenshtein≤2 edits beyond position 4
     and jaro-winkler prefix-heavy matches)
   Hot blocks are capped (``max_block_size``): a token shared by thousands
   of entities ("the") can't discriminate, and dropping it bounds the pair
   fan-out per key — the skew guard the north rule asks for.
3. **score** pairs: native ``F.levenshtein`` (gated at max_edit_distance=2),
   token jaccard via array intersect/union, jaro-winkler via an
   Arrow-batched pandas UDF (no native fn), combined with ``F.greatest``
   and the exact-normalized-match shortcut (linker :137-165: max-combiner).
4. **cluster**: edges at sim ≥ min_similarity (default 0.85) → hashmin
   connected components (operators/cc.py). CC merges transitive chains the
   reference's greedy order-dependent sweep may split — an accepted,
   documented deviation (SURVEY §7); thresholds make chains rare.
5. **canonical selection**: per cluster, the max-confidence member, ties
   broken by entity_id for determinism (linker :101-117 picks max
   confidence with unstable ties).
6. **triple rewrite** (L12): broadcast-join the id→canonical map onto subj
   and obj, re-sort the pair, re-dedupe.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from graphrag_rs_spark.config import DEFAULT_CONFIG, PipelineConfig
from graphrag_rs_spark.operators.cc import connected_components


def normalized_name_col(name):
    """Native-fn normalization matching kernel.linking.normalize_string."""
    lowered = F.lower(name)
    stripped = F.regexp_replace(lowered, r"[^a-z0-9\s]", "")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


@F.pandas_udf(DoubleType())
def jaro_winkler_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
    """Arrow-batched Jaro-Winkler (no native Spark function)."""
    from graphrag_rs_spark.kernel.linking import jaro_winkler_similarity

    return pd.Series(
        [
            jaro_winkler_similarity(a or "", b or "")
            for a, b in zip(s1.tolist(), s2.tolist())
        ],
        dtype="float64",
    )


def candidate_pairs(
    entities: DataFrame, *, max_block_size: int = 100, input_rows: int | None = None
) -> DataFrame:
    """Blocked candidate generation: (id_a, norm_a, conf_a, id_b, ...) pairs
    with id_a < id_b sharing any (entity_type, key) block.

    ``input_rows``: pass the (known) entity count to let small inputs skip
    the hot-block guard — when the WHOLE input fits inside one block
    (rows ≤ max_block_size) no key can exceed the cap, so the guard's
    groupBy + broadcast anti-join are provably a no-op and only cost two
    extra shuffles of fixed overhead."""
    base = entities.select(
        "entity_id",
        "entity_type",
        "confidence",
        normalized_name_col(F.col("name")).alias("norm"),
    )

    # array_distinct: a name repeating a token ("new new york") must key
    # once, so block row counts equal DISTINCT entities per block — the
    # hot-block cap means entities, and the small-input guard skip
    # (rows ≤ cap ⇒ no block exceeds the cap) is provable.
    # All three key families (tokens, soundex-of-first-token, 4-char
    # prefix) ride ONE explode over a per-entity key array — one scan and
    # one narrow pipeline instead of a 3-way union that reads the input
    # three times. Family prefixes keep the key spaces disjoint, so the
    # produced (entity, key) multiset is identical to the old union's.
    first_tok = F.split(F.col("norm"), " ").getItem(0)
    keys = F.concat(
        F.transform(
            F.array_distinct(F.split(F.col("norm"), " ")),
            lambda t: F.concat(F.lit("tok:"), t),
        ),
        F.array(F.concat(F.lit("sdx:"), F.soundex(first_tok))),
        F.array(F.concat(F.lit("pre:"), F.substring(F.col("norm"), 1, 4))),
    )
    keyed = base.select(
        "entity_id", "entity_type", "confidence", "norm",
        F.explode(keys).alias("key"),
    ).where(F.col("key").isNotNull())

    # hot-block guard: drop keys with more members than max_block_size
    # (provably a no-op when the whole input fits one block — skipped)
    if input_rows is None or input_rows > max_block_size:
        block_sizes = keyed.groupBy("entity_type", "key").count()
        keyed = keyed.join(
            F.broadcast(
                block_sizes.where(F.col("count") > max_block_size).select("entity_type", "key")
            ),
            ["entity_type", "key"],
            "left_anti",
        )

    a = keyed.select(
        "entity_type", "key",
        F.col("entity_id").alias("id_a"), F.col("norm").alias("norm_a"),
        F.col("confidence").alias("conf_a"),
    )
    b = keyed.select(
        "entity_type", "key",
        F.col("entity_id").alias("id_b"), F.col("norm").alias("norm_b"),
        F.col("confidence").alias("conf_b"),
    )
    return (
        a.join(b, ["entity_type", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .drop("key")
        .dropDuplicates(["id_a", "id_b"])
    )


def score_pairs(
    pairs: DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Max-combiner similarity scoring (linker :127-165) on candidate pairs."""
    # the JW UDF's inputs are two short normalized names — raise the Arrow
    # batch bound from the blob-safe session default (256) so a large pair
    # set doesn't pay thousands of JVM↔Python round-trips (session.py
    # documents the measured cliff; same convention as similarity.py)
    from graphrag_rs_spark.session import request_arrow_batch_rows

    request_arrow_batch_rows(pairs.sparkSession, 65536)
    na, nb = F.col("norm_a"), F.col("norm_b")
    lev_dist = F.levenshtein(na, nb)
    max_len = F.greatest(F.length(na), F.length(nb))
    lev_sim = F.when(
        lev_dist > config.link_max_edit_distance, F.lit(0.0)
    ).otherwise(
        F.when(max_len == 0, F.lit(1.0)).otherwise(
            1.0 - lev_dist.cast("double") / max_len.cast("double")
        )
    )

    ta = F.array_distinct(F.split(na, " "))
    tb = F.array_distinct(F.split(nb, " "))
    union_sz = F.size(F.array_union(ta, tb))
    jac_sim = F.when(union_sz == 0, F.lit(1.0)).otherwise(
        F.size(F.array_intersect(ta, tb)).cast("double") / union_sz.cast("double")
    )

    jw_sim = jaro_winkler_udf(na, nb)

    metrics = [jw_sim, jac_sim]
    if config.link_fuzzy_matching:
        metrics.append(lev_sim)
    if config.link_use_phonetic:
        metrics.append(
            F.when(F.soundex(na) == F.soundex(nb), F.lit(0.9)).otherwise(F.lit(0.0))
        )

    sim = F.when(na == nb, F.lit(1.0)).otherwise(F.greatest(*metrics))
    return pairs.withColumn("similarity", sim)


def _link_entities_sequential(spark, rows, config: PipelineConfig) -> DataFrame:
    """Exact driver-side mirror of the distributed linking path for
    dim-sized inputs (≤ ``config.link_small_input_rows`` entities).

    Same blocking keys (distinct tokens + Spark-soundex of first token +
    4-char prefix, namespaced, per entity_type), same hot-block guard,
    same max-combiner scoring formulas, same min-id connected components,
    same canonical-id/name tie-breaks — parity-tested bit-identical against
    the distributed path (tests/test_linking.py). Motivation: the
    distributed path costs ~26 Spark jobs of fixed scheduling overhead that
    dominate small inputs; the reference linker itself is an in-memory
    sweep (string_similarity_linker.rs:68-124), so a driver-local exact
    path is faithful. Large inputs keep the blocked distributed path.
    """
    from graphrag_rs_spark.kernel.communities import union_find_components
    from graphrag_rs_spark.kernel.linking import (
        jaro_winkler_similarity,
        levenshtein_distance,
        spark_normalize_string,
        spark_soundex,
    )

    # confidence may be NULL: the distributed path's desc() orderBy sorts
    # nulls last, so mirror that instead of crashing in float(None)
    ents = [
        (
            r["entity_id"],
            r["entity_type"],
            None if r["confidence"] is None else float(r["confidence"]),
            r["name"],
        )
        for r in rows
    ]
    # spark_normalize_string, NOT kernel normalize_string: the distributed
    # path's normalized_name_col is ASCII-regex based and the two diverge on
    # non-ASCII names ('Zoë Café' → 'zo caf' vs 'zoë café') — blocking keys
    # and scores must match the plan this path replaces bit for bit
    norms = {
        eid: None if name is None else spark_normalize_string(name)
        for eid, _t, _c, name in ents
    }

    # blocking keys — mirrors candidate_pairs() exactly (note: split on a
    # single space like F.split(norm, " "): an empty norm yields the ""
    # token, and array_distinct keeps one row per (entity, key)); a NULL
    # name produces no keys at all (explode drops the row, concat stays
    # null) so null-named entities are singletons on both paths
    blocks: dict[tuple, list] = {}
    for eid, etype, _conf, _name in ents:
        norm = norms[eid]
        if norm is None:
            continue
        toks = norm.split(" ")
        keys = {f"tok:{t}" for t in toks}
        keys.add(f"sdx:{spark_soundex(toks[0])}")
        keys.add(f"pre:{norm[:4]}")
        for k in keys:
            blocks.setdefault((etype, k), []).append(eid)

    # hot-block guard — same cap, same skip condition as the distributed
    # path (provable no-op when the whole input fits one block)
    max_block = 100
    if len(ents) > max_block:
        blocks = {k: v for k, v in blocks.items() if len(v) <= max_block}

    pairs = set()
    for members in blocks.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))

    # scoring — mirrors score_pairs() formula for formula
    def _score(na: str, nb: str) -> float:
        if na == nb:
            return 1.0
        ta, tb = set(na.split(" ")), set(nb.split(" "))
        union = len(ta | tb)
        jac = 1.0 if union == 0 else len(ta & tb) / union
        metrics = [jaro_winkler_similarity(na, nb), jac]
        if config.link_fuzzy_matching:
            lev = levenshtein_distance(na, nb)
            max_len = max(len(na), len(nb))
            if lev > config.link_max_edit_distance:
                metrics.append(0.0)
            elif max_len == 0:
                metrics.append(1.0)
            else:
                metrics.append(1.0 - lev / max_len)
        if config.link_use_phonetic:
            metrics.append(0.9 if spark_soundex(na) == spark_soundex(nb) else 0.0)
        return max(metrics)

    edges = [
        (a, b)
        for a, b in pairs
        if _score(norms[a], norms[b]) >= config.link_min_similarity
    ]

    comp = union_find_components(edges, [eid for eid, *_ in ents])

    by_comp: dict[str, list] = {}
    for eid, _etype, conf, name in ents:
        by_comp.setdefault(comp[eid], []).append((eid, conf, name))

    out = []
    neg_inf = float("-inf")
    for c, members in by_comp.items():
        canonical_id = min(
            members, key=lambda m: (-(m[1] if m[1] is not None else neg_inf), m[0])
        )[0]
        counts: dict[str, int] = {}
        for _eid, _conf, name in members:
            counts[name] = counts.get(name, 0) + 1
        canonical_name = min(
            counts, key=lambda n: (-counts[n], -len(n or ""), n or "")
        )
        for eid, _conf, _name in members:
            out.append((eid, canonical_id, c, canonical_name))

    return spark.createDataFrame(
        out or [],
        schema="entity_id string, canonical_id string, "
        "cluster_id string, canonical_name string",
    )


def link_entities(
    entities: DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """entities → clusters(entity_id, canonical_id, cluster_id,
    canonical_name).

    Every entity appears exactly once; unlinked entities are their own
    canonical (cluster of one). Canonical *id* = max-confidence member
    (string_similarity_linker.rs:101-117); canonical *name* = the
    cluster's most frequent name, ties broken by longest
    (corpus/entity_linker.rs:524-536 select_canonical_name — the name
    users see on cluster outputs), further ties by name ascending for
    determinism (the reference's HashMap iteration order is unstable
    there).
    """
    # small-input probe (limit+count terminates early on big inputs):
    # entity sets at or under link_small_input_rows run the exact
    # sequential mirror in the driver — one collect + pure-Python kernels
    # instead of ~26 jobs of blocking/scoring/CC fixed overhead (parity-
    # tested bit-identical; the reference linker is itself in-memory).
    # Large inputs take the unchanged distributed path.
    small = config.link_small_input_rows or 0
    probe_cap = max(small, 100)
    n_probe = entities.limit(probe_cap + 1).count()
    if small and n_probe <= small:
        rows = entities.select(
            "entity_id", "entity_type", "confidence", "name"
        ).collect()
        return _link_entities_sequential(entities.sparkSession, rows, config)
    if n_probe <= 100:
        entities = entities.localCheckpoint(eager=True)
        pairs = candidate_pairs(entities, input_rows=n_probe)
    else:
        pairs = candidate_pairs(entities)
    scored = score_pairs(pairs, config)
    edges = scored.where(F.col("similarity") >= config.link_min_similarity).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )

    comp = connected_components(
        edges,
        vertices=entities.select(F.col("entity_id").alias("id")),
    )

    # canonical id + name as window aggregates over ONE pass of the
    # component-joined frame. The previous shape derived `canon` and
    # `cnames` as separate frames and joined them back, which re-computed
    # the comp⋈entities join three times inside one action and paid ~6
    # exchanges; first_value over a full-frame ordered window selects the
    # same rows with 2 exchanges total ((component,name) then component —
    # the two component-partitioned windows share one Exchange).
    joined = comp.join(
        entities.select("entity_id", "confidence", "name"),
        comp["id"] == F.col("entity_id"),
    ).select("entity_id", "component", "confidence", "name")

    # L10 canonical name: most frequent, then longest, then lexical —
    # identical ordering keys to the old groupBy+row_number formulation
    # (count over (component, name) replaces the groupBy count; ties
    # between duplicate rows of one name all carry the same name value)
    wname_n = Window.partitionBy("component", "name")
    wcname = (
        Window.partitionBy("component")
        .orderBy(F.col("_n").desc(), F.length("name").desc(), F.col("name").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    # canonical member: max confidence, ties by entity_id (deterministic)
    wcanon = (
        Window.partitionBy("component")
        .orderBy(F.col("confidence").desc(), F.col("entity_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        joined.withColumn("_n", F.count("*").over(wname_n))
        .select(
            "entity_id",
            F.first("entity_id").over(wcanon).alias("canonical_id"),
            F.col("component").alias("cluster_id"),
            F.first("name").over(wcname).alias("canonical_name"),
        )
    )


def find_canonical(
    new_mentions: DataFrame,
    canonical_entities: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
    *,
    max_block_size: int = 100,
) -> DataFrame:
    """L9: link NEW mentions against an existing canonical dictionary
    (string_similarity_linker.rs:408-465 find_canonical_entity).

    new_mentions(name, entity_type) × canonical_entities(entity_id, name,
    entity_type) → (name, entity_type, canonical_id, similarity) for
    mentions whose best same-type candidate scores ≥ min_similarity
    (max-combiner; exact normalized match short-circuits at 1.0).
    Blocking mirrors candidate_pairs (token / soundex / 4-prefix keys per
    entity_type, hot blocks capped), so the dictionary join never goes
    n×m. Best match per mention, ties by candidate id (the reference
    keeps the first strictly-better candidate — order-dependent; ours is
    deterministic).
    """
    m = new_mentions.select(
        "name", "entity_type", normalized_name_col(F.col("name")).alias("norm_a")
    ).dropDuplicates(["name", "entity_type"])
    d = canonical_entities.select(
        F.col("entity_id").alias("cand_id"),
        "entity_type",
        normalized_name_col(F.col("name")).alias("norm_b"),
    )

    def _keys(df, norm_col):
        tok = df.select(
            *df.columns, F.explode(F.split(F.col(norm_col), " ")).alias("key_raw")
        ).select(*df.columns, F.concat(F.lit("tok:"), F.col("key_raw")).alias("key"))
        sdx = df.select(
            *df.columns,
            F.concat(
                F.lit("sdx:"), F.soundex(F.split(F.col(norm_col), " ").getItem(0))
            ).alias("key"),
        )
        pre = df.select(
            *df.columns,
            F.concat(F.lit("pre:"), F.substring(F.col(norm_col), 1, 4)).alias("key"),
        )
        return tok.unionByName(sdx).unionByName(pre).where(F.col("key").isNotNull())

    dk = _keys(d, "norm_b")
    hot = (
        dk.groupBy("entity_type", "key").count()
        .where(F.col("count") > max_block_size)
        .select("entity_type", "key")
    )
    dk = dk.join(F.broadcast(hot), ["entity_type", "key"], "left_anti")
    mk = _keys(m, "norm_a")

    cand = mk.join(dk, ["entity_type", "key"]).drop("key").dropDuplicates(
        ["name", "entity_type", "cand_id"]
    )
    scored = score_pairs(cand, config)
    w = Window.partitionBy("name", "entity_type").orderBy(
        F.col("similarity").desc(), F.col("cand_id").asc()
    )
    return (
        scored.where(F.col("similarity") >= config.link_min_similarity)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "name",
            "entity_type",
            F.col("cand_id").alias("canonical_id"),
            F.round("similarity", 6).alias("similarity"),
        )
    )


def rewrite_triples(
    triples: DataFrame,
    clusters: DataFrame,
    *,
    broadcast_rows: int = 1_000_000,
) -> DataFrame:
    """L12: remap triples onto canonical ids and re-dedupe.

    The id→canonical map is reduced to its NON-IDENTITY rows before the
    joins — ``link_entities`` emits one row per *entity* (not per
    cluster), so the full map grows with the corpus and broadcasting it
    unconditionally OOMs executors at scale; identity rows carry no
    information (the left join's coalesce already maps unmatched ids to
    themselves). The reduced map is broadcast only while it fits under
    ``broadcast_rows`` (probed with an early-terminating limit+count);
    above that the joins fall back to a plain shuffle. Then
    re-canonicalize pair order and merge context/confidence. Self-loops
    created by canonicalization (two linked entities co-occurring) are
    dropped.
    """
    nonid = clusters.select("entity_id", "canonical_id").where(
        F.col("entity_id") != F.col("canonical_id")
    )
    n_probe = nonid.limit(broadcast_rows + 1).count()
    cmap = F.broadcast(nonid) if n_probe <= broadcast_rows else nonid
    t = (
        triples.join(
            cmap.withColumnRenamed("entity_id", "subj").withColumnRenamed(
                "canonical_id", "subj_canon"
            ),
            "subj",
            "left",
        )
        .join(
            cmap.withColumnRenamed("entity_id", "obj").withColumnRenamed(
                "canonical_id", "obj_canon"
            ),
            "obj",
            "left",
        )
        .select(
            F.coalesce("subj_canon", "subj").alias("s"),
            F.col("pred"),
            F.coalesce("obj_canon", "obj").alias("o"),
            "confidence",
            "context_chunk_ids",
        )
        .where(F.col("s") != F.col("o"))
        .select(
            F.least("s", "o").alias("subj"),
            "pred",
            F.greatest("s", "o").alias("obj"),
            "confidence",
            "context_chunk_ids",
        )
    )
    return t.groupBy("subj", "pred", "obj").agg(
        F.max("confidence").alias("confidence"),
        # inputs are already context-capped upstream; re-cap after the merge
        F.slice(
            F.sort_array(
                F.array_distinct(F.flatten(F.collect_list("context_chunk_ids")))
            ),
            1,
            128,
        ).alias("context_chunk_ids"),
    )


def acronym_candidates(
    canonical: DataFrame,
    mentions: DataFrame,
    *,
    name_col: str = "name",
    mention_col: str = "mention",
    min_words: int = 2,
) -> DataFrame:
    """canonical(name) × mentions(mention) → (mention, name): mentions
    whose upper-cased text equals the initials of a multi-word
    canonical name ("WHO" → "World Health Organization").

    The alias-expansion step the blocking-key linker cannot reach:
    an acronym shares no character n-grams, no soundex, and no token
    with its expansion, so every similarity metric in score_pairs
    scores it ~0.  Key construction is a map-only transform over the
    split name (first letter per word, upper-cased); the match is one
    equi-join on that key.  Single-word names never produce keys
    (``min_words``), so one-letter mentions cannot false-positive.
    Ambiguous acronyms (two expansions sharing initials) surface as
    multiple rows per mention — resolution policy belongs to the
    caller, same contract as find_canonical's candidate frame.
    """
    words = F.split(F.trim(F.col(name_col)), " +")
    acr = F.upper(
        F.array_join(
            F.transform(words, lambda w: F.substring(w, 1, 1)), ""
        )
    )
    keys = canonical.where(F.size(words) >= min_words).select(
        F.col(name_col).alias("name"), acr.alias("_acr")
    )
    return (
        mentions.select(
            F.col(mention_col).alias("mention"),
            F.upper(F.col(mention_col)).alias("_m"),
        )
        .join(keys, F.col("_m") == F.col("_acr"))
        .select("mention", "name")
    )
