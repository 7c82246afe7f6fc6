"""L10: cross-document entity linking — the five reference strategies.

Reference: corpus/entity_linker.rs (LinkingStrategy :30-42, dispatch
:144-158). Transcribed semantics:

- similarity = RAW-name edit ratio ``1 − lev/max_len`` with an exact
  short-circuit (:480-493) — note: NOT the normalized/multi-metric L1
  scorer; the cross-doc linker compares verbatim names;
- **exact** (:170-209): one cluster per identical name, confidence 1.0,
  document_frequency = member count (the reference counts entities);
- **fuzzy(threshold)** (:212-272): greedy seed clustering at the edit
  ratio. Distributed as similarity edges ≥ threshold + connected
  components — the same greedy→CC substitution as L1, validated there by
  pair-F1 against the greedy oracle; canonical name = most frequent then
  longest (select_canonical_name :524-536), cluster confidence =
  threshold;
- **semantic(threshold)** (:275-293): the reference's own placeholder
  falls back to fuzzy at ``0.8 × threshold`` (a real embedding provider
  is the out-of-scope S7 slot; embedding_cosine_duplicates is the seam);
- **lmcd(confidence_threshold)** (:295-377): first-seen-order exact
  clustering where a NEW name >0.9-similar to an existing cluster key is
  diverted to per-entity singletons (key clusters get confidence +0.1,
  singletons −0.1). "First seen" has no distributed meaning — min
  entity_id per name is the documented deterministic order surrogate;
  the key/diverted fixpoint is resolved greedily on the (small)
  name-level similarity graph, exactly as the sequential loop would;
- **hybrid** (:379-430): names with >1 entity → exact clusters at
  confidence 1.0; singleton-name entities → fuzzy at 0.85.

Scale shape: pair generation is blocked (lowercase token + 4-prefix
keys, hot-block cap) — never all-pairs. The lmcd greedy collects ONLY
the >0.9-similar name pairs plus their endpoint order ids — the
pair-ADJACENT names, hard-guarded at LMCD_MAX_NAME_PAIRS; names with no
similar neighbor never reach the driver (they are keys by definition and
stay distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.cc import connected_components

LMCD_MAX_NAME_PAIRS = 1_000_000


def edit_ratio_sim(na, nb):
    """calculate_string_similarity (:480-493): raw names, no cap."""
    lev = F.levenshtein(na, nb)
    mx = F.greatest(F.length(na), F.length(nb))
    return (
        F.when(na == nb, F.lit(1.0))
        .when(mx == 0, F.lit(1.0))
        .otherwise(F.lit(1.0) - lev.cast("double") / mx.cast("double"))
    )


def _name_blocked_pairs(names: DataFrame, *, max_block_size: int = 200) -> DataFrame:
    """(name_a, name_b) candidate pairs over DISTINCT raw names, blocked
    on lowercase tokens + 4-char prefix (superset of any edit-ratio match
    worth scoring; scoring decides)."""
    base = names.select(F.col("name"), F.lower("name").alias("low"))
    tok = base.select(
        "name", F.explode(F.split("low", r"\s+")).alias("key")
    ).where(F.col("key") != "")
    pre = base.select("name", F.substring("low", 1, 4).alias("key"))
    keyed = tok.unionByName(pre)
    hot = keyed.groupBy("key").count().where(F.col("count") > max_block_size)
    keyed = keyed.join(F.broadcast(hot.select("key")), "key", "left_anti")
    a = keyed.select("key", F.col("name").alias("name_a"))
    b = keyed.select("key", F.col("name").alias("name_b"))
    return (
        a.join(b, "key")
        .where(F.col("name_a") < F.col("name_b"))
        .drop("key")
        .dropDuplicates(["name_a", "name_b"])
    )


def _canonical_names(members: DataFrame) -> DataFrame:
    """select_canonical_name (:524-536): most frequent, then longest,
    then lexical (determinism tiebreak) per cluster."""
    counts = members.groupBy("cluster_id", "name").agg(F.count("*").alias("n"))
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n").desc(), F.length("name").desc(), F.col("name").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("cluster_id", F.col("name").alias("canonical_name"))
    )


def _exact_clusters(entities: DataFrame, confidence) -> DataFrame:
    w = Window.partitionBy("name")
    return entities.select(
        "entity_id",
        F.concat(F.lit("cluster_"), F.min("entity_id").over(w)).alias("cluster_id"),
        F.col("name").alias("canonical_name"),
        F.lit(confidence).cast("double").alias("confidence_score"),
        F.count("*").over(w).alias("document_frequency"),
    )


def _fuzzy_clusters(entities: DataFrame, threshold: float) -> DataFrame:
    names = entities.select("name").distinct()
    scored = _name_blocked_pairs(names).withColumn(
        "sim", edit_ratio_sim(F.col("name_a"), F.col("name_b"))
    )
    name_edges = scored.where(F.col("sim") >= threshold)
    # same-name entities always cluster (sim = 1.0 ≥ any threshold ≤ 1)
    ids = entities.select("entity_id", "name")
    ea = ids.withColumnRenamed("name", "name_a").withColumnRenamed("entity_id", "src")
    eb = ids.withColumnRenamed("name", "name_b").withColumnRenamed("entity_id", "dst")
    cross_edges = name_edges.join(ea, "name_a").join(eb, "name_b").select("src", "dst")
    w = Window.partitionBy("name")
    same_edges = ids.select(
        F.col("entity_id").alias("src"),
        F.min("entity_id").over(w).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    comp = connected_components(
        cross_edges.unionByName(same_edges),
        vertices=entities.select(F.col("entity_id").alias("id")),
    )
    members = comp.join(
        ids, comp["id"] == ids["entity_id"]
    ).select(
        "entity_id", "name",
        F.concat(F.lit("cluster_"), F.col("component")).alias("cluster_id"),
    )
    # document_frequency hardcoded 1 for fuzzy clusters — reference quirk
    # (:255; exact clusters count members, fuzzy ones don't)
    return members.join(_canonical_names(members), "cluster_id").select(
        "entity_id",
        "cluster_id",
        "canonical_name",
        F.lit(float(threshold)).alias("confidence_score"),
        F.lit(1).cast("long").alias("document_frequency"),
    )


def _lmcd_clusters(entities: DataFrame, confidence_threshold: float) -> DataFrame:
    # name-level order surrogate + similarity graph
    names = entities.groupBy("name").agg(F.min("entity_id").alias("first_id"))
    pairs = (
        _name_blocked_pairs(names.select("name"))
        .withColumn("sim", edit_ratio_sim(F.col("name_a"), F.col("name_b")))
        .where((F.col("sim") > 0.9) & (F.col("name_a") != F.col("name_b")))
        .select("name_a", "name_b")
    )
    # the driver sees ONLY pair-adjacent names (their first-seen order
    # rides the collected pair rows): a name with no >0.9 neighbor can
    # never be diverted, so it is a key by definition and stays
    # distributed — the previous shape collected EVERY distinct name,
    # which is unbounded at corpus scale while the pair set is guarded.
    # Driver bound: ≤ 2 × LMCD_MAX_NAME_PAIRS names. Guard probe and
    # collect are ONE action (limit+collect; the inner joins on `names`
    # preserve pair count exactly, so len() is the pair count).
    fid_a = names.select(
        F.col("name").alias("name_a"), F.col("first_id").alias("fid_a")
    )
    fid_b = names.select(
        F.col("name").alias("name_b"), F.col("first_id").alias("fid_b")
    )
    pair_rows = (
        pairs.join(fid_a, "name_a").join(fid_b, "name_b")
        .limit(LMCD_MAX_NAME_PAIRS + 1)
        .collect()
    )
    if len(pair_rows) > LMCD_MAX_NAME_PAIRS:
        raise ValueError(
            f"lmcd: >{LMCD_MAX_NAME_PAIRS} >0.9-similar name pairs - the "
            "name-level greedy cannot be resolved driver-side; dedupe "
            "names first (dedup/minhash) or use strategy='fuzzy'"
        )
    order: dict[str, str] = {}
    adj: dict[str, list[str]] = {}
    for r in pair_rows:
        order[r["name_a"]] = r["fid_a"]
        order[r["name_b"]] = r["fid_b"]
        adj.setdefault(r["name_a"], []).append(r["name_b"])
        adj.setdefault(r["name_b"], []).append(r["name_a"])
    # greedy in first-seen order: a name keys a cluster unless an
    # EARLIER name that itself became a key is >0.9-similar (:313-329).
    # Restricting the sweep to adjacent names is exact: non-adjacent
    # names are neighbors of nothing, so they key their own cluster and
    # never influence an adjacent name's disposition.
    keys: set[str] = set()
    for name in sorted(order, key=lambda n: order[n]):
        if not any(nb in keys for nb in adj.get(name, ())):
            keys.add(name)
    diverted = [n for n in order if n not in keys]
    spark = entities.sparkSession
    disposition = spark.createDataFrame(
        [(n, True) for n in diverted], "name string, diverted boolean"
    )
    # NULL-named entities drop out, matching the previous inner-join-on-
    # name shape (NULL never equi-joins)
    tagged = (
        entities.where(F.col("name").isNotNull())
        .join(F.broadcast(disposition), "name", "left")
        .withColumn("is_key", F.col("diverted").isNull())
    )
    wk = Window.partitionBy("name")
    # document_frequency hardcoded 1 — reference quirk (:343)
    keyed = tagged.where(F.col("is_key")).select(
        "entity_id",
        F.concat(F.lit("lmcd_cluster_"), F.min("entity_id").over(wk)).alias("cluster_id"),
        F.col("name").alias("canonical_name"),
        F.lit(confidence_threshold + 0.1).alias("confidence_score"),
        F.lit(1).cast("long").alias("document_frequency"),
    )
    singletons = tagged.where(~F.col("is_key")).select(
        "entity_id",
        F.concat(F.lit("lmcd_singleton_"), F.col("entity_id")).alias("cluster_id"),
        F.col("name").alias("canonical_name"),
        F.lit(confidence_threshold - 0.1).alias("confidence_score"),
        F.lit(1).cast("long").alias("document_frequency"),
    )
    return keyed.unionByName(singletons)


def link_cross_document(
    entities: DataFrame,
    *,
    strategy: str = "hybrid",
    threshold: float = 0.85,
    confidence_threshold: float = 0.8,
) -> DataFrame:
    """entities(entity_id, name) → (entity_id, cluster_id,
    canonical_name, confidence_score, document_frequency) under the
    chosen reference strategy ("exact" | "fuzzy" | "semantic" | "lmcd" |
    "hybrid"; dispatch = corpus/entity_linker.rs:144-158)."""
    if strategy == "exact":
        return _exact_clusters(entities, 1.0)
    if strategy == "fuzzy":
        return _fuzzy_clusters(entities, threshold)
    if strategy == "semantic":
        # the reference's own placeholder: fuzzy at 0.8x (:288-292);
        # embedding providers are the out-of-scope S7 slot
        return _fuzzy_clusters(entities, threshold * 0.8)
    if strategy == "lmcd":
        return _lmcd_clusters(entities, confidence_threshold)
    if strategy == "hybrid":
        name_counts = entities.groupBy("name").agg(F.count("*").alias("n"))
        multi = entities.join(
            name_counts.where(F.col("n") > 1).select("name"), "name"
        )
        single = entities.join(
            name_counts.where(F.col("n") == 1).select("name"), "name"
        )
        return _exact_clusters(multi, 1.0).unionByName(
            _fuzzy_clusters(single, 0.85)
        )
    raise ValueError(f"unknown cross-document linking strategy: {strategy}")
