"""R1+R2: co-occurrence triple generation — mentions self-join, JVM-side typing.

Reference semantics: for every unordered pair of entities mentioned in the
same chunk, emit one triple whose relation type depends on the type pair +
context keywords (entity/mod.rs:812-879; driver loop build.rs:557-624,
confidence = relationship_confidence_threshold, default 0.5).

Spark-first design:
- pair generation is the canonical equi-self-join on chunk_id with
  ``a.entity_id < b.entity_id`` — NOT a per-chunk Python loop. Pair
  explosion per chunk is bounded by chunk_size (a 512-char chunk holds at
  most a few dozen entities), so per-key fan-out is naturally capped; AQE
  skew-join handles residual imbalance.
- relation typing is a pure ``when()`` column expression over the type pair
  and per-chunk keyword flags (computed once per chunk, JVM-side, no UDF).
- canonicalization: (subj, obj) = sorted pair by entity_id; identical-id
  pairs are dropped (documented convention, matches oracle/pipeline.py).
- final dedupe is a groupBy on (subj, pred, obj) with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphrag_rs_spark.config import DEFAULT_CONFIG, PipelineConfig

# context keywords used by relation typing (entity/mod.rs:841-879)
_KEYWORDS = {
    "kw_works_for": "works for",
    "kw_employed_by": "employed by",
    "kw_founded": "founded",
    "kw_ceo": "CEO",
    "kw_born_in": "born in",
    "kw_from": "from",
    "kw_lives_in": "lives in",
    "kw_based_in": "based in",
    "kw_headquartered": "headquartered",
    "kw_married": "married",
    "kw_spouse": "spouse",
    "kw_colleague": "colleague",
    "kw_partner": "partner",
}


def chunk_keyword_flags(chunks: DataFrame) -> DataFrame:
    """Per-chunk boolean keyword flags — one narrow projection, no UDF."""
    cols = [F.col("content").contains(kw).alias(name) for name, kw in _KEYWORDS.items()]
    return chunks.select("chunk_id", *cols)


def _pred_expr(flags_from_bits: bool = False):
    """The when() relation-typing expression (symmetric in the type pair).

    ``flags_from_bits``: read keyword flags from the packed ``kw_bits``
    bitmask instead of individual boolean columns (bit order = _KEYWORDS
    insertion order — mirrored by extract_mentions_fused).
    """
    t1, t2 = F.col("a.entity_type"), F.col("b.entity_type")

    def pair(x, y):
        return ((t1 == x) & (t2 == y)) | ((t1 == y) & (t2 == x))

    if flags_from_bits:
        _order = list(_KEYWORDS)

        def c(name):
            return F.col("kw_bits").bitwiseAND(F.lit(1 << _order.index(name))) != 0
    else:
        c = F.col
    return (
        F.when(
            pair("PERSON", "ORGANIZATION"),
            F.when(c("kw_works_for") | c("kw_employed_by"), "WORKS_FOR")
            .when(c("kw_founded") | c("kw_ceo"), "LEADS")
            .otherwise("ASSOCIATED_WITH"),
        )
        .when(
            pair("PERSON", "LOCATION"),
            F.when(c("kw_born_in") | c("kw_from"), "BORN_IN")
            .when(c("kw_lives_in") | c("kw_based_in"), "LOCATED_IN")
            .otherwise("ASSOCIATED_WITH"),
        )
        .when(
            pair("ORGANIZATION", "LOCATION"),
            F.when(c("kw_headquartered") | c("kw_based_in"), "HEADQUARTERED_IN")
            .otherwise("LOCATED_IN"),
        )
        .when(
            (t1 == "PERSON") & (t2 == "PERSON"),
            F.when(c("kw_married") | c("kw_spouse"), "MARRIED_TO")
            .when(c("kw_colleague") | c("kw_partner"), "COLLEAGUE_OF")
            .otherwise("KNOWS"),
        )
        .otherwise("RELATED_TO")
    )


def extract_triples_fused(
    mentions_flagged: DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Triples from bitmask-carrying mentions (extract_mentions_fused
    output): one groupBy where the per-chunk keyword bitmask rides the
    GROUP KEY (constant within a chunk → no aggregation needed for it),
    in-row pair expansion, salted context dedupe — zero joins."""
    m = mentions_flagged.where(F.col("n_mentions") > 0)
    per_chunk = (
        m.groupBy("chunk_id", "kw_bits")
        .agg(F.collect_list(F.struct("entity_id", "entity_type")).alias("ents"))
        .where(F.size("ents") >= 2)
    )
    pairs = (
        per_chunk.select("*", F.explode("ents").alias("a"))
        .select("*", F.explode("ents").alias("b"))
        .where(F.col("a.entity_id") < F.col("b.entity_id"))
        .drop("ents")
    )
    typed = pairs.select(
        F.col("a.entity_id").alias("subj"),
        _pred_expr(flags_from_bits=True).alias("pred"),
        F.col("b.entity_id").alias("obj"),
        F.col("chunk_id"),
    )
    return _dedupe_triples(typed, config)


def extract_triples(
    mentions: DataFrame,
    chunks: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """mentions + chunks → triples(subj, pred, obj, confidence, context_chunk_ids).

    Two shuffles total: the self-join on chunk_id (flags ride along on the
    same key) and the final (subj, pred, obj) dedupe.
    """
    # only entities with a literal mention participate (build.rs:579-583)
    m = mentions.where(F.col("n_mentions") > 0).select(
        "chunk_id", "entity_id", "entity_type"
    )

    # Pair generation as groupBy + in-row double explode, NOT a shuffle
    # self-join: the per-chunk entity list is bounded by chunk_size (a
    # 512-char chunk holds at most a few dozen entities), so collect_list
    # per chunk is safe and the k² pair expansion happens NARROWLY after
    # the single mentions shuffle. A self-join instead shuffles the
    # mentions table twice and materializes the full pair set through a
    # join — measured 2.5× slower at 31M pairs. Keyword flags are attached
    # per CHUNK (950k-row join) before expansion, never per pair.
    per_chunk = (
        m.groupBy("chunk_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("entity_id", "entity_type"))
            ).alias("ents")
        )
        .where(F.size("ents") >= 2)
    )
    flags = chunk_keyword_flags(chunks)
    enriched = per_chunk.join(flags, "chunk_id")

    pairs = (
        enriched.select("*", F.explode("ents").alias("a"))
        .select("*", F.explode("ents").alias("b"))
        .where(F.col("a.entity_id") < F.col("b.entity_id"))
        .drop("ents")
    )
    typed = pairs.select(
        F.col("a.entity_id").alias("subj"),
        _pred_expr().alias("pred"),
        F.col("b.entity_id").alias("obj"),
        F.col("chunk_id"),
    )

    return _dedupe_triples(typed, config)


def _dedupe_triples(typed: DataFrame, config: PipelineConfig) -> DataFrame:
    """Salted two-phase context aggregation: a hot triple ("Corp" co-occurs
    with a celebrity entity in millions of chunks) would funnel all its
    chunk ids into one reduce task. Phase 1 groups on (triple, salt) so
    the hot key spreads across salt buckets and each partial list is
    capped; phase 2 merges ≤ buckets × K ids and re-caps. Deterministic:
    both phases keep the lexicographically smallest chunk ids."""
    k = config.max_context_chunks
    n_salt = config.salt_buckets * 8
    conf = F.lit(config.relationship_confidence).cast("float")
    partial = (
        typed.groupBy(
            "subj", "pred", "obj",
            F.pmod(F.xxhash64("chunk_id"), F.lit(n_salt)).alias("_salt"),
        )
        .agg(
            F.slice(F.sort_array(F.collect_set("chunk_id")), 1, k).alias("ctx_part")
        )
    )
    return (
        partial.groupBy("subj", "pred", "obj")
        .agg(
            F.slice(
                F.array_sort(F.flatten(F.collect_list("ctx_part"))), 1, k
            ).alias("context_chunk_ids")
        )
        .select("subj", "pred", "obj", conf.alias("confidence"), "context_chunk_ids")
    )


def token_window_pairs(
    chunks: DataFrame,
    gazetteer: DataFrame,
    *,
    window: int,
    doc_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """Proximity co-occurrence: unordered gazetteer-name pairs whose
    token positions lie within ``window`` tokens of each other in the
    same document → (subj, obj, pair_count, min_gap), subj < obj.

    Doc-level co-occurrence (the pipeline's R1 self-join) says two
    entities share a document; PROXIMITY co-occurrence says they share
    a sentence-scale neighbourhood — the standard relation-candidate
    filter when chunks are long. Positions are 1-based indices over
    nonempty lowercase ``[^a-z0-9]+`` tokens (same token space as
    coref.resolve_anaphora, so the two layers compose).

    Scale shape: a doc-keyed self-join is quadratic in mentions-per-doc
    (hub docs explode). Instead each left mention is replicated to its
    band floor(pos/window) and the next band, and the join key is
    (doc, band): any pair within ``window`` spans at most one band
    boundary, so every candidate meets EXACTLY once (right band equals
    the left's own band, or its successor — never both, since
    pos_b > pos_a forces band_b ∈ {band_a, band_a+1}). Per-key fan-out
    is bounded by the mention count inside 2·window tokens regardless
    of document size. Same banding family as the interval-overlap join.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    from graphrag_rs_spark.operators.extraction import GAZETTEER_MAX_ROWS

    if gazetteer.limit(GAZETTEER_MAX_ROWS + 1).count() > GAZETTEER_MAX_ROWS:
        raise ValueError(
            f"gazetteer exceeds {GAZETTEER_MAX_ROWS} rows — it is "
            "broadcast (see gazetteer_mentions for the rationale and "
            "the blocked alternative)"
        )
    toks = (
        chunks.select(
            F.col(doc_col).alias("doc"),
            F.posexplode(
                F.split(F.lower(F.col(content_col)), "[^a-z0-9]+")
            ).alias("_raw_pos", "tok"),
        )
        .where(F.col("tok") != "")
        .select(
            "doc",
            F.row_number()
            .over(Window.partitionBy("doc").orderBy("_raw_pos"))
            .alias("pos"),
            "tok",
        )
    )
    g = F.broadcast(
        gazetteer.select(F.lower(F.col("name")).alias("tok")).distinct()
    )
    m = toks.join(g, "tok").select(
        "doc", "pos", F.col("tok").alias("name"),
        F.floor(F.col("pos") / window).cast("long").alias("band"),
    )
    left = m.select(
        "doc", F.col("pos").alias("pos_a"), F.col("name").alias("name_a"),
        F.explode(F.array(F.col("band"), F.col("band") + 1)).alias("band"),
    )
    right = m.select(
        "doc", "band", F.col("pos").alias("pos_b"),
        F.col("name").alias("name_b"),
    )
    cand = left.join(right, ["doc", "band"]).where(
        (F.col("pos_b") > F.col("pos_a"))
        & (F.col("pos_b") - F.col("pos_a") <= window)
        & (F.col("name_a") != F.col("name_b"))
    )
    return (
        cand.select(
            F.least("name_a", "name_b").alias("subj"),
            F.greatest("name_a", "name_b").alias("obj"),
            (F.col("pos_b") - F.col("pos_a")).alias("gap"),
        )
        .groupBy("subj", "obj")
        .agg(
            F.count("*").alias("pair_count"),
            F.min("gap").alias("min_gap"),
        )
    )


def pmi_edges(
    doc_entity: DataFrame,
    *,
    doc_col: str = "doc_id",
    entity_col: str = "entity_id",
    min_pair_count: int = 1,
) -> DataFrame:
    """(N)PMI-weighted co-occurrence edges: (doc, entity) membership →
    (subj, obj, pair_count, pmi, npmi), subj < obj.

        pmi  = ln( P(a,b) / (P(a)·P(b)) )  with P over documents
        npmi = pmi / -ln P(a,b)            (∈ [-1, 1], 1 ⟺ always together)

    PMI is the standard significance re-weighting for raw co-occurrence
    edges (count alone promotes frequent-everywhere entities; PMI keeps
    pairs that co-occur MORE than their popularity predicts). Same self-
    join shape as the pipeline's triple generation, then two key-joins
    against per-entity document frequencies; N rides along as a 1-row
    broadcast aggregate, so there is no driver action.
    """
    # materialize the (doc, entity) membership once: the N aggregate,
    # the per-entity frequencies and both pairing sides otherwise re-run
    # the upstream mention derivation once each (4 evaluations per call)
    m = doc_entity.select(
        F.col(doc_col).alias("doc"), F.col(entity_col).alias("eid")
    ).distinct().localCheckpoint(eager=True)
    nd = m.agg(F.count_distinct("doc").cast("double").alias("_n"))
    df_e = m.groupBy("eid").agg(F.count("*").cast("double").alias("df"))
    a = m.select("doc", F.col("eid").alias("subj"))
    b = m.select("doc", F.col("eid").alias("obj"))
    pairs = (
        a.join(b, "doc")
        .where(F.col("subj") < F.col("obj"))
        .groupBy("subj", "obj")
        .agg(F.count("*").alias("pair_count"))
        .where(F.col("pair_count") >= min_pair_count)
    )
    joined = (
        pairs.join(df_e.select(F.col("eid").alias("subj"), F.col("df").alias("_dfa")), "subj")
        .join(df_e.select(F.col("eid").alias("obj"), F.col("df").alias("_dfb")), "obj")
        .crossJoin(F.broadcast(nd))
    )
    p_ab = F.col("pair_count").cast("double") / F.col("_n")
    pmi = F.log(p_ab * F.col("_n") * F.col("_n") / (F.col("_dfa") * F.col("_dfb")))
    npmi = F.when(p_ab >= 1.0, F.lit(1.0)).otherwise(pmi / -F.log(p_ab))
    return joined.select(
        "subj",
        "obj",
        "pair_count",
        F.round(pmi, 6).alias("pmi"),
        F.round(npmi, 6).alias("npmi"),
    )
