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

from pyspark.sql import DataFrame
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


def _pred_expr():
    """The when() relation-typing expression (symmetric in the type pair)."""
    t1, t2 = F.col("type_a"), F.col("type_b")

    def pair(x, y):
        return ((t1 == x) & (t2 == y)) | ((t1 == y) & (t2 == x))

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

    a = m.select(
        "chunk_id",
        F.col("entity_id").alias("id_a"),
        F.col("entity_type").alias("type_a"),
    )
    b = m.select(
        "chunk_id",
        F.col("entity_id").alias("id_b"),
        F.col("entity_type").alias("type_b"),
    )
    pairs = a.join(b, "chunk_id").where(F.col("id_a") < F.col("id_b"))

    flags = chunk_keyword_flags(chunks)
    typed = pairs.join(flags, "chunk_id").select(
        F.col("id_a").alias("subj"),
        _pred_expr().alias("pred"),
        F.col("id_b").alias("obj"),
        F.col("chunk_id"),
    )

    conf = F.lit(config.relationship_confidence).cast("float")
    return (
        typed.groupBy("subj", "pred", "obj")
        .agg(F.sort_array(F.collect_set("chunk_id")).alias("context_chunk_ids"))
        .select("subj", "pred", "obj", conf.alias("confidence"), "context_chunk_ids")
    )
