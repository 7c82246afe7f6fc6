"""S3: structured import — CSV/TSV/JSON/JSONL entity & relationship rows.

Reference: pipeline/data_import.rs:29-125 parses pre-made entity and
relationship files with configurable column mappings, batch size and a
max-errors budget. Spark-native form: ``spark.read`` with an explicit
schema, PERMISSIVE mode + ``columnNameOfCorruptRecord`` for the error
budget (a count over the corrupt column replaces per-row error loops),
and column mapping as a plain ``select(alias...)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


@dataclass
class ImportConfig:
    """Mirror of the reference's ImportConfig (data_import.rs:45-86)."""

    format: str = "csv"                      # csv | tsv | json | jsonl
    has_header: bool = True
    max_errors: int = 100
    # source-column → canonical-column mappings
    entity_mapping: dict = field(
        default_factory=lambda: {
            "id": "entity_id", "name": "name", "type": "entity_type",
            "confidence": "confidence",
        }
    )
    relationship_mapping: dict = field(
        default_factory=lambda: {
            "source": "subj", "relation": "pred", "target": "obj",
            "confidence": "confidence",
        }
    )


_CORRUPT = "_corrupt_record"


def _reader(spark: SparkSession, cfg: ImportConfig, columns: list[str]):
    schema = StructType(
        [StructField(c, StringType(), True) for c in columns]
        + [StructField(_CORRUPT, StringType(), True)]
    )
    fmt = cfg.format.lower()
    if fmt in ("csv", "tsv"):
        return (
            spark.read.schema(schema)
            .option("header", str(cfg.has_header).lower())
            .option("sep", "\t" if fmt == "tsv" else ",")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", _CORRUPT)
            .format("csv")
        )
    if fmt in ("json", "jsonl"):
        return (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", _CORRUPT)
            .format("json")
        )
    raise ValueError(f"unsupported import format: {cfg.format}")


def _apply(df: DataFrame, mapping: dict, max_errors: int) -> DataFrame:
    # Spark disallows querying only the corrupt column on raw files — cache
    # the parsed result first (documented requirement of PERMISSIVE mode)
    df = df.cache()
    n_corrupt = df.where(F.col(_CORRUPT).isNotNull()).count()
    if n_corrupt > max_errors:
        raise ValueError(
            f"import aborted: {n_corrupt} corrupt records > max_errors={max_errors}"
        )
    good = df.where(F.col(_CORRUPT).isNull())
    cols = [F.col(src).alias(dst) for src, dst in mapping.items()]
    out = good.select(*cols)
    if "confidence" in mapping.values():
        out = out.withColumn(
            "confidence", F.coalesce(F.col("confidence").cast("float"), F.lit(1.0))
        )
    return out


def import_entities(
    spark: SparkSession, path: str, cfg: ImportConfig | None = None
) -> DataFrame:
    """→ (entity_id, name, entity_type, confidence) from a structured file."""
    cfg = cfg or ImportConfig()
    df = _reader(spark, cfg, list(cfg.entity_mapping.keys())).load(path)
    return _apply(df, cfg.entity_mapping, cfg.max_errors)


def import_relationships(
    spark: SparkSession, path: str, cfg: ImportConfig | None = None
) -> DataFrame:
    """→ (subj, pred, obj, confidence) from a structured file."""
    cfg = cfg or ImportConfig()
    df = _reader(spark, cfg, list(cfg.relationship_mapping.keys())).load(path)
    return _apply(df, cfg.relationship_mapping, cfg.max_errors)


def validate_referential(
    relationships: DataFrame, entities: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """R5: split relationships into (valid, dangling) by semi/anti joins on
    both endpoints (core/mod.rs:394-410 — the reference errors per row;
    callers log-and-skip, build.rs:607-617 → we partition the set instead)."""
    cols = relationships.columns
    ids = entities.select(F.col("entity_id").alias("_eid")).distinct()
    valid = (
        relationships.join(ids.withColumnRenamed("_eid", "subj"), "subj", "left_semi")
        .join(ids.withColumnRenamed("_eid", "obj"), "obj", "left_semi")
        .select(*cols)  # semi-joins reorder join keys to the front; exceptAll
                        # compares positionally, so restore the input order
    )
    dangling = relationships.exceptAll(valid)
    return valid, dangling
