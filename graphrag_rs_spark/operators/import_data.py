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


# --- S3 remainder: GraphML + RDF/Turtle (data_import.rs:187-188) ---

GRAPHML_NODES_SCHEMA = "entity_id string, name string, entity_type string"
GRAPHML_EDGES_SCHEMA = "subj string, pred string, obj string"


def import_graphml(spark: SparkSession, path: str):
    """GraphML → (entities DF, relationships DF).

    Reference semantics (data_import.rs:687-830, quick-xml walk): <node
    id=...> with <data key=...> attributes (name/label → name, type →
    entity_type, defaults id/'node'); <edge source=... target=...> with
    data key type/label → relation type (default 'related_to').

    Distributed shape: GraphML is a whole-document XML format (not line
    splittable), so each FILE is one row (``wholetext``) parsed with the
    stdlib ElementTree inside one Arrow pass — a directory of graph files
    parallelizes per file; a single giant file is inherently one task.
    """
    import xml.etree.ElementTree as ET
    from collections.abc import Iterator

    import pandas as pd

    raw = spark.read.text(path, wholetext=True)

    def _strip(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    def parse_nodes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, names, types = [], [], []
            for doc in pdf["value"]:
                root = ET.fromstring(doc)
                for el in root.iter():
                    if _strip(el.tag) != "node":
                        continue
                    nid = el.get("id") or ""
                    attrs = {
                        (d.get("key") or ""): (d.text or "")
                        for d in el
                        if _strip(d.tag) == "data"
                    }
                    ids.append(nid)
                    names.append(attrs.get("name") or attrs.get("label") or nid)
                    types.append(attrs.get("type") or "node")
            yield pd.DataFrame({
                "entity_id": pd.Series(ids, dtype="string"),
                "name": pd.Series(names, dtype="string"),
                "entity_type": pd.Series(types, dtype="string"),
            })

    def parse_edges(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ss, ps, os_ = [], [], []
            for doc in pdf["value"]:
                root = ET.fromstring(doc)
                for el in root.iter():
                    if _strip(el.tag) != "edge":
                        continue
                    attrs = {
                        (d.get("key") or ""): (d.text or "")
                        for d in el
                        if _strip(d.tag) == "data"
                    }
                    ss.append(el.get("source") or "")
                    ps.append(attrs.get("type") or attrs.get("label") or "related_to")
                    os_.append(el.get("target") or "")
            yield pd.DataFrame({
                "subj": pd.Series(ss, dtype="string"),
                "pred": pd.Series(ps, dtype="string"),
                "obj": pd.Series(os_, dtype="string"),
            })

    nodes = raw.mapInPandas(parse_nodes, schema=GRAPHML_NODES_SCHEMA)
    edges = raw.mapInPandas(parse_edges, schema=GRAPHML_EDGES_SCHEMA)
    return nodes, edges


def _local_name(col):
    """RDF local name: segment after the last '#' or '/'
    (data_import.rs extract_local_name)."""
    no_angle = F.regexp_replace(col, r"^<|>$", "")
    return F.element_at(F.split(no_angle, r"[#/]"), -1)


def import_rdf_turtle(spark: SparkSession, path: str):
    """Simple RDF/Turtle (N-Triples-style one-statement-per-line subset) →
    (entities DF, relationships DF).

    Reference semantics (data_import.rs:562-685, oxttl walk): URI objects
    become relationships (predicate local name as type); literal objects
    become entity attributes (label|name → name, type|rdf:type →
    entity_type, default local-name/'resource'); every subject and URI
    object becomes an entity.

    Line-regex parse (no rdf lib in-container): handles `<s> <p> <o> .`
    and `<s> <p> "literal" .` lines; multi-line/prefixed Turtle needs a
    real parser — the seam is this function.
    """
    lines = spark.read.text(path).select(F.trim("value").alias("line")).where(
        (F.col("line") != "") & ~F.col("line").startswith("#") & ~F.col("line").startswith("@")
    )
    pat = r'^(<[^>]+>)\s+(<[^>]+>)\s+(<[^>]+>|"(?:[^"\\]|\\.)*")\s*\.$'
    parsed = lines.select(
        F.regexp_extract("line", pat, 1).alias("s"),
        F.regexp_extract("line", pat, 2).alias("p"),
        F.regexp_extract("line", pat, 3).alias("o"),
    ).where(F.col("s") != "")

    is_uri = F.col("o").startswith("<")
    rels = parsed.where(is_uri).select(
        _local_name(F.col("s")).alias("subj"),
        _local_name(F.col("p")).alias("pred"),
        _local_name(F.col("o")).alias("obj"),
    )

    # strip quotes, then unescape \" and \\ (what a real Turtle parser —
    # the reference's oxttl — does; sentinel keeps \\" unambiguous)
    _val = F.regexp_replace(F.col("o"), r'^"|"$', "")
    _val = F.regexp_replace(_val, r"\\\\", "\x00")
    _val = F.regexp_replace(_val, r'\\"', '"')
    _val = F.regexp_replace(_val, "\x00", r"\\")
    lits = parsed.where(~is_uri).select(
        _local_name(F.col("s")).alias("entity_id"),
        _local_name(F.col("p")).alias("prop"),
        _val.alias("value"),
    )
    subj_ids = parsed.select(_local_name(F.col("s")).alias("entity_id"))
    obj_ids = parsed.where(is_uri).select(_local_name(F.col("o")).alias("entity_id"))
    all_ids = subj_ids.union(obj_ids).distinct()

    attrs = lits.groupBy("entity_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("prop", "value")))
        ).alias("attrs")
    )
    ents = all_ids.join(attrs, "entity_id", "left").select(
        "entity_id",
        F.coalesce(
            F.element_at("attrs", "label"),
            F.element_at("attrs", "name"),
            F.col("entity_id"),
        ).alias("name"),
        F.coalesce(
            F.element_at("attrs", "type"),
            F.element_at("attrs", "rdf:type"),
            F.lit("resource"),
        ).alias("entity_type"),
    )
    return ents, rels
