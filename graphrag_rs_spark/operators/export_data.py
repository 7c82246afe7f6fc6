"""Graph export: GraphML and RDF/Turtle sinks that round-trip the importers.

The reference's data_import module is import-only (data_import.rs:562-830);
users exporting a KG to graph tooling (Gephi, Neo4j bulk load, SPARQL
stores) re-serialize by hand. These are the matching sinks, designed for
the importer's exact dialects so export → import is lossless.

Scale shapes:

- **RDF/Turtle** is line-oriented: each entity/triple renders to
  N-Triples lines with pure column expressions (no UDF) and lands via
  ``df.write.text`` — fully parallel, one part file per partition.
- **GraphML** is a whole-document XML format (one root element), so a
  100 TB graph cannot be ONE file. The exporter shards the graph into
  ``shards`` self-contained GraphML documents — nodes hash-assigned by
  id, each edge stored with its source's shard — renders each shard's
  document in one applyInPandas pass, and lands the documents through
  Spark's own writer (``write.partitionBy("shard").text``): one row per
  shard ⇒ exactly one part file per ``shard=N/`` directory, written by
  executors through the cluster filesystem, no driver-side ``open()``
  (round-4 ADVICE: plain local-file writes inside a UDF only work on a
  single host / shared mount). import_graphml reads the directory back
  (one row per file, wholetext; partition discovery descends into the
  shard dirs) and unions — the same contract its docstring already
  promises for multi-file input.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: exported URIs are <BASE_URI + local_name>; '/' as the final separator is
#: what import_rdf_turtle's local-name split keys on
DEFAULT_BASE_URI = "http://kg.local/"


def _ttl_escape(col):
    """Escape a string for an N-Triples literal: backslash then quote."""
    return F.regexp_replace(
        F.regexp_replace(col, r"\\", r"\\\\"), '"', r'\\"'
    )


def rdf_lines(
    entities: DataFrame,
    relationships: DataFrame,
    base_uri: str = DEFAULT_BASE_URI,
) -> DataFrame:
    """(entities(entity_id, name, entity_type), relationships(subj, pred,
    obj)) → one-column DataFrame of N-Triples lines.

    Entities emit `<id> <name> "..."` and `<id> <type> "..."` literal
    statements; relationships emit URI-object statements — exactly the two
    statement classes import_rdf_turtle recognizes.
    """
    uri = lambda c: F.concat(F.lit(f"<{base_uri}"), c, F.lit(">"))  # noqa: E731
    lit = lambda c: F.concat(F.lit('"'), _ttl_escape(c), F.lit('"'))  # noqa: E731
    name_stmts = entities.select(
        F.concat_ws(
            " ", uri(F.col("entity_id")), F.lit(f"<{base_uri}name>"),
            lit(F.col("name")), F.lit("."),
        ).alias("value")
    )
    type_stmts = entities.select(
        F.concat_ws(
            " ", uri(F.col("entity_id")), F.lit(f"<{base_uri}type>"),
            lit(F.col("entity_type")), F.lit("."),
        ).alias("value")
    )
    rel_stmts = relationships.select(
        F.concat_ws(
            " ", uri(F.col("subj")), uri(F.col("pred")), uri(F.col("obj")),
            F.lit("."),
        ).alias("value")
    )
    return name_stmts.unionByName(type_stmts).unionByName(rel_stmts)


def export_rdf_turtle(
    entities: DataFrame,
    relationships: DataFrame,
    path: str,
    base_uri: str = DEFAULT_BASE_URI,
) -> None:
    """Write the graph as a directory of N-Triples text files."""
    rdf_lines(entities, relationships, base_uri).write.mode("overwrite").text(path)


def export_graphml(
    entities: DataFrame,
    relationships: DataFrame,
    path: str,
    shards: int = 8,
) -> DataFrame:
    """Write ``shards`` self-contained GraphML documents under ``path``
    (one ``shard=N/part-*.txt`` per shard, via Spark's writer so it works
    on any cluster filesystem); → manifest (shard, file, n_nodes,
    n_edges), one row per shard — ``file`` is the shard's directory.

    Node attributes use the importer's keys (name, type); edges carry
    their relation as a ``type`` data element. Edges are assigned to their
    SOURCE node's shard, so any node-local analysis of one shard file sees
    every outgoing edge; cross-shard targets appear as bare ids (exactly
    the dangling-edge tolerance the checkpoint loader already has).

    Each shard document materializes as one string in executor memory —
    size ``shards`` so a shard's nodes+edges render within a task's heap
    (the same bound the previous per-shard file writer had).
    """
    import pandas as pd

    shard_of = lambda c: F.pmod(F.xxhash64(c), F.lit(shards))  # noqa: E731
    nodes = entities.select(
        shard_of(F.col("entity_id")).alias("shard"),
        F.lit("n").alias("k"),
        F.col("entity_id").alias("a"),
        F.col("name").alias("b"),
        F.col("entity_type").alias("c"),
    )
    edges = relationships.select(
        shard_of(F.col("subj")).alias("shard"),
        F.lit("e").alias("k"),
        F.col("subj").alias("a"),
        F.col("obj").alias("b"),
        F.col("pred").alias("c"),
    )
    both = nodes.unionByName(edges)

    def render_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        from xml.sax.saxutils import escape, quoteattr

        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(["k", "a", "b", "c"], kind="mergesort")
        out = [
            '<?xml version="1.0" encoding="UTF-8"?>',
            '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
            '<graph edgedefault="directed">',
        ]
        n_nodes = n_edges = 0
        for _, r in pdf.iterrows():
            if r["k"] == "n":
                n_nodes += 1
                out.append(
                    f"<node id={quoteattr(r['a'])}>"
                    f'<data key="name">{escape(r["b"] or "")}</data>'
                    f'<data key="type">{escape(r["c"] or "")}</data>'
                    "</node>"
                )
            else:
                n_edges += 1
                out.append(
                    f"<edge source={quoteattr(r['a'])} target={quoteattr(r['b'])}>"
                    f'<data key="type">{escape(r["c"] or "")}</data>'
                    "</edge>"
                )
        out.append("</graph></graphml>")
        return pd.DataFrame(
            {"shard": [shard], "xml": ["\n".join(out)],
             "n_nodes": [n_nodes], "n_edges": [n_edges]}
        )

    rendered = both.groupBy("shard").applyInPandas(
        render_shard, schema="shard long, xml string, n_nodes long, n_edges long"
    ).persist()
    # one row per shard + partitionBy("shard") ⇒ exactly one part file per
    # shard=N/ directory, each a complete GraphML doc; the write goes
    # through Spark's committer (works on HDFS/S3/any cluster FS, atomic
    # via the _temporary → rename protocol — no executor-local open()).
    rendered.select("shard", F.col("xml").alias("value")).write.mode(
        "overwrite"
    ).partitionBy("shard").text(path)
    manifest = rendered.select(
        "shard",
        F.concat(
            F.lit(path.rstrip("/") + "/shard="), F.col("shard").cast("string")
        ).alias("file"),
        "n_nodes",
        "n_edges",
    ).localCheckpoint(eager=True)
    rendered.unpersist()
    return manifest
