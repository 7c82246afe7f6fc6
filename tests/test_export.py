"""Export sinks round-trip the importers (operators/export_data.py)."""

import os

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.export_data import (
    export_graphml,
    export_rdf_turtle,
    rdf_lines,
)
from graphrag_rs_spark.operators.import_data import (
    import_graphml,
    import_rdf_turtle,
)

ENTS = [
    ("e1", "Acme Corp", "ORGANIZATION"),
    ("e2", 'Jane "JJ" Doe', "PERSON"),          # quote in literal
    ("e3", "back\\slash & <tag>", "CONCEPT"),   # backslash + XML specials
]
RELS = [
    ("e1", "EMPLOYS", "e2"),
    ("e2", "KNOWS", "e3"),
    ("e3", "PART_OF", "e1"),
]


@pytest.fixture(scope="module")
def graph(spark):
    ents = spark.createDataFrame(ENTS, ["entity_id", "name", "entity_type"])
    rels = spark.createDataFrame(RELS, ["subj", "pred", "obj"])
    return ents, rels


def test_rdf_round_trip(spark, graph, tmp_path_factory):
    ents, rels = graph
    path = str(tmp_path_factory.mktemp("rdf") / "kg")
    export_rdf_turtle(ents, rels, path)
    got_ents, got_rels = import_rdf_turtle(spark, path)
    assert {
        (r["entity_id"], r["name"], r["entity_type"])
        for r in got_ents.collect()
    } == set(ENTS)
    assert {tuple(r) for r in got_rels.select("subj", "pred", "obj").collect()} \
        == set(RELS)


def test_rdf_lines_are_udf_free(spark, graph):
    ents, rels = graph
    plan = rdf_lines(ents, rels)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_graphml_round_trip(spark, graph, tmp_path_factory):
    ents, rels = graph
    path = str(tmp_path_factory.mktemp("gml") / "kg")
    manifest = export_graphml(ents, rels, path, shards=2)
    rows = manifest.collect()
    assert sum(r["n_nodes"] for r in rows) == 3
    assert sum(r["n_edges"] for r in rows) == 3
    for r in rows:
        assert os.path.exists(r["file"])
        assert not os.path.exists(r["file"] + ".tmp")
    nodes, edges = import_graphml(spark, path)
    assert {
        (r["entity_id"], r["name"], r["entity_type"]) for r in nodes.collect()
    } == set(ENTS)
    assert {tuple(r) for r in edges.select("subj", "pred", "obj").collect()} \
        == set(RELS)


def test_graphml_edges_follow_source_shard(spark, graph, tmp_path_factory):
    ents, rels = graph
    path = str(tmp_path_factory.mktemp("gml2") / "kg")
    export_graphml(ents, rels, path, shards=4)
    # each shard file alone must parse and only contain edges whose source
    # node is in the same file
    import xml.etree.ElementTree as ET

    files = [
        os.path.join(dirpath, f)
        for dirpath, _, fnames in os.walk(path)
        for f in fnames
        if not f.startswith(("_", "."))
    ]
    assert files
    for fname in sorted(files):
        root = ET.parse(fname).getroot()
        ns = {"g": "http://graphml.graphdrawing.org/xmlns"}
        node_ids = {n.get("id") for n in root.iter("{%s}node" % ns["g"])}
        for e in root.iter("{%s}edge" % ns["g"]):
            assert e.get("source") in node_ids
