from __future__ import annotations

import json

from graphrag_rs_spark.operators.notebooks import notebook_code, parse_notebooks


def _nb(cells):
    return json.dumps({"nbformat": 4, "cells": cells})


def _files(spark, rows):
    return spark.createDataFrame(rows, ["path", "content"])


def test_array_source_cells(spark):
    nb = _nb(
        [
            {"cell_type": "markdown", "source": ["# Title\n", "text"]},
            {"cell_type": "code", "source": ["import os\n", "print(1)\n"]},
        ]
    )
    rows = parse_notebooks(_files(spark, [("a.ipynb", nb)])).orderBy("cell_idx").collect()
    assert [(r["cell_idx"], r["cell_type"], r["source"]) for r in rows] == [
        (0, "markdown", "# Title\ntext"),
        (1, "code", "import os\nprint(1)\n"),
    ]
    assert rows[1]["n_source_chars"] == len("import os\nprint(1)\n")


def test_string_source_cells_lifted(spark):
    nb = _nb(
        [
            {"cell_type": "code", "source": "x = 1\ny = 2\n"},
            {"cell_type": "raw", "source": "raw text"},
        ]
    )
    rows = parse_notebooks(_files(spark, [("s.ipynb", nb)])).orderBy("cell_idx").collect()
    assert [(r["cell_type"], r["source"]) for r in rows] == [
        ("code", "x = 1\ny = 2\n"),
        ("raw", "raw text"),
    ]


def test_mixed_shapes_within_one_notebook(spark):
    nb = _nb(
        [
            {"cell_type": "code", "source": ["a = 1\n", "b = 2\n"]},
            {"cell_type": "code", "source": "c = 3\n"},
        ]
    )
    rows = parse_notebooks(_files(spark, [("m.ipynb", nb)])).orderBy("cell_idx").collect()
    assert [r["source"] for r in rows] == ["a = 1\nb = 2\n", "c = 3\n"]


def test_json_escaping_round_trip(spark):
    tricky = 'quote " backslash \\ newline \n tab \t unicode é'
    nb = _nb([{"cell_type": "code", "source": [tricky]}])
    row = parse_notebooks(_files(spark, [("t.ipynb", nb)])).collect()[0]
    assert row["source"] == tricky


def test_unparseable_payload_yields_no_rows(spark):
    out = parse_notebooks(
        _files(spark, [("bad.ipynb", "not json at all"), ("empty.ipynb", "{}")])
    )
    assert out.count() == 0


def test_notebook_code_concatenates_code_cells_in_order(spark):
    nb = _nb(
        [
            {"cell_type": "markdown", "source": ["ignored"]},
            {"cell_type": "code", "source": ["a = 1"]},
            {"cell_type": "markdown", "source": ["also ignored"]},
            {"cell_type": "code", "source": ["b = 2"]},
        ]
    )
    rows = notebook_code(_files(spark, [("n.ipynb", nb)])).collect()
    assert len(rows) == 1
    assert rows[0]["content"] == "a = 1\nb = 2"
    assert rows[0]["path"] == "n.ipynb"
