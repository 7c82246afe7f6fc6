"""Jupyter notebook (.ipynb) ingestion — JSON payloads → one row per cell.

Source-code corpora are full of notebooks; their code lives inside a JSON
envelope, so a chunker/extractor that sees raw bytes gets JSON noise, not
code.  This parses the nbformat structure with Spark's native ``from_json``
(JVM Jackson — no Python in the loop) and explodes to cell granularity,
after which cells flow through the ordinary chunking/extraction/curation
operators like any other source file.

nbformat quirk handled: ``source`` may be an ARRAY of line strings (what
nbformat itself writes) or a single STRING (what some exporters write).
The payload is decoded against both schemas and the two decodes are
``zip_with``-merged PER CELL (the mismatching shape decodes to a null
``source`` for exactly the mismatched cells), so even notebooks mixing
both shapes parse losslessly.

Scale: map-only — one ``from_json`` per shape + ``posexplode``; no
shuffle, no UDF; predicate/column pruning reaches the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ARR_SCHEMA = (
    "struct<cells: array<struct<cell_type: string, source: array<string>>>>"
)
_STR_SCHEMA = "struct<cells: array<struct<cell_type: string, source: string>>>"


def parse_notebooks(
    files: DataFrame, *, content_col: str = "content"
) -> DataFrame:
    """files(..., content=ipynb JSON) → one row per cell with
    ``cell_idx`` (0-based position), ``cell_type``, ``source`` (lines
    joined — exactly the concatenation nbformat specifies) and
    ``n_source_chars``.  Unparseable payloads yield no rows."""
    content = F.col(content_col)
    a_cells = F.from_json(content, _ARR_SCHEMA).getField("cells")
    s_cells = F.from_json(content, _STR_SCHEMA).getField("cells")
    # same JSON under two schemas: both null iff unparseable, else equal
    # lengths with the mismatching shape's `source` null per cell
    cells = F.zip_with(
        a_cells,
        s_cells,
        lambda ac, sc: F.struct(
            F.coalesce(
                ac.getField("cell_type"), sc.getField("cell_type")
            ).alias("cell_type"),
            F.coalesce(
                ac.getField("source"), F.array(sc.getField("source"))
            ).alias("source"),
        ),
    )
    keep = [c for c in files.columns if c != content_col]
    exploded = files.select(
        *keep, F.posexplode(cells).alias("cell_idx", "_cell")
    )
    source = F.concat_ws("", F.col("_cell.source"))
    return exploded.select(
        *keep,
        "cell_idx",
        F.col("_cell.cell_type").alias("cell_type"),
        source.alias("source"),
        F.length(source).alias("n_source_chars"),
    )


def notebook_code(
    files: DataFrame, *, content_col: str = "content"
) -> DataFrame:
    """Concatenate each notebook's CODE cells (in order, separated by
    newlines) into one ``content`` column — the 'notebook as script' view
    the downstream code operators consume."""
    cells = parse_notebooks(files, content_col=content_col)
    keep = [c for c in cells.columns if c not in
            ("cell_idx", "cell_type", "source", "n_source_chars")]
    code = cells.where(F.col("cell_type") == "code")
    return (
        code.groupBy(*keep)
        .agg(
            F.concat_ws(
                "\n", F.array_sort(F.collect_list(F.struct("cell_idx", "source")))
                .getField("source")
            ).alias("content")
        )
    )
