"""Graph motif (pattern) matching — declarative multi-hop structure queries.

The reference exposes fixed-shape traversals (BFS `graph/traversal.rs`,
triangles via degree-ordering); ad-hoc structural queries ("find open
triads", "who bridges two hubs") have no surface there. This operator is
the Spark-native generalization: a tiny GraphFrames-style pattern language
compiled to a chain of DataFrame joins, so Catalyst/AQE pick the physical
join strategy (broadcast for small intermediate sets, shuffle-hash
otherwise) and every hop stays whole-stage-codegen.

Pattern syntax (a public, GraphFrames-compatible subset):

    "(a)-[e]->(b); (b)-[]->(c); !(a)-[]->(c)"

- ``(x)-[e]->(y)``  — a directed edge from node-var x to node-var y;
  naming the edge ``e`` exports its payload columns as ``e_<col>``.
- ``!(x)-[]->(y)``  — NEGATION: no edge x→y may exist (left_anti join);
  applied after all positive statements, negated edges cannot be named.
- Repeating a node var constrains it to the same vertex (join key).

Result: one row per match, one column per node variable (the vertex id),
plus ``e_<col>`` payload columns for named edges.

Scale shape: each positive statement is ONE equi-join on the shared
variables (never a cartesian unless the pattern is genuinely disconnected,
which raises by default); negations are left_anti joins, which Spark
executes broadcast-anti when the negated edge set is small. A k-statement
pattern is k-1 joins — the same plan a hand-written SQL n-hop would get,
with column pruning pushing only the needed vars through each hop.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STMT = re.compile(
    r"^(?P<neg>!)?\((?P<src>\w+)\)-\[(?P<edge>\w*)\]->\((?P<dst>\w+)\)$"
)


def parse_pattern(pattern: str) -> list[tuple[bool, str, str, str]]:
    """→ [(negated, src_var, edge_var, dst_var)] — edge_var may be ''."""
    out = []
    for raw in pattern.split(";"):
        s = raw.strip()
        if not s:
            continue
        m = _STMT.match(s)
        if not m:
            raise ValueError(f"unparseable pattern statement: {s!r}")
        neg = bool(m.group("neg"))
        if neg and m.group("edge"):
            raise ValueError(f"negated edge cannot be named: {s!r}")
        out.append((neg, m.group("src"), m.group("edge"), m.group("dst")))
    if not out:
        raise ValueError("empty pattern")
    if not any(not neg for neg, *_ in out):
        raise ValueError("pattern needs at least one positive statement")
    return out


def match_motif(
    edges: DataFrame,
    pattern: str,
    *,
    distinct_vertices: bool = False,
    allow_cartesian: bool = False,
) -> DataFrame:
    """edges(src, dst, *payload) + pattern → one row per match.

    ``distinct_vertices=True`` adds pairwise ``!=`` filters over all node
    vars (subgraph isomorphism rather than homomorphism).
    """
    stmts = parse_pattern(pattern)
    positives = [s for s in stmts if not s[0]]
    negatives = [s for s in stmts if s[0]]
    payload_cols = [c for c in edges.columns if c not in ("src", "dst")]

    result: DataFrame | None = None
    bound: set[str] = set()
    for _neg, sv, ev, dv in positives:
        sel = [F.col("src").alias(sv), F.col("dst").alias(dv)]
        if sv == dv:  # self-loop statement: bind one var, filter equality
            sel = [F.col("src").alias(sv)]
        hop = edges.where(F.col("src") == F.col("dst")) if sv == dv else edges
        hop = hop.select(
            *sel, *[F.col(c).alias(f"{ev}_{c}") for c in payload_cols if ev]
        )
        if result is None:
            result = hop
        else:
            keys = [v for v in (sv, dv) if v in bound]
            if not keys:
                if not allow_cartesian:
                    raise ValueError(
                        f"statement ({sv})->({dv}) shares no variable with "
                        "the pattern so far — a cartesian product; reorder "
                        "the statements or pass allow_cartesian=True"
                    )
                result = result.crossJoin(hop)
            else:
                result = result.join(hop, on=keys)
        bound.update((sv, dv))

    for _neg, sv, _ev, dv in negatives:
        missing = {sv, dv} - bound
        if missing:
            raise ValueError(
                f"negated statement !({sv})->({dv}) uses unbound vars {missing}"
            )
        anti = edges.select(F.col("src").alias(sv), F.col("dst").alias(dv))
        result = result.join(anti, on=[sv, dv], how="left_anti")

    if distinct_vertices:
        node_vars = sorted(bound)
        for i, a in enumerate(node_vars):
            for b in node_vars[i + 1 :]:
                result = result.where(F.col(a) != F.col(b))
    # joins promote keys to the front — restore pattern appearance order
    ordered: list[str] = []
    for _neg, sv, ev, dv in positives:
        for v in (sv, dv):
            if v not in ordered:
                ordered.append(v)
        if ev:
            ordered.extend(f"{ev}_{c}" for c in payload_cols)
    return result.select(*ordered)
