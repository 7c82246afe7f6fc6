"""E15/E16 seam: gleaning round loop with a mock provider.

Drives operators/gleaning.gleaning_extract through the exact dispatch
shape of entity/gleaning_extractor.rs — round-1 extraction, completion
check, continuation rounds, empty-round stop, and the length-based
entity merge — using a deterministic fake in place of the LLM client
(the client itself is surveyed out of scope, SURVEY §2 E15-E18).
"""

from __future__ import annotations

import sys

import pytest

from graphrag_rs_spark.operators.gleaning import gleaning_extract

# the mock provider classes live in this test module, which executor
# python workers can't import — ship them by value instead
from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])


class MockProvider:
    """Deterministic stand-in for the reference's llm_extractor.

    Round 1: every chunk yields 'Alpha' (short description) and, when the
    content mentions beta, 'Beta' plus one relationship.
    Round 2+: chunks mentioning 'more' are incomplete and yield a LONGER
    description for Alpha plus a new 'Gamma'; everything else is either
    complete (contains 'done') or yields nothing.
    """

    def extract(self, content):
        ents = [
            {"name": "Alpha", "entity_type": "CONCEPT",
             "description": "short", "confidence": 0.9},
        ]
        rels = []
        if "beta" in content:
            ents.append(
                {"name": "Beta", "entity_type": "CONCEPT",
                 "description": "b", "confidence": 0.8}
            )
            rels.append(
                {"source": "Alpha", "target": "Beta",
                 "description": "RELATED_TO", "strength": 0.5}
            )
        return ents, rels

    def check_complete(self, content, known):
        return "done" in content

    def extract_additional(self, content, known):
        known_names = {k["name"].lower() for k in known}
        assert "alpha" in known_names, "accumulated state must reach the provider"
        if "more" in content and "gamma" not in known_names:
            return (
                [
                    {"name": "alpha", "entity_type": "CONCEPT",
                     "description": "a much longer description", "confidence": 0.7},
                    {"name": "Gamma", "entity_type": "CONCEPT",
                     "description": "g", "confidence": 0.6},
                ],
                [{"source": "Alpha", "target": "Gamma",
                  "description": "RELATED_TO", "strength": 0.4}],
            )
        return [], []


@pytest.fixture(scope="module")
def chunks(spark):
    return spark.createDataFrame(
        [
            ("c1", "plain beta text"),            # round 1 only (round 2 empty)
            ("c2", "beta and more to glean"),     # gleaned in round 2
            ("c3", "done already"),               # completion check short-circuits
        ],
        ["chunk_id", "content"],
    )


def test_gleaning_rounds_merge_and_stop(spark, chunks):
    res = gleaning_extract(chunks, MockProvider(), max_rounds=4)
    ents = {(r["chunk_id"], r["name"]): r for r in res.entities.collect()}

    # round-1 results present everywhere
    assert ("c1", "Alpha") in ents and ("c3", "Alpha") in ents
    assert ("c1", "Beta") in ents and ("c2", "Beta") in ents

    # length-based merge (gleaning_extractor.rs:245-285): the round-2 row
    # for c2's alpha has the strictly longer description, so it REPLACES
    # round 1's (and carries round 2's name casing + confidence)
    assert ("c2", "alpha") in ents and ("c2", "Alpha") not in ents
    assert ents[("c2", "alpha")]["description"] == "a much longer description"
    # c1's Alpha is untouched — its round 2 found nothing
    assert ents[("c1", "Alpha")]["description"] == "short"
    # gleaned entity arrives
    assert ("c2", "Gamma") in ents

    rels = res.relationships.collect()
    by_chunk = {}
    for r in rels:
        by_chunk.setdefault(r["chunk_id"], []).append((r["source"], r["target"], r["round"]))
    # relationships APPEND across rounds (:215)
    assert ("Alpha", "Beta", 1) in by_chunk["c1"]
    assert ("Alpha", "Beta", 1) in by_chunk["c2"]
    assert ("Alpha", "Gamma", 2) in by_chunk["c2"]
    assert "c3" not in by_chunk

    # round 3 finds nothing anywhere → loop stops before max_rounds
    assert res.rounds_run == 3


def test_gleaning_completion_check_gates_chunks(spark, chunks):
    # with the completion check disabled (use_llm_completion_check=false,
    # config :27), 'done' chunks go through extract_additional anyway —
    # which yields nothing for them, so results match, proving the gate
    # (not the provider output) is what skipped them above
    res = gleaning_extract(
        chunks, MockProvider(), max_rounds=4, use_completion_check=False
    )
    names = {(r["chunk_id"], r["name"]) for r in res.entities.collect()}
    assert ("c2", "alpha") in names and ("c2", "Gamma") in names


def test_gleaning_loop_hygiene_one_scan_one_provider_pass(spark, tmp_path):
    """Round-5 verdict #7: the loop must (a) scan the source corpus once,
    not once per round, and (b) run the provider exactly once per active
    chunk per round — even after BOTH result frames are fully evaluated
    (an uncut mixed frame would re-run the provider for each split).

    Local-mode workers share the filesystem, so the probes append marker
    lines to tmp files (O_APPEND writes of short lines are atomic)."""
    scan_log = str(tmp_path / "scans.log")
    call_log = str(tmp_path / "calls.log")

    class CountingProvider(MockProvider):
        def __init__(self, path):
            self._path = path

        def _mark(self, kind):
            with open(self._path, "a") as f:
                f.write(kind + "\n")

        def extract(self, content):
            self._mark("extract")
            return super().extract(content)

        def check_complete(self, content, known):
            self._mark("check")
            return super().check_complete(content, known)

        def extract_additional(self, content, known):
            self._mark("additional")
            return super().extract_additional(content, known)

    rows = [
        ("c1", "plain beta text"),
        ("c2", "beta and more to glean"),
        ("c3", "done already"),
    ]
    seed = spark.createDataFrame(rows, ["chunk_id", "content"]).repartition(1)

    def scan_probe(batches):
        with open(scan_log, "a") as f:
            f.write("scan\n")
        yield from batches

    src = seed.mapInPandas(scan_probe, schema="chunk_id string, content string")

    res = gleaning_extract(src, CountingProvider(call_log), max_rounds=4)
    # evaluate both result frames, twice — must not re-run anything
    for _ in range(2):
        res.entities.collect()
        res.relationships.collect()
    assert res.rounds_run == 3

    with open(scan_log) as f:
        n_scans = sum(1 for _line in f)
    assert n_scans == 1, f"source corpus scanned {n_scans} times, want 1"

    with open(call_log) as f:
        calls = [line.strip() for line in f]
    # round 1: extract once per chunk; round 2: completion check on all 3
    # actives, c3 gates out, c1+c2 continue; round 3: only c2 (the sole
    # round-2 emitter) stays active and comes back empty -> stop
    assert calls.count("extract") == 3
    assert calls.count("check") == 3 + 1
    assert calls.count("additional") == 2 + 1


def test_gleaning_shorter_description_does_not_replace(spark):
    class ShortProvider(MockProvider):
        def extract(self, content):
            return ([{"name": "Alpha", "entity_type": "CONCEPT",
                      "description": "the longest initial description",
                      "confidence": 0.9}], [])

        def extract_additional(self, content, known):
            if len(known) == 1:
                return ([{"name": "ALPHA", "entity_type": "CONCEPT",
                          "description": "tiny", "confidence": 0.1}], [])
            return [], []

    df = spark.createDataFrame([("c1", "more")], ["chunk_id", "content"])
    res = gleaning_extract(df, ShortProvider(), max_rounds=3)
    rows = res.entities.collect()
    # the new shorter-description row merges INTO the key, not alongside it
    assert len(rows) == 1
    assert rows[0]["name"] == "Alpha"
    assert rows[0]["description"] == "the longest initial description"
