"""COVERAGE.md's claimed counts must be derivable from the artifacts
(round-2 verdict #8: no hand-maintained drift)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_coverage_stats_block_is_current():
    sys.path.insert(0, os.path.join(REPO, "bench"))
    from coverage_stats import compute, render

    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        text = f.read()
    assert render(compute()) in text, (
        "COVERAGE.md stats block is stale - run "
        "`python bench/coverage_stats.py --write`"
    )
