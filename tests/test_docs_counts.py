"""COVERAGE.md's claimed counts must be derivable from the artifacts
(round-2 verdict #8: no hand-maintained drift).

Round-5 fix for the recurring failure class (round-3/4 verdicts): the
driver writes a new CORRECTNESS_r*.json *after* the round's last commit,
so validating against "the latest board on disk" reddens pytest every
round by construction. The stats block now pins the board filename it
was rendered from; verification compares only against that pinned file.
Registry-derived counts (n_queries / n_oracles) are still asserted
unconditionally against the live registry.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "bench"))


def _coverage_text() -> str:
    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        return f.read()


def test_coverage_stats_block_is_current():
    from coverage_stats import compute, pinned_board, render

    text = _coverage_text()
    pinned = pinned_board()
    board_path = os.path.join(REPO, pinned) if pinned else None
    assert render(compute(board_path=board_path)) in text, (
        "COVERAGE.md stats block is stale vs the registry or its pinned "
        "board - run `python bench/coverage_stats.py --write`"
    )


def test_newer_driver_board_does_not_redden_docs():
    """A driver board written after the last commit must not invalidate
    the block (the exact failure class of rounds 3 and 4)."""
    from coverage_stats import compute, pinned_board, render

    fake = os.path.join(REPO, "CORRECTNESS_r97.json")
    assert not os.path.exists(fake), "test fixture filename collision"
    try:
        with open(fake, "w") as f:
            json.dump({"some_query": {"hash_match": False, "err": "boom"}}, f)
        text = _coverage_text()
        pinned = pinned_board()
        assert pinned is not None and pinned != "CORRECTNESS_r97.json"
        board_path = os.path.join(REPO, pinned)
        assert render(compute(board_path=board_path)) in text
    finally:
        if os.path.exists(fake):
            os.remove(fake)
