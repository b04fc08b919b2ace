"""Ledger-freshness guard (round-8/9 verdict ask): the driver checks only
the FIRST 50 entries of __spark_entry__.QUERIES each round, so window
rotation is the only thing that keeps every query's driver-green row fresh.
This test makes skipping the rotation a CI failure:

* STALEST-FIRST invariant — every window member is at least as stale (by
  last driver-green round, never-checked = -1) as every non-window entry.
  A new query has no CORRECTNESS row, so it ranks stalest automatically
  and CANNOT land outside the window.
* K-round freshness ratchet — with 200 queries and a 50-slot window, a
  full rotation takes ceil(200/50) = 4 rounds, so once rotation runs
  every round, no query's last green row can be older than K = 5 rounds.
  The ratchet asserts staleness <= K for every non-window query; window
  members are excused because the imminent driver run re-greens them.

Regenerate the window with ``python scripts/rotate_window.py``.
"""

from __future__ import annotations

import glob
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from rotate_window import (  # noqa: E402
    WINDOW,
    last_green_rounds,
    parse_queries_block,
)

#: once rotation runs every round, every query must have a driver-green row
#: within this many rounds (window 50 of ~200 queries -> full cycle in 4).
#: The pre-rotation grace term was retired in round 11: as of the r10
#: ledger no query outside the window is staler than 4 rounds, so the
#: ratchet now runs at the tight bound with no excuse schedule.
K_ROUNDS = 5


def _entries():
    src = open(os.path.join(ROOT, "__spark_entry__.py")).read()
    _, entries = parse_queries_block(src)
    return [k for k, _ in entries]


def _latest_round() -> int:
    rounds = [
        int(re.search(r"_r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))
    ]
    return max(rounds) if rounds else 0


def test_window_is_stalest_first():
    keys = _entries()
    greens = last_green_rounds(ROOT)
    window, outside = keys[:WINDOW], keys[WINDOW:]
    worst_in = max(greens.get(k, -1) for k in window)
    best_out = min(greens.get(k, -1) for k in outside)
    assert worst_in <= best_out, (
        f"window breaks stalest-first rotation: a window query was last "
        f"green r{worst_in} but a non-window query is staler "
        f"(r{best_out}); run: python scripts/rotate_window.py"
    )
    never = [k for k in outside if k not in greens]
    assert not never, (
        f"queries never driver-checked sit OUTSIDE the window: {never}; "
        "run: python scripts/rotate_window.py"
    )


def test_every_query_green_within_k_rounds():
    keys = _entries()
    greens = last_green_rounds(ROOT)
    latest = _latest_round()
    window = set(keys[:WINDOW])
    overdue = []
    for k in keys:
        if k in window:
            continue  # scheduled for the imminent driver run
        staleness = latest - greens.get(k, -1)
        if staleness > K_ROUNDS:
            overdue.append((k, greens.get(k)))
    assert not overdue, (
        f"{len(overdue)} queries have no driver-green row in the last "
        f"{K_ROUNDS} rounds and are not in the current window: "
        f"{overdue[:10]}; run: python scripts/rotate_window.py"
    )
