"""Ledger-freshness guard (round-8/9 verdict ask): the driver checks only
the FIRST 50 entries of __spark_entry__.QUERIES each round, so window
rotation is the only thing that keeps every query's driver-green row fresh.
This test makes skipping the rotation a CI failure:

* STALEST-FIRST invariant — every window member is at least as stale (by
  last driver-green round, never-checked = -1) as every non-window entry.
  A new query has no CORRECTNESS row, so it ranks stalest automatically
  and CANNOT land outside the window.
* K-round freshness ratchet — a full rotation of N queries through the
  50-slot window takes ceil(N/50) rounds, so once rotation runs every
  round, no query's last green row can be older than K = ceil(N/50)+1
  rounds. K is derived from the live registry size (a hard-coded 5 broke
  when the registry outgrew 200 queries). The ratchet asserts
  staleness <= K for every non-window query; window members are excused
  because the imminent driver run re-greens them. Both checks read only
  git-TRACKED ledgers, so the untracked ledger the driver drops after the
  final commit cannot red a clean tree.

Regenerate the window with ``python scripts/rotate_window.py``.
"""

from __future__ import annotations

import math
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from rotate_window import (  # noqa: E402
    WINDOW,
    last_green_rounds,
    parse_queries_block,
    tracked_ledgers,
)


def _entries():
    src = open(os.path.join(ROOT, "__spark_entry__.py")).read()
    _, entries = parse_queries_block(src)
    return [k for k, _ in entries]


def _k_rounds(n_queries: int) -> int:
    """Registry-proportional staleness bound (round-11 verdict ask #1).

    A full rotation of N queries through the 50-slot window takes
    ceil(N/50) rounds, so with rotation running every round no query can
    be staler than that cycle length; +1 absorbs the round in flight.
    Hard-coding 5 broke the moment the registry outgrew 200 queries.
    """
    return math.ceil(n_queries / WINDOW) + 1


def _latest_round() -> int:
    rounds = [
        int(re.search(r"_r(\d+)\.json$", p).group(1))
        for p in tracked_ledgers(ROOT)
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
    k_rounds = _k_rounds(len(keys))
    greens = last_green_rounds(ROOT)
    latest = _latest_round()
    window = set(keys[:WINDOW])
    overdue = []
    for k in keys:
        if k in window:
            continue  # scheduled for the imminent driver run
        staleness = latest - greens.get(k, -1)
        if staleness > k_rounds:
            overdue.append((k, greens.get(k)))
    assert not overdue, (
        f"{len(overdue)} queries have no driver-green row in the last "
        f"{k_rounds} rounds and are not in the current window: "
        f"{overdue[:10]}; run: python scripts/rotate_window.py"
    )
