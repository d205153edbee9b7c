"""Guards the driver-sweep rotation (registry.py tail).

The external correctness driver checks the first ~50 keys of
``queries()`` order each round. The rotation rule is: still-red keys
first, then keys with no committed driver row, greens demoted to the
tail. These tests parse the in-repo ``CORRECTNESS_r*.json`` records
— the same source the registry itself reads — so the rotation is
self-maintaining instead of hand-curated: if a new round's record
lands and the ordering stops honoring it, this fails.
"""

from __future__ import annotations

import json
from pathlib import Path

from __spark_entry__ import queries

# the SAME predicate/merge the production rotation uses — importing
# (rather than copy-pasting) means a bug fixed in one place can't
# leave the guard test pinning stale logic
from rsbsa_etl_spark.registry import (
    _driver_latest_rows,
    _driver_latest_rows_and_rounds,
    _is_green,
)

ROOT = Path(__file__).resolve().parent.parent
SWEEP_BUDGET = 50


def _latest_rows() -> dict:
    rows = _driver_latest_rows()
    # the production reader swallows unreadable files; the guard
    # additionally insists every committed record parses
    for p in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        json.loads(p.read_text())
    return rows


def test_green_requires_all_three_driver_flags():
    assert _is_green({"rows_match": True, "err": None})
    for flag in ("hash_match", "schema_match", "rows_match"):
        row = {"rows_match": True, "err": None, flag: False}
        assert not _is_green(row), flag


def test_sweep_head_contains_no_already_green_key():
    """No sweep slot goes to a green key while a pending key waits.

    Endgame nuance (round 5+): once fewer than SWEEP_BUDGET keys are
    pending, greens legitimately back-fill the head — the driver will
    re-confirm them, which is free re-verification, not waste. So the
    strict no-green-in-head form only applies while the pending pool
    can fill the head; afterwards we assert ordering instead (every
    pending key precedes every green one within the head)."""
    rows = _latest_rows()
    order = list(queries())
    green = {k for k, r in rows.items() if _is_green(r)}
    pending = [k for k in order if k not in green]
    head = order[:SWEEP_BUDGET]
    if len(pending) >= SWEEP_BUDGET:
        overlap = [k for k in head if k in green]
        assert overlap == [], (
            f"driver budget wasted re-checking already-green keys: {overlap}"
        )
    else:
        # endgame: head = all pending keys first, then green back-fill
        assert head[: len(pending)] == pending, (
            "pending keys must occupy the head before any green back-fill"
        )


def test_sweep_head_leads_with_still_red_keys():
    rows = _latest_rows()
    red = {k for k, r in rows.items() if not _is_green(r)}
    head = list(queries())[:SWEEP_BUDGET]
    missing = sorted(red - set(head))
    assert missing == [], (
        f"keys with a red driver row must be re-swept next round: {missing}"
    )


def test_sweep_queue_is_work_conserving():
    """The drain is optimal and bounded. Work-conserving: every key
    still needing a driver row (red or never-tested) sits ahead of
    every already-green key, so the backlog drains in exactly
    ceil(pending / budget) rounds — no sweep slot is ever spent
    re-checking a green while a pending key waits. Bounded: pending
    stays within three budgets, so no key waits more than two full
    rounds beyond the current one. (An earlier form hardcoded a
    two-budget cap, which would freeze the registry at 100 pending
    keys forever; the late round-4 additions take the queue to 101 —
    100 untested plus the tpch_q12 red re-check — which drains in
    ceil(101/50) = 3 sweeps, optimal for that queue length.)"""
    rows = _latest_rows()
    order = list(queries())
    pending = [
        k for k in order if k not in rows or not _is_green(rows[k])
    ]
    n = len(pending)
    assert order[:n] == pending, (
        "sweep slots wasted: a green key is ordered ahead of keys "
        "still awaiting a driver row"
    )
    assert n <= 3 * SWEEP_BUDGET, (
        f"driver backlog {n} exceeds three sweep budgets — stop adding "
        "keys until the driver catches up"
    )


def test_green_tail_is_age_ordered():
    """Round-7 age tier: within the green tail, keys are ordered by
    the round of their latest driver row, oldest first — so once the
    untested backlog is drained, each sweep re-confirms the ~50
    stalest greens against current code instead of freezing on a
    fixed head. Stability within a round is the registry's own
    order, which we don't pin (it's an implementation detail); the
    non-decreasing round sequence is the contract."""
    rows, rounds = _driver_latest_rows_and_rounds()
    order = list(queries())
    green_tail = [k for k in order if k in rows and _is_green(rows[k])]
    # strip any endgame back-filled greens ahead of pending keys:
    # the tail proper is the maximal green suffix of the order
    suffix = []
    for k in reversed(order):
        if k in rows and _is_green(rows[k]):
            suffix.append(k)
        else:
            break
    suffix.reverse()
    tail_rounds = [rounds[k] for k in suffix]
    assert tail_rounds == sorted(tail_rounds), (
        "green tail not age-ordered: a fresher driver row precedes a "
        "staler one, wasting sweep budget on recently-confirmed keys"
    )
    # and when EVERYTHING is green, the whole order is the tail —
    # i.e. the sweep head is exactly the stalest-evidence keys
    if len(green_tail) == len(order):
        assert suffix == order


def test_readme_query_count_matches_registry():
    """README's stated query count must track the registry (it went
    stale once: "182" while the registry held 198)."""
    import re

    readme = (ROOT / "README.md").read_text()
    m = re.search(r"(\d+) named queries", readme)
    assert m, "README no longer states the named-query count"
    assert int(m.group(1)) == len(queries()), (
        f"README says {m.group(1)} named queries; registry has "
        f"{len(queries())} — update README.md"
    )
