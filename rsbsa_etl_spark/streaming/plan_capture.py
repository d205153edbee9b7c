"""Capture the EXECUTED micro-batch plans of streaming replays.

Until round 11 the plan-hygiene audit excluded every ``stream_*``
key ("building the DataFrame runs real streaming jobs"), so the
0-row-python / no-cartesian invariants were never checked against
the plans that actually execute inside the streaming engine — the
riskiest surface got the least plan evidence. The fix is one shared
helper: every replay's ``q.awaitTermination()`` call site becomes
``finish(q, tag)``, which waits exactly as before and then records
the query's LAST micro-batch executed plan (Spark keeps the final
``IncrementalExecution`` on the terminated query object). The audit
CLI (``python -m rsbsa_etl_spark audit`` → ``plans.audit.audit_key``)
clears ``CAPTURED`` before building a key and merges whatever
accumulated into that key's counters — so a streaming key's
PLANAUDIT row now counts its real stateful micro-batch plan
(StateStoreSave, streaming dedup/session operators, any Python
stages), not the trivial sink read-back.

Capture is best-effort by design: a missing plan must never fail a
replay (the plan is evidence, the replay is the product). Multi-phase
replays (checkpoint-restart tests run 2+ queries) append one entry
per query, all merged into the key's row.
"""

from __future__ import annotations

class _CaptureBuffer:
    """Runtime evidence buffer with a PINNED repr.

    Deliberately not a plain list: the sweep rotation's closure-hash
    walk (``registry._dep_closure``) reprs every module constant a
    key's code reads, and ``finish`` below reads this buffer — a
    mutating repr would re-flag every streaming key as
    changed-since-checked the moment any replay ran in the same
    process (caught by tests/test_sweep_rotation.py::
    test_tool_hash_matches_registry_hash when the full suite runs
    streaming tests before it). Captured plans are per-process
    evidence, not code identity, so the repr is constant.
    """

    def __init__(self) -> None:
        self._items: list[tuple[str, str]] = []

    def append(self, item: tuple[str, str]) -> None:
        self._items.append(item)

    def clear(self) -> None:
        self._items.clear()

    def __iter__(self):
        return iter(self._items)

    def __len__(self) -> int:
        return len(self._items)

    def __repr__(self) -> str:  # stable: contents are not code identity
        return "<streaming plan-capture buffer>"


#: (tag, executed-plan string) per completed streaming query since
#: the last ``CAPTURED.clear()`` — the audit clears per key.
CAPTURED = _CaptureBuffer()


def finish(q, tag: str) -> None:
    """``q.awaitTermination()`` + best-effort capture of the last
    micro-batch's executed plan under ``tag``."""
    q.awaitTermination()
    try:
        jq = q._jsq
        # StreamingQueryWrapper holds the real StreamExecution behind
        # ``streamingQuery()``; older paths expose lastExecution
        # directly — try both, never raise.
        try:
            le = jq.streamingQuery().lastExecution()
        except Exception:  # noqa: BLE001 — capture is best-effort
            le = jq.lastExecution()
        if le is not None:
            CAPTURED.append((tag, le.executedPlan().toString()))
    except Exception:  # noqa: BLE001 — capture must never fail a replay
        pass
