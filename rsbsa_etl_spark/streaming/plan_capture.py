"""Capture EXECUTED plans the final DataFrame doesn't carry:
streaming micro-batches (round 11) and driver-loop iteration jobs
(round 12 — see ``LOOP_GATE``/``record`` below).

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


class _LoopGate:
    """Audit-time switch for DRIVER-LOOP plan capture.

    Round 11 closed the streaming blind spot; this closes the other
    one PLANAUDIT.md stated plainly: a driver-loop key (the BPE merge
    loop's per-round argmax, the MMR greedy fold's pool/pairs
    collects) launches intermediate jobs whose plans are not part of
    the final DataFrame. ``record`` below captures them — but ONLY
    while the audit holds this gate open: the loops are hot paths
    (bpe_train runs in bench), and stringifying an executed plan per
    merge round would tax production callers for evidence only the
    audit reads. Same pinned-repr discipline as ``_CaptureBuffer``
    (the closure-hash walk reprs module constants read by key code;
    a state-dependent repr would re-flag keys as changed whenever an
    audit ran in-process)."""

    def __init__(self) -> None:
        self.enabled = False

    def __repr__(self) -> str:  # stable: gate state is not code identity
        return "<driver-loop plan-capture gate>"


#: open during ``plans.audit.audit_key`` builds only
LOOP_GATE = _LoopGate()


def record(df, tag: str) -> None:
    """best-effort capture of a driver-loop intermediate DataFrame's
    executed plan into ``CAPTURED`` under ``loop:<tag>`` — a zero-cost
    boolean check unless the audit opened ``LOOP_GATE``. Call at the
    loop's collect site, BEFORE the collect, with exactly the
    DataFrame being collected."""
    if not LOOP_GATE.enabled:
        return
    try:
        CAPTURED.append(
            (f"loop:{tag}", df._jdf.queryExecution().executedPlan().toString())
        )
    except Exception:  # noqa: BLE001 — capture must never fail the loop
        pass


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
