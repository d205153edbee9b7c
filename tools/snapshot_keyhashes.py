#!/usr/bin/env python
"""Maintain KEYHASHES.json — per registry key, the code hash as of
the key's latest committed driver-correctness row.

Why: the sweep rotation orders already-green keys by evidence age,
but age is blind to a key REIMPLEMENTED after its last driver check
(the r9 ``sample_stratified`` case: rewritten in round 9 while its
newest driver row, r7, silently attested to the old code). The
rotation therefore also compares each green key's CURRENT code hash
(``registry._key_code_hash``) against the hash recorded here; a
mismatch promotes the key to the head of the green tail so the
driver re-verifies the new implementation next round.

Protocol (one command per round):

    python tools/snapshot_keyhashes.py          # any time in-round

ORDER-INDEPENDENT since round 12: the latest round's keys are
hashed at the tree the driver actually tested — the parent of the
``round N: verdict`` driver commit, extracted via ``git archive``
(the seed path) — NOT the working tree, so running the refresh
after code edits can no longer mis-attribute a round number to
edited code (the r10/r11 hazard this used to carry as a manual
round-START constraint). Keys not in the new record keep their
previous entries.

Seeding (``--seed``, re-run in round 11 after the r10 seed turned
out to have used a pre-final hash algorithm — r10 advice item 1):
for every round R with surviving latest rows, it extracts the tree
the round-R driver record actually tested (the PARENT of the
``round R: verdict/...`` driver commit — that commit only adds
artifact files) via ``git archive`` into a temp dir and runs THIS
script there in ``--emit-json`` mode, so every key's recorded hash
is the hash of the code its latest driver row really verified —
including the pre-Hamilton ``sample_stratified`` at r7, which is
exactly how the rotation learns that key changed.

Two hashes per key (round 11):

* ``hash`` — the full transitive closure hash. Sensitive but
  saturating: one edit to a shared helper (``load``) flags every
  key, collapsing the change tier into the age tier (the r10
  failure mode: 253/253 flagged).
* ``narrow`` — the key's OWN registered function source + its
  DuckDB oracle string, nothing else. Cannot saturate from shared
  churn; a mismatch means the key itself (or its correctness
  contract) was edited since the driver last attested it. The
  rotation ranks narrow-changed greens first.

The hash algorithms here MUST stay in lockstep with
``registry._key_code_hash`` / ``registry._key_narrow_hash`` (the
emit subprocess runs inside historical trees whose registry
predates those helpers, so the algorithms are duplicated);
``tests/test_sweep_rotation.py::test_tool_hash_matches_registry_hash``
pins the two byte-equal on the current tree.
"""

from __future__ import annotations

import argparse
import hashlib
import inspect
import json
import os
import re
import subprocess
import sys
import tempfile
import types
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def dep_closure(fn) -> dict[str, str]:
    """Standalone mirror of ``registry._dep_closure`` — must stay
    byte-identical in behavior (pinned by test). Duplicated because
    this runs inside historical trees whose registry predates the
    helper."""
    import ast
    import textwrap

    out: dict[str, str] = {}
    seen: set[str] = set()

    def _det_repr(v) -> str:
        if isinstance(v, (set, frozenset)):
            return "{" + ", ".join(sorted(repr(x) for x in v)) + "}"
        if isinstance(v, dict):
            return (
                "{"
                + ", ".join(
                    f"{k!r}: {_det_repr(x)}"
                    for k, x in sorted(v.items(), key=lambda kv: repr(kv[0]))
                )
                + "}"
            )
        if isinstance(v, (list, tuple)):
            inner = ", ".join(_det_repr(x) for x in v)
            return f"[{inner}]" if isinstance(v, list) else f"({inner})"
        r = repr(v)
        # id-based reprs (functions, instances without __repr__) embed
        # process-specific addresses — substitute a stable stand-in so
        # a key is never flagged changed-forever by a memory address
        if " at 0x" in r:
            return (
                f"<{type(v).__module__}.{type(v).__qualname__}:"
                f"{getattr(v, '__qualname__', '')}>"
            )
        return r

    def _unwrap(obj):
        inner = getattr(obj, "func", None) or getattr(obj, "__wrapped__", None)
        return inner if callable(inner) else obj

    def _visit(obj):
        obj = _unwrap(obj)
        mod = getattr(obj, "__module__", "") or ""
        if not mod.startswith("rsbsa_etl_spark"):
            return
        if not isinstance(obj, (types.FunctionType, type)):
            return
        dep_id = f"{mod}.{getattr(obj, '__qualname__', '?')}"
        if dep_id in seen:
            return
        seen.add(dep_id)
        try:
            src = inspect.getsource(obj)
        except (OSError, TypeError):
            out[dep_id] = dep_id
            return
        out[dep_id] = src
        g = getattr(obj, "__globals__", None)
        if g is None:
            g = getattr(sys.modules.get(mod), "__dict__", {})
        try:
            tree = ast.parse(textwrap.dedent(src))
        except SyntaxError:
            return
        # pass 1 (round 12, mirroring registry._dep_closure):
        # function-local package imports — the registry wrapper style
        # — never reach __globals__, so resolve them directly;
        # imported modules join a local alias map for pass 2.
        import importlib

        local_mods: dict = {}
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom):
                if node.level or not (node.module or "").startswith(
                    "rsbsa_etl_spark"
                ):
                    continue
                try:
                    m = importlib.import_module(node.module)
                except Exception:
                    continue
                for a in node.names:
                    if a.name == "*":
                        continue
                    val = getattr(m, a.name, None)
                    if val is None:
                        # not-yet-imported SUBMODULE (r14 blind-spot
                        # fix — mirrors registry._dep_closure)
                        try:
                            val = importlib.import_module(
                                f"{node.module}.{a.name}"
                            )
                        except Exception:
                            pass
                    if isinstance(val, types.ModuleType):
                        local_mods[a.asname or a.name] = val
                    else:
                        _add(g, a.name, val)
            elif isinstance(node, ast.Import):
                for a in node.names:
                    if a.name.startswith("rsbsa_etl_spark") and a.asname:
                        try:
                            local_mods[a.asname] = importlib.import_module(
                                a.name
                            )
                        except Exception:
                            pass
        for node in ast.walk(tree):
            if isinstance(node, ast.Attribute) and isinstance(
                node.value, ast.Name
            ):
                base = local_mods.get(node.value.id, g.get(node.value.id))
                if isinstance(base, types.ModuleType) and (
                    base.__name__.startswith("rsbsa_etl_spark")
                ):
                    _add(g, f"{base.__name__}.{node.attr}",
                         getattr(base, node.attr, None))
            elif isinstance(node, ast.Name):
                _add(g, node.id, g.get(node.id))

    def _add(g, name: str, val) -> None:
        if val is None or isinstance(val, types.ModuleType):
            return
        if callable(val):
            _visit(val)
            return
        if name.startswith("__"):
            return
        key = f"const.{name}"
        if key not in out:
            try:
                out[key] = _det_repr(val)
            except Exception:
                out[key] = name

    _visit(fn)
    return out


def key_code_hash(key: str, fn, oracle: str) -> str:
    """Standalone mirror of ``registry._key_code_hash`` — same bytes
    in, same digest out (pinned by test)."""
    closure = dep_closure(fn)
    h = hashlib.sha256()
    h.update((oracle or "").encode())
    for dep_id in sorted(closure):
        h.update(b"\x00")
        h.update(dep_id.encode())
        h.update(b"\x01")
        h.update(closure[dep_id].encode())
    return h.hexdigest()


def key_narrow_hash(key: str, fn, oracle: str) -> str:
    """Standalone mirror of ``registry._key_narrow_hash`` — same
    bytes in, same digest out (pinned by test). Hashes ONLY the
    registered function's own source plus its oracle string, so it
    cannot saturate from shared-helper churn."""
    inner = getattr(fn, "func", None) or getattr(fn, "__wrapped__", None)
    if callable(inner):
        fn = inner
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = (
            f"{getattr(fn, '__module__', '?')}."
            f"{getattr(fn, '__qualname__', '?')}"
        )
    h = hashlib.sha256()
    h.update((oracle or "").encode())
    h.update(b"\x00")
    h.update(src.encode())
    return h.hexdigest()


def compute_all_hashes() -> dict[str, dict]:
    """{key: {hash, narrow}} for every registry key, resolved from
    whatever tree sys.path points at (PYTHONPATH in emit mode)."""
    import __spark_entry__ as E

    queries = E.queries()
    oracles = E.oracle_sql()
    return {
        k: {
            "hash": key_code_hash(k, fn, oracles.get(k, "")),
            "narrow": key_narrow_hash(k, fn, oracles.get(k, "")),
        }
        for k, fn in queries.items()
    }


def _latest_rows_and_rounds(root: Path) -> tuple[dict, dict]:
    rows: dict = {}
    rounds: dict = {}

    def _round_of(p: Path) -> int:
        m = re.search(r"r(\d+)", p.name)
        return int(m.group(1)) if m else 0

    for p in sorted(root.glob("CORRECTNESS_r*.json"), key=_round_of):
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if isinstance(data, dict):
            for k, v in data.items():
                if isinstance(v, dict):
                    rows[k] = v
                    rounds[k] = _round_of(p)
    return rows, rounds


def _driver_commit_parent(rnd: int) -> str | None:
    """Commit whose tree the round-``rnd`` driver record tested: the
    parent of the ``round {rnd}: verdict/...`` driver commit (the
    driver commit itself only adds the round's artifact files)."""
    out = subprocess.run(
        ["git", "-C", str(ROOT), "log", "--format=%H %s"],
        capture_output=True, text=True, check=True,
    ).stdout
    for line in out.splitlines():
        sha, _, subj = line.partition(" ")
        if re.match(rf"^round {rnd}: verdict", subj):
            return f"{sha}^"
    return None


def _max_round_present(root: Path = ROOT) -> int:
    """Largest round number among committed-or-untracked CORRECTNESS
    records — the round whose verdict commit may not exist yet."""
    _, rounds = _latest_rows_and_rounds(root)
    return max(rounds.values(), default=0)


def _record_sweep_sha(rnd: int, root: Path = ROOT) -> str | None:
    """Sweep-time commit sha carried INSIDE ``CORRECTNESS_r{rnd}.json``
    (top-level string entry ``"__sweep_sha__"`` — invisible to key
    logic, which filters on dict values). Round-15 (r14 advice item
    1): resolving the newest round's attested tree to HEAD is only
    exact while nothing lands between the driver sweep and the
    refresh; a record that states the sha it tested removes that
    window entirely. Returns None when the record is absent,
    unreadable, or carries no sha — callers then fall back to HEAD."""
    for p in root.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", p.name)
        if not m or int(m.group(1)) != rnd:
            continue
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            return None
        sha = data.get("__sweep_sha__") if isinstance(data, dict) else None
        if isinstance(sha, str) and re.fullmatch(r"[0-9a-f]{7,40}", sha):
            return sha
    return None


def _resolve_attested_ref(rnd: int, parent_ref: str | None,
                          max_round: int,
                          record_sha: str | None = None) -> str | None:
    """Resolution POLICY for the tree a round's driver record tested
    (round 14, closing the judge-checkpoint class for real — the
    third consecutive checkpoint red on the staleness guard):

    * the ``round N: verdict`` commit exists → its parent (as before);
    * no verdict commit AND ``rnd`` is the NEWEST round present →
      the record's own ``__sweep_sha__`` when it carries one (r14
      advice item 1: HEAD at refresh time is not necessarily the tree
      the sweep tested — any commit landed between the sweep and the
      checkpoint would otherwise be silently treated as attested),
      else **current HEAD**. The newest round's record is dropped in
      untracked at the judge checkpoint, BEFORE its verdict commit is
      created — and the driver tests the committed tree at hand-off
      by definition, so absent a recorded sha, HEAD is the best
      available anchor. The r12 git-aware fix only covered rounds
      whose verdict commit already existed, which the newest round's
      never does at the checkpoint; that gap redded 47
      honestly-stamped keys in r13.
    * no verdict commit for an OLDER round → unresolvable (shallow or
      rewritten history); callers fall back to the round-stamp form.
    """
    if parent_ref is not None:
        return parent_ref
    if rnd == max_round:
        return record_sha if record_sha else "HEAD"
    return None


def _hashes_at_ref(ref: str) -> dict[str, dict[str, str]]:
    """Extract ``ref``'s tree and run this script there in emit mode.

    Cached on disk per (resolved commit sha, HASH-ALGORITHM
    fingerprint): a commit's tree is immutable, but the algorithm
    hashing it is not — r14 extended the closure walker (unimported
    submodules), which silently invalidated every sha-only cache
    entry, so the algorithm's own source is part of the key and an
    edit to it auto-invalidates. The staleness guard in
    tests/test_sweep_rotation.py resolves every present round's
    attested tree on each suite run, and without the cache that is
    ~6 archive+import subprocesses per run."""
    try:
        sha = subprocess.run(
            ["git", "-C", str(ROOT), "rev-parse", ref],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except subprocess.CalledProcessError:
        sha = None
    algo = hashlib.sha256(
        (
            inspect.getsource(dep_closure)
            + inspect.getsource(key_code_hash)
            + inspect.getsource(key_narrow_hash)
        ).encode()
    ).hexdigest()[:12]
    cache = ROOT / ".keyhash_cache" / f"{sha}-{algo}.json" if sha else None
    if cache is not None and cache.exists():
        try:
            return json.loads(cache.read_text())
        except (OSError, ValueError):
            pass
    out = _hashes_at_ref_uncached(ref)
    if cache is not None:
        try:
            cache.parent.mkdir(exist_ok=True)
            cache.write_text(json.dumps(out, sort_keys=True))
        except OSError:
            pass
    return out


def attested_hashes(rnd: int) -> dict[str, dict] | None:
    """{key: {hash, narrow}} as of the tree the round-``rnd`` driver
    record actually tested, or None when that commit is not in
    history (shallow/detached checkout). This is the anchor the
    staleness guard compares KEYHASHES entries against: an entry is
    correctly anchored iff it matches the attested tree, regardless
    of its round stamp.

    The NEWEST round present resolves to HEAD when its verdict commit
    is absent (see ``_resolve_attested_ref``) — the judge-checkpoint
    state, where the record exists untracked but the commit that will
    carry it hasn't been made yet."""
    ref = _resolve_attested_ref(
        rnd, _driver_commit_parent(rnd), _max_round_present(),
        _record_sweep_sha(rnd),
    )
    if ref is None:
        return None
    try:
        return _hashes_at_ref(ref)
    except (subprocess.CalledProcessError, OSError, ValueError):
        return None


def _hashes_at_ref_uncached(ref: str) -> dict[str, dict[str, str]]:
    with tempfile.TemporaryDirectory(prefix="keyhash_") as td:
        tar = subprocess.run(
            ["git", "-C", str(ROOT), "archive", ref],
            capture_output=True, check=True,
        ).stdout
        subprocess.run(
            ["tar", "-x", "-C", td], input=tar, check=True
        )
        env = dict(os.environ, PYTHONPATH=td)
        out = subprocess.run(
            [sys.executable, str(Path(__file__).resolve()), "--emit-json"],
            capture_output=True, text=True, env=env, cwd=td, check=True,
        ).stdout
        # last line is the JSON (anything above is stray import noise)
        return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--emit-json", action="store_true",
        help="print {key: hash} for the tree on PYTHONPATH and exit",
    )
    ap.add_argument(
        "--seed", action="store_true",
        help="rebuild every entry from each key's actual tested tree "
        "(parent of the per-round driver commit) — one-time bootstrap",
    )
    args = ap.parse_args()

    if args.emit_json:
        print(json.dumps(compute_all_hashes(), sort_keys=True))
        return

    path = ROOT / "KEYHASHES.json"
    try:
        recorded = json.loads(path.read_text())
    except (OSError, ValueError):
        recorded = {}

    _, rounds = _latest_rows_and_rounds(ROOT)
    if args.seed:
        for rnd in sorted(set(rounds.values())):
            keys = [k for k, r in rounds.items() if r == rnd]
            ref = _driver_commit_parent(rnd)
            if ref is None:
                print(f"round {rnd}: no driver commit found — skipped "
                      f"({len(keys)} keys keep existing entries)")
                continue
            hashes = _hashes_at_ref(ref)
            hit = [k for k in keys if k in hashes]
            for k in hit:
                recorded[k] = {**hashes[k], "round": rnd}
            print(f"round {rnd}: {len(hit)}/{len(keys)} keys hashed "
                  f"at {ref}")
    else:
        latest = max(rounds.values(), default=None)
        if latest is None:
            print("no CORRECTNESS records — nothing to do")
            return
        fresh = [k for k, r in rounds.items() if r == latest]
        # ORDER-INDEPENDENT since round 12 (r11 verdict "What's
        # missing" #1: the refresh was a manual round-START step —
        # a builder who edited key code first mis-hashed the fresh
        # rows forever). The tree the round-N driver record tested
        # is pinned in git (parent of the `round N: verdict` driver
        # commit), so hash THAT tree via the seed path instead of
        # whatever the working tree currently holds; running the
        # refresh late is now harmless. The newest round's record can
        # exist BEFORE its verdict commit (untracked hand-off state);
        # there the policy resolves to HEAD — the committed tree the
        # driver tested (round 14). Working-tree fallback only for a
        # detached/shallow checkout where even HEAD is unusable.
        parent = _driver_commit_parent(latest)
        sweep_sha = _record_sweep_sha(latest)
        ref = _resolve_attested_ref(latest, parent, latest, sweep_sha)
        hashes = None
        if ref is not None:
            # a resolvable POLICY does not guarantee a resolvable
            # TREE: in a detached/shallow/non-git checkout `git
            # archive HEAD` raises — degrade to the working tree like
            # attested_hashes() does instead of crashing (r14 advice
            # item 2; the documented fallback branch below was
            # unreachable since ref is never None for the newest
            # round).
            try:
                hashes = _hashes_at_ref(ref)
                src = f"the driver-tested tree ({ref})"
                path_taken = (
                    "verdict-parent" if parent is not None
                    else "record-sha" if sweep_sha else "head"
                )
            except (subprocess.CalledProcessError, OSError, ValueError):
                hashes = None
        if hashes is None:
            sys.path.insert(0, str(ROOT))
            hashes = compute_all_hashes()
            src = "the CURRENT tree (driver tree not extractable — run " \
                  "BEFORE editing key code)"
            path_taken = "working-tree"
        for k in fresh:
            if k in hashes:
                recorded[k] = {**hashes[k], "round": latest}
        # one-line audit trail INSIDE the committed record (r14 verdict
        # item 8): which resolution path each round's refresh took, so
        # a regression of the checkpoint class is visible in
        # KEYHASHES.json itself, not only at test time. The dunder
        # entry is invisible to key logic (consumers look up registry
        # key names / filter on dict-shaped values).
        audit = recorded.get("__resolution_audit__")
        if not isinstance(audit, dict):
            audit = {}
        audit[str(latest)] = {"path": path_taken, "ref": ref}
        recorded["__resolution_audit__"] = audit
        print(f"round {latest}: updated {len(fresh)} entries from {src} "
              f"[resolution: {path_taken}]")
        # baseline-stamp NEVER-RECORDED keys (added this round, no
        # driver row yet) from the CURRENT tree: their first
        # CORRECTNESS row will be newer than any snapshot by
        # construction, and the hash-aware staleness guard then needs
        # a recorded hash to compare against — without this, every
        # judge checkpoint after a round that added keys was red on
        # exactly those keys (the r11 checkpoint's variant of the
        # hand-off failure). Stamped at the latest known round; when
        # their first row lands, the next refresh re-stamps them at
        # the actually-tested tree. The entry carries ``baseline:
        # true`` so a stamp the driver never verified is never
        # confusable with a driver-attested row (the round field
        # alone would misrepresent verification — r12 advice); the
        # re-stamp above drops the marker once a real row lands.
        sys.path.insert(0, str(ROOT))
        cur = compute_all_hashes()
        newkeys = sorted(k for k in cur if k not in recorded)
        for k in newkeys:
            recorded[k] = {**cur[k], "round": latest, "baseline": True}
        if newkeys:
            print(f"baseline-stamped {len(newkeys)} never-recorded "
                  f"keys from the current tree: {newkeys}")

    path.write_text(json.dumps(recorded, indent=1, sort_keys=True) + "\n")
    print(f"wrote {path} ({len(recorded)} entries)")


if __name__ == "__main__":
    main()
