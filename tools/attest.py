#!/usr/bin/env python
"""Driver-attestation ledger (VERDICT r7 #2): make stale driver rows
structurally impossible.

Every registered query carries a content hash over

  * the builder function's source PLUS the transitive closure of every
    same-module top-level function / class / constant it references
    (AST name analysis — this is what catches a helper edit like
    q_stem's porter_stem, which a bare ``inspect.getsource(fn)`` hash
    would miss), and
  * its resolved DuckDB oracle SQL from the registry (constants are
    interpolated at registration time, so a cutoff change surfaces
    here even when no builder line moved), or the pinned-oracle VALUES
    payload for pinned queries (a pin regeneration re-attests).

The baseline in tools/attestations.json records the hash each query's
most recent driver CORRECTNESS row attests.  tests/test_attestations.py
fails when a query's current hash differs from its attested hash (or it
has never been driver-checked) and it is NOT fronted in
``registry.DRIVER_WINDOW_FIRST`` — i.e. a semantic change can no longer
ship on a stale attestation; it must ride the next driver window.

The closure also follows in-function ``from etl_embargo_spark.… import
X`` statements into SIBLING modules (ADVICE r8: geo.q_spatial_join's
use of dedup._bucket_pairs must flag the geo consumer when the dedup
kernel changes), EXCEPT the deliberate scope boundary below.

Scope boundary (documented, deliberate): cross-module helpers shared by
essentially every query (catalog.load_table / table_rows /
spread_for_cpu, parity, session) are NOT hashed — they would flag all
252 on any touch, overflowing the 50-slot window.  Changes there are
covered by the local sf0.01 full sweep (.claude/skills/verify) and the
pytest oracles instead.

Usage:
    python tools/attest.py                    # report drift (exit 1 if
                                              # a drifted query is not
                                              # in the driver window)
    python tools/attest.py --refresh          # after a driver round:
                                              # re-attest the queries in
                                              # the LATEST CORRECTNESS
                                              # file (prefers the
                                              # committed round-end
                                              # snapshot's hashes, and
                                              # warns when the current
                                              # hash already differs)
    python tools/attest.py --refresh-all      # bootstrap / rebuild the
                                              # whole baseline
    python tools/attest.py --snapshot         # round-end: freeze the
                                              # current hashes the
                                              # driver is about to
                                              # attest (commit it) so
                                              # the next --refresh
                                              # can't attest post-run
                                              # edits (ADVICE r8)
    python tools/attest.py --window [N]       # emit the next driver
                                              # window: never-checked +
                                              # drifted first, then
                                              # oldest-attested-first
                                              # (VERDICT r8 #2)
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import re
import sys
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parent.parent
if str(_REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(_REPO_ROOT))

BASELINE_PATH = _REPO_ROOT / "tools" / "attestations.json"
SNAPSHOT_PATH = _REPO_ROOT / "tools" / "attest_snapshot.json"

# Modules deliberately OUTSIDE the hash closure (see module docstring).
_SCOPE_EXCLUDE = {"catalog", "parity", "session"}

_MOD_CACHE: dict[str, tuple[str, dict[str, ast.AST]]] = {}


def _module_defs(mod) -> tuple[str, dict[str, ast.AST]]:
    """Map of top-level name -> AST node (functions, classes, and
    constant assignments) for a module, cached per module."""
    key = mod.__name__
    if key in _MOD_CACHE:
        return _MOD_CACHE[key]
    src = inspect.getsource(mod)
    tree = ast.parse(src)
    defs: dict[str, ast.AST] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            defs[node.name] = node
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    defs[t.id] = node
        elif isinstance(node, ast.AnnAssign) and isinstance(
                node.target, ast.Name):
            defs[node.target.id] = node
    _MOD_CACHE[key] = (src, defs)
    return src, defs


def _followable(modname: str | None) -> bool:
    """True for repo modules inside the hash scope (sibling operator /
    function / source modules), False for the documented exclusions."""
    if not modname or not modname.startswith("etl_embargo_spark"):
        return False
    return modname.rsplit(".", 1)[-1] not in _SCOPE_EXCLUDE


def _closure_source(fn) -> str:
    """Source of fn plus every top-level definition it (transitively)
    references — same-module bare names AND in-function ``from
    etl_embargo_spark.… import X`` targets in sibling modules (ADVICE
    r8: a dedup._bucket_pairs change must flag its geo/graph
    consumers).  Parts are keyed (module, name) and emitted in sorted
    order so the hash is insertion-order independent."""
    import importlib

    mod = inspect.getmodule(fn)
    seen: set[tuple[str, str]] = set()
    stack: list[tuple[str, str]] = [(mod.__name__, fn.__name__)]
    parts: dict[tuple[str, str], str] = {}
    while stack:
        modname, n = stack.pop()
        if (modname, n) in seen:
            continue
        seen.add((modname, n))
        try:
            src, defs = _module_defs(importlib.import_module(modname))
        except Exception:
            continue
        if n not in defs:
            continue
        node = defs[n]
        parts[(modname, n)] = ast.get_source_segment(src, node) or ""
        for sub in ast.walk(node):
            if isinstance(sub, ast.Name) and sub.id in defs:
                stack.append((modname, sub.id))
            elif isinstance(sub, ast.ImportFrom) and _followable(
                    sub.module):
                for alias in sub.names:
                    stack.append((sub.module, alias.name))
    return "\n".join(parts[k] for k in sorted(parts))


def _oracle_component(name: str) -> str:
    """Resolved oracle SQL, or the pinned VALUES payload, or a rows-only
    marker — whichever the driver would actually compare against."""
    from etl_embargo_spark import registry

    sql = registry._REGISTRY[name][1]
    if sql is not None:
        return "SQL:" + sql
    try:
        from etl_embargo_spark.pins import PINS
    except ImportError:
        return "ROWS_ONLY"
    p = PINS.get(name)
    if p is None:
        return "ROWS_ONLY"
    return "PIN:" + repr(sorted(
        (c, tuple(map(tuple, rws))) for c, rws in p["by_count"].items()
    )) + repr(p["columns"]) + repr(p["guard_table"])


def current_hashes() -> dict[str, str]:
    from etl_embargo_spark import registry

    out = {}
    for name, (fn, _) in registry._REGISTRY.items():
        blob = (
            _closure_source(fn)
            + "\x00" + fn.__module__
            + "\x00" + _oracle_component(name)
        )
        out[name] = hashlib.sha256(blob.encode()).hexdigest()[:16]
    return out


def correctness_rounds() -> dict[str, int]:
    """name -> latest driver round with a CORRECTNESS row (any verdict;
    a red row still attests the form was RUN — drift since then is what
    we track)."""
    latest: dict[str, int] = {}
    for p in sorted(_REPO_ROOT.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        for name in data:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def load_baseline() -> dict[str, dict]:
    if not BASELINE_PATH.exists():
        return {}
    return json.loads(BASELINE_PATH.read_text())["queries"]


def save_baseline(queries: dict[str, dict]) -> None:
    doc = {
        "_meta": {
            "format": 1,
            "note": "hash = sha256[:16] over builder same-module "
                    "transitive source closure + resolved oracle/pin; "
                    "see tools/attest.py",
        },
        "queries": {k: queries[k] for k in sorted(queries)},
    }
    BASELINE_PATH.write_text(json.dumps(doc, indent=1) + "\n")


def drift_report() -> tuple[list[str], list[str]]:
    """Returns (never_checked, drifted): registered queries with no
    driver row ever, and queries whose current hash differs from the
    attested baseline hash."""
    cur = current_hashes()
    base = load_baseline()
    rounds = correctness_rounds()
    never = [n for n in cur if n not in rounds]
    drifted = [
        n for n in cur
        if n in rounds and (n not in base or base[n]["hash"] != cur[n])
    ]
    return never, drifted


def window_list(n: int = 50) -> list[str]:
    """The next driver window under the standing policy (VERDICT r8 #2):
    never-checked queries and drifted queries first (they MUST ride),
    then everything else oldest-attestation-first so no query's driver
    row rots beyond ~5 rounds.  Deterministic: ties break on name."""
    cur = current_hashes()
    base = load_baseline()
    never, drifted = drift_report()
    front = sorted(never) + sorted(d for d in drifted if d not in never)
    rest = sorted(
        (q for q in cur if q not in set(front)),
        key=lambda q: (base.get(q, {}).get("attested_round") or 0, q),
    )
    return (front + rest)[:n]


def main(argv: list[str]) -> int:
    from etl_embargo_spark import registry

    cur = current_hashes()
    rounds = correctness_rounds()
    if "--refresh-all" in argv:
        save_baseline({
            n: {"hash": h, "attested_round": rounds.get(n)}
            for n, h in cur.items()
        })
        print(f"attestations.json: {len(cur)} queries baselined "
              f"({sum(1 for n in cur if n in rounds)} with driver rows)")
        return 0
    if "--snapshot" in argv:
        SNAPSHOT_PATH.write_text(json.dumps(
            {"note": "hashes frozen at round end, pre-driver-run; "
                     "--refresh attests THESE, not post-run edits",
             "hashes": dict(sorted(cur.items()))}, indent=1) + "\n")
        print(f"snapshot: {len(cur)} hashes -> {SNAPSHOT_PATH.name}")
        return 0
    if "--refresh" in argv:
        files = sorted(
            _REPO_ROOT.glob("CORRECTNESS_r*.json"),
            key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
        )
        if not files:
            print("no CORRECTNESS files to refresh from", file=sys.stderr)
            return 1
        latest = files[-1]
        names = set(json.loads(latest.read_text()))
        base = load_baseline()
        rnd = int(re.search(r"r(\d+)", latest.name).group(1))
        # ADVICE r8: attest the hash the driver actually RAN (the
        # committed round-end snapshot), not whatever the source hashes
        # to now — an edit landed between the driver run and this
        # refresh must stay visibly drifted.
        snap: dict[str, str] = {}
        if SNAPSHOT_PATH.exists():
            snap = json.loads(SNAPSHOT_PATH.read_text()).get("hashes", {})
        hit = 0
        for n in names:
            if n in cur:
                attested = snap.get(n, cur[n])
                if n in snap and snap[n] != cur[n]:
                    print(f"WARNING: {n} edited after the driver run — "
                          f"attesting the snapshot hash; it stays "
                          f"drifted until re-ridden", file=sys.stderr)
                base[n] = {"hash": attested, "attested_round": rnd}
                hit += 1
        save_baseline(base)
        print(f"re-attested {hit} queries from {latest.name}"
              + (" (snapshot hashes)" if snap else " (no snapshot)"))
        return 0
    if "--window" in argv:
        i = argv.index("--window")
        n = int(argv[i + 1]) if i + 1 < len(argv) and \
            argv[i + 1].isdigit() else 50
        for q in window_list(n):
            print(q)
        return 0
    never, drifted = drift_report()
    window = set(registry.DRIVER_WINDOW_FIRST)
    queue = set(getattr(registry, "DRIVER_QUEUE_NEXT", []))
    # a queue entry is an acceptable home for DRIFT (the visible promise
    # to ride the next window) but not for never-checked queries
    bad = [n for n in never if n not in window] + [
        n for n in drifted if n not in window | queue
    ]
    for n in never:
        print(f"never-checked: {n}"
              + ("" if n in window else "  ** NOT IN WINDOW **"))
    for n in drifted:
        tag = ("" if n in window
               else "  (queued for next window)" if n in queue
               else "  ** NOT IN WINDOW **")
        print(f"drifted:       {n}{tag}")
    print(f"{len(never)} never-checked, {len(drifted)} drifted, "
          f"{len(bad)} missing from DRIVER_WINDOW_FIRST/QUEUE")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
