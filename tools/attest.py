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

Scope boundary (documented, deliberate): cross-module helpers
(catalog.load_table, parity, session) are shared by essentially every
query — hashing them would flag all 252 on any touch, overflowing the
50-slot window.  Changes there are covered by the local sf0.01 full
sweep (.claude/skills/verify) and the pytest oracles instead.

Usage:
    python tools/attest.py                    # report drift (exit 1 if
                                              # a drifted query is not
                                              # in the driver window)
    python tools/attest.py --refresh          # after a driver round:
                                              # re-attest the queries in
                                              # the LATEST CORRECTNESS
                                              # file at their current
                                              # hashes
    python tools/attest.py --refresh-all      # bootstrap / rebuild the
                                              # whole baseline
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


def _closure_source(fn) -> str:
    """Source of fn plus every same-module top-level definition it
    (transitively) references by bare name, in sorted-name order so the
    hash is insertion-order independent."""
    mod = inspect.getmodule(fn)
    src, defs = _module_defs(mod)
    root = fn.__name__
    seen: set[str] = set()
    stack = [root]
    while stack:
        n = stack.pop()
        if n in seen or n not in defs:
            continue
        seen.add(n)
        for sub in ast.walk(defs[n]):
            if isinstance(sub, ast.Name) and sub.id in defs:
                if sub.id not in seen:
                    stack.append(sub.id)
    parts = []
    for n in sorted(seen):
        seg = ast.get_source_segment(src, defs[n])
        parts.append(seg or "")
    return "\n".join(parts)


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
        hit = 0
        for n in names:
            if n in cur:
                base[n] = {"hash": cur[n], "attested_round": rnd}
                hit += 1
        save_baseline(base)
        print(f"re-attested {hit} queries from {latest.name}")
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
