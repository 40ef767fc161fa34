#!/usr/bin/env python
"""Regenerate QUERIES.md from the live registry.  Run after any
register() change:  python tools/gen_queries_md.py
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parent.parent
if str(_REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(_REPO_ROOT))

from etl_embargo_spark import registry  # noqa: E402

HEADER = """# Query inventory

Auto-generated from `etl_embargo_spark/registry.py` — one row per
registered driver query. "oracle" = DuckDB SQL hash-compare at sf0.01;
rows-only queries carry pytest oracles instead (see docstrings).

| query | implementation | oracle | what it computes |
|---|---|---|---|
"""


def _impl_path(fn) -> str:
    mod = fn.__module__.removeprefix("etl_embargo_spark.")
    return f"{mod}.{fn.__qualname__}"


def _summary(fn) -> str:
    doc = (fn.__doc__ or "").strip().splitlines()
    return doc[0].strip() if doc else ""


def main() -> None:
    oracles = registry.oracle_sql()
    rows = []
    for name, fn in sorted(registry.queries().items()):
        kind = "SQL" if name in oracles else "pytest"
        rows.append(
            f"| `{name}` | `{_impl_path(fn)}` | {kind} | {_summary(fn)} |"
        )
    n_sql = len(oracles)
    out = (
        HEADER
        + "\n".join(rows)
        + f"\n\nTotal: {len(rows)} queries, {n_sql} oracle-checked.\n"
    )
    (_REPO_ROOT / "QUERIES.md").write_text(out)
    print(f"QUERIES.md: {len(rows)} queries, {n_sql} oracle-checked")


if __name__ == "__main__":
    main()
