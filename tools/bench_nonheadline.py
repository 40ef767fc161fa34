#!/usr/bin/env python
"""One-off sf0.1 timing sweep of every registered query NOT in
bench.py's headliner set (VERDICT r7 #4): the per-round bench and the
sf1 soak cover the 158 headliners, so a secretly-expensive
non-headliner would be invisible to every standing gate.  Same
methodology as bench.py (noop-format write, min of 2 runs, cache
cleared between runs); writes BENCH_nonheadline_r8.json at the repo
root.  Anything >2 s gets a one-line adjudication in SCALE.md.

    python tools/bench_nonheadline.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parent.parent
if str(_REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(_REPO_ROOT))

import bench  # noqa: E402
from etl_embargo_spark import registry  # noqa: E402
from etl_embargo_spark.session import get_spark, load_context  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_start = load_context()  # VERDICT r9 #5: contention in-artifact
    spark = get_spark("etl_embargo_spark_bench_nonheadline")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = registry.queries()
    names = [n for n in sorted(qmap) if n not in set(bench.HEADLINE)]
    qmap["q_count"](spark, sf_dir).collect()  # warm JVM + footers
    bench._warm_python_runner(spark)  # spawn the python worker pool untimed
    timings: dict[str, float] = {}
    for name in names:
        fn = qmap[name]
        best = None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:
                print(f"# {name} FAILED: {exc}", file=sys.stderr)
                # ADVICE r8: a run-2 failure must record -1.0, not keep
                # run 1's time — a flaky query is a red row, not green
                # (mirrors tools/soak.py).
                best = None
                break
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        timings[name] = round(best, 3) if best is not None else -1.0
        print(f"  {name}: {timings[name]}", file=sys.stderr, flush=True)
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    out = _REPO_ROOT / (
        sys.argv[1] if len(sys.argv) > 1 else "BENCH_nonheadline_r9.json"
    )
    out.write_text(
        json.dumps(
            {
                "queries": timings,
                "load": {"start": load_start, "end": load_context()},
                "metric": "nonheadline_queries_total",
                "unit": "sec",
                "n_queries": len(timings),
                "sf": bench._sf_from_dir(sf_dir),
                "value": total,
            },
            indent=1,
        )
        + "\n"
    )
    over2 = {n: t for n, t in sorted(timings.items(), key=lambda x: -x[1])
             if t > 2.0}
    print(json.dumps({"total": total, "n": len(timings), "over_2s": over2}))


if __name__ == "__main__":
    main()
