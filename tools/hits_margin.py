#!/usr/bin/env python
"""HITS pin-margin audit (ADVICE r10 #1): the pinned q_hits detail rounds
raw double scores to 8 dp, and CLAUDE.md's own rule says raw double
per-key sums are partition-merge-order-dependent (~1 ulp of noise).  The
pins are safe iff no raw score sits within merge noise of an
x.xxxxxxxx5 half-up boundary.  This measures the MINIMUM distance of
every raw hub/auth score to its nearest rounding boundary at each gate
SF and prints it next to the worst-case merge noise (a few ulps of the
score's magnitude) — a margin of many orders of magnitude is recorded
evidence; a tight one means the computation must move to decimal-cast
per-round sums.

Usage:  python tools/hits_margin.py [sf_dir ...]
(defaults to the three gate SFs + /tmp/td_sf1/sf1 when present)
"""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        "/tmp/td_sf1/sf1",
    ]
    from etl_embargo_spark.operators.graph import hits_scores
    from etl_embargo_spark.session import get_spark

    spark = get_spark("hits_margin")
    spark.sparkContext.setLogLevel("ERROR")
    for sf in dirs:
        if not os.path.isdir(sf):
            print(f"{sf}: missing, skipped")
            continue
        hubs, auths = hits_scores(spark, sf, rounded=False)
        worst = (float("inf"), None, None)
        n = 0
        for side, df in (("hub", hubs), ("auth", auths)):
            for row in df.collect():
                s = float(row.score)
                n += 1
                # distance to the nearest half-up boundary at 8 dp:
                # boundaries live at (k + 0.5) * 1e-8
                scaled = s * 1e8
                frac = scaled - math.floor(scaled)
                dist = abs(frac - 0.5) * 1e-8
                if dist < worst[0]:
                    worst = (dist, side, s)
            # merge noise bound: a handful of ulps of the largest score
        dist, side, s = worst
        ulp = math.ulp(s if s else 1.0)
        print(
            f"{sf}: n={n} min boundary distance {dist:.3e} "
            f"({side} score {s!r}), ulp(score)={ulp:.3e}, "
            f"margin = {dist / (8 * ulp):.1f}x an 8-ulp noise bound"
        )


if __name__ == "__main__":
    main()
