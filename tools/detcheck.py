"""Cross-config determinism check for pin candidates.

Runs each named query at sf0.01 (and optionally other SF dirs) under
several (master, shuffle.partitions) configurations in SEPARATE processes
(one JVM per config — in-process master switching is not honest) and
compares an md5 of the sorted collected rows (never Python hash(): it is
per-process salted).  A query whose digest differs across configs is NOT
partition-layout independent and must not be pinned.

Usage:
    cd /tmp && python /root/repo/tools/detcheck.py q_a,q_b [sf_dir ...]
Exit code 1 on any mismatch.
"""

from __future__ import annotations

import hashlib
import json
import subprocess
import sys

CONFIGS = [
    ("local[8]", "8"),
    ("local[32]", "32"),
    ("local[3]", "5"),
]

_CHILD = r"""
import sys, hashlib, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

master, shuffle, names_csv, sf_dirs_json = sys.argv[1:5]
spark = (
    SparkSession.builder.master(master)
    .config("spark.sql.shuffle.partitions", shuffle)
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from etl_embargo_spark import registry
qs = registry.queries()
out = {}
for name in names_csv.split(","):
    for sf in json.loads(sf_dirs_json):
        rows = sorted(tuple(r) for r in qs[name](spark, sf).collect())
        digest = hashlib.md5(repr(rows).encode()).hexdigest()
        out[f"{name}@{sf}"] = digest
print("DETCHECK " + json.dumps(out))
"""


def main() -> None:
    names = sys.argv[1]
    sf_dirs = sys.argv[2:] or ["/root/testdata/sf0.01"]
    digests: dict[str, dict[str, str]] = {}
    for master, shuffle in CONFIGS:
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD, master, shuffle, names,
             json.dumps(sf_dirs)],
            capture_output=True, text=True, cwd="/tmp",
        )
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("DETCHECK ")]
        if not line:
            print(f"config {master}/{shuffle} FAILED:\n{proc.stderr[-3000:]}")
            sys.exit(1)
        digests[f"{master}/{shuffle}"] = json.loads(line[0][9:])
        print(f"{master}/{shuffle}: ok")
    ok = True
    keys = next(iter(digests.values())).keys()
    for k in keys:
        vals = {cfg: d[k] for cfg, d in digests.items()}
        if len(set(vals.values())) != 1:
            ok = False
            print(f"MISMATCH {k}: {vals}")
        else:
            print(f"stable   {k}: {next(iter(vals.values()))[:12]}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
