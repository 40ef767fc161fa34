"""Output compaction: size-targeted file layout for parquet sinks.

The small-files problem is the dominant sink failure mode at 100 TB: a
32k-partition job writing a modest result emits 32k tiny files, and every
downstream scan pays per-file open/footer/listing cost (plus object-store
request rates).  The fix is to pick the file COUNT from the data size, not
from the job's partition count.

Two complementary controls:

* ``repartition(n)`` down to ``ceil(est_bytes / target)`` files — an extra
  round-robin shuffle of exactly the output data, which is the cheapest
  shuffle in the job by construction (results are post-filter/post-agg).
* ``maxRecordsPerFile`` as the upper-bound guard so one skewed output
  partition can't produce a multi-GB file.

``est_bytes`` comes from the caller (input size × observed selectivity, or
a prior run's output) — estimating it with a count() action here would
execute the plan twice.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

TARGET_FILE_BYTES = 128 * 1024 * 1024


def n_output_files(est_bytes: int, target_file_bytes: int = TARGET_FILE_BYTES) -> int:
    """ceil(est/target), floored at one file."""
    return max(1, math.ceil(est_bytes / max(1, target_file_bytes)))


def write_compacted(
    df: DataFrame,
    out_dir: str,
    est_bytes: int,
    target_file_bytes: int = TARGET_FILE_BYTES,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> int:
    """Write ``df`` as ~``est_bytes / target_file_bytes`` parquet files;
    returns the file count used."""
    n = n_output_files(est_bytes, target_file_bytes)
    writer = df.repartition(n).write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(out_dir)
    return n
