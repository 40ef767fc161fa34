"""S4 — line-delimited text source: the whitelist loader.

Reference: ``LoadFromLocalWhitelist`` /root/reference/embargo_check.go:84-99 —
one IP per line into a dedup'd set.  Spark form: ``spark.read.text`` +
trim/non-empty + ``distinct()``; the consumer broadcasts it (J1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_whitelist(spark: SparkSession, path: str) -> DataFrame:
    """Load a newline-delimited IP allowlist as ``DataFrame[ip: string]``."""
    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("ip"))
        .filter(F.col("ip") != "")
        .distinct()
    )
