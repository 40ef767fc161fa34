"""Z-order data layout: multi-dimensional clustering for file skipping.

The reference's only layout device is the date-prefix path scheme
(/root/reference/embargo.go:266 — one pruning dimension, baked into the
path).  At 100 TB a table is queried along MORE than one dimension, and
partition directories can't serve two masters.  Z-ordering solves this at
the file level: rows are sorted by the bit-interleaving of their (rank-
normalized) cluster columns, so each written file covers a small hyper-
rectangle of the key space, and parquet min/max footer stats let any
engine skip whole files/row-groups for selective predicates on ANY of the
clustered columns — not just the first sort key.

Everything here is codegen built-ins (shift/mask/or) over a broadcast
min-max normalization; the sort is Spark's regular range-partitioned
sort.  No UDFs, no driver-side data movement.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits per dimension; 2 dims -> 32-bit z-value


def _scaled(col: str, lo: Column, hi: Column, bits: int) -> Column:
    """Min-max normalize a numeric column onto [0, 2^bits - 1] as a long.
    Degenerate ranges (max == min) map to 0 — every row lands in one cell,
    which is the right answer for a constant column."""
    span = hi - lo
    unit = (F.col(col).cast("double") - lo) / F.when(span > 0, span).otherwise(
        F.lit(1.0)
    )
    return F.least(
        F.floor(unit * ((1 << bits) - 1)).cast("long"),
        F.lit((1 << bits) - 1),
    )


def zorder_key(cols: list[Column]) -> Column:
    """Interleave the low ZBITS bits of each (already-scaled) long column
    into one z-value: bit i of dimension d lands at position
    i * ndims + d.  Pure shift/mask/or expression tree — whole-stage
    codegen compiles it to straight-line JVM arithmetic."""
    ndims = len(cols)
    terms = []
    for d, c in enumerate(cols):
        for i in range(ZBITS):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * ndims + d))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def with_zorder(df: DataFrame, cols: list[str]) -> DataFrame:
    """Attach a ``_zkey`` column: broadcast the per-column min/max (one
    tiny agg, no collect), scale each dimension, interleave."""
    aggs = df.agg(
        *[F.min(c).cast("double").alias(f"_lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_hi_{c}") for c in cols],
    )
    scaled = [
        _scaled(c, F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), ZBITS) for c in cols
    ]
    return (
        df.crossJoin(F.broadcast(aggs))
        .withColumn("_zkey", zorder_key(scaled))
        .drop(*[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols])
    )


def zorder_write(
    df: DataFrame, cols: list[str], path: str, n_files: int
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered by the z-order
    of ``cols``: range-partition on the z-value (each output file gets a
    contiguous z-range = a compact region of the key space), sort within
    partitions so row-group stats are tight too.

    The range partitioner's sampling pass re-reads the input once — for a
    layout-rewrite job that is the expected cost (and at 100 TB the input
    of a compaction/cluster pass is a materialized table, not a long
    lineage)."""
    keyed = with_zorder(df, cols)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
