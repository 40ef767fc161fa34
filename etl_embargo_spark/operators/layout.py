"""Data-layout optimization: Z-order (Morton) clustering and its
measurable effect on block skipping.

At 100 TB the dominant cost is the scan, and the dominant scan saver is
file/row-group skipping on min/max statistics.  A layout sorted on ONE
column prunes only that column's predicates; interleaving the bits of two
grid coordinates (Z-order) gives every participating column partial
locality, so 2-D box predicates touch O(√blocks) instead of all of them —
the Delta/Iceberg ``ZORDER BY`` story, reproduced here as a first-class
operator with an auditable skipping metric instead of a black box.

Everything is exact integer arithmetic (grid scaling via integer
division, bit interleave via shift/or), so the whole pipeline — including
the simulated min/max skipping audit — is SQL-expressible and
oracle-checked against DuckDB.

Scale shape: one fact scan; the only extra relation is a broadcast 1-row
(max_partkey, max_suppkey) aggregate; the per-(layout, block) min/max
rollup is the same aggregation a writer computes when it collects file
statistics.  No shuffle beyond the two tiny group-bys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_embargo_spark.catalog import load_table
from etl_embargo_spark.sinks.layout import zorder_key

GRID_BITS = 5          # 32 × 32 grid cells
GRID = 1 << GRID_BITS
CELLS_PER_BLOCK = 16   # 1024 cells / 16 = 64 blocks in either layout
# box predicate in grid coordinates: the middle quarter square
BOX_LO, BOX_HI = 8, 15

# The interleave itself is sinks.layout.zorder_key (the write-side
# clustering helper): dimension d's bit i lands at position i*ndims + d,
# so with cols=[gx, gy] the gx bits occupy the even lanes.  ZBITS=16
# there vs 5 grid bits here is immaterial — the high bits are all zero.


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skipping audit: the same lineitem rows laid out (a) Z-ordered on
    (partkey, suppkey) and (b) linearly sorted (partkey, then suppkey),
    both cut into 64 equal-cell-range blocks; per layout, how many blocks
    a min/max-statistics reader must touch for the middle-quarter box
    predicate, and how many rows those blocks hold vs the rows that
    actually match.

    The touched-block rule is EXACTLY parquet row-group skipping: a block
    is read iff its [min, max] interval per predicate column intersects
    the box.  Z-order wins because each of its blocks spans a compact
    square of the grid, so both intervals are narrow; the linear layout's
    blocks span the full suppkey range, making the suppkey half of the
    predicate useless for pruning.
    """
    li = load_table(spark, sf_dir, "lineitem")
    maxes = li.agg(
        F.max("l_partkey").alias("max_p"), F.max("l_suppkey").alias("max_s")
    )
    g = (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(maxes))
        .select(
            F.expr(
                f"CAST(l_partkey * {GRID} AS BIGINT) div (max_p + 1)"
            ).alias("gx"),
            F.expr(
                f"CAST(l_suppkey * {GRID} AS BIGINT) div (max_s + 1)"
            ).alias("gy"),
        )
        .withColumn(
            "zblock",
            (
                zorder_key([F.col("gx"), F.col("gy")]) / CELLS_PER_BLOCK
            ).cast("bigint"),
        )
        # linear layout: sorted by (gx, gy) → a block is 16 consecutive
        # cells of that order: gx*2 + gy div 16
        .withColumn(
            "lblock",
            F.expr(f"gx * {GRID // CELLS_PER_BLOCK} + gy div {CELLS_PER_BLOCK}"),
        )
    )
    tagged = g.select(
        "gx",
        "gy",
        F.expr("stack(2, 'zorder', zblock, 'linear', lblock)").alias(
            "layout", "block"
        ),
    )
    in_box = (
        (F.col("min_gx") <= BOX_HI)
        & (F.col("max_gx") >= BOX_LO)
        & (F.col("min_gy") <= BOX_HI)
        & (F.col("max_gy") >= BOX_LO)
    )
    blocks = tagged.groupBy("layout", "block").agg(
        F.min("gx").alias("min_gx"),
        F.max("gx").alias("max_gx"),
        F.min("gy").alias("min_gy"),
        F.max("gy").alias("max_gy"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(
                F.col("gx").between(BOX_LO, BOX_HI)
                & F.col("gy").between(BOX_LO, BOX_HI),
                1,
            ).otherwise(0)
        ).alias("n_match"),
    )
    return blocks.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.when(in_box, 1).otherwise(0)).alias("n_blocks_touched"),
        F.sum(F.when(in_box, F.col("n_rows")).otherwise(0)).alias(
            "n_rows_scanned"
        ),
        F.sum("n_match").alias("n_rows_matching"),
    )
