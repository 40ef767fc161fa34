"""Aggregations (SURVEY A1-A3) and emptiness/count checks.

The reference's only aggregates are set-dedup (map insertion), counts, and
Prometheus labeled counters.  All map to ``distinct``/``count``/
``groupBy().count()`` — Spark's HashAggregate does the partial/final split
(map-side combine) automatically, so the grouped counts shuffle only one
partial row per (group × partition), not the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_embargo_spark.catalog import load_table


def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — dedup into a key set (/root/reference/embargo_check.go:41,52-56)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


def q_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — cardinality (/root/reference/embargo_check.go:58)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(F.count(F.lit(1)).alias("n_rows"))


def q_empty_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/K6 — emptiness test before bucket delete
    (/root/reference/gcs_operations.go:142): count under an impossible
    predicate; 0 ⇔ deletable."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") < 0).agg(
        F.count(F.lit(1)).alias("n_rows")
    )


def q_metrics_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — labeled counters as a grouped count: the batch equivalent of the
    reference's ``CounterVec`` keyed (dataset, status)
    (/root/reference/metrics/metrics.go:19-77)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.col("l_returnflag").alias("dataset"),
            F.col("l_linestatus").alias("status"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def observed_metrics(df: DataFrame, name: str = "etl_metrics") -> DataFrame:
    """Live-counter form of A3: ``df.observe`` attaches the counters to the
    job without a second scan — the Spark-native Prometheus analog
    (collected via a QueryExecutionListener on a cluster)."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("files_total"),
        F.sum(F.when(F.col("visibility") == "public", 1).otherwise(0)).alias(
            "files_public"
        ),
        F.sum(F.when(F.col("visibility") == "private", 1).otherwise(0)).alias(
            "files_private"
        ),
    )


PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def q_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of lineitem's numeric measures: row count
    plus null count / distinct count / min / max per column — the
    data-quality sweep a pipeline runs before trusting a new drop.  All
    stats for all columns compute in a single aggregation (one scan, one
    reduce); the exact distincts share the scan via Catalyst's expand,
    with map-side partials bounding the shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in PROFILE_COLS:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}"),
            F.countDistinct(c).alias(f"distinct_{c}"),
            F.round(F.min(c), 2).alias(f"min_{c}"),
            F.round(F.max(c), 2).alias(f"max_{c}"),
        ]
    return li.agg(*aggs)
