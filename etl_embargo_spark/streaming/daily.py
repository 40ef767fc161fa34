"""ST1-ST3 — the cron-driven pipeline as Structured Streaming, plus
event-time windowing over the ``events`` stream table.

The reference is daily micro-batch (deploy/cron.yaml:2-5;
deploy/deploy.go:89-112): a date partition of new files per run, whitelist
re-read per run, rerun-idempotent.  Spark mapping (SURVEY §2.7):

* file-source ``readStream`` + ``trigger(availableNow=True)`` = "process
  everything new, then stop" — the exact cron contract with exactly-once
  file-sink semantics via checkpoint + commit protocol (ST3).
* the whitelist is re-read inside ``foreachBatch`` so every batch joins
  against fresh dim state (ST2) — deliberately NOT the reference's
  stale-singleton (embargo.go:55-57).
* watermark + tumbling windows cover the late-data surface the reference
  never had (extension, not parity).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window aggregation (works on batch AND streaming
    DataFrames — same expression, which is how batch parity is tested)."""
    # watermarks require TIMESTAMP (tz-aware); NTZ inputs are interpreted as
    # session-UTC instants
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(
            F.window("ts", window).alias("win"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_events_from_parquet(
    spark: SparkSession, events_dir: str, schema: str
) -> DataFrame:
    """File-source stream over a parquet directory (the 'new files arrive
    daily' surface, maxFilesPerTrigger bounds a micro-batch)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(events_dir)
    )


def run_available_now(
    stream_df: DataFrame,
    checkpoint_dir: str,
    out_dir: str,
) -> StreamingQuery:
    """ST1 — drain everything currently available, then stop (the cron-run
    analog).  Parquet sink + checkpoint = exactly-once across reruns."""
    return (
        stream_df.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .start()
    )


def run_foreach_batch(
    stream_df: DataFrame,
    checkpoint_dir: str,
    batch_fn: Callable[[DataFrame, int], None],
) -> StreamingQuery:
    """ST2 — per-batch custom sink with fresh dim state each batch (the
    whitelist-refresh pattern: re-read + re-broadcast inside ``batch_fn``)."""
    return (
        stream_df.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(batch_fn)
        .start()
    )


def streaming_funnel(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: purchases landing within ``horizon`` after
    a view by the same user — the streaming face of the batch funnel
    (operators/temporal.q_funnel).

    Both sides carry watermarks and the join condition bounds event time on
    BOTH ends, which is what lets Spark expire join state: a buffered view
    can be dropped once the purchase-side watermark passes view_ts +
    horizon (without the time bound, stream-stream join state grows
    forever).  Works on batch frames too (watermarks skipped) — that is
    how the parity test pins it to the batch join."""
    v = views.select(
        F.col("user_id").alias("v_user_id"),
        F.col("ts").cast("timestamp").alias("view_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").cast("timestamp").alias("purchase_ts"),
    )
    if v.isStreaming:
        v = v.withWatermark("view_ts", watermark)
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    return p.join(
        v,
        F.expr(
            f"p_user_id = v_user_id AND purchase_ts >= view_ts "
            f"AND purchase_ts <= view_ts + INTERVAL {horizon}"
        ),
    ).select(
        F.col("p_user_id").alias("user_id"),
        "purchase_id",
        "view_ts",
        "purchase_ts",
    )


def dedup_events_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Exactly-once-by-key ingestion: drop re-deliveries of the same
    event_id arriving within the watermark horizon
    (``dropDuplicatesWithinWatermark``).

    This is the streaming face of exact dedup: the state store keeps one
    entry per key only until the watermark passes it, so state size is
    bounded by the horizon's key arrival rate — not by the stream's
    lifetime (a plain streaming ``dropDuplicates`` grows state forever).
    On the batch path the same call degenerates to ``dropDuplicates``."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if src.isStreaming:
        return src.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return src.dropDuplicates(["event_id"])


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user (gap-based), batch or streaming — the
    stateful-operator surface beyond the reference (extension)."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(
            F.session_window("ts", gap).alias("sess"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def value_bins(events: DataFrame) -> DataFrame:
    """(bin, n) histogram of the event ``value`` column using q_psi's
    fixed binning — works on batch and streaming frames alike."""
    from etl_embargo_spark.operators.analytics import (
        PSI_BIN_WIDTH,
        PSI_BINS,
    )

    bin_ = F.least(
        F.floor(F.col("value") / PSI_BIN_WIDTH), F.lit(PSI_BINS - 1)
    ).cast("int")
    return events.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("n")
    )


def psi_vs_baseline(
    batch_events: DataFrame, baseline_cells: DataFrame
) -> DataFrame:
    """One-row (n_events, psi) drift readout of a batch's value
    distribution against fixed baseline cells — q_psi's formula
    (Laplace +1 smoothing, 9-dp-quantized decimal term sum), factored
    so the streaming monitor and its batch-parity test share the exact
    plan."""
    from pyspark.sql import Window

    from etl_embargo_spark.operators.analytics import PSI_BINS

    cells = value_bins(batch_events).withColumnRenamed("n", "n_cur")
    base = baseline_cells.select(
        "bin", F.col("n").alias("n_base")
    )
    j = base.join(cells, "bin", "full_outer").fillna(
        0, subset=["n_base", "n_cur"]
    )
    wall = Window.partitionBy()
    staged = j.select(
        "n_cur",
        (
            (F.col("n_base") + 1.0)
            / (F.sum("n_base").over(wall) + F.lit(float(PSI_BINS)))
        ).alias("p1"),
        (
            (F.col("n_cur") + 1.0)
            / (F.sum("n_cur").over(wall) + F.lit(float(PSI_BINS)))
        ).alias("p2"),
    ).withColumn(
        "term_q",
        F.round(
            (F.col("p2") - F.col("p1"))
            * F.log(F.col("p2") / F.col("p1")),
            9,
        ).cast("decimal(18,9)"),
    )
    return staged.agg(
        F.sum("n_cur").cast("bigint").alias("n_events"),
        F.round(F.sum("term_q").cast("double"), 6).alias("psi"),
    )


def drift_monitor_stream(
    stream_df: DataFrame,
    baseline_cells: DataFrame,
    checkpoint_dir: str,
    out_dir: str,
) -> StreamingQuery:
    """Streaming drift monitor: every micro-batch's value distribution
    scored against a fixed baseline (PSI), one alert row per batch
    appended to ``out_dir`` — the production shape of q_psi (the model
    scorecard that pages when PSI > 0.25).

    The baseline relation is re-evaluated inside the batch function
    (the whitelist-refresh pattern): swap the baseline table between
    batches and the next batch scores against the new one."""

    def _batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        row = psi_vs_baseline(batch_df, baseline_cells).withColumn(
            "batch_id", F.lit(batch_id).cast("bigint")
        )
        row.write.mode("append").parquet(out_dir)

    return run_foreach_batch(stream_df, checkpoint_dir, _batch_fn)
