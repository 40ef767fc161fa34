"""Temporal join operators Spark lacks as built-ins: as-of join and
range(interval) join — implemented as compositions of existing DataFrame
ops (the preferred strategy for custom operators), never nested-loop joins.

The reference has no joins over value columns at all (SURVEY §2.3 'Absent');
these are north-star extensions for time-series / event-data pipelines.

Scale design:
* As-of join is the union+window shape: ONE shuffle on the join key, then a
  per-key sorted scan carrying the most recent right-side row forward.  The
  naive alternative — inequality join + groupBy max + rejoin — shuffles
  three times and explodes on skewed keys.
* Range join is the time-binning shape: intervals explode to the bins they
  cover, points carry their single bin, and the join is a plain equi-join
  on (key, bin) with an exact residual filter.  Catalyst turns a raw
  `l.ts BETWEEN r.lo AND r.hi` with no equi-key into BroadcastNestedLoop —
  O(n·m) at scale; binning keeps it hash-partitioned.  Bin width should be
  chosen near the median interval length (amortizes the explode factor
  against residual selectivity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_embargo_spark.catalog import load_table


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.ts <= left.ts`` on the same key (inclusive, DuckDB ASOF
    semantics).  Right must be unique per (key, ts).

    Returns the left columns plus every non-key right column prefixed
    ``asof_`` (null when no right row precedes).
    """
    reserved = {"_ts", "_side", "_payload", "_match"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"as_of_join reserves column names {sorted(reserved)}; "
            f"rename conflicting input columns: {sorted(clash)}"
        )
    rcols = [c for c in right.columns if c not in (key, right_ts)]
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_ts).alias("asof_ts"),
            *[F.col(c).alias(f"asof_{c}") for c in rcols],
        ).alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != key],
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None)
        .cast(r.schema["_payload"].dataType)
        .alias("_payload"),
        *[F.col(c) for c in left.columns if c != key],
    )
    # Right rows sort before left rows at equal ts (_side 0 < 1), so an
    # exactly-coincident right row is visible to the left row — inclusive
    # as-of.  last(ignorenulls) carries the newest right payload forward.
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l).withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    out_left = [F.col(key)] + [
        F.col(c) for c in left.columns if c != key
    ]
    return merged.filter(F.col("_side") == 1).select(
        *out_left,
        F.col("_match.asof_ts").alias("asof_ts"),
        *[F.col(f"_match.asof_{c}").alias(f"asof_{c}") for c in rcols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str,
    lo: str,
    hi: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Equi+range join: pair every point with every interval of the same
    key where ``lo <= ts <= hi``, via time-bin bucketing (see module doc).

    Each point owns exactly one bin and each interval is exploded to its
    covered bins, so every qualifying (point, interval) pair meets exactly
    once — no distinct needed.
    """
    p = points.withColumn(
        "_bin", F.floor(F.unix_timestamp(F.col(ts).cast("timestamp")) / bin_seconds)
    )
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(lo).cast("timestamp")) / bin_seconds),
                F.floor(F.unix_timestamp(F.col(hi).cast("timestamp")) / bin_seconds),
            )
        ),
    )
    joined = p.join(i, [key, "_bin"]).filter(
        (F.col(ts) >= F.col(lo)) & (F.col(ts) <= F.col(hi))
    )
    return joined.drop("_bin")


# ---------------------------------------------------------------------------
# Driver queries over the events table
# ---------------------------------------------------------------------------


def _purchases(events: DataFrame) -> DataFrame:
    """Deterministic right side: one row per (user_id, ts) purchase."""
    return (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 2).alias("purchase_value"))
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every event tagged with the user's most recent purchase at or before
    it (DuckDB ASOF JOIN is the oracle)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    return as_of_join(
        events, _purchases(load_table(spark, sf_dir, "events")), key="user_id"
    ).select("event_id", "user_id", "ts", "asof_ts", "asof_purchase_value")


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: per user, how many purchases landed within one
    hour after a view (view → purchase within 1h), plus the earliest
    converting purchase.

    Composes the time-binned ``range_join`` (one equi-join on (user, bin),
    no inequality cross product) and aggregates to user grain — the classic
    product-analytics funnel expressed in the same scale shape as
    q_range_join."""
    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("view_end"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts")
    )
    pairs = range_join(
        purchases, views, key="user_id", ts="ts", lo="view_ts", hi="view_end"
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.min("ts").alias("first_conversion_ts"),
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events falling inside the 1-hour window after any purchase by the
    same user — the interval-containment join (plain inequality join in
    DuckDB is the oracle)."""
    events = load_table(spark, sf_dir, "events")
    windows = _purchases(events).select(
        "user_id",
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("win_end"),
    )
    pts = events.select("event_id", "user_id", "ts")
    out = range_join(
        pts, windows, key="user_id", ts="ts", lo="win_start", hi="win_end"
    )
    return out.select("event_id", "user_id", "ts", "win_start", "win_end")


def scd2_intervals(
    rows: DataFrame, key: str, ts: str, tie: str
) -> DataFrame:
    """Build type-2 slowly-changing-dimension validity intervals from a
    change log: valid_from = this change's timestamp, valid_to = the next
    change's timestamp for the same key (NULL = still current).  One
    window (lead + row_number share the same sort), one shuffle on the
    key — at 100 TB this is the standard way to turn an append-only CDC
    feed into point-in-time-queryable history."""
    w = Window.partitionBy(key).orderBy(ts, tie)
    return (
        rows.withColumn("valid_to", F.lead(ts).over(w))
        .withColumn("version", F.row_number().over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumnRenamed(ts, "valid_from")
    )


def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 history over purchase events: each user's purchases become
    versioned validity intervals (valid_from/valid_to/version/is_current)
    with the purchase value as the tracked attribute."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        "ts",
        F.round("value", 2).alias("purchase_value"),
    )
    out = scd2_intervals(purchases, key="user_id", ts="ts", tie="event_id")
    return out.select(
        "user_id",
        "event_id",
        "valid_from",
        "valid_to",
        F.col("version").cast("int").alias("version"),
        "is_current",
        "purchase_value",
    )


DEBOUNCE_SECONDS = 300  # suppress same-type repeats inside this gap


def q_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-duplicate suppression (debounce): drop an event when it
    repeats the immediately-previous event's type for that user within
    5 minutes — the retry-storm / double-click cleanup every event
    pipeline runs before sessionization.  Output: surviving events plus
    the gap (µs) to the previous event (null on each user's first).

    Scale shape: one shuffle on user_id, one window sort, lag() + filter —
    the decision is purely local to the per-user ordered scan, so the
    operator is a single exchange at any scale.  Gap arithmetic is
    timestampdiff(MICROSECOND, …) on NTZ values: exact integer µs,
    session-timezone invariant (no DST edge between engines)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(
        "timestampdiff(MICROSECOND, lag(ts) over "
        "(partition by user_id order by ts, event_id), ts)"
    )
    prev_type = F.lag("event_type").over(w)
    staged = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        gap.alias("gap_us"),
        prev_type.alias("prev_type"),
    )
    keep = (
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
        | (F.col("gap_us") >= DEBOUNCE_SECONDS * 1_000_000)
    )
    return staged.filter(keep).select(
        "event_id", "user_id", "event_type", "value", "gap_us"
    )


FUNNEL_STEPS = ("signup", "click", "purchase")


def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step strict-order funnel: users who signed up, then clicked
    AFTER the signup, then purchased AFTER that click — per-step reach
    counts and conversion from the previous step.

    Scale shape: the step anchors are STACKED UNORDERED window minima
    over the same user partition (min signup ts; min click ts after it;
    min purchase ts after that), so the whole sequence match costs ONE
    user_id exchange and no sort — the self-join formulation would
    shuffle events once per step.  The final reduction is a global
    conditional aggregate (map-side combined)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    s1, s2, s3 = FUNNEL_STEPS
    t1 = F.min(F.when(F.col("event_type") == s1, F.col("ts"))).over(w)
    t2 = F.min(
        F.when(
            (F.col("event_type") == s2) & (F.col("ts") > t1), F.col("ts")
        )
    ).over(w)
    t3 = F.min(
        F.when(
            (F.col("event_type") == s3) & (F.col("ts") > t2), F.col("ts")
        )
    ).over(w)
    per_user = (
        ev.select(
            "user_id", t1.alias("t1"), t2.alias("t2"), t3.alias("t3")
        )
        .groupBy("user_id")
        .agg(
            F.max(F.col("t1").isNotNull()).alias("r1"),
            F.max(F.col("t2").isNotNull()).alias("r2"),
            F.max(F.col("t3").isNotNull()).alias("r3"),
        )
    )
    n1 = F.sum(F.col("r1").cast("bigint"))
    n2 = F.sum((F.col("r1") & F.col("r2")).cast("bigint"))
    n3 = F.sum(
        (F.col("r1") & F.col("r2") & F.col("r3")).cast("bigint")
    )
    return per_user.agg(
        n1.alias("n_signup"),
        n2.alias("n_clicked_after"),
        n3.alias("n_purchased_after"),
        F.round(n2 / n1, 6).alias("conv_1_2"),
        F.round(n3 / n2, 6).alias("conv_2_3"),
    )


# ---------------------------------------------------------------------------
# Inter-arrival gap statistics
# ---------------------------------------------------------------------------


def q_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inter-arrival profile: the gap between consecutive
    same-type events of each user (lag over the per-user-per-type ordered
    scan), rolled up to count / mean / exact median seconds per type —
    the cadence fingerprint behind rate-limit tuning and bot detection.

    Scale shape: the lag window is partitioned by (user_id, event_type) —
    bounded per-key state, one exchange.  The median is the rank-selection
    pattern over the per-type gap relation (row_number + partition count,
    pick floor((n+1)/2) and floor(n/2)+1): one more exchange on the
    ~|events|-sized integer gap relation; at 100 TB you'd pre-bin gaps to
    log-spaced buckets and take the bucket median — same plan, one
    aggregate earlier.

    Engine determinism: gaps are exact integer µs (NTZ timestampdiff);
    mean = one IEEE division of exact bigints; the median picks are
    integers and their average is one division — nothing accumulates in
    floating point."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    gap = F.expr(
        "timestampdiff(MICROSECOND, lag(ts) over "
        "(partition by user_id, event_type order by ts, event_id), ts)"
    )
    gaps = (
        ev.select("event_type", gap.alias("gap_us"))
        .filter(F.col("gap_us").isNotNull())
        # consumed twice (mean rollup + median rank-selection): persist
        # shares the lag-window pass instead of re-running the events
        # scan + per-user sort per consumer (lazy, no build-time job)
        .persist()
    )
    stats = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_us").alias("sum_us"),
    )
    wr = Window.partitionBy("event_type").orderBy("gap_us")
    wn = Window.partitionBy("event_type")
    ranked = gaps.select(
        "event_type",
        "gap_us",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("nd"),
    )
    picks = ranked.filter(
        (F.col("rn") == F.floor((F.col("nd") + 1) / 2))
        | (F.col("rn") == F.floor(F.col("nd") / 2) + 1)
    )
    med = picks.groupBy("event_type").agg(
        F.sum("gap_us").alias("med_sum"),
        F.count(F.lit(1)).alias("med_n"),
    )
    return stats.join(med, "event_type").select(
        "event_type",
        "n_gaps",
        F.round(
            F.col("sum_us") / (F.col("n_gaps") * F.lit(1000000.0)), 6
        ).alias("avg_gap_s"),
        F.round(
            F.col("med_sum") / (F.col("med_n") * F.lit(1000000.0)), 6
        ).alias("median_gap_s"),
    )
