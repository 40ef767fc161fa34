"""Analytic surface beyond the reference (SURVEY §2.9 gap list): window
ranking, grouping-set rollups, and approximate sketches.

The reference has no ORDER BY / top-k / rank anywhere (SURVEY §2.5) and no
aggregates beyond count (§2.4); Spark provides all of it built-in.  These
operators exist to demonstrate the full surface at scale:

* top-k per group compiles to WindowGroupLimit — Spark pushes the rank
  limit below the shuffle, so each map task emits at most k rows per group
  (verified via .explain; critical when groups are millions of rows).
* rollup is one pass: partial aggregation handles all grouping sets
  map-side before the single shuffle.
* sketches (HLL distinct, approx quantiles) are mergeable partial
  aggregates — constant memory per partition at any data size, the only
  sane shapes for 100 TB cardinality/quantile questions.
"""

from __future__ import annotations

from fractions import Fraction as _Fraction

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_embargo_spark.catalog import load_table, spread_for_cpu

TOPK = 3


def topk_per_group(orders: DataFrame, k: int = TOPK) -> DataFrame:
    """Top-k orders per customer by price (deterministic tie-break on key).

    row_number + rank-filter is the scalable form: Spark rewrites it to
    WindowGroupLimit, truncating each group to k rows before AND after the
    shuffle, so the exchange carries O(groups × k), not O(rows).
    """
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (WindowGroupLimit pushdown)."""
    return topk_per_group(load_table(spark, sf_dir, "orders"))


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup over (returnflag, linestatus): subtotals + grand total in one
    shuffle.  NULL group cells are labeled via grouping() so the output is
    unambiguous (a NULL data value and a rollup total would otherwise
    collide)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "n_rows",
            "sum_qty",
            "g_flag",
            "g_status",
        )
    )


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube over (returnflag, linestatus): all 4 grouping sets in one
    shuffle (partial aggregation expands the sets map-side)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "n_rows",
            "sum_price",
            "g_flag",
            "g_status",
        )
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form under cube/rollup: exactly
    the three sets (flag), (status), (flag, status), skipping the grand
    total a cube would add.  Still one shuffle: partial aggregation expands
    the sets map-side, identical to rollup's plan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], ["l_returnflag", "l_linestatus"]],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "n_rows",
            "sum_qty",
            "g_flag",
            "g_status",
        )
    )


def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order-to-order gap: lag/lead analytic frame surface.
    One shuffle on the partition key; the frame scan is streaming within
    each sorted partition (no buffering beyond the frame)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d8 = F.date_format("o_orderdate", "yyyyMMdd").cast("int")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        d8.alias("order_int"),
        F.lag(d8).over(w).alias("prev_order_int"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("days_since_prev"),
    )


def q_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped multi-join: filtered dim (customer segment) broadcast
    into the orders⋈lineitem shuffle join, aggregated to top-10 revenue.

    Scale shape: customer-after-filter is small → explicit broadcast (no
    shuffle of the fact side for that join); orders⋈lineitem co-partitions
    on orderkey in ONE exchange each; the top-10 is TakeOrderedAndProject
    (per-partition heap, no global sort).  The reference has no inner joins
    at all (SURVEY §2.3 'Absent') — this demonstrates the built-in surface.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < "1995-03-15")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > "1995-03-15")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyyMMdd")
            .cast("int")
            .alias("orderdate_int"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


def approx_distinct_sketch(li: DataFrame, rsd: float = 0.01) -> DataFrame:
    """HLL++ distinct suppliers per returnflag.  The sketch is a mergeable
    partial aggregate: each partition keeps a fixed-size register array and
    the shuffle moves sketches, not values — the 100 TB cardinality shape
    (exact distinct would shuffle every distinct value)."""
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_suppkey", rsd).alias("approx_suppliers"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only: HLL estimates are engine-specific; pytest asserts the
    relative error against the exact count (tests/test_analytics.py)."""
    return approx_distinct_sketch(load_table(spark, sf_dir, "lineitem"))


# GK sketch accuracy for the ORACLE-CHECKED demo query.  rank error is
# bounded by n/accuracy; below 1 the sketch returns the exact order
# statistic, which is the only regime where the result is provably
# independent of partition layout and partial-merge order — i.e. the only
# regime a literal pin is sound in (a compressed sketch's output can in
# principle drift with an untested parallelism).  10M covers every
# generated SF (sf1 lineitem = 6M rows).  Production-scale jobs pass a
# coarser accuracy and accept the documented rank error.
QUANTILE_EXACT_ACCURACY = 10_000_000


def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only: Greenwald-Khanna quantile sketch per group — mergeable,
    bounded-memory (vs exact percentile = full sort).  pytest bounds the
    rank error vs exact quantiles.  Scalar columns only (no array output):
    the driver's cross-engine hasher requires hashable cells.  Accuracy is
    pinned in the exact regime (see QUANTILE_EXACT_ACCURACY) so the pinned
    oracle cannot flake on an untested partition layout."""
    li = load_table(spark, sf_dir, "lineitem")
    acc = QUANTILE_EXACT_ACCURACY
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, acc).alias("p50"),
        F.percentile_approx("l_extendedprice", 0.95, acc).alias("p95"),
        F.percentile_approx("l_extendedprice", 0.99, acc).alias("p99"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranks per customer: ntile(4) quartile, percent_rank,
    cume_dist — one shuffle on the partition key, streaming frame scan.
    The tie-break on o_orderkey makes every rank deterministic (required
    for the cross-engine hash compare)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer trailing 3-order moving average (ROWS BETWEEN 2
    PRECEDING AND CURRENT ROW) — the bounded-frame time-series shape: one
    shuffle, O(frame) memory per row regardless of partition size."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        # round at 4 decimals, not 2: a cent-valued sum over a 1-3 row frame
        # divided by the frame size never terminates with a 5 in the 5th
        # decimal, so 4-decimal rounding is tie-free across engines (2-decimal
        # rounding hits exact x.xx5 ties whenever sum/3 lands on one)
        F.round(F.avg("o_totalprice").over(w), 4).alias("moving_avg3"),
    )


PIVOT_STATUSES = ["F", "O", "P"]


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts pivoted by status: ``groupBy().pivot(values).count()``.
    Pinning the pivot values avoids the extra distinct-values job Spark
    otherwise runs, and compiles to one pass of conditional aggregation
    (exactly what the SQL oracle spells out) — no second shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    p = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", PIVOT_STATUSES)
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(s), F.lit(0)).cast("bigint").alias(f"n_{s.lower()}")
            for s in PIVOT_STATUSES
        ],
    )


HIST_LO = 0.0
HIST_WIDTH = 5000.0
HIST_BINS = 24


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of l_extendedprice: explicit bucket arithmetic
    (floor((x-lo)/w), clamped to the last bin) so both engines compute the
    identical IEEE double division.  One shuffle over ≤ HIST_BINS groups;
    partial aggregation collapses each scan partition to ≤ HIST_BINS rows
    map-side — the canonical distributed-histogram shape."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.least(
        F.floor((F.col("l_extendedprice") - HIST_LO) / HIST_WIDTH),
        F.lit(HIST_BINS - 1),
    ).cast("int")
    return (
        li.select(bucket.alias("bucket"), "l_extendedprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("l_extendedprice"), 2).alias("bucket_min"),
            F.round(F.max("l_extendedprice"), 2).alias("bucket_max"),
        )
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles per group (vs the q_approx_quantiles sketch):
    Spark's ``percentile`` and DuckDB's ``quantile_cont`` share the
    p*(n-1) linear-interpolation definition, so the values hash-match.
    Exact percentile sorts each group's values — fine per moderate group,
    the sketch is the 100 TB default (see q_approx_quantiles)."""
    li = load_table(spark, sf_dir, "lineitem")
    pct = [("p25", 0.25), ("p50", 0.50), ("p75", 0.75), ("p95", 0.95)]
    # one array-form percentile aggregate, not four scalar ones: a single
    # sort/digest per group serves all fractions (4 separate aggregates
    # each buffered the group's values independently — measured 4x slower)
    arr = F.expr(
        f"percentile(l_extendedprice, array({','.join(str(p) for _, p in pct)}))"
    )
    agged = li.groupBy("l_returnflag").agg(
        arr.alias("_pcts"), F.count(F.lit(1)).alias("n_rows")
    )
    return agged.select(
        "l_returnflag",
        *[
            F.round(F.element_at("_pcts", i + 1), 4).alias(a)
            for i, (a, _) in enumerate(pct)
        ],
        "n_rows",
    )


ZSCORE_CUT = 3.0


def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly scan: events whose value is ≥ 3 sample-stddevs from their
    event_type mean.  Two-pass shape — tiny grouped stats, broadcast back
    onto the stream — so the fact table is scanned twice but never
    shuffled; at 100 TB that beats a window over event_type (one giant
    shuffle + sort) by the width of the fact table."""
    events = load_table(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.avg("value").alias("_mu"),
        F.stddev_samp("value").alias("_sigma"),
    )
    z = (F.col("value") - F.col("_mu")) / F.col("_sigma")
    return (
        events.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value_r"),
            F.round(z, 4).alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) >= ZSCORE_CUT)
    )


FEATURE_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def q_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user feature extraction over the event log — the feature-store
    shape: one row per user with per-type counts (conditional aggregation,
    same plan a pivot compiles to), monetary totals, and activity span.
    One shuffle on user_id; partial aggregation compresses map-side."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        *[
            F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
            for t in FEATURE_EVENT_TYPES
        ],
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))),
            2,
        ).alias("purchase_total"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
    )


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull ``$.k`` out of the events JSON
    ``props`` column and filter on it.  ``get_json_object`` runs JVM-side
    in codegen; at scale, repeated extraction from the same column should
    graduate to ``from_json`` with an explicit schema (one parse, many
    fields) — this query is the single-field probe shape."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return events.select(
        "event_id",
        "event_type",
        k.alias("k"),
    ).filter(F.col("k") > 50)


def q_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer first/last/second order price: first_value, last_value
    and nth_value over an UNBOUNDED-both-ways frame (the only frame under
    which last_value/nth_value are deterministic — the default frame stops
    at CURRENT ROW and would make last_value degenerate to the row itself).
    One window partition ordering serves all three functions, so Spark
    plans a single sort + single Window operator."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias(
            "second_price"
        ),
    )


RANGE_FRAME_DAYS = 30


def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day revenue per customer: a RANGE frame over a day
    number, not a ROWS frame — all orders in the last 30 *days* contribute,
    however many rows that is, and same-day ties all see the same frame.
    The order key is an int day number so the DataFrame-API rangeBetween
    (numeric only) applies; this is also the portable form (interval range
    frames are SQL-dialect-specific)."""
    orders = load_table(spark, sf_dir, "orders")
    day_num = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_num")
        .rangeBetween(-RANGE_FRAME_DAYS, 0)
    )
    return orders.withColumn("day_num", day_num).select(
        "o_custkey",
        "o_orderkey",
        "day_num",
        F.round(F.sum("o_totalprice").over(w), 2).alias("trailing30"),
    )


def q_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per group: Pearson correlation, sample
    covariance and both standard deviations of (quantity, extendedprice)
    per returnflag.  All four are single-pass mergeable co-moment
    aggregates (Welford-style partial merge) — constant state per
    partition, one shuffle, safe at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "covar_qty_price"
        ),
        F.round(F.stddev_samp("l_quantity"), 4).alias("stddev_qty"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("stddev_price"),
    )


def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level re-aggregation: daily partials (sum, count) merged into
    monthly finals, with the monthly average derived from merged sums —
    NOT an average of daily averages.  This is the incremental-pipeline
    contract at 100 TB: yesterday's partials never get rescanned; only
    sum/count partials are stored because they are the mergeable closure
    of avg.  Correctness of the merge is exactly what the oracle checks
    (a direct monthly aggregation over the raw rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.date_trunc("day", "l_shipdate").alias("day"), "l_returnflag"
    ).agg(
        F.sum("l_quantity").alias("pq"),
        F.count(F.lit(1)).alias("pn"),
        F.sum("l_extendedprice").alias("pp"),
    )
    return daily.groupBy(
        (F.year("day") * 100 + F.month("day")).cast("int").alias("month_int"),
        "l_returnflag",
    ).agg(
        F.round(F.sum("pq"), 2).alias("sum_qty"),
        F.sum("pn").alias("n_rows"),
        F.round(F.sum("pp"), 2).alias("sum_price"),
        F.round(F.sum("pq") / F.sum("pn"), 6).alias("avg_qty"),
    )


HH_LIFT = 1.15


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: users whose event count is ≥ 1.15× the mean
    per-user count (the events table is the one input with real per-key
    dispersion; TPC-H keys are near-uniform).  The threshold is relative,
    so the query is scale-invariant.  The global (total, n_groups) pair
    rides in on a broadcast one-row cross join — no driver collect, plan
    stays lazy.  The mean is computed as sum/count explicitly (identical
    IEEE result in any engine; a builtin avg is free to use a different
    incremental algorithm, which would make the >= boundary
    engine-dependent)."""
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.sum("n").alias("_tot"), F.count(F.lit(1)).alias("_k")
    )
    mean = F.col("_tot") / F.col("_k")
    return (
        counts.crossJoin(F.broadcast(totals))
        .filter(F.col("n") >= HH_LIFT * mean)
        .select(
            "user_id",
            "n",
            F.round(F.col("n") / mean, 4).alias("lift"),
        )
    )


COPURCHASE_TOP = 50


def q_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: top part pairs appearing in the same
    order.  Pair generation is the single-scan bucket-groupBy shape
    (groupBy order → collect_set → expand), not a self-join — the lineitem
    scan runs once and only (orderkey, partkey) crosses the wire.  Basket
    sizes are bounded (an order has a handful of parts), so the expansion
    is O(k²) with tiny k; the top-50 is TakeOrderedAndProject.  The pair
    counts come from the session-shared ``dedup.pair_support`` relation
    (six queries build this identical matrix)."""
    from etl_embargo_spark.operators.dedup import pair_support

    return (
        pair_support(spark, sf_dir)
        .select("part_a", "part_b", F.col("n_ab").alias("n"))
        .orderBy(F.col("n").desc(), "part_a", "part_b")
        .limit(COPURCHASE_TOP)
    )


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by signup week, counted as active
    per week offset.  Two aggregations over one events lineage (signup
    cohort = min signup week per user; activity = distinct user-weeks)
    joined on user — the cohort side is small (one row per user) and
    broadcasts.  Weeks are date_trunc('week') Mondays in both engines;
    output weeks are yyyymmdd ints (no DATE columns in oracle-checked
    results)."""
    events = load_table(spark, sf_dir, "events")
    cohort = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.date_trunc("week", "ts")).alias("cw"))
    )
    activity = events.select(
        "user_id", F.date_trunc("week", "ts").alias("w")
    ).distinct()
    joined = activity.join(F.broadcast(cohort), "user_id").filter(
        F.col("w") >= F.col("cw")
    )
    week_int = (
        F.year("cw") * 10000 + F.month("cw") * 100 + F.dayofmonth("cw")
    ).cast("int")
    offset = (F.datediff(F.to_date("w"), F.to_date("cw")) / 7).cast("int")
    return joined.groupBy(
        week_int.alias("cohort_week"), offset.alias("week_offset")
    ).agg(F.countDistinct("user_id").alias("n_users"))


MAD_CUT = 3.5
MAD_CONSISTENCY = 1.4826  # normal-consistency constant


def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier scan: median absolute deviation per event_type —
    the breakdown-resistant counterpart to q_zscore_outliers (one wild
    value moves a mean+stddev fence, but not a median+MAD fence).

    Two exact-percentile passes (median of values, then median of
    absolute deviations), each a grouped aggregate broadcast back onto
    the stream; events whose modified z-score |v − med| / (1.4826·MAD)
    exceeds 3.5 are flagged.  Spark's percentile and DuckDB's
    quantile_cont share the linear-interpolation definition, so the
    fence — and therefore the flagged set — is engine-identical.

    Groups with MAD = 0 (a constant-valued event_type) are excluded
    before scoring: a zero fence has no meaningful modified z-score, and
    under ANSI SQL (Spark 4 default) the division would abort the whole
    job rather than return an IEEE infinity."""
    events = load_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = events.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.first("med").alias("med"),
        F.expr("percentile(abs(value - med), 0.5)").alias("mad"),
    ).filter(F.col("mad") > 0)
    scored = events.join(F.broadcast(mad), "event_type").withColumn(
        "mod_z",
        F.round(
            F.abs(F.col("value") - F.col("med"))
            / (F.lit(MAD_CONSISTENCY) * F.col("mad")),
            4,
        ),
    )
    return scored.filter(F.col("mod_z") >= MAD_CUT).select(
        "event_id",
        "event_type",
        F.round("value", 2).alias("value_r"),
        "mod_z",
    )


def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation over the purchase log: per-user recency (days
    since last purchase, anchored at the global max event time so the
    query is deterministic), frequency and monetary total, each assigned
    a quartile — the standard customer-value segmentation.

    Shape: one grouped aggregate per user, the one-row global anchor
    broadcast in, quartiles via broadcast percentile fences (see the
    inline note on why not ntile)."""
    events = load_table(spark, sf_dir, "events")
    anchor = events.agg(F.max("ts").alias("_anchor"))
    purchases = events.filter(F.col("event_type") == "purchase")
    per_user = purchases.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("value"), 2).alias("monetary"),
    )
    rfm = per_user.crossJoin(F.broadcast(anchor)).withColumn(
        "recency_days",
        F.datediff(F.to_date("_anchor"), F.to_date("last_ts")),
    )
    # Quartiles via broadcast percentile thresholds, NOT a global ntile:
    # ntile needs one total-order window (a single sort task — dead at
    # scale), while three thresholds broadcast onto a narrow map.  The
    # p25/p50/p75 fences come from the same exact-percentile family the
    # oracle's quantile_cont uses, so assignment is engine-identical.
    fences = rfm.agg(
        F.expr(
            "percentile(recency_days, array(0.25, 0.5, 0.75))"
        ).alias("_rf"),
        F.expr("percentile(frequency, array(0.25, 0.5, 0.75))").alias("_ff"),
        F.expr("percentile(monetary, array(0.25, 0.5, 0.75))").alias("_mf"),
    )

    def _quartile(col: str, f: str) -> F.Column:
        v = F.col(col)
        return (
            F.lit(1)
            + (v > F.element_at(f, 1)).cast("int")
            + (v > F.element_at(f, 2)).cast("int")
            + (v > F.element_at(f, 3)).cast("int")
        )

    return rfm.crossJoin(F.broadcast(fences)).select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        _quartile("recency_days", "_rf").alias("r_quartile"),
        _quartile("frequency", "_ff").alias("f_quartile"),
        _quartile("monetary", "_mf").alias("m_quartile"),
    )


UNPIVOT_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long melt of the lineitem measures: one output row per
    (line, measure) — the reshape feeding any generic per-metric pipeline
    (profiling, drift monitors, metric stores).  ``DataFrame.unpivot`` is
    a Generate (explode of a struct array) — a narrow, codegen operator:
    no shuffle, no join, output is exactly n_measures x n_rows streamed
    out of the scan, so it costs the same as reading the table at any
    scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        UNPIVOT_MEASURES,
        "measure",
        "value",
    ).select(
        "l_orderkey",
        "l_linenumber",
        "measure",
        F.round("value", 2).alias("value"),
    )


def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (the FILTER-clause surface): per return
    flag, counts and sums restricted to predicate slices of the input —
    discounted lines, taxed lines, high-quantity lines — all in ONE
    grouped pass.  Each conditional is a when()-guarded partial aggregate
    (null rows don't contribute), so adding a slice adds zero shuffles;
    the alternative (one filtered aggregation per slice, unioned) scans
    the fact table k times."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_discount") > 0.05
    taxed = F.col("l_tax") > 0.0
    bulk = F.col("l_quantity") >= 30
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(disc, 1)).alias("n_discounted"),
        F.round(F.sum(F.when(disc, F.col("l_extendedprice"))), 2).alias(
            "disc_revenue"
        ),
        F.count(F.when(taxed, 1)).alias("n_taxed"),
        F.count(F.when(bulk, 1)).alias("n_bulk"),
        F.round(F.avg(F.when(bulk, F.col("l_extendedprice"))), 2).alias(
            "bulk_avg_price"
        ),
    )


def q_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: each user's most frequent event type,
    ties broken lexicographically.  The builtin ``mode()`` aggregate is
    free to pick any maximal value, so tie behavior is engine-dependent;
    the count + rank form pins it.  Shape: one grouped count (map-side
    combined) then a WindowGroupLimit-eligible rank over the tiny
    (user, type) relation — the full event stream never reaches the
    window."""
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), "event_type"
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_event"), "n")
    )


def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: each customer's order keys joined into
    one comma-separated string, numerically ordered.  collect_list gives
    no intra-group order guarantee (partition arrival order), so the sort
    happens array-side AFTER collection — array_sort + transform +
    array_join, all codegen — making the result deterministic under any
    partitioning.  Per-group state is the order list itself: bounded here
    (orders per customer), the right shape only when group payloads are
    small — which is exactly when string_agg is the right tool at all."""
    orders = load_table(spark, sf_dir, "orders")
    keys_sorted = F.array_sort(F.collect_list("o_orderkey"))
    return orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.array_join(
            F.transform(keys_sorted, lambda x: x.cast("string")), ","
        ).alias("order_keys"),
    )


def q_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running count-distinct per user: after each event, how many
    DISTINCT event types has this user produced so far.  Spark has no
    count(DISTINCT) OVER; the idiomatic form is size(collect_set() OVER
    (... ROWS UNBOUNDED PRECEDING)) — running set state is O(distinct
    types), bounded by the type vocabulary, so the window state stays
    tiny however long the user's history is.  The oracle computes the
    same thing as a running sum of first-occurrence flags (two stacked
    windows) — engine-identical because both use the same total order
    (ts, event_id)."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        F.size(F.collect_set("event_type").over(w))
        .cast("int")
        .alias("n_types_seen"),
    )


def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: per order priority, a complete daily spine
    over the table's [min, max] date range with three fill policies side
    by side — raw (NULL on missing days), zero-fill, and last-observation
    -carried-forward.  The spine is generated IN the engine
    (sequence + explode over the broadcast one-row bounds — no driver
    collect) and is tiny (days x priorities), so the build is a broadcast
    hash join against the pre-aggregated counts: the fact table shuffles
    once for the count, never for the fill."""
    orders = load_table(spark, sf_dir, "orders")
    day = F.to_date("o_orderdate")
    counts = orders.groupBy(
        day.alias("day"), "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n_raw"))
    bounds = orders.agg(
        F.min(day).alias("_lo"), F.max(day).alias("_hi")
    )
    spine_days = (
        spark.range(1)
        .crossJoin(F.broadcast(bounds))
        .select(F.explode(F.sequence("_lo", "_hi")).alias("day"))
    )
    prios = orders.select("o_orderpriority").distinct()
    spine = spine_days.crossJoin(F.broadcast(prios))
    joined = spine.join(F.broadcast(counts), ["day", "o_orderpriority"], "left")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    day_int = (
        F.year("day") * 10000 + F.month("day") * 100 + F.dayofmonth("day")
    ).cast("int")
    return joined.select(
        day_int.alias("day_int"),
        "o_orderpriority",
        "n_raw",
        F.coalesce("n_raw", F.lit(0)).alias("n_zero"),
        F.last("n_raw", ignorenulls=True).over(w).alias("n_locf"),
    )


def q_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each (returnflag, linestatus) cell's revenue as a
    share of its returnflag total and of the grand total.  The window
    runs AFTER the aggregation, over the tiny grouped relation — the
    ratio denominator never touches the fact table a second time.  The
    grand total rides the same window trick with an empty partition
    spec: legitimate here only because its input is the handful of
    grouped rows (an un-partitioned window over raw facts would
    serialize the job)."""
    li = load_table(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "_rev"
        )
    )
    w_flag = Window.partitionBy("l_returnflag")
    w_all = Window.partitionBy()
    return grouped.select(
        "l_returnflag",
        "l_linestatus",
        F.round("_rev", 2).alias("revenue"),
        F.round(F.col("_rev") / F.sum("_rev").over(w_flag), 6).alias(
            "share_of_flag"
        ),
        F.round(F.col("_rev") / F.sum("_rev").over(w_all), 6).alias(
            "share_of_total"
        ),
    )


def q_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap concurrency via sweep-line: each event is held open
    for ``value`` minutes; per event_type, the peak number of simultaneously
    open intervals.

    The reference reasons about time only as scalar cutoffs
    (/root/reference/embargo.go:272-277); interval algebra is a gap.  The
    sweep is the scalable shape: boundary points (+1 at start, -1 at end)
    union'd in ONE narrow pass, then a running sum inside a single
    partitionBy(event_type) sort — no self-join, no N^2 overlap test.  At
    100 TB the union is map-side only and the window shuffles each type
    once; a skewed type can be range-chunked and merged with per-chunk
    carry-in, the standard parallel-prefix-sum extension.

    Tie policy: ends sort before starts at the same instant (delta -1 < +1),
    so back-to-back intervals don't double-count.  The running max is
    invariant under reordering within equal (t, delta) ties, so a ROWS frame
    is hash-stable across engines.
    """
    ev = load_table(spark, sf_dir, "events")
    starts = ev.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta")
    )
    ends = ev.select(
        "event_type",
        F.expr(
            "timestampadd(SECOND, CAST(floor(value * 60) AS BIGINT), ts)"
        ).alias("t"),
        F.lit(-1).alias("delta"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = starts.unionAll(ends).select(
        "event_type", F.sum("delta").over(w).alias("open_now")
    )
    return run.groupBy("event_type").agg(
        F.max("open_now").cast("int").alias("max_concurrent")
    )


def q_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, consecutive-day activity streaks from the
    event log — active days, number of streaks, longest streak.

    The islands trick (day - row_number() is constant within a run) needs no
    self-join and no iteration: one distinct, one window sort per user, two
    cheap aggregations.  All three shuffles key on user_id, so AQE coalesces
    them and a pre-bucketed layout would collapse them to one.  Days are
    ordinals from a fixed epoch so the arithmetic is integer end-to-end (no
    DATE-typed output, per the oracle-compare rules).
    """
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.select(
        "user_id", (F.col("day") - F.row_number().over(w)).alias("g")
    )
    streaks = grp.groupBy("user_id", "g").agg(F.count(F.lit(1)).alias("len"))
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("int").alias("active_days"),
        F.count(F.lit(1)).cast("int").alias("n_streaks"),
        F.max("len").cast("int").alias("max_streak"),
    )


def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-transition matrix: per user the event sequence is
    ordered by time, adjacent pairs counted corpus-wide, and each source
    type's outgoing counts normalized to probabilities.

    Sequence mining the Spark-first way: lead() inside a per-user sort (one
    shuffle on user_id, frames stream), then a hash aggregation onto the
    tiny (src, dst) matrix — the normalizing window runs over that grouped
    relation only, never re-touching the fact table.  Deterministic
    tie-break (ts, event_id) keeps the pairing hash-stable.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src_type"),
        F.lead("event_type").over(w).alias("dst_type"),
    ).filter(F.col("dst_type").isNotNull())
    counts = seq.groupBy("src_type", "dst_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_src = Window.partitionBy("src_type")
    return counts.select(
        "src_type",
        "dst_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_src), 4).alias("p"),
    )


PATH_TOPK = 10


def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: the top-10 most common 3-step event-type sequences
    across all users (clickstream "what do people do next-next" analysis).

    Two stacked lead() frames share ONE window sort — Catalyst collapses
    same-spec window functions into a single Window node, so the per-user
    shuffle+sort happens once however many steps the path has.  The
    corpus-wide count lands on a tiny (t1,t2,t3) relation and the top-10 is
    TakeOrderedAndProject (per-partition heap — no global sort of the
    matrix).  Deterministic (ts, event_id) tie-break keeps pairing stable.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.select(
            F.col("event_type").alias("step1"),
            F.lead("event_type", 1).over(w).alias("step2"),
            F.lead("event_type", 2).over(w).alias("step3"),
        )
        .filter(F.col("step3").isNotNull())
        .groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return paths.orderBy(
        F.desc("n"), "step1", "step2", "step3"
    ).limit(PATH_TOPK)


def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning actives: per day, how many distinct users were
    seen for the first time that day vs seen before.

    Two exchanges total: collect_set(day) per user dedups the (user, day)
    pairs AND yields first_day = array_min in the same shuffle (map-side
    partial collect keeps the wire cost at distinct-pairs, same as a
    DISTINCT), then the exploded days aggregate on day.  The naive
    distinct → groupBy(user) → join → groupBy(day) chain costs four
    exchanges for identical output.  Per-user state is bounded by the
    calendar (days-per-user, not events-per-user), so the set never
    approaches executor memory even at 100 TB.  Days are yyyymmdd ints
    (oracle rule: no DATE output).
    """
    ev = load_table(spark, sf_dir, "events")
    day_int = (
        F.year(F.col("ts")) * 10000
        + F.month(F.col("ts")) * 100
        + F.dayofmonth(F.col("ts"))
    ).cast("int")
    per_user = (
        ev.select("user_id", day_int.alias("day"))
        .groupBy("user_id")
        .agg(F.collect_set("day").alias("days"))
        .select(
            F.array_min("days").alias("first_day"),
            F.explode("days").alias("day"),
        )
    )
    return per_user.groupBy("day").agg(
        F.sum(
            F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
        ).cast("int").alias("new_users"),
        F.sum(
            F.when(F.col("day") > F.col("first_day"), 1).otherwise(0)
        ).cast("int").alias("returning_users"),
    )


ITEM_COSINE_TOP = 50


def q_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item cosine similarity over the co-purchase matrix — the
    classic collaborative-filtering neighborhood: cosine(a, b) =
    n_ab / sqrt(n_a · n_b) on order-occurrence sets.

    The pair side reuses the single-scan bucket-groupBy expansion (no
    self-join; lineage runs once).  The per-item degree is one
    count-distinct aggregate whose output is item-cardinality-sized, so
    both degree joins broadcast — the only heavy exchange is the pair
    count, exactly as in q_copurchase.  Top-50 by cosine is
    TakeOrderedAndProject with a rounded, deterministically tie-broken
    key so the cut is hash-stable across engines.
    """
    from etl_embargo_spark.operators.dedup import pair_support

    li = load_table(spark, sf_dir, "lineitem")
    ip = li.select("l_orderkey", "l_partkey")
    pair_counts = pair_support(spark, sf_dir)
    degree = ip.groupBy("l_partkey").agg(
        F.countDistinct("l_orderkey").alias("n")
    )
    da = F.broadcast(degree.select(
        F.col("l_partkey").alias("part_a"), F.col("n").alias("n_a")
    ))
    db = F.broadcast(degree.select(
        F.col("l_partkey").alias("part_b"), F.col("n").alias("n_b")
    ))
    return (
        pair_counts.join(da, "part_a")
        .join(db, "part_b")
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.round(
                F.col("n_ab") / F.sqrt(F.col("n_a") * F.col("n_b")), 6
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "part_a", "part_b")
        .limit(ITEM_COSINE_TOP)
    )


def q_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: the reporting composition of
    aggregate → ordered lag → percent change.  The un-partitioned window
    is legitimate here for the same reason as q_percent_of_total: it runs
    over the already-aggregated month relation (dozens of rows), never
    the fact table.  Growth is computed from the round-2 revenue so the
    oracle compare is bit-stable."""
    orders = load_table(spark, sf_dir, "orders")
    month = (
        F.year("o_orderdate") * 100 + F.month("o_orderdate")
    ).cast("int")
    monthly = orders.groupBy(month.alias("month")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        prev.alias("prev_revenue"),
        F.round((F.col("revenue") - prev) / prev * 100, 4).alias(
            "growth_pct"
        ),
    )


ROLLING_WINDOW_DAYS = 7


def q_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling active-user counts: per day, the distinct users active that
    day (DAU) and in the trailing 7 days (WAU) — the engagement-ratio pair
    every product pipeline reports.

    There is no count(DISTINCT) OVER a time range; the scalable shape is
    contribution explosion: each distinct (user, day) pair emits the 7
    window-END days it contributes to, then one count-distinct per end day.
    The explosion factor is the window length (constant), the state per
    group is one HLL-exact set per day — versus a range self-join (quadratic
    in days) or a giant collect_set window (single-partition sort).  The
    inner join back to real days drops the phantom window-ends past the
    calendar edge.  Days are ordinals from the fixed epoch (no DATE output).
    """
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("day"),
    ).distinct()
    dau = days.groupBy("day").agg(F.count(F.lit(1)).cast("int").alias("dau"))
    wau = (
        days.select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.col("day") + (ROLLING_WINDOW_DAYS - 1),
                )
            ).alias("wday"),
        )
        .groupBy("wday")
        .agg(F.countDistinct("user_id").cast("int").alias("wau"))
        .withColumnRenamed("wday", "day")
    )
    return dau.join(wau, "day")


LOCAL_VOLUME_REGION = "ASIA"
RETURNED_TOP = 20
LARGE_ORDER_QTY = 300.0


def _revenue_term():
    """Exact-decimal revenue term.  l_extendedprice is cent-valued and
    l_discount has two decimals, so the product is exact at 4 decimals;
    casting each term to decimal BEFORE the sum makes the aggregate
    order-insensitive (a float sum's last ulp depends on addition order —
    partition count, engine — and flips round(·, 2) at x.xx5 boundaries,
    which broke q_returned_items parity on customer 249)."""
    return (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("decimal(18,4)")


def q_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped six-table join: revenue per nation where the
    customer and the supplier sit in the SAME nation of one region, over a
    one-year order window.

    Scale shape: the whole dimension chain (region → nation → supplier,
    and customer) is broadcast — the only shuffle in the plan is the
    lineitem⋈orders co-partition on orderkey, and the final nation-sized
    aggregate rides map-side partials.  The same-nation predicate
    (c_nationkey = s_nationkey) is applied as a post-broadcast filter, so
    no theta-join materializes.  (The reference has no inner joins at all
    — SURVEY §2.3 'Absent'; this is the §2.9 gap surface at its widest.)
    """
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == LOCAL_VOLUME_REGION
    )
    nation = load_table(spark, sf_dir, "nation")
    nat = nation.join(
        F.broadcast(region),
        nation["n_regionkey"] == region["r_regionkey"],
    ).select("n_nationkey", "n_name")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(_revenue_term()), 2)
            .cast("double")
            .alias("revenue")
        )
    )


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: the top customers by revenue
    lost to returned lineitems in one quarter, tagged with their nation.

    Scale shape: orders is date-pruned BEFORE its join (predicate pushdown
    to the scan), the returnflag filter prunes lineitem the same way, the
    quarter's orders⋈lineitem co-partitions on orderkey, and the
    customer/nation dims broadcast into the aggregate's output.  Top-20 by
    rounded revenue with a key tie-break is TakeOrderedAndProject — a
    per-partition heap, no global sort at any size.
    """
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1996-04-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    per_cust = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum(_revenue_term()), 2)
            .cast("double")
            .alias("revenue")
        )
    )
    return (
        per_cust.join(
            F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(RETURNED_TOP)
    )


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume orders: orders whose total lineitem
    quantity exceeds the threshold, with their customer.

    Scale shape: the HAVING-filtered per-order aggregate is tiny (its
    cardinality is the number of outlier orders, not the fact size), so it
    broadcasts into orders, and that result — still outlier-sized —
    broadcasts into customer: after the one map-side-combined aggregation
    shuffle, no exchange touches a large relation again.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > LARGE_ORDER_QTY)
        .select("l_orderkey", F.round("qty", 2).alias("sum_qty"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    ordbig = orders.join(
        F.broadcast(big), orders["o_orderkey"] == big["l_orderkey"]
    ).select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyyMMdd")
        .cast("int")
        .alias("orderdate_int"),
        F.round("o_totalprice", 2).alias("totalprice"),
        "sum_qty",
    )
    return cust.join(
        F.broadcast(ordbig), cust["c_custkey"] == ordbig["o_custkey"]
    ).select(
        "c_custkey",
        "c_name",
        "o_orderkey",
        "orderdate_int",
        "totalprice",
        "sum_qty",
    )


def q_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only: mergeable HLL sketch partials — daily user sketches
    merged into monthly distinct-user estimates WITHOUT re-touching raw
    rows.  This is the 100 TB cardinality contract: partition-level
    sketches are tiny (KB), unionable, and re-aggregatable to any coarser
    grain, so the monthly rollup reads days, not events.  pytest
    (tests/test_analytics.py) asserts the merge path is bit-identical to
    sketching the raw data directly AND within HLL error of the exact
    count."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        daily.groupBy(
            (F.year("day") * 100 + F.month("day")).cast("int").alias(
                "month_int"
            )
        )
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
                "approx_users"
            ),
            F.count(F.lit(1)).cast("int").alias("n_days"),
        )
    )


def q_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline): orders not STRICTLY dominated on both
    axes — no other order is both more recent AND higher-priced.  The
    dominance test is a prefix-max: sorted by date descending, a row is on
    the frontier iff its price exceeds the running max over all strictly
    later dates (RANGE … 1 PRECEDING excludes same-date peers).

    Scale shape: the naive skyline is a quadratic NOT EXISTS self-join
    (the oracle states it that way for transparency).  Here it's two
    window passes: a PER-MONTH local frontier first — embarrassingly
    parallel, and dominance-pruning within any subset can never drop a
    global frontier point — then the same prefix-max over the tiny
    survivor set.  The global window's single-partition pass touches only
    local-frontier survivors (O(months × frontier), not O(rows))."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyyMMdd").cast("int").alias(
            "date_int"
        ),
        F.col("o_totalprice").alias("price"),
    )
    return pareto_frontier(orders)


def pareto_frontier(points: DataFrame) -> DataFrame:
    """Two-phase skyline over (date_int maximize, price maximize) with
    STRICT dominance on both axes; see q_pareto for the scale argument.
    Input columns: o_orderkey, date_int (int), price."""
    from pyspark.sql import Window

    month = (F.col("date_int") / 100).cast("int")
    wl = (
        Window.partitionBy(month)
        .orderBy(F.desc("date_int"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    # keep unless a strictly-later point has STRICTLY higher price:
    # price == running-max is a tie on one axis, not dominance
    local = points.withColumn("mprev", F.max("price").over(wl)).filter(
        F.col("mprev").isNull() | (F.col("price") >= F.col("mprev"))
    )
    wg = Window.orderBy(F.desc("date_int")).rangeBetween(
        Window.unboundedPreceding, -1
    )
    return (
        local.withColumn("gprev", F.max("price").over(wg))
        .filter(F.col("gprev").isNull() | (F.col("price") >= F.col("gprev")))
        .select("o_orderkey", "date_int", "price")
    )


SMALL_QTY_BRAND = "Brand#13"
SMALL_QTY_FRACTION = 0.2


def q_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped correlated subquery: yearly revenue lost to
    small-quantity orders — lineitems under 20% of their part's average
    quantity, for one brand.  The oracle states the correlated form; this
    is the DECORRELATED plan a 100 TB engine must produce.

    Scale shape: the brand filter prunes part to a tiny key set that
    broadcasts into lineitem FIRST, so everything downstream sees only
    the brand's fact slice; the correlated average then becomes a
    whole-partition window avg over that slice — ONE lineitem scan, one
    broadcast join, one exchange (a decorrelation via groupBy + rejoin
    would re-execute the scan once per use of the slice).  Revenue sums
    in exact decimal (order-insensitive)."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == SMALL_QTY_BRAND)
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pruned = li.join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"]
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    thr = (
        F.avg("l_quantity").over(Window.partitionBy("l_partkey"))
        * SMALL_QTY_FRACTION
    )
    return (
        pruned.withColumn("thr", thr)
        .filter(F.col("l_quantity") < F.col("thr"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


BLAME_TOP = 20


def q_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped sole-failure attribution: in multi-supplier
    orders where EXACTLY ONE supplier had lineitems returned, count the
    blame per supplier — the exists/not-exists double self-join of the
    classic query.

    Scale shape: the textbook formulation is two lineitem self-joins
    (semi for "other suppliers exist", anti for "no other supplier
    failed") — three shuffles of the fact at 100 TB.  Per-order
    conditional aggregation gets the same relation in ONE orderkey
    shuffle: n_suppliers, n_returned_suppliers, and min(returned
    supplier) — which IS the blamed supplier when the returned count is
    exactly 1.  The two distinct-counts are computed as STACKED plain
    aggregates (distinct (order, supplier, any-returned) first, then the
    order rollup): two multi-distinct aggregates over different children
    would plan an Expand that triples every fact row before the shuffle
    (measured 2.2s → 1.3s at sf0.1).  The top-20 is a per-partition
    heap."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("any_ret")
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("any_ret").alias("n_ret"),
        F.min(
            F.when(F.col("any_ret") == 1, F.col("l_suppkey"))
        ).alias("blamed"),
    )
    blamed = per_order.filter(
        (F.col("n_supp") > 1) & (F.col("n_ret") == 1)
    ).groupBy("blamed").agg(F.count(F.lit(1)).alias("numwait"))
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        blamed.join(
            F.broadcast(supp), blamed["blamed"] == supp["s_suppkey"]
        )
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(BLAME_TOP)
    )


TOP_SUPPLIER_FROM = "1996-01-01"
TOP_SUPPLIER_TO = "1996-04-01"


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped view-max query: the supplier(s) whose quarterly
    revenue equals the maximum over all suppliers.

    Scale shape: the per-supplier revenue aggregate is built ONCE; the
    scalar MAX and the equality probe then ride a whole-frame window over
    that supplier-sized relation (O(suppliers) rows in one partition —
    trivial at any fact size).  The naive scalar-subquery formulation
    duplicates the aggregate subtree, and Spark 4 does not reuse the
    exchange even under AQE (verified: two full lineitem scans) — the
    window form makes the sharing structural instead of hoping the
    optimizer finds it.  Revenue is an exact-decimal sum, so the
    float-equality-on-aggregate trap (ties breaking differently per
    partitioning) cannot occur."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= TOP_SUPPLIER_FROM)
        & (F.col("l_shipdate") < TOP_SUPPLIER_TO)
    )
    revenue = li.groupBy("l_suppkey").agg(
        F.round(F.sum(_revenue_term()), 2).alias("total_revenue")
    )
    best = F.max("total_revenue").over(
        Window.partitionBy(F.lit(1))
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        revenue.withColumn("best", best)
        .filter(F.col("total_revenue") == F.col("best"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


MARKET_REGION = "ASIA"
MARKET_NATION = "NATION_7"


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: per order year, the fraction of
    ASIA-region customers' revenue supplied by NATION_7's suppliers —
    the conditional-aggregation ratio pattern (share = sum(case)/sum).

    Scale shape: all four dimension legs (region→nation→customer for the
    scope filter; nation→supplier for the share flag) broadcast; the one
    fact-sized shuffle is lineitem⋈orders on orderkey, and the year-level
    ratio rides map-side partials.  Both numerator and denominator come
    from ONE pass — the naive two-query form scans the join twice.
    Exact-decimal sums make the ratio engine-stable to the 6th decimal."""
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == MARKET_REGION
    )
    nation = load_table(spark, sf_dir, "nation")
    region_nations = nation.join(
        F.broadcast(region),
        nation["n_regionkey"] == region["r_regionkey"],
    ).select(F.col("n_nationkey").alias("rn_key"))
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(region_nations),
            F.col("c_nationkey") == F.col("rn_key"),
        )
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = F.sum(_revenue_term())
    target = F.sum(
        F.when(F.col("n_name") == MARKET_NATION, _revenue_term()).otherwise(
            F.lit(0).cast("decimal(18,4)")
        )
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy("o_year")
        .agg(
            F.round((target / vol).cast("double"), 6).alias("mkt_share"),
            F.round(vol, 2).cast("double").alias("total_revenue"),
        )
    )


ORDER_PRIORITY_FROM = "1996-07-01"
ORDER_PRIORITY_TO = "1996-10-01"


def q_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped EXISTS semi-join: per order priority, how many of
    one quarter's orders contain at least one returned lineitem.

    Scale shape: unlike the whitelist semi (J1 — broadcast dim), the
    right side here is FACT-sized, so the correct 100 TB plan is a
    shuffled LEFT SEMI co-partitioned on orderkey: the semi probe stops
    at first match and emits each order at most once, so no pair
    explosion and no distinct pre-pass; the priority rollup rides
    map-side partials on the semi output."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= ORDER_PRIORITY_FROM)
            & (F.col("o_orderdate") < ORDER_PRIORITY_TO)
        )
        .select("o_orderkey", "o_orderpriority")
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(
            returned,
            orders["o_orderkey"] == returned["l_orderkey"],
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the user's
    most recent PRECEDING non-purchase event type (the "channel"), and
    credited revenue is rolled up per channel — the standard marketing
    attribution join, done without a join.

    Scale shape: one user_id shuffle, one window sort; the carried
    channel is last(...ignorenulls) over a PRECEDING-only frame, so the
    whole attribution is a streaming per-user scan — the self-as-of-join
    formulation would shuffle events twice and explode on active users.
    First-touch or position-based variants are the same frame with
    first()/both."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    channel = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    purchases = ev.withColumn("channel", channel).filter(
        F.col("event_type") == "purchase"
    )
    return purchases.groupBy(
        F.coalesce("channel", F.lit("(direct)")).alias("channel")
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("credited_value"),
    )


SHAPLEY_CONV = "purchase"
# Exact 2^n coalition enumeration is only sane for a small channel
# universe; past this the mask explode is the bug, not the data.
# ADVICE r9: fail FAST and LOUDLY if a vocabulary change grows the
# universe, instead of silently wrapping a 32-bit shift / exploding
# 2^n rows.  20 channels = 1,048,576 masks — still trivially cheap.
SHAPLEY_MAX_CHANNELS = 20


def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value channel attribution — the game-theoretic
    completion of the attribution family (q_attribution's last-touch
    rule, q_markov_attribution's removal effects): each channel's credit
    is its average marginal contribution across ALL coalition orders.

    The game: a user's coalition is the set of channels touched before
    their first conversion; v(S) = conversions from users whose whole
    coalition fits inside S.  phi_i = sum over S not containing i of
    |S|!(n-1-|S|)!/n! * (v(S+i) - v(S)), computed EXACTLY — no
    permutation sampling — because the channel universe is small even
    when the event log is 100 TB.

    Scale shape: the log collapses to one row per (user, touched
    channel) in a single distinct (map-side combined), then to the
    |observed-coalition|-sized bitmask relation (<= 2^n rows); every
    later step runs on 2^n-sized relations joined broadcast.  The
    subset-sum v(S), the coalition enumeration, and the factorial
    weights are all exact BIGINT arithmetic: the only floats are the
    two final single divisions (exact-int numerator / exact-int
    denominator — bit-identical across engines, the CLAUDE.md
    engine-exact-division rule)."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == SHAPLEY_CONV, F.col("ts"))
        ).alias("fpts")
    )
    # channel universe: every non-conversion event type; cid by name.
    # |channels|-sized relation, so the unpartitioned row_number is fine.
    ch = (
        ev.filter(F.col("event_type") != SHAPLEY_CONV)
        .select("event_type")
        .distinct()
        .select(
            "event_type",
            (
                F.row_number().over(Window.orderBy("event_type")) - 1
            ).alias("cid"),
        )
    )
    touched = (
        ev.join(u, "user_id")
        .filter(
            (F.col("event_type") != SHAPLEY_CONV)
            & (F.col("fpts").isNull() | (F.col("ts") < F.col("fpts")))
        )
        .select("user_id", "event_type")
        .distinct()
    )
    # ADVICE r9: shift a BIGINT one (shiftleft(1,cid) is a 32-bit int
    # shift that silently corrupts masks past cid=30); the builder-level
    # cap below keeps the 2^n explode bounded regardless.
    masks_u = (
        touched.join(F.broadcast(ch), "event_type")
        .groupBy("user_id")
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), cid))"
            ).alias("mask")
        )
    )
    per_user = u.join(masks_u, "user_id", "left").select(
        F.coalesce(F.col("mask"), F.lit(0)).alias("mask"),
        F.col("fpts").isNotNull().cast("int").alias("conv"),
    )
    obs = per_user.groupBy("mask").agg(F.sum("conv").alias("conv"))
    # job-free guard (builders must not run jobs at construction): the
    # cap is enforced IN the plan — raise_error fires at execution time
    # if the channel universe outgrew exact enumeration.
    nch_guarded = F.when(
        F.col("nch") <= F.lit(SHAPLEY_MAX_CHANNELS), F.col("nch")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "q_shapley_attribution: channel universe "
                ),
                F.col("nch").cast("string"),
                F.lit(
                    f" exceeds SHAPLEY_MAX_CHANNELS="
                    f"{SHAPLEY_MAX_CHANNELS}; exact 2^n enumeration "
                    "refused — sample permutations instead"
                ),
            )
        ).cast("int")
    )
    nch = ch.agg(F.count(F.lit(1)).alias("nch")).select(
        nch_guarded.alias("nch")
    )
    allmasks = nch.select(
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"),
                F.expr("shiftleft(CAST(1 AS BIGINT), nch) - 1"),
            )
        ).alias("s"),
        "nch",
    )
    # v(S) = subset-sum of observed-coalition conversions: a 2^n x
    # |observed| broadcast theta-join — both sides channel-bounded
    v = (
        allmasks.join(
            F.broadcast(obs), F.expr("(s & mask) = mask"), "left"
        )
        .groupBy("s", "nch")
        .agg(F.coalesce(F.sum("conv"), F.lit(0)).alias("v"))
    )
    # persist, not lazy localCheckpoint: v's lineage carries shuffles and
    # lazy checkpoint materializes those at BUILD time under AQE
    # (CLAUDE.md); the cache is shared by both consumers below
    v = F.broadcast(v.persist())
    v2 = v.select(
        F.col("s").alias("s_with"), F.col("v").alias("v_with")
    )
    term = (
        ch.join(v, F.expr("((s >> cid) & 1) = 0"))
        .withColumn(
            "s_with", F.expr("s | shiftleft(CAST(1 AS BIGINT), cid)")
        )
        .join(v2, "s_with")
    )
    num = term.groupBy("event_type").agg(
        F.max("nch").alias("nch"),
        F.sum(
            F.expr(
                "factorial(bit_count(s)) "
                "* factorial(nch - 1 - bit_count(s)) * (v_with - v)"
            )
        ).alias("num"),
    )
    total = F.sum("num").over(Window.partitionBy(F.lit(1)))
    return num.select(
        F.col("event_type").alias("channel"),
        F.col("num").cast("bigint").alias("num_weighted"),
        F.round(
            F.col("num").cast("double") / F.factorial(F.col("nch")),
            6,
        ).alias("shapley"),
        F.round(
            F.col("num").cast("double")
            / F.nullif(total, F.lit(0)).cast("double"),
            6,
        ).alias("share"),
    )


def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-hierarchy rollup: order revenue at (year, quarter, month),
    (year, quarter), (year), and grand-total grains in ONE pass — the
    hypertable-style continuous-aggregate ladder, batch form.

    Scale shape: rollup expands grouping sets map-side (partial
    aggregation), so the single exchange carries O(distinct months × 4)
    partial rows regardless of fact size; re-aggregating a finer grain
    into a coarser one later needs only the month relation (see
    q_incremental_agg for that contract).  Exact-decimal sums."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mth"),
        "o_totalprice",
    )
    return (
        orders.rollup("yr", "qtr", "mth")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("revenue"),
            F.grouping("yr").alias("g_yr"),
            F.grouping("qtr").alias("g_qtr"),
            F.grouping("mth").alias("g_mth"),
        )
        .select(
            F.coalesce("yr", F.lit(-1)).alias("yr"),
            F.coalesce("qtr", F.lit(-1)).alias("qtr"),
            F.coalesce("mth", F.lit(-1)).alias("mth"),
            "n_orders",
            "revenue",
            "g_yr",
            "g_qtr",
            "g_mth",
        )
    )


LIFT_MIN_PAIR = 3  # support floor: pairs seen fewer times are noise
LIFT_TOP = 30


def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule lift over the co-purchase matrix: for part pairs
    sharing an order, lift = P(a,b) / (P(a)·P(b)) — >1 means genuinely
    bought together, not just popular.  Completes q_copurchase (raw
    counts) with the statistical step of market-basket analysis.

    Scale shape: pair generation is the single-scan bucket-groupBy shape
    (never a self-join); per-part order counts are a second map-side-
    combined aggregate over the SAME projection; both count relations
    are part-dimensioned, so the two probability joins broadcast.  The
    support floor keeps the lift ranking out of small-sample noise, and
    the top-30 is a per-partition heap."""
    from etl_embargo_spark.operators.dedup import pair_support

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey")
    # one-row total rides a broadcast nested-loop cross join (builders
    # must be job-free — no .count() at construction)
    n_orders_df = items.select(
        F.count_distinct("l_orderkey").alias("n_orders")
    )
    pair_counts = pair_support(spark, sf_dir).filter(
        F.col("n_ab") >= LIFT_MIN_PAIR
    )
    part_counts = (
        items.distinct()
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_p"))
    )
    ca = part_counts.select(
        F.col("l_partkey").alias("ka"), F.col("n_p").alias("n_a")
    )
    cb = part_counts.select(
        F.col("l_partkey").alias("kb"), F.col("n_p").alias("n_b")
    )
    lift = (
        F.col("n_ab")
        * F.col("n_orders").cast("double")
        / (F.col("n_a") * F.col("n_b"))
    )
    return (
        pair_counts.join(F.broadcast(ca), F.col("part_a") == F.col("ka"))
        .join(F.broadcast(cb), F.col("part_b") == F.col("kb"))
        .join(F.broadcast(n_orders_df))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.round(lift, 6).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(LIFT_TOP)
    )


def q_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (the 80/20 curve): customers ranked into
    spend deciles, each decile's share of total revenue — the
    concentration profile that decides where personalization/retention
    effort goes.

    Scale shape: per-customer totals aggregate map-side first; ntile and
    the grand total then run over the CUSTOMER-sized relation (a
    single-partition window is fine there — it is dim-sized by
    construction, never fact-sized).  Exact-decimal sums end to end, so
    decile boundaries (ntile ties broken by custkey) and shares are
    engine-stable."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend")
    )
    w = Window.orderBy(F.desc("spend"), "o_custkey")
    tiled = per_cust.withColumn("decile", F.ntile(10).over(w))
    total = F.sum("spend").over(Window.partitionBy(F.lit(1)))
    return (
        tiled.withColumn("total", total)
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("spend"), 2).cast("double").alias("revenue"),
            F.round(
                (F.sum("spend") / F.max("total")).cast("double"), 6
            ).alias("share"),
        )
    )


def q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical dependence profile: per (lang, source) cell of the
    documents table, the joint probability, independence lift, and the
    cell's mutual-information term — feature-selection-style profiling
    for categorical columns.

    Scale shape: ONE scan builds the joint cell counts; marginals and
    the total are WINDOW sums over that cell relation (cells = |langs| ×
    |sources|, trivially small at any corpus size) — re-deriving them as
    separate aggregates would re-execute the corpus scan per marginal
    (Spark duplicates unshared lineage; same trap as the Q15 scalar
    subquery).  Per-cell MI terms are emitted instead of their float sum
    (a cross-cell float total would depend on addition order across
    engines)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    joint = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_xy")
    )
    n_x = F.sum("n_xy").over(Window.partitionBy("lang"))
    n_y = F.sum("n_xy").over(Window.partitionBy("source"))
    n = F.sum("n_xy").over(Window.partitionBy(F.lit(1)))
    staged = joint.select(
        "lang",
        "source",
        "n_xy",
        n_x.alias("n_x"),
        n_y.alias("n_y"),
        n.alias("n"),
    )
    lift = (
        F.col("n_xy").cast("double") * F.col("n")
        / (F.col("n_x") * F.col("n_y"))
    )
    pxy = F.col("n_xy") / F.col("n")
    return staged.select(
        "lang",
        "source",
        "n_xy",
        F.round(pxy, 6).alias("p_xy"),
        F.round(lift, 6).alias("lift"),
        F.round(pxy * F.log2(lift), 6).alias("mi_term"),
    )


DP_EPSILON = 1.0
DP_SEED = "dp-release-v1"  # version the seed: re-release = new noise draw


def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release: per-event-type counts with
    seeded Laplace(1/ε) noise — the privacy gate before usage statistics
    leave the pipeline.  Count queries have L1 sensitivity 1, so noise
    scale b = 1/ε.

    The noise is DETERMINISTIC given (group, seed): u ∈ (0,1) comes from
    the md5 of the seeded group key (engine-independent, like every
    split/sample in this repo — a release must not change when the
    engine version does), and the draw is the Laplace inverse CDF
    u - 0.5 → -b·sign(t)·ln(1-2|t|).  Seed versioning makes re-release
    an explicit decision.  Rounded at 4 decimals (ln differs in the
    last ulp across libm implementations)."""
    from etl_embargo_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("true_count")
    )
    u = (
        hash_bucket(
            F.concat(F.lit(DP_SEED + ":"), F.col("event_type")),
            1_000_000_007,
        )
        + F.lit(1)
    ) / F.lit(1_000_000_009.0)
    t = u - F.lit(0.5)
    b = 1.0 / DP_EPSILON
    noise = -F.lit(b) * F.signum(t) * F.log(1 - 2 * F.abs(t))
    return counts.select(
        "event_type",
        "true_count",
        F.round(F.col("true_count") + noise, 4).alias("dp_count"),
    )


def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting at weekly grain: each week's active users
    decomposed into new (first week ever), retained (active the previous
    week), and resurrected (returning after a gap), plus churned (last
    week's actives who didn't return) — the canonical active-user bridge
    (new + retained + resurrected = WAU; churned = prev WAU − retained).

    Scale shape: events collapse to distinct (user, week) FIRST (one
    fact shuffle, map-side combined); the per-user classification is one
    lag/min window over that relation; the weekly rollup and the churn
    lag then run over the WEEK-sized relation.  Weeks are a linear index
    (days since 2024-01-01, integer-divided by 7), so adjacency is exact
    and session-timezone invariant (date of an NTZ timestamp)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    wi = F.floor(
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        )
        / 7
    ).cast("int")
    um = ev.select("user_id", wi.alias("wk")).distinct()
    w = Window.partitionBy("user_id").orderBy("wk")
    wall = Window.partitionBy("user_id")
    tagged = um.select(
        "wk",
        (F.col("wk") == F.min("wk").over(wall)).alias("is_new"),
        (F.lag("wk").over(w) == F.col("wk") - 1).alias("is_retained"),
    )
    weekly = tagged.groupBy("wk").agg(
        F.count(F.lit(1)).alias("wau"),
        F.sum(F.col("is_new").cast("bigint")).alias("n_new"),
        F.sum(
            F.coalesce(F.col("is_retained"), F.lit(False)).cast("bigint")
        ).alias("n_retained"),
    )
    wm = Window.orderBy("wk")
    return weekly.select(
        "wk",
        "wau",
        "n_new",
        "n_retained",
        (F.col("wau") - F.col("n_new") - F.col("n_retained")).alias(
            "n_resurrected"
        ),
        (F.lag("wau").over(wm) - F.col("n_retained")).alias("n_churned"),
    )


# ---------------------------------------------------------------------------
# TPC-H shape batch 2 (round 2): outer-join histogram (Q13), share-of-total
# HAVING (Q11), distinct-count with exclusion (Q16), anti-join + scalar
# threshold (Q22).
# ---------------------------------------------------------------------------

IMPORTANT_PART_RATIO = (3, 2)  # Q11-style threshold: value > 1.5× avg part
IDLE_SINCE = "2000-01-01"  # Q22-style recency horizon


def q_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped order-count distribution: how many customers
    placed exactly N orders (including N=0 via the outer join).

    Scale shape: orders collapse to a per-customer count FIRST (one fact
    shuffle with map-side partials → customer-sized relation); customer
    then LEFT-joins that aggregate — never customer⋈orders row-level, so
    the outer join carries O(customers), not O(orders).  The final
    histogram re-aggregates the customer-sized relation.  (Reference has
    no outer joins — SURVEY §2.3 'Absent'; this is the Q13 gap shape.)
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c_count"))
    )
    return (
        cust.join(
            per_cust, cust["c_custkey"] == per_cust["o_custkey"], "left"
        )
        .select(F.coalesce("c_count", F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped share-of-total HAVING: parts whose revenue exceeds
    1.5× the average per-part revenue (the scale-invariant form of Q11's
    ``value > SUM(value) × fraction`` — the fraction is tied to the part
    count so the report stays meaningful at any SF).

    Scale shape: one fact pass builds the per-part revenue aggregate
    (map-side partials; part-sized output); the global total AND part
    count are an empty window OVER that aggregate, not a scalar subquery
    — Spark 4 does NOT reuse exchanges for duplicated scalar-subquery
    subtrees (two full fact scans, verified on q_top_supplier), so
    sharing must be structural.  The threshold compare is exact
    (decimal × bigint), immune to float association order.
    """
    num, den = IMPORTANT_PART_RATIO
    per_part = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum(_revenue_term()).alias("value_exact"))
    )
    w = Window.partitionBy()
    return (
        per_part.withColumn("total_exact", F.sum("value_exact").over(w))
        .withColumn("n_parts", F.count(F.lit(1)).over(w))
        .filter(
            F.col("value_exact") * F.col("n_parts") * den
            > F.col("total_exact") * num
        )
        .select(
            "l_partkey",
            F.round(F.col("value_exact"), 2)
            .cast("double")
            .alias("part_value"),
        )
    )


def q_part_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped supplier-count report: distinct suppliers able to
    ship each (brand, size-band), excluding suppliers with negative
    account balance (the Q16 'complaints' exclusion).

    Scale shape: the fact collapses to DISTINCT (partkey, suppkey) pairs
    first — the one fact shuffle, map-side combined, bounded by
    |part|×|supplier| not |lineitem|.  The part attributes and the
    excluded-supplier list are both broadcast (LEFT ANTI), so the pair
    relation never reshuffles until the final brand/size-band
    count_distinct, which runs over the pair-sized relation.
    """
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        pairs.join(
            F.broadcast(excluded),
            pairs["l_suppkey"] == excluded["s_suppkey"],
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            "p_brand",
            (F.floor(F.col("p_size") / 10)).cast("int").alias("size_band"),
        )
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped idle-capital report: per nation, the count and
    total balance of above-average-balance customers with NO orders since
    IDLE_SINCE (anti join + global scalar threshold).

    Scale shape: the recency anti-join's right side collapses to DISTINCT
    recent o_custkey first (map-side combined, ≤|customer| rows) and
    broadcasts — the fact never shuffles.  The global average-balance
    threshold is a 1-row aggregate broadcast via crossJoin (a second
    pass over the customer DIM, not the fact; cheap and
    explicitly-shared, unlike Spark 4 scalar subqueries which re-execute
    the subtree).  Exact-cent compare: acctbal is cent-valued, so both
    sides scale to integer cents ×customer-count to avoid float-division
    drift between engines.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    cents = (F.col("c_acctbal") * 100).cast("decimal(18,0)")
    thresh = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            F.sum(cents).alias("sum_cents"),
            F.count(F.lit(1)).alias("n_pos"),
        )
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= IDLE_SINCE)
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.crossJoin(F.broadcast(thresh))
        .filter(cents * F.col("n_pos") > F.col("sum_cents"))
        .join(
            F.broadcast(recent),
            cust["c_custkey"] == recent["o_custkey"],
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
    )


TRADE_REGION = "EUROPE"  # Q7-style scope: supplier nations of one region
EXCESS_QTY = 45.0  # Q20-style single-part-year shipment threshold
EXCESS_YEAR = ("1997-01-01", "1998-01-01")


def q_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped cross-border trade matrix: yearly revenue shipped
    between every (supplier nation, customer nation) pair where the
    supplier sits in TRADE_REGION and the two nations differ (Q7's
    bilateral pair generalized to the full matrix so the report is
    non-degenerate at every SF).

    Scale shape: the only shuffle is lineitem⋈orders co-partitioned on
    orderkey; the supplier→nation leg broadcasts pre-filtered to the
    region's nations, and the customer→nation leg broadcasts whole (a
    dim).  The direction predicate (s_nat ≠ c_nat) is a post-broadcast
    filter — no theta join materializes — and the final
    (nation, nation, year) aggregate rides map-side partials.
    """
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == TRADE_REGION
    )
    snat = nation.join(
        F.broadcast(region),
        nation["n_regionkey"] == region["r_regionkey"],
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(snat),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        "l_extendedprice",
        "l_discount",
        F.year("l_shipdate").alias("l_year"),
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(F.sum(_revenue_term()), 2)
            .cast("double")
            .alias("revenue")
        )
    )


def q_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive join: revenue from lineitems matching
    an OR of three (brand, size-range, quantity-range) conjunctions — the
    classic test that a disjunction of join-and-scan predicates stays in
    ONE whole-stage-codegen pass instead of three union'd scans.

    Scale shape: part is broadcast; the brand/size terms prune the
    broadcast rows and the quantity terms are evaluated post-join inside
    the same codegen stage; the fact is scanned exactly once.  Output is
    one row per matched brand (aggregate over the disjunction).
    """
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    q = F.col("l_quantity")
    b, s = F.col("p_brand"), F.col("p_size")
    disj = (
        ((b == "Brand#12") & s.between(1, 10) & q.between(1, 20))
        | ((b == "Brand#23") & s.between(11, 30) & q.between(10, 35))
        | ((b == "Brand#4") & s.between(21, 50) & q.between(20, 50))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(disj)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(_revenue_term()), 2)
            .cast("double")
            .alias("revenue"),
        )
    )


def q_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped nested semi-join chain: suppliers who shipped more
    than EXCESS_QTY units of any single red part during EXCESS_YEAR,
    tagged with their nation — the 'who is overstocked on red parts'
    report (Q20's partsupp availability gate re-expressed over shipments,
    since the synthetic schema has no partsupp).

    Scale shape: red parts prune and broadcast into the fact scan (the
    year filter is pushed to the parquet scan); the (suppkey, partkey)
    aggregate is the one fact shuffle; the qualifying-supplier key set
    (≤|supplier|) broadcasts back as a LEFT SEMI against the supplier
    dim, and nation broadcasts for the name.  The fact is scanned once.
    """
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("red "))
        .select("p_partkey")
    )
    lo, hi = EXCESS_YEAR
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    heavy = (
        li.join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > EXCESS_QTY)
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    return (
        supp.join(
            F.broadcast(heavy),
            supp["s_suppkey"] == heavy["l_suppkey"],
            "left_semi",
        )
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped correlated-min: for every part, the supplier with
    the LOWEST total shipped cost (Q2's min-supplycost correlated
    subquery, decorrelated into a window over the aggregate).

    Scale shape: one fact pass builds the (partkey, suppkey) cost
    aggregate; the per-part minimum is row_number over that part-sized
    relation (never a rejoin against a scalar subquery — Spark 4 would
    re-execute the whole subtree).  Cost is exact decimal, so the
    (cost, suppkey) ordering — and therefore the winner — is identical
    across engines; ties break to the smallest supplier key.
    """
    costs = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_revenue_term()).alias("cost_exact"))
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("cost_exact").asc(), F.col("l_suppkey").asc()
    )
    return (
        costs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_partkey",
            F.col("l_suppkey").alias("best_suppkey"),
            F.round(F.col("cost_exact"), 2)
            .cast("double")
            .alias("best_cost"),
        )
    )


KS_SEGMENTS = ("BUILDING", "MACHINERY")  # q_ks_test populations
AB_SUCCESS = ("purchase", "error")  # q_ab_test: success iff #purchase > #error


def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the account-balance
    distributions of two customer segments — the drift test a data
    pipeline runs between yesterday's and today's feature distribution.

    Scale shape: the raw populations first collapse to per-(value,
    segment) counts (map-side combined — the relation is
    distinct-value-sized, not row-sized); the two empirical CDFs are
    running sums over that value-ordered relation, and the statistic is
    a max over it.  The global-order window is legitimate for the same
    reason as q_mom_growth: it runs over the collapsed value relation,
    never the raw rows (at 100 TB you'd additionally pre-bin values —
    same plan shape one aggregate earlier).  The sup|F1−F2| compare is
    exact: counts are integers and the cross-multiplied difference
    |c1·n2 − c2·n1| avoids float CDFs entirely."""
    a, b = KS_SEGMENTS
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(a, b)
    )
    vc = cust.groupBy("c_acctbal").agg(
        F.sum(
            (F.col("c_mktsegment") == a).cast("bigint")
        ).alias("c1"),
        F.sum(
            (F.col("c_mktsegment") == b).cast("bigint")
        ).alias("c2"),
    )
    w = Window.orderBy("c_acctbal").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cum = vc.select(
        F.sum("c1").over(w).alias("f1"),
        F.sum("c2").over(w).alias("f2"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"),
    )
    return cum.groupBy("n1", "n2").agg(
        F.round(
            F.max(F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")))
            / (F.first("n1") * F.first("n2")),
            6,
        ).alias("ks_stat")
    )


def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion experiment readout: users split into variants by
    the deterministic user_id parity, success = strictly more
    AB_SUCCESS[0] than AB_SUCCESS[1] events (net-positive purchasers —
    the synthetic stream gives every user every event type, so a mere
    any-purchase flag would be degenerate); reports per-variant
    conversion and the pooled two-proportion z-score — the A/B
    significance summary.

    Scale shape: events collapse to per-user conversion flags first (one
    map-side-combined shuffle bounded by |users|), the per-variant
    rollup is two rows, and the z arithmetic is a single projection of
    the 2-row pivot.  Conversion ratios and z are single IEEE divisions
    over exact integer counts — engine-stable under round(·, 6)."""
    good, bad = AB_SUCCESS
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == good).cast("int"))
            > F.sum((F.col("event_type") == bad).cast("int"))
        ).cast("int").alias("converted")
    )
    per_var = (
        per_user.withColumn(
            "variant", (F.col("user_id") % 2).cast("int")
        )
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("converted").alias("conv"),
        )
    )
    wide = per_var.groupBy().agg(
        F.sum(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv"))).alias("c0"),
        F.sum(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv"))).alias("c1"),
    )
    p0, p1 = F.col("c0") / F.col("n0"), F.col("c1") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")) / (F.col("n0") + F.col("n1"))
    se = F.sqrt(pp * (1 - pp) * (1 / F.col("n0") + 1 / F.col("n1")))
    return wide.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.round(p0, 6).alias("rate0"),
        F.round(p1, 6).alias("rate1"),
        F.round((p1 - p0) / se, 6).alias("z_score"),
    )


FORECAST_YEAR = ("1996-01-01", "1997-01-01")  # Q6 window
PROFIT_PART_WORD = "widget"  # Q9 part-name filter
PROFIT_COST_FRAC = (1, 2)  # emulated supply cost = retailprice/2


def q_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped what-if: revenue increase from dropping discounts
    in a band — SUM(extendedprice·discount) over a one-year, discount-
    band, low-quantity slice.  One row out.

    Scale shape: pure scan-side work — all three predicates push to the
    parquet scan (date + discount range + quantity), the aggregate is a
    map-side partial sum, and the exchange carries ONE row per task.
    The simplest query in the suite and the purest pushdown test: if
    PushedFilters loses any of the three, the scan reads 100 TB to
    discard most of it."""
    lo, hi = FORECAST_YEAR
    li = load_table(spark, sf_dir, "lineitem")
    sliced = li.filter(
        (F.col("l_shipdate") >= lo)
        & (F.col("l_shipdate") < hi)
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return sliced.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast(
                    "decimal(18,4)"
                )
            ),
            2,
        )
        .cast("double")
        .alias("revenue"),
    )


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped profit attribution: per (supplier nation, order
    year), the profit on one part family — revenue minus an emulated
    supply cost (retailprice/2 per unit; the synthetic schema has no
    partsupp).

    Scale shape: the widest join tree in the suite — part (name-filtered)
    and the supplier→nation chain broadcast into the fact scan, orders
    co-partitions with lineitem on orderkey (the ONE fact-fact
    exchange), and the (nation, year) rollup rides map-side partials.
    Both profit terms are cent-exact decimals, so the aggregate is
    order-insensitive."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(PROFIT_PART_WORD))
        .select("p_partkey", "p_retailprice")
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    num, den = PROFIT_COST_FRAC
    cost = (
        F.col("p_retailprice") * F.col("l_quantity") * num / den
    ).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name", "o_year")
        .agg(
            F.round(F.sum(_revenue_term() - cost), 2)
            .cast("double")
            .alias("profit")
        )
    )


PROMO_MONTH = ("1996-03-01", "1996-04-01")  # Q14 window


def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promotion share: the percentage of one month's
    revenue from PROMO-type parts — numerator and denominator from ONE
    fact pass via conditional aggregation (never two scans or a
    self-union).

    Scale shape: part broadcasts; the month filter pushes to the scan;
    the two sums are map-side partials of the same aggregate.  The final
    percentage is one IEEE division of two exact decimals, rounded."""
    lo, hi = PROMO_MONTH
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    promo = F.when(
        F.col("p_type") == "PROMO", _revenue_term()
    ).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(F.sum(promo), 2).cast("double").alias("promo_revenue"),
            F.round(F.sum(_revenue_term()), 2)
            .cast("double")
            .alias("total_revenue"),
            F.round(
                100
                * F.sum(promo).cast("double")
                / F.sum(_revenue_term()).cast("double"),
                6,
            ).alias("promo_pct"),
        )
    )


def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of l_extendedprice — the standard
    forensic data-quality scan for fabricated or truncated numeric
    columns (synthetic uniform-ish prices will NOT follow Benford; the
    per-digit chi-square terms quantify exactly how far off).

    Scale shape: ONE fact scan collapses map-side to 9 digit cells;
    every window/ratio after that runs over the 9-row relation.  The
    observed counts are integers; expected shares come from a single
    log10 of a small rational, so round(·, 6) is engine-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    digit = F.substring(
        F.floor("l_extendedprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    per = li.groupBy(digit.alias("digit")).agg(
        F.count(F.lit(1)).alias("n")
    )
    staged = per.withColumn(
        "total", F.sum("n").over(Window.partitionBy())
    )
    expected = F.log10(1 + 1.0 / F.col("digit"))
    e_count = F.col("total") * expected
    return staged.select(
        "digit",
        "n",
        F.round(F.col("n") / F.col("total"), 6).alias("share"),
        F.round(expected, 6).alias("benford"),
        F.round(
            (F.col("n") - e_count) * (F.col("n") - e_count) / e_count, 6
        ).alias("chi2_term"),
    )


def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily order-revenue series — the
    first time-series diagnostic (is today predictive of tomorrow?)
    behind seasonality and forecast-model choice.

    Scale shape: the fact table collapses to exact-decimal DAILY totals
    first (map-side combined, day-sized relation); the lag pairing is
    one window over that ~1.1k-row series.  Pearson r is then computed
    from EXACT decimal co-moment sums (n, Σx, Σy, Σxy, Σx², Σy²) — not
    the streaming corr() aggregate, whose partition-merge order makes
    the last ulps nondeterministic run to run — so the final doubles
    are bit-identical across engines and runs."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    w = Window.orderBy("day")
    pairs = daily.select(
        F.col("rev").alias("x"),
        F.lag("rev").over(w).alias("y"),
    ).filter(F.col("y").isNotNull())
    mom = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,4)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,4)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,4)"))
        .cast("double")
        .alias("syy"),
    )
    n = F.col("n")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return mom.select(
        n.cast("bigint").alias("n_pairs"),
        F.round(num / den, 6).alias("lag1_corr"),
    )


def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event type: the day where the
    cumulative deviation of daily counts from the type's mean rate
    peaks — the standard drift locator for monitoring pipelines.

    Scale shape: the event log collapses to (type, day) counts in one
    map-side-combined shuffle; both windows (running sum, per-type
    totals) run over that tiny relation, partitioned on the same key
    (one exchange).  The deviation is kept INTEGER-exact by scaling:
    n_days·cum_t − t·total equals n_days·Σ(cᵢ − mean) without ever
    materializing the fractional mean."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    w_ord = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_seq = Window.partitionBy("event_type").orderBy("day")
    w_all = Window.partitionBy("event_type")
    staged = daily.select(
        "event_type",
        "day",
        (
            F.count(F.lit(1)).over(w_all) * F.sum("c").over(w_ord)
            - F.row_number().over(w_seq) * F.sum("c").over(w_all)
        ).alias("scaled_dev"),
        F.count(F.lit(1)).over(w_all).cast("int").alias("n_days"),
        F.sum("c").over(w_all).alias("total"),
    )
    w_pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("scaled_dev")).desc(), "day"
    )
    return (
        staged.withColumn("rk", F.row_number().over(w_pick))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            "scaled_dev",
            "n_days",
            "total",
        )
    )


WINSOR_LO = 5  # clip percentiles, in percent
WINSOR_HI = 95


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization report per customer segment: p05/p95 clipping of
    account balances, with raw vs clipped means and clip counts — the
    robust-feature-engineering pass that tames heavy tails before
    model training.

    Scale shape: the percentile boundaries are DISCRETE order
    statistics picked by integer rank arithmetic (rank = ⌊(n−1)·p⌋+1
    over an exact integer expression) — no float interpolation, so
    both engines select the identical element; the tiny boundary
    relation broadcasts back onto the scan and the clipped sums are
    exact decimals.  At 100 TB you'd swap the rank window for
    approx_percentile partials — same two-phase shape, sketched
    boundaries."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_custkey", "c_acctbal"
    )
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wp = Window.partitionBy("c_mktsegment")
    ranked = cust.select(
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    lo_rank = ((F.col("n") - 1) * WINSOR_LO - ((F.col("n") - 1) * WINSOR_LO) % 100) / 100 + 1
    hi_rank = ((F.col("n") - 1) * WINSOR_HI - ((F.col("n") - 1) * WINSOR_HI) % 100) / 100 + 1
    bounds = ranked.groupBy("c_mktsegment").agg(
        F.max(F.when(F.col("rn") == lo_rank, F.col("c_acctbal"))).alias("p_lo"),
        F.max(F.when(F.col("rn") == hi_rank, F.col("c_acctbal"))).alias("p_hi"),
    )
    joined = cust.join(F.broadcast(bounds), "c_mktsegment")
    clipped = F.greatest(
        F.col("p_lo"), F.least(F.col("p_hi"), F.col("c_acctbal"))
    ).cast("decimal(18,2)")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("p_lo").alias("p_lo"),
        F.max("p_hi").alias("p_hi"),
        F.sum((F.col("c_acctbal") < F.col("p_lo")).cast("int")).alias(
            "n_clip_lo"
        ),
        F.sum((F.col("c_acctbal") > F.col("p_hi")).cast("int")).alias(
            "n_clip_hi"
        ),
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("mean_raw"),
        F.round(
            F.sum(clipped).cast("double") / F.count(F.lit(1)), 4
        ).alias("mean_winsor"),
    )


def q_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form distributed OLS per return flag: extendedprice
    regressed on (quantity, discount) with intercept, coefficients by
    Cramer's rule over the 3×3 normal equations plus R² — multivariate
    regression as ONE mergeable aggregation pass, the shape that scales
    to any row count because only 10 co-moment sums cross the wire.

    Exactness: every co-moment term is cast to decimal BEFORE summing
    (addition-order-proof); the determinant algebra then runs on the
    resulting doubles with an expression tree mirrored verbatim in the
    oracle, so the IEEE evaluation is bit-identical."""
    # ten decimal(28,8) sums are CPU-bound: widen the byte-sized scan
    # first or the partial aggregate runs on 3 cores (measured 3.5s ->
    # ~1s warm at sf0.1)
    li = spread_for_cpu(
        load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_quantity", "l_discount", "l_extendedprice"
        ),
        spark,
    )
    x1, x2, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")

    def dsum(c):
        return F.sum(c.cast("decimal(28,8)")).cast("double")

    mom = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(x1).alias("sx1"),
        dsum(x2).alias("sx2"),
        dsum(y).alias("sy"),
        dsum(x1 * x1).alias("s11"),
        dsum(x1 * x2).alias("s12"),
        dsum(x2 * x2).alias("s22"),
        dsum(x1 * y).alias("s1y"),
        dsum(x2 * y).alias("s2y"),
        dsum(y * y).alias("syy"),
    )
    n, sx1, sx2 = F.col("n"), F.col("sx1"), F.col("sx2")
    sy, s11, s12 = F.col("sy"), F.col("s11"), F.col("s12")
    s22, s1y, s2y, syy = F.col("s22"), F.col("s1y"), F.col("s2y"), F.col("syy")
    det = (
        n * (s11 * s22 - s12 * s12)
        - sx1 * (sx1 * s22 - s12 * sx2)
        + sx2 * (sx1 * s12 - s11 * sx2)
    )
    b0 = (
        sy * (s11 * s22 - s12 * s12)
        - sx1 * (s1y * s22 - s12 * s2y)
        + sx2 * (s1y * s12 - s11 * s2y)
    ) / det
    b1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (sx1 * s22 - s12 * sx2)
        + sx2 * (sx1 * s2y - s1y * sx2)
    ) / det
    b2 = (
        n * (s11 * s2y - s1y * s12)
        - sx1 * (sx1 * s2y - s1y * sx2)
        + sy * (sx1 * s12 - s11 * sx2)
    ) / det
    sse = syy - b0 * sy - b1 * s1y - b2 * s2y
    sst = syy - sy * sy / n
    return mom.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        F.round(b0, 6).alias("b_intercept"),
        F.round(b1, 6).alias("b_quantity"),
        F.round(b2, 6).alias("b_discount"),
        F.round(1 - sse / sst, 6).alias("r2"),
    )


SURVIVAL_EVENT = "purchase"  # the "death" event: first conversion


def q_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier-style time-to-conversion table: per death-time t
    (days from a user's first activity to their first purchase), the
    conversions, the at-risk count, the discrete hazard d/n and the
    Nelson-Aalen cumulative hazard.  Users who never purchase are
    right-censored at their last observed day — the survival-analysis
    treatment of funnels that a naive conversion rate gets wrong
    (censored users are at-risk while observed, not failures).

    Scale shape: the log collapses to per-user (t, censored) first —
    one map-side-combined shuffle bounded by |users|; everything after
    runs over the ≤|distinct t| relation.  Hazards are single exact
    IEEE divisions of integers and the cumulative sum runs in fixed
    t-order, so round(·, 6) is engine-stable."""
    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(day).alias("first_day"),
        F.max(day).alias("last_day"),
        F.min(
            F.when(F.col("event_type") == SURVIVAL_EVENT, day)
        ).alias("conv_day"),
    )
    flagged = per_user.select(
        F.coalesce(
            F.col("conv_day") - F.col("first_day"),
            F.col("last_day") - F.col("first_day"),
        ).alias("t"),
        F.col("conv_day").isNull().cast("int").alias("censored"),
    )
    per_t = flagged.groupBy("t").agg(
        F.sum(1 - F.col("censored")).alias("d"),
        F.count(F.lit(1)).alias("leaving"),
    ).withColumn(
        "n_users", F.sum("leaving").over(Window.partitionBy())
    )
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    at_risk = per_t.select(
        "t",
        "d",
        (
            F.col("n_users")
            - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0))
        ).alias("n_risk"),
    ).filter(F.col("d") > 0)
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return at_risk.select(
        "t",
        "d",
        "n_risk",
        F.round(F.col("d") / F.col("n_risk"), 6).alias("hazard"),
        F.round(
            F.sum(F.col("d") / F.col("n_risk")).over(w_cum), 6
        ).alias("cum_hazard"),
    )


EWMA_DECAY = 0.7  # (1 - alpha): weight on history per day of distance
EWMA_SPIKE = 1.5  # today / yesterday's smoothed rate => spike


def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily event counts per
    type, with a spike flag (today ≥ EWMA_SPIKE× yesterday's smoothed
    rate) — the standard low-lag monitoring smoother.

    The recursive definition s_t = αx_t + (1−α)s_{t−1} is not a window
    aggregate, but its closed form is: s_t = Σᵢ(1−α)^{Δdays}xᵢ / Σᵢ
    (1−α)^{Δdays}, and factoring the numerator as (1−α)^{d_t} ·
    Σ xᵢ·(1−α)^{−dᵢ} turns both sums into plain CUMULATIVE window sums
    over the day-ordered series — one window, no recursion, gap-aware
    (weights decay by calendar distance, not row index).

    Scale shape: the log collapses to (type, day) counts first; all
    windows run over that ~|types|·|days| relation.  The scaled terms
    stay within double range because the series is bounded (30 days →
    (1−α)^{−30} ≈ 4e4); a production run over years would restart the
    scaling per window block — same plan shape."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    inv = F.pow(F.lit(1.0 / EWMA_DECAY), F.col("day"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    decay_t = F.pow(F.lit(EWMA_DECAY), F.col("day"))
    staged = daily.select(
        "event_type",
        "day",
        "c",
        (
            decay_t * F.sum(F.col("c") * inv).over(w)
            / (decay_t * F.sum(inv).over(w))
        ).alias("ewma"),
    )
    w_lag = Window.partitionBy("event_type").orderBy("day")
    lagged = staged.withColumn("prev", F.lag("ewma").over(w_lag)).filter(
        F.col("prev").isNotNull()
    )
    return lagged.select(
        "event_type",
        "day",
        "c",
        F.round("ewma", 6).alias("ewma"),
        F.round(F.col("c") / F.col("prev"), 6).alias("vs_smoothed"),
        (F.col("c") / F.col("prev") >= EWMA_SPIKE).cast("int").alias("spike"),
    )


ITEMSETS3_TOP = 20


def q_itemsets3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets (the A-priori step beyond q_copurchase /
    q_basket_lift's pairs): the top supported part triples bought in
    one order, deterministic tie-break on the triple.

    Scale shape: baskets collapse once (collect_set state bounded by
    basket size, here ≤13 parts); 3-combinations are generated
    ARRAY-SIDE inside codegen — C(k,3) per basket with tiny k — and
    exploded once, so the lineitem scan runs once and NO self-join
    touches the fact table (the classic SQL triple-self-join pays two
    extra fact shuffles; the oracle uses it precisely because DuckDB
    can afford it at oracle scale).  Top-k is TakeOrderedAndProject.
    A production A-priori adds a frequent-pair broadcast filter between
    collapse and expansion — same plan, one more broadcast semi-join."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("items"))
        .filter(F.size("items") >= 3)
    )
    triples = baskets.select(
        F.explode(
            F.expr(
                "flatten(flatten("
                " transform(sequence(0, size(items)-3), i ->"
                "  transform(sequence(i+1, size(items)-2), j ->"
                "   transform(sequence(j+1, size(items)-1), k ->"
                "    struct(items[i] AS pa, items[j] AS pb,"
                "           items[k] AS pc))))))"
            )
        ).alias("t")
    )
    return (
        triples.select("t.pa", "t.pb", "t.pc")
        .groupBy("pa", "pb", "pc")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.col("support").desc(), "pa", "pb", "pc")
        .limit(ITEMSETS3_TOP)
    )


def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue — the single-number
    inequality summary behind q_revenue_deciles' concentration curve
    (G = 2·Σᵢ i·xᵢ/(n·Σx) − (n+1)/n over ascending-ranked spend).

    Scale shape: the fact table collapses to per-customer exact-decimal
    totals first; the rank window and both sums run over that
    customer-sized relation.  Every term up to the final division is
    integer-rank × exact-decimal, so the statistic is engine-stable
    under round(·, 6); ranks tie-break on custkey."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend")
    )
    w = Window.orderBy("spend", "o_custkey")
    ranked = per_cust.select(
        "spend", F.row_number().over(w).cast("bigint").alias("rk")
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("spend").alias("total"),
        F.sum(F.col("rk") * F.col("spend")).alias("rank_weighted"),
    )
    n = F.col("n")
    gini = (
        2 * F.col("rank_weighted").cast("double")
        / (n * F.col("total").cast("double"))
        - (n + 1) / n
    )
    return agg.select(
        n.alias("n_customers"),
        F.round(F.col("total"), 2).cast("double").alias("total_spend"),
        F.round(gini, 6).alias("gini"),
    )


def q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × event-type seasonality profile: each cell's share
    of its type's volume and the deviation from the uniform 1/7 rate —
    the weekly-rhythm baseline monitoring compares against (q_ewma
    smooths the series; this explains WHY Mondays spike).

    Scale shape: one map-side-combined collapse to |types|×7 cells;
    shares are window sums over that relation.  Counts are integers,
    the share is one exact division — engine-stable under round."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type",
        F.dayofweek(F.col("ts").cast("date")).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w_type = Window.partitionBy("event_type")
    return cells.select(
        "event_type",
        "dow",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_type), 6).alias("share"),
        F.round(
            F.col("n") / F.sum("n").over(w_type) - 1.0 / 7, 6
        ).alias("vs_uniform"),
    )


BOLLINGER_WINDOW = 7  # trailing days
BOLLINGER_SIGMA = 2.0


def q_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breakout scan over daily order revenue: trailing
    7-day mean ± 2σ bands and the days that close outside them — the
    rolling-variance anomaly surface (q_zscore_outliers is the global
    version; this one's baseline adapts with the series).

    Scale shape: the fact table collapses to exact-decimal daily totals
    first; the trailing mean/stddev share ONE window frame over the
    day-sized relation.  Days inside the warm-up (fewer than
    BOLLINGER_WINDOW trailing points) are excluded so the stddev is
    always full-window."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("rev")
    )
    w = Window.orderBy("day").rowsBetween(
        -(BOLLINGER_WINDOW - 1), Window.currentRow
    )
    staged = daily.select(
        "day",
        "rev",
        F.avg("rev").over(w).alias("ma"),
        F.stddev_samp("rev").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("n_win"),
    ).filter(F.col("n_win") == BOLLINGER_WINDOW)
    upper = F.col("ma") + BOLLINGER_SIGMA * F.col("sd")
    lower = F.col("ma") - BOLLINGER_SIGMA * F.col("sd")
    return staged.select(
        "day",
        F.round("rev", 2).alias("rev"),
        F.round("ma", 4).alias("ma"),
        F.round(upper, 4).alias("upper"),
        F.round(lower, 4).alias("lower"),
        (
            (F.col("rev") > upper) | (F.col("rev") < lower)
        ).cast("int").alias("breakout"),
    )


AUC_POSITIVE = "purchase"


def q_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the event ``value`` as a score for predicting
    purchase events — the rank-sum (Mann–Whitney U) formulation, the
    standard offline readout for any scoring model over a big event log.

    Scale shape: raw rows collapse to per-score (pos, neg) counts first
    (map-side combined; the relation is distinct-score-sized).  The
    below-rank accumulation is one cumulative window over that collapsed
    relation — the same legitimate global-order window as q_ks_test —
    and ties contribute the exact half-credit via the 2U integer trick:
    2U = Σ pos·(2·neg_below + neg_tied), so everything stays integer
    until the single final division (engine-stable under round(·, 6))."""
    ev = load_table(spark, sf_dir, "events")
    vc = ev.groupBy("value").agg(
        F.sum((F.col("event_type") == AUC_POSITIVE).cast("bigint")).alias(
            "pos"
        ),
        F.sum((F.col("event_type") != AUC_POSITIVE).cast("bigint")).alias(
            "neg"
        ),
    )
    w_below = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wall = Window.partitionBy()
    cum = vc.select(
        "pos",
        "neg",
        F.coalesce(F.sum("neg").over(w_below), F.lit(0)).alias("neg_below"),
        F.sum("pos").over(wall).alias("n_pos"),
        F.sum("neg").over(wall).alias("n_neg"),
    )
    return cum.groupBy("n_pos", "n_neg").agg(
        F.round(
            F.sum(
                F.col("pos") * (2 * F.col("neg_below") + F.col("neg"))
            )
            / (2.0 * F.first("n_pos") * F.first("n_neg")),
            6,
        ).alias("auc")
    )


THEILSEN_YEAR = 1996


def q_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of THEILSEN_YEAR's daily order revenue:
    the median over all pairwise day slopes (and the matching median
    intercept) — the outlier-resistant alternative to q_ols when a few
    anomalous days would drag a least-squares fit.

    Scale shape: the fact table collapses to exact-decimal daily totals
    first, so the quadratic pair expansion runs over the day-sized
    relation only (≤366 rows → ≤67k pairs at ANY corpus size — the
    classic confine-the-quadratic move).  The day relation broadcasts
    into an inequality pair join; medians are exact order statistics
    (avg of the two middle row_numbers) over the bounded pair relation.
    Slopes are one IEEE division of an exact decimal difference by an
    integer day gap — identical in any engine, so ordering, selection,
    and round(·, 6) are all stable."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(F.year("o_orderdate") == THEILSEN_YEAR)
        .groupBy(
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit(f"{THEILSEN_YEAR}-01-01").cast("date"),
            ).alias("day")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
        # consumed 3× (both pair-join sides + the residual leg):
        # persist shares the materialized aggregate (lazy checkpoint is
        # NOT job-free — AQE materializes shuffle stages at toRdd)
        .persist()
    )
    a, b = daily.alias("a"), F.broadcast(daily.alias("b"))
    pairs = a.join(b, F.col("a.day") < F.col("b.day")).select(
        (
            (F.col("b.rev") - F.col("a.rev")).cast("double")
            / (F.col("b.day") - F.col("a.day"))
        ).alias("slope")
    )
    w = Window.orderBy("slope")
    wall = Window.partitionBy()
    ranked = pairs.select(
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    # exact middle selection: rows floor((n+1)/2) and floor(n/2)+1
    med = ranked.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor(F.col("n") / 2) + 1)
    )
    slope_med = med.groupBy("n").agg(F.avg("slope").alias("slope_med"))
    resid = daily.crossJoin(F.broadcast(slope_med)).select(
        "n",
        "slope_med",
        (
            F.col("rev").cast("double")
            - F.col("slope_med") * F.col("day")
        ).alias("resid"),
    )
    wr = Window.partitionBy("n", "slope_med").orderBy("resid")
    rranked = resid.select(
        "n",
        "slope_med",
        "resid",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("n", "slope_med"))
        .alias("nd"),
    )
    return (
        rranked.filter(
            (F.col("rn") == F.floor((F.col("nd") + 1) / 2))
            | (F.col("rn") == F.floor(F.col("nd") / 2) + 1)
        )
        .groupBy("n", "nd")
        .agg(
            F.round(F.first("slope_med"), 6).alias("slope_med"),
            F.round(F.avg("resid"), 6).alias("intercept_med"),
        )
        .select(
            F.col("n").cast("bigint").alias("n_pairs"),
            F.col("nd").cast("bigint").alias("n_days"),
            "slope_med",
            "intercept_med",
        )
    )


def q_jaccard_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: exact Jaccard similarity between the
    *affinity audiences* of every event-type pair, where a user belongs
    to type t's audience when t accounts for strictly more than a 1/5
    share of their events (raw membership is degenerate — every user
    emits every type).  The exact companion to q_kmv_overlap's sketch.

    Scale shape: events collapse to per-(user, type) counts (map-side
    combined), then to per-user type sets; pairs expand INSIDE each
    user's audience array (≤ C(5,2) = 10 per user — never a self-join),
    and the type-sized marginal relation broadcasts back onto the
    pair counts.  All counts integer; one final division."""
    ev = load_table(spark, sf_dir, "events")
    per_ut = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_ut")
    )
    wtot = Window.partitionBy("user_id")
    aud = (
        per_ut.withColumn("tot", F.sum("n_ut").over(wtot))
        .filter(F.col("n_ut") * 5 > F.col("tot"))
        # consumed 3× (pair expansion + two marginal legs): persist
        # keeps the events scan single-execution, with no build-time job
        .persist()
    )
    per_user = aud.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("ts")
    )
    pairs = per_user.select(
        F.explode(
            F.flatten(
                F.expr(
                    "transform(ts, (x, i) -> "
                    "transform(slice(ts, i + 2, size(ts)), "
                    "y -> struct(x AS a, y AS b)))"
                )
            )
        ).alias("p")
    ).select("p.a", "p.b")
    inter = pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("n_inter")
    )
    marg = aud.groupBy("event_type").agg(F.count(F.lit(1)).alias("m"))
    return (
        inter.join(
            F.broadcast(marg.withColumnRenamed("event_type", "a")), "a"
        )
        .withColumnRenamed("m", "n_a")
        .join(
            F.broadcast(marg.withColumnRenamed("event_type", "b")), "b"
        )
        .withColumnRenamed("m", "n_b")
        .select(
            F.col("a").alias("type_a"),
            F.col("b").alias("type_b"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("n_inter").cast("bigint").alias("n_inter"),
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )


SEASONAL_EPOCH = "1995-01-01"


def _seasonal_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared core of the seasonal family: the day-sized relation with
    (day, dow, rev_d, trend, seasonal) — see q_seasonal_decompose for
    the semantics and determinism contract."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit(SEASONAL_EPOCH).cast("date"),
        ).alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.select(
        "day",
        (F.col("day") % 7).alias("dow"),
        F.col("rev").cast("double").alias("rev_d"),
        (F.sum("rev").over(w7).cast("double") / 7.0).alias("trend"),
        F.count(F.lit(1)).over(w7).alias("n_win"),
    ).filter(F.col("n_win") == 7)
    det = trended.withColumn(
        "det_q",
        F.round(F.col("rev_d") - F.col("trend"), 6).cast("decimal(18,6)"),
    )
    wdow = Window.partitionBy("dow")
    wall = Window.partitionBy()
    staged = det.select(
        "day",
        "dow",
        "rev_d",
        "trend",
        F.round(
            F.sum("det_q").over(wdow).cast("double")
            / F.count(F.lit(1)).over(wdow),
            6,
        )
        .cast("decimal(18,6)")
        .alias("smean"),
        F.count(F.lit(1)).over(wdow).alias("cnt"),
    )
    staged = staged.withColumn(
        "smean_div",
        F.round(F.col("smean").cast("double") / F.col("cnt"), 9).cast(
            "decimal(18,9)"
        ),
    ).withColumn(
        "seasonal",
        F.col("smean").cast("double")
        - F.sum("smean_div").over(wall).cast("double") / 7.0,
    )
    return staged


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily order
    revenue series: rev = trend (centered 7-day moving average)
    + day-of-week seasonal (mean detrended value per weekday, centered
    to sum to zero) + residual — the series triage every
    forecasting/anomaly pipeline starts with.

    Scale shape: ONE fact scan — the fact collapses to exact-decimal
    daily totals, and trend / seasonal / grand-mean are three windows
    over that day-sized relation (day order, weekday partition, global;
    all legitimate: the relation is calendar-bounded at any corpus
    size).  The weekday means fold into the same pass via the
    smean/cnt contribution trick (Σ_rows smean/cnt = Σ_dow smean), so
    the daily lineage never executes twice.  Engine determinism: sums
    only ever run over quantized DECIMAL terms; every division is a
    single IEEE op on exact operands."""
    staged = _seasonal_staged(spark, sf_dir)
    return staged.select(
        "day",
        F.col("dow").cast("int").alias("dow"),
        F.round("rev_d", 2).alias("rev"),
        F.round("trend", 4).alias("trend"),
        F.round("seasonal", 4).alias("seasonal"),
        F.round(
            (F.col("rev_d") - F.col("trend")) - F.col("seasonal"), 4
        ).alias("residual"),
    )


ANOM_SEASONAL_K = 3.0


def q_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly scan: a day is anomalous when its
    decomposition residual (q_seasonal_decompose) exceeds
    ANOM_SEASONAL_K robust sigmas, sigma = 1.4826·MAD of the residuals
    — the upgrade over q_anomaly_mad/q_bollinger that a weekly-cycled
    series needs (a busy Monday is not an anomaly; a Monday-sized
    Sunday is).

    Scale shape: everything runs over the day-sized staged relation
    (lazily checkpointed — the MAD order statistic and the flagging
    pass share one lineage).  The MAD is an exact order statistic
    (avg of the two middle |residual| ranks); the flag compares doubles
    that both engines computed identically, so the decision replays
    exactly."""
    staged = _seasonal_staged(spark, sf_dir).persist()
    resid = staged.select(
        "day",
        "rev_d",
        (
            (F.col("rev_d") - F.col("trend")) - F.col("seasonal")
        ).alias("resid"),
    )
    wr = Window.orderBy(F.abs(F.col("resid")))
    wall = Window.partitionBy()
    ranked = resid.select(
        F.abs(F.col("resid")).alias("aresid"),
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    mad = (
        ranked.filter(
            (F.col("rn") == F.floor((F.col("n") + 1) / 2))
            | (F.col("rn") == F.floor(F.col("n") / 2) + 1)
        )
        .groupBy("n")
        .agg(F.avg("aresid").alias("mad"))
        .select("mad")
    )
    flagged = resid.crossJoin(F.broadcast(mad)).select(
        "day",
        F.round("rev_d", 2).alias("rev"),
        F.round("resid", 4).alias("resid"),
        F.round(F.lit(MAD_CONSISTENCY) * F.col("mad"), 4).alias(
            "robust_sigma"
        ),
        (
            F.abs(F.col("resid"))
            > F.lit(ANOM_SEASONAL_K)
            * (F.lit(MAD_CONSISTENCY) * F.col("mad"))
        )
        .cast("int")
        .alias("is_anomaly"),
    )
    return flagged


BOOTSTRAP_B = 200
# Cumulative CDF of Poisson(1): P(X <= k) for k = 0..7; weights above
# cap at 8.  Literal constants so the Spark and DuckDB ladders are
# bit-identical.
POISSON1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
]


def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap confidence interval for the mean order value via
    the POISSON BOOTSTRAP — the resampling scheme that actually scales:
    instead of drawing n rows with replacement (impossible without a
    global pass per replicate), every row independently contributes a
    Poisson(1)-distributed weight to each of B replicates, which is
    exactly the large-n limit of multinomial resampling.

    Scale shape: one fact scan explodes ×B (B = 200 bounded) and
    partial-aggregates map-side straight down to the B-row replicate
    relation; the CI is exact order statistics over those B means.
    Cost profile: genuinely CPU-bound and linear in cores — and the CPU
    is the HASHING, not the explode (the round-6 driver measured 4.2 s
    at sf0.1 with one md5 per (row, replicate) = 30M md5+concat calls).
    Round 7 packs FOUR replicates per hash: md5 yields 128 bits = 4
    independent 32-bit uniforms, so each row hashes B/4 = 50 times and
    the 4 uniforms are sliced from the hex digest.  Same md5-uniform
    family, same literal inverse-CDF ladder, 4× less hashing; the
    DuckDB oracle mirrors the digest slicing byte-for-byte so the CI
    stays engine-exact (weights differ from the round-6 scheme — both
    are equally valid Poisson(1) draws; the oracle moved with it).
    Replicate sums are DECIMAL-exact with a single final division per
    mean."""
    orders = load_table(spark, sf_dir, "orders")
    # the ×B explode + md5s are CPU-bound on a byte-sized scan:
    # widen partitioning first or one core does all the hashing
    n_blocks = BOOTSTRAP_B // 4
    # x rides the ×B explode as exact BIGINT cents (decimal parse once
    # per ORDER, not a decimal multiply per replicate row); the replicate
    # mean is then CAST(sum_cents AS DOUBLE)/100.0/sum_w — sum_cents is
    # exactly representable (< 2^53 through sf100) and /100.0 is one
    # correctly-rounded IEEE division, so mean_r is BIT-identical to the
    # decimal-sum formulation, just without 30M BigDecimal ops.
    blocks = (
        spread_for_cpu(orders.select("o_orderkey", "o_totalprice"), spark)
        .select(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("x_cents"),
            F.col("o_orderkey"),
            F.explode(
                F.sequence(F.lit(0), F.lit(n_blocks - 1))
            ).alias("blk"),
        )
        # projection BEFORE the second explode: md5 evaluates once per
        # (row, block), not once per (row, replicate)
        .select(
            "x_cents",
            "blk",
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("o_orderkey").cast("string"),
                    F.col("blk").cast("string"),
                )
            ).alias("h"),
        )
    )
    reps = blocks.select(
        "x_cents",
        "blk",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
    ).select(
        "x_cents",
        (F.col("blk") * 4 + F.col("i") + 1).alias("rep"),
        (
            F.conv(
                F.expr("substring(h, 1 + 8 * i, 8)"), 16, 10
            ).cast("bigint")
            / F.lit(4294967296.0)
        ).alias("u"),
    )
    u = F.col("u")
    w = F.lit(len(POISSON1_CDF))
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    weighted = reps.select("rep", w.alias("w"), "x_cents")
    means = weighted.groupBy("rep").agg(
        (
            F.sum(F.col("x_cents") * F.col("w")).cast("double")
            / F.lit(100.0)
            / F.sum("w")
        ).alias("mean_r")
    )
    lo_rank = int(0.025 * (BOOTSTRAP_B - 1)) + 1
    hi_rank = int(0.975 * (BOOTSTRAP_B - 1)) + 1
    wr = Window.orderBy("mean_r")
    ranked = means.select(
        "mean_r", F.row_number().over(wr).alias("rn")
    )
    point = orders.agg(
        F.count(F.lit(1)).alias("n_orders"),
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("mean_hat"),
    )
    ci = ranked.filter(
        F.col("rn").isin(lo_rank, hi_rank)
    ).agg(
        F.min("mean_r").alias("ci_lo"), F.max("mean_r").alias("ci_hi")
    )
    return point.crossJoin(F.broadcast(ci)).select(
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.lit(BOOTSTRAP_B).cast("int").alias("b"),
        F.round("mean_hat", 4).alias("mean_hat"),
        F.round("ci_lo", 4).alias("ci_lo"),
        F.round("ci_hi", 4).alias("ci_hi"),
    )


RIDGE_LAMBDAS = [0.0, 0.01, 0.1, 1.0, 10.0]  # per-row units (×n applied)


def q_ridge_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The entire ridge-regression regularization path from ONE fact
    scan: extendedprice on (quantity, discount), intercept unpenalized
    (centered normal equations), one output row per λ — the
    hyperparameter sweep that costs no more than a single fit because
    the same 10 co-moment sums answer every λ.

    Scale shape: identical to q_ols (decimal-exact mergeable co-moments,
    nothing but 10 numbers cross the wire); the λ grid is a literal
    array exploded onto the 1-row moment relation, so adding λ values
    is free.  λ is specified per row (×n) so the path is invariant to
    scale factor.  The closed-form 2×2 Cramer algebra is mirrored
    verbatim in the oracle for bit-identical IEEE evaluation."""
    li = spread_for_cpu(
        load_table(spark, sf_dir, "lineitem").select(
            "l_quantity", "l_discount", "l_extendedprice"
        ),
        spark,
    )
    x1, x2, y = (
        F.col("l_quantity"),
        F.col("l_discount"),
        F.col("l_extendedprice"),
    )

    def dsum(c):
        return F.sum(c.cast("decimal(28,8)")).cast("double")

    mom = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(x1).alias("sx1"),
        dsum(x2).alias("sx2"),
        dsum(y).alias("sy"),
        dsum(x1 * x1).alias("s11"),
        dsum(x1 * x2).alias("s12"),
        dsum(x2 * x2).alias("s22"),
        dsum(x1 * y).alias("s1y"),
        dsum(x2 * y).alias("s2y"),
        dsum(y * y).alias("syy"),
    )
    lam_rel = F.explode(
        F.array(*[F.lit(v) for v in RIDGE_LAMBDAS])
    ).alias("lam_rel")
    path = mom.select("*", lam_rel)
    n, sx1, sx2 = F.col("n"), F.col("sx1"), F.col("sx2")
    sy, s11, s12 = F.col("sy"), F.col("s11"), F.col("s12")
    s22, s1y, s2y, syy = (
        F.col("s22"),
        F.col("s1y"),
        F.col("s2y"),
        F.col("syy"),
    )
    lam = F.col("lam_rel") * n
    c11 = s11 - sx1 * sx1 / n
    c12 = s12 - sx1 * sx2 / n
    c22 = s22 - sx2 * sx2 / n
    c1y = s1y - sx1 * sy / n
    c2y = s2y - sx2 * sy / n
    cyy = syy - sy * sy / n
    det = (c11 + lam) * (c22 + lam) - c12 * c12
    b1 = (c1y * (c22 + lam) - c12 * c2y) / det
    b2 = ((c11 + lam) * c2y - c12 * c1y) / det
    b0 = (sy - b1 * sx1 - b2 * sx2) / n
    sse = (
        cyy
        - 2.0 * (b1 * c1y + b2 * c2y)
        + b1 * b1 * c11
        + 2.0 * (b1 * b2 * c12)
        + b2 * b2 * c22
    )
    return path.select(
        F.col("lam_rel").alias("lambda_per_row"),
        n.cast("bigint").alias("n_rows"),
        F.round(b0, 6).alias("b_intercept"),
        F.round(b1, 6).alias("b_quantity"),
        F.round(b2, 6).alias("b_discount"),
        F.round(1.0 - sse / cyy, 6).alias("r2"),
    )


PSI_SPLIT = "2024-01-16"  # midpoint of the synthetic event month
PSI_BIN_WIDTH = 50.0
PSI_BINS = 10


def q_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the event stream's ``value`` distribution — the binned drift metric
    ML-ops monitors alongside q_ks_test's exact sup-norm (PSI is what
    production scorecards actually alert on; > 0.25 = major shift).

    Scale shape: one scan collapses straight to the (bin, period)
    contingency cells (map-side combined, ≤ 2·PSI_BINS rows); shares
    and the PSI terms are projections over that cell relation, and the
    headline total is an exact decimal window sum of 9-dp-quantized
    terms (float Σ would be merge-order-dependent).  Laplace +1
    smoothing keeps empty bins finite and deterministic."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(PSI_SPLIT).cast("timestamp_ntz")
    bin_ = F.least(
        F.floor(F.col("value") / PSI_BIN_WIDTH),
        F.lit(PSI_BINS - 1),
    ).cast("int")
    cells = ev.groupBy(bin_.alias("bin")).agg(
        F.sum((F.col("ts") < split).cast("bigint")).alias("c1"),
        F.sum((F.col("ts") >= split).cast("bigint")).alias("c2"),
    )
    wall = Window.partitionBy()
    staged = cells.select(
        "bin",
        "c1",
        "c2",
        (
            (F.col("c1") + 1.0)
            / (F.sum("c1").over(wall) + F.lit(float(PSI_BINS)))
        ).alias("p1"),
        (
            (F.col("c2") + 1.0)
            / (F.sum("c2").over(wall) + F.lit(float(PSI_BINS)))
        ).alias("p2"),
    )
    term = (F.col("p2") - F.col("p1")) * F.log(F.col("p2") / F.col("p1"))
    staged = staged.withColumn(
        "term_q", F.round(term, 9).cast("decimal(18,9)")
    )
    return staged.select(
        "bin",
        F.col("c1").cast("bigint").alias("c1"),
        F.col("c2").cast("bigint").alias("c2"),
        F.round("p1", 6).alias("p1"),
        F.round("p2", 6).alias("p2"),
        F.round(F.col("term_q").cast("double"), 9).alias("psi_term"),
        F.round(
            F.sum("term_q").over(wall).cast("double"), 6
        ).alias("psi_total"),
    )


LTV_EPOCH = "2024-01-01"
LTV_EVENT = "purchase"


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users cohorted by first-activity
    week, cumulative purchase revenue per user tracked by account-age
    week — the retention-economics readout (does a later cohort
    monetize faster?) that every growth team reads weekly.

    Scale shape: one events scan; the user's first day comes from a
    user-partitioned window min on that scan (same single exchange a
    join would cost, no second lineage), rows then collapse to the
    (user, cohort, age) grain map-side, and that bounded relation is
    lazily checkpointed for its two consumers (revenue cells + distinct
    cohort sizes).  The cumulative-LTV window runs per cohort over the
    ≤|weeks|² cell relation.  Revenue is cent-exact decimal end to end;
    the only division is the final per-user normalization."""
    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit(LTV_EPOCH).cast("date")
    )
    wu = Window.partitionBy("user_id")
    base = ev.select(
        "user_id",
        day.alias("day"),
        F.col("event_type"),
        F.col("value").cast("decimal(18,2)").alias("val"),
    ).withColumn("first_day", F.min("day").over(wu))
    per_uca = (
        base.groupBy(
            "user_id",
            F.floor(F.col("first_day") / 7).alias("cohort_week"),
            F.floor((F.col("day") - F.col("first_day")) / 7).alias(
                "age_week"
            ),
        )
        .agg(
            F.sum(
                F.when(F.col("event_type") == LTV_EVENT, F.col("val"))
            ).alias("rev")
        )
        # two consumers (cells + cohort sizes): keep the scan single-run
        .persist()
    )
    cells = per_uca.groupBy("cohort_week", "age_week").agg(
        F.sum(F.coalesce(F.col("rev"), F.lit(0).cast("decimal(18,2)")))
        .alias("rev")
    )
    sizes = per_uca.groupBy("cohort_week").agg(
        F.count_distinct("user_id").alias("n_users")
    )
    wcum = (
        Window.partitionBy("cohort_week")
        .orderBy("age_week")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cells.withColumn("cum_rev", F.sum("rev").over(wcum))
    return cum.join(F.broadcast(sizes), "cohort_week").select(
        F.col("cohort_week").cast("int").alias("cohort_week"),
        F.col("age_week").cast("int").alias("age_week"),
        F.col("n_users").cast("bigint").alias("n_users"),
        F.col("rev").cast("double").alias("rev"),
        F.col("cum_rev").cast("double").alias("cum_rev"),
        F.round(
            F.col("cum_rev").cast("double") / F.col("n_users"), 6
        ).alias("ltv_per_user"),
    )


TARGET_FOLDS = 5


def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold mean-target encoding of p_brand against
    l_extendedprice — the leakage-safe categorical encoder: each row's
    encoding is the mean target of its category computed WITHOUT the
    row's own fold, so the feature never memorizes its own label.
    Folds come from the engine-independent md5 bucket of the line key
    (the q_hash_sample contract: a training split must never change
    when the engine does).

    Scale shape: one fact scan with the brand dim broadcast collapses
    to the (brand × fold) cell relation — TARGET_FOLDS·|brands| rows —
    and the leave-one-fold-out arithmetic is two window sums over those
    cells: oof_mean = (Σ_brand s − s_fold) / (Σ_brand n − n_fold).
    Sums are cent-exact decimal; the division is single IEEE."""
    from etl_embargo_spark.operators.sampling import hash_bucket

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    fold = hash_bucket(
        F.concat_ws(
            "-",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        ),
        TARGET_FOLDS,
    )
    cells = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", fold.alias("fold"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
            ).alias("s"),
        )
    )
    wb = Window.partitionBy("p_brand")
    return cells.select(
        "p_brand",
        F.col("fold").cast("int").alias("fold"),
        F.col("n").cast("bigint").alias("n"),
        F.round(
            (F.sum("s").over(wb) - F.col("s")).cast("double")
            / (F.sum("n").over(wb) - F.col("n")),
            6,
        ).alias("oof_mean"),
        F.round(
            F.sum("s").over(wb).cast("double") / F.sum("n").over(wb), 6
        ).alias("brand_mean"),
    )


def q_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value profile of the discount
    feature against the returned-flag outcome — the credit-scoring
    feature screen: WOE_b = ln((bad_b/B)/(good_b/G)) per feature bin,
    IV = Σ_b (bad_b/B − good_b/G)·WOE_b (rule of thumb: IV > 0.3 =
    strong predictor, < 0.02 = useless).

    Scale shape: one fact scan collapses to the ≤|distinct discount|
    cell relation; class totals are empty-frame window sums over it,
    and the IV is an exact decimal window sum of 9-dp-quantized terms
    (the ln is transcendental — quantize before summing).  Counts stay
    integer until the share divisions."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy("l_discount").agg(
        F.sum((F.col("l_returnflag") == "R").cast("bigint")).alias(
            "bad"
        ),
        F.sum((F.col("l_returnflag") != "R").cast("bigint")).alias(
            "good"
        ),
    )
    wall = Window.partitionBy()
    staged = cells.select(
        "l_discount",
        "bad",
        "good",
        (F.col("bad") / F.sum("bad").over(wall)).alias("bad_share"),
        (F.col("good") / F.sum("good").over(wall)).alias("good_share"),
    )
    woe = F.log(F.col("bad_share") / F.col("good_share"))
    staged = staged.withColumn(
        "iv_term",
        F.round(
            (F.col("bad_share") - F.col("good_share")) * woe, 9
        ).cast("decimal(18,9)"),
    )
    return staged.select(
        "l_discount",
        F.col("bad").cast("bigint").alias("bad"),
        F.col("good").cast("bigint").alias("good"),
        F.round("bad_share", 6).alias("bad_share"),
        F.round("good_share", 6).alias("good_share"),
        F.round(woe, 6).alias("woe"),
        F.col("iv_term").cast("double").alias("iv_term"),
        F.round(
            F.sum("iv_term").over(wall).cast("double"), 6
        ).alias("iv_total"),
    )


SNAIVE_SEASON = 7
SNAIVE_HOLDOUT = 28


def q_snaive_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast evaluation: predict each of the last
    SNAIVE_HOLDOUT days of daily order revenue as rev[d − 7] and score
    the holdout with MAE and MASE (error scaled by the training-period
    seasonal-naive error — MASE < 1 beats the naive baseline; the
    standard yardstick any real forecaster must clear).

    Scale shape: one fact scan collapses to exact-decimal daily
    totals; forecast (lag), the holdout boundary (global max) and both
    error means are windows over that day-sized relation.  Everything
    is decimal arithmetic — |rev − lag(rev)| of decimals is exact, so
    no quantization is even needed — with one IEEE division per
    reported ratio."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit(SEASONAL_EPOCH).cast("date"),
        ).alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    w = Window.orderBy("day")
    wall = Window.partitionBy()
    staged = daily.select(
        "day",
        "rev",
        F.lag("rev", SNAIVE_SEASON).over(w).alias("yhat"),
        F.max("day").over(wall).alias("max_day"),
    ).filter(F.col("yhat").isNotNull())
    staged = staged.withColumn(
        "is_holdout",
        (F.col("day") > F.col("max_day") - SNAIVE_HOLDOUT).cast("int"),
    ).withColumn("ae", F.abs(F.col("rev") - F.col("yhat")))
    wtrain = Window.partitionBy()
    scored = staged.select(
        "day",
        "is_holdout",
        "rev",
        "yhat",
        "ae",
        (
            F.sum(
                F.when(F.col("is_holdout") == 0, F.col("ae"))
            ).over(wtrain)
        ).alias("train_ae_sum"),
        (
            F.sum((F.col("is_holdout") == 0).cast("bigint")).over(
                wtrain
            )
        ).alias("train_n"),
    ).filter(F.col("is_holdout") == 1)
    denom = F.col("train_ae_sum").cast("double") / F.col("train_n")
    return scored.select(
        "day",
        F.col("rev").cast("double").alias("rev"),
        F.col("yhat").cast("double").alias("yhat"),
        F.col("ae").cast("double").alias("ae"),
        F.round(denom, 4).alias("train_mae"),
        F.round(F.col("ae").cast("double") / denom, 6).alias("mase"),
    )


def q_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level uplift readout: the A/B experiment of q_ab_test
    (variant = user parity, conversion = net purchaser) broken out by
    behavioral segment (the user's modal event type) — where targeting
    models start: which segments does the treatment actually move?

    Scale shape: one events scan collapses to per-user (segment,
    variant, converted) rows — map-side combined, user-bounded — then
    to segment×variant cells; the uplift/SE projection runs over the
    ≤2·|segments| relation.  Counts stay integer; conversion rates,
    uplift and the pooled SE are a fixed IEEE expression tree mirrored
    in the oracle."""
    ev = load_table(spark, sf_dir, "events")
    per_ut = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_ut")
    )
    wu = Window.partitionBy("user_id").orderBy(
        F.col("n_ut").desc(), F.col("event_type").asc()
    )
    per_user = (
        per_ut.withColumn("rk", F.row_number().over(wu))
        .withColumn(
            "n_purchase",
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("n_ut")
                ).otherwise(F.lit(0))
            ).over(Window.partitionBy("user_id")),
        )
        .withColumn(
            "n_error",
            F.sum(
                F.when(
                    F.col("event_type") == "error", F.col("n_ut")
                ).otherwise(F.lit(0))
            ).over(Window.partitionBy("user_id")),
        )
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("segment"),
            (F.col("user_id") % 2).cast("int").alias("variant"),
            (F.col("n_purchase") > F.col("n_error"))
            .cast("bigint")
            .alias("converted"),
        )
    )
    cells = per_user.groupBy("segment", "variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").alias("conv"),
    )
    ws = Window.partitionBy("segment")
    wide = (
        cells.withColumn(
            "n0", F.sum(F.when(F.col("variant") == 0, F.col("n"))).over(ws)
        )
        .withColumn(
            "c0",
            F.sum(F.when(F.col("variant") == 0, F.col("conv"))).over(ws),
        )
        .filter(
            (F.col("variant") == 1) & F.col("n0").isNotNull()
        )  # segments lacking a control arm have no uplift readout
    )
    r1 = F.col("conv") / F.col("n")
    r0 = F.col("c0") / F.col("n0")
    se = F.sqrt(
        r1 * (1.0 - r1) / F.col("n") + r0 * (1.0 - r0) / F.col("n0")
    )
    # degenerate cells (both rates 0 or 1) have se = 0: no z statistic
    z = F.when(se > 0, F.round((r1 - r0) / se, 6))
    return wide.select(
        "segment",
        F.col("n0").cast("bigint").alias("n_control"),
        F.col("c0").cast("bigint").alias("conv_control"),
        F.col("n").cast("bigint").alias("n_treat"),
        F.col("conv").cast("bigint").alias("conv_treat"),
        F.round(r0, 6).alias("rate_control"),
        F.round(r1, 6).alias("rate_treat"),
        F.round(r1 - r0, 6).alias("uplift"),
        z.alias("z"),
    )


# two-sided alpha = 0.05, power = 0.8 — literal quantiles so both
# engines evaluate the identical closed form
Z_ALPHA_2 = 1.959963984540054
Z_BETA = 0.8416212335729143
MDE_GRID = [0.01, 0.02, 0.05, 0.10]


def q_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power analysis: users-per-arm needed to detect each
    minimum-detectable-effect in MDE_GRID at alpha = 0.05 / power = 0.8,
    seeded with the OBSERVED baseline conversion (q_ab_test's net-
    purchaser definition, control arm) — the planning step that runs
    before q_ab_test/q_uplift ever get data.

    Scale shape: one events scan collapses to per-user conversion flags
    and then to a single (n, conv) row; the MDE grid explodes over that
    1-row relation and the two-proportion closed form is a projection
    of literal constants and one observed rate — adding MDEs is free."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("bigint"))
            > F.sum((F.col("event_type") == "error").cast("bigint"))
        )
        .cast("bigint")
        .alias("converted")
    )
    base = per_user.filter(F.col("user_id") % 2 == 0).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("converted").alias("conv_obs"),
    )
    grid = base.select(
        "*",
        F.explode(F.array(*[F.lit(m) for m in MDE_GRID])).alias("mde"),
    )
    p1 = F.col("conv_obs") / F.col("n_obs")
    p2 = p1 + F.col("mde")
    pbar = (p1 + p2) / 2.0
    num = (
        F.lit(Z_ALPHA_2) * F.sqrt(2.0 * pbar * (1.0 - pbar))
        + F.lit(Z_BETA)
        * F.sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2))
    )
    n_arm = F.ceil(num * num / (F.col("mde") * F.col("mde")))
    return grid.select(
        "mde",
        F.col("n_obs").cast("bigint").alias("n_obs"),
        F.round(p1, 6).alias("p_base"),
        F.round(p2, 6).alias("p_target"),
        n_arm.cast("bigint").alias("n_per_arm"),
    )


# ---------------------------------------------------------------------------
# Decision-stump split search (1-level tree induction)
# ---------------------------------------------------------------------------

STUMP_FEATURES = ("l_quantity", "l_discount")
STUMP_LABEL_FLAG = "R"


def q_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump induction: for each candidate numeric feature, the
    single threshold split (x <= t vs x > t) that best separates the
    binary label (l_returnflag = 'R') by Gini purity — the inner loop of
    tree/GBDT training, run as one declarative pass.

    Scale shape: the raw rows collapse to per-(feature, value) label
    counts first (one map-side-combined shuffle; the relation is
    distinct-value-sized — 50 + 11 values here, and at 100 TB you'd
    pre-bin continuous features to ~256 quantile bins first, same plan
    one aggregate earlier).  Candidate thresholds are cumulative window
    sums over that tiny relation; the per-feature argmax is a
    partitioned row_number rank-filter (WindowGroupLimit shape).

    Engine determinism: the purity score is ONE IEEE division of two
    exactly-represented integers — ((posL²+negL²)·nR + (posR²+negR²)·nL)
    / (nL·nR) — so both engines produce bit-identical doubles and the
    argmax tie-break (threshold asc) only matters on true ties.  The
    numerator reaches ~1e20 at sf1 (6M rows), past int64's 9.2e18, so
    the squares are computed in decimal(38,0) (exact to 1e38, good
    through sf100-scale counts); DuckDB's window sum(BIGINT) already
    yields HUGEINT so the oracle is exact as written.  Both engines'
    integer→double casts are correctly rounded, so the single division
    stays bit-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    stacked = li.select(
        F.expr(
            "stack(2, 'l_quantity', l_quantity, 'l_discount', l_discount)"
            " AS (feature, val)"
        ),
        (F.col("l_returnflag") == STUMP_LABEL_FLAG).cast("bigint").alias("y"),
    )
    per_val = stacked.groupBy("feature", "val").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    wcum = (
        Window.partitionBy("feature")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("feature")
    cum = per_val.select(
        "feature",
        "val",
        F.sum("n").over(wcum).alias("nl"),
        F.sum("pos").over(wcum).alias("posl"),
        F.sum("n").over(wall).alias("nt"),
        F.sum("pos").over(wall).alias("post"),
    ).filter(F.col("nl") < F.col("nt"))
    nl, posl = F.col("nl"), F.col("posl")
    nt, post = F.col("nt"), F.col("post")
    negl = nl - posl
    nr = nt - nl
    posr = post - posl
    negr = nr - posr
    def _d(c):
        return c.cast("decimal(38,0)")

    num = (_d(posl) * _d(posl) + _d(negl) * _d(negl)) * _d(nr) + (
        _d(posr) * _d(posr) + _d(negr) * _d(negr)
    ) * _d(nl)
    purity = num.cast("double") / (nl * nr)
    parent = (post * post + (nt - post) * (nt - post)).cast("double") / (
        nt * nt
    )
    scored = cum.select(
        "feature",
        "val",
        nl.alias("n_left"),
        nr.alias("n_right"),
        "nt",
        purity.alias("purity"),
        (purity / nt - parent).alias("gain"),
    )
    rk = Window.partitionBy("feature").orderBy(
        F.col("purity").desc(), F.col("val")
    )
    return (
        scored.withColumn("rn", F.row_number().over(rk))
        .filter(F.col("rn") == 1)
        .select(
            "feature",
            F.round("val", 2).alias("threshold"),
            "n_left",
            "n_right",
            F.round("purity", 6).alias("purity"),
            F.round("gain", 9).alias("gain"),
        )
    )


# ---------------------------------------------------------------------------
# Chi-square feature screening
# ---------------------------------------------------------------------------


def q_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence screen: for each categorical feature
    (market segment; nationkey mod-5 band), the χ² statistic against the
    solvency label (c_acctbal > 0) — the standard univariate feature-
    selection pass before model training.

    Scale shape: rows collapse to contingency cells in one map-side-
    combined shuffle (the relation is |feature|×|label| cells, ~20
    rows); marginals are window sums OVER the cell relation; nothing
    row-sized survives the first aggregate.

    Engine determinism: χ² = N·Σ obs²/(rowT·colT) − N.  Each term is one
    IEEE division of exact bigints (bit-identical both engines), rounded
    to 12 dp and summed as decimal(38,12) — decimal sums are associative
    so partition merge order cannot flip the rounded output."""
    cust = load_table(spark, sf_dir, "customer")
    stacked = cust.select(
        F.expr(
            "stack(2, 'segment', c_mktsegment,"
            " 'nation_band', cast(c_nationkey % 5 as string))"
            " AS (feature, fval)"
        ),
        (F.col("c_acctbal") > 0).cast("int").alias("y"),
    )
    cells = stacked.groupBy("feature", "fval", "y").agg(
        F.count(F.lit(1)).alias("obs")
    )
    wf = Window.partitionBy("feature")
    wrow = Window.partitionBy("feature", "fval")
    wcol = Window.partitionBy("feature", "y")
    terms = cells.select(
        "feature",
        "fval",
        "y",
        "obs",
        F.sum("obs").over(wrow).alias("row_t"),
        F.sum("obs").over(wcol).alias("col_t"),
        F.sum("obs").over(wf).alias("n"),
    ).select(
        "feature",
        "fval",
        "y",
        "n",
        F.round(
            (F.col("obs") * F.col("obs")).cast("double")
            / (F.col("row_t") * F.col("col_t")),
            12,
        )
        .cast("decimal(38,12)")
        .alias("term"),
    )
    return terms.groupBy("feature").agg(
        F.first("n").alias("n"),
        (
            (F.countDistinct("fval") - 1) * (F.countDistinct("y") - 1)
        ).alias("dof"),
        F.round(
            (F.sum("term") * F.first("n") - F.first("n")).cast("double"), 6
        ).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# Recursive-CTE hierarchy walk (SQL-standard WITH RECURSIVE, Spark 4)
# ---------------------------------------------------------------------------

HIERARCHY_FANOUT = 4  # parent(k) = floor((k-1)/4); node 0 is the root

_HIERARCHY_SQL = """
WITH RECURSIVE tree AS (
    SELECT c_custkey AS node, 1 AS depth, c_acctbal AS bal
    FROM customer WHERE c_custkey = 0
    UNION ALL
    SELECT c.c_custkey, t.depth + 1, c.c_acctbal
    FROM customer c JOIN tree t
      ON CAST(floor((c.c_custkey - 1) / 4.0) AS BIGINT) = t.node
    WHERE c.c_custkey > 0
)
SELECT depth,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(min(node) AS BIGINT) AS min_node,
       CAST(max(node) AS BIGINT) AS max_node,
       CAST(sum(CAST(round(bal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
FROM tree GROUP BY depth
"""


def q_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard recursive CTE (Spark 4's WITH RECURSIVE): walk the
    synthetic org tree parent(k) = floor((k-1)/4) from the root and
    report per-depth node counts and exact balance totals — the
    management-chain / BOM-expansion query shape.

    Scale shape: recursion depth is log₄(n) (~6 at sf0.1); each
    iteration is one join of the full relation against the
    previous-depth frontier, so total work is depth × one hash join, and
    the frontier is always broadcastable.  Balance totals are exact
    integer cents — no float aggregation anywhere."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_HIERARCHY_SQL)


# ---------------------------------------------------------------------------
# Rolling regression (trailing-window beta)
# ---------------------------------------------------------------------------

BETA_WINDOW = 28  # trailing days per beta estimate


def q_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 28-day beta of each order-priority's daily revenue against
    the whole market: trailing-window least-squares slope via the five
    co-moment sums — the moving-regression surface (factor exposure,
    elasticity drift) computed without any self-join.

    Scale shape: raw rows collapse once to the per-(priority, day) cent
    relation (map-side combined); the market series is a window sum OVER
    that daily relation (days × priorities rows, never raw rows); the
    five trailing sums are one window pass with a ROWS frame — bounded
    state, WindowExec streams each partition once.

    Engine determinism: all five co-moment sums accumulate exact
    decimal(38,0) products of integer cents (associative — no float
    merge-order hazard); numerator and denominator are cast to double
    once and divided once."""
    orders = load_table(spark, sf_dir, "orders")
    d_int = (
        F.year("o_orderdate") * 10000
        + F.month("o_orderdate") * 100
        + F.dayofmonth("o_orderdate")
    )
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        d_int.alias("d"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "rev"
        )
    )
    wday = Window.partitionBy("d")
    with_mkt = daily.select(
        "priority",
        "d",
        F.col("rev").cast("decimal(19,0)").alias("y"),
        F.sum("rev").over(wday).cast("decimal(19,0)").alias("x"),
    )
    wtrail = (
        Window.partitionBy("priority")
        .orderBy("d")
        .rowsBetween(-(BETA_WINDOW - 1), Window.currentRow)
    )
    wrank = Window.partitionBy("priority").orderBy("d")
    sums = with_mkt.select(
        "priority",
        "d",
        F.row_number().over(wrank).alias("rn"),
        F.count(F.lit(1)).over(wtrail).alias("n"),
        F.sum("x").over(wtrail).alias("sx"),
        F.sum("y").over(wtrail).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(wtrail).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(wtrail).alias("sxx"),
    ).filter(F.col("rn") >= BETA_WINDOW)
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    return sums.select(
        "priority",
        "d",
        F.col("n").cast("bigint").alias("n_days"),
        F.round(num / den, 9).alias("beta"),
    )


# ---------------------------------------------------------------------------
# Distribution-rank window surface (percent_rank / cume_dist / nth_value)
# ---------------------------------------------------------------------------


def q_rank_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ANSI window-rank surface in one query: per nation,
    each customer's percent_rank and cume_dist over account balance plus
    the nation's runner-up balance via nth_value with an explicit
    full-partition frame — the percentile-position readout behind
    "you're in the top X%" features.

    Scale shape: one exchange on the partition key, one sort, all four
    functions evaluated in a single WindowExec pass (no per-function
    re-sort: same partitioning + ordering).  nth_value needs the
    explicit UNBOUNDED FOLLOWING frame — the default running frame
    would return null for rows ranked above 2.

    Engine determinism: percent_rank = (rank-1)/(n-1) and cume_dist =
    peers/n are single IEEE divisions of exact integers; balances pass
    through untouched."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    wfull = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return cust.select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_custkey").alias("cust"),
        F.col("c_acctbal").alias("bal"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        F.nth_value(F.col("c_acctbal"), 2).over(wfull).alias("runner_up"),
    )


# ---------------------------------------------------------------------------
# Linear interpolation gap fill
# ---------------------------------------------------------------------------

INTERP_KNOWN_MOD = 3  # days with day-index % 3 == 0 are "observed"


def q_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation between sparse observations: the daily
    revenue series per order priority is deterministically thinned to
    every third day, and the missing days are reconstructed by linear
    interpolation between the bracketing observations — the gap-fill
    step beyond q_date_spine's LOCF/zero-fill.

    Scale shape: interpolation is two window passes over the per-
    (priority, day) aggregate relation (never raw rows): a PRECEDING
    frame carrying the last observation forward (last ignorenulls) and a
    FOLLOWING frame pulling the next observation back (first
    ignorenulls) — bounded state, one exchange, one sort.

    Engine determinism: observations are integer cents and positions are
    integer day indexes, so the interpolated value is y0 + (y1−y0)·Δ/span
    with an exact bigint numerator and ONE IEEE division."""
    orders = load_table(spark, sf_dir, "orders")
    d_int = (
        F.year("o_orderdate") * 10000
        + F.month("o_orderdate") * 100
        + F.dayofmonth("o_orderdate")
    )
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"), d_int.alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "rev"
        )
    )
    wseq = Window.partitionBy("priority").orderBy("d")
    idx = daily.select(
        "priority",
        "d",
        "rev",
        F.row_number().over(wseq).alias("i"),
    ).select(
        "priority",
        "d",
        "i",
        (F.col("i") % INTERP_KNOWN_MOD == 0).alias("observed"),
        F.when(F.col("i") % INTERP_KNOWN_MOD == 0, F.col("rev")).alias(
            "y_obs"
        ),
    )
    wback = (
        Window.partitionBy("priority")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wfwd = (
        Window.partitionBy("priority")
        .orderBy("i")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    braced = idx.select(
        "priority",
        "d",
        "i",
        "observed",
        "y_obs",
        F.last("y_obs", ignorenulls=True).over(wback).alias("y0"),
        F.last(
            F.when(F.col("y_obs").isNotNull(), F.col("i")), ignorenulls=True
        )
        .over(wback)
        .alias("i0"),
        F.first("y_obs", ignorenulls=True).over(wfwd).alias("y1"),
        F.first(
            F.when(F.col("y_obs").isNotNull(), F.col("i")), ignorenulls=True
        )
        .over(wfwd)
        .alias("i1"),
    )
    interp = F.when(F.col("observed"), F.col("y_obs").cast("double")).otherwise(
        F.col("y0")
        + ((F.col("y1") - F.col("y0")) * (F.col("i") - F.col("i0"))).cast(
            "double"
        )
        / (F.col("i1") - F.col("i0"))
    )
    return braced.filter(
        F.col("y0").isNotNull() & F.col("y1").isNotNull()
    ).select(
        "priority",
        "d",
        "observed",
        F.round(interp / 100.0, 6).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Weighted median
# ---------------------------------------------------------------------------


WM_BIN_W = 128  # price-bin width for the two-phase crossing search


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median unit price per return flag: the price at
    which half the shipped QUANTITY (not half the line items) is cheaper
    — the robust "typical price" a plain median gets wrong when cheap
    lines carry big quantities.

    Scale shape (round-8 rewrite — the first full-registry sf1 soak
    measured the old single-window form at 8.0 s): prices are
    near-unique, so the per-(flag, price) weight relation is
    corpus-sized and the old cumulative window sorted ~all of it in ONE
    task per flag — exactly the single-partition running total
    SCALE.md §2 forbids.  Two-phase crossing search instead: (1) weights
    roll up into fixed-width price bins (the price DOMAIN is
    value-bounded, so the bin relation is ~hundreds of rows per flag —
    window-safe at any corpus size) and the crossing BIN plus the
    cumulative weight below it come from that tiny relation; (2) only
    the crossing bin's prices are scanned for the exact crossing row,
    via a broadcast join of the 3-row crossing info.  All weights are
    exact integers: the crossing test 2·cumw ≥ totw never touches
    floating point, and the first global crossing price provably lies
    in the first bin whose cumulative weight reaches half."""
    li = load_table(spark, sf_dir, "lineitem")
    # consumed twice (bin rollup + in-bin scan): persist, never
    # re-shuffle the corpus-sized relation (CLAUDE.md shared-lineage rule)
    per_price = (
        li.groupBy(
            F.col("l_returnflag").alias("flag"),
            F.col("l_extendedprice").alias("price"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("w"))
        .persist()
    )
    pbin = F.floor(F.col("price") / F.lit(WM_BIN_W)).cast("int")
    binned = per_price.groupBy("flag", pbin.alias("bin")).agg(
        F.sum("w").alias("bw")
    )
    wcum_b = (
        Window.partitionBy("flag")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall_b = Window.partitionBy("flag")
    bins = binned.select(
        "flag",
        "bin",
        (F.sum("bw").over(wcum_b) - F.col("bw")).alias("below_w"),
        F.sum("bw").over(wcum_b).alias("cumbw"),
        F.sum("bw").over(wall_b).alias("totw"),
    )
    first_bin = Window.partitionBy("flag").orderBy("bin")
    crossing = (
        bins.filter(2 * F.col("cumbw") >= F.col("totw"))
        .withColumn("rn", F.row_number().over(first_bin))
        .filter(F.col("rn") == 1)
        # renamed: crossing shares per_price's lineage, so the join
        # below is a self-join — unqualified names would be ambiguous
        .select(
            F.col("flag").alias("cflag"),
            F.col("bin").alias("cbin"),
            "below_w",
            "totw",
        )
    )
    in_bin = per_price.join(
        F.broadcast(crossing),
        (F.col("flag") == F.col("cflag")) & (pbin == F.col("cbin")),
    ).select("flag", "price", "w", "below_w", "totw")
    wcum_p = (
        Window.partitionBy("flag")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    first_price = Window.partitionBy("flag").orderBy("price")
    return (
        in_bin.select(
            "flag",
            "price",
            (F.col("below_w") + F.sum("w").over(wcum_p)).alias("cumw"),
            "totw",
        )
        .filter(2 * F.col("cumw") >= F.col("totw"))
        .withColumn("rn", F.row_number().over(first_price))
        .filter(F.col("rn") == 1)
        .select(
            "flag",
            F.col("price").alias("weighted_median_price"),
            F.col("totw").alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Sequential A/B test (SPRT random walk)
# ---------------------------------------------------------------------------

SPRT_P0, SPRT_P1 = 0.46, 0.54  # tested hypotheses (conversion under H0/H1)
SPRT_A, SPRT_B = 2.944, -2.944  # ln((1-β)/α), ln(β/(1-α)) at α=β=0.05


def q_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential probability-ratio test over the experiment stream: the
    cumulative log-likelihood ratio walks over users in deterministic
    order (user_id), and the readout reports each variant's final LLR,
    its extremes, and the first crossing of either decision boundary —
    the always-valid alternative to fixed-horizon A/B readouts
    (q_ab_test / q_sample_size).

    Scale shape: events collapse to per-user conversion flags (one
    map-side-combined shuffle); the walk is a cumulative window over the
    per-user relation ordered by user_id — the same legitimate global
    window as q_ks_test (user-sized, never event-sized; at 100 TB the
    walk would checkpoint per arrival-day partitions instead).

    Engine determinism: the two per-observation log-likelihood
    increments are CONSTANTS (ln(p1/p0), ln((1−p1)/(1−p0)) precomputed
    in Python) scaled by exact integer counts — the cumulative LLR is
    exact decimal arithmetic, so boundary crossings cannot flip between
    engines."""
    import math

    inc_conv = round(math.log(SPRT_P1 / SPRT_P0), 9)
    inc_fail = round(math.log((1 - SPRT_P1) / (1 - SPRT_P0)), 9)
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("int"))
            > F.sum((F.col("event_type") == "error").cast("int"))
        )
        .cast("int")
        .alias("converted")
    )
    walk = per_user.select(
        (F.col("user_id") % 2).cast("int").alias("variant"),
        "user_id",
        "converted",
        (
            F.when(
                F.col("converted") == 1,
                F.lit(inc_conv).cast("decimal(18,9)"),
            ).otherwise(F.lit(inc_fail).cast("decimal(18,9)"))
        ).alias("inc"),
    )
    wcum = (
        Window.partitionBy("variant")
        .orderBy("user_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    llr = walk.select(
        "variant",
        "user_id",
        F.sum("inc").over(wcum).alias("llr"),
        F.row_number()
        .over(Window.partitionBy("variant").orderBy("user_id"))
        .alias("n"),
    )
    crossed = F.when(F.col("llr") >= SPRT_A, F.lit("accept_h1")).when(
        F.col("llr") <= SPRT_B, F.lit("accept_h0")
    )
    return llr.select("variant", "n", "llr", crossed.alias("decision")).groupBy(
        "variant"
    ).agg(
        F.max("n").alias("n_users"),
        F.max("llr").cast("double").alias("max_llr"),
        F.min("llr").cast("double").alias("min_llr"),
        F.sum(F.when(F.col("decision").isNotNull(), 1).otherwise(0)).alias(
            "n_beyond_bounds"
        ),
        F.min(F.when(F.col("decision").isNotNull(), F.col("n"))).alias(
            "first_crossing_n"
        ),
        # Decision AT the first crossing: min over a sortable
        # "zero-padded n : decision" key (portable argmin-by-n).
        F.substring_index(
            F.min(
                F.when(
                    F.col("decision").isNotNull(),
                    F.concat(
                        F.lpad(F.col("n").cast("string"), 12, "0"),
                        F.lit(":"),
                        F.col("decision"),
                    ),
                )
            ),
            ":",
            -1,
        ).alias("first_decision"),
    )


# ---------------------------------------------------------------------------
# One-way ANOVA
# ---------------------------------------------------------------------------


def q_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across market segments: does mean account balance
    differ by segment?  Reports between/within sums of squares and the
    F statistic — the k-group generalization of q_ab_test.

    Scale shape: one map-side-combined shuffle to per-group (n, Σx,
    Σx²) in exact integer cents; everything after runs on the k-row
    relation.  The textbook Σnᵍ(x̄ᵍ−x̄)² form needs per-group means
    (floats); the computational identity SSB = Σ Sᵍ²/nᵍ − S²/n and
    SSW = Q − Σ Sᵍ²/nᵍ needs only ONE division per group.

    Engine determinism: Sᵍ is exact below 2⁵³, so double·double square
    + one division is a two-op correctly-rounded chain (identical both
    engines — a bigint square would overflow past sf0.3); the k
    per-group terms are rounded to 6 dp and summed as decimals.  F is a
    four-op IEEE chain over those exact values."""
    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    # ADVICE r9 (q_welch_ttest class): sum cents² as decimal(38,0) — a
    # BIGINT sum wraps silently around sf~300 while DuckDB widens to
    # HUGEINT.  The per-row product still fits bigint; only the SUM widens.
    per_g = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(cents).alias("s_g"),
        F.sum((cents * cents).cast("decimal(38,0)")).alias("q_g"),
    )
    term = F.round(
        F.col("s_g").cast("double") * F.col("s_g") / F.col("n_g"), 6
    ).cast("decimal(28,6)")
    tot = per_g.select(
        "n_g", "s_g", "q_g", term.alias("t_g")
    ).groupBy().agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("q_g").alias("q"),
        F.sum("t_g").alias("t"),
    )
    grand = F.round(
        F.col("s").cast("double") * F.col("s") / F.col("n"), 6
    ).cast("decimal(28,6)")
    staged = tot.select(
        "k",
        "n",
        (F.col("t") - grand).alias("ssb_c2"),
        (F.col("q").cast("decimal(28,6)") - F.col("t")).alias("ssw_c2"),
    )
    f_stat = (
        F.col("ssb_c2").cast("double") / (F.col("k") - 1)
    ) / (F.col("ssw_c2").cast("double") / (F.col("n") - F.col("k")))
    return staged.select(
        "k",
        "n",
        F.round(F.col("ssb_c2").cast("double") / 10000.0, 4).alias("ssb"),
        F.round(F.col("ssw_c2").cast("double") / 10000.0, 4).alias("ssw"),
        F.round(f_stat, 9).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Mann–Whitney U (rank-sum) test
# ---------------------------------------------------------------------------

MW_SEGMENTS = ("AUTOMOBILE", "FURNITURE")


def q_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test between two customer segments'
    balance distributions — the non-parametric two-sample test that
    complements q_ks_test (KS detects any shape difference; U targets
    stochastic dominance).

    Scale shape: the populations collapse to per-(value) counts for the
    two groups (map-side combined, distinct-value-sized); midranks are
    one cumulative window over that value-ordered relation — the same
    legitimate collapsed-relation window as q_ks_test.

    Engine determinism: tie-averaged midranks are multiples of 0.5 below
    2⁵², so every product and running sum stays ON the IEEE 0.5-quantum
    grid — exact regardless of partition merge order.  The normal
    approximation (no tie correction — see z docstring) is a short
    correctly-rounded chain: one division into sqrt, one final
    division."""
    a, b = MW_SEGMENTS
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(a, b)
    )
    vc = cust.groupBy("c_acctbal").agg(
        F.sum((F.col("c_mktsegment") == a).cast("bigint")).alias("c1"),
        F.sum((F.col("c_mktsegment") == b).cast("bigint")).alias("c2"),
    )
    wprev = Window.orderBy("c_acctbal").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cnt = F.col("c1") + F.col("c2")
    ranked = vc.select(
        "c1",
        "c2",
        (
            F.coalesce(F.sum(F.col("c1") + F.col("c2")).over(wprev), F.lit(0))
            + (cnt + 1) / 2.0
        ).alias("midrank"),
    )
    agg = ranked.groupBy().agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(F.col("c1") * F.col("midrank")).alias("r1"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    u1 = F.col("r1") - n1 * (n1 + 1) / 2.0
    mu = n1 * n2 / 2.0
    sigma = F.sqrt(n1 * n2 * (n1 + n2 + 1) / 12.0)
    return agg.select(
        "n1",
        "n2",
        F.col("r1").alias("rank_sum_1"),
        u1.alias("u1"),
        F.round((u1 - mu) / sigma, 9).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Difference-in-differences
# ---------------------------------------------------------------------------

DID_CUTOVER = "2024-01-16"  # treatment go-live (events span 2024-01)


def q_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout: per-user purchase counts in
    the pre/post periods around the go-live date, treatment assigned by
    the deterministic user-id parity; the DiD estimate is (post−pre) of
    the treated minus (post−pre) of the control — the causal panel
    estimator that survives level differences between groups (unlike
    q_ab_test's raw comparison).

    Scale shape: one map-side-combined shuffle to the per-(user,
    period) count panel, one rollup to the 4 (group, period) cells —
    nothing after the first aggregate is row-sized.

    Engine determinism: the four cell means are each ONE IEEE division
    of exact integers; DiD is a three-subtraction chain over identical
    doubles."""
    ev = load_table(spark, sf_dir, "events")
    panel = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            (F.col("user_id") % 2 == 1).alias("treated"),
            (F.col("ts") >= F.lit(DID_CUTOVER).cast("timestamp_ntz")).alias(
                "post"
            ),
            "user_id",
        )
        .groupBy("treated", "post", "user_id")
        .agg(F.count(F.lit(1)).alias("purchases"))
    )
    cells = panel.groupBy("treated", "post").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("purchases").alias("total"),
    )
    wide = cells.groupBy().agg(
        *[
            F.sum(
                F.when(
                    (F.col("treated") == t) & (F.col("post") == p),
                    F.col(c),
                )
            ).alias(f"{c}_{'t' if t else 'c'}_{'post' if p else 'pre'}")
            for t in (True, False)
            for p in (True, False)
            for c in ("n_users", "total")
        ]
    )
    mean = {
        g: F.col(f"total_{g}").cast("double") / F.col(f"n_users_{g}")
        for g in ("t_pre", "t_post", "c_pre", "c_post")
    }
    did = (mean["t_post"] - mean["t_pre"]) - (
        mean["c_post"] - mean["c_pre"]
    )
    return wide.select(
        F.col("n_users_t_post").alias("n_treated_post"),
        F.col("n_users_c_post").alias("n_control_post"),
        F.round(mean["t_pre"], 9).alias("treated_pre"),
        F.round(mean["t_post"], 9).alias("treated_post"),
        F.round(mean["c_pre"], 9).alias("control_pre"),
        F.round(mean["c_post"], 9).alias("control_post"),
        F.round(did, 9).alias("did_estimate"),
    )


# ---------------------------------------------------------------------------
# Wald–Wolfowitz runs test
# ---------------------------------------------------------------------------


def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the daily-revenue direction sequence:
    are up-days and down-days randomly interleaved, or does the series
    trend/mean-revert?  The independence check a forecasting pipeline
    runs before trusting residuals.

    Scale shape: one map-side-combined collapse to the daily relation;
    the direction signs, run boundaries (lag compare), and counts are
    one window pass over days — never raw rows.

    Engine determinism: signs come from exact integer cent comparisons;
    R, n₁, n₂ are integers; the normal approximation is a short
    correctly-rounded chain (two divisions, one sqrt) over identical
    doubles."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        (
            F.year("o_orderdate") * 10000
            + F.month("o_orderdate") * 100
            + F.dayofmonth("o_orderdate")
        ).alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "rev"
        )
    )
    wseq = Window.orderBy("d")
    signs = daily.select(
        "d",
        (F.col("rev") > F.lag("rev").over(wseq)).cast("int").alias("up"),
        F.lag("rev").over(wseq).isNotNull().alias("has_prev"),
    ).filter("has_prev")
    runs = signs.select(
        "up",
        (
            F.col("up")
            != F.coalesce(
                F.lag("up").over(Window.orderBy("d")), F.lit(-1)
            )
        )
        .cast("bigint")
        .alias("new_run"),
    )
    agg = runs.groupBy().agg(
        F.sum("new_run").alias("r"),
        F.sum("up").alias("n1"),
        F.sum(1 - F.col("up")).alias("n2"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    n = n1 + n2
    mu = 2.0 * n1 * n2 / n + 1
    sigma = F.sqrt(
        (2.0 * n1 * n2) * (2.0 * n1 * n2 - n) / (n * n * (n - 1))
    )
    return agg.select(
        r.alias("n_runs"),
        n1.alias("n_up"),
        n2.alias("n_down"),
        F.round(mu, 6).alias("expected_runs"),
        F.round((r - mu) / sigma, 9).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Mann–Kendall trend test
# ---------------------------------------------------------------------------


def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotonic-trend test on monthly revenue: S = Σ
    sign(x_j − x_i) over all ordered month pairs, tie-corrected normal
    approximation — the non-parametric "is this series trending"
    companion to q_theilsen's slope (same pair discipline, sign-only).

    Scale shape: raw rows collapse to the ~|months| relation first; the
    quadratic pair expansion is a broadcast self-join over that bounded
    aggregate (the q_theilsen rule: pairs over aggregates, never rows);
    the tie term re-aggregates the same persisted relation.

    Engine determinism: S and both variance terms are exact integers;
    z is one continuity-corrected subtraction and one division into a
    correctly-rounded sqrt."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias(
                "m"
            )
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("rev")
        )
        # consumed 3x (both pair legs + tie rollup): share the aggregate
        .persist()
    )
    a, b = monthly.alias("a"), F.broadcast(monthly.alias("b"))
    s_stat = (
        a.join(b, F.col("a.m") < F.col("b.m"))
        .select(
            F.signum(
                (F.col("b.rev") - F.col("a.rev")).cast("double")
            ).cast("bigint").alias("sgn")
        )
        .groupBy()
        .agg(F.sum("sgn").alias("s"), F.count(F.lit(1)).alias("n_pairs"))
    )
    ties = (
        monthly.groupBy("rev")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum("t").alias("n"),
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term"),
        )
    )
    j = s_stat.crossJoin(F.broadcast(ties))
    n, s = F.col("n"), F.col("s")
    var = (
        n * (n - 1) * (2 * n + 5) - F.col("tie_term")
    ).cast("double") / 18.0
    z = (
        F.when(s > 0, (s - 1).cast("double") / F.sqrt(var))
        .when(s < 0, (s + 1).cast("double") / F.sqrt(var))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        n.alias("n_months"),
        F.col("n_pairs"),
        s.alias("s_stat"),
        F.round(var, 6).alias("var_s"),
        F.round(z, 9).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Average precision (PR-curve summary)
# ---------------------------------------------------------------------------


def q_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision of the event ``value`` score for predicting
    purchases — the precision-recall companion to q_auc's ROC view
    (AP weights early-rank errors where ROC AUC is prevalence-blind,
    the readout that matters for rare-positive retrieval).

    Tie convention: scores collapse to descending tie groups and every
    positive in a group is credited the precision AT THE GROUP'S END
    (cum_pos/cum_tot over the collapsed relation) — deterministic under
    any row order, no arbitrary within-tie ranking.

    Scale shape: the same collapsed per-score relation and single
    cumulative window as q_auc.  Engine determinism: each group's
    precision is ONE division of exact integers; the pos-weighted terms
    are rounded to 9 dp and decimal-summed; one final division by P."""
    ev = load_table(spark, sf_dir, "events")
    vc = ev.groupBy("value").agg(
        F.sum((F.col("event_type") == AUC_POSITIVE).cast("bigint")).alias(
            "pos"
        ),
        F.count(F.lit(1)).alias("tot"),
    )
    wincl = Window.orderBy(F.col("value").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    terms = vc.select(
        "pos",
        F.sum("pos").over(wincl).alias("cum_pos"),
        F.sum("tot").over(wincl).alias("cum_tot"),
    ).select(
        "pos",
        F.round(
            F.col("pos")
            * (F.col("cum_pos").cast("double") / F.col("cum_tot")),
            9,
        )
        .cast("decimal(28,9)")
        .alias("term"),
    )
    return terms.groupBy().agg(
        F.sum("pos").alias("n_pos"),
        F.round(
            F.sum("term").cast("double") / F.sum("pos"), 9
        ).alias("avg_precision"),
    )


# ---------------------------------------------------------------------------
# Wasserstein-1 (earth mover's) distance
# ---------------------------------------------------------------------------

W1_SEGMENTS = ("BUILDING", "HOUSEHOLD")


def q_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D Wasserstein-1 distance between two segments' balance
    distributions: ∫|F₁−F₂| dv over the value axis — the "how much work
    to morph one distribution into the other" drift metric that sees
    magnitude where KS (q_ks_test) sees only the worst point and PSI
    (q_psi) needs binning.

    Scale shape: the populations collapse to per-(cent-value) counts
    (map-side combined, distinct-value-sized); the two CDFs and the
    next-value gap are one window pass over that collapsed relation.

    Engine determinism: each segment term |F₁−F₂|·Δv is the exact
    integer |c1cum·n₂ − c2cum·n₁| times an exact integer cent gap,
    accumulated as decimal(38,0) (overflow-safe past sf1 where the
    bigint form would wrap); ONE final division by n₁·n₂."""
    a, b = W1_SEGMENTS
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(a, b)
    )
    vc = cust.groupBy(
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("v")
    ).agg(
        F.sum((F.col("c_mktsegment") == a).cast("bigint")).alias("c1"),
        F.sum((F.col("c_mktsegment") == b).cast("bigint")).alias("c2"),
    )
    wcum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    wseq = Window.orderBy("v")
    staged = vc.select(
        "v",
        F.sum("c1").over(wcum).alias("f1"),
        F.sum("c2").over(wcum).alias("f2"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"),
        (F.lead("v").over(wseq) - F.col("v")).alias("dv"),
    ).filter(F.col("dv").isNotNull())
    term = (
        F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))
        .cast("decimal(38,0)")
        * F.col("dv")
    )
    return staged.groupBy("n1", "n2").agg(
        F.round(
            F.sum(term).cast("double")
            / (F.col("n1") * F.col("n2"))
            / 100.0,
            6,
        ).alias("w1_dollars")
    )


# ---------------------------------------------------------------------------
# Herfindahl–Hirschman concentration index
# ---------------------------------------------------------------------------


def q_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration audit: the Herfindahl–Hirschman index of
    supplier revenue shares within each nation — HHI = Σ shareᵢ²,
    the antitrust-style "is this market dominated by few players"
    readout that complements q_gini's inequality curve.

    Scale shape: revenue collapses to the per-(nation, supplier) cent
    relation (one map-side-combined shuffle); the share-square identity
    Σ(sᵢ/S)² = (Σ sᵢ²)/S² needs only per-nation sums — no per-row
    share division ever happens.

    Engine determinism: revenue terms follow the repo's decimal(18,4)
    cast-before-sum rule; sᵢ becomes an exact decimal(19,0) integer in
    10⁻⁴ units whose square is decimal(38,0) — legal width in BOTH
    engines and exact past sf1 (a bigint square overflows there).  HHI
    is ONE division of the two exact totals (shares cancel units)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.join(
            F.broadcast(supp.select("s_suppkey", "s_nationkey")),
            li["l_suppkey"] == supp["s_suppkey"],
        )
        .groupBy(
            F.col("s_nationkey").alias("nation"),
            F.col("l_suppkey").alias("supp"),
        )
        .agg(
            (
                F.sum(
                    (
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                )
                * 10000
            )
            .cast("decimal(19,0)")
            .alias("s_i")
        )
    )
    return rev.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(
            (F.sum(F.col("s_i") * F.col("s_i"))).cast("double")
            / (F.sum("s_i").cast("double") * F.sum("s_i").cast("double")),
            9,
        ).alias("hhi"),
    )


# ---------------------------------------------------------------------------
# Cohen's d effect size
# ---------------------------------------------------------------------------


def q_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d between the two Mann–Whitney segments' balances: the
    standardized mean difference (pooled-SD denominator) — the effect
    SIZE companion to the significance tests (q_mannwhitney / q_anova
    say "different"; d says "by how much, in SD units").

    Scale shape: one map-side-combined pass to per-group (n, Σx, Σx²)
    in exact cents; everything after is scalar arithmetic on 6 numbers.

    Engine determinism: means and the pooled variance come from the
    computational identity Σx² − (Σx)²/n with one division per term
    (squares as double products of exact ints — identical both
    engines); d is a short correctly-rounded chain ending in one
    division by a sqrt."""
    a, b = MW_SEGMENTS
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(a, b)
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    # ADVICE r9 (q_welch_ttest class): Σcents² as decimal(38,0), not
    # BIGINT — silent wrap around sf~300 vs DuckDB's HUGEINT.
    g = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("s"),
        F.sum((cents * cents).cast("decimal(38,0)")).alias("q"),
    )
    wide = g.groupBy().agg(
        *[
            F.sum(
                F.when(F.col("c_mktsegment") == seg, F.col(c))
            ).alias(f"{c}{i}")
            for i, seg in ((1, a), (2, b))
            for c in ("n", "s", "q")
        ]
    )
    n1, s1, q1 = F.col("n1"), F.col("s1"), F.col("q1")
    n2, s2, q2 = F.col("n2"), F.col("s2"), F.col("q2")
    ss1 = q1.cast("double") - s1.cast("double") * s1 / n1
    ss2 = q2.cast("double") - s2.cast("double") * s2 / n2
    pooled_sd = F.sqrt((ss1 + ss2) / (n1 + n2 - 2))
    d = (s1.cast("double") / n1 - s2.cast("double") / n2) / pooled_sd
    return wide.select(
        n1.alias("n_a"),
        n2.alias("n_b"),
        F.round(s1.cast("double") / n1 / 100.0, 6).alias("mean_a"),
        F.round(s2.cast("double") / n2 / 100.0, 6).alias("mean_b"),
        F.round(d, 9).alias("cohens_d"),
    )


# ---------------------------------------------------------------------------
# Simpson's-paradox detector
# ---------------------------------------------------------------------------

SIMPSON_STRATA_MOD = 3  # user_id % 3 strata


def q_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit of the A/B readout: the variant
    conversion-rate difference computed overall AND within each
    user-id stratum, flagging strata whose sign disagrees with the
    aggregate — the classic confounding trap every experiment review
    checks before trusting q_ab_test's pooled number.

    Scale shape: one map-side-combined collapse to per-(stratum,
    variant) conversion counts (strata × 2 rows); the overall row is a
    second rollup of that tiny relation, unioned in.

    Engine determinism: every rate is ONE division of exact integers;
    the sign comparison cross-multiplies integer counts — no float
    decides the flag."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("int"))
            > F.sum((F.col("event_type") == "error").cast("int"))
        )
        .cast("int")
        .alias("conv")
    )
    cells = per_user.groupBy(
        (F.col("user_id") % SIMPSON_STRATA_MOD).cast("int").alias(
            "stratum"
        ),
        (F.col("user_id") % 2).cast("int").alias("variant"),
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("conv").alias("c"))
    wide = cells.groupBy("stratum").agg(
        F.sum(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.sum(F.when(F.col("variant") == 0, F.col("c"))).alias("c0"),
        F.sum(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.sum(F.when(F.col("variant") == 1, F.col("c"))).alias("c1"),
    )
    overall = wide.groupBy().agg(
        F.lit(-1).alias("stratum"),
        F.sum("n0").alias("n0"),
        F.sum("c0").alias("c0"),
        F.sum("n1").alias("n1"),
        F.sum("c1").alias("c1"),
    ).select("stratum", "n0", "c0", "n1", "c1")
    both = wide.select("stratum", "n0", "c0", "n1", "c1").unionAll(overall)
    # integer cross-multiplied sign of (c1/n1 - c0/n0)
    sign = F.signum(
        (F.col("c1") * F.col("n0") - F.col("c0") * F.col("n1")).cast(
            "double"
        )
    ).cast("int")
    return both.select(
        "stratum",
        "n0",
        "c0",
        "n1",
        "c1",
        F.round(F.col("c0").cast("double") / F.col("n0"), 6).alias(
            "rate0"
        ),
        F.round(F.col("c1").cast("double") / F.col("n1"), 6).alias(
            "rate1"
        ),
        sign.alias("diff_sign"),
    )


# ---------------------------------------------------------------------------
# Theil inequality decomposition
# ---------------------------------------------------------------------------


def q_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality of customer spend, decomposed into within-
    nation and between-nation components (T = T_within + T_between up
    to the 9-dp term quantization) — the decomposable inequality index
    q_gini cannot give (Gini does not additively split by subgroup).

    Scale shape: spend collapses to the per-customer cent relation,
    national totals to a |nations| relation broadcast back; each row
    contributes one ln term.  Everything after the first aggregate is
    customer-sized, then nation-sized.

    Engine determinism: each (xᵢ/x̄)·ln(xᵢ/x̄) term is a short
    correctly-rounded chain over identical doubles, rounded to 9 dp and
    decimal-summed per the transcendental-term rule; the final scalars
    are single divisions."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    spend = (
        orders.groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("x")
        )
        .join(
            F.broadcast(cust),
            F.col("cust") == F.col("c_custkey"),
        )
        .select("cust", F.col("c_nationkey").alias("nation"), "x")
    )
    tot = spend.groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    with_tot = spend.crossJoin(F.broadcast(tot))
    ratio = F.col("x") * F.col("n") / F.col("s").cast("double")
    term = F.round(ratio * F.log(ratio), 9).cast("decimal(28,9)")
    t_total = with_tot.select(term.alias("t"), "n").groupBy("n").agg(
        F.sum("t").alias("sum_t")
    )
    per_nation = spend.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("x").alias("s_g")
    )
    nat_tot = per_nation.crossJoin(F.broadcast(tot))
    gratio = (
        F.col("s_g").cast("double")
        / F.col("s")
        * F.col("n")
        / F.col("n_g")
    )
    gterm = F.round(
        F.col("s_g").cast("double") / F.col("s") * F.log(gratio), 9
    ).cast("decimal(28,9)")
    t_between = nat_tot.select(gterm.alias("g")).groupBy().agg(
        F.sum("g").alias("sum_g")
    )
    return (
        t_total.crossJoin(F.broadcast(t_between))
        .select(
            "n",
            F.round(F.col("sum_t").cast("double") / F.col("n"), 9).alias(
                "theil_total"
            ),
            F.col("sum_g").cast("double").alias("theil_between"),
        )
        .select(
            F.col("n").alias("n_customers"),
            "theil_total",
            F.round("theil_between", 9).alias("theil_between"),
            F.round(
                F.col("theil_total") - F.col("theil_between"), 9
            ).alias("theil_within"),
        )
    )


WELCH_SEGMENTS = ("HOUSEHOLD", "MACHINERY")


def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two customer segments'
    balances — the significance companion the stats family was missing
    (q_anova assumes equal variances, q_mannwhitney is rank-based,
    q_cohens_d is the effect size): t plus the Welch–Satterthwaite
    degrees of freedom.

    Scale shape: one map-side-combined pass to per-group (n, Σx, Σx²)
    in exact cents; everything after is scalar arithmetic on 6 numbers.
    Engine determinism: the computational identity Σx² − (Σx)²/n on
    exact ints, then a short correctly-rounded chain (the q_cohens_d
    contract)."""
    a, b = WELCH_SEGMENTS
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(a, b)
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    # ADVICE r9: sum the squared term as decimal(38,0) — a BIGINT sum of
    # cents² (~3e16·sf) wraps silently around sf~300 while the DuckDB
    # oracle accumulates HUGEINT (the q_stump overflow class).  The
    # per-row product still fits bigint (≤~1e13); only the SUM widens.
    g = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("s"),
        F.sum((cents * cents).cast("decimal(38,0)")).alias("q"),
    )
    wide = g.groupBy().agg(
        *[
            F.sum(
                F.when(F.col("c_mktsegment") == seg, F.col(c))
            ).alias(f"{c}{i}")
            for i, seg in ((1, a), (2, b))
            for c in ("n", "s", "q")
        ]
    )
    n1, s1, q1 = F.col("n1"), F.col("s1"), F.col("q1")
    n2, s2, q2 = F.col("n2"), F.col("s2"), F.col("q2")
    v1 = (q1.cast("double") - s1.cast("double") * s1 / n1) / (n1 - 1)
    v2 = (q2.cast("double") - s2.cast("double") * s2 / n2) / (n2 - 1)
    se1 = v1 / n1
    se2 = v2 / n2
    t = (s1.cast("double") / n1 - s2.cast("double") / n2) / F.sqrt(
        se1 + se2
    )
    df = (se1 + se2) * (se1 + se2) / (
        se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)
    )
    return wide.select(
        n1.alias("n_a"),
        n2.alias("n_b"),
        F.round(s1.cast("double") / n1 / 100.0, 6).alias("mean_a"),
        F.round(s2.cast("double") / n2 / 100.0, 6).alias("mean_b"),
        F.round(t, 9).alias("t_welch"),
        F.round(df, 4).alias("df_welch"),
    )


XCORR_PRIORITIES = ("1-URGENT", "5-LOW")
XCORR_MAX_LAG = 7


def q_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead–lag cross-correlation between two order-priority daily
    revenue series: Pearson r of (urgent_t, low_{t+lag}) for every lag
    in ±XCORR_MAX_LAG — does one stream lead the other?  The
    time-series family's bivariate companion to q_autocorr.

    Scale shape: the fact collapses to ONE daily two-column relation
    (map-side combined, |days| rows); the lag alignment is a bounded
    ×(2L+1) explode of that day relation joined back to itself on the
    shifted day — never a fact-side shuffle.  Engine determinism: both
    series are exact cent integers; the five co-moment sums per lag are
    exact (DECIMAL(38,0) for the products — a bigint cent product
    crosses 2^63 at scale, the q_stump overflow lesson), each cast to
    double ONCE (identical rounding of identical exact decimals), then
    a short correctly-rounded chain per lag."""
    p1, p2 = XCORR_PRIORITIES
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin(p1, p2)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    daily = orders.groupBy(
        F.datediff(
            F.col("o_orderdate"), F.lit("1992-01-01").cast("date")
        ).alias("day")
    ).agg(
        F.coalesce(
            F.sum(F.when(F.col("o_orderpriority") == p1, cents)),
            F.lit(0),
        ).alias("x"),
        F.coalesce(
            F.sum(F.when(F.col("o_orderpriority") == p2, cents)),
            F.lit(0),
        ).alias("y"),
    )
    # ADVICE r9: persist — `daily` is read by BOTH the lag explode and
    # the shifted leg, and Spark 4 does not reuse exchanges across
    # duplicated subtrees (CLAUDE.md q_top_supplier lesson); without the
    # cache the orders scan+aggregate executes twice.  |days|-sized, so
    # the cache is tiny; truly lazy (persist, never lazy checkpoint).
    daily = daily.persist()
    # the day relation is small (|days| rows): broadcast both legs of
    # the lag alignment; the ×(2L+1) explode stays bounded
    lags = daily.select(
        "day",
        "x",
        F.explode(
            F.sequence(
                F.lit(-XCORR_MAX_LAG), F.lit(XCORR_MAX_LAG)
            )
        ).alias("lag"),
    )
    shifted = daily.select(
        F.col("day").alias("day2"), F.col("y").alias("y2")
    )
    aligned = lags.join(
        F.broadcast(shifted),
        F.col("day") + F.col("lag") == F.col("day2"),
    )
    # cast operands BEFORE multiplying (the q_stump overflow lesson:
    # a bigint cent product crosses 2^63 around 1e10 daily cents)
    dx = F.col("x").cast("decimal(19,0)")
    dy = F.col("y2").cast("decimal(19,0)")
    sums = aligned.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).alias("sx"),
        F.sum(dy).alias("sy"),
        F.sum(dx * dy).alias("sxy"),
        F.sum(dx * dx).alias("sxx"),
        F.sum(dy * dy).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    cov = F.col("sxy").cast("double") - sx * sy / n
    vx = F.col("sxx").cast("double") - sx * sx / n
    vy = F.col("syy").cast("double") - sy * sy / n
    return sums.select(
        "lag",
        F.col("n").alias("n_days"),
        F.round(cov / F.sqrt(vx * vy), 6).alias("r"),
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction interval calibration
# ---------------------------------------------------------------------------

# 1 - alpha target coverage; k = ceil((n_cal + 1) * (1 - alpha)) kept in
# EXACT integer arithmetic (P*(n+1) + Q-1) div Q — (n+1)*0.9 in binary is
# inexact and its ceil can disagree across engines at exact multiples.
# P/Q are DERIVED from CONFORMAL_ALPHA (ADVICE r10: the old hand-inlined
# 9/10 made the constant a no-op tunable) and interpolated into BOTH the
# Spark expr and the registry's DuckDB oracle SQL.
CONFORMAL_ALPHA = 0.1
_CONF_COV = _Fraction(1) - _Fraction(CONFORMAL_ALPHA).limit_denominator(10_000)
CONFORMAL_COV_NUM = _CONF_COV.numerator
CONFORMAL_COV_DEN = _CONF_COV.denominator
# the exact integer-ceil rank identity both engines evaluate
CONFORMAL_K_RANK_EXPR = (
    f"({CONFORMAL_COV_NUM} * (n_cal + 1) + {CONFORMAL_COV_DEN - 1})"
    f" {{div}} {CONFORMAL_COV_DEN}"
)


def q_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal calibration of a per-priority mean-price model:
    train/calibrate/test on an o_orderkey mod-3 split, q_hat = the
    ceil((n_cal+1)(1-alpha))-th smallest absolute residual on the
    calibration split, then the empirical coverage of the interval
    mean ± q_hat on the held-out test split — the distribution-free
    uncertainty readout a model-scoring pipeline attaches to any point
    model.

    Scale shape: the model is a 5-row broadcast (per-priority decimal
    mean); residuals are INTEGER cents against the ROUNDED mean, so the
    exact order statistic collapses to per-distinct-residual counts +
    one cumulative window over that value-sized relation (the q_auc /
    q_ks_test shape) — never a global row sort, never a top-k of 0.1·n
    rows through the driver.

    Engine determinism: everything up to q_hat is exact integer
    arithmetic (cents, counts, the integer ceil identity); coverage is
    one exact-int division."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    base = orders.select(
        (F.col("o_orderkey") % 3).alias("split"),
        F.col("o_orderpriority").alias("prio"),
        cents.alias("cents"),
        "o_orderkey",
    )
    # per-priority mean on the TRAIN split, rounded to integer cents —
    # widen the sum (CLAUDE.md overflow class) and round explicitly
    # (Spark int cast truncates, DuckDB's rounds)
    mu = (
        base.filter(F.col("split") == 0)
        .groupBy("prio")
        .agg(
            F.round(
                F.sum(F.col("cents").cast("decimal(28,0)")).cast("double")
                / F.count(F.lit(1))
            )
            .cast("bigint")
            .alias("mu_cents")
        )
        # persist the 5-row model: the cal and test legs each re-execute
        # scored's lineage (Spark 4 reuses no exchanges across duplicated
        # subtrees), and without the cache the TRAIN scan runs twice —
        # 3 fact scans (train/cal/test), not 4 (plan-guarded)
        .persist()
    )
    scored = base.filter(F.col("split") != 0).join(
        F.broadcast(mu), "prio"
    )
    s_col = F.abs(F.col("cents") - F.col("mu_cents"))
    cal = scored.filter(F.col("split") == 1).select(s_col.alias("s"))
    # exact k-th smallest via the collapsed distinct-residual relation
    sc = cal.groupBy("s").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy("s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    ranked = sc.select(
        "s",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(wall).alias("n_cal"),
    )
    k = F.expr(CONFORMAL_K_RANK_EXPR.format(div="div"))
    qhat = (
        ranked.filter(F.col("cum") >= k)
        .groupBy("n_cal")
        .agg(F.min("s").alias("q_hat"))
        .select("n_cal", k.alias("k_rank"), "q_hat")
    )
    test = scored.filter(F.col("split") == 2).select(
        s_col.alias("s_t")
    )
    cov = test.crossJoin(F.broadcast(qhat)).groupBy(
        "n_cal", "k_rank", "q_hat"
    ).agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum(
            (F.col("s_t") <= F.col("q_hat")).cast("bigint")
        ).alias("n_covered"),
    )
    return cov.select(
        "n_cal",
        "n_test",
        "k_rank",
        "q_hat",
        "n_covered",
        F.round(
            F.col("n_covered").cast("double") / F.col("n_test"), 6
        ).alias("coverage"),
    )
