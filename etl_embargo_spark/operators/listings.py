"""Listing-scan and scalar-surface queries (SURVEY S1/S2, P1/P3/P7, F1-F9).

The "archive listing" role is played by ``orders`` (o_orderdate as the date
prefix) and the filename surface is constructed from fact columns with the
reference's own grammar (FIXTURES.md §5), so every scalar function is
exercised on realistic names while staying DuckDB-oracle-checkable.

Scale notes: every query here is scan → project/filter — no shuffle except
the explicit ORDER BY in q_limit.  Filters are plain column predicates, so
they push down to the parquet scan (PushedFilters in the physical plan), and
only referenced columns are read (ReadSchema pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_embargo_spark.catalog import load_table
from etl_embargo_spark.functions.filenames import (
    basename,
    date_as_int,
    date_path,
    embargo_rename,
    filename_date,
    filename_local_ip,
    one_year_before,
    parse_date_int,
)


def _archive_names(df: DataFrame) -> DataFrame:
    """Derive reference-grammar object names from order rows:
    ``sidestream/yyyy/mm/dd/<yyyymmdd>T000000Z-mlab1-site<k>-sidestream-<seq>.tgz``
    (grammar: /root/reference/embargo.go:227, prefix embargo.go:266)."""
    d8 = F.date_format("o_orderdate", "yyyyMMdd")
    name = F.concat(
        d8,
        F.lit("T000000Z-mlab1-site"),
        (F.col("o_custkey") % 10).cast("string"),
        F.lit("-sidestream-"),
        F.lpad((F.col("o_orderkey") % 10000).cast("string"), 4, "0"),
        F.lit(".tgz"),
    )
    return df.select(
        "o_orderkey",
        date_path(d8).alias("prefix"),
        name.alias("name"),
    )


def q_prefix_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 — prefix-pruned listing: one month's worth of archives.

    The reference's ``Objects.List(...).Prefix("sidestream/yyyy/mm/dd")``
    (/root/reference/embargo.go:265-267); as a column predicate this is a
    pushed-down range filter, and on a date-partitioned layout it becomes
    partition pruning (no data read at all outside the prefix).
    """
    orders = load_table(spark, sf_dir, "orders")
    named = _archive_names(orders)
    return named.filter(F.col("prefix").startswith("sidestream/1995/03")).select(
        "o_orderkey", "prefix", "name"
    )


def q_suffix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — name-substring filter: ``Contains(name,"tgz") &&
    Contains(name,"sidestream")`` (/root/reference/embargo.go:279-281)."""
    orders = load_table(spark, sf_dir, "orders")
    named = _archive_names(orders)
    return named.filter(
        F.col("name").contains("tgz")
        & F.col("name").contains("sidestream")
        & F.col("name").contains("site7")
    ).select("o_orderkey", "name")


def q_date_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — ``dateInteger < cutoff`` (/root/reference/embargo.go:272-277)."""
    orders = load_table(spark, sf_dir, "orders")
    di = date_as_int("o_orderdate")
    return orders.select(
        "o_orderkey", di.alias("date_int")
    ).filter(F.col("date_int") < 19960101)


def q_range_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — validity range ``20160000 < d <= 21000000``
    (/root/reference/unembargo.go:145-147), on this data's year span."""
    orders = load_table(spark, sf_dir, "orders")
    di = date_as_int("o_orderdate")
    return orders.select("o_orderkey", di.alias("date_int")).filter(
        (F.col("date_int") > 19960000) & (F.col("date_int") <= 19990000)
    )


def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 — pagination analog: deterministic chunk = ORDER BY key LIMIT n
    (reference pageToken loop /root/reference/unembargo.go:61-80)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderkey", "o_orderdate").orderBy("o_orderkey").limit(100)


def q_filename_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2 — build sidestream test filenames and parse back date + local
    IP (grammar /root/reference/embargo_check.go:102; parser
    filename_parser.go:17-33).  Every third row gets the old `_ALL0` format
    which must parse to an empty IP (guard filename_parser.go:20-22)."""
    li = load_table(spark, sf_dir, "lineitem")
    d8 = F.date_format("l_shipdate", "yyyyMMdd")
    ip = F.concat_ws(
        ".",
        (F.col("l_suppkey") % 256).cast("string"),
        (F.col("l_partkey") % 256).cast("string"),
        (F.col("l_orderkey") % 256).cast("string"),
        (F.col("l_linenumber") % 256).cast("string"),
    )
    name = F.when(
        F.col("l_orderkey") % 3 == 0,
        F.concat(d8, F.lit("T00:00:00Z_ALL0.web100")),
    ).otherwise(
        F.concat(
            d8,
            F.lit("T00:00:00Z_"),
            ip,
            F.lit("_"),
            F.col("l_linenumber").cast("string"),
            F.lit(".web100"),
        )
    )
    named = li.select("l_orderkey", "l_linenumber", name.alias("name"))
    return named.select(
        "l_orderkey",
        "l_linenumber",
        "name",
        filename_date("name").alias("date8"),
        filename_local_ip("name").alias("local_ip"),
    )


def q_basename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F7 — date-path construction + last path component
    (/root/reference/embargo.go:161,266)."""
    orders = load_table(spark, sf_dir, "orders")
    named = _archive_names(orders)
    full = named.select(
        "o_orderkey",
        F.concat_ws("/", "prefix", "name").alias("path"),
    )
    return full.select(
        "o_orderkey", "path", basename("path").alias("base")
    )


def q_date_as_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F9 — FormatDateAsInt + string→int parse round-trip
    (/root/reference/embargo_check.go:24-26, embargo.go:272-276)."""
    orders = load_table(spark, sf_dir, "orders")
    d8 = F.date_format("o_orderdate", "yyyyMMdd")
    return orders.select(
        "o_orderkey",
        date_as_int("o_orderdate").alias("date_int"),
        parse_date_int(d8).alias("parsed_int"),
    )


def q_rename_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — embargo output rename ``.tgz`` → ``-e.tgz``
    (/root/reference/embargo.go:105)."""
    orders = load_table(spark, sf_dir, "orders")
    named = _archive_names(orders)
    return named.select(
        "o_orderkey", "name", embargo_rename("name").alias("embargo_name")
    )


def q_date_add_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 — the one-year cutoff: date minus 12 months with end-of-month
    clamping, exposed as yyyymmdd ints exactly as the reference does
    (``FormatDateAsInt(now - 1y)``, /root/reference/embargo.go:313)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        date_as_int("o_orderdate").alias("order_int"),
        date_as_int(one_year_before("o_orderdate")).alias("cutoff_int"),
    )


def q_json_sites(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/F10/P5/P6/A1 — the whitelist-refresh pipeline: JSON site records →
    parse → drop 'samknows' hosts → unpivot non-empty ipv4/ipv6 → distinct
    (/root/reference/embargo_check.go:39-60).

    JSON strings are constructed from supplier rows (every third supplier is
    a 'samknows' host; ipv6 empty for even keys), parsed with ``from_json``
    — the actual reference flow — then filtered and unpivoted with
    ``explode``; the oracle recomputes the same result relationally.
    """
    sup = load_table(spark, sf_dir, "supplier")
    hostname = F.when(
        F.col("s_suppkey") % 3 == 0,
        F.concat(F.lit("mlab"), (F.col("s_suppkey") % 4).cast("string"),
                 F.lit(".samknows.site"), F.col("s_nationkey").cast("string"),
                 F.lit(".example.org")),
    ).otherwise(
        F.concat(F.lit("mlab"), (F.col("s_suppkey") % 4).cast("string"),
                 F.lit(".site"), F.col("s_nationkey").cast("string"),
                 F.lit(".example.org")),
    )
    ipv4 = F.concat_ws(
        ".",
        F.lit("10"),
        (F.col("s_suppkey") % 256).cast("string"),
        (F.col("s_nationkey") % 256).cast("string"),
        F.lit("1"),
    )
    ipv6 = F.when(F.col("s_suppkey") % 2 == 0, F.lit("")).otherwise(
        F.concat(F.lit("2001:db8::"), F.col("s_suppkey").cast("string"))
    )
    json_str = F.to_json(F.struct(
        hostname.alias("hostname"), ipv4.alias("ipv4"), ipv6.alias("ipv6")
    ))
    sites = sup.select(
        F.from_json(
            json_str, "hostname string, ipv4 string, ipv6 string"
        ).alias("site")
    ).select("site.*")
    kept = sites.filter(~F.col("hostname").contains("samknows"))
    ips = kept.select(
        F.explode(F.array("ipv4", "ipv6")).alias("ip")
    ).filter(F.col("ip") != "")
    return ips.distinct()


# ---------------------------------------------------------------------------
# Compaction planning (round 3): the small-files problem, as a query
# ---------------------------------------------------------------------------

COMPACT_TARGET_BYTES = 64_000_000  # target compacted object size


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan per date prefix: greedy next-fit binning
    of each day's archives into ~COMPACT_TARGET_BYTES outputs.

    At 100 TB the archive store accumulates thousands of small daily
    objects per prefix (the reference writes one .tgz per upload,
    /root/reference/embargo.go:227); every engine pass then pays
    per-object open/list overhead.  The fix is periodic compaction, and
    the PLAN for it is itself a query: within each prefix, order files by
    name and cut a new bin whenever the running size crosses the target
    — bin id = floor(exclusive-prefix-sum / target), one partitioned
    window over (prefix), no global sort, no driver loop.  Deterministic
    integer math end to end → DuckDB oracle.

    Offset binning (not first-fit-decreasing bin packing) on purpose: it
    preserves the name order = time order inside each compacted object
    (sequential date-range reads after compaction), is a single window
    expression rather than a sequential packing loop, and overshoots the
    target by at most one file per bin.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    files = _archive_names(orders).join(
        orders.select(
            "o_orderkey",
            # deterministic byte-size stand-in: price in cents.  Explicit
            # round BEFORE the cast: Spark's double->bigint cast
            # truncates while DuckDB's rounds, and 112946.26*100 lands a
            # hair below the integer
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("bytes"),
        ),
        "o_orderkey",
    )
    w = (
        Window.partitionBy("prefix")
        .orderBy("name", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = files.select(
        "prefix",
        "name",
        "bytes",
        (
            F.coalesce(F.sum("bytes").over(w), F.lit(0))
            / COMPACT_TARGET_BYTES
        ).cast("bigint").alias("bin_id"),
    )
    return planned.groupBy("prefix", "bin_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("total_bytes"),
        F.min("name").alias("first_name"),
        F.max("name").alias("last_name"),
    )
