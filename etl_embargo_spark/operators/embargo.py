"""The embargo classifier — the reference's core business rule (SURVEY P3/P4,
J1/J2, F5).

Reference rule, /root/reference/embargo.go:174::

    if moreThanOneYear || !strings.Contains(basename, "web100")
                       || embargoCheck.CheckInWhiteList(basename) {
        → public
    } else {
        → embargoed
    }

i.e. public ⇔ (archive date before the one-year cutoff) ∨ (not an
embargo-eligible record category) ∨ (source IP in the whitelist).  The
whitelist probe is a build-side hash set in the reference
(/root/reference/embargo_check.go:39-60 build, 105-110 probe) — exactly a
broadcast hash join, which is how it is expressed here: the dim side is
``broadcast()``-hinted, so at 100 TB the fact scan never shuffles; the
classifier is a map-side flag + ``when()`` projection, one stage end-to-end.

Mapping onto the driver's synthetic tables (FIXTURES.md §5): ``lineitem`` is
the per-record fact (the tar entries), ``l_shipdate`` the record date,
``l_returnflag = 'R'`` the embargo-eligible category (the ``web100`` suffix
analog), and the whitelist is the supplier-key subset with
``s_nationkey < WHITELIST_NATION_CUTOFF``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_embargo_spark.catalog import load_table
from etl_embargo_spark.functions.filenames import date_as_int

# Deterministic stand-ins for "now - 1 year" (embargo.go:313) and the
# whitelist membership rule, fixed so the DuckDB oracle is reproducible.
DEFAULT_CUTOFF_INT = 19970101
WHITELIST_NATION_CUTOFF = 13
EMBARGO_CATEGORY = "R"  # l_returnflag analog of the "web100" suffix term


def whitelist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 — the allowlist dim: distinct supplier keys from allowed nations.

    The reference builds this as ``map[string]struct{}`` from 3,473 IPs
    (/root/reference/embargo_check.go:19-21); at any scale a few thousand
    keys is broadcast territory.
    """
    sup = load_table(spark, sf_dir, "supplier")
    return (
        sup.filter(F.col("s_nationkey") < WHITELIST_NATION_CUTOFF)
        .select(F.col("s_suppkey").alias("wl_key"))
        .distinct()
    )


def with_visibility(
    fact: DataFrame,
    wl: DataFrame,
    cutoff_int: int = DEFAULT_CUTOFF_INT,
) -> DataFrame:
    """P4 — annotate each fact row with ``visibility`` ∈ {public, private}.

    Broadcast LEFT join (not semi) because the predicate needs membership as
    a *flag* feeding the OR — one broadcast stage, no shuffle of the fact
    side, survives any fact-table scale as long as the dim stays broadcastable.
    """
    flagged = fact.join(
        F.broadcast(wl), fact["l_suppkey"] == wl["wl_key"], "left"
    )
    date_int = date_as_int("l_shipdate")
    is_public = (
        (date_int < F.lit(cutoff_int))
        | (F.col("l_returnflag") != F.lit(EMBARGO_CATEGORY))
        | F.col("wl_key").isNotNull()
    )
    return flagged.select(
        "l_orderkey",
        "l_linenumber",
        date_int.alias("date_int"),
        F.when(is_public, F.lit("public")).otherwise(F.lit("private")).alias(
            "visibility"
        ),
    )


def split_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query ``q_split_partition`` — the full classifier over the
    fact table (SURVEY §7 phase 0)."""
    fact = load_table(spark, sf_dir, "lineitem")
    return with_visibility(fact, whitelist(spark, sf_dir))


def whitelist_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 ``q_whitelist_semi`` — fact rows whose key IS in the allowlist.

    Reference probe: ``CheckInWhiteList`` /root/reference/embargo_check.go:105-110.
    Broadcast left-semi join: map-side filter, zero shuffle of the fact.
    """
    fact = load_table(spark, sf_dir, "lineitem")
    wl = whitelist(spark, sf_dir)
    return fact.join(
        F.broadcast(wl), fact["l_suppkey"] == wl["wl_key"], "left_semi"
    ).select("l_orderkey", "l_linenumber", "l_suppkey")


def embargo_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 ``q_embargo_anti`` — fact rows whose key is NOT in the allowlist
    (the embargoed set, /root/reference/embargo.go:187-200 else-branch).
    Broadcast left-anti join."""
    fact = load_table(spark, sf_dir, "lineitem")
    wl = whitelist(spark, sf_dir)
    return fact.join(
        F.broadcast(wl), fact["l_suppkey"] == wl["wl_key"], "left_anti"
    ).select("l_orderkey", "l_linenumber", "l_suppkey")
