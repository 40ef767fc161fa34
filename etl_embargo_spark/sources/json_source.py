"""S5/F10 — JSON site-record source and the whitelist-derivation pipeline.

Reference: ``LoadFromURL`` + ``FilterSiteIPs``
/root/reference/embargo_check.go:39-81 — fetch a JSON array of
``{hostname, ipv4, ipv6}``, drop 'samknows' hosts (P5), keep non-empty IPs
(P6), dedup into the whitelist set (A1).

The HTTP fetch is a driver-side concern (the reference's http.Get); the
engine-side contract is: given the JSON bytes/file, produce the whitelist
DataFrame.  Schema is explicit — never inferred (SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType, StructField, StringType

SITE_SCHEMA = StructType(
    [
        StructField("hostname", StringType()),
        StructField("ipv4", StringType()),
        StructField("ipv6", StringType()),
    ]
)


def read_sites_json(spark: SparkSession, path: str) -> DataFrame:
    """Load a JSON array (or JSON-lines) of site records with the explicit
    3-string schema (/root/reference/embargo_check.go:29-33)."""
    return (
        spark.read.schema(SITE_SCHEMA)
        .option("multiLine", "true")
        .json(path)
    )


def sites_json_from_string(spark: SparkSession, payload: str) -> DataFrame:
    """Parse an in-memory JSON array payload (the reference's URL-fetch body)
    into site rows via ``from_json`` — no temp files, no inference."""
    df = spark.createDataFrame([(payload,)], "payload string")
    parsed = df.select(
        F.explode(
            F.from_json(
                "payload",
                f"array<struct<hostname:string,ipv4:string,ipv6:string>>",
            )
        ).alias("site")
    )
    return parsed.select("site.*")


def whitelist_from_sites(sites: DataFrame) -> DataFrame:
    """FilterSiteIPs: drop samknows hosts, unpivot non-empty ipv4/ipv6,
    distinct → ``DataFrame[ip: string]`` (embargo_check.go:39-60)."""
    kept = sites.filter(
        ~F.coalesce(F.col("hostname"), F.lit("")).contains("samknows")
    )
    ips = kept.select(F.explode(F.array("ipv4", "ipv6")).alias("ip"))
    return ips.filter(F.col("ip").isNotNull() & (F.col("ip") != "")).distinct()
