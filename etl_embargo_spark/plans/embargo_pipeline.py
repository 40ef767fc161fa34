"""E1/E2/E3 — the reference's three entry points as DataFrame pipelines.

E1 (embargo a day, /root/reference/deploy/deploy.go:23-71 →
embargo.go:248-293): archives → explode entries → classify → routed write.
One job: scan/explode stage + shuffle-free broadcast-join projection + write.

E2 (unembargo/publish, unembargo.go:86-140): last-writer-wins merge of the
newly-aged-out private records into the public listing.

E3 (whitelist refresh, embargo_check.go:39-81): re-derive + re-broadcast the
dim each batch — deliberately NOT the reference's stale-singleton behavior
(embargo.go:55-57), which only refreshed on instance recycling (SURVEY §3 E3
flags it as a quirk not to replicate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_embargo_spark.functions.filenames import (
    embargo_rename,
    filename_local_ip,
    parse_date_int,
)
from etl_embargo_spark.functions.ipv6 import normalize_ipv6
from etl_embargo_spark.operators.setops import overwrite_merge
from etl_embargo_spark.sinks.routed_write import write_blobs, write_routed
from etl_embargo_spark.sources.tar_source import read_tar_entries, repack_archives


def classify_entries(
    entries: DataFrame,
    whitelist: DataFrame,
    more_than_one_year: bool = False,
) -> DataFrame:
    """P4 over real sidestream records — the exact reference rule
    (/root/reference/embargo.go:174)::

        public ⇔ moreThanOneYear
                ∨ ¬contains(basename, "web100")
                ∨ CheckInWhiteList(basename)

    where CheckInWhiteList = GetLocalIP (F2: between first/last underscore,
    "" when malformed) → IPv6 normalize (F3) → membership in the whitelist
    set (embargo_check.go:105-110).  Membership is a broadcast LEFT join on
    the normalized IP: dim side tiny (3.5k IPs), fact side never shuffles.

    Null/malformed IPs ("" → no match) fall through to the whitelist-miss
    branch exactly as in the reference (SURVEY §7 risk 3).
    """
    raw_ip = filename_local_ip(F.col("basename"))
    with_ip = entries.withColumn(
        "local_ip",
        F.when(raw_ip == "", F.lit(None)).otherwise(normalize_ipv6(raw_ip)),
    )
    wl = whitelist.select(F.col("ip").alias("wl_ip")).distinct()
    flagged = with_ip.join(
        F.broadcast(wl), with_ip["local_ip"] == wl["wl_ip"], "left"
    )
    is_public = (
        F.lit(more_than_one_year)
        | ~F.col("basename").contains("web100")
        | F.col("wl_ip").isNotNull()
    )
    return flagged.withColumn(
        "visibility",
        F.when(is_public, F.lit("public")).otherwise(F.lit("private")),
    ).drop("wl_ip")


def embargo_day(
    spark: SparkSession,
    archive_glob: str,
    whitelist: DataFrame,
    out_dir: str,
    cutoff_int: int,
    repack: bool = False,
    repack_dir: str | None = None,
) -> DataFrame:
    """E1 — the full embargo pipeline for one day-prefix of archives.

    ``more_than_one_year`` is per-archive in the reference (date parsed from
    the archive name, embargo.go:272-277); here it is a column predicate so
    one job handles any mix of ages.

    Deviation (deliberate): an archive whose name has no parseable date makes
    the reference error out and skip the archive (embargo.go:272-276); here
    ``archive_date_int`` is null, the date term drops out of the OR, and
    eligible records classify **private** — conservative (nothing leaks
    public), and the day still processes.
    """
    entries = read_tar_entries(spark, archive_glob)
    dated = entries.withColumn(
        "archive_date_int", parse_date_int(F.col("archive"))
    )
    wl = whitelist
    raw_ip = filename_local_ip(F.col("basename"))
    with_ip = dated.withColumn(
        "local_ip",
        F.when(raw_ip == "", F.lit(None)).otherwise(normalize_ipv6(raw_ip)),
    )
    wldim = wl.select(F.col("ip").alias("wl_ip")).distinct()
    flagged = with_ip.join(
        F.broadcast(wldim), with_ip["local_ip"] == wldim["wl_ip"], "left"
    )
    is_public = (
        (F.col("archive_date_int") < F.lit(cutoff_int))
        | ~F.col("basename").contains("web100")
        | F.col("wl_ip").isNotNull()
    )
    classified = flagged.withColumn(
        "visibility",
        F.when(is_public, F.lit("public")).otherwise(F.lit("private")),
    ).drop("wl_ip")

    write_routed(
        classified.select(
            "archive", "path", "basename", "local_ip", "size", "mode",
            "mtime", "content", "visibility",
        ),
        out_dir,
    )
    if repack:
        # repack_archives already applies the output-name convention
        # (public → -p.tgz, private → -e.tgz per embargo.go:105); no
        # further rename here.
        write_blobs(repack_archives(classified), repack_dir or out_dir)
    return classified


def unembargo_merge(
    public_listing: DataFrame, aged_out: DataFrame, key: str, payload: list[str]
) -> DataFrame:
    """E2 — publish: aged-out private records overwrite the public listing
    per key (unembargo.go:115-130 delete-then-copy ≡ last-writer-wins)."""
    return overwrite_merge(public_listing, aged_out, key, payload)
