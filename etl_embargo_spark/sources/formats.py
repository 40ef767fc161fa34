"""Interchange-format sources: schema-explicit CSV and JSON-lines readers
(and the matching writers, for pipeline hand-offs).

The reference's only interchange surfaces are newline-delimited text
(/root/reference/embargo_check.go:84-99) and a JSON array
(/root/reference/embargo_check.go:39-45); this module generalizes that to
the two formats a data-exchange boundary actually uses, with the engine's
standing rule: schemas are DECLARED, never inferred (SURVEY §1.3 —
``inferSchema`` costs an extra full pass and silently changes types when
the data drifts; a declared schema fails loudly instead).

Scale notes: CSV/JSONL are row-major, uncompressed-by-default, and
unsplittable when gzipped — fine as ingestion boundaries, wrong as
pipeline-internal storage.  Ingest → parquet immediately (columnar,
splittable, statistics for pushdown); these readers exist for the boundary
only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Canonical DDL for the events interchange schema (matches the catalog).
EVENTS_DDL = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)
# timestamp_ntz, not timestamp: the catalog serves naive-UTC instants
# (parquet without the UTC flag surfaces as NTZ on Spark 4), and an LTZ
# column here would shift values on any non-UTC session.

# NTZ timestamps need an explicit format pin on BOTH sides (and it is the
# timestampNTZFormat option, not timestampFormat, that NTZ columns honor):
# the default read pattern silently truncates microseconds to millis.
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def read_events_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV source with declared schema + strict mode (malformed rows fail
    the job rather than becoming silent nulls)."""
    return (
        spark.read.schema(EVENTS_DDL)
        .option("header", "true")
        .option("timestampNTZFormat", _TS_FMT)
        .option("mode", "FAILFAST")
        .csv(path)
    )


def write_events_csv(df: DataFrame, path: str) -> None:
    df.write.option("header", "true").option(
        "timestampNTZFormat", _TS_FMT
    ).mode("overwrite").csv(path)


def read_events_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines source with declared schema (one object per line — the
    splittable JSON layout; multiLine arrays are single-task territory)."""
    return (
        spark.read.schema(EVENTS_DDL)
        .option("timestampNTZFormat", _TS_FMT)
        .option("mode", "FAILFAST")
        .json(path)
    )


def write_events_jsonl(df: DataFrame, path: str) -> None:
    df.write.option("timestampNTZFormat", _TS_FMT).mode("overwrite").json(path)


def read_events_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (schema declared, same rule as CSV/JSONL).  ORC is the
    one other columnar interchange format worth supporting natively:
    splittable, compressed, with min/max stripe statistics — predicate
    pushdown and column pruning work exactly as for parquet, so unlike
    CSV/JSONL it is acceptable pipeline-internal storage when a peer
    system mandates it."""
    return spark.read.schema(EVENTS_DDL).orc(path)


def write_events_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_events_xml(spark: SparkSession, path: str) -> DataFrame:
    """XML source (Spark 4 native, rowTag-based).  Schema declared like
    every other interchange format — inference would scan twice and
    guess types; FAILFAST surfaces malformed rows instead of nulling
    them.  XML is row-at-a-time and unsplittable per element, so it is
    an EDGE format only: land it, convert to parquet, never store
    pipeline-internal data in it."""
    return (
        spark.read.format("xml")
        .schema(EVENTS_DDL)
        .option("rowTag", "event")
        .option("timestampNTZFormat", _TS_FMT)
        .option("mode", "FAILFAST")
        .load(path)
    )


def write_events_xml(df: DataFrame, path: str) -> None:
    df.write.format("xml").option("rowTag", "event").option(
        "rootTag", "events"
    ).option("timestampNTZFormat", _TS_FMT).mode("overwrite").save(path)


def read_parquet_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet written across SCHEMA VERSIONS (columns added over
    time) as one frame: per-file footers are merged, files lacking a
    column surface nulls for it.

    Scale note: ``mergeSchema`` reconciles footers from a SAMPLE of files
    per directory at planning time — cheap even over millions of files —
    and costs nothing at execution (parquet is read column-by-name).  At
    100 TB the alternative (migrating years of immutable data on every
    column add) is not viable; this is the append-only evolution contract.
    Column REMOVAL/renames still require a migration: mergeSchema only
    unions, it cannot express drops."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def union_evolving(*frames: DataFrame) -> DataFrame:
    """Union in-flight frames whose schemas drifted (added columns):
    positional union would mis-align or reject; by-name union with
    missing-column fill keeps every batch readable forever."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def read_events_jsonl_quarantine(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter variant of the JSONL reader: PERMISSIVE mode routes
    malformed lines into a capture column instead of failing the job, and
    the result is split into (good, quarantined-raw-lines).

    When to use which: FAILFAST (read_events_jsonl) at a boundary you
    control — corruption means a bug, stop.  Quarantine at a boundary you
    don't — at 100 TB a 1e-8 corruption rate is still thousands of lines,
    and failing a 6-hour job on line 4 billion (or silently nulling the
    rows) are both worse than landing them in a dead-letter table for
    replay.

    The parse is persisted before the split: Spark disallows querying the
    corrupt-record column off a raw scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN
    — the parse that fills it would otherwise be optimized away).  At
    ingest scale use DISK_ONLY persistence or, equivalently, write both
    splits in one pass (foreachBatch / partitioned write on the validity
    flag) so the boundary is still read exactly once."""
    from pyspark import StorageLevel

    raw = (
        spark.read.schema(EVENTS_DDL + ", _corrupt_record string")
        .option("timestampNTZFormat", _TS_FMT)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    good = raw.filter(raw["_corrupt_record"].isNull()).drop(
        "_corrupt_record"
    )
    bad = raw.filter(raw["_corrupt_record"].isNotNull()).select(
        raw["_corrupt_record"].alias("raw_line")
    )
    return good, bad
