"""Storage-layer object operations via the Hadoop FileSystem API (K3/K4/K5
in SURVEY §2.1): copy / delete-by-prefix / list executed by the filesystem
layer the JVM is already connected to — no object bytes ever enter Python,
which is this engine's analog of the reference's server-side GCS rewrite
(/root/reference/unembargo.go:124-130 — "zero data through the process")
and bucket ops (/root/reference/gcs_operations.go:36-196).

All paths are Hadoop FS URIs, so the same calls run against ``file://``,
``hdfs://``, ``s3a://`` or ``gs://`` given the connector jars — the
storage scheme is configuration, not code.  On a true object store the
copy is server-side whenever the FileSystem implementation supports it
(the S3A/GCS connectors translate ``FileUtil.copy`` of same-store paths
into service-side copy/rewrite calls); on local/HDFS it is a kernel-space
stream copy.  Either way the driver JVM moves metadata, not payloads,
through this process.

These are driver-side utilities (one call per object/prefix, like the
reference's operations) — bulk data movement belongs to the routed-write
sinks, not here.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(hconf), jpath, jvm, hconf


def copy_object(
    spark: SparkSession, src: str, dst: str, overwrite: bool = True
) -> bool:
    """K3/K4 — copy one object filesystem-side (no bytes through Python).
    Returns True on success; refuses to clobber unless ``overwrite``."""
    sfs, spath, jvm, hconf = _fs(spark, src)
    dfs, dpath, _, _ = _fs(spark, dst)
    if not overwrite and dfs.exists(dpath):
        raise FileExistsError(f"{dst} exists and overwrite=False")
    return bool(
        jvm.org.apache.hadoop.fs.FileUtil.copy(
            sfs, spath, dfs, dpath, False, overwrite, hconf
        )
    )


def delete_prefix(spark: SparkSession, prefix: str) -> int:
    """K5 — delete every object under a prefix (the reference's
    ``DeleteObjects``, gcs_operations.go:168-196).  Returns the number of
    objects removed.  The listing and deletes are filesystem-layer calls."""
    fs, path, _, _ = _fs(spark, prefix)
    if not fs.exists(path):
        return 0
    n = count_objects(spark, prefix)
    fs.delete(path, True)  # recursive
    return n


def count_objects(spark: SparkSession, prefix: str) -> int:
    """K6 — object count under a prefix (emptiness test before bucket
    delete, gcs_operations.go:142)."""
    fs, path, _, _ = _fs(spark, prefix)
    if not fs.exists(path):
        return 0
    it = fs.listFiles(path, True)
    n = 0
    while it.hasNext():
        it.next()
        n += 1
    return n


def list_objects(spark: SparkSession, prefix: str) -> list[dict]:
    """S1/S2 — recursive listing under a prefix as (path, size, mtime_ms)
    dicts: the metadata-only enumeration the reference's paginated listing
    performs (unembargo.go:59-81), via the FileSystem's remote iterator
    (constant driver memory per page)."""
    fs, path, _, _ = _fs(spark, prefix)
    if not fs.exists(path):
        return []
    it = fs.listFiles(path, True)
    out = []
    while it.hasNext():
        st = it.next()
        out.append(
            {
                "path": st.getPath().toString(),
                "size": int(st.getLen()),
                "mtime_ms": int(st.getModificationTime()),
            }
        )
    return out
