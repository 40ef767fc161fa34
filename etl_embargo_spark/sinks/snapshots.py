"""Versioned snapshot tables: a minimal manifest-based commit log giving
parquet directories atomic commits, append/overwrite semantics, and
time-travel reads — the lakehouse table contract (Iceberg/Delta shape)
re-expressed in ~100 lines on plain files.

Why a manifest and not a directory listing:

* **Atomic commit.** Data files are written first (to a version-private
  subdirectory, so writers never collide); the manifest is staged to a
  temp name and ``os.rename``d into place LAST.  Readers resolve the
  table by manifest files only, so a writer that dies mid-job leaves
  garbage data files but never a torn table — the crashed version simply
  does not exist.  This is the file-sink commit protocol the reference
  relies on GCS atomicity for (rerun-a-day idempotency,
  /root/reference/embargo.go:246-247), made explicit.
* **Time travel.** Every version's manifest pins the exact file set, so
  ``read_snapshot(..., version=N)`` reproduces any historical state even
  after later overwrites — snapshot isolation for free.
* **Manifest-pruned scans.** Readers pass the pinned file list straight
  to ``spark.read.parquet(*files)``: no recursive directory listing, no
  eventual-consistency window, and at 100 TB no O(files) object-store
  LIST storm per query.  (Column stats per file would slot in here for
  min/max skipping — out of scope.)

Appends are logical: an append manifest = parent's file list + the new
files, so old data is never rewritten (and never read twice).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
_MANIFEST_RE = re.compile(r"^v(\d{5})\.json$")


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _MANIFEST_DIR, f"v{version:05d}.json")


def _list_versions(table_dir: str) -> list[int]:
    mdir = os.path.join(table_dir, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        m = _MANIFEST_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _read_manifest(table_dir: str, version: int) -> dict[str, Any]:
    with open(_manifest_path(table_dir, version)) as f:
        return json.load(f)


def _data_files(root: str) -> list[str]:
    """Part files of one written parquet directory, relative to root's
    parent table dir (driver-side walk of the just-written output only —
    never of the whole table)."""
    files = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for name in filenames:
            if name.endswith(".parquet"):
                files.append(os.path.join(dirpath, name))
    return sorted(files)


def write_snapshot(
    df: DataFrame,
    table_dir: str,
    mode: str = "append",
    meta: dict[str, Any] | None = None,
) -> int:
    """Commit ``df`` as a new table version; returns the version number.

    ``mode='append'`` extends the parent version's file set;
    ``mode='overwrite'`` replaces it.  Either way old data files are
    untouched — history stays readable.  ``meta`` (e.g. a streaming
    batch id) is recorded in the manifest — the hook exactly-once sinks
    key their idempotence on."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    versions = _list_versions(table_dir)
    version = (versions[-1] + 1) if versions else 1
    data_dir = os.path.join(table_dir, "data", f"v{version:05d}")
    # Crash recovery: a writer that died between the parquet write and the
    # manifest rename leaves an orphaned data/v{N} dir with NO committed
    # manifest — invisible garbage by construction (readers resolve via
    # manifests only), but it would wedge this write's mode("error").
    # The version was chosen from committed manifests, so an existing dir
    # here can only be such an orphan: delete it.
    # SINGLE-WRITER ASSUMPTION: this reclaim (and the version choice
    # above) presumes one committer per table, like Delta/Iceberg without
    # a lock service.  Two LIVE writers racing the same version would
    # have one delete the other's in-flight data dir and the loser's
    # manifest then point at the winner's files.  Concurrent committers
    # need the usual fix — stage under a per-writer unique dir (or CAS
    # the manifest rename) — which object stores provide via
    # if-generation-match; out of scope for the local snapshot sink.
    if os.path.isdir(data_dir) and not os.path.exists(
        _manifest_path(table_dir, version)
    ):
        import shutil

        shutil.rmtree(data_dir)
    df.write.mode("error").parquet(data_dir)
    files = [os.path.relpath(p, table_dir) for p in _data_files(data_dir)]
    if mode == "append" and versions:
        files = _read_manifest(table_dir, versions[-1])["files"] + files
    manifest = {
        "version": version,
        "mode": mode,
        "files": files,
        "schema": df.schema.json(),
        "meta": meta or {},
    }
    mdir = os.path.join(table_dir, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".tmp-v{version:05d}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, _manifest_path(table_dir, version))  # the commit point
    return version


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the table at ``version`` (default: latest committed)."""
    versions = _list_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots in {table_dir}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise FileNotFoundError(
            f"version {version} not in {versions} at {table_dir}"
        )
    manifest = _read_manifest(table_dir, version)
    paths = [os.path.join(table_dir, p) for p in manifest["files"]]
    if not paths:
        # manifest["schema"] is a StructType.json() string — createDataFrame
        # would try to parse a plain string as DDL, so rebuild the type
        from pyspark.sql.types import StructType

        return spark.createDataFrame(
            [], schema=StructType.fromJson(json.loads(manifest["schema"]))
        )
    return spark.read.parquet(*paths)


def history(table_dir: str) -> list[dict[str, Any]]:
    """All committed manifests, oldest first (version/mode/file count)."""
    return [
        {
            "version": m["version"],
            "mode": m["mode"],
            "n_files": len(m["files"]),
            "meta": m.get("meta", {}),
        }
        for m in (
            _read_manifest(table_dir, v) for v in _list_versions(table_dir)
        )
    ]
