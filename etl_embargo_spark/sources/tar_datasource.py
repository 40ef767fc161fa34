"""S3 as a first-class connector: the tar-archive source re-expressed on
Spark 4's Python Data Source API, so archive explosion reads as

    spark.dataSource.register(make_tar_datasource())
    spark.read.format("tar_archive").load("/data/*.tgz")

instead of the binaryFile + mapInPandas composition in ``tar_source.py``
(both stay: the composition works on Spark 3.x, the connector is the
idiomatic Spark 4 surface).

Reference semantics: /root/reference/embargo.go:125-173 — gzip → tar →
one row per entry, header fields + opaque content bytes.

Scale design:
* ``partitions()`` emits ONE InputPartition PER ARCHIVE — gzip is
  unsplittable, so the archive is the correct parallel grain; a
  1000-executor cluster processes 1000 archives concurrently and no task
  ever holds more than one archive.
* The glob expansion is a driver-side listing (the same job the JVM's
  InMemoryFileIndex does for built-in sources); entry rows stream out of
  the tarfile iterator one at a time — peak memory is one entry, not one
  archive (the reference buffers all three archives in RAM,
  embargo.go:135-141).
* Local/NFS paths only: executors open the path directly.  An
  object-store variant would swap ``open`` for an fsspec handle — the
  partition planning is unchanged.

Pickling: the DataSource classes are built INSIDE a factory so cloudpickle
serializes them by value — module-level classes pickle by reference and
break on executors that can't import this repo (see tar_source.py NOTE).
"""

from __future__ import annotations

# Schema matches tar_source.ENTRY_SCHEMA minus the binaryFile-era NULLs:
# the connector keeps non-regular entries too (is_regular=false, content
# null), exactly like the mapInPandas exploder.
TAR_DS_SCHEMA = (
    "archive string, path string, basename string, size long, mode long, "
    "mtime timestamp, is_regular boolean, content binary"
)


def make_tar_datasource():
    """Build the DataSource class (nested for by-value pickling)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceWriter,
        InputPartition,
        WriterCommitMessage,
    )

    def _local_path(p):
        """Resolve an explicit-scheme ``file://`` URI (the form Hadoop
        paths use — what the built-in parquet/binaryFile sources accept
        natively) to a plain local path; other schemes would route
        through an fsspec handle here without touching the partition
        planning (see module docstring)."""
        if p and p.startswith("file:"):
            from urllib.parse import urlparse
            from urllib.request import url2pathname

            return url2pathname(urlparse(p).path)
        return p

    class _ArchivePartition(InputPartition):
        def __init__(self, archive_path: str):
            self.archive_path = archive_path

    class _TarReader(DataSourceReader):
        def __init__(self, options):
            self._path = _local_path(options.get("path"))
            if not self._path:
                raise ValueError("tar_archive requires .load(<path or glob>)")

        def partitions(self):
            import glob as _glob
            import os as _os

            p = self._path
            if _os.path.isdir(p):
                p = _os.path.join(p, "*.tgz")
            paths = sorted(_glob.glob(p))
            if not paths:
                raise FileNotFoundError(f"no archives match {self._path}")
            return [_ArchivePartition(a) for a in paths]

        def read(self, partition):
            import datetime as _dt
            import gzip as _gzip
            import tarfile as _tarfile

            path = partition.archive_path
            archive_name = path.rsplit("/", 1)[-1]
            with open(path, "rb") as raw, _gzip.GzipFile(
                fileobj=raw
            ) as gz, _tarfile.open(fileobj=gz, mode="r|") as tar:
                for info in tar:
                    is_reg = info.isreg()
                    data = (
                        tar.extractfile(info).read() if is_reg else None
                    )
                    yield (
                        archive_name,
                        info.name,
                        info.name.rsplit("/", 1)[-1],
                        info.size,
                        info.mode,
                        _dt.datetime.fromtimestamp(
                            info.mtime, _dt.timezone.utc
                        ).replace(tzinfo=None),
                        is_reg,
                        data,
                    )

    class _TarWriter(DataSourceWriter):
        """K1/K2 as a connector sink: each task packs its partition's
        rows into ONE .tgz (rows need ``path`` + ``content``; ``mode`` /
        ``mtime`` honored when present).  Tasks write to dot-prefixed
        temp names and ``commit`` renames them in on the driver — the
        same stage-then-rename protocol as the snapshot sink, so a
        failed job leaves no visible archives."""

        def __init__(self, options, overwrite: bool):
            import os as _os
            import uuid as _uuid

            self._dir = _local_path(options.get("path"))
            if not self._dir:
                raise ValueError("tar_archive write requires .save(<dir>)")
            _os.makedirs(self._dir, exist_ok=True)
            # Overwrite is deferred to commit() (stage-then-swap): deleting
            # here would run at writer-construction/plan time, so a job
            # that then failed would have already destroyed the old
            # archives with abort() unable to restore them.
            self._overwrite = overwrite
            # Per-job token in every final filename: without it a second
            # append job reuses the same partition ids and its commit
            # renames silently clobber the previous job's archives (the
            # FileCommitProtocol jobId analog).
            self._job = _uuid.uuid4().hex[:8]

        def write(self, iterator):
            import gzip as _gzip
            import io as _io
            import os as _os
            import tarfile as _tarfile

            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            tmp = _os.path.join(
                self._dir, f".part-{self._job}-{pid:05d}.tgz.tmp"
            )
            buf = _io.BytesIO()
            n = 0
            with _gzip.GzipFile(
                fileobj=buf, mode="wb", mtime=0
            ) as gz, _tarfile.open(fileobj=gz, mode="w") as tar:
                for row in iterator:
                    data = bytes(row["content"] or b"")
                    info = _tarfile.TarInfo(name=row["path"])
                    info.size = len(data)
                    if "mode" in row and row["mode"] is not None:
                        info.mode = int(row["mode"])
                    if "mtime" in row and row["mtime"] is not None:
                        import datetime as _dt

                        # naive values are UTC by repo convention
                        info.mtime = int(
                            row["mtime"]
                            .replace(tzinfo=_dt.timezone.utc)
                            .timestamp()
                        )
                    tar.addfile(info, _io.BytesIO(data))
                    n += 1
            if n == 0:
                return WriterCommitMessage()  # empty partition: no file
            with open(tmp, "wb") as f:
                f.write(buf.getvalue())
            msg = WriterCommitMessage()
            msg.tmp_path = tmp  # type: ignore[attr-defined]
            msg.n_entries = n  # type: ignore[attr-defined]
            return msg

        def commit(self, messages):
            import glob as _glob
            import os as _os

            if self._overwrite:
                # the destructive half of overwrite happens only at the
                # commit point, after every task staged successfully —
                # a failed job leaves the previous archives intact
                for old in _glob.glob(_os.path.join(self._dir, "*.tgz")):
                    _os.remove(old)
            for m in messages:
                tmp = getattr(m, "tmp_path", None)
                if tmp:
                    _os.rename(tmp, tmp[:-4].replace("/.part-", "/part-"))

        def abort(self, messages):
            import os as _os

            for m in messages:
                tmp = getattr(m, "tmp_path", None)
                if tmp and _os.path.exists(tmp):
                    _os.remove(tmp)

    class TarArchiveDataSource(DataSource):
        @classmethod
        def name(cls):
            return "tar_archive"

        def schema(self):
            return TAR_DS_SCHEMA

        def reader(self, schema):
            return _TarReader(self.options)

        def writer(self, schema, overwrite: bool):
            return _TarWriter(self.options, overwrite)

    return TarArchiveDataSource
