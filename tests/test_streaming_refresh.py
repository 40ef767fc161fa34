"""ST2 — per-batch broadcast-state refresh: the whitelist must be re-read
inside every micro-batch (deliberately NOT the reference's stale singleton,
/root/reference/embargo.go:55-57, where a refresh endpoint was a no-op
because the config cached itself process-wide)."""

from __future__ import annotations

import json
from pathlib import Path

from etl_embargo_spark.catalog import load_table
from etl_embargo_spark.streaming.daily import (
    run_foreach_batch,
    stream_events_from_parquet,
)


class TestForeachBatchDimRefresh:
    def test_dim_is_reread_every_batch(self, spark, sf_dir, tmp_path):
        src_dir = str(tmp_path / "events_src")
        dim_path = Path(tmp_path / "whitelist.json")
        ckpt = str(tmp_path / "ckpt")

        events = load_table(spark, sf_dir, "events")
        # 8 files + maxFilesPerTrigger=4 => exactly 2 micro-batches
        events.repartition(8).write.parquet(src_dir)
        dim_path.write_text(json.dumps({"version": 0}))

        seen: list[tuple[int, int]] = []  # (epoch, dim version used)

        def batch_fn(batch_df, epoch_id: int) -> None:
            # fresh dim state each batch — read, use, then simulate the
            # daily cron updating it after this run
            version = json.loads(dim_path.read_text())["version"]
            assert batch_df.count() > 0
            seen.append((epoch_id, version))
            dim_path.write_text(json.dumps({"version": version + 1}))

        stream = stream_events_from_parquet(spark, src_dir, events.schema)
        q = run_foreach_batch(stream, ckpt, batch_fn)
        q.awaitTermination(180)

        assert len(seen) >= 2, "expected multiple micro-batches"
        versions = [v for _, v in seen]
        # every batch observed a different dim version => no stale cache
        assert versions == list(range(len(seen)))


class TestStreamingEmbargo:
    def test_streaming_matches_batch_and_is_exactly_once(
        self, spark, tmp_path
    ):
        """ST1 on the real archive path: streamed classify+routed-sink output
        equals the batch pipeline's classification, and a rerun with the
        same checkpoint adds no rows."""
        import os
        import shutil

        import pytest
        from pyspark.sql import functions as F

        from etl_embargo_spark.plans.embargo_pipeline import classify_entries
        from etl_embargo_spark.sources.tar_source import read_tar_entries
        from etl_embargo_spark.sources.text_source import read_whitelist
        from etl_embargo_spark.streaming.archive_stream import (
            run_streaming_embargo,
        )

        ref = "/root/reference/testdata"
        input_tgz = os.path.join(
            ref, "20170315T000000Z-mlab3-sea03-sidestream-0000.tgz"
        )
        wl_path = os.path.join(ref, "whitelist_full")
        if not os.path.exists(input_tgz):
            pytest.skip("reference testdata not available")

        # two archives => two file-source entries (copies are fine: the
        # pipeline is per-archive)
        src = tmp_path / "archives"
        src.mkdir()
        shutil.copy(input_tgz, src / "20170315T000000Z-a-sidestream-0000.tgz")
        shutil.copy(input_tgz, src / "20170316T000000Z-b-sidestream-0000.tgz")

        wl = read_whitelist(spark, wl_path)
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        q = run_streaming_embargo(spark, str(src), wl, out, ckpt)
        q.awaitTermination(180)
        got = spark.read.parquet(out)
        n_first = got.count()

        batch = classify_entries(
            read_tar_entries(spark, str(src)), wl, more_than_one_year=False
        )
        want = batch.groupBy("visibility").count().collect()
        got_counts = got.groupBy("visibility").count().collect()
        assert sorted(map(tuple, got_counts)) == sorted(map(tuple, want))
        assert {r["visibility"] for r in got_counts} == {"public", "private"}

        # rerun with same checkpoint: exactly-once, nothing appended
        q2 = run_streaming_embargo(spark, str(src), wl, out, ckpt)
        q2.awaitTermination(180)
        assert spark.read.parquet(out).count() == n_first
