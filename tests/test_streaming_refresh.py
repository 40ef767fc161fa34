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
