"""Streaming upsert sink: last-writer-wins merge per key, applied one
micro-batch at a time through ``foreachBatch``.

This is the streaming form of the reference's unembargo overwrite-merge
(J4): `/root/reference/unembargo.go:115-130` deletes the destination
object and copies the source per key — per-key last-writer-wins.  The
batch query twin is ``operators/setops.py::q_overwrite_merge``; here the
same window rule runs incrementally as change batches arrive.

At 100 TB the rewrite step would be a transactional-table MERGE (file
formats with ACID metadata replace only affected files); the engine-level
semantics — union + row_number over (key ORDER BY version DESC) — are
identical, which is what the test pins against the batch oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def merge_last_writer_wins(
    current: DataFrame | None,
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Union the existing table state with a change set and keep, per key,
    the single row with the highest ``order_cols`` (a total order ⇒ a
    deterministic winner regardless of how rows were batched)."""
    merged = changes if current is None else current.unionByName(changes)
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def stream_upsert(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    order_cols: list[str],
) -> StreamingQuery:
    """Maintain a keyed parquet table from a change stream: each
    micro-batch is merged last-writer-wins into the current table state.

    The merged result is localCheckpoint'ed (eager) before the overwrite —
    the rewrite reads the files it is about to delete, so the lineage must
    be severed first.  Checkpointed ``foreachBatch`` gives effective
    exactly-once: a replayed batch re-merges idempotently (same winners).
    """
    spark = stream_df.sparkSession

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        current = None
        if os.path.isdir(table_path) and any(
            f.endswith(".parquet") for f in os.listdir(table_path)
        ):
            current = spark.read.parquet(table_path)
        merged = merge_last_writer_wins(
            current, batch_df, key_cols, order_cols
        )
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(table_path)

    return (
        stream_df.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_merge_batch)
        .start()
    )


def apply_cdc(
    current: DataFrame | None,
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a change-data-capture batch (op ∈ {'I','U','D'}) to the
    current table state: per key, the HIGHEST-ordered record wins, and
    if that winner is a delete the key disappears — the MERGE INTO
    semantics (WHEN MATCHED UPDATE / DELETE, WHEN NOT MATCHED INSERT)
    as one window pass.

    Existing table rows participate with the LOWEST priority (a change
    of any kind beats current state at equal order keys is impossible —
    order keys are change timestamps, current rows carry their own),
    so the same last-writer-wins window as merge_last_writer_wins
    resolves inserts, updates and deletes together: one shuffle on the
    key, no per-op passes."""
    cur = (
        None
        if current is None
        else current.withColumn(op_col, F.lit("U"))
    )
    merged = changes if cur is None else cur.unionByName(changes)
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != "D"))
        .drop("_rn", op_col)
    )
