"""Custom stateful streaming operator: running per-user totals via
``applyInPandasWithState`` — the extension surface for arbitrary state the
built-in windowed aggregations can't express (SURVEY §2.7: the reference has
no stateful operators at all; this is the north-star streaming shape).

Scale design: state is partitioned by the grouping key across executors and
checkpointed by the streaming commit protocol, so a 1000-executor cluster
holds the state shards of billions of keys with single-key read/update per
micro-batch.  The per-group Python kernel receives Arrow batches, and each
group's state is a 3-number tuple — constant size per key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_totals(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum(value)) per user across micro-batches and emit
    the running totals once per batch the user appears in."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame of cumulative per-user event totals (update mode).

    The batch-mode equivalent (used by the pytest oracle) is
    ``events.groupBy(user_id).agg(count, sum)`` — after draining the whole
    stream, the last emitted row per user must equal the batch aggregate.
    """
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return src.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_user_totals(events: DataFrame) -> DataFrame:
    """The batch oracle for ``running_user_totals``'s final state."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
