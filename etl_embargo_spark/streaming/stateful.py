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


def _make_update_user_totals():
    """Factory: the kernel pickles BY VALUE (see CLAUDE.md closure rule —
    a module-level kernel breaks on workers without this repo on
    sys.path)."""

    def _update_user_totals(
        key: tuple,
        pdfs,
        state: GroupState,
    ):
        """Accumulate (count, sum(value)) per user across micro-batches
        and emit the running totals once per batch the user appears in."""
        import pandas as _pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield _pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
            }
        )

    return _update_user_totals


_update_user_totals = _make_update_user_totals()


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


SESSION_GAP_MIN = 30
SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint"
)
SESSION_STATE = "start_ms bigint, last_ms bigint, n bigint"
_GAP_US = SESSION_GAP_MIN * 60 * 1_000_000


def _make_close_sessions(gap_us: int):
    """Factory: kernel + its row helper both nested so cloudpickle ships
    them by value (a by-value kernel that CALLS a module-level helper
    still breaks — the helper pickles by reference)."""

    def _session_rows(key, closed):
        import pandas as _pd

        return _pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "session_start": [
                    _pd.Timestamp(s, unit="us") for s, _, _ in closed
                ],
                "session_end": [
                    _pd.Timestamp(e, unit="us") for _, e, _ in closed
                ],
                "n_events": [n for _, _, n in closed],
            }
        )

    def _close_sessions(
        key: tuple,
        pdfs,
        state: GroupState,
    ):
        """Per-user gap sessionizer with EVENT-TIME TIMEOUT: sessions
        close when a later event arrives more than the gap after the
        last one (in-batch or cross-batch), or when the WATERMARK passes
        last_event + gap with no new data (the timeout path — the state
        cannot otherwise know the user went quiet)."""
        import pandas as _pd

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield _session_rows(key, [(start, last, n)])
            return
        ts_us = []
        for pdf in pdfs:
            ts_us.extend(
                int(t.value // 1000) for t in _pd.to_datetime(pdf["ts"])
            )
        ts_us.sort()
        cur = list(state.get) if state.exists else None
        closed = []
        for t in ts_us:
            if cur is None:
                cur = [t, t, 1]
            elif t - cur[1] > gap_us:
                closed.append(tuple(cur))
                cur = [t, t, 1]
            else:
                cur[1] = t
                cur[2] += 1
        state.update(tuple(cur))
        # clamp: if the open session is already older than the watermark
        # (data arrived out of batch-time order), the earliest legal
        # timeout is watermark+1 — setting an earlier one is an error
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(
            max((cur[1] + gap_us) // 1000, wm_ms + 1)
        )
        if closed:
            yield _session_rows(key, closed)

    return _close_sessions


_close_sessions = _make_close_sessions(_GAP_US)


def session_close_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming DataFrame of CLOSED sessions (append mode semantics:
    a session row is emitted exactly once, when it closes)."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        _close_sessions,
        outputStructType=SESSION_SCHEMA,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def batch_sessions(
    events: DataFrame,
    drop_final: bool = True,
    watermark_delay_us: int = 10 * 60 * 1_000_000,
) -> DataFrame:
    """Batch oracle: gap-split sessions per user (lag window); with
    ``drop_final`` only the per-user last sessions the STREAM cannot
    close are excluded — availableNow runs one trailing batch after the
    final watermark advance, so a final session still times out unless
    it ends within (gap + delay) of the stream's max event time."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gapped = events.select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    ).withColumn(
        "new_sess",
        (
            F.unix_micros(F.col("ts"))
            - F.lag(F.unix_micros(F.col("ts")), 1).over(w)
            > _GAP_US
        )
        .cast("int"),
    )
    sess = gapped.withColumn(
        "sess_id",
        F.sum(F.coalesce(F.col("new_sess"), F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    agg = sess.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
    if drop_final:
        wlast = Window.partitionBy("user_id")
        wall = Window.partitionBy()
        agg = (
            agg.withColumn("max_sess", F.max("sess_id").over(wlast))
            .withColumn(
                "stream_max_us",
                F.max(F.unix_micros(F.col("session_end"))).over(wall),
            )
            .filter(
                (F.col("sess_id") != F.col("max_sess"))
                | (
                    F.unix_micros(F.col("session_end"))
                    + _GAP_US
                    + watermark_delay_us
                    < F.col("stream_max_us")
                )
            )
        )
    return agg.select(
        "user_id", "session_start", "session_end", "n_events"
    )
