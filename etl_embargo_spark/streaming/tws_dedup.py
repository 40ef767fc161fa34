"""Cross-batch streaming deduplication on ``transformWithStateInPandas``
(Spark 4's arbitrary-state API, the successor to
``applyInPandasWithState`` used by ``stateful.py`` — both surfaces stay:
this is the one new pipelines should target).

The operator (gated by :func:`tws_available` — see its docstring) keys
the stream by a content hash and keeps ONE boolean
ValueState per key: the first row of a key is emitted, every later
occurrence — in the same micro-batch or any later one — is dropped.
This is the streaming half of exact dedup (``operators/dedup.py``): an
ingest firehose can be deduplicated continuously instead of re-scanning
the corpus per drop.

Scale design: state is hash-partitioned by key across executors and
checkpointed by the streaming commit protocol; per key the state is ONE
boolean (plus the ~32-byte key), so a billion-document corpus costs a
few tens of GB of state store spread over the cluster — and the state
store's TTL support (``getValueState(..., ttlDurationMs=...)``) bounds
it further when upstream guarantees duplicates arrive within a window.
Only the hash column shuffles wide; payloads ride along once.

Kernel classes are built INSIDE a factory so cloudpickle ships them by
value (CLAUDE.md closure rule — a module-level processor class pickles
by reference and breaks on workers without this repo importable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEDUP_OUT_SCHEMA = "doc_hash string, doc_id bigint, n_chars bigint"


def tws_available() -> bool:
    """transformWithStateInPandas ships its state protocol over protobuf;
    this container has no ``google.protobuf``, so the operator is gated
    (the brief's import-try rule) — ``stateful.py``'s
    ``applyInPandasWithState`` path is the working stateful surface here.
    On a cluster with protobuf installed this returns True and the
    operator below runs unchanged (the crash otherwise is a hard
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE at query start)."""
    try:  # pragma: no cover - environment-dependent
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def make_first_seen_processor():
    """StatefulProcessor emitting only the first row per key."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _FirstSeen(StatefulProcessor):
        def init(self, handle):
            self._seen = handle.getValueState("seen", "seen boolean")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as _pd

            emitted = False
            for pdf in rows:
                if emitted or self._seen.exists():
                    continue  # drain remaining batches for this key
                if len(pdf):
                    yield pdf.head(1)
                    self._seen.update((True,))
                    emitted = True
            if False:
                yield _pd.DataFrame()  # pragma: no cover — generator shape

        def close(self):
            pass

    return _FirstSeen()


def dedup_stream(docs: DataFrame) -> DataFrame:
    """Streaming exact-dedup: one output row per distinct md5(text),
    whichever micro-batch it first appears in.  Batch oracle:
    :func:`batch_dedup` — after draining any multi-batch split of the
    same corpus, the emitted set equals the batch first-per-hash set
    (tests/test_streaming_refresh.py)."""
    hashed = docs.select(
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("doc_hash"),
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )
    return hashed.groupBy("doc_hash").transformWithStateInPandas(
        statefulProcessor=make_first_seen_processor(),
        outputStructType=DEDUP_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


def batch_dedup(docs: DataFrame) -> DataFrame:
    """Batch oracle: the distinct hash set with per-hash row counts —
    the streamed emissions must cover exactly these hashes, one row
    each."""
    return (
        docs.select(F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("doc_hash"))
        .groupBy("doc_hash")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
