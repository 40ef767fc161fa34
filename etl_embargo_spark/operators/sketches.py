"""Mergeable frequency sketches (north-star extension): Count-Min with a
per-partition candidate heap — the bounded-memory approximate top-k that
complements the exact `q_heavy_hitters` and the HLL/GK sketches in
analytics.py.

At 100 TB an exact token top-k is one shuffle of the full type
distribution; the sketch path caps per-partition state at d×w counters +
C candidates regardless of input size, and the partials merge
associatively (matrix sum, candidate-set union) — the same contract as
Spark's own HyperLogLog++ partial aggregate, here built explicitly so the
merge algebra is visible and testable.

Hash functions are seeded md5 slices (engine-independent, same idiom as
sampling.hash_bucket), so the sketch is deterministic across engines,
runs, and partitionings.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_embargo_spark.catalog import load_table
from etl_embargo_spark.operators.text import _tokens

CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_CANDIDATES = 64  # per-partition exact-top candidates shipped upward
CMS_TOPK = 20


def _cms_hash(token: str, row: int, width: int = CMS_WIDTH) -> int:
    """Row-seeded md5 bucket — deterministic everywhere Python runs."""
    h = hashlib.md5(f"{row}:{token}".encode()).hexdigest()
    return int(h[:8], 16) % width


def cms_partials(tokens: DataFrame) -> DataFrame:
    """One row per (partition, sketch-row): the counter vector plus the
    partition's top-C exact candidates.  mapInPandas so each partition
    builds its state in one numpy/dict pass; output size is constant per
    partition (d vectors of w longs + C strings) whatever the input."""

    def _make(depth, width, n_cand):
        def _build(batches):
            import numpy as _np
            import pandas as _pd

            counts: dict[str, int] = {}
            mat = _np.zeros((depth, width), dtype=_np.int64)
            import hashlib as _hl

            def _h(tok, row):
                return (
                    int(
                        _hl.md5(f"{row}:{tok}".encode()).hexdigest()[:8], 16
                    )
                    % width
                )

            for pdf in batches:
                # per-UNIQUE-token work, not per-occurrence: value_counts
                # collapses the batch first, hashing cost is O(types)
                for tok, c in pdf["token"].value_counts().items():
                    counts[tok] = counts.get(tok, 0) + int(c)
                    for r in range(depth):
                        mat[r, _h(tok, r)] += int(c)
            cands = sorted(
                counts.items(), key=lambda kv: (-kv[1], kv[0])
            )[:n_cand]
            yield _pd.DataFrame(
                {
                    "row": list(range(depth)),
                    "counters": [mat[r].tolist() for r in range(depth)],
                    "candidates": [[t for t, _ in cands]] * depth,
                }
            )

        return _build

    schema = StructType(
        [
            StructField("row", IntegerType()),
            StructField("counters", ArrayType(LongType())),
            StructField("candidates", ArrayType(StringType())),
        ]
    )
    return tokens.mapInPandas(
        _make(CMS_DEPTH, CMS_WIDTH, CMS_CANDIDATES), schema=schema
    )


def q_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only (sketch — estimates are structurally approximate): the
    top-CMS_TOPK corpus tokens by Count-Min estimate.

    The merge is the point: per-partition partials (constant-size) sum
    into one global d×w matrix on the driver — a few KB — and the
    candidate union is re-estimated against the merged sketch, exactly
    how a 1000-executor treeAggregate would do it.  Pytest checks the
    CMS guarantees: every estimate ≥ the true count (one-sided error),
    the top set matches the exact top set on this vocabulary, and the
    result is invariant under repartitioning
    (tests/test_extensions.py::TestCmsTopk)."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    toks = docs.select(F.explode(_tokens()).alias("token"))
    parts = cms_partials(toks).collect()
    mat = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    cands: set[str] = set()
    for r in parts:
        mat[r.row] += np.asarray(r.counters, dtype=np.int64)
        cands.update(r.candidates)
    scored = sorted(
        (
            (
                tok,
                int(
                    min(
                        mat[row, _cms_hash(tok, row)]
                        for row in range(CMS_DEPTH)
                    )
                ),
            )
            for tok in cands
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:CMS_TOPK]
    out = [
        (rank + 1, tok, est) for rank, (tok, est) in enumerate(scored)
    ]
    return spark.createDataFrame(
        out, "rank int, token string, est bigint"
    )
