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


def _solve_side(inter_ei: DataFrame, fixed: DataFrame) -> DataFrame:
    """One ALS half-step over a standardized (e, i, r) relation with
    ``fixed`` = (i, factors): for every e, solve the k×k ridge normal
    equations against the factors of its i's.  The group kernel sorts
    by i so the Gram accumulation order — and therefore every float —
    is partition-independent."""
    joined = inter_ei.join(
        F.broadcast(
            fixed.select(
                F.col("i").alias("_fi"), F.col("factors").alias("_yf")
            )
        ),
        inter_ei["i"] == F.col("_fi"),
    ).select("e", "i", "r", "_yf")

    def _make_solver(k, lam, quantum):
        def _solve(pdf):
            import numpy as _np
            import pandas as _pd

            pdf = pdf.sort_values("i")
            y = _np.vstack(pdf["_yf"].to_numpy()).astype(_np.float64)
            r = pdf["r"].to_numpy().astype(_np.float64)
            a = y.T @ y + lam * _np.eye(k)
            b = y.T @ r
            x = _np.round(_np.linalg.solve(a, b), quantum)
            return _pd.DataFrame(
                {"e": [int(pdf["e"].iloc[0])], "factors": [x.tolist()]}
            )

        return _solve

    schema = StructType(
        [
            StructField("e", LongType()),
            StructField("factors", ArrayType(DoubleType())),
        ]
    )
    return joined.groupBy("e").applyInPandas(
        _make_solver(ALS_K, ALS_LAMBDA, ALS_QUANTUM), schema=schema
    )


def als_fit(inter: DataFrame, n_rounds: int = ALS_ROUNDS):
    """Run ALS rounds on (user, item, r); returns (user_factors,
    item_factors) as (id, factors) DataFrames.  Each round is two
    half-steps; factor relations are eagerly localCheckpointed between
    rounds (iterative precedent — bounded driver-side rounds, each one
    a distributed pass)."""
    by_user = inter.select(
        F.col("user").alias("e"), F.col("item").alias("i"), "r"
    )
    by_item = inter.select(
        F.col("item").alias("e"), F.col("user").alias("i"), "r"
    )
    yf = _init_factors(
        inter.select(F.col("item").alias("i")).distinct(), "i", "item"
    ).select("i", "factors")
    xf = None
    for _ in range(n_rounds):
        xf = (
            _solve_side(by_user, yf)
            .select(F.col("e").alias("i"), "factors")
            .localCheckpoint()
        )
        yf = (
            _solve_side(by_item, xf)
            .select(F.col("e").alias("i"), "factors")
            .localCheckpoint()
        )
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
    xf, yf = als_fit(inter)
    scored = (
        inter.join(
            F.broadcast(xf.withColumnRenamed("factors", "_xf")), "user"
        )
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
    wall = F.lit(1)  # marker for the global aggregate below
    err = scored.withColumn(
        "se_q",
        F.round((F.col("r") - F.col("pred")) * (F.col("r") - F.col("pred")), 8)
        .cast("decimal(20,8)"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(wall)
    return err.select(
        "user",
        "item",
        "r",
        "pred",
        F.round(
            F.sqrt(
                F.sum("se_q").over(w).cast("double")
                / F.count(F.lit(1)).over(w)
            ),
            6,
        ).alias("rmse"),
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
