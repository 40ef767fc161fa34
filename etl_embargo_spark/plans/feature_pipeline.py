"""End-to-end ML training-table pipeline (north-star composition, like
plans/corpus_pipeline for text): one events scan → per-user features →
label → deterministic split → leakage-safe target encoding → the final
training table a feature store would serve.

Composes the primitives that already exist as standalone queries
(q_user_features' conditional aggregation, q_train_test_split's md5
buckets, q_target_encode's leave-one-fold-out windows) into a single
declarative plan — the point of an engine is that the composition stays
ONE job with the same scale shape as its parts:

* one shuffle collapses the event log to the user grain (map-side
  combined);
* the per-user relation is persisted for its two consumers (encoding
  cells + final table) so the scan never re-executes — persist, not
  lazy localCheckpoint: under AQE the latter materializes shuffle
  stages at build time, so it is not job-free;
* the (favorite_type × fold) encoding relation is tiny and broadcasts
  back;
* split/fold assignment is the engine-independent md5 bucket — a
  training split must survive an engine swap byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_embargo_spark.catalog import load_table
from etl_embargo_spark.operators.analytics import FEATURE_EVENT_TYPES
from etl_embargo_spark.operators.sampling import (
    N_BUCKETS,
    TRAIN_UPTO,
    VAL_UPTO,
    hash_bucket,
)

FEATURE_EPOCH = "2024-01-01"
FEATURE_FOLDS = 5


def q_feature_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training table: per-user activity features, a
    net-purchaser label, a deterministic train/val/test split, and the
    out-of-fold mean-label encoding of the user's favorite event type.

    Engine determinism: counts and day arithmetic are integers; the
    favorite type is a fixed-order CASE over exact counts; the encoding
    is integer sums with one final division (0-denominator guarded by
    falling back to the type's overall mean)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit(FEATURE_EPOCH).cast("date")
    )
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        *[
            F.sum((F.col("event_type") == t).cast("bigint")).alias(
                f"n_{t}"
            )
            for t in FEATURE_EVENT_TYPES
        ],
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,2)"),
            )
        ).alias("purchase_total"),
        F.min(day).alias("first_day"),
        F.max(day).alias("last_day"),
    )
    best = F.greatest(*[F.col(f"n_{t}") for t in FEATURE_EVENT_TYPES])
    fav = F.lit(None).cast("string")
    for t in reversed(FEATURE_EVENT_TYPES):
        fav = F.when(F.col(f"n_{t}") == best, F.lit(t)).otherwise(fav)
    bucket = hash_bucket(F.col("user_id").cast("string"), N_BUCKETS)
    split = (
        F.when(bucket < TRAIN_UPTO, F.lit("train"))
        .when(bucket < VAL_UPTO, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    fold = hash_bucket(
        F.concat_ws(":", F.lit("fold"), F.col("user_id").cast("string")),
        FEATURE_FOLDS,
    )
    staged = (
        per_user.withColumn("favorite_type", fav)
        .withColumn(
            "label",
            (F.col("n_purchase") > F.col("n_error")).cast("int"),
        )
        .withColumn("split", split)
        .withColumn("fold", fold)
        # two consumers: the encoding cells + the final table
        .persist()
    )
    cells = staged.groupBy("favorite_type", "fold").agg(
        F.sum("label").alias("s"), F.count(F.lit(1)).alias("n")
    )
    wt = Window.partitionBy("favorite_type")
    enc = cells.select(
        "favorite_type",
        "fold",
        F.when(
            (F.sum("n").over(wt) - F.col("n")) > 0,
            (F.sum("s").over(wt) - F.col("s"))
            / (F.sum("n").over(wt) - F.col("n")),
        )
        .otherwise(F.sum("s").over(wt) / F.sum("n").over(wt))
        .alias("te_raw"),
    )
    out = staged.join(F.broadcast(enc), ["favorite_type", "fold"])
    return out.select(
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        *[
            F.col(f"n_{t}").cast("bigint").alias(f"n_{t}")
            for t in FEATURE_EVENT_TYPES
        ],
        F.coalesce(F.col("purchase_total"), F.lit(0))
        .cast("double")
        .alias("purchase_total"),
        F.col("first_day").cast("int").alias("first_day"),
        (F.col("last_day") - F.col("first_day"))
        .cast("int")
        .alias("days_span"),
        "favorite_type",
        "label",
        "split",
        F.col("fold").cast("int").alias("fold"),
        F.round(F.col("te_raw"), 6).alias("te_favorite"),
    )
