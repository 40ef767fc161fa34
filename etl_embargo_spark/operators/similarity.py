"""Similarity search over an embedding column (north-star extension).

Two paths:
* ``brute_force_topk`` — exact cosine top-k against a query vector; the dot
  product is a codegen'd ``zip_with``/``aggregate`` fold, so the scan is one
  stage and the only shuffle is the global top-k (TakeOrderedAndProject —
  per-partition heaps, driver merges k rows, never a full sort at scale).
* ``ivf_assign``/``q_ann_ivf`` — IVF-style two-stage search: assign every
  vector to its nearest of K deterministic centroids (scan-side), search
  only the ``nprobe`` buckets nearest the query.  The scale path: touches
  ~(nprobe/K) of the data; recall is tuned by nprobe (nprobe=K degenerates
  to brute force).  Centroid assignment and probe ranking use the SAME
  Spark expressions, so driver and executors can never disagree on the
  hash family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_embargo_spark.catalog import load_table


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda v: v.cast("double") * v.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    )


def _centroid(c: int, dim: int) -> Column:
    """Deterministic pseudo-centroid c: ±1 pattern from murmur hash — stable
    across runs with no training pass (a kmeans fit can replace this
    without changing the query path)."""
    return F.array(
        *[
            F.when(F.pmod(F.hash(F.lit(c * 131 + i)), 2) == 0, F.lit(1.0))
            .otherwise(F.lit(-1.0))
            for i in range(dim)
        ]
    )


def cosine_to_query(emb: DataFrame, query: list[float]) -> DataFrame:
    """Annotate every vector with its cosine similarity to ``query``."""
    q = F.array(*[F.lit(float(v)) for v in query])
    cos = _dot(F.col("embedding"), q) / (_norm(F.col("embedding")) * _norm(q))
    return emb.select("vec_id", F.round(cos, 6).alias("cosine"))


def brute_force_topk(emb: DataFrame, query: list[float], k: int = 10) -> DataFrame:
    """Exact top-k by cosine; ties broken by vec_id for determinism."""
    scored = cosine_to_query(emb, query)
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def ivf_assign(emb: DataFrame, n_centroids: int, dim: int) -> DataFrame:
    """Add ``centroid_id`` = argmax dot(embedding, centroid_c) — one pass,
    all built-ins."""
    sims = F.array(
        *[_dot(F.col("embedding"), _centroid(c, dim)) for c in range(n_centroids)]
    )
    return (
        emb.withColumn("_sims", sims)
        .withColumn(
            "centroid_id",
            (F.expr("array_position(_sims, array_max(_sims))") - 1).cast("int"),
        )
        .drop("_sims")
    )


def probe_order(
    spark: SparkSession, query: list[float], n_centroids: int
) -> list[int]:
    """Rank centroids by similarity to the query with ONE tiny Spark job
    using the same expressions as ivf_assign."""
    dim = len(query)
    qdf = spark.createDataFrame([([float(v) for v in query],)], "embedding array<double>")
    row = qdf.select(
        F.array(
            *[_dot(F.col("embedding"), _centroid(c, dim)) for c in range(n_centroids)]
        ).alias("sims")
    ).first()
    sims = list(row["sims"])
    return sorted(range(n_centroids), key=lambda c: -sims[c])


def ivf_topk(
    spark: SparkSession,
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF search: score only vectors in the nprobe buckets nearest the
    query."""
    assigned = ivf_assign(emb, n_centroids, len(query))
    probe = probe_order(spark, query, n_centroids)[:nprobe]
    pruned = assigned.filter(F.col("centroid_id").isin(probe))
    scored = cosine_to_query(pruned, query)
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def knn_join(emb: DataFrame, k: int = 5) -> DataFrame:
    """Batch k-nearest-neighbors self-join: every vector's approximate
    top-k neighbors by cosine.

    The all-pairs problem at 100 TB cannot be a cross join; candidates come
    from the multi-table hyperplane LSH (dedup.embedding_near_dups with the
    threshold disabled), are scored exactly, then cut to k per vector with
    a rank window.  Candidate pairs are undirected — both directions are
    materialized before ranking so every vector gets its own neighbor list.
    Recall is the LSH table recall (tested against brute force); raise
    n_tables for more.
    """
    from pyspark.sql import Window

    from etl_embargo_spark.operators.dedup import embedding_near_dups

    pairs = embedding_near_dups(emb, threshold=-1.0)
    directed = pairs.unionByName(
        pairs.select(
            F.col("vec_b").alias("vec_a"),
            F.col("vec_a").alias("vec_b"),
            "cosine",
        )
    )
    w = Window.partitionBy("vec_a").orderBy(
        F.col("cosine").desc(), F.col("vec_b")
    )
    return (
        directed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("vec_a").alias("vec_id"),
            F.col("vec_b").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only: approximate per-vector top-5 neighbors (pytest checks
    recall vs the brute-force neighbor lists)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_join(emb, k=5)


def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    row = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return [float(v) for v in row["embedding"]]


def q_topk_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors of vec_id 0 (excluding itself)."""
    emb = load_table(spark, sf_dir, "embeddings")
    query = _query_vector(spark, sf_dir, 0)
    scored = cosine_to_query(emb.filter(F.col("vec_id") != 0), query)
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(10)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN top-10 for vec_id 0 (rows-only; pytest checks
    recall vs brute force)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    query = _query_vector(spark, sf_dir, 0)
    return ivf_topk(spark, emb, query, k=10, n_centroids=16, nprobe=4)
