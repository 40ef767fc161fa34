"""Graph analytics over relations (north-star extension): PageRank by
power iteration.

Together with ``dedup.dedup_clusters`` (connected components) this covers
the iterative-algorithm class the engine must support beyond SQL: per
round one join + one aggregate, the rank relation ``localCheckpoint``ed so
the lineage stays flat (without it Catalyst re-plans an exponentially
growing tree — same mechanics as the cluster loop, see dedup.py).

The reference has nothing graph-shaped; the input here is the co-purchase
pair graph (same single-scan bucket-groupBy pair generation as
``analytics.q_copurchase``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_embargo_spark.catalog import load_table

PR_DAMPING = 0.85
PR_ITERS = 8


def pagerank(
    edges: DataFrame, damping: float = PR_DAMPING, n_iters: int = PR_ITERS
) -> DataFrame:
    """(id, rank) after ``n_iters`` power iterations over a directed edge
    list (pass both directions for an undirected graph — then there are
    no dangling nodes and the plain update rule applies).

    Fixed iteration count, not a convergence test: deterministic cost,
    deterministic result, and no per-round driver scalar beyond the
    eager checkpoint.  Each round shuffles (edge ⋈ rank) on the node key
    — the degree table and rank relation are O(nodes), edges dominate,
    exactly the profile that scales out."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = edges.select(F.col("src").alias("id")).distinct()
    n_row = nodes.agg(F.count(F.lit(1)).alias("_n"))
    # attach the node count ONCE, outside the loop: (id, _n) is
    # checkpointed and reused every round — broadcasting the one-row
    # count per iteration would pin n_iters broadcast blobs on the
    # driver for no reason (observed driver-memory pressure at sf0.1
    # in a long default-heap session)
    nodes_n = nodes.crossJoin(F.broadcast(n_row)).localCheckpoint()
    ranks = nodes_n.select(
        "id", (F.lit(1.0) / F.col("_n")).alias("rank")
    )
    for _ in range(n_iters):
        contribs = (
            edges.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("_c"))
            .withColumnRenamed("dst", "id")
        )
        ranks = (
            nodes_n.join(contribs, "id", "left")
            .select(
                "id",
                (
                    (1.0 - damping) / F.col("_n")
                    + damping * F.coalesce(F.col("_c"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def copurchase_edges(li: DataFrame) -> DataFrame:
    """Symmetric (src, dst) part-pair edges from shared orders — the
    bucket-groupBy pair shape, one lineitem scan."""
    from etl_embargo_spark.operators.dedup import _bucket_pairs

    # collect_set in the expansion dedups within the order — no distinct
    # pre-pass (see analytics.q_copurchase)
    items = li.select("l_orderkey", "l_partkey")
    pairs = _bucket_pairs(
        items,
        ["l_orderkey"],
        F.struct(F.col("l_partkey").alias("p")),
        max_bucket=None,
    ).select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
    pairs = pairs.distinct()
    return pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only (iterative): PageRank over the co-purchase part graph;
    pytest holds a pure-Python power-iteration oracle on the same edges
    (tests/test_extensions.py::TestPageRank)."""
    li = load_table(spark, sf_dir, "lineitem")
    ranks = pagerank(copurchase_edges(li))
    return ranks.select("id", F.round("rank", 8).alias("rank"))
