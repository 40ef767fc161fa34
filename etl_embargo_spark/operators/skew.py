"""Skew mitigation for joins on hot keys — the manual fallback when AQE's
skew-join split (enabled in session.py) can't help: e.g. a shuffled join
where one key holds a double-digit percent of the fact table and the dim
side is too large to broadcast.

The salted join rewrites ``fact ⋈ dim ON key`` as
``fact ⋈ dim' ON (key, salt)`` where every fact row picks one deterministic
salt and the dim side is replicated across all salts: the hot key's rows
spread over ``n_salts`` reducers instead of one straggler task.  Cost is an
``n_salts×`` replication of the dim relation — choose n_salts ≈ the skew
factor, not more.

Aggregations need no salting in Spark: HashAggregate is already
partial+final (map-side combine), so a hot group collapses to one partial
row per map task before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_embargo_spark.catalog import load_table

DEFAULT_SALTS = 8


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join; result is identical to
    ``fact.join(dim, key, how)`` for inner/left joins.

    The fact-side salt is ``hash(entire row) mod n_salts`` — deterministic
    (rerun-stable, required for ST3 idempotency) yet spread across salts
    even when all hot-key rows share the same join key.

    Only inner/left/left_semi are supported: under right/full-outer joins
    the replicated dim copies that match no fact salt would surface as
    spurious unmatched rows, so those modes are rejected loudly.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi joins, got {how!r}: "
            "dim-side replication breaks right/full-outer semantics"
        )
    fact_s = fact.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    )
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return fact_s.join(dim_s, [key, "_salt"], how).drop("_salt")


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted join as a driver query: lineitem ⋈ supplier on suppkey
    through the (key, salt) rewrite — results must be identical to the
    plain join, which is exactly what the DuckDB oracle states."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey"
    )
    dim = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    return salted_join(li, dim, "l_suppkey").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "s_nationkey"
    )


SKEW_KEYS = ("l_suppkey", "l_orderkey", "l_partkey")


def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis: for each candidate join key of the fact
    table, the distribution of group sizes (p50/p99/max, distinct keys,
    mean) — the numbers that decide broadcast vs shuffle vs salt vs AQE
    skew-join BEFORE the join is written.  max/p99 >> p50 means a salted
    join or AQE split; tiny n_keys means broadcast the other side.

    Scale shape: one scan per key (count aggregates are map-side
    combined, the exchange carries O(keys)); the percentile pass runs
    over the key-count relation, which is dim-sized."""
    import functools

    li = load_table(spark, sf_dir, "lineitem")
    outs = []
    for key in SKEW_KEYS:
        counts = li.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
        outs.append(
            counts.agg(
                F.lit(key).alias("join_key"),
                F.count(F.lit(1)).alias("n_keys"),
                F.min("n").alias("min_n"),
                F.round(F.percentile("n", F.lit(0.5)), 4).alias("p50"),
                F.round(F.percentile("n", F.lit(0.99)), 4).alias("p99"),
                F.max("n").alias("max_n"),
                F.round(F.avg("n"), 4).alias("avg_n"),
            )
        )
    return functools.reduce(lambda a, b: a.unionByName(b), outs)


def q_ri_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for every foreign-key
    edge of the star schema in one report — the data-quality gate a
    pipeline runs after ingest, before anything joins.

    Scale shape: each edge is a LEFT ANTI join with the dim's key side
    broadcast (keys only, deduped by the build), so each fact is scanned
    once and never shuffled; the per-edge count collapses map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    edges = [
        ("lineitem.l_orderkey->orders", li.select(F.col("l_orderkey").alias("k")),
         orders.select(F.col("o_orderkey").alias("k"))),
        ("lineitem.l_partkey->part", li.select(F.col("l_partkey").alias("k")),
         load_table(spark, sf_dir, "part").select(F.col("p_partkey").alias("k"))),
        ("lineitem.l_suppkey->supplier", li.select(F.col("l_suppkey").alias("k")),
         load_table(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("k"))),
        ("orders.o_custkey->customer", orders.select(F.col("o_custkey").alias("k")),
         load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))),
    ]
    import functools

    outs = [
        fact.join(F.broadcast(dim.distinct()), "k", "left_anti").agg(
            F.lit(name).alias("fk_edge"),
            F.count(F.lit(1)).alias("n_orphans"),
        )
        for name, fact, dim in edges
    ]
    return functools.reduce(lambda a, b: a.unionByName(b), outs)


# ---------------------------------------------------------------------------
# Join-size estimation (pre-join cost model)
# ---------------------------------------------------------------------------


def q_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join cardinality estimation: |A ⋈ B| computed EXACTLY without
    executing the join — Σ over shared keys of cntA(k)·cntB(k), for the
    three candidate lineitem join edges (orders FK, part and supplier
    many-to-many) plus each edge's worst single-key contribution — the
    cost-model input that says "this equi-join fans out 7×, broadcast
    something else" before any shuffle is paid (the q_skew_profile
    companion, aggregated to a decision number).

    Scale shape: each side collapses to per-key counts first (map-side
    combined); the count relations join on the key (distinct-key-sized,
    never row-sized) and one final rollup emits a 3-row answer.

    Engine determinism: everything is exact integer counts and
    products."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")

    def _edge(a: DataFrame, acol: str, b: DataFrame, bcol: str,
              name: str) -> DataFrame:
        ca = a.groupBy(F.col(acol).alias("k")).agg(
            F.count(F.lit(1)).alias("ca")
        )
        cb = b.groupBy(F.col(bcol).alias("k")).agg(
            F.count(F.lit(1)).alias("cb")
        )
        prod = ca.join(cb, "k").select(
            (F.col("ca") * F.col("cb")).alias("p")
        )
        return prod.groupBy().agg(
            F.lit(name).alias("join_edge"),
            F.count(F.lit(1)).alias("n_shared_keys"),
            F.sum("p").alias("est_rows"),
            F.max("p").alias("max_key_rows"),
        ).select("join_edge", "n_shared_keys", "est_rows", "max_key_rows")

    return (
        _edge(li, "l_orderkey", orders, "o_orderkey", "lineitem-orders")
        .unionAll(_edge(li, "l_partkey", part, "p_partkey", "lineitem-part"))
        .unionAll(
            _edge(
                li, "l_suppkey", supplier, "s_suppkey", "lineitem-supplier"
            )
        )
    )
