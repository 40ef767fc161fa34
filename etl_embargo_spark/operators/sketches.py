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

from pyspark.sql import DataFrame, SparkSession, Window
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
                # collapses the batch first
                for tok, c in pdf["token"].value_counts().items():
                    counts[tok] = counts.get(tok, 0) + int(c)
            # hash ONCE per partition-distinct type, after all batches —
            # md5 is a per-call Python cost, and hashing per (batch,
            # type) made partition cost ∝ batches × vocabulary (measured
            # at sf1 on the 10k-type corpus); summing into the matrix
            # from the final counts dict is commutative, so the sketch
            # is bit-identical
            for tok, c in counts.items():
                for r in range(depth):
                    mat[r, _h(tok, r)] += c
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


BLOOM_BITS_PER_KEY = 8  # m = BLOOM_BITS_PER_KEY x probed population
BLOOM_K = 3  # hash functions


def _bloom_pos(key, row, m: int):
    """Row-seeded md5 bit position in [0, m) — the same
    engine-independent md5-slice idiom as :func:`_kmv_hash`."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", row.cast("string"), key)), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % m
    )


def q_bloom_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership audit: insert the urgent-priority order
    keys into an m=BLOOM_M, k=BLOOM_K Bloom filter, probe it with EVERY
    order key, and report the EXACT false-positive count against ground
    truth — the sketch that powers runtime join filters (Spark's own
    bloomFilter injection, enabled in session.py) built explicitly so
    its merge algebra and error are visible and testable.

    Scale shape: the filter state is the distinct-bit-position relation
    — at most m rows whatever the inserted cardinality (the explode is
    k rows per key, collapsed map-side by the distinct) — and it
    broadcasts into the probe join exactly like a production runtime
    filter ships to scan tasks.  Probes reduce per key with a map-side
    combined count; a key is bloom-positive iff all k of its probe rows
    hit.  Hashes are md5 slices, so the bit pattern — and therefore the
    exact FP set — is deterministic across engines, runs, and
    partitionings, which is what makes a SKETCH oracle-checkable.

    m is CORPUS-DERIVED (BLOOM_BITS_PER_KEY bits per probed key, from
    the parquet footer count — job-free), so the fill fraction and FPR
    stay in the useful regime at every SF; a fixed m saturates to
    FPR≈1 at 10x the design size (measured: 16384 bits is 99.6% full
    at sf0.1).  The oracle recomputes the same m as 8*count(*)."""
    from etl_embargo_spark.catalog import table_rows

    m = BLOOM_BITS_PER_KEY * table_rows(sf_dir, "orders", default=1_500)
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        F.col("o_orderkey").cast("string").alias("k"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias(
            "member"
        ),
    )
    pos = keyed.select(
        "k",
        "member",
        F.explode(
            F.array(*[F.lit(i) for i in range(BLOOM_K)])
        ).alias("r"),
    ).select(
        "k", "member", _bloom_pos(F.col("k"), F.col("r"), m).alias("p")
    )
    # two consumers of the position lineage (filter build + probe):
    # cache it rather than hash 2x3n md5s
    pos = pos.persist()
    bits = pos.filter(F.col("member") == 1).select("p").distinct()
    hits = (
        pos.join(F.broadcast(bits), "p")
        .groupBy("k", "member")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    n_fp = hits.filter(
        (F.col("member") == 0) & (F.col("n_hit") == BLOOM_K)
    ).agg(F.count(F.lit(1)).alias("n_fp"))
    n_bits = bits.agg(F.count(F.lit(1)).alias("n_bits_set"))
    base = keyed.agg(
        F.sum("member").cast("bigint").alias("n_inserted"),
        F.sum(1 - F.col("member")).cast("bigint").alias("n_true_neg"),
    )
    return (
        base.crossJoin(F.broadcast(n_bits))
        .crossJoin(F.broadcast(n_fp))
        .select(
            F.lit(m).cast("bigint").alias("m"),
            F.lit(BLOOM_K).alias("k"),
            "n_inserted",
            "n_bits_set",
            "n_true_neg",
            "n_fp",
            # exact ints, one IEEE division each: engine-identical
            F.round(
                F.col("n_fp").cast("double") / F.col("n_true_neg"), 6
            ).alias("fpr"),
            F.round(
                F.col("n_bits_set").cast("double") / F.lit(float(m)), 6
            ).alias("fill_frac"),
        )
    )


KMV_K = 64  # sketch size: k smallest hashes retained per population
KMV_BITS = 60  # 15 md5 hex chars -> [0, 2^60) integer hash


def _kmv_hash(key):
    """60-bit engine-independent hash (md5 slice, same idiom as
    sampling.hash_bucket) — small enough for exact BIGINT compares on
    both engines, fine enough that k-th-order-statistic estimates
    resolve at any realistic cardinality."""
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")


def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) sketch overlap of two behavioral
    populations — purchase-days vs click-days — estimating each
    cardinality ((k−1)/u₍k₎), the union, the Jaccard and the
    intersection from three k-item sketches, with the exact values
    alongside as the audit columns.

    This is the distinct-count-INTERSECTION question HLL alone cannot
    answer (HLL unions trivially but not intersects); KMV sketches
    intersect by construction: the k smallest of A∪B are a subset of
    topA ∪ topB, and membership within that range is exact.

    Scale shape: each population collapses to distinct user-day keys
    (map-side combined); ONE pass then builds BOTH population sketches:
    keys explode into per-population tags and the PARTITIONED rank
    filter compiles to WindowGroupLimit, truncating every map task to k
    rows per population before the single pop-keyed exchange (an
    unpartitioned row_number would single-partition the population —
    verified Spark does not group-limit that; and per-population
    orderBy+limit subtrees would re-scan the log once per consumer).
    The ≤2k-row sketch relation is lazily localCheckpoint'ed and shared
    by every consumer.  The sketch is mergeable state: k integers
    per population, the same contract as the CMS partials above.
    Hashes are md5 slices, so estimates are deterministic across
    engines, runs, and partitionings (no HLL register noise) — which
    is what makes this oracle-checkable at all."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.groupBy(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("day"),
    ).agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("p"),
        F.max((F.col("event_type") == "click").cast("int")).alias("c"),
    )
    h = _kmv_hash(
        F.concat_ws("-", F.col("user_id"), F.col("day"))
    ).alias("h")
    keyed = ud.select(h, "p", "c")

    # ONE pass builds both sketches: tag each key with its population
    # memberships, explode, per-pop k-smallest via row_number — the
    # PARTITIONED rank filter compiles to WindowGroupLimit (map tasks
    # truncate to k per pop before the one pop-keyed exchange).  The
    # ≤2k-row result is lazily localCheckpoint'ed so its five consumers
    # below share one materialization instead of re-scanning the log.
    pops = keyed.select(
        "h",
        F.explode(
            F.expr(
                "filter(array(IF(p=1,'a',NULL), IF(c=1,'b',NULL)),"
                " x -> x IS NOT NULL)"
            )
        ).alias("pop"),
    )
    w_pop = Window.partitionBy("pop").orderBy("h")
    tops = (
        pops.withColumn("rk", F.row_number().over(w_pop))
        .filter(F.col("rk") <= KMV_K)
        .select("pop", "h")
        .localCheckpoint(eager=False)
    )
    pow2 = float(2**KMV_BITS)

    def est(n_col, kth_col):
        # sketch not full => it IS the population; else (k-1)/u_k
        return F.when(
            F.col(n_col) < KMV_K, F.col(n_col).cast("double")
        ).otherwise(
            (KMV_K - 1) * F.lit(pow2) / F.col(kth_col)
        )

    sk_a = tops.filter(F.col("pop") == "a").agg(
        F.count(F.lit(1)).alias("n_a"), F.max("h").alias("kth_a")
    )
    sk_b = tops.filter(F.col("pop") == "b").agg(
        F.count(F.lit(1)).alias("n_b"), F.max("h").alias("kth_b")
    )
    merged = tops.groupBy("h").agg(
        F.max((F.col("pop") == "a").cast("int")).alias("in_a"),
        F.max((F.col("pop") == "b").cast("int")).alias("in_b"),
    )
    top_u = merged.orderBy("h").limit(KMV_K)
    sk_u = top_u.agg(
        F.count(F.lit(1)).alias("n_u"),
        F.max("h").alias("kth_u"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
    )
    exact = keyed.agg(
        F.sum("p").alias("exact_a"),
        F.sum("c").alias("exact_b"),
        F.sum(F.col("p") * F.col("c")).alias("exact_both"),
    )
    est_u = est("n_u", "kth_u")
    jacc = F.col("n_both") / F.least(F.col("n_u"), F.lit(KMV_K))
    return (
        sk_a.crossJoin(sk_b)
        .crossJoin(sk_u)
        .crossJoin(exact)
        .select(
            F.lit(KMV_K).alias("k"),
            F.round(est("n_a", "kth_a"), 4).alias("est_a"),
            F.round(est("n_b", "kth_b"), 4).alias("est_b"),
            F.round(est_u, 4).alias("est_union"),
            F.round(jacc, 6).alias("est_jaccard"),
            F.round(jacc * est_u, 4).alias("est_intersection"),
            F.col("exact_a").cast("bigint").alias("exact_a"),
            F.col("exact_b").cast("bigint").alias("exact_b"),
            F.col("exact_both").cast("bigint").alias("exact_both"),
        )
    )
