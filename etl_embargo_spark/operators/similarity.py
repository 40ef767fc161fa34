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

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_embargo_spark.catalog import load_table, spread_for_cpu


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


SIGN_SEED = 42


def sign_matrix(n_rows: int, dim: int, seed: int = SIGN_SEED):
    """Deterministic ±1 matrix (seeded PCG64) shared by the IVF pseudo-
    centroids and the hyperplane LSH planes.  Computed driver-side in
    numpy and shipped by value inside the kernel closures — NOT as a
    per-row Spark expression: a ±1 dictionary spelled as column
    expressions evaluates hash+CASE per element per row interpreted
    (measured 20s+ for 16 centroids × 64 dims × 2k vectors at sf0.1,
    vs <1s as an Arrow-batched matmul)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return (rng.integers(0, 2, size=(n_rows, dim)) * 2 - 1).astype(np.float64)


def cosine_score_pairs(pairs: DataFrame, emb: DataFrame) -> DataFrame:
    """Exact cosine for candidate (vec_a, vec_b) pairs, Arrow-batched:
    after joining each side's embedding, every batch scores with two
    einsum calls (row-wise dot + norms) — at 800k candidate pairs the
    per-pair ``aggregate``/``zip_with`` expression fold was ~10s of
    interpreted per-element work, the numpy kernel is milliseconds.

    The joins shuffle (pair, 64-float array) rows — the standard verify
    shape; candidate volume, not vector width, is what must be controlled
    upstream (bucket caps, plane counts)."""
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    joined = pairs.join(ea, "vec_a").join(eb, "vec_b")

    def _score(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if len(pdf) == 0:
                yield _pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
                continue
            a = _np.vstack(pdf["emb_a"].to_numpy()).astype(_np.float64)
            b = _np.vstack(pdf["emb_b"].to_numpy()).astype(_np.float64)
            dots = _np.einsum("ij,ij->i", a, b)
            norms = _np.sqrt(_np.einsum("ij,ij->i", a, a)) * _np.sqrt(
                _np.einsum("ij,ij->i", b, b)
            )
            yield _pd.DataFrame(
                {
                    "vec_a": pdf["vec_a"],
                    "vec_b": pdf["vec_b"],
                    "cosine": _np.round(dots / norms, 6),
                }
            )

    return joined.mapInPandas(
        _score, schema="vec_a long, vec_b long, cosine double"
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
    """Add ``centroid_id`` = argmax dot(embedding, centroid_c), via one
    Arrow-batched GEMM per batch: (batch × dim) @ (dim × K) + argmax —
    the FAISS-style assignment shape, and the right one at 100 TB (the
    centroid dictionary is a broadcast-sized constant; the scan stays one
    pass; each batch is one BLAS call, no per-row expression work).

    The seeded ±1 pseudo-centroids need no training pass; a kmeans fit can
    replace ``sign_matrix`` without changing the query path."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    centroids = sign_matrix(n_centroids, dim)
    # fresh StructType — StructType.add would mutate the DataFrame's cached
    # schema object in place and desynchronize df.columns from the plan
    out_schema = StructType(
        list(emb.schema.fields) + [StructField("centroid_id", IntegerType())]
    )

    def _make_assign(cm):
        # nested factory: the closure ships by value (cloudpickle), so the
        # kernel works even when this repo is not importable on executors
        def _assign(batches):
            import numpy as _np

            for pdf in batches:
                e = _np.vstack(pdf["embedding"].to_numpy()).astype(_np.float64)
                pdf = pdf.copy()
                pdf["centroid_id"] = (e @ cm.T).argmax(axis=1).astype("int32")
                yield pdf

        return _assign

    return emb.mapInPandas(_make_assign(centroids), schema=out_schema)


def probe_order(query: list[float], n_centroids: int) -> list[int]:
    """Rank centroids by similarity to the query — pure numpy against the
    same ``sign_matrix`` the executors use (no job, nothing to disagree
    on)."""
    import numpy as np

    sims = sign_matrix(n_centroids, len(query)) @ np.asarray(query, dtype=np.float64)
    return [int(c) for c in np.argsort(-sims, kind="stable")]


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
    probe = probe_order(query, n_centroids)[:nprobe]
    pruned = assigned.filter(F.col("centroid_id").isin(probe))
    scored = cosine_to_query(pruned, query)
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def _make_knn_bucket_scorer(k: int, max_bucket: int):
    """applyInPandas kernel factory (nested per the cloudpickle by-value
    rule): per LSH (table, bucket), every member's top-k in-bucket
    neighbors by exact cosine.

    Per-bucket top-k is LOSSLESS for the global top-k merge: a bucket
    member outranked by ≥ k same-bucket vectors under the (cosine desc,
    vec_id asc) total order cannot enter the global top-k either — so
    cutting here shrinks the downstream shuffle from candidate-pair
    volume (12.5M pairs × two 64-float joins at sf1) to members × k
    id-sized rows while producing bit-identical neighbor lists.  Dots
    and norms are the same row-wise float64 einsum as
    ``cosine_score_pairs`` (fixed-order per-row folds — batch
    composition cannot move an ulp), and the 6-dp np.round matches it
    too, so a pair scored in several buckets yields the identical
    double everywhere and the cross-table groupBy-max dedups exactly.
    Buckets larger than ``max_bucket`` are dropped, mirroring the
    `_bucket_pairs` degenerate-key cap the pinned output was generated
    under."""

    def _score(pdf):
        import numpy as _np
        import pandas as _pd

        empty = _pd.DataFrame(
            {
                "vec_a": _np.array([], dtype=_np.int64),
                "vec_b": _np.array([], dtype=_np.int64),
                "cosine": _np.array([], dtype=_np.float64),
            }
        )
        if len(pdf) < 2:
            return empty
        # one kernel group covers MANY true buckets (bucket mod SEG): sort
        # and segment by the true bucket, pair within segments only
        pdf = pdf.sort_values(["bucket", "vec_id"]).reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy()
        buckets = pdf["bucket"].to_numpy()
        e = _np.vstack(pdf["embedding"].to_numpy()).astype(_np.float64)
        norms = _np.sqrt(_np.einsum("ij,ij->i", e, e))
        starts = _np.r_[
            0, _np.flatnonzero(buckets[1:] != buckets[:-1]) + 1, len(pdf)
        ]
        # occupancy-class batching (r12): a group holds ~2k true buckets
        # and the old per-bucket loop paid ~10 numpy-call overheads per
        # bucket — the kernel's measured cost was loop overhead, not
        # GEMM.  Bucket sizes cluster tightly around the LSH occupancy
        # target, so building the triangle indices ONCE per DISTINCT
        # size (broadcast-added to that size's segment starts) turns the
        # whole group into a handful of vector ops; the einsum then runs
        # over cache-sized pair chunks (the q_dedup_levenshtein lesson:
        # a monolithic (pairs, dim) gather re-streams from DRAM and at
        # sf3 would allocate ~450 MB per worker).  Output-identical: the
        # per-pair dots are the same row-wise float64 einsum (batch
        # composition cannot move an ulp) and the lexsort below imposes
        # a total order, so pair production order is irrelevant.
        seg_sizes = _np.diff(starts)
        seg_starts = starts[:-1]
        valid = seg_sizes >= 2
        if max_bucket is not None:
            # oversize buckets dropped — mirrors the _bucket_pairs
            # degenerate-key cap the pinned output was generated under
            valid &= seg_sizes <= max_bucket
        vstarts = seg_starts[valid]
        vsizes = seg_sizes[valid]
        if len(vstarts) == 0:
            return empty
        gi_parts, gj_parts = [], []
        for c_n in _np.unique(vsizes):
            iu, ju = _np.triu_indices(int(c_n), k=1)
            ss = vstarts[vsizes == c_n]
            gi_parts.append((ss[:, None] + iu[None, :]).ravel())
            gj_parts.append((ss[:, None] + ju[None, :]).ravel())
        gi = _np.concatenate(gi_parts)
        gj = _np.concatenate(gj_parts)
        cos = _np.empty(len(gi), dtype=_np.float64)
        _CHUNK = 32768
        for ofs in range(0, len(gi), _CHUNK):
            ci = gi[ofs : ofs + _CHUNK]
            cj = gj[ofs : ofs + _CHUNK]
            dots = _np.einsum("ij,ij->i", e[ci], e[cj])
            cos[ofs : ofs + _CHUNK] = _np.round(
                dots / (norms[ci] * norms[cj]), 6
            )
        a = _np.concatenate([ids[gi], ids[gj]])
        b = _np.concatenate([ids[gj], ids[gi]])
        c = _np.concatenate([cos, cos])
        # per-vector top-k across the group: each vector has exactly one
        # bucket per table, and a group holds one table's segment, so
        # keying on vec alone IS per-bucket top-k
        order = _np.lexsort((b, -c, a))
        a, b, c = a[order], b[order], c[order]
        starts = _np.r_[0, _np.flatnonzero(a[1:] != a[:-1]) + 1]
        sizes = _np.diff(_np.r_[starts, len(a)])
        rank = _np.arange(len(a)) - _np.repeat(starts, sizes)
        keep = rank < k
        return _pd.DataFrame(
            {"vec_a": a[keep], "vec_b": b[keep], "cosine": c[keep]}
        )

    return _score


def knn_join(
    emb: DataFrame,
    k: int = 5,
    planes_per_table: int = 4,
    n_tables: int = 8,
) -> DataFrame:
    """Batch k-nearest-neighbors self-join: every vector's approximate
    top-k neighbors by cosine.

    The all-pairs problem at 100 TB cannot be a cross join; candidates
    are same-bucket pairs of the multi-table hyperplane LSH
    (dedup._make_lsh_bucketer planes).  Round-4 shape: each bucket
    scores and cuts to top-k INSIDE one Arrow kernel (see
    _make_knn_bucket_scorer — output-identical to scoring every
    candidate pair, proven by the shared tie-break total order), so
    each embedding crosses the wire once per table membership and the
    only pair-grain relations are members × k id-sized rows (the
    superseded candidate-pair einsum joined two 64-float arrays onto
    12.5M distinct pairs: 27.5 s at sf1, now ~7 s).  The cross-table
    dedup is a groupBy-max over identical doubles; the final global
    top-k is a per-vector rank window.  Recall is the LSH table recall
    (tested against brute force); size (planes_per_table, n_tables)
    from the corpus via ``dedup.lsh_params`` — fixed table sizing is
    exactly what collapses recall at 100× via max_bucket drops.
    """
    from pyspark.sql import Window

    from etl_embargo_spark.operators.dedup import _make_lsh_bucketer

    bucketed = emb.select("vec_id", "embedding").mapInPandas(
        _make_lsh_bucketer(7, planes_per_table, n_tables),
        schema="vec_id long, table_id int, bucket long",
    )
    # attach embeddings JVM-side: small corpora auto-broadcast the vector
    # relation; at 100 TB this is a co-partitionable equi-join, and either
    # way the vectors never round-trip through a Python membership loop
    # (a carry-through-the-bucketer variant spent 23 s at sf1 building
    # 1.28M python array objects)
    with_vec = bucketed.join(emb.select("vec_id", "embedding"), "vec_id")
    # group on (table, bucket mod SEG): one kernel group covers many true
    # buckets (segmented in-kernel), keeping applyInPandas group count at
    # tables×SEG instead of tables×2^planes (65k groups of ~20 rows paid
    # more per-group overhead than kernel compute at sf1).  SEG is a
    # constant: when 2^planes ≤ SEG the mod is the identity and grouping
    # degenerates to exact buckets.
    spark = emb.sparkSession
    directed = (
        with_vec.withColumn("_seg", F.pmod("bucket", F.lit(64)))
        .repartition(
            spark.sparkContext.defaultParallelism, "table_id", "_seg"
        )
        .groupBy("table_id", "_seg")
        .applyInPandas(
            _make_knn_bucket_scorer(k, max_bucket=4096),
            schema="vec_a long, vec_b long, cosine double",
        )
    )
    best = directed.groupBy("vec_a", "vec_b").agg(
        F.max("cosine").alias("cosine")
    )
    w = Window.partitionBy("vec_a").orderBy(
        F.col("cosine").desc(), F.col("vec_b")
    )
    return (
        best.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("vec_a").alias("vec_id"),
            F.col("vec_b").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered checksum-rollup of :func:`knn_join` (pytest checks the
    detail neighbor lists' recall vs brute force): per-vector top-5
    neighbor rows grouped by vec_id % 8 into (grp, n_rows, rows_sum) —
    deterministic (seeded planes, per-pair cosine, tie-broken ranks), so
    pinnable as a literal DuckDB oracle."""
    from etl_embargo_spark.catalog import table_rows
    from etl_embargo_spark.operators.aggregates import rows_checksum
    from etl_embargo_spark.operators.dedup import lsh_params

    planes, tables = lsh_params(table_rows(sf_dir, "embeddings"))
    nn = knn_join(
        load_table(spark, sf_dir, "embeddings"),
        k=5,
        planes_per_table=planes,
        n_tables=tables,
    )
    return nn.groupBy((F.col("vec_id") % 8).cast("int").alias("grp")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        rows_checksum("vec_id", "neighbor_id", "rank", "cosine").alias(
            "rows_sum"
        ),
    )


def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    row = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return [float(v) for v in row["embedding"]]


def q_topk_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors of vec_id 0 (excluding itself).

    The query vector rides the plan as a broadcast one-row cross join
    (NOT a driver-side .first() baked into literals — builders stay
    job-free); _dot casts elements to double either way, so the numerics
    are unchanged."""
    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    e = F.col("embedding")
    q = F.col("qvec")
    cos = _dot(e, q) / (_norm(e) * _norm(q))
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qrow))
        .select("vec_id", F.round(cos, 6).alias("cosine"))
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(10)


def ivf_assign_lazy(emb: DataFrame, n_centroids: int) -> DataFrame:
    """``ivf_assign`` without a driver-known dim: the seeded sign matrix is
    generated IN-kernel from the first batch's vector width (lazy,
    empty-safe), so building the plan needs no Spark job to discover the
    embedding dimension.  Same centroids as :func:`ivf_assign` — both call
    ``default_rng(SIGN_SEED)`` on an (n_centroids × dim) shape."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    out_schema = StructType(
        list(emb.schema.fields) + [StructField("centroid_id", IntegerType())]
    )

    def _make_assign(k, seed):
        # nested factory: ships by value (cloudpickle); no repo import
        def _assign(batches):
            import numpy as _np

            cm = None
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                e = _np.vstack(pdf["embedding"].to_numpy()).astype(_np.float64)
                if cm is None:
                    rng = _np.random.default_rng(seed)
                    cm = (
                        rng.integers(0, 2, size=(k, e.shape[1])) * 2 - 1
                    ).astype(_np.float64)
                pdf = pdf.copy()
                pdf["centroid_id"] = (e @ cm.T).argmax(axis=1).astype("int32")
                yield pdf

        return _assign

    return emb.mapInPandas(_make_assign(n_centroids, SIGN_SEED), schema=out_schema)


def query_probe_set(qrow: DataFrame, n_centroids: int, nprobe: int) -> DataFrame:
    """Rank the seeded centroids against a ONE-ROW query relation and emit
    the nprobe nearest centroid ids — the plan-side replacement for
    ``probe_order`` (which needs the query vector as a driver-side list).
    Output: (centroid_id int), ≤ nprobe rows; meant to be broadcast into
    the bucket-pruning join."""
    def _make(k, p, seed):
        def _probes(batches):
            import numpy as _np
            import pandas as _pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                q = _np.asarray(pdf["qvec"].iloc[0], dtype=_np.float64)
                rng = _np.random.default_rng(seed)
                cm = (
                    rng.integers(0, 2, size=(k, q.size)) * 2 - 1
                ).astype(_np.float64)
                order = _np.argsort(-(cm @ q), kind="stable")[:p]
                yield _pd.DataFrame({"centroid_id": order.astype("int32")})

        return _probes

    return qrow.mapInPandas(
        _make(n_centroids, nprobe, SIGN_SEED), schema="centroid_id int"
    )


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN top-10 for vec_id 0 (rows-only; pytest checks
    recall vs brute force, and parity with the eager ``ivf_topk`` path).

    Job-free build: the query vector rides the plan as a broadcast one-row
    relation (as in ``q_topk_similarity``), bucket assignment generates the
    seeded centroids in-kernel from the batch dim, and the probe set is a
    broadcast ≤nprobe-row relation joined into the bucket filter — no
    ``.first()`` at construction time."""
    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    assigned = ivf_assign_lazy(emb.filter(F.col("vec_id") != 0), n_centroids=16)
    probes = query_probe_set(qrow, n_centroids=16, nprobe=4)
    pruned = assigned.join(F.broadcast(probes), "centroid_id")
    e, q = F.col("embedding"), F.col("qvec")
    cos = _dot(e, q) / (_norm(e) * _norm(q))
    scored = pruned.join(F.broadcast(qrow)).select(
        "vec_id", F.round(cos, 6).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(10)


def q_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm and component sum via array higher-order
    functions (F.aggregate) — the built-ins path for one-off array math.
    Elements are cast to double BEFORE multiplying (float*float would
    lose precision differently per engine); left-to-right list folding is
    the same order in Spark and DuckDB, so sums are IEEE-identical.

    This is deliberately the HOF counterpart to the numpy GEMM kernels
    used by the ANN/dedup paths: fine for a single pass over a column,
    20x+ interpreted overhead when it sits inside a hot pairwise loop
    (which is why the kernels exist)."""
    emb = load_table(spark, sf_dir, "embeddings")
    x2 = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    xsum = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.round(F.sqrt(x2), 6).alias("l2_norm"),
        F.round(xsum, 6).alias("comp_sum"),
    )


QUANT_LEVELS = 255  # int8-style affine quantization grid


def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension affine int8 quantization calibration: for every
    embedding dimension its min, max, scale ((max-min)/255) and the mean
    absolute reconstruction error of round-trip quantization — the
    calibration table a vector store computes before switching a 100 TB
    embedding corpus to 4×-smaller int8 storage.

    Scale shape: posexplode → per-dimension min/max aggregate (64 rows),
    broadcast back into a second scan for the error pass (two scans by
    design: the error needs the finished stats; a dim-partitioned window
    would funnel the whole corpus through 64 hot partitions).  The
    quantizer is floor(x/scale + 0.5) — floor is exact where round()'s
    half-to-even vs half-away conventions could disagree across engines —
    and the error terms sum as decimals so addition order cannot move
    the mean."""
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    ).select("vec_id", "dim", F.col("x").cast("double").alias("x"))
    stats = flat.groupBy("dim").agg(
        F.min("x").alias("dmin"), F.max("x").alias("dmax")
    )
    scale = (F.col("dmax") - F.col("dmin")) / QUANT_LEVELS
    q = F.floor((F.col("x") - F.col("dmin")) / F.col("scale") + 0.5)
    deq = F.col("dmin") + q * F.col("scale")
    return (
        flat.join(
            F.broadcast(stats.withColumn("scale", scale)), "dim"
        )
        .withColumn(
            "abs_err",
            F.abs(F.col("x") - deq).cast("decimal(18,12)"),
        )
        .groupBy("dim")
        .agg(
            F.round(F.min("x"), 6).alias("dmin_r"),
            F.round(F.max("x"), 6).alias("dmax_r"),
            F.round(F.avg("abs_err"), 9).cast("double").alias("mean_abs_err"),
        )
    )


RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
RRF_TOP = 20
RRF_QUERY_VEC = 0  # vec_id whose embedding is the dense query


def exact_cosine_scores(emb: DataFrame) -> DataFrame:
    """(vec_id, cos) against RRF_QUERY_VEC's embedding with ENGINE-EXACT
    values: components quantize to DECIMAL(12,6), dot/norm accumulate as
    associative decimal sums (addition-order-independent), and the
    cosine is one IEEE division of correctly-rounded operands — so any
    engine computes the identical double and ranking ties can only
    break on vec_id.  Shared by q_rrf (fusion) and q_ndcg (eval)."""
    flat = (
        emb.select("vec_id", F.posexplode("embedding").alias("i", "x"))
        .select(
            "vec_id",
            "i",
            F.round(F.col("x").cast("double"), 6)
            .cast("decimal(12,6)")
            .alias("qx"),
        )
        # consumed twice (query vector + corpus side)
        .localCheckpoint(eager=False)
    )
    qv = flat.filter(F.col("vec_id") == RRF_QUERY_VEC).select(
        "i", F.col("qx").alias("qv")
    )
    dots = (
        flat.join(F.broadcast(qv), "i")
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("qx") * F.col("qv")).alias("dot"),
            F.sum(F.col("qx") * F.col("qx")).alias("nn"),
        )
    )
    qq = qv.agg(F.sum(F.col("qv") * F.col("qv")).alias("qq"))
    return dots.crossJoin(F.broadcast(qq)).select(
        "vec_id",
        (
            F.col("dot").cast("double")
            / (
                F.sqrt(F.col("nn").cast("double"))
                * F.sqrt(F.col("qq").cast("double"))
            )
        ).alias("cos"),
    )


def q_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion: the sparse BM25
    ranking (q_bm25's standing term query) fused with a dense
    cosine-similarity ranking against RRF_QUERY_VEC's embedding,
    score = Σ_lists 1/(RRF_K + rank) — the fusion step of every hybrid
    search stack, done entirely in DataFrame algebra.

    Scale shape: each retriever's candidate relation is doc-sized here
    but top-k-bounded in production — the fusion join and rank windows
    run over candidate relations, never the corpus.  The dense leg's
    inner products are EXACT: embedding components quantize to
    DECIMAL(12,6) and the dot/norm sums are associative decimal sums
    (order-independent), so the cosine — one double division of
    correctly-rounded operands — and therefore every rank is identical
    in any engine.  Final top-RRF_TOP is orderBy().limit() →
    TakeOrderedAndProject."""
    from etl_embargo_spark.operators.text import q_bm25

    cosr = exact_cosine_scores(load_table(spark, sf_dir, "embeddings"))
    wb = Window.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    rb = cosr.select(
        "vec_id", "cos", F.row_number().over(wb).alias("rank_b")
    )
    bm = q_bm25(spark, sf_dir).select("doc_id", "bm25")
    wa = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    ra = bm.select(
        "doc_id", "bm25", F.row_number().over(wa).alias("rank_a")
    )
    fused = rb.join(
        F.broadcast(ra), rb.vec_id == ra.doc_id, "left"
    ).select(
        F.col("vec_id").alias("doc_id"),
        F.col("rank_b").cast("bigint").alias("rank_b"),
        F.col("rank_a").cast("bigint").alias("rank_a"),
        F.round("cos", 6).alias("cosine"),
        "bm25",
        F.round(
            1.0 / (RRF_K + F.col("rank_b"))
            + F.coalesce(
                1.0 / (RRF_K + F.col("rank_a")), F.lit(0.0)
            ),
            9,
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), F.col("doc_id")).limit(
        RRF_TOP
    )


NDCG_AT = 10


def q_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation: nDCG@NDCG_AT of the dense cosine
    ranking, with binary relevance = "shares RRF_QUERY_VEC's label"
    (the query vector itself is excluded, standard eval practice) —
    the metric that scores any of the similarity/ANN/fusion retrievers
    in this module.

    Scale shape: ranks come from the doc-sized exact-cosine relation
    (top-k-bounded in production); labels join broadcast; DCG and the
    ideal DCG are sums of ≤NDCG_AT 9-dp-quantized decimal gain terms
    (1/log2(rank+1) is transcendental — quantizing each term before the
    sum keeps both engines bit-identical), with one final division."""
    emb = load_table(spark, sf_dir, "embeddings")
    cosr = exact_cosine_scores(emb).filter(
        F.col("vec_id") != RRF_QUERY_VEC
    )
    labels = emb.select("vec_id", "label")
    qlab = emb.filter(F.col("vec_id") == RRF_QUERY_VEC).select(
        F.col("label").alias("q_label")
    )
    scored = (
        cosr.join(F.broadcast(labels), "vec_id")
        .crossJoin(F.broadcast(qlab))
        .select(
            "vec_id",
            "cos",
            (F.col("label") == F.col("q_label"))
            .cast("int")
            .alias("rel"),
        )
    )
    wb = Window.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    wi = Window.orderBy(
        F.col("rel").desc(), F.col("cos").desc(), F.col("vec_id").asc()
    )
    ranked = scored.select(
        "rel",
        F.row_number().over(wb).alias("rk"),
        F.row_number().over(wi).alias("ideal_rk"),
    )
    gain = F.round(
        F.col("rel") / F.log2(F.col("rk") + 1), 9
    ).cast("decimal(18,9)")
    ideal_gain = F.round(
        F.col("rel") / F.log2(F.col("ideal_rk") + 1), 9
    ).cast("decimal(18,9)")
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("rel").alias("n_rel"),
        F.sum(
            F.when(F.col("rk") <= NDCG_AT, gain).otherwise(
                F.lit(0).cast("decimal(18,9)")
            )
        ).alias("dcg"),
        F.sum(
            F.when(F.col("ideal_rk") <= NDCG_AT, ideal_gain).otherwise(
                F.lit(0).cast("decimal(18,9)")
            )
        ).alias("idcg"),
    )
    return agg.select(
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_rel").cast("bigint").alias("n_rel"),
        F.col("dcg").cast("double").alias("dcg"),
        F.col("idcg").cast("double").alias("idcg"),
        F.round(
            F.col("dcg").cast("double") / F.col("idcg").cast("double"),
            6,
        ).alias("ndcg"),
    )


# ---------------------------------------------------------------------------
# Contrastive pair mining (embedding-training data op)
# ---------------------------------------------------------------------------

CONTRASTIVE_POS_T = 0.40  # ≥ → positive (corpus cosine ceiling ~0.51)
CONTRASTIVE_NEG_T = 0.20  # < → usable hard negative


def q_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mine (anchor, positive, hard-negative) training triples for
    contrastive embedding fine-tuning: positives are LSH candidates with
    cosine ≥ CONTRASTIVE_POS_T; hard negatives are candidates that
    COLLIDED in some LSH table (so they look similar to the index) yet
    score below CONTRASTIVE_NEG_T — exactly the negatives that teach a
    bi-encoder the most (harder than random, cheaper than full mining).
    Per anchor: the best positive and the highest-scoring usable
    negative, ties broken on vec_id.

    Scale shape: candidates come from the multi-table hyperplane LSH
    bucket expansion (never an all-pairs join); exact cosine is
    Arrow-batched on candidates only; the per-anchor argmax is a rank
    window (WindowGroupLimit).  Deterministic (seeded planes, per-pair
    math, tie-broken ranks) → pinned oracle; pytest replays the triple
    selection exactly from the scored candidate list."""
    from pyspark.sql import Window

    from etl_embargo_spark.catalog import table_rows
    from etl_embargo_spark.operators.dedup import (
        _make_lsh_bucketer,
        lsh_params,
    )

    def _make_contrastive_bucket_scorer(pos_t, neg_t, k_cut, max_bucket):
        # nested factory (cloudpickle by-value): per bucket, each member's
        # best positive candidate (cosine ≥ pos_t) and best usable
        # negative (cosine < neg_t) — the global argmax per anchor is the
        # max of per-bucket winners, so the downstream relation is
        # members × 2 id-sized rows instead of every candidate pair with
        # two 64-float arrays attached (that join-back WAS the query at
        # sf1: 27.7 s).  Tie-break (cosine desc, vec_b asc) mirrors the
        # final window exactly — bit-identical winners.
        def _score(pdf):
            import numpy as _np
            import pandas as _pd

            empty = _pd.DataFrame(
                {
                    "vec_a": _np.array([], dtype=_np.int64),
                    "vec_b": _np.array([], dtype=_np.int64),
                    "cosine": _np.array([], dtype=_np.float64),
                    "is_pos": _np.array([], dtype=bool),
                }
            )
            if len(pdf) < 2:
                return empty
            pdf = pdf.sort_values(["bucket", "vec_id"]).reset_index(
                drop=True
            )
            ids = pdf["vec_id"].to_numpy()
            buckets = pdf["bucket"].to_numpy()
            e = _np.vstack(pdf["embedding"].to_numpy()).astype(_np.float64)
            norms = _np.sqrt(_np.einsum("ij,ij->i", e, e))
            starts = _np.r_[
                0,
                _np.flatnonzero(buckets[1:] != buckets[:-1]) + 1,
                len(pdf),
            ]
            tri: dict = {}
            pa, pb, pc = [], [], []
            for s, t_end in zip(starts[:-1], starts[1:]):
                c_n = t_end - s
                if c_n < 2 or c_n > max_bucket:
                    continue
                if c_n not in tri:
                    tri[c_n] = _np.triu_indices(c_n, k=1)
                iu, ju = tri[c_n]
                gi, gj = iu + s, ju + s
                dots = _np.einsum("ij,ij->i", e[gi], e[gj])
                cos = _np.round(dots / (norms[gi] * norms[gj]), 6)
                pa.append(_np.concatenate([ids[gi], ids[gj]]))
                pb.append(_np.concatenate([ids[gj], ids[gi]]))
                pc.append(_np.concatenate([cos, cos]))
            if not pa:
                return empty
            a = _np.concatenate(pa)
            b = _np.concatenate(pb)
            c = _np.concatenate(pc)
            outs = []
            for is_pos, mask in (
                (True, c >= pos_t),
                (False, c < neg_t),
            ):
                am, bm, cm = a[mask], b[mask], c[mask]
                if len(am) == 0:
                    continue
                order = _np.lexsort((bm, -cm, am))
                am, bm, cm = am[order], bm[order], cm[order]
                st = _np.r_[0, _np.flatnonzero(am[1:] != am[:-1]) + 1]
                sizes = _np.diff(_np.r_[st, len(am)])
                rank = _np.arange(len(am)) - _np.repeat(st, sizes)
                keep = rank < k_cut
                outs.append(
                    _pd.DataFrame(
                        {
                            "vec_a": am[keep],
                            "vec_b": bm[keep],
                            "cosine": cm[keep],
                            "is_pos": is_pos,
                        }
                    )
                )
            if not outs:
                return empty
            return _pd.concat(outs, ignore_index=True)

        return _score

    emb = load_table(spark, sf_dir, "embeddings")
    planes, tables = lsh_params(table_rows(sf_dir, "embeddings"))
    bucketed = emb.select("vec_id", "embedding").mapInPandas(
        _make_lsh_bucketer(7, planes, tables),
        schema="vec_id long, table_id int, bucket long",
    )
    with_vec = bucketed.join(emb.select("vec_id", "embedding"), "vec_id")
    winners = (
        with_vec.withColumn("_seg", F.pmod("bucket", F.lit(64)))
        .repartition(
            spark.sparkContext.defaultParallelism, "table_id", "_seg"
        )
        .groupBy("table_id", "_seg")
        .applyInPandas(
            _make_contrastive_bucket_scorer(
                CONTRASTIVE_POS_T, CONTRASTIVE_NEG_T, 1, 4096
            ),
            schema="vec_a long, vec_b long, cosine double, is_pos boolean",
        )
        .persist()  # 2 consumers (positive argmax, negative argmax)
    )
    w = Window.partitionBy("vec_a").orderBy(
        F.col("cosine").desc(), F.col("vec_b")
    )
    pos = (
        winners.filter(F.col("is_pos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("vec_a").alias("anchor"),
            F.col("vec_b").alias("pos_id"),
            F.col("cosine").alias("pos_cos"),
        )
    )
    neg = (
        winners.filter(~F.col("is_pos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("vec_a").alias("anchor"),
            F.col("vec_b").alias("neg_id"),
            F.col("cosine").alias("neg_cos"),
        )
    )
    return pos.join(neg, "anchor")


# ---------------------------------------------------------------------------
# Maximal Marginal Relevance diversification (retrieval post-processing)
# ---------------------------------------------------------------------------

MMR_POOL = 64  # candidate pool: top-MMR_POOL by exact cosine
MMR_K = 10  # diversified results returned
MMR_LAMBDA = 0.7  # relevance weight; 1-lambda penalizes redundancy


def q_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only (greedy-iterative): Maximal Marginal Relevance
    re-ranking of the dense retrieval pool — the standard redundancy
    killer between ANN retrieval and an LLM context window: pick
    argmax lambda*rel(d) - (1-lambda)*max_sim(d, selected) one result
    at a time, so near-duplicate hits can't crowd the top-k
    (q_contrastive_pairs mines training pairs; this diversifies SERVING
    results).

    Scale shape: relevance comes from the engine-exact decimal cosine
    relation (exact_cosine_scores — ranking identical in any engine);
    the pool cut is orderBy().limit() → TakeOrderedAndProject (never a
    global sort); the greedy loop runs in ONE applyInPandas kernel over
    the MMR_POOL-row pooled relation (constant-size at any corpus
    scale — the quadratic pairwise-similarity matrix is 64x64).

    Engine determinism: candidates iterate in vec_id order with a
    strict-improvement argmax (ties keep the lowest id); the kernel's
    pairwise cosines are single-threaded fixed-order numpy over the
    deterministic pool; the kernel emits RAW mmr scores and the builder
    applies F.round (banker's-rounding rule).  Pytest replays the
    greedy selection sequentially
    (tests/test_extensions.py::TestMmrDiversify)."""
    emb = load_table(spark, sf_dir, "embeddings")
    rel = exact_cosine_scores(emb).filter(
        F.col("vec_id") != RRF_QUERY_VEC
    )
    pool = rel.orderBy(F.col("cos").desc(), F.col("vec_id")).limit(
        MMR_POOL
    )
    pooled = pool.join(emb.select("vec_id", "embedding"), "vec_id")

    def _make_mmr(lam: float, k: int):
        # nested factory (cloudpickle by-value rule)
        def _mmr(pdf):
            import numpy as _np
            import pandas as _pd

            pdf = pdf.sort_values("vec_id").reset_index(drop=True)
            e = _np.vstack(pdf["embedding"].to_numpy()).astype(
                _np.float64
            )
            n = len(pdf)
            norms = _np.sqrt(_np.einsum("ij,ij->i", e, e))
            sims = (e @ e.T) / _np.outer(norms, norms)
            rels = pdf["cos"].to_numpy()
            ids = pdf["vec_id"].to_numpy()
            chosen: list[int] = []
            out_rank, out_id, out_rel, out_mmr = [], [], [], []
            for rank in range(min(k, n)):
                best_i, best_m = -1, None
                for i in range(n):
                    if i in chosen:
                        continue
                    pen = (
                        max(sims[i][j] for j in chosen)
                        if chosen
                        else 0.0
                    )
                    m = lam * rels[i] - (1.0 - lam) * pen
                    if best_m is None or m > best_m:  # strict: lowest
                        best_i, best_m = i, m  # id wins ties
                chosen.append(best_i)
                out_rank.append(rank + 1)
                out_id.append(int(ids[best_i]))
                out_rel.append(float(rels[best_i]))
                out_mmr.append(float(best_m))
            return _pd.DataFrame(
                {
                    "rank": out_rank,
                    "vec_id": out_id,
                    "cosine": out_rel,
                    "mmr": out_mmr,  # RAW; builder rounds
                }
            )

        return _mmr

    picked = pooled.groupBy(F.lit(1).alias("_g")).applyInPandas(
        _make_mmr(MMR_LAMBDA, MMR_K),
        schema="rank int, vec_id long, cosine double, mmr double",
    )
    return picked.select(
        "rank",
        "vec_id",
        F.round("cosine", 6).alias("cosine"),
        F.round("mmr", 6).alias("mmr"),
    )


# ---------------------------------------------------------------------------
# Semantic (embedding-space) eval decontamination
# ---------------------------------------------------------------------------

# Cosine threshold for "semantically contaminated".  On the synthetic
# 10-cluster embeddings (centers ~N(0,1), noise sigma 1.05) pairwise
# cosines top out near 0.5 (the same corpus fact that pins
# embedding_pairs' 0.45), so a real-model 0.9+ threshold would be
# vacuously empty at every SF; 0.35 is the measured non-degenerate
# point at the gate SFs (contaminated 3/494 at sf0.001, 9/494 at
# sf0.01, 89/1979 at sf0.1).  Saturation scan: with 10 FIXED clusters
# and an eval set growing with the corpus, max-cos-to-eval rises with
# eval size and the FLAG saturates at sf1 (19791/19793 ≥ 0.35) — a
# density artifact of the synthetic corpus, not a plan defect; the
# per-doc max_cos / n_eval_hits values stay fully informative and
# hash-checked.  On a real corpus τ comes from the embedding model's
# known near-dup band, not from this constant.
SEMDECON_TAU = 0.35
SEMDECON_EVAL_MOD = 97  # mirrors text.q_decontaminate's eval split
# A real eval set is CONSTANT-sized (a benchmark suite); the mod-97
# stand-in grows with the corpus, which would make the (train × eval)
# dot volume QUADRATIC in corpus size — so the eval set is capped to
# the first 64 qualifying ids.  Below vec_id 6208 the cap is inert
# (sf ≤ 0.1 keeps its exact previous eval set: 6/6/21 vectors at the
# gate SFs); above it, eval size pins at 64 and the work is linear in
# the corpus forever.
SEMDECON_EVAL_CAP = 64 * SEMDECON_EVAL_MOD


def q_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space eval-set decontamination (VERDICT r10 #5): flag
    training vectors whose cosine to ANY held-out eval vector
    (vec_id % 97 == 0 under SEMDECON_EVAL_CAP) reaches SEMDECON_TAU —
    the semantic companion to the 8-gram overlap check, catching
    paraphrased eval leakage that token n-grams miss.  Output is one
    row per training vector: hit count against the eval set, max
    cosine, and the contamination flag.

    Scale shape: the eval set is constant-sized (see the cap note), so
    the exploded eval side and its norms BROADCAST; the corpus side is
    one narrow quantized-explode lineage through the broadcast dim-join
    whose partial-aggregated output is (train × eval) dot rows — linear
    in the corpus — and never self-joins.  If the eval set ever
    outgrows the broadcast budget, the documented path is the LSH
    bucketer (dedup._bucket_pairs) as a candidate prefilter in front of
    this same exact-cosine verify.

    Engine determinism: components quantize to exact 6-dp INTEGERS
    (round(x·1e6) — an integer-scaled variant of the q_rrf decimal
    discipline: bigint sums are merge-order-exact AND keep whole-stage
    codegen, where this query's first decimal-sum form measured ~2×),
    dots/norms accumulate as exact int64 sums, and each cosine is
    sqrt/multiply/divide of exactly-representable operands — correctly
    rounded IEEE ops, so both engines compute bit-identical doubles
    and the τ comparison / max / hit count can never diverge.
    Overflow audit: |dot| ≤ 64·(max|x|·1e6)² needs max|x| ≤ 11.8 to
    stay under 2^53 — the corpus maxes at 7.6 (sf3)."""
    # byte-sized scan feeding a ×(64·|eval|) expansion: spread the
    # scan across cores or the whole dot volume lands on 1-2 partitions
    # (CLAUDE.md scan-level spread rule; measured 35 s at sf1 without)
    emb = spread_for_cpu(load_table(spark, sf_dir, "embeddings"), spark)
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).select(
        "vec_id",
        "i",
        F.round(F.col("x").cast("double") * 1e6).cast("bigint").alias("qx"),
    )
    is_eval = ((F.col("vec_id") % SEMDECON_EVAL_MOD) == 0) & (
        F.col("vec_id") < SEMDECON_EVAL_CAP
    )
    # tiny shared relation with two consumers (the dot join + its
    # norms) — persist, not lazy checkpoint (CLAUDE.md shared-lineage
    # rule), so the corpus-wide explode behind the eval filter runs
    # once, not once per consumer
    ev = (
        flat.filter(is_eval)
        .select(
            F.col("vec_id").alias("evec_id"), "i", F.col("qx").alias("ev")
        )
        .persist()
    )
    ev_norms = ev.groupBy("evec_id").agg(
        F.sum(F.col("ev") * F.col("ev")).alias("ne")
    )
    # one pass: per (train, eval) pair the dot AND the train norm (each
    # dim index matches exactly once per eval vector, so sum(qx*qx)
    # inside the pair group IS the train norm — no corpus-sized norm
    # join, the q_rrf dots-CTE shape)
    dots = (
        flat.filter(~is_eval)
        .join(F.broadcast(ev), "i")
        .groupBy("vec_id", "evec_id")
        .agg(
            F.sum(F.col("qx") * F.col("ev")).alias("dot"),
            F.sum(F.col("qx") * F.col("qx")).alias("nn"),
        )
    )
    cos = dots.join(F.broadcast(ev_norms), "evec_id").select(
        "vec_id",
        (
            F.col("dot").cast("double")
            / (
                F.sqrt(F.col("nn").cast("double"))
                * F.sqrt(F.col("ne").cast("double"))
            )
        ).alias("c"),
    )
    per_doc = cos.groupBy("vec_id").agg(
        F.sum(
            F.when(F.col("c") >= SEMDECON_TAU, 1).otherwise(0)
        ).cast("bigint").alias("n_eval_hits"),
        F.max("c").alias("_mc"),
    )
    return per_doc.select(
        F.col("vec_id").alias("doc_id"),
        "n_eval_hits",
        F.round("_mc", 6).alias("max_cos"),
        (F.col("n_eval_hits") > 0).alias("contaminated"),
    )
