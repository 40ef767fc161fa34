"""Embedding clustering (north-star extension): distributed Lloyd's
k-means and SemDeDup-style cluster-then-prune semantic deduplication.

The reference has nothing vector-shaped; this is the training-data
pipeline surface (semantic dedup over an embedding column) built the way
it scales:

* assignment is one Arrow-batched GEMM per batch against the broadcast
  centroid matrix (same kernel shape as ``similarity.ivf_assign`` — a
  centroid dictionary is always broadcast-sized; K×dim doubles);
* the update step ships only per-batch partial sums to the driver
  (K × n_batches tiny rows — the treeAggregate shape), never the vectors;
* centroids are quantized to 1e-6 each round so float addition order
  (partitioning, engine) cannot leak into the assignment — the result is
  bit-stable across cluster layouts, which is what makes the pytest
  numpy oracle exact;
* SemDeDup then prunes within clusters only: the quadratic cosine check
  runs per cluster via applyInPandas (its own shuffle sets parallelism),
  so the global all-pairs problem is never materialized — the SemDeDup
  paper's exact trick (Abbas et al., 2023).

Iterative jobs at build time follow the ``graph.pagerank`` precedent
(rows-only queries may run bounded driver-side rounds; each round is one
distributed pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from etl_embargo_spark.catalog import load_table, spread_for_cpu

KMEANS_K = 8  # floor; registered queries size k from the corpus (kmeans_k)
KMEANS_ITERS = 5
# SemDeDup's in-cluster cosine pass is O(|cluster|²): k must grow ∝ n so
# clusters stay ~TARGET_CLUSTER_SIZE and total pair cost stays
# n × TARGET_CLUSTER_SIZE (linear), never n²/k with fixed k.  This is the
# regime the SemDeDup paper operates in (k ∝ n).
KMEANS_TARGET_CLUSTER = 64


def kmeans_k(expected_n: int, target_cluster: int = KMEANS_TARGET_CLUSTER) -> int:
    """Corpus-sized cluster count: ceil(n / target_cluster), floored at
    KMEANS_K.  At the validated corpus scales this returns exactly the
    points the pins were generated at: 8 for n=500 (sf0.001/0.01) and 32
    for n=2000 (sf0.1).  ``expected_n`` comes from parquet footer
    metadata (catalog.table_rows), keeping query builders job-free."""
    import math

    return max(KMEANS_K, math.ceil(max(int(expected_n), 1) / target_cluster))
CENTROID_QUANTUM = 6  # decimals kept after each update step
SEMDEDUP_TAU = 0.35  # calibrated to the synthetic table's ~0.5 cosine ceiling
# (real embedding corpora use ~0.95+; the knob is data-dependent, the plan is not)


def _quantize(arr, decimals: int = CENTROID_QUANTUM):
    import numpy as np

    return np.round(np.asarray(arr, dtype=np.float64), decimals)


def init_centroids(emb: DataFrame, k: int = KMEANS_K):
    """Deterministic seeding: the k vectors with the smallest vec_id
    (engine-independent, no RNG to disagree on).  One tiny top-k job."""
    import numpy as np

    rows = emb.orderBy("vec_id").limit(k).collect()
    return _quantize(np.vstack([np.asarray(r.embedding) for r in rows]))


def _assign_schema() -> StructType:
    return StructType(
        [
            StructField("vec_id", LongType()),
            StructField("cluster_id", IntegerType()),
            StructField("sq_dist", DoubleType()),
        ]
    )


def _make_assigner(cm):
    # nested factory: closure ships by value (cloudpickle), so the kernel
    # works when the repo is not importable on executors
    def _assign(batches):
        import numpy as _np

        for pdf in batches:
            e = _np.vstack(pdf["embedding"].to_numpy()).astype(_np.float64)
            # ||x-c||^2 = ||x||^2 - 2x·c + ||c||^2 ; argmin ignores ||x||^2
            d = (cm * cm).sum(axis=1)[None, :] - 2.0 * (e @ cm.T)
            cl = d.argmin(axis=1)
            sq = d[_np.arange(len(e)), cl] + (e * e).sum(axis=1)
            import pandas as _pd

            yield _pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cluster_id": cl.astype("int32"),
                    "sq_dist": _np.maximum(sq, 0.0),
                }
            )

    return _assign


def assign_clusters(emb: DataFrame, centroids) -> DataFrame:
    """(vec_id, cluster_id, sq_dist) for a fixed centroid matrix — one
    GEMM per Arrow batch, single scan, no shuffle."""
    return emb.mapInPandas(_make_assigner(centroids), schema=_assign_schema())


def _partial_sums(emb: DataFrame, cm) -> DataFrame:
    k, dim = cm.shape

    def _make(cmat, kk, dd):
        def _sums(batches):
            import numpy as _np
            import pandas as _pd

            for pdf in batches:
                e = _np.vstack(pdf["embedding"].to_numpy()).astype(
                    _np.float64
                )
                d = (cmat * cmat).sum(axis=1)[None, :] - 2.0 * (e @ cmat.T)
                cl = d.argmin(axis=1)
                out = []
                for c in _np.unique(cl):
                    sel = e[cl == c]
                    out.append(
                        (int(c), int(sel.shape[0]), sel.sum(axis=0).tolist())
                    )
                yield _pd.DataFrame(
                    out, columns=["cluster_id", "n", "vec_sum"]
                )

        return _sums

    schema = StructType(
        [
            StructField("cluster_id", IntegerType()),
            StructField("n", LongType()),
            StructField("vec_sum", ArrayType(DoubleType())),
        ]
    )
    return emb.mapInPandas(_make(cm, k, dim), schema=schema)


def kmeans_fit(
    emb: DataFrame, k: int = KMEANS_K, n_iters: int = KMEANS_ITERS
):
    """Lloyd's iterations; returns the final quantized centroid matrix.

    Each round is ONE distributed pass emitting K×n_batches partial-sum
    rows; the driver reduces them in numpy (a few KB).  Quantizing the
    centroids after every update makes the fit independent of partition
    layout and addition order — no cross-engine ulp drift can change an
    assignment."""
    import numpy as np

    cm = init_centroids(emb, k)
    for _ in range(n_iters):
        parts = _partial_sums(emb, cm).collect()
        sums = np.zeros_like(cm)
        counts = np.zeros(cm.shape[0], dtype=np.int64)
        for r in parts:
            sums[r.cluster_id] += np.asarray(r.vec_sum)
            counts[r.cluster_id] += r.n
        new = cm.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz][:, None]
        cm = _quantize(new)
    return cm


def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only (iterative — not SQL-expressible): final k-means
    assignment of every embedding after KMEANS_ITERS Lloyd's rounds with
    deterministic smallest-vec_id seeding, k sized from the corpus
    (kmeans_k — fixed k would make SemDeDup's per-cluster pass quadratic
    at 100×).  Pytest replays the identical algorithm in numpy on the
    collected table and checks every assignment
    (tests/test_extensions.py)."""
    from etl_embargo_spark.catalog import table_rows

    emb = load_table(spark, sf_dir, "embeddings")
    cm = kmeans_fit(emb, k=kmeans_k(table_rows(sf_dir, "embeddings")))
    out = assign_clusters(emb, cm)
    return out.select(
        "vec_id", "cluster_id", F.round("sq_dist", 6).alias("sq_dist")
    )


def semdedup(emb: DataFrame, centroids, tau: float = SEMDEDUP_TAU) -> DataFrame:
    """SemDeDup pruning: within each k-means cluster, greedily keep the
    smallest-vec_id representative of every cosine-≥-tau neighborhood and
    drop the rest.

    The pairwise pass is strictly per-cluster (applyInPandas — its own
    shuffle sets the parallelism; groups are |N|/K on average), so cost
    is Σ|cluster|² not |N|²; the paper's observation is that semantic
    duplicates co-locate in embedding-cluster space, so cross-cluster
    pairs can be skipped entirely."""
    assigned = assign_clusters(emb, centroids).select("vec_id", "cluster_id")
    joined = emb.join(assigned, "vec_id").select(
        "vec_id", "cluster_id", "embedding"
    )

    def _make_pruner(t):
        def _prune(pdf):
            import numpy as _np

            pdf = pdf.sort_values("vec_id").reset_index(drop=True)
            e = _np.vstack(pdf["embedding"].to_numpy()).astype(_np.float64)
            norms = _np.linalg.norm(e, axis=1)
            norms[norms == 0.0] = 1.0
            u = e / norms[:, None]
            n = len(pdf)
            keep = _np.ones(n, dtype=bool)
            max_cos = _np.full(n, -1.0)
            for i in range(1, n):
                kept_idx = _np.flatnonzero(keep[:i])
                if kept_idx.size == 0:
                    continue
                cos = u[kept_idx] @ u[i]
                m = float(cos.max())
                max_cos[i] = m
                if m >= t:
                    keep[i] = False
            return pdf.assign(
                keep=keep, max_kept_cos=_np.round(max_cos, 6)
            )[["vec_id", "cluster_id", "keep", "max_kept_cos"]]

        return _prune

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("cluster_id", IntegerType()),
            StructField("keep", BooleanType()),
            StructField("max_kept_cos", DoubleType()),
        ]
    )
    return joined.groupBy("cluster_id").applyInPandas(
        _make_pruner(tau), schema=schema
    )


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only (iterative + quadratic-in-cluster — not SQL-expressible):
    SemDeDup keep/drop decision for every embedding, k sized from the
    corpus (kmeans_k) so the per-cluster quadratic pass stays bounded at
    any scale (pytest replays the greedy prune in numpy per cluster and
    checks both the decisions and the representative invariants)."""
    from etl_embargo_spark.catalog import table_rows

    emb = load_table(spark, sf_dir, "embeddings")
    cm = kmeans_fit(emb, k=kmeans_k(table_rows(sf_dir, "embeddings")))
    return semdedup(emb, cm)


PCA_TOP = 4  # principal components reported


def covariance_partials(emb: DataFrame) -> DataFrame:
    """Per-batch sufficient statistics for the covariance matrix: count,
    vector sum, and the flattened Σxxᵀ — constant-size (d + d² doubles)
    per batch regardless of row count, the treeAggregate shape (same
    contract as the k-means partial sums above)."""

    def _sums(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            e = _np.vstack(pdf["embedding"].to_numpy()).astype(_np.float64)
            yield _pd.DataFrame(
                [
                    (
                        int(e.shape[0]),
                        e.sum(axis=0).tolist(),
                        (e.T @ e).ravel().tolist(),
                    )
                ],
                columns=["n", "vec_sum", "xtx"],
            )

    schema = StructType(
        [
            StructField("n", LongType()),
            StructField("vec_sum", ArrayType(DoubleType())),
            StructField("xtx", ArrayType(DoubleType())),
        ]
    )
    return emb.select("embedding").mapInPandas(_sums, schema=schema)


def pca_fit(emb: DataFrame, top: int = PCA_TOP):
    """Top principal components: ONE distributed pass ships d²-sized
    partials; the d×d eigensolve runs on the driver (d=64 here — the
    covariance of any embedding table is driver-sized at every corpus
    scale).  The covariance is quantized before eigh so partial-sum
    addition order (partitioning, batch size) cannot perturb the
    decomposition — the same determinism trick as the k-means rounds.
    Returns (eigenvalues desc, row-eigenvector matrix, total_variance).
    Eigenvector signs are fixed by making each vector's largest-|·|
    component positive."""
    import numpy as np

    parts = covariance_partials(emb).collect()
    n = sum(r.n for r in parts)
    d = len(parts[0].vec_sum)
    s = np.zeros(d)
    xtx = np.zeros((d, d))
    for r in parts:
        s += np.asarray(r.vec_sum)
        xtx += np.asarray(r.xtx).reshape(d, d)
    mean = s / n
    cov = _quantize(xtx / n - np.outer(mean, mean), 6)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:top]
    evals, evecs = evals[order], evecs[:, order].T
    for i in range(evecs.shape[0]):
        j = int(np.abs(evecs[i]).argmax())
        if evecs[i, j] < 0:
            evecs[i] = -evecs[i]
    return evals, evecs, float(np.trace(cov))


def q_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only (driver eigensolve — not SQL-expressible): top-PCA_TOP
    principal components of the embedding table — eigenvalue, explained
    variance ratio, dominant dimension, and the (rounded) loading
    vector.  The pipeline use is embedding whitening / compression
    ahead of ANN indexing; pytest oracle recomputes in pure numpy from
    the collected vectors and matches exactly thanks to the quantized
    covariance."""
    import numpy as np

    emb = spread_for_cpu(load_table(spark, sf_dir, "embeddings"), spark)
    evals, evecs, total = pca_fit(emb)
    # loadings serialized as CSV (repr round-trips doubles exactly): the
    # driver's cross-engine hasher requires hashable (scalar) cells
    rows = [
        (
            int(i),
            round(float(evals[i]), 6),
            round(float(evals[i]) / total, 6),
            int(np.abs(evecs[i]).argmax()),
            ",".join(repr(round(float(x), 6)) for x in evecs[i]),
        )
        for i in range(evecs.shape[0])
    ]
    return spark.createDataFrame(
        rows,
        "component int, eigenvalue double, explained_ratio double, "
        "top_dim int, loadings_csv string",
    )



def whitening_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only (array form, pytest-facing): PCA whitening of the embedding table — every vector
    projected onto the top-PCA_TOP components and scaled by 1/√λ, the
    standard decorrelation step before ANN indexing or linear probes.

    Scale shape: the rotation matrix (PCA_TOP × d doubles) broadcasts
    inside the mapInPandas closure; the transform is one GEMM per Arrow
    batch — the same kernel shape as the k-means assigner, with the
    eigensolve's cost already amortized into pca_fit's single pass.
    Components with λ quantized to 0 are dropped from the scaling
    (guarded division), so degenerate directions cannot blow up.
    Output coordinates are rounded so the pytest numpy oracle compares
    exactly."""
    import numpy as np

    emb = spread_for_cpu(load_table(spark, sf_dir, "embeddings"), spark)
    evals, evecs, _ = pca_fit(emb)
    scale = np.where(evals > 0, 1.0 / np.sqrt(np.maximum(evals, 1e-300)), 0.0)
    wmat = evecs * scale[:, None]  # (top, d)

    def _make(w):
        def _transform(batches):
            import numpy as _np
            import pandas as _pd

            for pdf in batches:
                e = _np.vstack(pdf["embedding"].to_numpy()).astype(
                    _np.float64
                )
                z = _np.round(e @ w.T, 6)
                yield _pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].astype("int64"),
                        "white": list(z.tolist()),
                        "white_norm": _np.round(
                            _np.sqrt((z * z).sum(axis=1)), 6
                        ),
                    }
                )

        return _transform

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("white", ArrayType(DoubleType())),
            StructField("white_norm", DoubleType()),
        ]
    )
    return emb.select("vec_id", "embedding").mapInPandas(
        _make(wmat), schema=schema
    )


def q_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of the whitening transform: scalar columns only
    (driver hasher constraint) — the whitened coordinate vector is
    serialized as CSV of its rounded values; the array form stays
    available via :func:`whitening_vectors`."""
    w = whitening_vectors(spark, sf_dir)
    return w.select(
        "vec_id",
        F.concat_ws(
            ",", F.transform("white", lambda v: v.cast("string"))
        ).alias("white_csv"),
        "white_norm",
    )


LOGREG_ITERS = 4
LOGREG_RIDGE = 1e-6  # tiny Tikhonov term keeps the Newton solve stable


def _logreg_partials(emb: DataFrame, w) -> DataFrame:
    """Per-batch Newton sufficient statistics for logistic regression on
    (embedding, label%2): gradient Xᵀ(p−y) and Hessian Xᵀdiag(p(1−p))X
    with an intercept column — constant-size ((d+1) + (d+1)² doubles)
    per batch, the treeAggregate shape, independent of row count."""

    def _make(wv):
        def _stats(batches):
            import numpy as _np
            import pandas as _pd

            for pdf in batches:
                e = _np.vstack(pdf["embedding"].to_numpy()).astype(
                    _np.float64
                )
                x = _np.hstack([_np.ones((len(e), 1)), e])
                y = (pdf["label"].to_numpy() % 2).astype(_np.float64)
                p = 1.0 / (1.0 + _np.exp(-(x @ wv)))
                g = x.T @ (p - y)
                h = (x * (p * (1.0 - p))[:, None]).T @ x
                yield _pd.DataFrame(
                    [(g.tolist(), h.ravel().tolist())],
                    columns=["grad", "hess"],
                )

        return _stats

    schema = StructType(
        [
            StructField("grad", ArrayType(DoubleType())),
            StructField("hess", ArrayType(DoubleType())),
        ]
    )
    return emb.mapInPandas(_make(w), schema=schema)


def logreg_fit(emb: DataFrame, n_iters: int = LOGREG_ITERS):
    """Distributed Newton-Raphson logistic regression; returns the final
    quantized weight vector (intercept first).

    Each round is ONE distributed pass shipping (d+1)+(d+1)² partial
    sums per batch to the driver, which solves the (d+1)×(d+1) system in
    numpy — the vectors never leave the executors.  Weights are
    quantized to 1e-6 after every step so partition layout and float
    addition order cannot leak into the fit (the ``kmeans_fit``
    contract)."""
    import numpy as np

    first = emb.select(F.size("embedding").alias("d")).limit(1)
    # dim discovery without a magic constant: one 1-row job, like
    # init_centroids' seeding job
    d = first.collect()[0].d
    w = np.zeros(d + 1)
    for _ in range(n_iters):
        parts = _logreg_partials(emb, w).collect()
        g = np.zeros(d + 1)
        h = np.zeros((d + 1, d + 1))
        for r in parts:
            g += np.asarray(r.grad)
            h += np.asarray(r.hess).reshape(d + 1, d + 1)
        h += LOGREG_RIDGE * np.eye(d + 1)
        w = _quantize(w - np.linalg.solve(h, g))
    return w


def q_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only (iterative — not SQL-expressible): distributed
    Newton-Raphson logistic regression predicting label parity from the
    embedding, then every vector scored with the fitted model.  Pytest
    replays the identical quantized fit in numpy on the collected table
    and checks coefficients and per-row predictions
    (tests/test_extensions.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    w = logreg_fit(emb)

    def _make_scorer(wv):
        def _score(batches):
            import numpy as _np
            import pandas as _pd

            for pdf in batches:
                e = _np.vstack(pdf["embedding"].to_numpy()).astype(
                    _np.float64
                )
                x = _np.hstack([_np.ones((len(e), 1)), e])
                y = (pdf["label"].to_numpy() % 2).astype(_np.int32)
                p = 1.0 / (1.0 + _np.exp(-(x @ wv)))
                yield _pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].to_numpy(),
                        "y": y,
                        "p": _np.round(p, 6),
                        "pred": (p >= 0.5).astype("int32"),
                    }
                )

        return _score

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("y", IntegerType()),
            StructField("p", DoubleType()),
            StructField("pred", IntegerType()),
        ]
    )
    return emb.mapInPandas(_make_scorer(w), schema=schema)


CALIB_BINS = 10


def q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only (depends on the iterative logreg fit): reliability
    diagram of q_logreg — predicted probabilities binned into deciles,
    each bin reporting its mean prediction vs the observed positive
    rate (a well-calibrated model sits on the diagonal; the readout
    that decides whether scores can be used as probabilities).

    Scale shape: scoring is the same single-scan GEMM pass as q_logreg;
    the bin aggregation collapses map-side to ≤CALIB_BINS rows.  The
    mean prediction is a 6-dp-quantized decimal sum (engine-stable);
    counts are integers.  Pytest replays fit+binning in numpy
    (tests/test_extensions.py::TestCalibration)."""
    scored = q_logreg(spark, sf_dir)
    bin_ = F.least(
        F.floor(F.col("p") * CALIB_BINS), F.lit(CALIB_BINS - 1)
    ).cast("int")
    cells = scored.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("n_pos"),
        F.sum(
            F.round(F.col("p"), 6).cast("decimal(18,6)")
        ).alias("p_sum"),
    )
    return cells.select(
        "bin",
        F.col("n").cast("bigint").alias("n"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.round(
            F.col("p_sum").cast("double") / F.col("n"), 6
        ).alias("mean_pred"),
        F.round(F.col("n_pos") / F.col("n"), 6).alias("frac_pos"),
    )


ISO_BINS = 200


def q_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only (depends on the iterative logreg fit): isotonic
    (PAV) calibration of q_logreg's scores — the monotone-regression
    completion of the calibration family (q_calibration bins and
    eyeballs the diagonal; this FITS the best non-decreasing rate
    function, the standard post-hoc calibrator when binning is too
    coarse).  Output is one row per fitted pool: its bin span, counts,
    and the pooled rate.

    Scale shape: scoring is q_logreg's single-scan GEMM pass; scores
    collapse map-side to ≤ISO_BINS fixed-width (bin, n, pos) rows — a
    BOUNDED relation at any corpus size — and pool-adjacent-violators
    runs in ONE applyInPandas kernel over that collapsed relation (the
    constant-size-partials pattern; never a driver collect in the
    query path).

    Engine determinism: PAV pools on EXACT integer cross-products
    (pos_i·n_j > pos_j·n_i — no float enters the merge decision); the
    emitted rate is one exact-int division.  Pytest replays the pooling
    sequentially (tests/test_extensions.py::TestIsotonic)."""
    scored = q_logreg(spark, sf_dir)
    bin_ = F.least(
        F.floor(F.col("p") * ISO_BINS), F.lit(ISO_BINS - 1)
    ).cast("int")
    binned = scored.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("pos"),
    )

    def _make_pav():
        # nested factory (cloudpickle by-value rule)
        def _pav(pdf):
            import pandas as _pd

            pdf = pdf.sort_values("bin").reset_index(drop=True)
            # each pool: [bin_lo, bin_hi, n, pos]; merge while the
            # previous pool's rate exceeds the next's — compared via
            # integer cross-multiplication, exact at any magnitude
            pools: list[list[int]] = []
            for r in pdf.itertuples(index=False):
                cur = [int(r.bin), int(r.bin), int(r.n), int(r.pos)]
                while pools and (
                    pools[-1][3] * cur[2] > cur[3] * pools[-1][2]
                ):
                    p = pools.pop()
                    cur = [p[0], cur[1], p[2] + cur[2], p[3] + cur[3]]
                pools.append(cur)
            return _pd.DataFrame(
                {
                    "pool_id": range(len(pools)),
                    "bin_lo": [p[0] for p in pools],
                    "bin_hi": [p[1] for p in pools],
                    "n": [p[2] for p in pools],
                    "n_pos": [p[3] for p in pools],
                    # RAW division only — the builder applies F.round
                    # (np/python round is banker's, CLAUDE.md rule)
                    "rate": [
                        p[3] / p[2] if p[2] else 0.0 for p in pools
                    ],
                }
            )

        return _pav

    pooled = binned.groupBy(F.lit(1).alias("_g")).applyInPandas(
        _make_pav(),
        schema=(
            "pool_id int, bin_lo int, bin_hi int, n bigint, "
            "n_pos bigint, rate double"
        ),
    )
    return pooled.select(
        "pool_id", "bin_lo", "bin_hi", "n", "n_pos",
        F.round("rate", 6).alias("rate"),
    )
