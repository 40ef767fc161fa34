"""Deterministic sampling operators for training-data pipelines (north-star
extension): content-hash bucket sampling, train/val/test splitting, and
per-stratum sampling.

Scale design (100 TB):
* Hash-bucket sampling is a pure narrow filter — no shuffle, no state, no
  seed coordination across executors.  The bucket of a row depends only on
  its key bytes, so the SAME rows are selected on every run, on any cluster
  layout, and (critically for training pipelines) the selection is stable
  under repartitioning, retries, and incremental reruns.  This is the
  standard way to carve reproducible eval/holdout sets out of a corpus.
* ``sampleBy`` (stratified) keeps per-stratum fractions without a shuffle
  either — each task Bernoulli-samples with a per-stratum rate; the seed
  makes it reproducible within Spark, but not across engines, hence the
  pytest (not DuckDB) oracle.

The reference has no sampling at all (SURVEY §2.9 gap list); these exist for
the corpus-prep story.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_embargo_spark.catalog import load_table

N_BUCKETS = 100
SAMPLE_BUCKETS = 5  # q_hash_sample keeps buckets [0, 5) -> 5% sample
# train/val/test cut points over the 100 hash buckets
TRAIN_UPTO = 80
VAL_UPTO = 90


def hash_bucket(key: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Deterministic bucket in [0, n_buckets) from the md5 of the key.

    Uses the first 8 hex chars of md5 (32 bits) so the value is exactly
    representable on both sides of the oracle compare: Spark computes
    ``conv(substring(md5(k), 1, 8), 16, 10)`` and DuckDB computes
    ``('0x' || substr(md5(k), 1, 8))::UBIGINT`` — identical integers,
    identical buckets.  md5 (not Spark's murmur ``hash``) precisely because
    it is engine-independent and stable forever — a training-data split must
    not change when the engine version does.
    """
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
        % n_buckets
    )


def _lineitem_key() -> Column:
    # primary key of lineitem, as stable bytes
    return F.concat_ws(
        "-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% sample of lineitem by content-hash bucket: rows whose
    md5-bucket of the primary key falls in [0, 5).  Same rows selected by
    any engine, any run, any partitioning — the reproducible-holdout shape."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = hash_bucket(_lineitem_key())
    return li.select(
        "l_orderkey",
        "l_linenumber",
        bucket.cast("int").alias("sample_bucket"),
    ).filter(F.col("sample_bucket") < SAMPLE_BUCKETS)


def train_test_split(df: DataFrame, key: Column) -> DataFrame:
    """Tag each row train/val/test by hash bucket (80/10/10).  A pure
    projection: no shuffle, no seed, stable under reruns and engine moves —
    the split a 100 TB corpus actually wants (a seeded ``randomSplit`` would
    reshuffle rows between splits whenever partitioning changes)."""
    bucket = hash_bucket(key)
    return df.withColumn(
        "split",
        F.when(bucket < TRAIN_UPTO, "train")
        .when(bucket < VAL_UPTO, "val")
        .otherwise("test"),
    )


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 hash-split of lineitem, reported as per-split row counts
    (the split assignment itself is deterministic; the counts prove the
    proportions land where the buckets say)."""
    li = load_table(spark, sf_dir, "lineitem")
    tagged = train_test_split(li, _lineitem_key())
    return tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


def stratified_sample(
    docs: DataFrame, fractions: dict[str, float], seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sample over the ``lang`` column (``sampleBy``).
    Reproducible within Spark via the seed; engine-specific RNG, so the
    oracle is the pytest tolerance check (tests/test_extensions.py), not
    DuckDB."""
    return docs.sampleBy("lang", fractions, seed=seed)


# The synthetic corpus's fixed language set (seed=42 generator); a constant
# keeps this query builder job-free — deriving it with distinct().collect()
# would run a full scan every time the (lazy) DataFrame is constructed.
STRATA_FRACTIONS = {"en": 0.5, "de": 0.25, "es": 0.25, "fr": 0.25, "zh": 0.25}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample of documents (50% en, 25% other
    languages) by per-stratum md5-bucket thresholding — reproducible
    across engines, runs, and partition layouts, which is the property a
    100 TB corpus split actually needs (``sampleBy``'s partition-seeded
    RNG reshuffles stratum membership whenever the layout changes; that
    API form stays available as :func:`stratified_sample` with its
    Bernoulli-tolerance pytest).  Exact-match DuckDB oracle via the
    shared 32-bit md5-bucket construction (see ``hash_bucket``)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(
        F.concat_ws("-", F.lit("strat"), F.col("doc_id").cast("string"))
    )
    thresh = F.when(F.col("lang") == "en", F.lit(50)).otherwise(F.lit(25))
    return docs.select("doc_id", "lang").filter(bucket < thresh)


MIX_BUCKETS = 10000
MIX_BUDGET_FRAC = 0.5  # downsample the corpus to half, mixture-shaped


def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: reshape the corpus toward target source weights by
    deterministic per-source downsampling — the mixture step of an LLM
    data pipeline (upweight curated sources, downweight crawl).

    Target weight w_s = (source number % 4) + 1; a budget of half the
    corpus is allotted proportionally to w_s and each source keeps
    min(1, allotment / n_s) of its docs by md5-bucket — so selection is
    a narrow filter (stable under reruns/partitioning, like every
    sampler here) and only the tiny per-source rate table is computed
    with a shuffle, then broadcast back.  Output is the per-source
    accounting: docs in, kept, and the realized keep-rate."""
    docs = load_table(spark, sf_dir, "documents")
    w = (F.regexp_extract("source", r"(\d+)", 1).cast("int") % 4 + 1).alias(
        "w"
    )
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.first(w).alias("w"),
    )
    totals = counts.agg(
        F.sum("n_docs").alias("_n"), F.sum("w").alias("_sumw")
    )
    rates = counts.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        F.least(
            F.lit(1.0),
            (F.col("_n") * MIX_BUDGET_FRAC * F.col("w"))
            / (F.col("_sumw") * F.col("n_docs")),
        ).alias("rate"),
    )
    bucket = hash_bucket(F.col("doc_id").cast("string"), MIX_BUCKETS)
    kept_flag = (bucket < F.col("rate") * MIX_BUCKETS).cast("int")
    tagged = docs.join(F.broadcast(rates), "source")
    return tagged.groupBy("source").agg(
        F.first("n_docs").alias("n_docs"),
        F.sum(kept_flag).alias("n_kept"),
        F.round(F.first("rate"), 6).alias("keep_rate"),
    )


GROUP_SAMPLE_K = 5


def q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group reservoir-style sample: a fixed k documents per source,
    chosen by md5 order — deterministic across engines, runs, and
    partitionings (a seeded reservoir would not survive a repartition).

    row_number over (source, md5) compiles to WindowGroupLimit, so each
    map task truncates to k rows per group before the shuffle — the
    exchange carries O(groups × k), which is what makes fixed-k-per-group
    sampling viable on a 100 TB corpus.  md5 of the key (not rand()) for
    the same reason as every sampler here: the sample must not change
    when the engine or layout does.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("source", "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= GROUP_SAMPLE_K)
    )


WEIGHTED_K = 10  # systematic picks per source


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sample: WEIGHTED_K documents per source with
    inclusion probability proportional to n_chars — the corpus-mixing
    primitive when longer documents should be seen more often.

    Design: systematic PPS sampling over an md5-shuffled order.  Each
    source's documents are laid along their cumulative-weight axis
    (prefix sum in deterministic md5 order) and a row is selected when
    its weight span crosses one of the K equi-spaced thresholds —
    ⌊cum_hi·K/W⌋ > ⌊cum_lo·K/W⌋, ALL integer arithmetic, so the same
    rows are picked on every engine, layout, and rerun.  Unlike
    Efraimidis-Spirakis (-ln(u)/w keys) there is no transcendental in
    the selection path to drift across libms.

    Scale shape: one shuffle partitioned by source for the prefix sum;
    at fact scale you'd two-phase it (per-partition subtotals + offset
    join) — same integer selection rule either way."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wp = Window.partitionBy("source")
    staged = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.sum("n_chars").over(w).cast("bigint").alias("cum_hi"),
        F.sum("n_chars").over(wp).cast("bigint").alias("w_total"),
    )
    k = F.lit(WEIGHTED_K).cast("bigint")
    hi_bucket = F.floor(F.col("cum_hi") * k / F.col("w_total"))
    lo_bucket = F.floor(
        (F.col("cum_hi") - F.col("n_chars")) * k / F.col("w_total")
    )
    return staged.filter(hi_bucket > lo_bucket).select(
        "doc_id", "source", "n_chars", hi_bucket.cast("int").alias("bucket")
    )


# ---------------------------------------------------------------------------
# K-fold cross-validation readout
# ---------------------------------------------------------------------------

CV_FOLDS = 5


def q_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation of the mean-predictor baseline: orders
    are assigned to 5 folds by the engine-independent md5 bucket; each
    fold is scored by the global-mean model FIT ON THE OTHER FOLDS
    (leave-fold-out mean via the algebraic complement (S−S_f)/(n−n_f) —
    no per-fold refit pass), reporting per-fold MAE — the
    baseline-vs-model scaffold every evaluation pipeline starts from.

    Scale shape: fold sums are one map-side-combined shuffle; the
    complement means come from a 5-row crossJoin-broadcast of the
    global totals; the MAE pass is the only row-sized re-aggregation
    (one more shuffle on fold).  The orders relation is persisted —
    both passes read the cache, not the scan twice.

    Engine determinism: fold means are ONE division of exact cent
    sums; per-row |y − ŷ| is a correctly-rounded chain on identical
    doubles, rounded to 4 dp and decimal-summed (associative), divided
    once for the MAE."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            hash_bucket(F.col("o_orderkey").cast("string"), CV_FOLDS)
            .cast("int")
            .alias("fold"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("y"),
        )
        .persist()
    )
    per_fold = orders.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_f"), F.sum("y").alias("s_f")
    )
    totals = orders.groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    models = per_fold.crossJoin(F.broadcast(totals)).select(
        "fold",
        "n_f",
        (
            (F.col("s") - F.col("s_f")).cast("double")
            / (F.col("n") - F.col("n_f"))
        ).alias("yhat"),
    )
    scored = orders.join(F.broadcast(models), "fold").select(
        "fold",
        "n_f",
        "yhat",
        F.round(F.abs(F.col("y") - F.col("yhat")), 4)
        .cast("decimal(28,4)")
        .alias("err"),
    )
    return scored.groupBy("fold").agg(
        F.first("n_f").alias("n_rows"),
        F.round(F.first("yhat") / 100.0, 6).alias("model_mean"),
        F.round(
            F.sum("err").cast("double") / F.first("n_f") / 100.0, 6
        ).alias("mae"),
    )


# ---------------------------------------------------------------------------
# Consistent-hash ring balance audit
# ---------------------------------------------------------------------------

RING_NODES = 32


def q_hash_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash ring balance audit: customers mapped to 32
    virtual nodes by md5 bucket, reporting each node's load share and
    its ratio to the uniform ideal — the load-skew readout you check
    before keying a shuffle, a cache, or a shard map on a hash ring.

    Scale shape: a pure-projection bucket assignment (no shuffle to
    assign), one map-side-combined count per node, then window shares
    over the 32-row relation.

    Engine determinism: loads are exact integers; share and imbalance
    are one IEEE division each (n·32 and n_node·32 stay exact
    integers)."""
    cust = load_table(spark, sf_dir, "customer")
    ring = cust.select(
        hash_bucket(F.col("c_custkey").cast("string"), RING_NODES)
        .cast("int")
        .alias("node")
    )
    per_node = ring.groupBy("node").agg(F.count(F.lit(1)).alias("n_keys"))
    wall = Window.partitionBy()
    return per_node.select(
        "node",
        "n_keys",
        F.round(
            F.col("n_keys").cast("double") / F.sum("n_keys").over(wall), 9
        ).alias("share"),
        F.round(
            (F.col("n_keys") * RING_NODES).cast("double")
            / F.sum("n_keys").over(wall),
            9,
        ).alias("imbalance"),
    )


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (round 3)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 64       # hashed-unigram feature buckets
DSIR_TARGET_LANG = "en"  # the "quality reference" distribution proxy
DSIR_TOP_K = 100        # resampled subset size


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
    score every raw document by how target-like its hashed-unigram
    distribution is, and keep the top-K.

    The technique, faithfully: featurize each document into B hashed
    n-gram buckets; fit bucket unigram models of the TARGET distribution
    (here: the ``lang = 'en'`` slice standing in for the curated
    reference corpus) and of the RAW corpus; a document's log importance
    weight is Σ_b count_b(doc) · ln(p_target(b) / p_raw(b)) with Laplace
    smoothing.  High-weight documents look like the target; resampling
    by weight shifts the pretraining mixture toward it.

    Scale shape: the two bucket models are ONE aggregation over the
    exploded token stream (B=64 rows out — broadcast back); the per-doc
    score is a second aggregation of the same stream.  Nothing holds
    state larger than B anywhere; the stream never carries text, only
    (doc_id, bucket).  Top-K is orderBy().limit() →
    TakeOrderedAndProject (never a global sort).

    Engine exactness: buckets hash via md5 (engine-independent, the
    hash_bucket convention); each ln() term is computed on an exact
    integer ratio, rounded to 9 dp, cast DECIMAL, and multiplied by the
    integer count BEFORE the decimal sum — associative, so the total is
    bit-identical across engines and partitionings (CLAUDE.md
    transcendental rule); the final weight casts to DOUBLE once on both
    sides and ties break on doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("tok"),
    ).withColumn(
        "bucket",
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10)
        .cast("bigint")
        % DSIR_BUCKETS,
    )
    # one pass over the token stream → both unigram models (64 rows)
    models = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
        ).alias("n_tgt"),
    )
    totals = models.agg(
        F.sum("n_raw").alias("tot_raw"), F.sum("n_tgt").alias("tot_tgt")
    )
    weights = (
        models.join(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                F.log(
                    ((F.col("n_tgt") + 1) / (F.col("tot_tgt") + DSIR_BUCKETS))
                    / ((F.col("n_raw") + 1) / (F.col("tot_raw") + DSIR_BUCKETS))
                ),
                9,
            )
            # |w| < 10 → DECIMAL(12,9); with count as DECIMAL(10,0) the
            # product is DECIMAL(22,9) — inside 38 digits on BOTH
            # engines, so no precision-loss rescale (Spark silently
            # drops product scale to 6 past 38 digits; DuckDB keeps it)
            .cast("decimal(12,9)")
            .alias("w"),
        )
    )
    scored = (
        toks.groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_tokens"),
            # integer count × decimal weight: exact product, associative decimal
            # sum (DuckDB rejects DECIMAL×DECIMAL widths past 38)
            F.sum(F.col("n").cast("decimal(10,0)") * F.col("w")).alias("_lw"),
        )
    )
    return (
        scored.select(
            "doc_id",
            "n_tokens",
            F.col("_lw").cast("double").alias("log_importance"),
        )
        .orderBy(F.col("log_importance").desc(), "doc_id")
        .limit(DSIR_TOP_K)
    )
