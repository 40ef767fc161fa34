"""End-to-end training-corpus preparation plan: the composition showcase
for the north-star extensions — quality gating, language filtering, and
exact dedup chained as one declarative DataFrame program.

Pipeline (all single-pass until the dedup shuffle):
  documents
    → token/quality features (scan-side, codegen built-ins)
    → quality gate (min tokens, max punct ratio)
    → language gate (keep docs whose n-gram heuristic says English)
    → exact dedup (md5 groupBy, min doc_id wins — one shuffle)

At 100 TB the only exchange is the dedup groupBy on the 16-byte md5; every
filter runs at the scan.  The MinHash near-dup stage (dedup.py) would chain
after this with its own bucket shuffle — kept out of this query so the
whole plan stays SQL-expressible for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_embargo_spark.catalog import load_table
from etl_embargo_spark.operators.text import LANG_PROFILES, PUNCT_CLASS, _tokens

MIN_TOKENS = 10
MAX_PUNCT_RATIO = 0.10
# single source of truth with the text-analysis gates (operators/text.py)
STOPWORDS = list(LANG_PROFILES["en"])
MIN_STOPWORD_HITS = 2


def prepare_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, source, n_tokens) of the deduplicated, quality- and
    language-gated corpus; one row per distinct surviving text."""
    toks = _tokens()
    punct_stripped = F.regexp_replace(F.col("text"), PUNCT_CLASS, "")
    featured = docs.filter(F.col("n_chars") > 0).select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.size(toks).alias("n_tokens"),
        (
            (F.length("text") - F.length(punct_stripped))
            / F.length("text")
        ).alias("punct_ratio"),
        F.size(
            F.filter(toks, lambda t: t.isin(*STOPWORDS))
        ).alias("stopword_hits"),
    )
    gated = featured.filter(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("punct_ratio") <= MAX_PUNCT_RATIO)
        & (F.col("stopword_hits") >= MIN_STOPWORD_HITS)
    )
    return (
        gated.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("lang", "doc_id").alias("lang"),
            F.min_by("source", "doc_id").alias("source"),
            F.min_by("n_tokens", "doc_id").alias("n_tokens"),
        )
        .drop("text_hash")
    )


def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus prep: quality gate + language gate + exact dedup."""
    return prepare_corpus(load_table(spark, sf_dir, "documents"))


def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full prepare→split composition: the gated, deduplicated corpus
    carved into train/val/test by the deterministic md5 bucket of the
    representative doc_id, reported as per-split counts+token totals — the
    last step before a corpus ships to training.  Adds NO shuffle beyond
    corpus-prep's dedup groupBy except the 3-group final count."""
    from etl_embargo_spark.operators.sampling import hash_bucket, TRAIN_UPTO, VAL_UPTO

    corpus = prepare_corpus(load_table(spark, sf_dir, "documents"))
    bucket = hash_bucket(F.col("doc_id").cast("string"))
    tagged = corpus.withColumn(
        "split",
        F.when(bucket < TRAIN_UPTO, "train")
        .when(bucket < VAL_UPTO, "val")
        .otherwise("test"),
    )
    return tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def q_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-deliverable of the dedup suite: the corpus with near-dups
    REMOVED (rows-only — cluster assignment is iterative).  Exact-dup and
    blocked edit-distance pairs → connected components → every member that
    is not its component's representative (min doc_id) is dropped; output
    is the per-source keep/drop accounting.

    Scale shape: the drop-list is O(duplicates), far smaller than the
    corpus, so it broadcast-anti-joins back onto documents — the full
    corpus never shuffles.  Pytest holds the union-find oracle
    (tests/test_extensions.py::TestCorpusDedup)."""
    from etl_embargo_spark.operators.dedup import q_dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    clusters = q_dedup_clusters(spark, sf_dir)
    drop = (
        clusters.filter(F.col("doc_id") != F.col("cluster"))
        .select("doc_id")
        .withColumn("_dup", F.lit(True))
    )
    flagged = docs.join(F.broadcast(drop), "doc_id", "left")
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("_dup"), 1).otherwise(0)).alias("n_dropped"),
        F.sum(F.when(F.col("_dup").isNull(), 1).otherwise(0)).alias("n_kept"),
    )


def q_corpus_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The prepare→pack composition: the gated, deduplicated corpus laid
    out as contiguous 256-token context windows across 8 writer shards —
    the per-shard packing manifest (docs, tokens, windows, fill ratio) a
    training job reads to size its data loader.

    Scale shape: prep's dedup groupBy is the only corpus-sized shuffle;
    packing adds one O(shards) aggregate over (doc_id, n_tokens) ints —
    the text column never reaches the packing stage at all."""
    from etl_embargo_spark.operators.text import PACK_BUDGET, PACK_SHARDS

    corpus = prepare_corpus(load_table(spark, sf_dir, "documents"))
    per_shard = corpus.groupBy(
        (F.col("doc_id") % PACK_SHARDS).cast("int").alias("shard")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )
    n_windows = F.floor(
        (F.col("total_tokens") + PACK_BUDGET - 1) / PACK_BUDGET
    ).cast("bigint")
    return per_shard.select(
        "shard",
        "n_docs",
        "total_tokens",
        n_windows.alias("n_windows"),
        F.round(
            F.col("total_tokens") / (n_windows * PACK_BUDGET), 6
        ).alias("fill_ratio"),
    )
