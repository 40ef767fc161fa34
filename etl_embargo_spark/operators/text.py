"""Text analysis operators for training-data pipelines (north-star
extension): token counting, quality scoring, language ID, and document
fingerprinting — the first three pure built-ins (codegen), the fingerprint an
Arrow-batched kernel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_embargo_spark.catalog import load_table, spread_for_cpu

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "de": ("der", "die", "und", "das", "ist", "ein", "nicht", "mit"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "et", "les", "des", "un", "est", "que"),
}

PUNCT_CLASS = r"[.,!?;:'\"()\[\]{}-]"


def _tokens(col: str = "text") -> Column:
    return F.split(F.trim(F.lower(F.col(col))), r"\s+")


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate (count of
    letter-runs/digit-runs/punct as separate units via regexp extraction)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    ws_tokens = F.size(_tokens())
    # BPE-ish: every maximal letter-run, digit-run, or single non-space
    # symbol counts as one unit.
    units = F.size(
        F.expr(r"regexp_extract_all(lower(text), '([a-z]+|[0-9]+|[^a-z0-9\\s])', 1)")
    )
    return docs.select(
        "doc_id",
        ws_tokens.alias("n_tokens"),
        units.alias("n_units"),
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals: char length, token count, mean token length,
    punctuation ratio, stopword ratio — the standard cheap filters a
    pretraining pipeline applies before anything expensive."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    toks = _tokens()
    n_toks = F.size(toks)
    chars = F.length("text")
    punct = chars - F.length(F.regexp_replace("text", PUNCT_CLASS, ""))
    stop = F.size(
        F.filter(toks, lambda t: t.isin(*LANG_PROFILES["en"]))
    )
    return docs.select(
        "doc_id",
        chars.alias("n_chars_m"),
        n_toks.alias("n_tokens"),
        F.round(chars / n_toks, 6).alias("mean_token_len"),
        F.round(punct / chars, 6).alias("punct_ratio"),
        F.round(stop / n_toks, 6).alias("stopword_ratio"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID: score = |tokens ∩ profile_lang|,
    predicted language = argmax (ties broken by profile order), 'und'
    (undetermined) when every score is 0."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    toks = _tokens()
    scored = docs.select("doc_id", toks.alias("_toks"))
    langs = list(LANG_PROFILES)

    def _counter(words: tuple[str, ...]):
        # single-arg closure: a two-parameter lambda would make F.filter
        # pass the element index as the second argument
        return lambda t: t.isin(*words)

    for lang in langs:
        scored = scored.withColumn(
            f"score_{lang}",
            F.size(F.filter(F.col("_toks"), _counter(LANG_PROFILES[lang]))),
        )
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.when(best == 0, F.lit("und"))
    for lang in langs:
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.select(
        "doc_id",
        *[F.col(f"score_{l}") for l in langs],
        pred.alias("pred_lang"),
    )


VOCAB_TOP = 100
TFIDF_TOP = 3


def normalize_text(col: Column) -> Column:
    """Canonical text-normalization chain for dedup keys: lowercase, strip
    punctuation, collapse whitespace runs, trim.  Pure codegen built-ins —
    this is the cheap pass every corpus pipeline runs before hashing."""
    c = F.lower(col)
    c = F.regexp_replace(c, PUNCT_CLASS, "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized text + the md5 over it — normalization-aware exact dedup
    keys (catches duplicates that differ only in case/punct/whitespace,
    which byte-level md5 misses)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    norm = normalize_text(F.col("text"))
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).alias("n_chars_norm"),
        F.md5(norm).alias("norm_hash"),
    )


def q_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: collection term frequency + document frequency
    per token, top-100 by df.  The df side is a true distinct aggregate
    (count(DISTINCT doc_id)) — Spark plans it as a two-stage expand+agg
    with map-side partials, so the shuffle carries (token, doc_id) pairs
    once each, not every occurrence.  The top-100 is TakeOrderedAndProject
    (per-partition heaps), no global sort."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    toks = docs.select(
        "doc_id", F.explode(_tokens()).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("df").desc(), F.col("tf").desc(), "token")
        .limit(VOCAB_TOP)
    )


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document: tf per (doc, token), df per token,
    idf = ln((N+1)/(df+1)) + 1 (smoothed, sklearn-style), ranked by a
    per-doc window.

    Scale shape: the (doc, token) tf relation feeds BOTH the df rollup
    and the scoring join, so it is persisted — sharing via exchange
    reuse alone proved bimodal at sf1 (the soak measured the same query
    at 3 s and 8 s depending on whether the reuse kicked in; an explicit
    cache makes the sharing structural, per the CLAUDE.md shared-lineage
    rule).  The byte-small doc scan is spread before the CPU-bound
    tokenize/explode.  N arrives via a broadcast one-row cross join (no
    driver-side collect, the whole plan stays lazy); the final top-3 is
    WindowGroupLimit-pruned, so the rank shuffle carries at most 3 rows
    per doc out of each map task."""
    from pyspark.sql import Window

    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0),
        spark,
    )
    toks = docs.select("doc_id", F.explode(_tokens()).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf")
    ).persist()
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("_n") + 1) / (F.col("df") + 1))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP)
        .select("doc_id", "token", "tf", "df", "tfidf", "rank")
    )


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprint (array form, pytest-facing): Karp-
    Rabin rolling hash over characters, window-minimum selection
    (Schleimer et al., SIGMOD'03 'Winnowing: Local Algorithms for Document
    Fingerprinting').  Arrow batches; numpy does the rolling arithmetic."""
    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents"), spark
    ).filter(F.col("n_chars") > 0)

    def _fingerprint(batches):
        import numpy as _np
        import pandas as _pd

        K = 8       # gram length
        W = 16      # winnowing window
        BASE = _np.uint64(257)
        # 2^31-1: keeps every product (byte * power, hash * base) < 2^64 so
        # the uint64 modular arithmetic is exact — a 2^61 modulus silently
        # wraps and stops being Karp-Rabin
        MOD = _np.uint64((1 << 31) - 1)

        # B^t % MOD for t = K-1 .. 0 (leftmost byte weighted highest, same
        # value the rolling recurrence produces)
        POWERS_REV = _np.empty(K, dtype=_np.uint64)
        POWERS_REV[K - 1] = 1
        for _i in range(K - 2, -1, -1):
            POWERS_REV[_i] = (POWERS_REV[_i + 1] * BASE) % MOD

        def fp(text):
            # fully vectorized: K-gram hashes as one windowed dot product
            # (exact — max term 255·(MOD−1)·K < 2^42, no uint64 wrap), then
            # winnowing as a windowed argmin.  A scalar rolling-hash loop
            # here was ~1.5M Python iterations per batch and dominated the
            # operator's runtime.
            data = _np.frombuffer(text.encode("utf-8"), dtype=_np.uint8).astype(_np.uint64)
            n = data.size
            if n < K:
                return [int(data.sum() % MOD)] if n else [0]
            grams = _np.lib.stride_tricks.sliding_window_view(data, K)
            hs = (grams * POWERS_REV[None, :]).sum(axis=1) % MOD
            if hs.size <= W:
                return [int(hs.min())]
            # rightmost min per window, dedup consecutive selections
            wins = _np.lib.stride_tricks.sliding_window_view(hs, W)
            j = (
                _np.arange(wins.shape[0])
                + (W - 1)
                - _np.argmin(wins[:, ::-1], axis=1)
            )
            keep = _np.empty(j.size, dtype=bool)
            keep[0] = True
            keep[1:] = j[1:] != j[:-1]
            return [int(v) for v in hs[j[keep]]]

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fingerprint": [fp(t or "") for t in pdf["text"]],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        _fingerprint, schema="doc_id long, fingerprint array<long>"
    ).select("doc_id", F.size("fingerprint").alias("n_grams"), "fingerprint")


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of the winnowing fingerprint: per-doc fingerprints
    reduced to a checksum rollup (grp = doc_id % 16 → n_docs, total_grams,
    docs_sum).  The winnowing itself is not ANSI-SQL-expressible but IS
    deterministic, so the rollup gets a pinned literal DuckDB oracle; the
    array form stays available via :func:`doc_fingerprints` (pytest
    oracle)."""
    from etl_embargo_spark.operators.aggregates import rows_checksum

    fp = doc_fingerprints(spark, sf_dir).select(
        "doc_id",
        "n_grams",
        F.md5(
            F.concat_ws(",", F.transform("fingerprint", lambda v: v.cast("string")))
        ).alias("fp_md5"),
    )
    return fp.groupBy((F.col("doc_id") % 16).cast("int").alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_grams").alias("total_grams"),
        rows_checksum("doc_id", "n_grams", "fp_md5").alias("docs_sum"),
    )


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (bits):
    H = log2(N) − Σ tf·log2(tf) / N, computed from per-(doc, token) counts
    in one pass — the algebraic form avoids materializing probabilities.
    Low entropy flags boilerplate/repetitive documents, a standard corpus
    quality signal.  Two chained aggregations, both with map-side partials:
    the (doc, token) shuffle carries distinct tokens once each (not every
    occurrence), and the per-doc rollup shuffles one row per (doc, token)
    group — the exploded token stream itself never crosses the wire."""
    # spread the byte-small doc scan before the CPU-bound tokenize/
    # explode (3 partitions at sf1 otherwise; no-op once scans are wide)
    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0),
        spark,
    )
    tf = (
        docs.select("doc_id", F.explode(_tokens()).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_unique"),
        F.round(
            F.log2(F.sum("tf"))
            - F.sum(F.col("tf") * F.log2("tf")) / F.sum("tf"),
            4,
        ).alias("entropy_bits"),
    )


NGRAM_TOP = 50


def q_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-50 bigrams: adjacent-token pairs built array-side
    (codegen transform over the token array, no self-join on position),
    exploded once, counted, TakeOrderedAndProject for the top-k — the
    n-gram language-model counting shape.  Deterministic tie-break on the
    bigram string."""
    # spread the byte-small doc scan before the CPU-bound tokenize/
    # explode (3 partitions at sf1 otherwise; no-op once scans are wide)
    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0),
        spark,
    )
    toks = docs.select(_tokens().alias("t")).filter(F.size("t") >= 2)
    bigrams = toks.select(
        F.explode(
            F.expr("transform(sequence(0, size(t)-2), i -> concat(t[i], ' ', t[i+1]))")
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(NGRAM_TOP)
    )


EMAIL_RE = "[a-z0-9.]+@[a-z0-9.]+[a-z]"
PHONE_RE = "[0-9]{3}-[0-9]{4}"


def scrub_pii(col: Column) -> Column:
    """Redact emails then phone numbers with typed placeholder tokens.
    Both patterns are deliberately in the regex subset where Java regex
    (Spark) and RE2 (DuckDB, Go) agree — no backrefs, no lookaround —
    so the scrub is engine-portable.  Pure codegen regexp_replace: this
    runs at scan speed, the right cost profile for a pass applied to
    every document of a 100 TB corpus."""
    c = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(c, PHONE_RE, "<PHONE>")


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over documents: deterministic synthetic emails/phones
    are appended to each text (the corpus itself is PII-free), then
    redacted; output carries the per-doc match counts and the md5 of the
    scrubbed text so the oracle checks the exact redaction result, not
    just the counts."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    pii_text = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com tel 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    with_pii = docs.select("doc_id", pii_text.alias("pii_text"))
    return with_pii.select(
        "doc_id",
        F.regexp_count("pii_text", F.lit(EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count("pii_text", F.lit(PHONE_RE)).cast("int").alias("n_phones"),
        F.md5(scrub_pii(F.col("pii_text"))).alias("scrubbed_hash"),
    )


CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def q_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking for training pipelines: each document split into
    64-token chunks on a 48-token stride (16 tokens of overlap), the
    standard context-window packing step before tokenization.  All
    array-side codegen — sequence() generates the chunk starts, slice()
    cuts each window, one explode — so chunking is a narrow map over the
    corpus scan: no shuffle, no UDF, and the text column crosses the wire
    exactly once however large the corpus.  The chunk md5 pins exact
    chunk content in the oracle, not just counts."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    toks = docs.select("doc_id", _tokens().alias("t")).filter(
        F.size("t") > 0
    )
    starts = F.sequence(
        F.lit(0), F.size("t") - 1, F.lit(CHUNK_STRIDE)
    )
    chunks = toks.select(
        "doc_id",
        F.size("t").alias("doc_tokens"),
        F.explode(starts).alias("start"),
        F.col("t"),
    )
    chunk_arr = F.slice("t", F.col("start") + 1, F.lit(CHUNK_TOKENS))
    return chunks.select(
        "doc_id",
        (F.col("start") / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
        "doc_tokens",
        F.size(chunk_arr).alias("chunk_tokens"),
        F.md5(F.array_join(chunk_arr, " ")).alias("chunk_md5"),
    )


DECON_NGRAM = 8
DECON_EVAL_MOD = 97  # doc_id % 97 == 0 plays the held-out eval set


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag training documents sharing any
    8-gram with the held-out set (doc_id % 97 == 0 stands in for the
    benchmark corpus).  This is the n-gram overlap check run before every
    serious LLM training job.

    Scale shape: the eval side is tiny by construction, so its distinct
    8-gram set BROADCASTS; the training corpus explodes to distinct
    (doc, gram) pairs once and probes the broadcast set with a left-semi
    join — the corpus never shuffles for the probe, only for its own
    per-doc distinct/rollup, and gram strings (not documents) are the
    widest thing in flight."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    is_eval = F.col("doc_id") % DECON_EVAL_MOD == 0
    toks = docs.select(
        "doc_id", is_eval.alias("is_eval"), _tokens().alias("t")
    ).filter(F.size("t") >= DECON_NGRAM)
    grams = toks.select(
        "doc_id",
        "is_eval",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - DECON_NGRAM),
                lambda i: F.array_join(
                    F.slice("t", i + 1, F.lit(DECON_NGRAM)), " "
                ),
            )
        ).alias("g"),
    ).distinct()
    eval_grams = grams.filter("is_eval").select("g").distinct()
    train = grams.filter(~F.col("is_eval"))
    totals = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        train.join(F.broadcast(eval_grams), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return totals.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
        (F.coalesce("n_hit", F.lit(0)) > 0).alias("contaminated"),
    )


PACK_BUDGET = 256  # tokens per packed context window
PACK_SHARDS = 8  # independent pack-writer shards


def q_pack_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous context-window packing (GPT-style pretraining layout):
    documents are concatenated into one token stream per writer shard
    (doc_id order within shard = doc_id % 8) and the stream is split at
    fixed 256-token boundaries.  Per document: its start offset in the
    shard's stream, the context window its first token lands in, and how
    many windows it straddles — the bookkeeping a sequence-packing job
    needs to write attention-mask boundaries.

    Scale shape: ONE shuffle, on the shard key — each shard is an
    independent sequential pack-writer (exactly how a distributed packing
    job parallelizes), and the running total inside a shard is a single
    window cumsum: no iteration, no UDF, token COUNTS (ints) are the only
    thing shuffled, never text."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).cast("int").alias("shard"),
        F.size(_tokens()).alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    start = (
        F.sum("n_tokens").over(w).cast("bigint") - F.col("n_tokens")
    ).alias("start_offset")
    staged = toks.select("doc_id", "shard", "n_tokens", start)
    first_win = F.floor(F.col("start_offset") / PACK_BUDGET)
    last_win = F.floor(
        (F.col("start_offset") + F.col("n_tokens") - 1) / PACK_BUDGET
    )
    return staged.select(
        "doc_id",
        "shard",
        "n_tokens",
        "start_offset",
        first_win.cast("int").alias("window_id"),
        (last_win - first_win + 1).cast("int").alias("windows_spanned"),
    )


BPE_TOP = 50


def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first iteration of BPE vocabulary training: corpus-wide
    adjacent-character-pair counts weighted by word frequency — the
    argmax of this table is the first merge rule.

    Scale shape: the corpus collapses to DISTINCT words + counts first
    (vocabulary-sized, zipf-bounded — orders of magnitude smaller than
    the corpus), so the quadratic-ish pair explosion runs over the
    vocabulary, not the text; both shuffles are map-side combined and
    the top-50 is a per-partition heap.  Pair slicing is substr over a
    generated index array — pure codegen, no UDF."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    words = docs.select(F.explode(_tokens()).alias("w")).filter(
        F.length("w") >= 2
    )
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    pair = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.length("w") - 1),
            lambda i: F.col("w").substr(i, F.lit(2)),
        )
    ).alias("pair")
    return (
        wc.select("cnt", pair)
        .groupBy("pair")
        .agg(F.sum("cnt").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(BPE_TOP)
    )


def q_label_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical dictionary encoding: a stable integer id per (column,
    value) for the documents table's categoricals, ordered by descending
    frequency (id 0 = most common — the layout embedding tables want).

    Scale shape: each dictionary is built from a map-side-combined
    value-count aggregate (dictionary-sized thereafter); the id is
    row_number over (count desc, value) — deterministic under any
    partitioning.  The two dictionaries union AFTER encoding, so each
    window is tiny and per-column."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    outs = []
    for col in ("lang", "source"):
        counts = docs.groupBy(F.col(col).alias("value")).agg(
            F.count(F.lit(1)).alias("n")
        )
        w = Window.orderBy(F.desc("n"), "value")
        outs.append(
            counts.select(
                F.lit(col).alias("column"),
                "value",
                (F.row_number().over(w) - 1).alias("code"),
                "n",
            )
        )
    return outs[0].unionByName(outs[1])


def q_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights per language — the standard
    imbalanced-sampling correction (weight = N / (k · n_c), so a
    uniform draw over weighted classes sees each language equally).

    Scale shape: one aggregate; N and k are window sums over the
    class-count relation (languages, not rows), exactly the
    single-scan shared-lineage shape of q_mutual_info."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_c"))
    w = Window.partitionBy(F.lit(1))
    staged = counts.select(
        "lang",
        "n_c",
        F.sum("n_c").over(w).alias("n_total"),
        F.count(F.lit(1)).over(w).alias("k"),
    )
    return staged.select(
        "lang",
        "n_c",
        F.round(
            F.col("n_total") / (F.col("k") * F.col("n_c")), 6
        ).alias("weight"),
    )


PPL_BITS_DECIMALS = 6  # quantize per-token bits before the exact sum


def q_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity per document — the classic pretraining
    quality filter (wiki-LM perplexity gates): documents whose tokens
    are improbable under the corpus distribution score high and get
    culled.

    Scale shape: the vocabulary (with its window-summed total) is
    zipf-bounded and broadcasts onto the exploded token stream; the
    per-doc reduction is a map-side-combined sum.  Per-token bits
    (-log2 p) are QUANTIZED to 6 decimals and summed in exact decimal:
    libm log2 differs in the last ulp across engines, and a float sum of
    ~100 such terms also depends on addition order — quantize-then-
    exact-sum removes both without moving perplexity at the reported
    4 decimals."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    toks = docs.select(
        "doc_id", F.explode(_tokens()).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy(F.lit(1)))
    probs = vocab.select(
        "tok",
        (-F.log2(F.col("n") / total))
        .cast(f"decimal(18,{PPL_BITS_DECIMALS})")
        .alias("bits"),
    )
    per_doc = (
        toks.join(F.broadcast(probs), "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("bits").alias("total_bits"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    ppl = F.pow(
        F.lit(2.0),
        F.col("total_bits").cast("double") / F.col("n_tokens"),
    )
    return per_doc.select(
        "doc_id", "n_tokens", F.round(ppl, 4).alias("perplexity")
    )


BIGRAM_LL_DECIMALS = 6  # quantize per-bigram log-likelihoods


def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-one-smoothed BIGRAM language model, trained and applied in
    one declarative plan: corpus-wide conditional bigram likelihoods
    p(w2|w1) = (c(w1,w2)+1)/(c(w1·)+V), then every document scored by
    its total bigram negative log-likelihood — the context-sensitive
    upgrade of q_perplexity's unigram gate (boilerplate and shuffled
    text score high under a bigram LM even when their unigram profile
    looks natural).

    Scale shape: the model is BIGRAM-VOCAB-sized, never corpus-sized —
    bigram and context counts collapse map-side from one pass over the
    in-array adjacent pairs (codegen transform over sequence, the
    q_pmi shape), and the per-doc reduction joins doc-local bigram
    TYPE counts against the model on its natural (w1, w2) key (every
    observed doc bigram is in the model by construction, so the join
    is inner and lossless).  Engine determinism: each log-likelihood
    is rounded to BIGRAM_LL_DECIMALS and cast DECIMAL before the
    per-doc sum (decimal sums are associative; libm 1-ulp skew never
    flips the rounding — the q_naive_bayes rule), and the emitted
    score is the exact micro-unit integer."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    t = docs.select("doc_id", "lang", _tokens().alias("t")).filter(
        F.size("t") >= 2
    )
    big = t.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2), "
                "i -> struct(t[i] AS w1, t[i + 1] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "lang", "b.w1", "b.w2")
    # ONE tokenization pass feeds the whole model chain: corpus bigram
    # counts roll up from the per-doc type counts, and context counts
    # roll up from those (sum(n_d) == count of instances) — without the
    # persist+rollup each of the three aggregates re-scans and
    # re-explodes the corpus (measured: 4 full parquet scans in the
    # naive plan, 2 after)
    dbc = big.groupBy("doc_id", "lang", "w1", "w2").agg(
        F.count(F.lit(1)).alias("n_d")
    ).persist()
    cb = dbc.groupBy("w1", "w2").agg(F.sum("n_d").alias("n_b"))
    cu = cb.groupBy("w1").agg(F.sum("n_b").alias("n_u"))
    # smoothing denominator uses the FULL vocabulary (final-position
    # tokens included), not just observed contexts
    vdf = docs.select(F.explode(_tokens()).alias("tok")).agg(
        F.count_distinct("tok").alias("v")
    )
    ll = (
        cb.join(cu, "w1")
        .crossJoin(F.broadcast(vdf))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (F.col("n_b") + F.lit(1.0))
                    / (F.col("n_u") + F.col("v"))
                ),
                BIGRAM_LL_DECIMALS,
            )
            .cast(f"decimal(18,{BIGRAM_LL_DECIMALS})")
            .alias("ll"),
        )
    )
    per_doc = dbc.join(ll, ["w1", "w2"]).groupBy("doc_id", "lang").agg(
        F.sum(F.col("n_d") * F.col("ll")).alias("s"),
        F.sum("n_d").alias("n_bigrams"),
    )
    # s carries exactly BIGRAM_LL_DECIMALS decimals -> micro units are
    # an exact integer; the bigint cast truncates nothing
    return per_doc.select(
        "doc_id",
        "lang",
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        (-F.col("s") * 1000000).cast("bigint").alias("nll_micro"),
    )


ZIPF_TOP = 1000


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law check: the log-log slope of the vocabulary's
    rank-frequency curve over the top-1000 terms — natural text sits
    near slope -1; a corpus that doesn't is machine-generated, boiler-
    plate-heavy, or mis-tokenized.  Exercises the regression-aggregate
    surface (regr_slope/intercept/r2).

    Scale shape: the top-1000 head comes from TakeOrderedAndProject
    (per-partition heaps — a partitionless row_number window would sort
    the WHOLE vocabulary in one partition: Spark's WindowGroupLimit
    rewrite doesn't fire without a partition key); the rank window then
    runs over just those 1000 rows, and the regression aggregates reduce
    them map-side to constant state.  Rounded at 4 decimals (the moment
    sums are float and ~1e-12 order-sensitive at this cardinality)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    vocab = (
        docs.select(F.explode(_tokens()).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = vocab.orderBy(F.desc("n"), "tok").limit(ZIPF_TOP)
    w = Window.orderBy(F.desc("n"), "tok")
    head = top.withColumn("rank", F.row_number().over(w))
    x = F.log2("rank")
    y = F.log2("n")
    return head.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 4).alias("r2"),
    )


REP_TOP_UNIGRAM_DEN = 10  # keep iff top unigram ≤ 1/10 of tokens
REP_DUP_BIGRAM_DEN = 10  # keep iff duplicated-bigram mass ≤ 1/10 of bigrams


def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition gate: per document the
    top-unigram fraction, duplicate-unigram mass, duplicate-bigram mass,
    and the keep decision (top unigram ≤ 1/10 of tokens AND duplicated
    bigrams ≤ 1/10 of bigrams) — the repetition signals of Rae et al.
    2021 §A1.1, which catch boilerplate and looping text that
    length/punctuation filters miss.

    Scale shape: two explode→groupBy passes (unigrams, then array-built
    adjacent bigrams — no position self-join), each re-aggregated to one
    row per document with map-side partials; the doc-sized relations then
    join on doc_id.  The keep decision is exact integer arithmetic
    (cnt×10 ≤ total), so no float-boundary drift between engines; the
    reported fractions are rounded for display only.
    """
    # spread the byte-small doc scan before the CPU-bound tokenize/
    # explode (3 partitions at sf1 otherwise; no-op once scans are wide)
    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0),
        spark,
    )
    uni = (
        docs.select("doc_id", F.explode(_tokens()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.max("cnt").alias("top_cnt"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias(
                "dup_uni"
            ),
        )
    )
    arr = docs.select("doc_id", _tokens().alias("t")).filter(
        F.size("t") >= 2
    )
    bi = (
        arr.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t)-2),"
                    " i -> concat(t[i], ' ', t[i+1]))"
                )
            ).alias("bg"),
        )
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_bi"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias(
                "dup_bi"
            ),
        )
    )
    return uni.join(bi, "doc_id").select(
        "doc_id",
        "n_tokens",
        F.round(F.col("top_cnt") / F.col("n_tokens"), 6).alias(
            "top_unigram_frac"
        ),
        F.round(F.col("dup_uni") / F.col("n_tokens"), 6).alias(
            "dup_unigram_frac"
        ),
        F.round(F.col("dup_bi") / F.col("n_bi"), 6).alias(
            "dup_bigram_frac"
        ),
        (
            (F.col("top_cnt") * REP_TOP_UNIGRAM_DEN <= F.col("n_tokens"))
            & (F.col("dup_bi") * REP_DUP_BIGRAM_DEN <= F.col("n_bi"))
        ).alias("keep"),
    )


FEATURE_HASH_DIM = 64  # hashing-trick bucket count
BPE_MERGES = 8  # q_bpe_train rounds


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index construction: per token its document frequency,
    collection frequency, and the full sorted posting list (comma-joined
    string so the value-hash is array-layout independent).

    Scale shape: two-level aggregate — (token, doc_id) occurrence counts
    first (map-side combined, so the token shuffle carries one row per
    posting, not per occurrence), then the token rollup builds the list
    via collect_list + array_sort over the already-distinct relation
    (numeric sort on both engines).  At 100 TB the per-token list is the
    classic skew point — the natural extension is range-bucketed
    postings (token, shard) — but this is the building block either
    way."""
    # spread the byte-small doc scan before the CPU-bound tokenize/
    # explode (3 partitions at sf1 otherwise; no-op once scans are wide)
    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0),
        spark,
    )
    toks = docs.select("doc_id", F.explode(_tokens()).alias("token"))
    td = toks.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    return td.groupBy("token").agg(
        F.sum("c").alias("cf"),
        F.count(F.lit(1)).alias("df"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list("doc_id")),
                lambda d: d.cast("string"),
            ),
        ).alias("postings"),
    )


def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurizer: per document, token counts folded into
    FEATURE_HASH_DIM buckets by the engine-portable md5 bucket (the
    sampling.hash_bucket idiom) — the fixed-width sparse feature map used
    when a vocabulary is unbounded or training is online.

    Scale shape: explode → two-level aggregate (doc × bucket), all
    map-side combined; the dictionary-free property is the point — no
    vocab build, no broadcast, stateless and embarrassingly parallel."""
    from etl_embargo_spark.operators.sampling import hash_bucket

    # spread the byte-small doc scan before the CPU-bound tokenize/
    # explode (3 partitions at sf1 otherwise; no-op once scans are wide)
    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0),
        spark,
    )
    toks = docs.select("doc_id", F.explode(_tokens()).alias("token"))
    return (
        toks.withColumn(
            "bucket", hash_bucket(F.col("token"), FEATURE_HASH_DIM)
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_train_state(
    spark: SparkSession, sf_dir: str
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """(learned merge list, final encoded (sym, cnt) vocabulary) after
    BPE_MERGES training rounds — the shared engine behind q_bpe_train
    (which returns the merge table) and q_bpe_encode (which reads the
    final vocabulary state: training's last round has already APPLIED
    every merge, so encoding the corpus costs nothing extra).

    Scale shape: the corpus collapses ONCE to (word, count) — the
    zipf-bounded vocabulary — and every round after that runs over the
    vocabulary relation only: adjacent symbol-pair counts are a map-side
    combined aggregate, the argmax is a 1-row TakeOrdered, and the merge
    applies as a single codegen regexp-free string replace on the
    space-joined symbol form (left-to-right non-overlapping — exactly
    BPE's greedy application).  The vocab relation is lazily
    localCheckpoint'ed per round so the replace chain never re-executes.
    Pytest replays the identical algorithm in pure Python
    (tests/test_extensions.py::TestBpeTrain)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    words = docs.select(F.explode(_tokens()).alias("w")).filter(
        F.length("w") >= 2
    )
    wc = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # symbols joined by spaces, with sentinel spaces at both ends so
        # a merge is always the literal replace of ' a b ' by ' ab '
        .select(
            F.concat(
                F.lit(" "),
                F.concat_ws(" ", F.split(F.col("w"), "(?!^)")),
                F.lit(" "),
            ).alias("sym"),
            "cnt",
        )
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(BPE_MERGES):
        syms = F.split(F.trim(F.col("sym")), " ")
        # fully-merged words (ONE symbol left) contribute no pairs — and
        # must be filtered BEFORE the sequence: sequence(0, -1) produces a
        # DESCENDING [0, -1] and the transform then indexes past the array
        # (crashed on the sf1 corpus, whose tiny zipf vocabulary fully
        # merges short frequent words within BPE_MERGES rounds)
        pairs = wc.filter(F.size(syms) >= 2).select(
            "cnt",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(syms) - 2),
                    lambda i: F.struct(
                        F.element_at(syms, i + 1).alias("l"),
                        F.element_at(syms, i + 2).alias("r"),
                    ),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.col("p.l"), F.col("p.r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, weight = top[0].p.l, top[0].p.r, top[0].n
        merges.append((step, left, right, left + right, int(weight)))
        # lookarounds keep the boundary spaces unconsumed — a literal
        # ' a b ' replace would eat the space shared with the NEXT
        # occurrence and merge only every other one; \Q..\E quotes the
        # learned symbols so regex metacharacters in real corpora are
        # inert
        pat = f"(?<= )\\Q{left}\\E \\Q{right}\\E(?= )"
        wc = wc.select(
            F.regexp_replace(
                F.col("sym"), pat, f"{left}{right}"
            ).alias("sym"),
            "cnt",
        ).localCheckpoint(eager=False)
    return merges, wc


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only (iterative): the learned BPE merge table (step, left,
    right, merged, weight) — see :func:`bpe_train_state` for the
    algorithm and scale shape."""
    merges, _ = bpe_train_state(spark, sf_dir)
    return spark.createDataFrame(
        merges, "step int, left string, right string, merged string, weight bigint"
    )


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only (iterative upstream): ENCODE the corpus with the
    trained BPE merges — the apply half of the tokenizer lifecycle
    (q_bpe_train learns; this measures what the learned vocabulary does
    to the corpus): per tokens-per-word bucket, the distinct-word count,
    the corpus word occurrences, and the exact character mass, plus the
    per-bucket mean compression (chars per token).

    Scale shape: training's final vocabulary state has ALREADY applied
    every merge (greedy left-to-right, the canonical BPE apply), so
    encoding adds one map-side-combined aggregate over the
    vocabulary-sized relation — no extra corpus scan, no extra merge
    passes.  Engine determinism: counts and character masses are exact
    integers; the one division is exact-int/exact-int, rounded 6 dp."""
    _, wc = bpe_train_state(spark, sf_dir)
    toks = F.size(F.split(F.trim(F.col("sym")), " "))
    chars = F.length(F.translate(F.col("sym"), " ", ""))
    per = wc.select(
        toks.alias("n_toks"), chars.alias("n_chars"), "cnt"
    )
    agg = per.groupBy("n_toks").agg(
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.sum("cnt").alias("n_word_occurrences"),
        F.sum(F.col("cnt") * F.col("n_chars")).alias("char_mass"),
    )
    return agg.select(
        "n_toks",
        "n_distinct_words",
        "n_word_occurrences",
        "char_mass",
        F.round(
            F.col("char_mass").cast("double")
            / (F.col("n_toks") * F.col("n_word_occurrences")),
            6,
        ).alias("chars_per_token"),
    )


def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only (iterative upstream): per-LANGUAGE tokenizer fertility
    (VERDICT r10 #6) — tokens/word and chars/token by the documents
    table's lang column, the planning number an LLM data team reads to
    spot vocabulary under-allocation for a language (high tokens/word =
    the learned merges don't serve that language's word shapes).
    Closes the BPE lifecycle: q_bpe_train learns, q_bpe_encode measures
    corpus-level compression, this breaks it down by language.

    Scale shape: the trained vocabulary state (word → token count,
    already merge-applied by training's last round) is zipf-BOUNDED and
    broadcasts; the corpus contributes ONE extra scan — per-(lang,
    word) counts, map-side combined to the lang×vocab grid before the
    broadcast join — and the final rollup is language-sized.

    Engine determinism: counts and character masses are exact
    integers; each fertility is one exact-int/exact-int IEEE division,
    rounded 6 dp (pinned oracle — the vocabulary state is iterative,
    not SQL-expressible)."""
    _, wc = bpe_train_state(spark, sf_dir)
    vocab = wc.select(
        F.translate(F.col("sym"), " ", "").alias("w"),
        F.size(F.split(F.trim(F.col("sym")), " ")).alias("n_toks"),
        F.length(F.translate(F.col("sym"), " ", "")).alias("wlen"),
    )
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    # same word gate as bpe_train_state (length >= 2) so every corpus
    # word hits the vocabulary exactly
    lw = (
        docs.select("lang", F.explode(_tokens()).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    agg = lw.join(F.broadcast(vocab), "w").groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.sum("cnt").alias("n_words"),
        F.sum(F.col("cnt") * F.col("n_toks")).alias("n_tokens"),
        F.sum(F.col("cnt") * F.col("wlen")).alias("char_mass"),
    )
    return agg.select(
        "lang",
        "n_distinct_words",
        "n_words",
        "n_tokens",
        "char_mass",
        F.round(
            F.col("n_tokens").cast("double") / F.col("n_words"), 6
        ).alias("tokens_per_word"),
        F.round(
            F.col("char_mass").cast("double") / F.col("n_tokens"), 6
        ).alias("chars_per_token"),
    )


PMI_MIN_COUNT = 5  # collocation support floor


def q_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocations: every adjacent token
    pair with support ≥ PMI_MIN_COUNT, scored by PMI — the classic
    collocation detector (NSP / word2vec-era association measure) that
    separates structural phrases from chance co-occurrence.

    Scale shape: two corpus scans collapse to the unigram and bigram
    count relations (map-side combined); the unigram relation is
    vocabulary-sized but the DISTINCT-BIGRAM relation is not (a zipf
    tail makes it grow with the corpus — ~1M rows at sf1 on the
    10k-type vocabulary), so the totals NEVER come from an empty-window
    sum over it (round 6: the window form single-partitioned the full
    bigram relation — the repo's own "windows only over collapsed
    relations" rule).  Both totals are instead exact DOC-LEVEL
    identities — n_uni = Σ size(tokens), n_bi = Σ (size(tokens) − 1)
    over docs with ≥ 2 tokens — one cheap 1-row aggregate over the doc
    relation, crossJoin-broadcast back; no relation is consumed twice.
    The unigram marginals broadcast onto the bigram table twice.  PMI
    is a single log2 of a ratio of exact integer counts —
    engine-stable under round(·, 6).  The support floor is the scale
    valve: it bounds the output by the true collocation set, not the
    corpus."""
    # spread the byte-small doc scan: tokenize + bigram explode is
    # CPU-bound and the sf1 parquet arrives as 3 partitions (scan-level
    # input — the only place spread_for_cpu is allowed)
    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0),
        spark,
    ).persist()  # three consumers (totals, unigrams, bigrams) share the
    # spread scan instead of re-shuffling it per consumer
    sizes = docs.select(F.size(_tokens()).alias("_sz"))
    totals = sizes.groupBy().agg(
        F.sum("_sz").alias("n_uni"),
        F.sum(
            F.when(F.col("_sz") >= 2, F.col("_sz") - 1).otherwise(0)
        ).alias("n_bi"),
    ).persist()
    uni = (
        docs.select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_tok"))
    )
    toks = docs.select(_tokens().alias("t")).filter(F.size("t") >= 2)
    bi = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t)-2),"
                    " i -> struct(t[i] as w1, t[i+1] as w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .filter(F.col("n_xy") >= PMI_MIN_COUNT)
        .crossJoin(F.broadcast(totals.select("n_bi")))
    )
    uni = uni.crossJoin(F.broadcast(totals.select("n_uni")))
    left = uni.select(
        F.col("token").alias("w1"),
        F.col("n_tok").alias("n_x"),
        "n_uni",
    )
    right = uni.select(
        F.col("token").alias("w2"), F.col("n_tok").alias("n_y")
    )
    joined = bi.join(F.broadcast(left), "w1").join(F.broadcast(right), "w2")
    pmi = F.log2(
        (F.col("n_xy") / F.col("n_bi"))
        / (
            (F.col("n_x") / F.col("n_uni"))
            * (F.col("n_y") / F.col("n_uni"))
        )
    )
    return joined.select(
        "w1",
        "w2",
        "n_xy",
        "n_x",
        "n_y",
        F.round(pmi, 6).alias("pmi"),
    )


RARE_MIN_COUNT = 5  # cells below this collapse into __other__


def q_rare_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-tail category collapsing: (lang, source) cells with fewer
    than RARE_MIN_COUNT documents are recoded to '__other__' — the
    cardinality-capping featurizer that keeps one-hot/embedding tables
    bounded no matter how many raw categories the corpus grows.

    Scale shape: the corpus collapses to cell counts in one map-side-
    combined shuffle; the recode and re-aggregation run over the
    cell relation (categories, not rows).  In a pipeline the recode
    dictionary (tiny) broadcasts back onto the corpus scan — the same
    broadcast-dim shape as q_winsorize's bounds."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_cell")
    )
    recoded = cells.select(
        "lang",
        F.when(F.col("n_cell") >= RARE_MIN_COUNT, F.col("source"))
        .otherwise(F.lit("__other__"))
        .alias("source_code"),
        "n_cell",
    )
    return recoded.groupBy("lang", "source_code").agg(
        F.sum("n_cell").alias("n"),
        F.count(F.lit(1)).cast("int").alias("n_merged_cells"),
    )


BM25_TERMS = ("spark", "scan", "join")  # the standing retrieval query
BM25_K1 = 1.2
BM25_B = 0.75


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against a fixed term query —
    the retrieval scorer behind quality-ranked corpus curation and
    dedup-aware search (tf saturation via k1, length normalization via
    b — the two things raw TF-IDF gets wrong).

    Scale shape: tf is a map-side-combined (doc, term) aggregate over
    ONLY the query terms (the explode filters to |terms| before any
    shuffle); df and the corpus stats (N, avgdl) are term-/1-row-sized
    and broadcast; the scoring join touches each matching doc once.
    The idf log runs over exact integer counts — engine-stable under
    round(·, 6)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    lens = docs.select(
        "doc_id", F.size(_tokens()).cast("bigint").alias("dl")
    )
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    )
    tf = (
        docs.select("doc_id", F.explode(_tokens()).alias("token"))
        .filter(F.col("token").isin(*BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    joined = (
        tf.join(F.broadcast(df_), "token")
        .join(F.broadcast(lens), "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("total_dl") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    term_score = (
        idf
        * F.col("tf")
        * (BM25_K1 + 1)
        / (
            F.col("tf")
            + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / avgdl)
        )
    )
    return (
        joined.select("doc_id", term_score.alias("s"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_terms_hit"),
            F.round(F.sum("s"), 6).alias("bm25"),
        )
    )


CARD_PREFIX_BYTES = 64  # duplicate-signature slice (no full dups exist)


def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card for the documents corpus: size, language
    mix (count, mode, share, entropy), length stats, token volume, and
    the prefix-signature duplicate-group count — the summary block a
    training-data pipeline publishes with every corpus release.

    Scale shape: three independent map-side-collapsed passes (language
    cells, doc-level lengths, signature groups) crossJoined as 1-row
    broadcasts; nothing wider than the language relation is ever held.
    The entropy is a log2 over exact integer cell counts."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    langs = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    w_all = Window.partitionBy()
    w_top = Window.orderBy(F.desc("n_l"), "lang")
    probed = langs.select(
        "lang",
        "n_l",
        F.sum("n_l").over(w_all).alias("n_docs"),
        (F.col("n_l") / F.sum("n_l").over(w_all)).alias("p"),
    )
    lang_stats = (
        probed.select(
            "lang",
            "n_l",
            "n_docs",
            F.row_number().over(w_top).alias("rk"),
            F.count(F.lit(1)).over(w_all).cast("int").alias("n_langs"),
            F.sum(-F.col("p") * F.log2("p")).over(w_all).alias("ent"),
        )
        .filter(F.col("rk") == 1)
        .select(
            "n_docs",
            "n_langs",
            F.col("lang").alias("top_lang"),
            F.round(F.col("n_l") / F.col("n_docs"), 6).alias(
                "top_lang_share"
            ),
            F.round("ent", 6).alias("lang_entropy"),
        )
    )
    lens = docs.select(
        F.col("n_chars"), F.size(_tokens()).cast("bigint").alias("n_tok")
    ).agg(
        F.round(
            F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4
        ).alias("mean_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_tok").alias("total_tokens"),
    )
    dups = (
        docs.groupBy(
            F.md5(F.substring("text", 1, CARD_PREFIX_BYTES)).alias("sig")
        )
        .agg(F.count(F.lit(1)).alias("n_sig"))
        .agg(
            F.sum((F.col("n_sig") >= 2).cast("int")).alias(
                "dup_sig_groups"
            ),
            F.sum(
                F.when(F.col("n_sig") >= 2, F.col("n_sig") - 1).otherwise(0)
            ).alias("dup_sig_docs"),
        )
    )
    return lang_stats.crossJoin(lens).crossJoin(dups)


VOCAB_COVERAGE_SIZES = (5, 10, 20)  # head sizes to report (vocab is 31 types)


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-budget curve: for each candidate head-vocabulary size,
    the share of all token OCCURRENCES covered by the top-k types —
    the out-of-vocabulary-rate planning table behind choosing a
    tokenizer/vocab budget for a corpus.

    Scale shape: the corpus collapses once to type frequencies; the
    running coverage is a cumulative window over the frequency-ranked
    VOCABULARY relation (types, not tokens), and the report picks one
    row per requested size.  Integer counts end to end; one division
    per output row."""
    # spread the byte-small doc scan before the CPU-bound tokenize/
    # explode (3 partitions at sf1 otherwise; no-op once scans are wide)
    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0),
        spark,
    )
    vocab = (
        docs.select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w_rank = Window.orderBy(F.desc("tf"), "token")
    w_cum = Window.orderBy(F.desc("tf"), "token").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    ranked = vocab.select(
        F.row_number().over(w_rank).alias("rk"),
        F.sum("tf").over(w_cum).alias("cum_tf"),
        F.sum("tf").over(w_all).alias("total_tf"),
        F.count(F.lit(1)).over(w_all).alias("n_types"),
    )
    sizes = F.array(*[F.lit(s) for s in VOCAB_COVERAGE_SIZES])
    return (
        ranked.filter(F.array_contains(sizes, F.col("rk")))
        .select(
            F.col("rk").alias("vocab_size"),
            "cum_tf",
            "total_tf",
            F.col("n_types").cast("int").alias("n_types"),
            F.round(F.col("cum_tf") / F.col("total_tf"), 6).alias(
                "coverage"
            ),
        )
    )


def q_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier, trained AND applied
    in one declarative plan: Laplace-smoothed per-(lang, token) log
    likelihoods + log priors from the labelled corpus, then every
    document re-scored against all five class models — the canonical
    train→predict text pipeline, entirely in DataFrame algebra (no ML
    library, no driver-side model object).

    Scale shape: the model is VOCAB-sized, never corpus-sized — token
    counts collapse map-side, and the (lang, token) likelihood relation
    broadcasts into the scoring join.  Scoring expands each doc-token
    row by |langs| (a bounded ×5), then partial-aggregates per
    (doc, cand).  Engine determinism: every log likelihood is rounded
    to 6 dp and cast DECIMAL(18,6) BEFORE the per-doc sum (float sums
    are partition-merge-order-dependent; 6-dp-quantized decimal sums
    are exact and associative), and the emitted score is the exact
    micro-unit integer.  Ties break by candidate lang ascending."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    dt = docs.select(
        "doc_id", "lang", F.explode(_tokens()).alias("token")
    )
    dtc = dt.groupBy(
        "doc_id", F.col("lang").alias("lang_true"), "token"
    ).agg(F.count(F.lit(1)).alias("n_dt"))
    ltc = dt.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("c"))
    totl = dt.groupBy("lang").agg(F.count(F.lit(1)).alias("tot"))
    vdf = dt.agg(F.count_distinct("token").alias("v"))
    nl = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    ndf = docs.agg(F.count(F.lit(1)).alias("n"))
    ll = (
        ltc.join(totl, "lang")
        .crossJoin(F.broadcast(vdf))
        .select(
            "lang",
            "token",
            F.round(
                F.log((F.col("c") + F.lit(1.0)) / (F.col("tot") + F.col("v"))),
                6,
            )
            .cast("decimal(18,6)")
            .alias("ll"),
        )
    )
    ll0 = totl.crossJoin(F.broadcast(vdf)).select(
        "lang",
        F.round(F.log(F.lit(1.0) / (F.col("tot") + F.col("v"))), 6)
        .cast("decimal(18,6)")
        .alias("ll0"),
    )
    pri = nl.crossJoin(F.broadcast(ndf)).select(
        "lang",
        F.round(F.log(F.col("n_l") * F.lit(1.0) / F.col("n")), 6)
        .cast("decimal(18,6)")
        .alias("prior"),
    )
    cand = nl.select(F.col("lang").alias("cand"))
    terms = (
        dtc.crossJoin(F.broadcast(cand))
        .join(
            F.broadcast(ll),
            (F.col("cand") == F.col("lang")) & (ll.token == dtc.token),
            "left",
        )
        .drop(ll.token)
        .drop("lang")
        .join(
            F.broadcast(ll0.withColumnRenamed("lang", "cand")), "cand"
        )
        .groupBy("doc_id", "lang_true", "cand")
        .agg(
            F.sum(
                F.col("n_dt") * F.coalesce(F.col("ll"), F.col("ll0"))
            ).alias("s")
        )
    )
    scored = terms.join(
        F.broadcast(pri.withColumnRenamed("lang", "cand")), "cand"
    ).select(
        "doc_id",
        "lang_true",
        "cand",
        (F.col("s") + F.col("prior")).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cand").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "lang_true",
            F.col("cand").alias("pred_lang"),
            (F.col("score") * 1000000).cast("bigint").alias("score_micro"),
            (F.col("cand") == F.col("lang_true")).cast("int").alias(
                "correct"
            ),
        )
    )


def q_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation: per-class precision / recall / F1 of the
    stopword-profile language-ID heuristic (q_lang_id) against the
    corpus's true ``lang`` labels — the quality readout any labelling
    or filtering model ships with.

    Scale shape: predictions stay doc-sized and join truth on doc_id
    (one co-partitioned shuffle); everything after runs over the
    |classes|-sized marginal relations, joined broadcast.  zh has no
    stopword profile, so its predictions fall to 'und': recall 0,
    precision NULL (no docs predicted zh), F1 pinned to 0.  Counts are
    exact integers; one division per metric."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    pred = q_lang_id(spark, sf_dir).select("doc_id", "pred_lang")
    j = docs.select("doc_id", F.col("lang").alias("lang_true")).join(
        pred, "doc_id"
    )
    per_true = j.groupBy("lang_true").agg(
        F.count(F.lit(1)).alias("n_true"),
        F.sum(
            (F.col("pred_lang") == F.col("lang_true")).cast("bigint")
        ).alias("tp"),
    )
    per_pred = j.groupBy(
        F.col("pred_lang").alias("lang_true")
    ).agg(F.count(F.lit(1)).alias("n_pred"))
    joined = per_true.join(F.broadcast(per_pred), "lang_true", "left")
    precision = F.when(
        F.col("n_pred").isNotNull(), F.col("tp") / F.col("n_pred")
    )
    recall = F.col("tp") / F.col("n_true")
    f1 = F.when(F.col("tp") == 0, F.lit(0.0)).otherwise(
        2.0
        * F.col("tp")
        / (F.coalesce(F.col("n_pred"), F.lit(0)) + F.col("n_true"))
    )
    return joined.select(
        "lang_true",
        "n_true",
        F.coalesce(F.col("n_pred"), F.lit(0))
        .cast("bigint")
        .alias("n_pred"),
        F.col("tp").cast("bigint").alias("tp"),
        F.round(precision, 6).alias("precision"),
        F.round(recall, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def _make_porter_stem():
    """Factory wrapper so the stemmer pickles BY VALUE (nested
    qualname is not importable, so cloudpickle serializes the code
    object) — executor workers need no repo on sys.path (the
    module-level original broke the driver-harness sweep run from a
    different cwd with ModuleNotFoundError)."""
    def porter_stem(word: str) -> str:
        """Porter (1980) stemmer, pure Python — the classic suffix-stripping
        normalizer (see the published algorithm; no external library, so the
        executor closure ships by value).  Lowercase ASCII input expected."""
        if len(word) <= 2:
            return word

        def is_cons(w: str, i: int) -> bool:
            c = w[i]
            if c in "aeiou":
                return False
            if c == "y":
                return i == 0 or not is_cons(w, i - 1)
            return True

        def measure(stem: str) -> int:
            # number of VC sequences
            m = 0
            prev_v = False
            for i in range(len(stem)):
                v = not is_cons(stem, i)
                if prev_v and not v:
                    m += 1
                prev_v = v
            return m

        def has_vowel(stem: str) -> bool:
            return any(not is_cons(stem, i) for i in range(len(stem)))

        def ends_double_cons(w: str) -> bool:
            return (
                len(w) >= 2
                and w[-1] == w[-2]
                and is_cons(w, len(w) - 1)
            )

        def cvc(w: str) -> bool:
            if len(w) < 3:
                return False
            return (
                is_cons(w, len(w) - 3)
                and not is_cons(w, len(w) - 2)
                and is_cons(w, len(w) - 1)
                and w[-1] not in "wxy"
            )

        w = word
        # step 1a
        if w.endswith("sses"):
            w = w[:-2]
        elif w.endswith("ies"):
            w = w[:-2]
        elif w.endswith("ss"):
            pass
        elif w.endswith("s"):
            w = w[:-1]
        # step 1b
        if w.endswith("eed"):
            if measure(w[:-3]) > 0:
                w = w[:-1]
        else:
            flag = False
            if w.endswith("ed") and has_vowel(w[:-2]):
                w, flag = w[:-2], True
            elif w.endswith("ing") and has_vowel(w[:-3]):
                w, flag = w[:-3], True
            if flag:
                if w.endswith(("at", "bl", "iz")):
                    w = w + "e"
                elif ends_double_cons(w) and not w.endswith(("l", "s", "z")):
                    w = w[:-1]
                elif measure(w) == 1 and cvc(w):
                    w = w + "e"
        # step 1c
        if w.endswith("y") and has_vowel(w[:-1]):
            w = w[:-1] + "i"
        # step 2
        for suf, rep in (
            ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
            ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
            ("alli", "al"), ("entli", "ent"), ("eli", "e"),
            ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
            ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
            ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
            ("iviti", "ive"), ("biliti", "ble"),
        ):
            if w.endswith(suf):
                if measure(w[: -len(suf)]) > 0:
                    w = w[: -len(suf)] + rep
                break
        # step 3
        for suf, rep in (
            ("icate", "ic"), ("ative", ""), ("alize", "al"),
            ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", ""),
        ):
            if w.endswith(suf):
                if measure(w[: -len(suf)]) > 0:
                    w = w[: -len(suf)] + rep
                break
        # step 4
        for suf in (
            "al", "ance", "ence", "er", "ic", "able", "ible", "ant",
            "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
            "ous", "ive", "ize",
        ):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if suf == "ion" and not stem.endswith(("s", "t")):
                    break
                if measure(stem) > 1:
                    w = stem
                break
        # step 5a
        if w.endswith("e"):
            m = measure(w[:-1])
            if m > 1 or (m == 1 and not cvc(w[:-1])):
                w = w[:-1]
        # step 5b
        if measure(w) > 1 and ends_double_cons(w) and w.endswith("l"):
            w = w[:-1]
        return w

    return porter_stem


porter_stem = _make_porter_stem()


STEM_TOP = 30


def q_stem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only (algorithmic UDF): Porter-stemmed vocabulary rollup —
    the top STEM_TOP stems by total term frequency with the count of
    distinct surface forms they conflate (plural/tense collapse is the
    first normalization an IR/text pipeline applies before TF-IDF/BM25).

    Scale shape: the UDF runs over the DISTINCT-token vocabulary, never
    the corpus — tokens collapse to (token, tf) first (map-side), the
    Arrow-batched stem pass touches each type once, and the stem rollup
    is a second vocabulary-sized aggregate.  Top-k is orderBy().limit()
    → TakeOrderedAndProject.  Pytest pins the stemmer against the
    published Porter vectors and checks the rollup against a
    pure-Python replay (tests/test_extensions.py::TestPorterStem)."""
    import pandas as pd  # noqa: F401 (executors import inside kernel)

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    vocab = (
        docs.select(F.explode(_tokens()).alias("token"))
        .filter(F.col("token").rlike(r"^[a-z]{3,}$"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )

    def _stem_kernel(batches):
        import pandas as _pd

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "token": pdf["token"],
                    "tf": pdf["tf"],
                    "stem": [porter_stem(t) for t in pdf["token"]],
                }
            )

    # NO spread_for_cpu here: vocab sits downstream of the groupBy
    # shuffle, which already spread it across shuffle partitions (and
    # df.rdd probing on a shuffled lineage materializes stages under
    # AQE — a build-time job)
    stemmed = vocab.mapInPandas(
        _stem_kernel, schema="token string, tf bigint, stem string"
    )
    return (
        stemmed.groupBy("stem")
        .agg(
            F.count(F.lit(1)).alias("n_forms"),
            F.sum("tf").alias("total_tf"),
        )
        .select(
            "stem",
            F.col("n_forms").cast("bigint").alias("n_forms"),
            F.col("total_tf").cast("bigint").alias("total_tf"),
        )
        .orderBy(F.col("total_tf").desc(), F.col("stem"))
        .limit(STEM_TOP)
    )


# ---------------------------------------------------------------------------
# Readability scoring (Flesch reading ease, syllable-heuristic)
# ---------------------------------------------------------------------------


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language readability profile: Flesch reading ease over the
    corpus with the standard vowel-group syllable heuristic — words =
    letter runs, sentences = [.!?] runs (min 1), syllables ≈ [aeiouy]
    runs.  The complexity gate a quality pipeline applies next to
    length/stopword filters.

    Scale shape: three regexp_count projections per document (codegen,
    one scan, no Python), then one map-side-combined rollup to the
    per-language relation.

    Engine determinism: each per-document ratio is a chain of correctly
    rounded IEEE ops on exact integers (identical in both engines); the
    per-document score is rounded to 6 dp, cast decimal(18,6), and
    summed as decimals (associative — merge order cannot flip the
    average), divided once at the end."""
    doc = load_table(spark, sf_dir, "documents")
    words = F.greatest(
        F.regexp_count(F.lower(F.col("text")), F.lit("[a-z]+")), F.lit(1)
    )
    sents = F.greatest(
        F.regexp_count(F.col("text"), F.lit("[.!?]+")), F.lit(1)
    )
    syll = F.regexp_count(F.lower(F.col("text")), F.lit("[aeiouy]+"))
    wps = words.cast("double") / sents
    spw = syll.cast("double") / words
    flesch = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    scored = doc.select(
        "lang",
        F.round(flesch, 6).cast("decimal(18,6)").alias("score_d"),
        F.round(wps, 6).cast("decimal(18,6)").alias("wps_d"),
        F.round(spw, 6).cast("decimal(18,6)").alias("spw_d"),
    )
    n = F.count(F.lit(1))
    return scored.groupBy("lang").agg(
        n.alias("n_docs"),
        F.round(F.sum("score_d").cast("double") / n, 6).alias("avg_flesch"),
        F.round(F.sum("wps_d").cast("double") / n, 6).alias(
            "avg_words_per_sentence"
        ),
        F.round(F.sum("spw_d").cast("double") / n, 6).alias(
            "avg_syllables_per_word"
        ),
    )


# ---------------------------------------------------------------------------
# Inter-rater agreement (Cohen's kappa)
# ---------------------------------------------------------------------------


def q_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the language-ID heuristic and the true
    labels: chance-corrected agreement — the single-number companion to
    q_confusion's per-class readout (annotation-quality audits live on
    this statistic).

    Scale shape: one doc_id co-partitioned join of predictions to
    truth collapses to the |classes|² contingency relation in a SINGLE
    pass; the grand totals and both marginals all derive from that tiny
    persisted relation (round 8 — the old form fed the un-materialized
    join into three separate aggregates, so the lang-ID scoring lineage
    executed three times: 4.3 s at sf1 for a 1-row answer).

    Engine determinism: observed agreement and expected agreement are
    each ONE IEEE division of exact bigints (pₑ's numerator Σ rowᵍ·colᵍ
    is an exact integer); kappa is a three-op chain over those two
    doubles."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    pred = q_lang_id(spark, sf_dir).select("doc_id", "pred_lang")
    cont = (
        docs.select("doc_id", F.col("lang").alias("lang_true"))
        .join(pred, "doc_id")
        .groupBy("lang_true", "pred_lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()  # classes²-sized; three consumers below
    )
    base = cont.groupBy().agg(
        F.sum("c").alias("n"),
        F.sum(
            F.when(
                F.col("pred_lang") == F.col("lang_true"), F.col("c")
            ).otherwise(F.lit(0))
        ).alias("agree"),
    )
    per_true = cont.groupBy(F.col("lang_true").alias("cls")).agg(
        F.sum("c").alias("n_true")
    )
    per_pred = cont.groupBy(F.col("pred_lang").alias("cls")).agg(
        F.sum("c").alias("n_pred")
    )
    marg = per_true.join(F.broadcast(per_pred), "cls", "full_outer").select(
        (
            F.coalesce(F.col("n_true"), F.lit(0))
            * F.coalesce(F.col("n_pred"), F.lit(0))
        ).alias("prod")
    )
    pe_num = marg.groupBy().agg(F.sum("prod").alias("pe_num"))
    out = base.crossJoin(F.broadcast(pe_num))
    po = F.col("agree").cast("double") / F.col("n")
    pe = F.col("pe_num").cast("double") / (F.col("n") * F.col("n"))
    return out.select(
        "n",
        "agree",
        F.round(po, 9).alias("po"),
        F.round(pe, 9).alias("pe"),
        F.round((po - pe) / (1 - pe), 9).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Exact-substring duplicated-span scan (Lee et al., ACL'22)
# ---------------------------------------------------------------------------

SUBSTR_NGRAM = 8  # window width in tokens
SUBSTR_MAX_TOKENS = 256  # per-doc cap (logged in the docstring, not silent)


def q_substr_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-span scan ("Deduplicating Training
    Data Makes Language Models Better", Lee et al., ACL'22): every
    overlapping SUBSTR_NGRAM-token window of each document is hashed, and
    a window is *duplicated* when its gram occurs in ≥ 2 distinct
    documents.  Per document: window count, duplicated-window count, and
    the duplicated fraction — the removal-candidate mass an ExactSubstr
    cut would target.  (The paper builds a corpus-wide suffix array; at
    Spark scale the standard approximation is fixed-width window hashing,
    which finds every duplicated span of ≥ SUBSTR_NGRAM tokens.)

    Windows are capped at the first SUBSTR_MAX_TOKENS tokens per doc —
    an explicit scan bound, not a silent truncation.

    Scale shape (round 4, single-pass): the exploded relation is one
    16-byte md5 per token position (documents themselves never shuffle);
    "gram occurs in ≥ 2 distinct documents" is ``min(doc_id) ≠
    max(doc_id)`` over a gram-partitioned window, so the whole query is
    exactly TWO exchanges (gram window → per-doc aggregate) with no
    persist, no dup-gram join and no final left join — the superseded
    3-consumer persisted shape drifted from 1.11 s to 1.79 s at sf0.1
    (VERDICT r3 #7); this form measures ~0.8 s.  dup_frac is ONE IEEE
    division of two exact bigints — engine-identical."""
    from pyspark.sql import Window

    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents"), spark
    ).filter(F.col("n_chars") > 0)
    toks = docs.select(
        "doc_id", F.slice(_tokens(), 1, SUBSTR_MAX_TOKENS).alias("t")
    ).filter(F.size("t") >= SUBSTR_NGRAM)
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - SUBSTR_NGRAM),
                lambda i: F.md5(
                    F.array_join(F.slice("t", i + 1, F.lit(SUBSTR_NGRAM)), " ")
                ),
            )
        ).alias("g"),
    )
    w = Window.partitionBy("g")
    flagged = grams.select(
        "doc_id",
        (F.min("doc_id").over(w) != F.max("doc_id").over(w)).alias("_dup"),
    )
    n_dup = F.sum(F.when(F.col("_dup"), 1).otherwise(0))
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        n_dup.alias("n_dup_windows"),
        (n_dup.cast("double") / F.count(F.lit(1))).alias("dup_frac"),
    )
