"""Deduplication suite for large-scale training-data pipelines (north-star
extension, BASELINE.json): exact, MinHash+LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup — each designed so the heavy path is JVM-side and
the only shuffles are the unavoidable group-bys on bucket keys.

Scale design (100 TB):
* Exact dedup shuffles one (hash, doc_id) pair per row — not the text.
* MinHash signatures are computed scan-side with built-in ``hash``/
  ``transform``/``array_min`` (whole-stage codegen, no Python); the LSH
  band join shuffles only (band, key) pairs, and candidate verification
  runs per-pair on the (small) candidate set.
* SimHash reduces each doc to one int64 scan-side; near-dup banding
  partitions the 64 bits into max_hamming+1 chunks (pigeonhole ⇒ full
  recall within the distance bound; default radius 3 ⇒ 16-bit chunk keys,
  which is what keeps candidate counts near-linear).
* Embedding near-dup uses random-hyperplane LSH to avoid the O(n²) cross
  join; the exact-cosine check touches only same-bucket pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_embargo_spark.catalog import load_table, spread_for_cpu

# Deterministic MinHash parameters (fixed seeds → reproducible results).
# 32 perms / 8 bands of 4: P(candidate | j) = 1-(1-j^4)^8, i.e. ~0.9998 at
# j=0.9 and ~0.29 at j=0.5 — high recall where it matters, cheap below.
MINHASH_PERMS = 32
MINHASH_BANDS = 8
MINHASH_ROWS_PER_BAND = MINHASH_PERMS // MINHASH_BANDS
# Each "permutation" is xxhash64(shingle_hash, perm_index) — a reseeded
# 64-bit hash family.  NOT an affine map (a*h+b mod M): with 32-bit inputs
# the affine products never wrap the modulus, the map stays monotone, and
# every permutation elects the same min shingle — signatures then agree
# all-or-nothing and LSH recall collapses (found the hard way).

SHINGLE_WIDTH = 3  # word shingles


def _tokens(col: str = "text") -> F.Column:
    return F.split(F.trim(F.lower(F.col(col))), r"\s+")


def _shingle_hashes(col: str = "text", width: int = SHINGLE_WIDTH) -> F.Column:
    """Array of 32-bit murmur hashes of word ``width``-shingles — all
    built-ins: split → sequence/transform → hash.  Docs shorter than one
    shingle hash the whole token array instead (never an empty set)."""
    toks = "_toks"
    return F.expr(
        f"""
        CASE WHEN size({toks}) >= {width}
             THEN transform(
                 sequence(0, size({toks}) - {width}),
                 i -> hash(concat_ws(' ', slice({toks}, i + 1, {width}))))
             ELSE array(hash(concat_ws(' ', {toks})))
        END
        """
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup by content hash: one representative (min doc_id) per
    distinct text + the duplicate count.  Shuffles (hash, doc_id) only."""
    return (
        docs.select(F.col("doc_id"), F.md5(F.col("text")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by md5 content hash: representative + duplicate count."""
    return exact_dedup(load_table(spark, sf_dir, "documents"))


def shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, sh: array<int>) — DISTINCT shingle hashes per document.

    This is the shared upstream stage for signatures AND exact-Jaccard
    verification: MinHash's ``array_min`` is identical over the distinct
    set and the multiset, so one derivation serves both."""
    return docs.withColumn("_toks", _tokens()).select(
        "doc_id", F.array_distinct(_shingle_hashes()).alias("sh")
    )


def signatures_from_shingles(sh: DataFrame) -> DataFrame:
    """(doc_id, sig: array<bigint>) from a ``shingle_sets`` relation,
    entirely in codegen'd built-ins."""
    # Reseeded-hash permutation family.  (Closure factory, not default
    # args: a multi-parameter lambda makes F.transform bind the element
    # index.)
    def _perm(i: int):
        return lambda h: F.xxhash64(h, F.lit(i))

    sig_cols = [
        F.array_min(F.transform(F.col("sh"), _perm(i))).alias(f"mh{i}")
        for i in range(MINHASH_PERMS)
    ]
    sigs = sh.select("doc_id", *sig_cols)
    return sigs.select(
        "doc_id",
        F.array(*[F.col(f"mh{i}") for i in range(MINHASH_PERMS)]).alias("sig"),
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, sig: array<bigint>) — MINHASH_PERMS-wide MinHash signature
    per document."""
    return signatures_from_shingles(shingle_sets(docs))


def _bucket_pairs(
    bucketed: DataFrame,
    key_cols: list[str],
    item: F.Column,
    max_bucket: int | None = 4096,
) -> DataFrame:
    """All intra-bucket (i < j) candidate pairs via
    ``groupBy(bucket) → collect_set → pair expansion``.

    This is the scale-correct alternative to a bucket self-join: a
    self-join executes the (often expensive) bucketed lineage TWICE and
    shuffles both sides, while this shape computes it once and shuffles
    only ``(key, item)``.  ``array_sort`` on the collected structs makes
    pair order deterministic (first struct field ascending), so every
    pair comes out exactly once with a < b.

    ``max_bucket``: buckets larger than this are dropped — for the
    APPROXIMATE candidate paths (MinHash bands, SimHash chunks, hyperplane
    tables) a bucket that hot is a degenerate key and expanding it is
    O(k²), so the cap bounds worst-case skew at 100 TB.  Pass ``None`` for
    the EXACT oracle-mirrored variants (ngram, levenshtein), whose
    contract is "every pair in the block": there the caller's blocking key
    is responsible for bounding block size (each block is buffered as one
    collect_set row), and a silent cap would diverge from the SQL oracle
    at scale.
    """
    buckets = (
        bucketed.groupBy(*key_cols)
        .agg(F.array_sort(F.collect_set(item)).alias("items"))
        .filter(
            F.size("items") >= 2
            if max_bucket is None
            else F.size("items").between(2, max_bucket)
        )
    )
    return buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(items, (a, i) -> "
                "transform(slice(items, i + 2, size(items)), "
                "b -> struct(a, b))))"
            )
        ).alias("pair"),
    ).select("pair.a", "pair.b")


def pair_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchase pair-support matrix — ``(part_a < part_b, n_ab)``
    with n_ab = number of orders containing both parts — as a
    SESSION-SHARED persisted relation (``catalog.shared_relation``).

    Six queries build this identical relation from scratch
    (q_copurchase, q_item_cosine, q_basket_lift, and the symmetric /
    support-filtered edge lists under q_pagerank, q_kcore,
    q_triangles); it was profiled as the dominant cost of the whole
    graph family (25.2 of 36.5 s cold at sf1 inside q_kcore alone), so
    a sweep session now pays the expansion once.  The relation is
    pair-cardinality-sized (two ints + a count), far smaller than the
    fact table, and consumers derive their shapes by filter/projection:
    distinct edges = all rows, supported edges = n_ab >= floor, counts
    = n_ab itself — bit-identical outputs to the per-query builds, so
    pins and oracles are untouched."""
    from etl_embargo_spark.catalog import load_table, shared_relation

    def build() -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        items = li.select("l_orderkey", "l_partkey")
        return (
            _bucket_pairs(
                items,
                ["l_orderkey"],
                F.struct(F.col("l_partkey").alias("p")),
                max_bucket=None,
            )
            .select(
                F.col("a.p").alias("part_a"), F.col("b.p").alias("part_b")
            )
            .groupBy("part_a", "part_b")
            .agg(F.count(F.lit(1)).alias("n_ab"))
        )

    return shared_relation(spark, sf_dir, "pair_support", build)


def minhash_candidates(sigs: DataFrame) -> DataFrame:
    """LSH banding: same (band, band-hash) bucket ⇒ candidate pair.

    Emits distinct (doc_a < doc_b) pairs.  Pair generation is the
    bucket-groupBy shape (see ``_bucket_pairs``), so the signature
    computation runs once, not twice as a self-join would.
    """
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.hash(
                        *[
                            F.element_at("sig", b * MINHASH_ROWS_PER_BAND + r + 1)
                            for r in range(MINHASH_ROWS_PER_BAND)
                        ]
                    )
                    for b in range(MINHASH_BANDS)
                ]
            )
        ).alias("band", "band_key"),
    )
    pairs = _bucket_pairs(
        bands, ["band", "band_key"], F.struct(F.col("doc_id"))
    )
    return pairs.select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    ).distinct()


def jaccard_verify_on_shingles(
    sh: DataFrame, pairs: DataFrame, threshold: float
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs, joining a prepared
    ``shingle_sets`` relation for each side."""
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    joined = pairs.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        joined.select(
            "doc_a",
            "doc_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def exact_collapse_pairs(
    docs: DataFrame,
    rep_pairs_fn,
    intra_values: dict[str, F.Column],
) -> DataFrame:
    """EXACT-TEXT COLLAPSE wrapper for text-pure near-dup pipelines
    (round 4): group documents by md5(text), run the (expensive) pair
    pipeline over DISTINCT texts only, then expand duplicate groups back
    into member pairs.

    Output-identical to running the pipeline per document whenever the
    pipeline's verdict is a pure function of the two texts — a member
    pair then qualifies iff its group pair qualifies, and identical
    texts always pair with the known ``intra_values`` (J = 1.0 for
    MinHash, Hamming 0 for SimHash).  What it buys at scale:

    * The sf1 corpus plants one ~2,900-doc exact-dup clique; per-doc
      banding put the whole clique in ONE bucket per band and pushed
      C(2941,2)·bands ≈ 17-34M redundant pair rows through the distinct
      (measured 27 s of MinHash's 35 s, and the bulk of SimHash's 44 s).
      Collapsed, the clique is a single signature row.
    * At 10× the clique would exceed ``max_bucket`` (4096) and the
      APPROXIMATE candidate paths would silently DROP it — recall
      cliff.  Collapsed, bucket occupancy tracks distinct near-dup
      texts, not duplicate multiplicity.
    * This is also the real 100 TB pipeline order: exact dedup first,
      near-dup on representatives (see q_corpus_dedup).

    ``rep_pairs_fn(reps)`` receives a (doc_id, text) relation of group
    representatives (doc_id = the group's min member id) and returns
    (doc_a, doc_b, *value columns); ``intra_values`` maps the same value
    column names to literal columns for identical-text pairs.  The
    groups relation persists across its three consumers (intra, both
    expansion sides) — the returned DataFrame is lazy, so the cache must
    outlive this builder; LRU eviction / the sweep's clearCache()
    reclaims it.
    """
    from pyspark.storagelevel import StorageLevel

    groups = (
        docs.groupBy(F.md5("text").alias("_h"))
        .agg(
            F.min("doc_id").alias("gid"),
            F.sort_array(F.collect_list("doc_id")).alias("members"),
            F.first("text").alias("text"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    value_cols = list(intra_values)
    intra = (
        groups.filter(F.size("members") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(members, (a, i) -> "
                    "transform(slice(members, i + 2, size(members)), "
                    "b -> struct(a, b))))"
                )
            ).alias("pair")
        )
        .select(
            F.col("pair.a").alias("doc_a"),
            F.col("pair.b").alias("doc_b"),
            *[c.alias(name) for name, c in intra_values.items()],
        )
    )
    verified = rep_pairs_fn(
        groups.select(F.col("gid").alias("doc_id"), "text")
    )
    # expand verified group pairs into member pairs (gid_a < gid_b holds,
    # but member ids interleave — reorder with least/greatest)
    ga = groups.select(F.col("gid").alias("doc_a"), F.col("members").alias("_ma"))
    gb = groups.select(F.col("gid").alias("doc_b"), F.col("members").alias("_mb"))
    cross = (
        verified.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(F.explode("_ma").alias("_a"), "_mb", *value_cols)
        .select("_a", F.explode("_mb").alias("_b"), *value_cols)
        .select(
            F.least("_a", "_b").alias("doc_a"),
            F.greatest("_a", "_b").alias("doc_b"),
            *value_cols,
        )
    )
    # no trailing orderBy: a range-partitioned sort runs a sampling pass
    # that RE-EXECUTES the whole candidate+verify lineage (measured 4.6s
    # vs 0.7s at sf0.1), and row order is not part of any contract (the
    # driver's value hash is order-insensitive)
    return intra.unionByName(cross)


def minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates verified by exact Jaccard ≥ 0.5 (detail
    form: the murmur permutation family is Spark-specific; pytest holds
    the recall oracle vs brute-force Jaccard).  Runs through
    :func:`exact_collapse_pairs` — see that docstring for why LSH on
    distinct texts is output-identical and what it buys at 100×.

    The shingle stage computes ONCE and persists (MEMORY_AND_DISK): it
    feeds the signature pipeline and both verify sides.
    """
    from pyspark.storagelevel import StorageLevel

    def _rep_pairs(reps: DataFrame) -> DataFrame:
        sh = shingle_sets(reps).persist(StorageLevel.MEMORY_AND_DISK)
        cands = minhash_candidates(signatures_from_shingles(sh))
        return jaccard_verify_on_shingles(sh, cands, threshold=0.5)

    docs = spread_for_cpu(load_table(spark, sf_dir, "documents"), spark)
    return exact_collapse_pairs(
        docs, _rep_pairs, {"jaccard": F.lit(1.0)}
    )


def _pair_checksum_rollup(pairs: DataFrame, a_col: str, groups: int = 4) -> DataFrame:
    """Checksum-rollup form of a deterministic pair list: group by
    ``a_col % groups`` and emit (grp, n_pairs, pairs_sum).  The detail
    output stays pytest-checked; this form's few rows are pinnable as a
    literal DuckDB oracle so the driver gets a real hash-checked row (the
    pair semantics themselves are not ANSI-SQL-expressible).  See
    aggregates.rows_checksum for why a hash-sum, not a sorted-list md5."""
    from etl_embargo_spark.operators.aggregates import rows_checksum

    return pairs.groupBy(
        (F.col(a_col) % groups).cast("int").alias("grp")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        rows_checksum(*pairs.columns).alias("pairs_sum"),
    )


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered checksum-rollup of :func:`minhash_pairs` (pinned oracle;
    detail pairs keep their pytest recall oracle)."""
    return _pair_checksum_rollup(minhash_pairs(spark, sf_dir), "doc_a")


JACCARD_T = 0.2  # registered near-dup threshold
# Geometric band base = 1/threshold: J ≥ t forces the shingle-count ratio
# max/min ≤ 1/t (|∩| ≤ min, |∪| ≥ max ⇒ J ≤ min/max), so qualifying pairs
# sit in the same or adjacent base-(1/t) band — banding is EXACT, not a
# recall trade.  Bands are computed by an integer CASE chain (no float
# log: 1-ulp libm skew at a 5^k boundary could band the same doc
# differently across engines/runs).
_JACCARD_BAND_EDGES = [5 ** i for i in range(1, 13)]  # 5 .. 5^12 ≈ 2.4e8


def _jaccard_band(s: F.Column) -> F.Column:
    """#{edges ≤ s} — exact base-5 log band of a shingle count."""
    band = F.lit(0)
    for edge in _JACCARD_BAND_EDGES:
        band = band + F.when(s >= edge, 1).otherwise(0)
    return band


def _make_jaccard_block_kernel(
    threshold: float,
    merge_codes: int = int(3e7),
    chunk_pairs: int = int(1.5e7),
):
    """applyInPandas kernel factory (nested per the cloudpickle by-value
    rule): ALL-PAIRS exact Jaccard inside one (lang, source, band) block,
    vectorized as a single set-membership GEMM.

    Input rows: (doc_id, band, _block, sh: array<bigint> of xxhash64'd
    distinct shingles).  The kernel builds the block's binary doc×gram
    incidence matrix A and computes every pairwise intersection as
    A @ A.T — one BLAS call replaces the per-pair flatten + array
    join-back + array_intersect pipeline this superseded (which shipped
    every shingle array once per PAIR and measured 46 s at sf1; each
    array now travels once per DOC and the block's 10⁵–10⁶ candidate
    pairs cost ~milliseconds of float32 GEMM).

    Exactness: counts ≤ |sh| ≤ a few hundred are exact in float32; the
    Jaccard itself is ONE IEEE double division of exact integers —
    bit-identical to DuckDB's ``len(list_intersect)::DOUBLE / union``
    (CLAUDE.md engine-exact rule).  Emits RAW J; the caller rounds with
    F.round (JVM HALF_UP) so boundary rounding matches the SQL oracle.
    Pair-dedup rule: a pair is emitted only in the block equal to the
    LOWER of its two home bands (double assignment upstream).
    """

    def _kernel(pdf):
        import numpy as _np
        import pandas as _pd

        n = len(pdf)
        empty = _pd.DataFrame(
            {
                "doc_a": _np.array([], dtype=_np.int64),
                "doc_b": _np.array([], dtype=_np.int64),
                "_j": _np.array([], dtype=_np.float64),
            }
        )
        if n < 2:
            return empty
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        ids = pdf["doc_id"].to_numpy()
        bands = pdf["band"].to_numpy()
        block = int(pdf["_block"].iloc[0])
        sh_arrays = [
            _np.asarray(s, dtype=_np.int64) for s in pdf["sh"].to_numpy()
        ]
        sizes = _np.array([len(s) for s in sh_arrays], dtype=_np.int64)
        all_h = _np.concatenate(sh_arrays)
        uniq, inv = _np.unique(all_h, return_inverse=True)
        nu = len(uniq)

        # Hybrid verification (round 6): the dense one-hot GEMM is only
        # cheap when the block's shingle UNIVERSE is small relative to
        # its membership (degenerate tiny-vocab corpora, giant exact-dup
        # cliques: A is narrow, n²·nu flops have a small nu).  On a
        # realistic vocabulary nu ≈ Σ|sh| (shingles are mostly unique to
        # their doc) and the dense path wastes n²·nu flops on zeros —
        # measured 23 s at sf1 on the 10k-type corpus (1k-doc blocks ×
        # 40k-gram universes).  There the intersection matrix is SPARSE:
        # sort shingle instances by gram, expand each gram's ≥2-doc
        # group into co-occurrence pairs, run-length count pair codes.
        # Cost O(P log P) where P = Σ_gram C(k,2) is the number of
        # ACTUAL shared-gram co-occurrences (near-dups only), not n².
        # Both paths produce the same exact integer intersection counts
        # and the same single IEEE double division, so J is bit-identical.
        doc_idx = _np.repeat(_np.arange(n), sizes)
        order = _np.argsort(inv, kind="stable")
        g = inv[order]
        d = doc_idx[order]
        starts = _np.flatnonzero(_np.r_[True, g[1:] != g[:-1]])
        cnt = _np.diff(_np.r_[starts, g.size])
        p_total = int((cnt * (cnt - 1) // 2).sum())

        out_a, out_b, out_j = [], [], []
        if nu > 4 * n:
            # sparse co-occurrence path — CHUNKED by gram-group slices
            # (ADVICE r6: the unchunked expansion held ~8 concurrent
            # int64 arrays of p_total length, ~3-4 GB at the old 5e7
            # instance cap).  Each slice expands at most CHUNK_PAIRS
            # co-occurrence instances with ≤4 arrays concurrently live
            # (~0.5 GB peak); a pair's instances can span slices, so
            # slices emit (code, count) partials that merge at the end
            # — the merged counts, and therefore J, are identical to
            # the one-shot expansion.
            CHUNK_PAIRS = chunk_pairs
            grp_id = _np.cumsum(
                _np.r_[0, (g[1:] != g[:-1]).astype(_np.int64)]
            )
            rank = _np.arange(g.size) - starts[grp_id]
            reps = cnt[grp_id] - rank - 1
            del grp_id, rank
            # slice boundaries: contiguous gram groups whose pair
            # expansions fit the chunk budget (a single giant group
            # still expands alone — bounded by C(max_bucket, 2))
            grp_pairs = cnt * (cnt - 1) // 2
            grp_chunk = _np.searchsorted(
                _np.cumsum(grp_pairs),
                _np.arange(CHUNK_PAIRS, p_total + CHUNK_PAIRS, CHUNK_PAIRS),
                side="left",
            )
            cut_grps = _np.unique(_np.r_[0, grp_chunk + 1])
            cut_grps = cut_grps[cut_grps <= len(starts)]
            cuts = _np.r_[starts[cut_grps[cut_grps < len(starts)]], g.size]
            cuts = _np.unique(cuts)
            codes_parts, cnts_parts = [], []

            # Merge-phase bound (ADVICE r7): a pair's instances span
            # slices, so slice partials must merge — but when
            # slice-local dedup is weak the deferred concat+argsort
            # would hold ~3 int64 arrays of up to p_total length.
            # Compact INCREMENTALLY instead: whenever pending partial
            # codes exceed MERGE_CODES, sort-merge them down to one
            # (code, summed count) pair.  Counts add associatively, so
            # the final merged counts — and J — are bit-identical to
            # the one-shot expansion.  Transient merge memory is
            # bounded by max(MERGE_CODES, distinct pair codes): the
            # first term is the ~0.7 GB compaction budget, the second
            # is the kernel's own output size, irreducible by any
            # merge strategy.  merge_codes is a factory arg so pytest
            # can force compaction on small corpora and A/B the output.
            MERGE_CODES = merge_codes

            def _compact(cps, kps):
                c = _np.concatenate(cps)
                k = _np.concatenate(kps)
                o = _np.argsort(c, kind="stable")
                c, k = c[o], k[o]
                del o
                bnd_ = _np.flatnonzero(_np.r_[True, c[1:] != c[:-1]])
                return c[bnd_], _np.add.reduceat(k, bnd_)

            pending = 0
            for clo, chi in zip(cuts[:-1], cuts[1:]):
                reps_c = reps[clo:chi]
                tot = int(reps_c.sum())
                if not tot:
                    continue
                a_pos = _np.repeat(_np.arange(clo, chi), reps_c)
                run_starts = _np.cumsum(reps_c) - reps_c
                off = (
                    _np.arange(tot)
                    - _np.repeat(run_starts, reps_c)
                    + 1
                )
                del run_starts
                b_pos = a_pos + off
                del off
                di, dj = d[a_pos], d[b_pos]
                del a_pos, b_pos
                code = _np.minimum(di, dj) * n + _np.maximum(di, dj)
                del di, dj
                code.sort(kind="stable")
                bnd = _np.flatnonzero(
                    _np.r_[True, code[1:] != code[:-1]]
                )
                codes_parts.append(code[bnd])
                cnts_parts.append(
                    _np.diff(_np.r_[bnd, code.size]).astype(_np.int64)
                )
                del code, bnd
                pending += codes_parts[-1].size
                if pending > MERGE_CODES and len(codes_parts) > 1:
                    c, k = _compact(codes_parts, cnts_parts)
                    codes_parts, cnts_parts = [c], [k]
                    pending = c.size
            if codes_parts:
                ucode, allk = _compact(codes_parts, cnts_parts)
                del codes_parts, cnts_parts
                inter = allk.astype(_np.float64)
                del allk
                i_ = ucode // n
                j_ = ucode % n
                union = (sizes[i_] + sizes[j_]).astype(
                    _np.float64
                ) - inter
                jm = inter / union
                keep = (jm >= threshold) & (
                    _np.minimum(bands[i_], bands[j_]) == block
                )
                # ids are sorted ⇒ index order IS id order (i_ < j_)
                out_a.append(ids[i_[keep]])
                out_b.append(ids[j_[keep]])
                out_j.append(jm[keep])
        else:
            a = _np.zeros((n, nu), dtype=_np.float32)
            a[doc_idx, inv] = 1.0
            # row-chunked GEMM: the A-slice is (chunk x nu) but the
            # inter/union outputs are (chunk x n) float64, so the chunk
            # must be sized from BOTH dims — with nu << n (a giant
            # exact-dup clique) a nu-only bound lets the output approach
            # n^2 doubles.  Budget is BYTES, not entries (ADVICE r5):
            # ~200 MB per float64 temporary → 2.5e7 entries; with
            # inter+union+jm+mask live that is ~1 GB peak kernel memory.
            chunk = max(1, int(2.5e7 // max(nu, n)))
            for lo in range(0, n, chunk):
                hi = min(lo + chunk, n)
                inter = (a[lo:hi] @ a.T).astype(_np.float64)
                union = (sizes[lo:hi, None] + sizes[None, :]).astype(
                    _np.float64
                ) - inter
                jm = inter / union
                ii, jj = _np.nonzero(
                    (jm >= threshold)
                    & (ids[lo:hi, None] < ids[None, :])
                    & (
                        _np.minimum(bands[lo:hi, None], bands[None, :])
                        == block
                    )
                )
                out_a.append(ids[lo + ii])
                out_b.append(ids[jj])
                out_j.append(jm[ii, jj])
        if not out_a:
            return empty
        return _pd.DataFrame(
            {
                "doc_a": _np.concatenate(out_a),
                "doc_b": _np.concatenate(out_b),
                "_j": _np.concatenate(out_j),
            }
        )

    return _kernel


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = JACCARD_T) -> DataFrame:
    """Exact n-gram Jaccard near-dup over blocked pairs.

    Semantics (mirrored by the DuckDB oracle): every (lang, source) pair
    of documents whose DISTINCT word-3-shingle Jaccard ≥ threshold.  The
    blocking key is (lang, source, base-5 shingle-count band): J ≥ 0.2
    bounds the shingle-count ratio to ≤ 5, and two integers within a ×5
    ratio cannot straddle two base-5 band edges, so every qualifying pair
    is same-band or adjacent-band; adjacent bands are covered by double
    assignment (each doc also joins the block below its own) and a pair
    is generated only in the block equal to the LOWER of its two home
    bands — banding is EXACT, not a recall trade
    (tests/test_extensions.py stresses the 5^k boundary corpus).

    Round-4 execution shape: shingles hash to 64 bits scan-side
    (xxhash64 — collision-free at any realistic vocabulary, expected
    colliding gram pairs ≈ C(40k,2)/2⁶⁴ ≈ 10⁻¹¹ on the sf1 corpus) and
    each block verifies ALL its pairs in one vectorized set-membership
    GEMM inside applyInPandas (see _make_jaccard_block_kernel).  Each
    doc's shingles cross the wire ONCE (the groupBy shuffle); nothing
    is persisted, no pair list is materialized before the J filter, and
    the superseded per-pair join-back (46 s / 14 GB shuffle at sf1) is
    gone — measured ~8× faster at sf1.  Prefix filtering (PPJoin) was
    evaluated and rejected for this operator: with a small/zipfian
    vocabulary the required 0.8·|sh| prefixes of different docs overlap
    almost surely, so the inverted gram index generates MORE candidates
    than the size banding, not fewer.  Within-block work is still
    Σ|block|² pair-ops; the GEMM makes the constant ~10² smaller and the
    block key (lang, source, size band) is the contract's blocking
    granularity.
    """
    if threshold < JACCARD_T:
        # the base-5 band edges are derived from 1/JACCARD_T: a looser
        # threshold widens the legal size ratio past one band step and
        # the banding would silently drop qualifying pairs
        raise ValueError(
            f"threshold {threshold} < {JACCARD_T}: the base-5 banding is "
            "only exact for J >= 0.2 (rebuild the edges from 1/threshold)"
        )
    docs = docs.withColumn("_toks", _tokens())
    sh = docs.select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(
            F.transform(
                F.expr(
                    f"""
                    CASE WHEN size(_toks) >= {SHINGLE_WIDTH}
                         THEN transform(
                             sequence(0, size(_toks) - {SHINGLE_WIDTH}),
                             i -> concat_ws(' ', slice(_toks, i + 1, {SHINGLE_WIDTH})))
                         ELSE array(concat_ws(' ', _toks))
                    END
                    """
                ),
                lambda s: F.xxhash64(s),
            )
        ).alias("sh"),
    ).withColumn("band", _jaccard_band(F.size("sh")))
    blocked = sh.select(
        "doc_id",
        "band",
        "sh",
        "lang",
        "source",
        F.explode(
            F.array(F.col("band"), F.col("band") - F.lit(1))
        ).alias("_block"),
    ).filter(F.col("_block") >= 0)
    # explicit repartition on the block key BEFORE the groupBy: the block
    # relation is byte-small (hashed shingles), so AQE would coalesce the
    # groupBy exchange to 1-2 partitions and run every block's GEMM kernel
    # serially (Python compute is invisible to AQE's byte-based sizing;
    # measured 2.4× at sf0.1 on the levenshtein sibling).  An explicit
    # numbered repartition is never coalesced, and applyInPandas reuses it
    # (ClusteredDistribution is satisfied — no second exchange).
    shuffle_n = blocked.sparkSession.sparkContext.defaultParallelism
    pairs = (
        blocked.repartition(shuffle_n, "lang", "source", "_block")
        .groupBy("lang", "source", "_block")
        .applyInPandas(
            _make_jaccard_block_kernel(threshold),
            schema="doc_a long, doc_b long, _j double",
        )
    )
    # round OUTSIDE the kernel: F.round is HALF_UP like DuckDB's round();
    # np.round is banker's and could flip an exact x.xxxxxx5 boundary
    return pairs.select(
        "doc_a", "doc_b", F.round(F.col("_j"), 6).alias("jaccard")
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of :func:`ngram_jaccard_pairs` over the documents
    table (see that docstring for the exact-banding argument)."""
    return ngram_jaccard_pairs(
        spread_for_cpu(load_table(spark, sf_dir, "documents"), spark)
    )


LEV_MAX = 32  # absolute edit-distance threshold
# band width MUST be > LEV_MAX so that any pair within distance LEV_MAX
# (hence within LEV_MAX chars of each other) is same-band or adjacent-band
# — double assignment then makes the blocking EXACT, not a recall trade
LEV_BAND = LEV_MAX + 1


def _make_lev_block_kernel(max_d: int):
    """applyInPandas kernel factory (nested per the cloudpickle by-value
    rule): for one (lang, source, length-band) block, enumerate the
    length-window pairs, run EXACT vectorized pre-filters, then compute
    the banded Levenshtein DP IN-KERNEL — lock-step vectorized across
    all surviving pairs — and emit only (doc_a, doc_b, lev) rows.

    Nothing but id-sized rows ever leave the kernel: the round-4.0 form
    shipped every filter survivor's texts through a second shuffle for a
    JVM ``levenshtein`` pass, and on corpora where documents share a
    token distribution the histogram filter keeps ~50% of window pairs
    (the docstring's "~0.1%" held only for disjoint-vocabulary corpora),
    which made the text re-shuffle ~700 MB at sf1 — the measured 13.6×
    sf1/sf0.1 driver.

    Pre-filters (each a proven necessary condition for lev ≤ max_d):
    * |len(a) − len(b)| ≤ max_d       (every edit changes length by ≤ 1)
    * codepoint-histogram (hashed to 256 cells) L1 ≤ 2·max_d — a
      substitution moves two cells by 1, an indel one; hashing cells
      together only DECREASES L1, so the bound stays exact, and
      codepoints give the tight 2· bound for unicode too (utf-8 byte
      histograms needed 8· there)
    * pair-dedup: emitted only in the block == min of the two home bands

    The DP is BIT-PARALLEL banded (r12; Myers/Hyyrö style): 64
    diagonals d ∈ [-31, +32] packed into one uint64 per pair (delta
    encoding), advanced in lock-step across all pairs with ~15 uint64
    numpy ops per text row — ~3× the int16 band form, whose six
    (P, 2·max_d+1) int16 temporaries per row were memory-bound.  Every
    8 rows, pairs whose FINAL-diagonal cell (monotone in the row index)
    exceeds ``max_d`` are compacted away.  The whole pair pipeline
    (window enumeration → band-dedup → histogram filter → DP) is
    STREAMED in fixed-size cache-resident chunks so peak kernel state
    is O(CHUNK) regardless of block pair count (r12; the prior form
    peaked ~3.5 GB on sf3's 26.6M-pair blocks).  Distances are
    exact small integers over CODEPOINTS — the same semantics as Spark's
    ``F.levenshtein`` and pinned by the brute-force unicode pytest — so
    engine determinism is trivial.
    """
    if max_d > 32:
        # the bit-parallel band is 64 diagonals d ∈ [-31, +32] in one
        # uint64; thresholds past 32 need a two-word band
        raise ValueError(f"max_d={max_d} > 32 exceeds the uint64 band")

    def _kernel(pdf):
        import numpy as _np
        import pandas as _pd

        n = len(pdf)
        empty = _pd.DataFrame(
            {
                "doc_a": _np.array([], dtype=_np.int64),
                "doc_b": _np.array([], dtype=_np.int64),
                "lev": _np.array([], dtype=_np.int32),
            }
        )
        if n < 2:
            return empty
        # EXACT-TEXT COLLAPSE (r12): identical texts form one group; the
        # pair pipeline runs on DISTINCT texts only and results expand
        # back to member doc pairs at the end — output-identical, and a
        # k-member dup clique costs 1 pipeline row instead of k²/2
        # full-depth DP pairs (an 85-doc clique in one sf1 block made
        # every clique pair survive the whole DP: 4.3 s for one block).
        # Identical texts share length ⇒ home band, so group band is
        # well-defined and the min-home-band pair-dedup rule transfers.
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        all_ids = pdf["doc_id"].to_numpy()
        all_bands = pdf["band"].to_numpy()
        block = int(pdf["_block"].iloc[0])
        uniq, inv = _np.unique(
            pdf["text"].to_numpy(dtype=object), return_inverse=True
        )
        G = len(uniq)
        gorder = _np.argsort(inv, kind="stable")  # members in doc_id order
        ginv = inv[gorder]
        gstart = _np.searchsorted(ginv, _np.arange(G))
        gsize = _np.diff(_np.append(gstart, n))
        mflat = all_ids[gorder]
        gband = all_bands[gorder[gstart]]

        def _expand(fa_g, fb_g, fd):
            # cross-group hits → all member pairs; plus lev-0 pairs
            # inside every ≥2-member group homed in this block
            out = []
            sa, sb = gsize[fa_g], gsize[fb_g]
            cnt = sa * sb
            tot = int(cnt.sum())
            if tot:
                hidx = _np.repeat(_np.arange(len(fa_g)), cnt)
                base = _np.cumsum(cnt) - cnt
                within = _np.arange(tot) - base[hidx]
                ia = within // sb[hidx]
                ib = within % sb[hidx]
                da = mflat[gstart[fa_g][hidx] + ia]
                db = mflat[gstart[fb_g][hidx] + ib]
                out.append((da, db, fd[hidx]))
            for g in _np.nonzero((gsize >= 2) & (gband == block))[0]:
                mem = mflat[gstart[g] : gstart[g] + gsize[g]]
                iu, ju = _np.triu_indices(len(mem), k=1)
                out.append(
                    (mem[iu], mem[ju], _np.zeros(len(iu), dtype=_np.int32))
                )
            if not out:
                return empty
            da = _np.concatenate([o[0] for o in out])
            db = _np.concatenate([o[1] for o in out])
            dl = _np.concatenate([o[2] for o in out])
            return _pd.DataFrame(
                {
                    "doc_a": _np.minimum(da, db),
                    "doc_b": _np.maximum(da, db),
                    "lev": dl.astype(_np.int32),
                }
            )

        # sort groups by length: qualifying pairs live in a ±max_d length
        # window, so pair enumeration is searchsorted windows (O(output)),
        # never a dense n² triangle.  np.unique's text order makes the
        # stable length-argsort's tie order deterministic
        lens = _np.array([len(t) for t in uniq], dtype=_np.int64)
        order = _np.argsort(lens, kind="stable")
        ids = _np.arange(G)[order]  # group index per sorted position
        bands = gband[order]
        texts = [uniq[i] for i in order]
        lens = lens[order]
        n = G
        if n < 2:
            return _expand(
                _np.array([], dtype=_np.int64),
                _np.array([], dtype=_np.int64),
                _np.array([], dtype=_np.int32),
            )
        maxlen = int(lens[-1])
        # one decode per doc: codepoint rows for the DP (sentinels can
        # never equal a real codepoint) + hashed histogram for the filter
        SENT_A = _np.uint32(0xFFFFFFFF)
        SENT_B = _np.uint32(0xFFFFFFFE)
        # cpb padding is BAND-geometry-sized (32 left / 33 right for the
        # fixed 64-diagonal window), independent of max_d
        cpa = _np.full((n, max(maxlen, 1)), SENT_A, dtype=_np.uint32)
        cpb = _np.full((n, 32 + maxlen + 33), SENT_B, dtype=_np.uint32)
        hist = _np.zeros((n, 256), dtype=_np.int32)
        for i, t in enumerate(texts):
            if t:
                cp = _np.frombuffer(t.encode("utf-32-le"), dtype=_np.uint32)
                cpa[i, : len(cp)] = cp
                cpb[i, 32 : 32 + len(cp)] = cp
                hist[i] = _np.bincount(cp & 255, minlength=256)
        pos = _np.arange(n)
        hi = _np.searchsorted(lens, lens + max_d, side="right")
        counts = hi - pos - 1
        total = int(counts.sum())
        _no_hits = (
            _np.array([], dtype=_np.int64),
            _np.array([], dtype=_np.int64),
            _np.array([], dtype=_np.int32),
        )
        if total == 0:
            return _expand(*_no_hits)
        # flat pair-index offsets: pair j belongs to the anchor a with
        # starts[a] <= j < starts[a] + counts[a]; zero-count anchors
        # duplicate the next start, and searchsorted(side="right")-1
        # lands on the LAST duplicate — exactly the owning anchor
        starts = _np.cumsum(counts) - counts
        # Bit-parallel banded DP constants (r12, see _run_dp): the band
        # is 64 diagonals d in [-31, +32] packed into ONE uint64 per
        # pair (delta encoding: bit x of P/M = V(x) - V(x-1) = +-1,
        # cell x <-> diagonal d = x - 31, score tracks V(63)).
        _ONE = _np.uint64(1)
        _TOP = _np.uint64(1) << _np.uint64(63)
        _PM1 = _np.uint64(0x5555555555555555)
        _PM2 = _np.uint64(0x3333333333333333)
        _PM4 = _np.uint64(0x0F0F0F0F0F0F0F0F)
        _PH = _np.uint64(0x0101010101010101)
        _P0 = ~((_ONE << _np.uint64(32)) - _ONE)  # delta +1 at x>31
        _M0 = ((_ONE << _np.uint64(32)) - _ONE) & ~_ONE  # -1 at 1..31

        def _pc(v):
            # SWAR popcount (numpy 1.x has no bitwise_count)
            v = v - ((v >> _ONE) & _PM1)
            v = (v & _PM2) + ((v >> _np.uint64(2)) & _PM2)
            v = (v + (v >> _np.uint64(4))) & _PM4
            return (v * _PH) >> _np.uint64(56)
        # STREAMED pair pipeline (r12, VERDICT r11 #1): enumerate window
        # pairs, band-dedup, and histogram-filter one fixed-size chunk
        # at a time; filtered survivors ACCUMULATE and the lock-step DP
        # runs on DP_CHUNK-sized batches (id arrays only between stages,
        # so the pending buffer is MB-sized).  The r11 form materialized
        # ALL window pairs (ai/bi repeat arrays) and fancy-indexed
        # (1M, 256) int32 histogram temporaries — ~3.5 GB peak on sf3's
        # 26.6M-pair blocks, OOM-bound at 100×.  Peak state is now
        # O(CHUNK + DP_CHUNK) at ANY block size: two reused (CHUNK, 256)
        # int32 take-buffers (~33 MB), 3 words of bit-band DP state per
        # pair, and a small pending id buffer.
        # Batch sizes are CACHE-SIZED, not memory-sized (r12): the DP
        # re-touches its state EVERY row step, so a batch that outgrows
        # the per-process LLC share re-streams from DRAM each row —
        # measured single-core on fixed total work with the int16 band:
        # P=200k 39.4 s vs P=12k 15.7 s (2.5×).  sf1 blocks (~20k
        # survivors) were accidentally cache-resident while sf3 blocks
        # (~150k) were not — the whole "per-pair cost grows with SF"
        # mystery.  The bit-parallel band cut per-pair state ~6× on top.
        CHUNK = 1 << 15
        DP_CHUNK = 1 << 14
        ha = _np.empty((min(CHUNK, total), 256), dtype=_np.int32)
        hb = _np.empty((min(CHUNK, total), 256), dtype=_np.int32)
        out_a, out_b, out_d = [], [], []

        def _run_dp(pa, pb):
            # Bit-parallel banded Levenshtein, lock-step across pairs
            # (r12; Myers/Hyyrö style, validated against the O(mn) DP on
            # 7k random+adversarial cases and by the repo's brute-force
            # pytest).  Band = 64 diagonals d ∈ [-31, +32] in ONE uint64
            # per pair: bit x of P/M is the ±1 delta V(x) − V(x−1) of
            # band cell x ↔ D(i, i + x − 31), score tracks V(63).  Each
            # row pre-shifts the band (the diagonal window advances with
            # i) then runs one classical Myers step (~15 uint64 ops),
            # ~6× less data traffic per pair-row than the int16 band
            # (which moved six (P, 65) int16 temporaries per row).
            # Boundary relaxations are exact-safe: diagonals d ≤ −17
            # cost ≥ 2·17 > max_d to leave, so over-estimates there
            # never reach an optimal ≤max_d path, and the top shift-in
            # (V(64) := V(63)+1 ≥ 33) only creates ≥ INF-equivalent
            # values.  The kill check reads each pair's FINAL diagonal
            # (D(i, i+df) is non-decreasing in i), tighter than the old
            # whole-band minimum.
            p = len(pa)
            # a is the shorter side: length-ordered positions ⇒ pa ≤ pb
            m2, n2 = lens[pa], lens[pb]
            res = _np.full(p, -1, dtype=_np.int32)
            zero = m2 == 0
            res[zero] = _np.where(n2[zero] <= max_d, n2[zero], -1)
            act = _np.nonzero(~zero)[0]
            # bits strictly above each pair's final-diagonal cell
            # x_f = (n−m) + 31 (double-shift: x_f = 63 must yield 0)
            am_all = ((~_np.uint64(0)) << (n2 - m2 + 31).astype(_np.uint64)) << _ONE
            P = _np.full(len(act), _P0, dtype=_np.uint64)
            M = _np.full(len(act), _M0, dtype=_np.uint64)
            # V(63) = |63 - 31| = 32: a band-geometry constant, NOT max_d
            score = _np.full(len(act), 32, dtype=_np.int32)
            for i in range(1, int(m2.max(initial=0)) + 1):
                if len(act) == 0:
                    break
                # band pre-shift: δs(x) = δ(x+1), top shift-in = +1
                Ps = (P >> _ONE) | _TOP
                Ms = M >> _ONE
                score += 1
                cmp = cpa[pa[act], i - 1][:, None] == cpb[pb[act], i : i + 64]
                Eq = _np.packbits(cmp, axis=1, bitorder="little").view(
                    _np.uint64
                ).ravel()
                Xv = Eq | Ms
                Xh = (((Eq & Ps) + Ps) ^ Ps) | Eq
                Ph = Ms | ~(Xh | Ps)
                Mh = Ps & Xh
                score += ((Ph >> _np.uint64(63)) & _ONE).astype(_np.int32)
                score -= ((Mh >> _np.uint64(63)) & _ONE).astype(_np.int32)
                PhS = (Ph << _ONE) | _ONE
                MhS = Mh << _ONE
                P = MhS | ~(Xv | PhS)
                M = PhS & Xv
                fin = m2[act] == i
                if fin.any():
                    # extraction popcounts run on the FINISHING subset
                    # only — computing them for all act pairs every
                    # finish row doubled per-row cost on small batches
                    amf = am_all[act[fin]]
                    res[act[fin]] = (
                        score[fin]
                        - _pc(P[fin] & amf).astype(_np.int32)
                        + _pc(M[fin] & amf).astype(_np.int32)
                    )
                    keep = ~fin
                    act = act[keep]
                    P, M, score = P[keep], M[keep], score[keep]
                if i % 8 == 0 and len(act):
                    am = am_all[act]
                    v = (
                        score
                        - _pc(P & am).astype(_np.int32)
                        + _pc(M & am).astype(_np.int32)
                    )
                    alive = v <= max_d
                    if not alive.all():
                        act = act[alive]
                        P, M, score = P[alive], M[alive], score[alive]
            res[res > max_d] = -1
            ok = res >= 0
            out_a.append(pa[ok])
            out_b.append(pb[ok])
            out_d.append(res[ok])

        pend_a, pend_b, pend = [], [], 0
        for lo in range(0, total, CHUNK):
            idx = _np.arange(lo, min(lo + CHUNK, total))
            pa = _np.searchsorted(starts, idx, side="right") - 1
            pb = idx - starts[pa] + pa + 1
            # pair-dedup: emitted only in the min home band's block
            keep = _np.minimum(bands[pa], bands[pb]) == block
            pa, pb = pa[keep], pb[keep]
            k = len(pa)
            if k == 0:
                continue
            _np.take(hist, pa, axis=0, out=ha[:k])
            _np.take(hist, pb, axis=0, out=hb[:k])
            _np.subtract(ha[:k], hb[:k], out=ha[:k])
            _np.abs(ha[:k], out=ha[:k])
            keep = ha[:k].sum(axis=1) <= 2 * max_d
            pa, pb = pa[keep], pb[keep]
            if len(pa) == 0:
                continue
            pend_a.append(pa)
            pend_b.append(pb)
            pend += len(pa)
            if pend >= DP_CHUNK:
                _run_dp(_np.concatenate(pend_a), _np.concatenate(pend_b))
                pend_a, pend_b, pend = [], [], 0
        if pend:
            _run_dp(_np.concatenate(pend_a), _np.concatenate(pend_b))
        if not out_a:
            return _expand(*_no_hits)
        fa = _np.concatenate(out_a)
        fb = _np.concatenate(out_b)
        fd = _np.concatenate(out_d)
        # positions are length-ordered: map back to group indices, then
        # expand each group hit to its member doc pairs (+ intra-group
        # lev-0 pairs) — _expand restores doc_a < doc_b
        return _expand(ids[fa], ids[fb], fd.astype(_np.int32))

    return _kernel


def q_dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup: EVERY (lang, source) pair of documents
    whose Levenshtein distance is ≤ LEV_MAX — no banding artifact in the
    contract (round 4; the previous same-band-only form silently dropped
    near-dups straddling a band edge).

    Blocking is floor(length/33) with double assignment: lev ≤ 32 forces
    |len(a) − len(b)| ≤ 32 < 33, so a qualifying pair is same-band or
    adjacent-band, adjacent pairs surface exactly once in the lower
    band's block, and the blocking provably loses nothing.  Each block
    runs exact vectorized pre-filters AND the banded Levenshtein DP
    itself in-kernel (see _make_lev_block_kernel), lock-step vectorized
    across pairs, so only (doc_a, doc_b, lev) id-rows ever leave a
    block: each text crosses the wire exactly twice (the double-assigned
    groupBy shuffle) and filter survivors cost DP cycles, never shuffle
    bytes — the superseded emit-texts + JVM-levenshtein form re-shuffled
    ~700 MB of survivor texts at sf1 (13.6× sf1/sf0.1; this form
    measures ≤ its own pair growth).  Nothing persists, no join, no
    second exchange.  The DuckDB oracle mirrors the semantic contract
    directly: (lang, source) self-join, levenshtein ≤ 32 (with the
    implied-by-the-metric length pre-filter for oracle speed).
    """
    from etl_embargo_spark.catalog import table_rows

    # length-shard width sized from the corpus (parquet footer, job-free,
    # output-invariant — the kernel's length window is the real gate):
    # small corpora run one shard per (lang, source) so per-group Python
    # overhead doesn't dominate (~1300 tiny groups cost more than their
    # kernels at sf0.1); large corpora shard at the minimum exact width
    # (LEV_MAX+1) so block pair windows stay bounded and parallel
    width = LEV_BAND if table_rows(sf_dir, "documents") >= 20_000 else 1 << 20
    docs = spread_for_cpu(load_table(spark, sf_dir, "documents"), spark).select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.floor(F.length("text") / width).cast("int").alias("band"),
    )
    blocked = docs.select(
        "doc_id",
        "band",
        "text",
        "lang",
        "source",
        F.explode(
            F.array(F.col("band"), F.col("band") - F.lit(1))
        ).alias("_block"),
    ).filter(F.col("_block") >= 0)
    # explicit numbered repartition: see ngram_jaccard_pairs — AQE would
    # coalesce this byte-small exchange and serialize the block kernels
    return (
        blocked.repartition(
            spark.sparkContext.defaultParallelism, "lang", "source", "_block"
        )
        .groupBy("lang", "source", "_block")
        .applyInPandas(
            _make_lev_block_kernel(LEV_MAX),
            schema="doc_a long, doc_b long, lev integer",
        )
    )


def dedup_clusters(
    pairs: DataFrame,
    max_iters: int = 50,
    pointer_doubling: bool = False,
    broadcast_labels: bool = False,
) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, cluster) with
    cluster = min doc_id in the component: the step that turns pairwise
    near-dup verdicts into keep/drop groups (keep the representative, drop
    the rest).

    ``pointer_doubling=True`` adds a label(label(v)) hop each round (one
    extra node-sized self-join), cutting rounds from O(diameter) to
    O(log diameter) — the classic pointer-jumping trick.  Near-dup
    components start as shallow cliques/chains (3-5 rounds) but DEEPEN
    with near-dup pair density (the r11 sf3 probe measured 10 rounds),
    so q_dedup_clusters enables the hop; GEOMETRIC components are
    path-shaped and deep — geo.dbscan_points contracts tiles in-kernel
    first and runs this loop only on its boundary graph.  The converged
    labels (component min id) are ALGORITHM-INDEPENDENT, so flipping
    either flag never changes output.

    ``broadcast_labels=True`` hints the per-round label joins broadcast
    (the pagerank pattern): correct ONLY when the caller knows the node
    relation is far below the broadcast budget (dbscan's contracted
    boundary graph); the dedup family's labels are corpus-sized, so the
    default keeps shuffle joins.  Measured 0.75 → ~0.3 s/round on a
    400-node graph (each round collapses to one shuffle).

    Iterative min-label propagation — the class of algorithm that is NOT
    SQL-expressible: each round every vertex adopts the smallest label
    among itself and its neighbors; converged when a round changes
    nothing.  Rounds = O(component diameter), and near-dup components are
    shallow (dup clusters are cliques or short chains), so a handful of
    rounds suffices at any corpus size.

    Scale mechanics: each round is one shuffle join + groupBy-min, and the
    label relation is ``localCheckpoint``ed per round — WITHOUT that, the
    lineage doubles every iteration and Catalyst re-plans (and re-executes)
    an exponentially growing tree; with it, each round starts from
    materialized partitions.  The convergence check is a count() per round
    — one tiny driver scalar, the loop condition itself (this is driver
    CONTROL FLOW, not a driver-side data pull)."""
    # CHECKPOINT the input, not persist (r13): every round's join +
    # convergence count re-PLANS the edge relation, and a persisted
    # relation keeps its full logical tree — Catalyst re-canonicalizes
    # the whole upstream pipeline (blocked Levenshtein scoring, tile
    # kernels) per round, which measured 4-5 s of pure driver planning
    # on a 61-EDGE boundary graph in q_dbscan (20+ s with one more
    # kernel level upstream).  An eager localCheckpoint truncates the
    # plan to ExistingRDD — per-round planning becomes O(loop body),
    # independent of how deep the pair pipeline is.  The relation is
    # id-pair-sized at any corpus size, and the loop already runs jobs
    # at build time (iterative-builder exemption), so the materializing
    # job is not a new cost class.  Blocks outlive clearCache — the
    # bench/soak release them between queries (CLAUDE.md).
    pairs = pairs.localCheckpoint()
    edges = pairs.selectExpr("a AS src", "b AS dst").unionByName(
        pairs.selectExpr("b AS src", "a AS dst")
    )
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    maybe_bc = F.broadcast if broadcast_labels else (lambda df: df)
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(maybe_bc(labels.withColumnRenamed("id", "src")), "src")
            .groupBy("dst")
            .agg(F.min("label").alias("nmin"))
            .withColumnRenamed("dst", "id")
        )
        joined = labels.join(maybe_bc(neighbor_min), "id", "left")
        if pointer_doubling:
            # label(label(v)): every current label IS a node id (labels
            # start as self and only take mins of node ids), so the hop
            # lookup always hits; left join just for schema safety
            hop = labels.select(
                F.col("id").alias("label"), F.col("label").alias("hmin")
            )
            joined = joined.join(maybe_bc(hop), "label", "left")
            new_label = F.least(
                F.col("label"),
                F.coalesce(F.col("nmin"), F.col("label")),
                F.coalesce(F.col("hmin"), F.col("label")),
            )
        else:
            new_label = F.least(
                F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
            )
        # checkpoint the joined round ONCE; both the convergence count and
        # the next round's labels read the materialized result (counting
        # first and checkpointing after would execute the join twice)
        updated = joined.select(
            "id", new_label.alias("new_label"), "label"
        ).localCheckpoint()
        changed = updated.filter(F.col("new_label") < F.col("label")).count()
        labels = updated.select("id", F.col("new_label").alias("label"))
        if changed == 0:
            break
    else:
        # silent non-convergence would return a component split into
        # several clusters with wrong representatives — fail loudly
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iters} rounds "
            "(component diameter exceeds max_iters); raise max_iters"
        )
    # the checkpointed pair blocks (like every per-round label
    # checkpoint above) are released by the sweep-level block release
    # (bench._release_session_blocks / soak's session recycle) — there
    # is no public per-DataFrame API to drop localCheckpoint blocks
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster")
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only (iterative — not SQL-expressible): cluster assignment over
    the union of exact-dup pairs and blocked edit-distance pairs; pytest
    holds a union-find oracle over the same edges."""
    # exact-dup edges as STARS (representative ↔ member), not cliques:
    # connectivity needs only k-1 edges per k-doc group, and a clique
    # expansion of a large dup cluster is O(k²) for nothing — union-find
    # components are identical either way
    groups = (
        load_table(spark, sf_dir, "documents")
        .select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("rep"),
            F.collect_set("doc_id").alias("members"),
        )
        .filter(F.size("members") >= 2)
    )
    exact_pairs = groups.select(
        F.col("rep").alias("a"), F.explode("members").alias("b")
    ).filter(F.col("a") < F.col("b"))
    lev_pairs = q_dedup_levenshtein(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    # unsorted on purpose — see q_dedup_minhash.  pointer_doubling: the
    # r11 sf3 probe measured the min-label loop at 10 rounds (components
    # deepen with near-dup density — chains, not just cliques); the
    # label(label(v)) hop cuts rounds to O(log diameter) for one extra
    # node-sized join per round, and the converged labels are
    # algorithm-independent (pins unchanged).
    return dedup_clusters(
        exact_pairs.unionByName(lev_pairs).distinct(),
        pointer_doubling=True,
    )


def simhash_signatures(docs: DataFrame, bits: int = 64) -> DataFrame:
    """(doc_id, simhash bigint) via an Arrow-batched kernel: token murmur
    hashes are computed JVM-side; the per-bit majority vote runs in numpy.

    The Python step is O(tokens × 64) bit-counting — vectorized, and the
    only part Spark's expression language can't state without 64 separate
    aggregates."""
    hashed = docs.withColumn("_toks", _tokens()).select(
        "doc_id",
        F.transform(F.col("_toks"), lambda t: F.hash(t)).alias("tok_hashes"),
    )

    def _simhash(batches):
        # Whole-batch vectorization: one flat hash array per Arrow batch,
        # per-doc majority votes via cumsum segment differences — no Python
        # loop over rows (an iterrows version of this kernel was ~5x slower
        # and dominated the operator's runtime).
        import numpy as _np
        import pandas as _pd

        ONE = _np.uint64(1)
        SHIFTS = _np.arange(64, dtype=_np.uint64)[None, :]

        for pdf in batches:
            lists = [
                _np.asarray(v, dtype=_np.int64) for v in pdf["tok_hashes"]
            ]
            counts = _np.array([a.size for a in lists], dtype=_np.int64)
            if counts.sum() == 0:
                yield _pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "simhash": _np.zeros(len(pdf), dtype=_np.int64)}
                )
                continue
            flat = _np.concatenate([a for a in lists if a.size]) if lists else _np.empty(0, _np.int64)
            u = flat.view(_np.uint64) & _np.uint64(0xFFFFFFFF)
            # widen 32-bit murmur to 64 deterministic bits
            u = (u * _np.uint64(0x9E3779B97F4A7C15)) ^ (u << _np.uint64(17))
            bitmat = ((u[:, None] >> SHIFTS) & ONE).astype(_np.int32)
            # per-doc ones-count per bit: prefix sums sliced at segment
            # boundaries (handles empty docs, unlike add.reduceat)
            cs = _np.vstack(
                [_np.zeros((1, 64), dtype=_np.int64), _np.cumsum(bitmat, axis=0)]
            )
            ends = _np.cumsum(counts)
            starts = ends - counts
            ones = cs[ends] - cs[starts]  # (n_docs, 64)
            # majority vote with ties set (2*ones >= count), empty docs -> 0
            bits = (2 * ones >= counts[:, None]) & (counts[:, None] > 0)
            sigs = (bits.astype(_np.uint64) << SHIFTS).sum(
                axis=1, dtype=_np.uint64
            )
            yield _pd.DataFrame(
                {"doc_id": pdf["doc_id"], "simhash": sigs.view(_np.int64)}
            )

    return hashed.mapInPandas(_simhash, schema="doc_id long, simhash long")


def simhash_near_dups(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """ALL pairs within Hamming distance ≤ ``max_hamming``: band the 64-bit
    signature into ``max_hamming + 1`` chunks — a pair differing in ≤
    max_hamming bits touches at most max_hamming chunks, so by pigeonhole
    at least one chunk matches exactly (full recall, the Hamming analog of
    MinHash banding).  Join per chunk, verify with bit_count.

    The default radius is 3 — the published near-dup setting for 64-bit
    simhash (Manku, Jain & Das Sarma, WWW'07 "Detecting Near-Duplicates
    for Web Crawling") — and the choice is about scale, not taste: 4
    chunks of 16 bits keep bucket keys selective, while radius 8 forces 9
    chunks of ~7 bits whose buckets collapse into near-quadratic candidate
    expansion (measured on the synthetic corpus at sf0.1: 11.3M candidate
    pairs at radius 8 vs 337k at radius 3, for 5,000 docs — the former is
    O(n²/2^7) and would be ruinous at any real corpus size)."""
    n_chunks = max_hamming + 1
    # exact partition of the 64 bits into n_chunks contiguous ranges
    bounds = [round(64 * i / n_chunks) for i in range(n_chunks + 1)]
    chunk_cols = [
        F.shiftrightunsigned(F.col("simhash"), bounds[i])
        .bitwiseAND(F.lit((1 << (bounds[i + 1] - bounds[i])) - 1))
        .alias(f"c{i}")
        for i in range(n_chunks)
    ]
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(F.array(*chunk_cols)).alias("chunk_idx", "chunk"),
    )
    # Carry the 8-byte signature through the bucket shuffle so the Python
    # signature kernel runs exactly once (joining sigs back per side would
    # re-execute mapInPandas twice).
    cand = _bucket_pairs(
        chunks,
        ["chunk_idx", "chunk"],
        F.struct(F.col("doc_id"), F.col("simhash")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.simhash").alias("sig_a"),
        F.col("b.simhash").alias("sig_b"),
    ).distinct()
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select(
        "doc_a", "doc_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (detail form; pytest oracle).  Runs through
    :func:`exact_collapse_pairs` (simhash is a pure function of the
    text; identical texts pair at Hamming 0): per-doc banding pushed the
    sf1 exact-dup clique's C(2941,2) pairs through every chunk bucket —
    44 s at sf1, collapsed ~3× faster — and the cap cliff argument from
    the collapse docstring applies verbatim."""
    docs = spread_for_cpu(load_table(spark, sf_dir, "documents"), spark)
    return exact_collapse_pairs(
        docs,
        lambda reps: simhash_near_dups(simhash_signatures(reps)).select(
            "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
        ),
        {"hamming": F.lit(0).cast("int")},
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered checksum-rollup of :func:`simhash_pairs` (pinned oracle)."""
    return _pair_checksum_rollup(simhash_pairs(spark, sf_dir), "doc_a")


# lsh_params defaults — the deployment knobs, in one place:
LSH_TARGET_BUCKET = 32  # expected vectors per bucket (n / 2^k)
LSH_SIZING_T = 0.45  # cosine the recall guarantee is solved at (this
# corpus's similarity ceiling; real near-dup corpora size at their own
# threshold, e.g. 0.9, which needs far fewer tables for the same recall)
LSH_RECALL = 0.78  # per-pair recall target at LSH_SIZING_T
LSH_MAX_TABLES = 64
LSH_MAX_PLANES = 24


def lsh_params(
    expected_n: int,
    threshold: float = LSH_SIZING_T,
    recall: float = LSH_RECALL,
    target_bucket: int = LSH_TARGET_BUCKET,
) -> tuple[int, int]:
    """(planes_per_table, n_tables) sized from the corpus scale — the
    executable form of the log2(n) rule, so growing the corpus 100×
    cannot silently push buckets past ``max_bucket`` (where they would
    be DROPPED and recall would collapse rather than cost exploding).

    * planes k = ceil(log2(n / target_bucket)): expected bucket
      occupancy n / 2^k stays ≈ target_bucket at any n.
    * tables L solves the banding recall at ``threshold``: collision
      prob per plane p = 1 − arccos(θ)/π, per table p^k, so
      L = ceil(ln(1−recall) / ln(1−p^k)) — deeper tables (bigger k)
      need more of them for the same recall, which is the classic
      LSH cost/recall trade made explicit.

    At the validated corpus scale (n=500, the sf0.001/sf0.01 embeddings
    table) this returns exactly the (4, 8) operating point every pinned
    oracle and recall test was generated against; at n=2000 (sf0.1) it
    returns (6, 20).  ``expected_n`` comes from parquet footer metadata
    (catalog.table_rows — no Spark job), so registered queries stay
    job-free while sizing from the actual corpus.
    """
    import math

    n = max(int(expected_n), 2)
    k = min(max(math.ceil(math.log2(max(n / target_bucket, 2.0))), 1),
            LSH_MAX_PLANES)
    p = 1.0 - math.acos(max(min(threshold, 1.0), -1.0)) / math.pi
    pk = p ** k
    if pk >= 1.0:
        return k, 1
    L = math.ceil(math.log(max(1.0 - recall, 1e-12)) / math.log(1.0 - pk))
    return k, min(max(L, 1), LSH_MAX_TABLES)


def _make_lsh_bucketer(seed: int, k: int, n_t: int):
    """mapInPandas kernel factory (ships by value, executor-safe): assign
    every vector its (table_id, bucket) LSH keys for ``n_t`` tables of
    ``k`` hyperplane sign bits.  Planes are generated IN the kernel from
    the first batch's dim — keeps query construction lazy (no driver-side
    first() job, no crash on an empty table) and every task derives the
    identical matrix from the seed (mirrors similarity.sign_matrix).
    Emits id-sized membership rows only; consumers that need the vectors
    (knn_join's bucket-local scorer) join them back JVM-side — carrying
    them through this Python loop was measured at 23 s/1.28M rows."""

    def _buckets(batches):
        import numpy as _np
        import pandas as _pd

        weights = (1 << _np.arange(k, dtype=_np.int64))[None, :]
        pm = None

        for pdf in batches:
            if len(pdf) == 0:
                continue
            e = _np.vstack(pdf["embedding"].to_numpy()).astype(_np.float64)
            if pm is None:
                rng = _np.random.default_rng(seed)
                pm = (
                    rng.integers(0, 2, size=(n_t * k, e.shape[1])) * 2 - 1
                ).astype(_np.float64)
            bits = (e @ pm.T) >= 0  # (n, n_tables*k)
            keys = (
                bits.reshape(len(pdf), n_t, k).astype(_np.int64) * weights
            ).sum(axis=2)
            n = len(pdf)
            yield _pd.DataFrame(
                {
                    "vec_id": _np.repeat(pdf["vec_id"].to_numpy(), n_t),
                    "table_id": _np.tile(_np.arange(n_t, dtype=_np.int32), n),
                    "bucket": keys.reshape(-1),
                }
            )

    return _buckets


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.45,
    planes_per_table: int = 4,
    n_tables: int = 8,
) -> DataFrame:
    """Embedding-cosine near-dup via multi-table random-hyperplane LSH.

    ``n_tables`` independent tables of ``planes_per_table`` sign bits each
    (deterministic seeded ±1 planes, applied as ONE Arrow-batched GEMM:
    (batch × dim) @ (dim × planes) then sign-packed per table — per-row
    column expressions for this were interpreted per element and ~20x
    slower); a pair is a candidate if it collides in ANY table; exact
    cosine verifies.  Recall for angle θ: 1-(1-(1-θ/π)^k)^L — banding,
    exactly like MinHash; a single wide bucket would have ~zero recall at
    moderate similarity.  At 100 TB the bucket join replaces the O(n²)
    cross join.

    Sizing: pass ``lsh_params(expected_n)`` — the executable log2(n)
    rule (planes from target bucket occupancy, tables solved for recall
    at the op's threshold).  The (4, 8) defaults are that function's
    output at the validated n=500 corpus; callers with a corpus in hand
    must size from it rather than inherit the defaults.

    Round-4 execution shape (same as similarity.knn_join): scoring is
    bucket-LOCAL — memberships join the vectors JVM-side, each (table,
    bucket-mod-64) kernel group scores its buckets' pairs with the
    row-wise einsum and emits only pairs passing ``threshold``; the
    cross-table distinct dedups identical rows.  Bit-identical to the
    superseded candidate-distinct + per-pair join-back (same einsum
    doubles, same 6-dp np.round), which shipped two 64-float arrays per
    candidate pair — at sf1 (12.5M candidates) that join was the query.
    """

    def _make_threshold_scorer(t: float, max_bucket: int):
        # nested factory: ships by value (cloudpickle), executor-safe
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
            pdf = pdf.sort_values(["bucket", "vec_id"]).reset_index(drop=True)
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
                    continue  # degenerate-key cap, as in _bucket_pairs
                if c_n not in tri:
                    tri[c_n] = _np.triu_indices(c_n, k=1)
                iu, ju = tri[c_n]
                gi, gj = iu + s, ju + s
                dots = _np.einsum("ij,ij->i", e[gi], e[gj])
                cos = _np.round(dots / (norms[gi] * norms[gj]), 6)
                keep = cos >= t
                pa.append(ids[gi][keep])
                pb.append(ids[gj][keep])
                pc.append(cos[keep])
            if not pa:
                return empty
            return _pd.DataFrame(
                {
                    "vec_a": _np.concatenate(pa),
                    "vec_b": _np.concatenate(pb),
                    "cosine": _np.concatenate(pc),
                }
            )

        return _score

    bucketed = emb.select("vec_id", "embedding").mapInPandas(
        _make_lsh_bucketer(7, planes_per_table, n_tables),
        schema="vec_id long, table_id int, bucket long",
    )
    with_vec = bucketed.join(emb.select("vec_id", "embedding"), "vec_id")
    spark = emb.sparkSession
    scored = (
        with_vec.withColumn("_seg", F.pmod("bucket", F.lit(64)))
        .repartition(
            spark.sparkContext.defaultParallelism, "table_id", "_seg"
        )
        .groupBy("table_id", "_seg")
        .applyInPandas(
            _make_threshold_scorer(threshold, 4096),
            schema="vec_a long, vec_b long, cosine double",
        )
    )
    # identical (pair, cosine) rows come out of every table the pair
    # collides in — distinct is the cross-table dedup
    return scored.distinct()


def embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (detail form; pytest oracle checks recall
    vs the brute-force pairs).  Threshold 0.45: the synthetic embeddings
    top out near cosine 0.51, so a 0.9 near-dup threshold would make this
    query vacuously empty at every SF.  LSH sizing comes from the actual
    corpus row count via :func:`lsh_params` (footer metadata, job-free)."""
    from etl_embargo_spark.catalog import table_rows

    emb = spread_for_cpu(load_table(spark, sf_dir, "embeddings"), spark)
    k, n_tables = lsh_params(table_rows(sf_dir, "embeddings"))
    # unsorted on purpose — see minhash_pairs
    return embedding_near_dups(
        emb, threshold=0.45, planes_per_table=k, n_tables=n_tables
    )


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered checksum-rollup of :func:`embedding_pairs` (pinned
    oracle)."""
    return _pair_checksum_rollup(embedding_pairs(spark, sf_dir), "vec_a")


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-run dedup: drop new-batch documents whose (normalized) text
    hash already exists in the standing corpus — the ingest gate that
    keeps re-crawled pages from re-entering training data.  Even doc_ids
    stand in for the standing corpus, odd for today's batch.

    Scale shape: only HASHES of the standing corpus cross the wire, and
    the probe is a LEFT ANTI join — at 100 TB the standing-hash relation
    is the thing to keep bucketed/compact (it is corpus-sized but
    32 bytes/row); the new batch is typically small and never shuffles
    more than its own hashes.  Output is the surviving new docs plus
    batch accounting."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    hashed = docs.select(
        "doc_id",
        "source",
        F.md5(F.lower(F.trim("text"))).alias("h"),
        (F.col("doc_id") % 2 == 0).alias("is_standing"),
    )
    standing = hashed.filter("is_standing").select("h").distinct()
    fresh = hashed.filter(~F.col("is_standing"))
    survivors = fresh.join(standing, "h", "left_anti")
    return survivors.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_new_docs"),
        F.count_distinct("h").alias("n_new_hashes"),
    )


# Near-dup ingest gate: hot standing buckets past this size are degenerate
# keys on the APPROXIMATE candidate path (same rationale and value as
# _bucket_pairs' cap — the exact-text collapse keeps real near-dup cliques
# far below it).
INCR_NEAR_MAX_BUCKET = 4096
INCR_NEAR_JACCARD_T = 0.5


def _band_explode(sigs: DataFrame, id_alias: str) -> DataFrame:
    """(id_alias, band, band_key) from a (doc_id, sig) relation — the
    same banding as minhash_candidates, exposed as a relation so the two
    sides of the incremental gate can be banded independently."""
    return sigs.select(
        F.col("doc_id").alias(id_alias),
        F.posexplode(
            F.array(
                *[
                    F.hash(
                        *[
                            F.element_at(
                                "sig", b * MINHASH_ROWS_PER_BAND + r + 1
                            )
                            for r in range(MINHASH_ROWS_PER_BAND)
                        ]
                    )
                    for b in range(MINHASH_BANDS)
                ]
            )
        ).alias("band", "band_key"),
    )


def standing_band_index(reps: DataFrame) -> DataFrame:
    """(gid, band, band_key) LSH band index over text-distinct
    representatives — the PRECOMPUTABLE half of the incremental near-dup
    gate.  In production this relation is built once per corpus version
    and persisted through ``sinks.snapshots.write_snapshot`` (id-sized
    rows: one bigint + two ints per band per distinct text, ~100 bytes/
    doc at 8 bands), so a corpus refresh never re-shingles the standing
    corpus; the pytest demonstrates the manifest round-trip."""
    return _band_explode(
        signatures_from_shingles(shingle_sets(reps)), "gid"
    )


def incremental_near_dedup(
    docs: DataFrame,
    standing_bands: DataFrame | None = None,
    threshold: float = INCR_NEAR_JACCARD_T,
) -> DataFrame:
    """Cross-run NEAR-dup dedup — the production corpus-refresh shape
    (VERDICT r11 #6): check today's batch (odd doc_ids) for near-
    duplicates against the standing corpus (even doc_ids) WITHOUT
    re-bucketing the standing corpus per ingest.

    Pipeline (all text-distinct first, the exact-collapse lesson):
    1. Group each side by md5(text) → one representative per (side,
       text); standing gids are even and new gids odd by construction
       (each side's min member id), so sidedness survives every stage
       for free.
    2. Standing reps → LSH band index (``standing_band_index``) — the
       relation a real deployment reads back from a snapshot manifest
       instead of recomputing (pass it via ``standing_bands``).
    3. New reps → the same banding; candidates = new bands joined
       against standing BUCKETS (groupBy standing (band, band_key) →
       collect_set, hot buckets capped) — the shuffle carries id-sized
       band rows only, and with a precomputed standing index the
       per-ingest cost is new-batch-sized.
    4. Exact Jaccard ≥ ``threshold`` on the candidate pairs' shingle
       sets verifies; a new doc is near-dup iff its rep has any
       verified standing match, exact-dup iff its raw text hash exists
       in the standing corpus.

    Output: per-source ingest accounting over NEW docs — n_new_docs,
    n_exact_dup (raw-text identity), n_near_dup (verified near match,
    not exact), n_clean.  Deterministic (murmur/xxhash band keys,
    exact Jaccard verdicts) → pinned oracle, like q_dedup_minhash."""
    from pyspark.storagelevel import StorageLevel

    sided = docs.filter(F.col("n_chars") > 0).select(
        "doc_id",
        "source",
        "text",
        F.md5("text").alias("h"),
        (F.col("doc_id") % 2 == 0).alias("is_standing"),
    )
    # one scan, one group stage for BOTH sides' text-distinct reps;
    # members (id+source structs, never text) ride along so the per-doc
    # expansion at the end needs NO second text scan; multiple consumers
    # → persist, not lazy checkpoint (CLAUDE.md shared-lineage rule)
    groups = (
        sided.groupBy("h", "is_standing")
        .agg(
            F.min("doc_id").alias("gid"),
            F.first("text").alias("text"),
            F.collect_list(F.struct("doc_id", "source")).alias("members"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    reps = groups.select(F.col("gid").alias("doc_id"), "text")
    # shingle sets feed the signature pipeline AND the verify join
    sh = shingle_sets(reps).persist(StorageLevel.MEMORY_AND_DISK)
    if standing_bands is not None:
        bands = standing_bands
    else:
        # recompute path: band straight from the shared shingle relation
        # (no second text scan) — identical to standing_band_index's
        # output, which a deployment reads back from a snapshot instead
        bands = _band_explode(
            signatures_from_shingles(sh.filter(F.col("doc_id") % 2 == 0)),
            "gid",
        )
    new_bands = _band_explode(
        signatures_from_shingles(sh.filter(F.col("doc_id") % 2 == 1)),
        "new_gid",
    )
    buckets = (
        bands.groupBy("band", "band_key")
        .agg(F.array_sort(F.collect_set("gid")).alias("cands"))
        .filter(F.size("cands") <= INCR_NEAR_MAX_BUCKET)
    )
    cand_pairs = (
        new_bands.join(buckets, ["band", "band_key"])
        .select("new_gid", F.explode("cands").alias("st_gid"))
        .distinct()
    )
    sh_new = sh.select(
        F.col("doc_id").alias("new_gid"), F.col("sh").alias("sh_n")
    )
    sh_st = sh.select(
        F.col("doc_id").alias("st_gid"), F.col("sh").alias("sh_s")
    )
    inter = F.size(F.array_intersect("sh_n", "sh_s"))
    union = F.size(F.array_union("sh_n", "sh_s"))
    near_gids = (
        cand_pairs.join(sh_new, "new_gid")
        .join(sh_st, "st_gid")
        .filter(F.round(inter / union, 6) >= threshold)
        .select("new_gid")
        .distinct()
    )
    standing_h = groups.filter("is_standing").select("h")
    exact_h = (
        groups.filter(~F.col("is_standing"))
        .join(standing_h, "h", "semi")
        .select("h")
    )
    newd = (
        groups.filter(~F.col("is_standing"))
        .select(
            "h",
            F.col("gid").alias("new_gid"),
            F.explode("members").alias("_m"),
        )
        .select("h", "new_gid", F.col("_m.source").alias("source"))
        .join(exact_h.withColumn("_ex", F.lit(1)), "h", "left")
        .join(near_gids.withColumn("_nr", F.lit(1)), "new_gid", "left")
    )
    is_ex = F.col("_ex").isNotNull()
    is_nr = F.col("_nr").isNotNull() & ~is_ex
    return newd.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_new_docs"),
        F.sum(is_ex.cast("int")).cast("bigint").alias("n_exact_dup"),
        F.sum(is_nr.cast("int")).cast("bigint").alias("n_near_dup"),
        F.sum((~is_ex & ~is_nr).cast("int")).cast("bigint").alias("n_clean"),
    )


def q_incremental_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of :func:`incremental_near_dedup` (pinned oracle;
    the LSH band keys are Spark murmur/xxhash — not ANSI-expressible —
    and the verify is exact Jaccard, same determinism class as
    q_dedup_minhash)."""
    docs = spread_for_cpu(load_table(spark, sf_dir, "documents"), spark)
    return incremental_near_dedup(docs)


# ---------------------------------------------------------------------------
# Probabilistic record linkage (Fellegi–Sunter-style blocked scoring)
# ---------------------------------------------------------------------------

# Deterministic "dirty feed" derived from customer: one-third of keys are
# missing, some names carry a one-character typo, some balances drift.
LINK_DIRTY_DROP_MOD = 3  # custkey % 3 == 2 absent from the dirty feed
LINK_NAME_TYPO_MOD = 4  # custkey % 4 == 1 -> last char replaced with 'X'
LINK_BAL_DRIFT_MOD = 5  # custkey % 5 == 2 -> balance shifted +0.75
LINK_ID_OFFSET = 1_000_000
# Agreement/disagreement log-odds weights (exact binary fractions so the
# score sum is engine-exact) and the review threshold.
LINK_W_NAME, LINK_W_NAME_MISS = 3.0, -1.0
LINK_W_BAL, LINK_W_BAL_MISS = 2.0, -0.5
LINK_THRESHOLD = 2.5  # name agreement required; balance breaks ties


def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage (Fellegi–Sunter shape): match a
    deterministic "dirty CRM feed" (derived from customer with dropped
    rows, one-character name typos, and balance drift) back to the
    master by blocked pairwise scoring — name agreement = Levenshtein
    ≤ 1, balance agreement = |Δ| ≤ 1.0, each contributing a log-odds
    weight; pairs above threshold are emitted as candidate links.

    Scale shape: every pair above LINK_THRESHOLD must have name
    agreement (the weight algebra: a name miss caps the score at 1.0),
    and name agreement means Levenshtein ≤ 1 — so blocking by the
    DELETION NEIGHBORHOOD is exact: two strings within edit distance 1
    always share a single-deletion variant (substitution: delete the
    differing position from both; insertion: the longer's deletion IS
    the shorter; equality: the string itself).  Each side explodes into
    len+1 variant keys (linear in rows, independent of corpus size) and
    the join runs on (nationkey, mktsegment, variant), so candidates
    per row stay ~constant where a fixed (nationkey, mktsegment) block
    grows ∝ n and the pair space ∝ n² — measured 218 s at sf1 for the
    fixed-block form vs seconds for this one.  The variant join can
    surface a lev-2 pair (different deletion positions); the exact
    Levenshtein re-verify below keeps the output identical to the full
    blocked join, which is what the (unchanged, quadratic) DuckDB
    oracle still computes.

    Engine determinism: weights are exact binary fractions summed per
    row (no float aggregation); the balance-drift perturbation (+0.75)
    and the |Δ| ≤ 1.0 compare are exact IEEE ops on identical doubles.

    The customer scan is byte-small at every test SF (sf1's 150k rows
    are one ~20 MB parquet → ONE scan partition), but the deletion-
    neighborhood explode is CPU-bound string slicing (len+1 substrings
    per row, ~2.9M at sf1) — spread before it or one core does all of
    it (round-7 profile: the sf1 run spent its 13 s on single-task
    stages)."""
    cust = spread_for_cpu(load_table(spark, sf_dir, "customer"), spark)
    k = F.col("c_custkey")
    dirty = cust.filter(k % LINK_DIRTY_DROP_MOD != 2).select(
        (k + LINK_ID_OFFSET).alias("d_id"),
        F.when(
            k % LINK_NAME_TYPO_MOD == 1,
            F.concat(
                F.expr("substring(c_name, 1, length(c_name) - 1)"),
                F.lit("X"),
            ),
        )
        .otherwise(F.col("c_name"))
        .alias("d_name"),
        F.when(k % LINK_BAL_DRIFT_MOD == 2, F.col("c_acctbal") + 0.75)
        .otherwise(F.col("c_acctbal"))
        .alias("d_bal"),
        F.col("c_nationkey").alias("d_nation"),
        F.col("c_mktsegment").alias("d_segment"),
    )

    def _variants(col: str) -> F.Column:
        # the string plus every single-deletion of it — array_distinct
        # so equal-length duplicates (repeated chars) don't fan out
        return F.array_distinct(
            F.expr(
                f"concat(array({col}), transform(sequence(1, length({col})),"
                f" i -> concat(substring({col}, 1, i - 1),"
                f" substring({col}, i + 1, length({col})))))"
            )
        )

    master = cust.select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        "c_nationkey",
        "c_mktsegment",
        F.explode(_variants("c_name")).alias("variant"),
    )
    probe = dirty.select(
        "d_id",
        "d_name",
        "d_bal",
        "d_nation",
        "d_segment",
        F.explode(_variants("d_name")).alias("variant"),
    )
    pairs = (
        master.join(
            probe,
            (F.col("c_nationkey") == F.col("d_nation"))
            & (F.col("c_mktsegment") == F.col("d_segment"))
            & (master["variant"] == probe["variant"]),
        )
        .drop("variant")
        .distinct()
    )
    # bounded edit distance: O(len·k) per pair instead of O(len²), and
    # every output row has lev <= 1 so the -1 overflow sentinel never
    # reaches the result (kept rows carry the exact distance)
    lev = F.levenshtein(F.col("c_name"), F.col("d_name"), 2)
    name_agree = (lev >= 0) & (lev <= 1)
    bal_agree = F.abs(F.col("c_acctbal") - F.col("d_bal")) <= 1.0
    score = F.when(name_agree, F.lit(LINK_W_NAME)).otherwise(
        F.lit(LINK_W_NAME_MISS)
    ) + F.when(bal_agree, F.lit(LINK_W_BAL)).otherwise(F.lit(LINK_W_BAL_MISS))
    return (
        pairs.select(
            F.col("c_custkey").alias("master_key"),
            "d_id",
            lev.alias("name_lev"),
            score.alias("score"),
        )
        .filter(F.col("score") >= LINK_THRESHOLD)
    )
