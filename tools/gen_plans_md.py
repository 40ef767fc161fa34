#!/usr/bin/env python
"""Generate PLANS.md: the formatted physical plan for each headline query
plus the plan properties we engineered for (and guard in
tests/test_plan_shapes.py).  Run after registry changes:

    python tools/gen_plans_md.py
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Queries whose plans carry the scale story, with the property each plan
# must exhibit at 100 TB.
SHOWCASE: dict[str, str] = {
    "q_split_partition": (
        "Flagship classifier: single fact scan, whitelist dim broadcast "
        "(BroadcastHashJoin, no fact-side Exchange), all scalar work in "
        "one WholeStageCodegen span."
    ),
    "q_pricing_summary": (
        "Shuffle agg: partial HashAggregate map-side, ONE Exchange "
        "carrying O(groups) rows, final HashAggregate."
    ),
    "q_topk_per_group": (
        "WindowGroupLimit pushdown: each map task truncates to k rows per "
        "group before the shuffle — the exchange carries O(groups * k)."
    ),
    "q_join_revenue": (
        "Multi-join: filtered customer dim broadcast; LIMIT 10 is "
        "TakeOrderedAndProject (per-partition heaps), never a global sort."
    ),
    "q_dedup_minhash": (
        "LSH dedup: shingle stage persisted once (InMemoryTableScan), "
        "bucket-groupBy pair generation (no self-join), verify joins "
        "broadcast the persisted shingle relation."
    ),
    "q_tfidf": (
        "Composition: one exploded scan feeds tf and df aggs, corpus size "
        "rides a broadcast one-row cross join, per-doc top-3 is "
        "WindowGroupLimit-pruned."
    ),
    "q_incremental_agg": (
        "Two-level re-aggregation: daily partials merge into monthly "
        "finals (avg derived from merged sums) — one raw scan, partial+ "
        "final HashAggregate at each level."
    ),
    "q_hash_sample": (
        "Deterministic sampling: pure narrow filter, ZERO Exchanges — a "
        "sample that shuffles defeats its purpose."
    ),
    "q_asof_join": (
        "As-of join: union + window last-non-null composition, one "
        "shuffle on the join key, no range self-join blowup."
    ),
    "q_scd2": (
        "SCD-2 intervals: lead + row_number share one Window sort, one "
        "Exchange on the key."
    ),
    "q_copurchase": (
        "Basket pair mining: bucket-groupBy pair expansion over ONE "
        "lineitem scan (a self-join would scan+shuffle twice); top-50 is "
        "TakeOrderedAndProject."
    ),
    "q_retention": (
        "Cohort retention: per-user cohort side broadcast onto the "
        "distinct user-week activity stream; no fact-side shuffle for "
        "the join."
    ),
    "q_date_spine": (
        "Gap fill: the day spine is generated in-engine (sequence over "
        "broadcast one-row bounds) and every join side is broadcast — "
        "the fact table shuffles once for the count, never for the fill."
    ),
    "q_null_anti": (
        "NOT IN: Catalyst's single-column null-aware anti join "
        "(HashedRelationBroadcastMode(..., true)) — three-valued-logic "
        "correct without a driver-side null check, subquery broadcast."
    ),
    "q_concurrency": (
        "Sweep-line interval overlap: boundary-point union is map-side "
        "only; ONE Exchange total (the window's partitionBy feeds the "
        "groupBy on the same key, no re-shuffle)."
    ),
    "q_event_paths": (
        "Path mining: stacked lead() steps collapse into ONE Window node "
        "(one per-user sort regardless of path length); top-10 is "
        "TakeOrderedAndProject."
    ),
    "q_new_vs_returning": (
        "Cohorting in two Exchanges: collect_set(day) per user dedups "
        "pairs AND yields first_day in the same shuffle — the naive "
        "distinct→agg→join→agg chain costs four."
    ),
    "q_item_cosine": (
        "Item-item cosine CF: pair counts from the single-scan bucket "
        "expansion; both degree joins broadcast (no SortMergeJoin "
        "anywhere)."
    ),
    "q_group_sample": (
        "Fixed-k-per-group sampling: row_number over md5 order compiles "
        "to WindowGroupLimit — the exchange carries O(groups * k)."
    ),
    "q_rolling_dau": (
        "Rolling distinct actives: constant-factor contribution "
        "explosion then per-day count-distinct — no range self-join, no "
        "giant collect_set window."
    ),
    "q_local_volume": (
        "TPC-H Q5 shape: the entire dimension chain broadcasts; the only "
        "shuffle is lineitem⋈orders on orderkey, and the nation-sized "
        "aggregate rides map-side partials."
    ),
    "q_large_orders": (
        "TPC-H Q18 shape: HAVING-filtered per-order aggregate is "
        "outlier-sized, so BOTH remaining joins broadcast — no exchange "
        "touches orders or customer after the one agg shuffle."
    ),
    "q_hll_merge": (
        "Mergeable sketches: daily HLL partials union-merged to monthly "
        "— the rollup re-aggregates KB-sized sketches from ONE raw scan, "
        "never re-reading events per grain."
    ),
    "q_pack_contexts": (
        "Sequence packing: tokenizer runs below the single shard "
        "exchange, so only (doc_id, shard, n_tokens) ints cross the "
        "wire; window cumsum assigns context windows with no UDF."
    ),
    "q_debounce": (
        "Debounce: one user_id exchange, one window sort; both lag() "
        "columns share the window, and the filter is local to the "
        "per-user ordered scan."
    ),
    "q_pareto": (
        "Skyline: per-month local dominance prune (parallel) then the "
        "same prefix-max over survivors — the single-partition global "
        "pass touches O(months × frontier), never a quadratic self-join."
    ),
    "q_small_quantity": (
        "Q17 correlated subquery, decorrelated: brand keys broadcast-"
        "prune lineitem FIRST, the correlated AVG becomes a window over "
        "the pruned slice — one fact scan end to end."
    ),
    "q_blame_supplier": (
        "Q21 exists/not-exists pair as ONE per-order conditional "
        "aggregation — one orderkey shuffle replaces two fact self-joins."
    ),
    "q_top_supplier": (
        "Q15 view-max: scalar MAX via window over the built aggregate — "
        "structural sharing; the scalar-subquery form would scan the "
        "fact twice (Spark 4 does not reuse the exchange)."
    ),
    "q_market_share": (
        "Q8 ratio: numerator and denominator in ONE fact pass "
        "(conditional aggregation); every dimension leg broadcasts."
    ),
    "q_priority_count": (
        "Q4 EXISTS with a fact-sized right side: shuffled LEFT SEMI "
        "co-partitioned on orderkey — first-match short-circuit, no "
        "pair explosion, no distinct pre-pass."
    ),
    "q_attribution": (
        "Last-touch attribution: channel carry via last-ignorenulls "
        "over a PRECEDING-only frame — one window, no self-as-of-join."
    ),
    "q_bpe_pairs": (
        "BPE pair counts: corpus collapses to the zipf-bounded "
        "vocabulary BEFORE the pair explosion; both aggs map-side "
        "combined, top-50 heap-based."
    ),
    "q_ri_audit": (
        "RI audit: four broadcast LEFT ANTI probes — facts scanned, "
        "never shuffled; per-edge counts collapse map-side."
    ),
    "q_incremental_dedup": (
        "Cross-run ingest gate: LEFT ANTI on md5 hashes — 32 bytes/row "
        "across the wire, text never reaches the join."
    ),
    "q_mutual_info": (
        "Categorical MI: marginals and total are WINDOW sums over the "
        "joint cell relation — one corpus scan (separate aggregate "
        "branches would re-execute it per marginal)."
    ),
    "q_perplexity": (
        "Unigram-LM quality filter: zipf-bounded vocabulary broadcasts "
        "onto the token stream; quantize-then-exact-sum keeps the bits "
        "total engine-deterministic."
    ),
    "q_funnel_steps": (
        "3-step ordered funnel: stacked unordered window minima on one "
        "user partition — one exchange, no sort, no per-step self-joins."
    ),
    "q_basket_lift": (
        "Association lift: bucket-groupBy pair generation (no self-"
        "join); part-count and one-row-total relations broadcast."
    ),
    "q_order_count_dist": (
        "Q13 outer-join histogram: orders pre-aggregate to one row per "
        "customer BELOW the join — the outer join carries O(customers), "
        "never raw order rows."
    ),
    "q_important_parts": (
        "Q11 share-of-total HAVING: global total+count via empty window "
        "OVER the part aggregate — one fact scan, no scalar subquery "
        "(Spark 4 re-executes duplicated subquery subtrees)."
    ),
    "q_excess_shippers": (
        "Q20 nested semi chain: red-part dim broadcast into the "
        "year-pruned fact, qualifying supplier keys broadcast back as "
        "LEFT SEMI — the fact is scanned once, nothing sort-merges."
    ),
    "q_min_cost_supplier": (
        "Q2 correlated-min decorrelated: row_number over the (part, "
        "supp) cost aggregate — single fact scan, no rejoin, "
        "exact-decimal ordering."
    ),
    "q_triangles": (
        "Triangle census: degree-orientation caps wedge fan-out at "
        "O(m^1.5); edge list localCheckpoint'ed (Scan ExistingRDD) so "
        "six consumers share one pair expansion."
    ),
    "q_repetition_filter": (
        "Gopher repetition gate: two explode->agg passes (Generate x2), "
        "map-side partials, doc-sized join — no position self-join."
    ),
    "q_ols": (
        "Closed-form OLS: ONE fact scan collapsing to 10 co-moment sums "
        "per group (partial HashAggregate map-side); the Cramer solve is "
        "a projection over the group-count-sized relation."
    ),
    "q_winsorize": (
        "Winsorize: rank window for discrete percentile bounds, tiny "
        "bounds relation broadcast back (BroadcastHashJoin) — the clip "
        "pass never shuffles the scan."
    ),
    "q_pmi": (
        "PMI collocations: corpus collapses to vocab-sized unigram/bigram "
        "relations; both marginal joins are BroadcastHashJoin — no "
        "token-level shuffle after the counts."
    ),
    "q_itemsets3": (
        "A-priori triples: baskets collapse once, C(k,3) expansion runs "
        "array-side inside codegen — no self-join ever touches the fact; "
        "top-k is TakeOrderedAndProject."
    ),
    "q_gini": (
        "Gini: rank window + both sums over the per-customer aggregate "
        "only; exact-decimal terms until one final division."
    ),
    "q_kmv_overlap": (
        "KMV overlap sketch: one log scan builds both population "
        "sketches (explode tags + WindowGroupLimit per pop, lazily "
        "checkpointed); one audit scan — consumers never re-scan."
    ),
    "q_weighted_sample": (
        "Systematic PPS sample: one Exchange on source for the prefix-sum "
        "window; integer threshold-crossing filter — no random state, no "
        "driver involvement."
    ),
    "q_feature_table": (
        "ML training-table composition: one events scan collapses to the "
        "user grain (lazily checkpointed for its two consumers), the "
        "favorite-type/fold encoding cells broadcast back — features, "
        "label, split and leakage-safe target encoding in ONE job."
    ),
    "q_rrf": (
        "Hybrid retrieval fusion: every model-side join (query vector, "
        "rank lists, corpus stats) broadcast; final top-k is "
        "TakeOrderedAndProject; decimal-quantized inner products make "
        "ranks engine-exact."
    ),
    "q_bootstrap_ci": (
        "Poisson bootstrap: spread_for_cpu widens the byte-sized scan, "
        "the x200 explode partial-aggregates map-side straight to the "
        "B-row replicate relation."
    ),
    "q_spatial_join": (
        "Spatial radius join: cell blocking + 3x3 replication + in-array "
        "pair expansion — one scan, zero self-joins; cost is sum of "
        "cell^2, never points^2."
    ),
    "q_theilsen": (
        "Robust regression: the quadratic pair expansion is a "
        "BroadcastNestedLoopJoin over the <=366-day aggregate (lazily "
        "checkpointed, shared by three consumers) — never raw rows."
    ),
    "q_stump": (
        "Tree-split search: raw rows collapse to the per-(feature, value) "
        "aggregate before any window; the per-feature argmax is "
        "WindowGroupLimit — the exchange never carries raw rows."
    ),
    "q_rolling_beta": (
        "Moving regression: five trailing co-moment sums in ONE WindowExec "
        "pass over the per-(priority, day) aggregate; exact decimal "
        "accumulation, single final division."
    ),
    "q_hierarchy_rollup": (
        "Recursive CTE (Spark 4 WITH RECURSIVE): log4(n) iterations, each "
        "one hash join of the relation against the previous frontier — "
        "the frontier stays broadcastable at any scale."
    ),
    "q_record_linkage": (
        "Blocked probabilistic linkage: pair scoring confined to "
        "(nation, segment) blocks — one shuffle per side, Levenshtein in "
        "whole-stage codegen, never a global cross join."
    ),
    "q_weighted_median": (
        "Weighted quantile: cumulative weights over the per-price "
        "aggregate; the crossing pick is a WindowGroupLimit rank filter."
    ),
    "q_interarrival": (
        "Gap statistics: the lag-window gap relation is persisted and "
        "shared by the mean rollup and the median rank-selection — one "
        "events scan, cache reads after."
    ),
    "q_join_size": (
        "Pre-join cost model: |A JOIN B| computed from joins of per-key "
        "COUNT relations — the fact tables never meet; every join input "
        "is an aggregate output."
    ),
    "q_equidepth": (
        "ANALYZE statistics: integer cumulative-count bucketing over the "
        "collapsed per-value relation — the CBO histogram build without "
        "percentile interpolation."
    ),
    "q_table_checksum": (
        "Migration fingerprint: commutative per-row hash sum — pure "
        "projection into one map-side-combined global aggregate per "
        "table, order-independent by construction."
    ),
    "q_ann_ivf": (
        "Job-free IVF ANN: in-kernel seeded centroid assignment "
        "(MapInPandas over the one scan), probe set and query vector as "
        "BROADCAST one-row/nprobe-row relations, TakeOrderedAndProject "
        "top-k — zero driver-side jobs at build, no cross join."
    ),
    "q_substr_dedup": (
        "ExactSubstr window-hash scan: gram relation persisted once "
        "(InMemoryTableScan under all 3 consumers), per-gram doc-"
        "frequency map-side combined, dup probe is a hash join on the "
        "16-byte gram key — documents themselves never shuffle."
    ),
    "q_knn_join": (
        "LSH kNN self-join: candidates from bucket groupBy-expand (no "
        "self-join of the bucketed relation), exact cosine Arrow-batched "
        "on candidates only, per-vector rank window hits WindowGroupLimit."
    ),
    # r9-r12 rewrites (VERDICT r11 #5): the plans below changed shape
    # after PLANS.md's last regen (r8) — each property is what the
    # rewrite bought and what the guards pin.
    "q_kcore": (
        "Delta-peel k-core (r11): ONE full degree aggregate, then "
        "per-wave decrements over only dropped nodes' incident edges "
        "(edges joined to a BROADCAST drop set) — total aggregation "
        "O(2E) regardless of peel rounds; the rollup reads the "
        "node-sized converged state, zero edge re-filter passes."
    ),
    "q_hits": (
        "Engine-exact HITS rounds (r11): per round the node-sized raw "
        "sums are checkpointed FIRST and the max-normalizer derives "
        "from the checkpoint (no duplicated aggregate subtree — Spark 4 "
        "reuses no exchanges), scores quantized to 12-dp integers so "
        "bigint sums keep whole-stage codegen."
    ),
    "q_conformal": (
        "Split-conformal intervals: rank identity derived via exact "
        "Fraction arithmetic into both engines; calibration scores one "
        "shuffle, quantile via per-group order statistics — no window "
        "over the full fact."
    ),
    "q_decontaminate_semantic": (
        "Semantic eval-decontamination (r11): capped eval set BROADCASTs "
        "(corpus never shuffles), dot products as int-scaled bigint sums "
        "(merge-order-exact AND codegen-fast; decimal form measured 2x), "
        "corpus scan spread before the x64-eval expansion."
    ),
    "q_dedup_clusters": (
        "Connected components (r11): pointer-doubling min-label rounds "
        "over a checkpointed node-sized label relation with BROADCAST "
        "label joins — the edge relation never re-shuffles per round."
    ),
    "q_pagerank": (
        "PageRank setup (r12): the degree aggregate is checkpointed ONCE "
        "and the node set, node count, and weighted-edge broadcast all "
        "derive from the checkpoint (was 3 full re-aggregations — Spark "
        "4 reuses no exchanges across duplicated subtrees); per-round "
        "one broadcast join + one node-sized aggregate over few fat "
        "key-partitioned edge partitions."
    ),
    "q_dedup_levenshtein": (
        "Streamed bit-parallel Levenshtein verify (r12): bucket-local "
        "FlatMapGroupsInPandas kernel — pair enumeration/prefilter in "
        "32k-pair chunks, Myers-style banded DP (64 diagonals in one "
        "uint64) in 16k-pair chunks, in-kernel exact-text collapse; "
        "peak in-kernel state bounded at any SF, no pair join-backs."
    ),
    "q_incremental_dedup_near": (
        "Cross-run near-dup gate (r12): standing corpus banded ONCE "
        "(snapshot-manifest relation), only the NEW batch is shingled "
        "and banded per ingest; candidates from a band-key join against "
        "capped standing buckets — the only corpus-sized cost is the "
        "one-time index build, the per-ingest shuffle is new-batch-sized."
    ),
    "q_dbscan": (
        "Tile-contraction DBSCAN (r10, tiles enlarged r12): exactly-once "
        "cell-blocked pair expansion, per-tile union-find in-kernel "
        "(constant ~3.9k points/tile at the density-pinned eps), "
        "min-label loop only over the contracted cross-tile boundary "
        "graph (24 rounds flat -> 3 with 64-cell tiles)."
    ),
}

HEADER = """# PLANS — physical-plan showcase

Auto-generated by `tools/gen_plans_md.py` (local[8], sf0.001 inputs — the
plan SHAPE is scale-invariant; only statistics differ at 100 TB).  Each
section states the property the plan must keep (guarded in
`tests/test_plan_shapes.py`) followed by `explain("formatted")` output.
"""


def main() -> None:
    from pyspark.sql import SparkSession

    from etl_embargo_spark import registry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.001"
    qmap = registry.queries()
    out = [HEADER]
    for name, why in SHOWCASE.items():
        df = qmap[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out.append(f"## {name}\n\n{why}\n\n```\n{plan.rstrip()}\n```\n")
    Path(_REPO_ROOT, "PLANS.md").write_text("\n".join(out))
    print(f"PLANS.md: {len(SHOWCASE)} plans")


if __name__ == "__main__":
    main()
