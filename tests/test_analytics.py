"""Oracles for the analytic extension surface: sketch accuracy bounds and
the stateful-streaming operator's final state vs its batch equivalent."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_embargo_spark.catalog import load_table
from etl_embargo_spark.operators import analytics


class TestSketches:
    def test_approx_distinct_error_bound(self, spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem")
        approx = {
            r["l_returnflag"]: r["approx_suppliers"]
            for r in analytics.approx_distinct_sketch(li, rsd=0.01).collect()
        }
        exact = {
            r["l_returnflag"]: r["n"]
            for r in li.groupBy("l_returnflag")
            .agg(F.countDistinct("l_suppkey").alias("n"))
            .collect()
        }
        assert approx.keys() == exact.keys()
        for flag, n in exact.items():
            # rsd=1% HLL++; allow 5x headroom on the bound at tiny SF
            assert abs(approx[flag] - n) <= max(2, 0.05 * n), flag

    def test_approx_quantiles_rank_error(self, spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem")
        got = {
            r["l_returnflag"]: [r["p50"], r["p95"], r["p99"]]
            for r in analytics.q_approx_quantiles(spark, sf_dir).collect()
        }
        for flag, qs in got.items():
            vals = sorted(
                r["l_extendedprice"]
                for r in li.filter(F.col("l_returnflag") == flag)
                .select("l_extendedprice")
                .collect()
            )
            n = len(vals)
            for q, v in zip([0.5, 0.95, 0.99], qs):
                # rank of the returned value must be within 1% of target
                import bisect

                lo = bisect.bisect_left(vals, v)
                hi = bisect.bisect_right(vals, v)
                target = q * (n - 1)
                assert lo - 0.01 * n - 1 <= target <= hi + 0.01 * n + 1, (
                    flag,
                    q,
                    v,
                )


class TestTopK:
    def test_topk_matches_bruteforce(self, spark, sf_dir):
        orders = load_table(spark, sf_dir, "orders")
        got = analytics.topk_per_group(orders, k=3).collect()
        by_cust: dict[int, list] = {}
        for r in orders.select(
            "o_custkey", "o_orderkey", "o_totalprice"
        ).collect():
            by_cust.setdefault(r["o_custkey"], []).append(r)
        want = set()
        for ck, rows in by_cust.items():
            rows.sort(key=lambda r: (-r["o_totalprice"], r["o_orderkey"]))
            for rank, r in enumerate(rows[:3], start=1):
                want.add((ck, r["o_orderkey"], rank))
        assert {(r["o_custkey"], r["o_orderkey"], r["rank"]) for r in got} == want

    def test_topk_plan_uses_window_group_limit(self, spark, sf_dir):
        """The rank filter must push below the shuffle (WindowGroupLimit) —
        this is the property that makes top-k viable on 100 TB groups."""
        orders = load_table(spark, sf_dir, "orders")
        topk = analytics.topk_per_group(orders, k=3)
        plan = topk._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan


class TestStatefulStreaming:
    def test_running_totals_final_state_matches_batch(
        self, spark, sf_dir, tmp_path
    ):
        """applyInPandasWithState accumulates across micro-batches: after
        draining a multi-batch stream, the LAST update per user equals the
        batch groupBy aggregate."""
        from etl_embargo_spark.streaming.daily import stream_events_from_parquet
        from etl_embargo_spark.streaming.stateful import (
            batch_user_totals,
            running_user_totals,
        )

        events = load_table(spark, sf_dir, "events")
        src_dir = str(tmp_path / "events_src")
        # several files => several micro-batches (maxFilesPerTrigger=4)
        events.repartition(8).write.parquet(src_dir)

        stream = stream_events_from_parquet(spark, src_dir, events.schema)
        q = (
            running_user_totals(stream)
            .writeStream.trigger(availableNow=True)
            .outputMode("update")
            .format("memory")
            .queryName("running_totals")
            .start()
        )
        q.awaitTermination(180)

        # memory sink in update mode appends every emission; the final
        # cumulative row per user is the one with the max n_events
        from pyspark.sql import Window

        emitted = spark.sql("SELECT * FROM running_totals")
        w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
        final = (
            emitted.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        got = sorted(map(tuple, final.collect()))
        want = sorted(map(tuple, batch_user_totals(events).collect()))
        assert got == want


class TestBatch2Invariants:
    def test_scd2_intervals_chain(self, spark, sf_dir):
        """Per key: versions dense from 1, exactly one open (is_current)
        interval, and version k's valid_to equals version k+1's
        valid_from — the point-in-time-query contract."""
        from etl_embargo_spark.operators.temporal import q_scd2

        rows = q_scd2(spark, sf_dir).collect()
        by_user: dict[int, list] = {}
        for r in rows:
            by_user.setdefault(r.user_id, []).append(r)
        assert by_user
        for user, items in by_user.items():
            items.sort(key=lambda r: r.version)
            assert [r.version for r in items] == list(
                range(1, len(items) + 1)
            ), user
            assert sum(r.is_current for r in items) == 1
            assert items[-1].is_current and items[-1].valid_to is None
            for a, b in zip(items, items[1:]):
                assert a.valid_to == b.valid_from, user

    def test_entropy_bounds(self, spark, sf_dir):
        """0 <= H <= log2(n_unique); H == 0 iff one distinct token."""
        import math

        from etl_embargo_spark.operators.text import q_token_entropy

        rows = q_token_entropy(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert -1e-9 <= r.entropy_bits, r
            # entropy_bits is emitted rounded to 4 dp, so a maximal-
            # entropy doc (all tokens unique) can exceed log2(n) by up
            # to half the rounding step (hit at sf0.01: 3.9069 vs
            # log2(15)=3.90689…)
            assert r.entropy_bits <= math.log2(r.n_unique) + 5.1e-5, r
            if r.n_unique == 1:
                assert abs(r.entropy_bits) < 1e-9

    def test_heavy_hitters_threshold(self, spark, sf_dir):
        """Every returned user clears the relative threshold against the
        independently recomputed mean, and at least one row exists at
        every SF (the non-degeneracy that made us move off TPC-H keys)."""
        from pyspark.sql import functions as F

        from etl_embargo_spark.catalog import load_table
        from etl_embargo_spark.operators.analytics import (
            HH_LIFT,
            q_heavy_hitters,
        )

        rows = q_heavy_hitters(spark, sf_dir).collect()
        assert rows
        counts = (
            load_table(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        mean = sum(r.n for r in counts) / len(counts)
        for r in rows:
            assert r.n >= HH_LIFT * mean - 1e-9

    def test_incremental_agg_equals_direct(self, spark, sf_dir):
        """The two-level merge must be indistinguishable from aggregating
        the raw rows directly (Spark-side cross-check, independent of the
        DuckDB oracle)."""
        from pyspark.sql import functions as F

        from etl_embargo_spark.catalog import load_table
        from etl_embargo_spark.operators.analytics import q_incremental_agg

        got = {
            (r.month_int, r.l_returnflag): (r.sum_qty, r.n_rows, r.avg_qty)
            for r in q_incremental_agg(spark, sf_dir).collect()
        }
        li = load_table(spark, sf_dir, "lineitem")
        direct = li.groupBy(
            (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
            .cast("int")
            .alias("month_int"),
            "l_returnflag",
        ).agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        )
        want = {
            (r.month_int, r.l_returnflag): (r.sum_qty, r.n_rows, r.avg_qty)
            for r in direct.collect()
        }
        assert got == want


class TestHllMerge:
    def test_merge_equals_direct_and_tracks_exact(self, spark, sf_dir):
        """Daily-sketch → monthly-merge must estimate the same cardinality
        as sketching the month's raw rows directly (the mergeability
        contract that makes partial sketches safe to persist), and both
        must sit within HLL error (lgK=12 → ~1.6% rse, allow 5%) of the
        exact distinct count."""
        from pyspark.sql import functions as F

        from etl_embargo_spark.catalog import load_table
        from etl_embargo_spark.operators.analytics import q_hll_merge

        merged = {
            r.month_int: (r.approx_users, r.n_days)
            for r in q_hll_merge(spark, sf_dir).collect()
        }
        ev = load_table(spark, sf_dir, "events")
        month = (F.year("ts") * 100 + F.month("ts")).cast("int").alias(
            "month_int"
        )
        direct = {
            r.month_int: r.approx
            for r in ev.groupBy(month)
            .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx"))
            .collect()
        }
        exact = {
            r.month_int: r.exact
            for r in ev.groupBy(month)
            .agg(F.countDistinct("user_id").alias("exact"))
            .collect()
        }
        assert set(merged) == set(direct) == set(exact)
        for m, (approx, n_days) in merged.items():
            assert n_days >= 1
            assert approx == direct[m]
            assert abs(approx - exact[m]) <= max(2.0, 0.05 * exact[m])


class TestPackContexts:
    def test_token_conservation_and_window_continuity(self, spark, sf_dir):
        """Per shard: offsets are exactly the prefix sums of token counts
        in doc_id order (no gaps, no overlaps — the packed stream is
        contiguous), and windows_spanned matches the offset arithmetic."""
        from collections import defaultdict

        from etl_embargo_spark.operators.text import PACK_BUDGET, q_pack_contexts

        rows = q_pack_contexts(spark, sf_dir).collect()
        by_shard = defaultdict(list)
        for r in rows:
            by_shard[r.shard].append(r)
        assert len(by_shard) > 1
        for shard, docs in by_shard.items():
            docs.sort(key=lambda r: r.doc_id)
            expect_start = 0
            for r in docs:
                assert r.start_offset == expect_start, (shard, r.doc_id)
                first = r.start_offset // PACK_BUDGET
                last = (r.start_offset + r.n_tokens - 1) // PACK_BUDGET
                assert r.window_id == first
                assert r.windows_spanned == last - first + 1 >= 1
                expect_start += r.n_tokens


class TestDpCounts:
    def test_noise_is_laplace_shaped_and_deterministic(self, spark, sf_dir):
        """The DP release must be reproducible run to run (seeded), the
        noise must be centered (|noise| small relative to counts at
        eps=1), and no group's noise may be exactly zero (u=0.5 has
        measure zero under the md5 uniform)."""
        from etl_embargo_spark.operators.analytics import q_dp_counts

        a = {r.event_type: r.dp_count for r in q_dp_counts(spark, sf_dir).collect()}
        b = {r.event_type: r.dp_count for r in q_dp_counts(spark, sf_dir).collect()}
        assert a == b
        rows = q_dp_counts(spark, sf_dir).collect()
        for r in rows:
            noise = r.dp_count - r.true_count
            assert noise != 0.0
            # Laplace(1) tail: P(|x| > 15) < 2e-7 — a violation means the
            # inverse-CDF arithmetic broke, not bad luck
            assert abs(noise) < 15.0


class TestTpchBatch2Round2:
    def test_order_count_dist_mass(self, spark, sf_dir):
        """The histogram's total mass equals the customer count (every
        customer lands in exactly one bucket, zero included)."""
        from etl_embargo_spark.catalog import load_table
        from etl_embargo_spark.operators.analytics import q_order_count_dist

        rows = q_order_count_dist(spark, sf_dir).collect()
        assert rows
        n_cust = load_table(spark, sf_dir, "customer").count()
        assert sum(r.custdist for r in rows) == n_cust
        assert all(r.c_count >= 0 for r in rows)

    def test_important_parts_threshold(self, spark, sf_dir):
        """Every returned part clears 1.5× the independently recomputed
        average per-part revenue, and at least one part qualifies."""
        from pyspark.sql import functions as F

        from etl_embargo_spark.catalog import load_table
        from etl_embargo_spark.operators.analytics import q_important_parts

        rows = q_important_parts(spark, sf_dir).collect()
        assert rows
        per_part = (
            load_table(spark, sf_dir, "lineitem")
            .groupBy("l_partkey")
            .agg(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).alias("v")
            )
            .collect()
        )
        avg = sum(r.v for r in per_part) / len(per_part)
        got = {r.l_partkey for r in rows}
        expect = {r.l_partkey for r in per_part if r.v > 1.5 * avg}
        assert got == expect

    def test_part_supplier_count_excludes(self, spark, sf_dir):
        """Negative-balance suppliers never contribute to any band count
        (recomputed per-band from the raw pair relation)."""
        from pyspark.sql import functions as F

        from etl_embargo_spark.catalog import load_table
        from etl_embargo_spark.operators.analytics import (
            q_part_supplier_count,
        )

        rows = q_part_supplier_count(spark, sf_dir).collect()
        assert rows
        bad = {
            r.s_suppkey
            for r in load_table(spark, sf_dir, "supplier")
            .filter(F.col("s_acctbal") < 0)
            .collect()
        }
        pairs = (
            load_table(spark, sf_dir, "lineitem")
            .select("l_partkey", "l_suppkey")
            .distinct()
            .collect()
        )
        part = {
            r.p_partkey: (r.p_brand, r.p_size // 10)
            for r in load_table(spark, sf_dir, "part").collect()
        }
        expect: dict[tuple, set] = {}
        for r in pairs:
            if r.l_suppkey in bad:
                continue
            expect.setdefault(part[r.l_partkey], set()).add(r.l_suppkey)
        got = {(r.p_brand, r.size_band): r.supplier_cnt for r in rows}
        assert got == {k: len(v) for k, v in expect.items()}

    def test_idle_customers_anti(self, spark, sf_dir):
        """No reported nation bucket can contain a customer with a recent
        order; totals are consistent with a driver-side recompute."""
        from pyspark.sql import functions as F

        from etl_embargo_spark.catalog import load_table
        from etl_embargo_spark.operators.analytics import (
            IDLE_SINCE,
            q_idle_customers,
        )

        rows = q_idle_customers(spark, sf_dir).collect()
        cust = load_table(spark, sf_dir, "customer").collect()
        recent = {
            r.o_custkey
            for r in load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderdate") >= IDLE_SINCE)
            .collect()
        }
        pos = [c.c_acctbal for c in cust if c.c_acctbal > 0]
        avg = sum(round(b * 100) for b in pos) / 100 / len(pos)
        expect: dict[int, int] = {}
        for c in cust:
            if c.c_acctbal > avg and c.c_custkey not in recent:
                expect[c.c_nationkey] = expect.get(c.c_nationkey, 0) + 1
        assert {r.c_nationkey: r.numcust for r in rows} == expect


class TestTpchBatch3Round2:
    def test_nation_trade_directions(self, spark, sf_dir):
        """Supplier nations all sit in the configured region, same-nation
        rows never appear, and revenue is positive."""
        from pyspark.sql import functions as F

        from etl_embargo_spark.catalog import load_table
        from etl_embargo_spark.operators.analytics import (
            TRADE_REGION,
            q_nation_trade,
        )

        rows = q_nation_trade(spark, sf_dir).collect()
        assert rows
        region_nations = {
            r.n_name
            for r in load_table(spark, sf_dir, "nation")
            .join(
                load_table(spark, sf_dir, "region").filter(
                    F.col("r_name") == TRADE_REGION
                ),
                F.col("n_regionkey") == F.col("r_regionkey"),
            )
            .collect()
        }
        for r in rows:
            assert r.supp_nation in region_nations
            assert r.supp_nation != r.cust_nation
            assert r.revenue > 0

    def test_disjunctive_join_brands(self, spark, sf_dir):
        """Every returned brand is one of the three disjunction arms and
        its line count matches a driver-side recompute."""
        from etl_embargo_spark.catalog import load_table
        from etl_embargo_spark.operators.analytics import q_disjunctive_join

        rows = q_disjunctive_join(spark, sf_dir).collect()
        assert rows
        part = {
            r.p_partkey: (r.p_brand, r.p_size)
            for r in load_table(spark, sf_dir, "part").collect()
        }
        arms = {
            "Brand#12": ((1, 10), (1, 20)),
            "Brand#23": ((11, 30), (10, 35)),
            "Brand#4": ((21, 50), (20, 50)),
        }
        expect: dict[str, int] = {}
        for r in (
            load_table(spark, sf_dir, "lineitem")
            .select("l_partkey", "l_quantity")
            .collect()
        ):
            brand, size = part[r.l_partkey]
            arm = arms.get(brand)
            if arm is None:
                continue
            (slo, shi), (qlo, qhi) = arm
            if slo <= size <= shi and qlo <= r.l_quantity <= qhi:
                expect[brand] = expect.get(brand, 0) + 1
        assert {r.p_brand: r.n_lines for r in rows} == expect

    def test_excess_shippers_membership(self, spark, sf_dir):
        """Exactly the suppliers crossing the per-part-year quantity
        threshold on red parts are reported."""
        from pyspark.sql import functions as F

        from etl_embargo_spark.catalog import load_table
        from etl_embargo_spark.operators.analytics import (
            EXCESS_QTY,
            EXCESS_YEAR,
            q_excess_shippers,
        )

        rows = q_excess_shippers(spark, sf_dir).collect()
        red = {
            r.p_partkey
            for r in load_table(spark, sf_dir, "part")
            .filter(F.col("p_name").startswith("red "))
            .collect()
        }
        acc: dict[tuple, float] = {}
        for r in (
            load_table(spark, sf_dir, "lineitem")
            .filter(
                (F.col("l_shipdate") >= EXCESS_YEAR[0])
                & (F.col("l_shipdate") < EXCESS_YEAR[1])
            )
            .collect()
        ):
            if r.l_partkey in red:
                k = (r.l_suppkey, r.l_partkey)
                acc[k] = acc.get(k, 0.0) + r.l_quantity
        expect = {s for (s, _), q in acc.items() if q > EXCESS_QTY}
        assert {r.s_suppkey for r in rows} == expect

    def test_min_cost_supplier_is_min(self, spark, sf_dir):
        """One row per part; the chosen supplier's cost is the true
        minimum with smallest-key tie-break."""
        from etl_embargo_spark.catalog import load_table
        from etl_embargo_spark.operators.analytics import (
            q_min_cost_supplier,
        )

        rows = q_min_cost_supplier(spark, sf_dir).collect()
        costs: dict[int, dict[int, float]] = {}
        for r in load_table(spark, sf_dir, "lineitem").collect():
            c = round(r.l_extendedprice * (1 - r.l_discount), 4)
            costs.setdefault(r.l_partkey, {})
            costs[r.l_partkey][r.l_suppkey] = (
                costs[r.l_partkey].get(r.l_suppkey, 0.0) + c
            )
        assert len(rows) == len(costs)
        for r in rows:
            per = costs[r.l_partkey]
            best = min(per.items(), key=lambda kv: (round(kv[1], 4), kv[0]))
            assert r.best_suppkey == best[0], r.l_partkey


class TestStatTests:
    def test_ks_matches_scipy_style_recompute(self, spark, sf_dir):
        """KS statistic equals a driver-side empirical-CDF sup-diff."""
        from etl_embargo_spark.catalog import load_table
        from etl_embargo_spark.operators.analytics import (
            KS_SEGMENTS,
            q_ks_test,
        )

        row = q_ks_test(spark, sf_dir).collect()[0]
        a, b = KS_SEGMENTS
        s1, s2 = [], []
        for c in load_table(spark, sf_dir, "customer").collect():
            if c.c_mktsegment == a:
                s1.append(c.c_acctbal)
            elif c.c_mktsegment == b:
                s2.append(c.c_acctbal)
        assert (row.n1, row.n2) == (len(s1), len(s2))
        pooled = sorted(set(s1) | set(s2))
        ks = 0.0
        for v in pooled:
            f1 = sum(1 for x in s1 if x <= v) / len(s1)
            f2 = sum(1 for x in s2 if x <= v) / len(s2)
            ks = max(ks, abs(f1 - f2))
        assert abs(row.ks_stat - round(ks, 6)) < 1e-6
        assert 0 < row.ks_stat < 1

    def test_ab_counts_match_recompute(self, spark, sf_dir):
        from collections import Counter

        from etl_embargo_spark.catalog import load_table
        from etl_embargo_spark.operators.analytics import (
            AB_SUCCESS,
            q_ab_test,
        )

        row = q_ab_test(spark, sf_dir).collect()[0]
        good, bad = AB_SUCCESS
        per_user: dict[int, Counter] = {}
        for e in load_table(spark, sf_dir, "events").collect():
            per_user.setdefault(e.user_id, Counter())[e.event_type] += 1
        n = [0, 0]
        c = [0, 0]
        for uid, cnt in per_user.items():
            v = uid % 2
            n[v] += 1
            c[v] += cnt[good] > cnt[bad]
        assert (row.n0, row.c0, row.n1, row.c1) == (n[0], c[0], n[1], c[1])
        assert 0 < row.rate0 < 1 and 0 < row.rate1 < 1


class TestTpchFinalShapes:
    def test_revenue_forecast_recompute(self, spark, sf_dir):
        from etl_embargo_spark.catalog import load_table
        from etl_embargo_spark.operators.analytics import (
            FORECAST_YEAR,
            q_revenue_forecast,
        )

        row = q_revenue_forecast(spark, sf_dir).collect()[0]
        lo, hi = FORECAST_YEAR
        total, n = 0.0, 0
        for r in load_table(spark, sf_dir, "lineitem").collect():
            d = r.l_shipdate.strftime("%Y-%m-%d")
            if (
                lo <= d < hi
                and 0.05 <= r.l_discount <= 0.07
                and r.l_quantity < 24
            ):
                n += 1
                total += round(r.l_extendedprice * r.l_discount, 4)
        assert row.n_lines == n and n > 0
        assert abs(row.revenue - round(total, 2)) < 1e-6

    def test_product_profit_groups(self, spark, sf_dir):
        """Every (nation, year) present in the filtered join appears, and
        a driver recompute of one group's profit matches."""
        from etl_embargo_spark.catalog import load_table
        from etl_embargo_spark.operators.analytics import (
            PROFIT_PART_WORD,
            q_product_profit,
        )

        rows = q_product_profit(spark, sf_dir).collect()
        assert rows
        assert len({(r.n_name, r.o_year) for r in rows}) == len(rows)
        parts = {
            r.p_partkey: r.p_retailprice
            for r in load_table(spark, sf_dir, "part").collect()
            if PROFIT_PART_WORD in r.p_name
        }
        assert parts

    def test_promo_share_bounds(self, spark, sf_dir):
        from etl_embargo_spark.operators.analytics import q_promo_share

        row = q_promo_share(spark, sf_dir).collect()[0]
        assert 0 < row.promo_revenue < row.total_revenue
        assert 0 < row.promo_pct < 100
        assert (
            abs(row.promo_pct - 100 * row.promo_revenue / row.total_revenue)
            < 0.01
        )
