"""Scale-property tests: partition pruning on the routed write, dynamic
overwrite idempotency, and salted-join equivalence — the behaviors that
make the engine viable at 100 TB, checked at toy SF."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_embargo_spark.catalog import load_table
from etl_embargo_spark.operators.skew import salted_join
from etl_embargo_spark.sinks.routed_write import write_routed


class TestRoutedWrite:
    def test_partition_pruned_read(self, spark, sf_dir, tmp_path):
        """Reading one visibility side of the routed write must prune at
        the partition level (the reference's prefix-pruned listing,
        embargo.go:265-267, as Spark partition pruning)."""
        from etl_embargo_spark.operators.embargo import split_partition

        out = str(tmp_path / "routed")
        classified = split_partition(spark, sf_dir)
        write_routed(classified, out)

        pub = spark.read.parquet(out).filter(F.col("visibility") == "public")
        plan = pub._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(visibility" in plan
        # pruning is semantic too: counts match the pre-write classification
        want = classified.filter(F.col("visibility") == "public").count()
        assert pub.count() == want

    def test_dynamic_overwrite_rerun_converges(self, spark, sf_dir, tmp_path):
        """ST3: rerunning the same day's write replaces its partitions
        in-place — same rows after 1 write and after 2."""
        from etl_embargo_spark.operators.embargo import split_partition

        out = str(tmp_path / "routed")
        classified = split_partition(spark, sf_dir)
        write_routed(classified, out)
        first = spark.read.parquet(out).count()
        write_routed(classified, out)  # rerun
        assert spark.read.parquet(out).count() == first


class TestSaltedJoin:
    def test_matches_plain_join(self, spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_suppkey"
        )
        sup = load_table(spark, sf_dir, "supplier").select(
            F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
        )
        got = salted_join(li, sup, key="l_suppkey", n_salts=8)
        want = li.join(sup, "l_suppkey")
        key = ["l_orderkey", "l_linenumber", "l_suppkey", "s_nationkey"]
        assert sorted(map(tuple, got.select(*key).collect())) == sorted(
            map(tuple, want.select(*key).collect())
        )

    def test_salt_is_deterministic(self, spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_suppkey"
        )
        sup = load_table(spark, sf_dir, "supplier").select(
            F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
        )
        a = salted_join(li, sup, key="l_suppkey").count()
        b = salted_join(li, sup, key="l_suppkey").count()
        assert a == b


class TestRecommendedConf:
    def test_local_floor(self):
        from etl_embargo_spark.session import recommended_conf

        conf = recommended_conf(60 * 1024 * 1024, executors=1,
                                cores_per_executor=32)
        assert conf["spark.sql.shuffle.partitions"] == "32"

    def test_scales_with_input(self):
        from etl_embargo_spark.session import recommended_conf

        tb = 1024**4
        conf = recommended_conf(100 * tb, executors=1000,
                                cores_per_executor=8)
        parts = int(conf["spark.sql.shuffle.partitions"])
        # 50 TB shuffled / 128 MB ≈ 409600 reduce tasks
        assert 300_000 <= parts <= 500_000
        assert parts >= 8000  # never below total cores


class TestBucketedJoin:
    def test_bucketed_tables_join_without_exchange(self, spark, sf_dir, tmp_path):
        """Pre-bucketing both sides on the join key removes the shuffle
        entirely — the co-located join pattern for repeated fact-fact joins
        at 100 TB (bucket count pinned; Exchange-free plan asserted)."""
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        (
            li.write.mode("overwrite")
            .option("path", str(tmp_path / "li_b"))
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("li_b")
        )
        (
            orders.withColumnRenamed("o_orderkey", "l_orderkey")
            .write.mode("overwrite")
            .option("path", str(tmp_path / "orders_b"))
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("orders_b")
        )
        a = spark.table("li_b")
        b = spark.table("orders_b")
        # disable broadcast so the only shuffle-avoidance is the bucketing
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, "l_orderkey")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert joined.count() == li.join(
                orders, li.l_orderkey == orders.o_orderkey
            ).count()
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
            spark.sql("DROP TABLE IF EXISTS li_b")
            spark.sql("DROP TABLE IF EXISTS orders_b")


class TestErrorPaths:
    def test_bad_sf_dir_fails_cleanly(self, spark):
        import pytest
        from pyspark.errors.exceptions.captured import AnalysisException

        from etl_embargo_spark.catalog import load_table

        with pytest.raises(AnalysisException):
            load_table(spark, "/root/testdata/sf-nonexistent", "lineitem").collect()

    def test_unknown_table_is_keyerror(self, spark, sf_dir):
        import pytest

        from etl_embargo_spark.catalog import load_table

        with pytest.raises(KeyError):
            load_table(spark, sf_dir, "nope")


class TestDatePartitionPruning:
    def test_day_partitioned_layout_prunes_by_date(self, spark, sf_dir, tmp_path):
        """The reference's per-day prefix scan (embargo.go:265-267) as a
        date-partitioned layout: a one-day filter must prune to that
        partition's files only."""
        events = load_table(spark, sf_dir, "events").withColumn(
            "event_date", F.to_date("ts")
        )
        out = str(tmp_path / "by_day")
        events.write.partitionBy("event_date").parquet(out)

        all_days = spark.read.parquet(out)
        one_day = all_days.filter(F.col("event_date") == "2024-01-02")
        plan = one_day._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(event_date" in plan
        # semantic: matches the unpartitioned filter
        want = events.filter(F.col("event_date") == "2024-01-02").count()
        assert one_day.count() == want


class TestDynamicPartitionPruning:
    def test_join_driven_pruning_subquery(self, spark, sf_dir, tmp_path):
        """Dynamic partition pruning: when the partition column is joined
        to a FILTERED dim, Catalyst injects a runtime pruning subquery on
        the fact scan — at 100 TB this is what turns 'join facts to this
        week's dim rows' into a scan of 7 partitions instead of all of
        them.  Static pruning can't do it: the partition values are only
        known after the dim filter runs."""
        events = load_table(spark, sf_dir, "events").withColumn(
            "event_date", F.to_date("ts")
        )
        out = str(tmp_path / "dpp_by_day")
        events.write.partitionBy("event_date").parquet(out)
        fact = spark.read.parquet(out)

        dim = (
            events.select("event_date")
            .distinct()
            .withColumn(
                "is_kept", F.dayofmonth("event_date").isin(2, 3)
            )
        )
        joined = fact.join(
            dim.filter("is_kept"), "event_date"
        ).groupBy("event_date").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower()
        # semantic parity with the unpartitioned formulation
        want = (
            events.filter(F.dayofmonth("event_date").isin(2, 3))
            .groupBy("event_date")
            .count()
            .collect()
        )
        got = joined.collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))


class TestReviewRegressions:
    def test_events_load_is_session_timezone_invariant(self, spark, sf_dir):
        """The nanos→ntz conversion must not shift with
        spark.sql.session.timeZone (it did before the timestampadd fix)."""
        utc_rows = None
        try:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            utc_rows = sorted(
                r["ts"] for r in load_table(spark, sf_dir, "events")
                .select("ts").limit(50).collect()
            )
            spark.conf.set("spark.sql.session.timeZone", "America/New_York")
            ny_rows = sorted(
                r["ts"] for r in load_table(spark, sf_dir, "events")
                .select("ts").limit(50).collect()
            )
            assert utc_rows == ny_rows
        finally:
            spark.conf.set("spark.sql.session.timeZone", "UTC")

    def test_events_load_restores_nanos_conf(self, spark, sf_dir):
        """The legacy nanosAsLong conf must not leak out of load_table
        (default is false, so post-load it must read false again)."""
        load_table(spark, sf_dir, "events").count()
        assert (
            spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
            == "false"
        )

    def test_salted_join_rejects_outer(self, spark, sf_dir):
        import pytest

        li = load_table(spark, sf_dir, "lineitem")
        sup = load_table(spark, sf_dir, "supplier").withColumnRenamed(
            "s_suppkey", "l_suppkey"
        )
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(li, sup, key="l_suppkey", how="full")

    def test_asof_join_rejects_reserved_columns(self, spark, sf_dir):
        import pytest

        from etl_embargo_spark.operators.temporal import as_of_join

        events = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "ts"
        )
        bad = events.withColumn("_ts", F.lit(1))
        with pytest.raises(ValueError, match="reserves column names"):
            as_of_join(bad, events, key="user_id")

    def test_simhash_banding_guarantees_max_hamming(self, spark):
        """Pigeonhole recall: a pair with one differing bit per chunk (the
        old 4x16 banding's blind spot) must now be found."""
        from etl_embargo_spark.operators.dedup import simhash_near_dups

        a = 0
        # 8 bits spread one per 8-bit chunk => hamming 8, no 16-bit-chunk
        # equality under the old scheme, but <= max_hamming=8
        b = 0
        for i in range(8):
            b |= 1 << (i * 8)
        sigs = spark.createDataFrame(
            [(1, a), (2, b)], "doc_id long, simhash long"
        )
        got = simhash_near_dups(sigs, max_hamming=8).collect()
        assert [(r["doc_a"], r["doc_b"], r["hamming"]) for r in got] == [
            (1, 2, 8)
        ]


class TestTwoPhasePrefixSum:
    def test_distributed_running_total_matches_global_window(
        self, spark, sf_dir
    ):
        """The 100-TB form of a GLOBAL running total (the thing
        Window.orderBy() computes by moving everything to one
        partition): range-partition on the order key so partitions are
        key-disjoint and sorted relative to each other, cumsum WITHIN
        each partition (parallel, no cross-partition traffic), then add
        each partition's broadcast offset (the cumulative total of all
        earlier partitions — a partitions-sized relation).  Total
        shuffle: one range exchange of the data + one tiny offset
        broadcast, vs. everything-to-one-core for the naive window.

        The demo verifies exact equality with the single-partition
        window at test scale, on integer quantities so the comparison
        is not an addition-order artifact."""
        from pyspark.sql import functions as F, Window

        from etl_embargo_spark.catalog import load_table

        li = (
            load_table(spark, sf_dir, "lineitem")
            .select(
                "l_orderkey",
                "l_linenumber",
                F.col("l_quantity").cast("bigint").alias("qty"),
            )
        )
        key = [F.col("l_orderkey"), F.col("l_linenumber")]

        # naive: global single-partition window (correct, unscalable)
        w_naive = Window.orderBy(*key).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        naive = li.select(
            "l_orderkey", "l_linenumber", F.sum("qty").over(w_naive).alias("run")
        )

        # two-phase: range partition -> local cumsum -> offset add
        ranged = li.repartitionByRange(8, *key).sortWithinPartitions(*key)
        staged = ranged.withColumn("pid", F.spark_partition_id())
        w_local = (
            Window.partitionBy("pid")
            .orderBy(*key)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = staged.withColumn("local_run", F.sum("qty").over(w_local))
        w_off = Window.orderBy("pid").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = (
            local.groupBy("pid")
            .agg(F.sum("qty").alias("part_total"))
            .withColumn(
                "offset",
                F.coalesce(F.sum("part_total").over(w_off), F.lit(0)),
            )
            .select("pid", "offset")
        )
        two_phase = local.join(F.broadcast(offsets), "pid").select(
            "l_orderkey",
            "l_linenumber",
            (F.col("local_run") + F.col("offset")).alias("run"),
        )

        a = {(r[0], r[1], r[2]) for r in naive.collect()}
        b = {(r[0], r[1], r[2]) for r in two_phase.collect()}
        assert a == b
        # and the plan truly avoids a single-partition exchange on the data
        plan = two_phase._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning" in plan.lower()


class TestLshSizing:
    """lsh_params is the executable scale rule for every hyperplane-LSH
    consumer (embedding near-dup, kNN join, contrastive mining): bucket
    occupancy must stay bounded as the corpus grows, or buckets exceed
    max_bucket and get dropped — a silent recall collapse at 100×."""

    def test_occupancy_bounded_across_four_orders_of_magnitude(self):
        from etl_embargo_spark.operators.dedup import (
            LSH_TARGET_BUCKET,
            lsh_params,
        )

        prev_k = 0
        for n in (500, 2_000, 10_000, 100_000, 1_000_000, 10_000_000,
                  100_000_000):
            k, tables = lsh_params(n)
            occupancy = n / 2 ** k
            assert occupancy <= 2 * LSH_TARGET_BUCKET, (n, k, occupancy)
            assert tables >= 1
            # deeper corpora never get SHALLOWER tables (monotone k)
            assert k >= prev_k, (n, k, prev_k)
            prev_k = k

    def test_validated_operating_points(self):
        """The sizing reproduces the exact points the pins and recall
        tests were generated at: (4, 8) for the 500-vector sf0.001/0.01
        corpus and (6, 20) for the 2000-vector sf0.1 corpus."""
        from etl_embargo_spark.operators.dedup import lsh_params

        assert lsh_params(500) == (4, 8)
        assert lsh_params(2000) == (6, 20)

    def test_table_rows_reads_footers_not_data(self):
        """catalog.table_rows must agree with the actual corpus row counts
        at every generated SF (it feeds the sizing) without a Spark job."""
        from etl_embargo_spark.catalog import table_rows

        assert table_rows("/root/testdata/sf0.001", "embeddings") == 500
        assert table_rows("/root/testdata/sf0.01", "embeddings") == 500
        assert table_rows("/root/testdata/sf0.1", "embeddings") == 2000
        # unreadable path -> deployment default, never an exception
        assert table_rows("/nonexistent", "embeddings", default=77) == 77

    def test_recall_holds_under_sized_tables(self):
        """Solved-for-L recall at the sizing threshold: the closed-form
        banding recall 1-(1-p^k)^L must meet the target at every corpus
        size where L is not cost-capped."""
        import math

        from etl_embargo_spark.operators.dedup import (
            LSH_MAX_TABLES,
            LSH_RECALL,
            LSH_SIZING_T,
            lsh_params,
        )

        p = 1.0 - math.acos(LSH_SIZING_T) / math.pi
        for n in (500, 2_000, 5_000):
            k, tables = lsh_params(n)
            if tables < LSH_MAX_TABLES:
                recall = 1.0 - (1.0 - p ** k) ** tables
                assert recall >= LSH_RECALL, (n, k, tables, recall)


class TestZorderLayout:
    def test_zorder_prunes_better_than_linear(self, spark, sf_dir):
        """The whole point of the operator: for the 2-D box predicate the
        Z-ordered layout must touch fewer blocks and scan fewer rows than
        the single-column-sorted layout, and never scan fewer rows than
        actually match."""
        from etl_embargo_spark.operators.layout import q_zorder_layout

        rows = {r["layout"]: r for r in q_zorder_layout(spark, sf_dir).collect()}
        z, lin = rows["zorder"], rows["linear"]
        assert z["n_blocks"] == lin["n_blocks"] == 64
        assert z["n_rows_matching"] == lin["n_rows_matching"] > 0
        assert z["n_blocks_touched"] < lin["n_blocks_touched"]
        assert z["n_rows_scanned"] < lin["n_rows_scanned"]
        assert z["n_rows_scanned"] >= z["n_rows_matching"]

    def test_zorder_key_is_morton(self, spark):
        """The shared sinks.layout.zorder_key must be the exact Morton
        interleave under its lane convention (dim d bit i → i*ndims + d;
        python replay on a grid sample)."""
        from pyspark.sql import functions as F

        from etl_embargo_spark.sinks.layout import zorder_key

        df = spark.createDataFrame(
            [(x, y) for x in range(8) for y in range(8)], "gx long, gy long"
        ).select(
            "gx", "gy", zorder_key([F.col("gx"), F.col("gy")]).alias("z")
        )

        def morton(x, y):
            z = 0
            for i in range(16):
                z |= ((x >> i) & 1) << (2 * i)
                z |= ((y >> i) & 1) << (2 * i + 1)
            return z

        for r in df.collect():
            assert r["z"] == morton(r["gx"], r["gy"]), (r["gx"], r["gy"])

    def test_zorder_plan_shape(self, spark, sf_dir):
        """One broadcast of the 1-row max aggregate; at most two column-
        pruned fact scans (stats pass + layout pass) — never a shuffle
        join against the maxes."""
        from etl_embargo_spark.operators.layout import q_zorder_layout

        plan = (
            q_zorder_layout(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
        assert plan.count("Scan parquet") <= 2
        assert "SortMergeJoin" not in plan
        assert "ReadSchema: struct<l_partkey:bigint,l_suppkey:bigint>" in plan


class TestCompactionPlan:
    def test_bins_bounded_and_order_preserving(self, spark, sf_dir):
        from etl_embargo_spark.operators.listings import (
            COMPACT_TARGET_BYTES,
            q_compaction_plan,
        )

        rows = q_compaction_plan(spark, sf_dir).collect()
        assert rows
        by_prefix: dict[str, list] = {}
        for r in rows:
            by_prefix.setdefault(r["prefix"], []).append(r)
        max_file = COMPACT_TARGET_BYTES  # cents-sized stand-ins are smaller
        for prefix, bins in by_prefix.items():
            bins.sort(key=lambda r: r["bin_id"])
            # bin ids are dense from 0
            assert [b["bin_id"] for b in bins] == list(range(len(bins)))
            for b in bins:
                # a bin overshoots the target by at most one file
                assert b["total_bytes"] < COMPACT_TARGET_BYTES + max_file
            # name ranges of consecutive bins do not interleave
            for a, b in zip(bins, bins[1:]):
                assert a["last_name"] <= b["first_name"], prefix

    def test_single_partitioned_window_single_shuffle(self, spark, sf_dir):
        """The plan must be one partitioned window (prefix) over one
        exchange — no global sort, no driver-side packing loop."""
        from etl_embargo_spark.operators.listings import q_compaction_plan

        plan = (
            q_compaction_plan(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Window") == 1
        assert "hashpartitioning(prefix" in plan


class TestRuntimeBloomFilter:
    def test_selective_dim_injects_might_contain_into_fact_side(self, spark):
        """The engine conf must let Catalyst inject a runtime bloom filter:
        a selective dim feeding a shuffle join gets a bloom_filter_agg on
        its join key and the fact side a might_contain() pre-filter — the
        100 TB scan saver when the dim is too big to broadcast.  Broadcast
        is disabled and thresholds lowered so the rule fires on test-sized
        data (production relies on the same rule with default thresholds).
        All four knobs are runtime SQL confs, so the SHARED session is
        used and restored — a getOrCreate()+stop() here would kill the
        suite's session-scoped fixture for every later test."""
        from pyspark.sql import functions as F

        knobs = {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "0",
            "spark.sql.optimizer.runtime.bloomFilter."
            "creationSideThreshold": "1GB",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        }
        saved = {k: spark.conf.get(k, None) for k in knobs}
        for k, v in knobs.items():
            spark.conf.set(k, v)
        try:
            li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
            orders = spark.read.parquet(
                "/root/testdata/sf0.001/orders.parquet"
            ).filter(F.col("o_orderpriority") == "1-URGENT")
            j = (
                li.join(orders, li.l_orderkey == orders.o_orderkey)
                .groupBy("l_returnflag")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "might_contain" in plan, plan[:2000]
            assert "bloom_filter_agg" in plan
            # and the filtered join still returns correct groups
            assert j.count() > 0
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
