"""Plan-shape and uniqueness guarantees for the temporal joins (value
correctness is covered by the DuckDB oracle parity suite)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_embargo_spark.operators import temporal


class TestRangeJoin:
    def test_no_nested_loop_join(self, spark, sf_dir):
        """The binning rewrite must keep the join hash-partitioned; a raw
        inequality join would compile to BroadcastNestedLoop (O(n*m))."""
        df = temporal.q_range_join(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_pairs_unique(self, spark, sf_dir):
        """Every qualifying (point, interval) pair appears exactly once —
        the explode/bin construction must not duplicate matches."""
        df = temporal.q_range_join(spark, sf_dir)
        total = df.count()
        distinct = df.select("event_id", "user_id", "win_start").distinct().count()
        assert total == distinct

    def test_bin_width_invariance(self, spark, sf_dir):
        """Result set is independent of the bin width (pure performance
        knob)."""
        from etl_embargo_spark.catalog import load_table

        events = load_table(spark, sf_dir, "events")
        windows = temporal._purchases(events).select(
            "user_id",
            F.col("ts").alias("win_start"),
            (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("win_end"),
        )
        pts = events.select("event_id", "user_id", "ts")
        a = temporal.range_join(
            pts, windows, key="user_id", ts="ts", lo="win_start",
            hi="win_end", bin_seconds=3600,
        )
        b = temporal.range_join(
            pts, windows, key="user_id", ts="ts", lo="win_start",
            hi="win_end", bin_seconds=137,
        )
        key_cols = ["event_id", "user_id", "win_start"]
        assert sorted(map(tuple, a.select(*key_cols).collect())) == sorted(
            map(tuple, b.select(*key_cols).collect())
        )


class TestAsOfJoin:
    def test_single_shuffle(self, spark, sf_dir):
        """The union+window shape shuffles once on the key — no join node
        at all in the plan."""
        df = temporal.q_asof_join(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan  # pure union + window
        assert plan.count("Exchange") <= 3  # purchase agg + window partition

    def test_inclusive_at_equal_ts(self, spark, sf_dir):
        """A purchase event must as-of-match itself (ts equality is
        inclusive, DuckDB ASOF semantics)."""
        from etl_embargo_spark.catalog import load_table

        events = load_table(spark, sf_dir, "events")
        out = temporal.q_asof_join(spark, sf_dir)
        purchases = {
            (r["user_id"], r["ts"])
            for r in events.filter(F.col("event_type") == "purchase")
            .select("user_id", "ts")
            .collect()
        }
        matched_self = out.filter(F.col("ts") == F.col("asof_ts"))
        for r in matched_self.limit(50).collect():
            assert (r["user_id"], r["ts"]) in purchases


class TestDebounceModel:
    def test_matches_pure_python_model(self, spark, sf_dir):
        """Spark debounce vs an independent pure-Python replay of the
        rule (lag-based: compare each event to its immediate predecessor,
        kept or not) — the SURVEY §5 reference-model pattern."""
        from etl_embargo_spark.catalog import load_table
        from etl_embargo_spark.operators.temporal import (
            DEBOUNCE_SECONDS,
            q_debounce,
        )

        got = {r.event_id for r in q_debounce(spark, sf_dir).collect()}
        ev = sorted(
            load_table(spark, sf_dir, "events")
            .select("event_id", "user_id", "event_type", "ts")
            .collect(),
            key=lambda r: (r.user_id, r.ts, r.event_id),
        )
        want = set()
        prev_by_user = {}
        for r in ev:
            prev = prev_by_user.get(r.user_id)
            if (
                prev is None
                or prev.event_type != r.event_type
                or (r.ts - prev.ts).total_seconds() >= DEBOUNCE_SECONDS
            ):
                want.add(r.event_id)
            prev_by_user[r.user_id] = r
        assert got == want
        assert 0 < len(want)
