"""Regenerate etl_embargo_spark/pins.py — literal DuckDB oracles for
deterministic rows-only queries.

Some registered queries are deterministic but not ANSI-SQL-expressible
(pandas-UDF IPv6 normalization, LSH candidate generation, winnowing
fingerprints, tar round-trips, HLL/GK sketches).  For those, the oracle is
the query's own output PINNED as a literal VALUES relation, guarded by the
row count of the query's primary input table so the same SQL string is
correct at every generated scale factor.  The pin is only as good as the
query's determinism — each pinned query must be partition-layout
independent (checksum rollups use aggregates.rows_checksum; sketches were
measured stable across local[2]/local[8]/local[32] × shuffle-partition
settings).  tests/test_oracle_parity.py re-checks every pin against the
live query at sf0.001 and sf0.01 on every pytest run, so a drifted pin
fails CI before it can reach the driver.

Usage:  cd /tmp && python /root/repo/tools/pin_oracles.py [q_a,q_b]
(run from OUTSIDE the repo so executor pickling matches the driver harness;
an optional comma-separated query list regenerates only those pins and
keeps the rest from the existing pins.py)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

# query name -> guard table whose count(*) disambiguates the scale factor.
# Always lineitem: documents/embeddings keep the same row count between
# sf0.001 and sf0.01 (content differs!), so only lineitem's count is a
# reliable SF key — and every SF dir ships all tables, so the guard table
# need not be the query's input.
PINNED_QUERIES: dict[str, str] = {name: "lineitem" for name in [
    "q_ipv6_normalize",
    "q_tar_roundtrip",
    "q_approx_distinct",
    "q_approx_quantiles",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_dedup_embedding",
    "q_dedup_clusters",
    "q_doc_fingerprint",
    "q_knn_join",
    "q_ann_ivf",
    "q_media_dedup",   # md5 over binary payload prefixes (PPM/WAV)
    # quantized-iterative / hash-deterministic queries, verified layout-
    # independent by tools' cross-config check (local[8]/local[32]/local[3]
    # x shuffle 8/32/5 at sf0.01) before pinning:
    "q_calibration",
    "q_cms_topk",
    "q_corpus_dedup",
    "q_hll_merge",
    "q_kmeans",
    "q_logreg",
    "q_markov_attribution",
    "q_media_features",
    "q_media_framesample",
    "q_pca",
    "q_semdedup",
    "q_stem",
    "q_textrank",
    "q_whitening",
    "q_bpe_train",
    "q_als",
    "q_pagerank",
    "q_contrastive_pairs",
    "q_minhash_pairs",
    "q_simhash_pairs",
    "q_embedding_pairs",
    "q_label_propagation",
    "q_dbscan",
    # round 10 (det-checked cross-config before pinning, same recipe):
    "q_kcore",
    "q_hits",
    "q_isotonic",
    "q_bpe_encode",
    "q_bpe_fertility",
    "q_mmr_diversify",
    # round 12 (det-checked cross-config at sf0.01+sf1 before pinning):
    "q_incremental_dedup_near",
]}

MAX_PIN_ROWS = 600  # per-SF cap: keeps pins.py reviewable

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

# sf1 soak data (seed 43, regenerable: tools/gen_testdata.py --sf 1
# --out /tmp/td_sf1/sf1): when present, pins also get an sf1 by_count
# entry so tests/test_oracle_parity.py's sf1 parameterization can
# hash-check pinned queries on soak-scale data (VERDICT r3 #6).  Every
# query pinned at sf1 must pass tools/detcheck.py at that SF first
# (15 candidates det-checked 2026-08-14, all stable).
SF1_DIR = "/tmp/td_sf1/sf1"
import os as _os  # noqa: E402

if _os.path.isdir(SF1_DIR):
    SF_DIRS.append(SF1_DIR)


def main() -> None:
    from pyspark.sql import SparkSession

    from etl_embargo_spark import registry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    only = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None
    existing: dict[str, dict] = {}
    if only:
        from etl_embargo_spark.pins import PINS as existing  # type: ignore

    qs = registry.queries()
    pins: dict[str, dict] = {}
    for name, guard in PINNED_QUERIES.items():
        if only and name not in only:
            if name in existing:
                pins[name] = existing[name]
            continue
        fn = qs[name]
        by_count: dict[int, list[tuple]] = {}
        cols = None
        for sf in SF_DIRS:
            guard_n = spark.read.parquet(f"{sf}/{guard}.parquet").count()
            df = fn(spark, sf)
            cols = df.columns
            rows = sorted(tuple(r) for r in df.collect())
            if len(rows) > MAX_PIN_ROWS:
                # keep pins.py reviewable: the driver gate runs at sf0.01,
                # so oversized higher-SF result sets are simply not pinned
                # (a sweep at that SF must treat the query as rows-only —
                # detectable via PINS[name]["by_count"] membership)
                print(f"{name} @ {sf}: guard={guard_n} rows={len(rows)} SKIPPED (>{MAX_PIN_ROWS})")
                continue
            by_count[guard_n] = rows
            print(f"{name} @ {sf}: guard={guard_n} rows={len(rows)}")
        pins[name] = {"guard_table": guard, "columns": cols, "by_count": by_count}

    out = [
        '"""AUTO-GENERATED by tools/pin_oracles.py — do not edit by hand.',
        "",
        "Literal oracle pins for deterministic rows-only queries, keyed by the",
        'guard table\'s row count (disambiguates the scale factor)."""',
        "",
        "from decimal import Decimal  # noqa: F401 — literal pin values",
        "",
        "PINS = {",
    ]
    for name, p in pins.items():
        out.append(f"    {name!r}: {{")
        out.append(f"        'guard_table': {p['guard_table']!r},")
        out.append(f"        'columns': {p['columns']!r},")
        out.append("        'by_count': {")
        for c, rows in p["by_count"].items():
            out.append(f"            {c}: [")
            for r in rows:
                out.append(f"                {r!r},")
            out.append("            ],")
        out.append("        },")
        out.append("    },")
    out.append("}")
    with open("/root/repo/etl_embargo_spark/pins.py", "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote etl_embargo_spark/pins.py")


if __name__ == "__main__":
    main()
