"""Generate schema-compatible synthetic tables for robustness sweeps.

The driver's tables (/root/testdata, seed 42) are read-only and their exact
generator is not published; this generator reproduces the SCHEMAS and the
distribution shapes (profiled from sf0.01) so that:

* a different seed (e.g. 43) catches seed-overfit in the 220 SQL-oracle
  queries — those oracles are data-independent, so Spark and DuckDB must
  still agree on any schema-compatible corpus (pinned queries are
  excluded from such sweeps: pins are literal seed-42 outputs);
* a larger SF (e.g. 1 → 6M lineitem) supports scale soaks that
  /root/testdata does not ship.

Usage:
    python tools/gen_testdata.py --sf 0.01 --seed 43 --out /tmp/td43/sf0.01
    python tools/gen_testdata.py --sf 1 --seed 42 --out /tmp/td_sf1/sf1
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "SMALL", "MEDIUM", "LARGE", "PROMO", "STANDARD"]
ADJS = ["small", "red", "blue", "green", "large", "smooth", "shiny", "plain"]
NOUNS = ["ring", "widget", "bolt", "gear", "cog", "pin", "hinge", "valve"]
EVENT_TYPES = ["click", "view", "signup", "purchase", "error"]
LANGS = ["en", "en", "en", "en", "zh", "de", "fr", "es"]  # en-heavy
VOCAB = (
    "key agg row scan slow fast table value part hash merge spark order "
    "data column join small line customer query batch window big the a "
    "filter plan stage task shuffle broadcast sort limit group"
).split()

DAY_US = 86_400_000_000


def synth_vocab(n_types: int) -> list[str]:
    """~n_types word types for large-SF corpora (VERDICT r5 #7: the
    34-word driver vocab inflates near-dup density and makes
    token-distribution prefilters look artificially weak at sf1).

    The ZIPF HEAD is the driver's 34-word vocabulary — real corpora
    carry function words and domain terms at the head of the rank
    distribution, and the standing-query operators (q_bm25's literal
    terms, the corpus-prep stopword gate) key on exactly those words;
    a head of pure pseudo-words made all three output ZERO rows at sf1
    (caught by the round-7 soak rows column).  Ranks past the head are
    pronounceable pseudo-word types: deterministic base-95 syllable
    encoding — no RNG, no collisions, ascii-only (DuckDB levenshtein
    stays byte==codepoint)."""
    syl = [c + v for c in "bcdfghjklmnpqrstvwz" for v in "aeiou"]
    out = list(VOCAB[: n_types])
    for i in range(max(0, n_types - len(out))):
        w, x = [], i
        while True:
            w.append(syl[x % len(syl)])
            x //= len(syl)
            if x == 0:
                break
        out.append("".join(w) + syl[i % len(syl)][0])
    return out


def _ts_us(date_str: str) -> int:
    import datetime as dt

    d = dt.datetime.fromisoformat(date_str)
    return int(d.timestamp() * 1_000_000)


def sizes(sf: float) -> dict[str, int]:
    """Row counts per table, matching the driver's observed scaling at
    sf0.001/0.01/0.1 and extrapolating above."""
    li = int(6_000_000 * sf)
    return {
        "orders": li // 4,
        "lineitem": li,
        "customer": max(150, int(150_000 * sf)),
        "supplier": max(25, int(10_000 * sf)),
        "part": max(200, int(200_000 * sf)),
        "events": max(2000, int(1_000_000 * sf)),
        # documents/embeddings scale sub-linearly in the driver's data
        # (500 at both sf0.001 and sf0.01; 5000/2000 at sf0.1)
        "documents": 500 if sf <= 0.01 else int(50_000 * sf),
        "embeddings": 500 if sf <= 0.01 else int(20_000 * sf),
    }


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(name, table.num_rows)


def ts_array(us: np.ndarray) -> pa.Array:
    # micros NTZ, like the driver's files (Timestamp(isAdjustedToUTC=false,
    # timeUnit=microseconds)) — ns annotation makes Spark's declared
    # timestamp_ntz schema read fail with PARQUET_COLUMN_DATA_TYPE_MISMATCH
    return pa.array(us.astype("int64"), type=pa.timestamp("us"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--seed", type=int, default=43)
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--vocab-types",
        type=int,
        default=0,
        help="document vocabulary size; 0 = auto (driver-compatible "
        "34-word VOCAB below sf1, 10000 synthetic types at sf>=1)",
    )
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    n = sizes(args.sf)
    os.makedirs(args.out, exist_ok=True)

    _write(args.out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(args.out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    nc = n["customer"]
    _write(args.out, "customer", pa.table({
        "c_custkey": pa.array(range(nc), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(nc)],
        "c_nationkey": pa.array(rng.integers(0, 25, nc), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, nc), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, nc)],
    }))

    ns = n["supplier"]
    _write(args.out, "supplier", pa.table({
        "s_suppkey": pa.array(range(ns), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
        "s_nationkey": pa.array(rng.integers(0, 25, ns), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, ns), 2),
    }))

    npart = n["part"]
    _write(args.out, "part", pa.table({
        "p_partkey": pa.array(range(npart), pa.int64()),
        "p_name": [
            f"{ADJS[int(a)]} {NOUNS[int(b)]}"
            for a, b in zip(
                rng.integers(0, len(ADJS), npart),
                rng.integers(0, len(NOUNS), npart),
            )
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(0, 25, npart)],
        "p_type": [PTYPES[i] for i in rng.integers(0, len(PTYPES), npart)],
        "p_size": pa.array(rng.integers(1, 51, npart), pa.int32()),
        # structural, like the driver's: 900.0 + 0.1*key mod 100
        "p_retailprice": np.round(
            900.0 + (np.arange(npart) % 1000) * 0.1, 2
        ),
    }))

    no = n["orders"]
    o_start = _ts_us("1995-01-01")
    o_span_days = 2404  # → 2001-08 max, like the profile
    o_dates = o_start + rng.integers(0, o_span_days, no) * DAY_US
    _write(args.out, "orders", pa.table({
        "o_orderkey": pa.array(range(no), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, nc, no), pa.int64()),
        "o_orderstatus": [
            "POF"[i] for i in rng.integers(0, 3, no)
        ],
        "o_totalprice": np.round(rng.uniform(900, 500_000, no), 2),
        "o_orderdate": ts_array(o_dates),
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, no)],
    }))

    nl = n["lineitem"]
    l_order = rng.integers(0, no, nl)
    l_order.sort()
    # linenumber: running index within order
    ln = np.ones(nl, dtype=np.int32)
    same = np.concatenate([[False], l_order[1:] == l_order[:-1]])
    run = 1
    for i in range(1, nl):
        run = run + 1 if same[i] else 1
        ln[i] = run
    qty = rng.integers(1, 51, nl).astype(np.float64)
    price = np.round(rng.uniform(900, 2100, nl) * qty, 2)
    ship = o_dates[l_order] + rng.integers(1, 96, nl) * DAY_US
    _write(args.out, "lineitem", pa.table({
        "l_orderkey": pa.array(l_order, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, npart, nl), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, ns, nl), pa.int64()),
        "l_linenumber": pa.array(ln, pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": price,
        "l_discount": np.round(rng.integers(0, 11, nl) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, nl) * 0.01, 2),
        "l_returnflag": ["ANR"[i] for i in rng.integers(0, 3, nl)],
        "l_linestatus": ["FO"[i] for i in rng.integers(0, 2, nl)],
        "l_shipdate": ts_array(ship),
    }))

    ne = n["events"]
    e_start = _ts_us("2024-01-01")
    e_ts = e_start + np.sort(rng.integers(0, 30 * DAY_US, ne))
    # heterogeneous user activity (zipf-ish) — deliberately NOT uniform:
    # uniform activity is exactly the degeneracy a robustness sweep is
    # supposed to break.  User cardinality scales with SF like the
    # driver's data does (measured: 15 users at sf0.001, 150 at sf0.01,
    # 1500 at sf0.1 → 15000·sf).  Round 5's fixed `% 150` made the sf1
    # soak corpus degenerate: 10× the events over the SAME 150 users and
    # 30-day span blew q_range_join's true output to 24.2M pairs (1100×
    # sf0.1) — its 10.5× soak ratio was this data bug, not a plan flaw.
    n_users = max(15, int(15000 * args.sf))
    users = (rng.zipf(1.3, ne) - 1) % n_users
    _write(args.out, "events", pa.table({
        "event_id": pa.array(range(ne), pa.int64()),
        "ts": ts_array(e_ts),
        "user_id": pa.array(users, pa.int64()),
        "event_type": [EVENT_TYPES[i] for i in rng.integers(0, 5, ne)],
        "value": np.round(rng.exponential(30, ne) + 0.01, 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, ne)],
    }))

    nd = n["documents"]
    texts: list[str] = []
    nv_types = args.vocab_types or (10000 if args.sf >= 1 else 0)
    vocab = np.array(synth_vocab(nv_types) if nv_types else VOCAB)
    zipf_w = 1.0 / np.arange(1, len(vocab) + 1) ** 0.8
    zipf_w /= zipf_w.sum()
    for i in range(nd):
        if i % 17 == 1 and i > 17:
            texts.append(texts[i - 17])  # exact duplicate
            continue
        length = int(rng.integers(8, 80))
        words = rng.choice(vocab, size=length, p=zipf_w)
        if i % 23 == 2 and texts:
            # near-dup: previous doc with a small twist
            base = texts[-1].split()
            base[: max(1, len(base) // 10)] = ["twist"] * max(
                1, len(base) // 10
            )
            texts.append(" ".join(base))
        else:
            texts.append(" ".join(words))
    _write(args.out, "documents", pa.table({
        "doc_id": pa.array(range(nd), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.integers(0, len(LANGS), nd)],
        "source": [f"src{i}" for i in rng.integers(0, 20, nd)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    nv = n["embeddings"]
    dim, k = 64, 10
    centers = rng.standard_normal((k, dim))
    labels = rng.integers(0, k, nv)
    vecs = centers[labels] + rng.standard_normal((nv, dim)) * 1.05
    _write(args.out, "embeddings", pa.table({
        "vec_id": pa.array(range(nv), pa.int64()),
        "embedding": pa.array(
            [v.astype(np.float32) for v in vecs],
            pa.list_(pa.float32()),
        ),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    main()
