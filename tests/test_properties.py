"""Property-based tests (hypothesis) for the scalar filename/date layer:
Spark expressions vs pure-Python models of the reference's Go semantics
(/root/reference/filename_parser.go, embargo_check.go, embargo.go:105).

All properties are evaluated in ONE Spark job per hypothesis example
(single select over a batch of generated names) so the suite stays fast.
"""

from __future__ import annotations

import base64

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_embargo_spark.functions import filenames as fn

# Printable ASCII without newline (regexp '.' does not cross lines; the
# reference never sees newlines in object names).
NAME_ALPHABET = st.characters(min_codepoint=0x20, max_codepoint=0x7E)
names_lists = st.lists(
    st.text(alphabet=NAME_ALPHABET, min_size=0, max_size=40),
    min_size=1,
    max_size=40,
)


def _py_local_ip(name: str) -> str:
    """Go GetLocalIP (filename_parser.go:17-29): substring strictly between
    the FIRST and LAST underscore; '' when start >= end."""
    start = name.find("_") + 1
    end = name.rfind("_")
    if start >= end or end == -1:
        return ""
    return name[start:end]


def _py_rename(name: str) -> str:
    return name[: -len(".tgz")] + "-e.tgz" if name.endswith(".tgz") else name


def _py_date_path(d: str) -> str:
    # Go: "sidestream/" + d[0:4] + "/" + d[4:6] + "/" + d[6:8] — plain
    # concatenation (empty slices stay empty; separators always present)
    return "/".join(["sidestream", d[:4], d[4:6], d[6:8]])


class TestFilenameGrammarProperties:
    @settings(max_examples=15, deadline=None)
    @given(names_lists)
    def test_scalar_layer_matches_reference_model(self, spark, names):
        df = spark.createDataFrame([(n,) for n in names], "name string")
        rows = df.select(
            "name",
            fn.filename_local_ip("name").alias("ip"),
            fn.filename_date("name").alias("d8"),
            fn.basename("name").alias("base"),
            fn.embargo_rename("name").alias("renamed"),
            fn.date_path("name").alias("dpath"),
        ).collect()
        assert len(rows) == len(names)
        for r in rows:
            n = r["name"]
            assert r["ip"] == _py_local_ip(n), f"local_ip({n!r})"
            assert r["d8"] == n[:8], f"date8({n!r})"
            assert r["base"] == n.rsplit("/", 1)[-1], f"basename({n!r})"
            assert r["renamed"] == _py_rename(n), f"rename({n!r})"
            assert r["dpath"] == _py_date_path(n), f"date_path({n!r})"

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.text(alphabet="0123456789", min_size=1, max_size=12),
            min_size=1,
            max_size=30,
        )
    )
    def test_parse_date_int_on_digits(self, spark, digit_strings):
        df = spark.createDataFrame([(s,) for s in digit_strings], "d string")
        rows = df.select("d", fn.parse_date_int("d").alias("v")).collect()
        for r in rows:
            assert r["v"] == int(r["d"][:8])

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.text(alphabet=NAME_ALPHABET, min_size=1, max_size=10).filter(
                lambda s: not s[:1].isdigit()
            ),
            min_size=1,
            max_size=30,
        )
    )
    def test_parse_date_int_malformed_is_null(self, spark, bad_strings):
        """Non-numeric prefixes must yield null (the reference's
        skip-on-error path, embargo.go:272-276), never abort the job."""
        df = spark.createDataFrame([(s,) for s in bad_strings], "d string")
        rows = df.select("d", fn.parse_date_int("d").alias("v")).collect()
        for r in rows:
            s8 = r["d"][:8].strip()
            # model: Atoi-like — sign + digits only
            is_numeric = s8.lstrip("+-").isdigit() and s8.lstrip("+-") != ""
            if not is_numeric:
                assert r["v"] is None, f"parse({r['d']!r}) -> {r['v']}"

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
                min_size=0,
                max_size=30,
            ),
            min_size=1,
            max_size=30,
        )
    )
    def test_url_decode_roundtrip(self, spark, payloads):
        """F11: URL-safe base64 of any ASCII payload decodes back exactly."""
        enc = [
            (base64.urlsafe_b64encode(p.encode("ascii")).decode("ascii"), p)
            for p in payloads
        ]
        df = spark.createDataFrame(enc, "b64 string, want string")
        rows = df.select(
            fn.url_filename_decode("b64").alias("got"), "want"
        ).collect()
        for r in rows:
            assert r["got"] == r["want"]


class TestBucketPairsProperty:
    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),   # bucket key
                st.integers(min_value=0, max_value=40),  # item id
            ),
            min_size=0,
            max_size=60,
        )
    )
    def test_pairs_match_bruteforce(self, spark, rows):
        """_bucket_pairs emits exactly the distinct i<j co-bucket pairs
        (as a set across buckets, since the helper drops the key)."""
        from collections import Counter
        from itertools import combinations

        from pyspark.sql import functions as F

        from etl_embargo_spark.operators.dedup import _bucket_pairs

        df = spark.createDataFrame(
            [(b, i) for b, i in rows] or [(0, 0)], "bucket int, doc_id int"
        )
        if not rows:
            df = df.limit(0)
        emitted = [
            (r["a"]["doc_id"], r["b"]["doc_id"])
            for r in _bucket_pairs(
                df, ["bucket"], F.struct(F.col("doc_id"))
            ).collect()
        ]
        by_bucket: dict[int, set] = {}
        for b, i in rows:
            by_bucket.setdefault(b, set()).add(i)
        want = Counter(
            (x, y)
            for ids in by_bucket.values()
            for x, y in combinations(sorted(ids), 2)
        )
        # exact multiset equality: one emission per co-bucket occurrence,
        # every pair ordered a < b
        assert Counter(emitted) == want
        assert all(a < b for a, b in emitted)


def _py_norm(text: str) -> str:
    """Pure-Python model of text.normalize_text."""
    import re

    t = text.lower()
    t = re.sub(r"[.,!?;:'\"()\[\]{}-]", "", t)
    t = re.sub(r"\s+", " ", t)
    return t.strip()


class TestCorpusScalarProperties:
    @settings(max_examples=15, deadline=None)
    @given(names_lists)
    def test_hash_bucket_range_and_determinism(self, spark, keys):
        """Buckets land in [0, 100) and re-evaluating the expression gives
        identical assignments (the whole point of content-hash sampling)."""
        from etl_embargo_spark.operators.sampling import hash_bucket

        df = spark.createDataFrame([(k,) for k in keys], "k string")
        out = df.select(
            "k", hash_bucket(F.col("k")).alias("b1"),
            hash_bucket(F.col("k")).alias("b2"),
        ).collect()
        for r in out:
            assert 0 <= r["b1"] < 100
            assert r["b1"] == r["b2"]
        # same key -> same bucket across rows
        seen: dict[str, int] = {}
        for r in out:
            assert seen.setdefault(r["k"], r["b1"]) == r["b1"]

    @settings(max_examples=15, deadline=None)
    @given(names_lists)
    def test_normalize_text_idempotent_and_matches_model(self, spark, texts):
        """normalize(normalize(x)) == normalize(x), and the Spark chain
        matches the pure-Python model character for character."""
        from etl_embargo_spark.operators.text import normalize_text

        df = spark.createDataFrame([(t,) for t in texts], "t string")
        out = df.select(
            "t",
            normalize_text(F.col("t")).alias("once"),
            normalize_text(normalize_text(F.col("t"))).alias("twice"),
        ).collect()
        for r in out:
            assert r["once"] == _py_norm(r["t"]), r["t"]
            assert r["twice"] == r["once"], r["t"]


class TestMergeBatchingInvariance:
    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),   # key
                st.integers(min_value=0, max_value=50),  # version
                st.integers(min_value=0, max_value=99),  # payload
            ),
            min_size=1,
            max_size=30,
        ),
        st.integers(min_value=1, max_value=4),  # number of batches
    )
    def test_final_state_independent_of_batching(
        self, spark, changes, n_batches
    ):
        """Folding merge_last_writer_wins over ANY batching of a change
        log must produce the same final state as one merge over the whole
        log — the property that makes the streaming upsert sink correct
        regardless of micro-batch boundaries.  (event_id tie-break comes
        from the change's position, mirroring a log offset.)"""
        from etl_embargo_spark.streaming.upsert import merge_last_writer_wins

        rows = [
            (k, v, p, i) for i, (k, v, p) in enumerate(changes)
        ]  # (key, version, payload, offset)
        schema = "key long, version long, payload long, offset long"

        whole = merge_last_writer_wins(
            None,
            spark.createDataFrame(rows, schema),
            ["key"],
            ["version", "offset"],
        )

        # deterministic round-robin batching
        state = None
        for b in range(n_batches):
            batch = [r for i, r in enumerate(rows) if i % n_batches == b]
            if not batch:
                continue
            state = merge_last_writer_wins(
                state,
                spark.createDataFrame(batch, schema),
                ["key"],
                ["version", "offset"],
            )

        want = {tuple(r) for r in whole.collect()}
        got = {tuple(r) for r in state.collect()}
        assert got == want


class TestParetoProperty:
    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=20240101, max_value=20240420),
                st.integers(min_value=0, max_value=50),
            ),
            min_size=0,
            max_size=50,
        )
    )
    def test_frontier_matches_bruteforce(self, spark, points):
        """The two-phase window skyline must equal the O(n²) strict-
        dominance brute force on arbitrary point sets — including ties on
        either axis (a tied point is NOT dominated)."""
        from etl_embargo_spark.operators.analytics import pareto_frontier

        rows = [
            (i, d, float(p)) for i, (d, p) in enumerate(points)
        ]
        want = {
            i
            for i, d, p in rows
            if not any(
                d2 > d and p2 > p for _, d2, p2 in rows
            )
        }
        if not rows:
            return
        df = spark.createDataFrame(
            rows, "o_orderkey long, date_int int, price double"
        )
        got = {r.o_orderkey for r in pareto_frontier(df).collect()}
        assert got == want


class TestWeightedSampleInvariance:
    def test_selection_invariant_under_repartition(self, spark, sf_dir):
        """The PPS systematic sample must pick the SAME doc_ids no
        matter how the input is partitioned — the whole point of the
        integer threshold-crossing rule (a seed-based sampler would
        shift with the layout)."""
        from etl_embargo_spark.operators.sampling import q_weighted_sample

        base = {
            (r.doc_id, r.bucket)
            for r in q_weighted_sample(spark, sf_dir).collect()
        }
        from etl_embargo_spark.catalog import load_table
        import etl_embargo_spark.operators.sampling as sampling
        from pyspark.sql import functions as F, Window

        docs = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("n_chars") > 0)
            .repartition(7, "lang")  # adversarial layout
        )
        w = Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        wp = Window.partitionBy("source")
        staged = docs.select(
            "doc_id",
            "n_chars",
            F.sum("n_chars").over(w).cast("bigint").alias("cum_hi"),
            F.sum("n_chars").over(wp).cast("bigint").alias("w_total"),
        )
        k = F.lit(sampling.WEIGHTED_K).cast("bigint")
        hi = F.floor(F.col("cum_hi") * k / F.col("w_total"))
        lo = F.floor(
            (F.col("cum_hi") - F.col("n_chars")) * k / F.col("w_total")
        )
        relaid = {
            (r.doc_id, r.bucket)
            for r in staged.filter(hi > lo)
            .select("doc_id", hi.cast("int").alias("bucket"))
            .collect()
        }
        assert base == relaid


class TestSnapshotModel:
    """Model-based property: any sequence of append/overwrite commits of
    small integer batches must make every historical version read back
    exactly what the Python list model says it held — manifests never
    lose, duplicate, or leak rows across versions."""

    @given(
        ops=st.lists(
            st.tuples(
                st.sampled_from(["append", "overwrite"]),
                st.lists(
                    st.integers(min_value=0, max_value=99),
                    min_size=1,
                    max_size=5,
                ),
            ),
            min_size=1,
            max_size=5,
        )
    )
    @settings(max_examples=8, deadline=None)
    def test_history_matches_model(self, spark, tmp_path_factory, ops):
        from collections import Counter

        from etl_embargo_spark.sinks.snapshots import (
            read_snapshot,
            write_snapshot,
        )

        table = str(tmp_path_factory.mktemp("snapmodel"))
        model: list[Counter] = []
        for mode, batch in ops:
            df = spark.createDataFrame([(v,) for v in batch], "v int")
            write_snapshot(df, table, mode=mode)
            prev = model[-1] if (model and mode == "append") else Counter()
            model.append(prev + Counter(batch))
        for version, want in enumerate(model, start=1):
            got = Counter(
                r["v"]
                for r in read_snapshot(spark, table, version=version)
                .collect()
            )
            assert got == want, (version, got, want)


class TestSqlLiteralRoundTrip:
    @given(
        st.lists(
            st.floats(allow_nan=False, allow_infinity=False, width=64),
            min_size=1,
            max_size=30,
        )
    )
    @settings(max_examples=30, deadline=None)
    def test_float_pin_literal_round_trips_canonically(self, values):
        """The pinned-oracle float rendering (repr + CAST AS DOUBLE) must
        round-trip through DuckDB to the SAME CANONICAL VALUE the driver
        compare hashes — bit-exact for every double except -0.0, which
        DuckDB normalizes to +0.0 and the canonicalizer (str(int(v)) for
        integral doubles) deliberately equates."""
        import struct

        import duckdb

        from etl_embargo_spark.parity import _canon_value
        from etl_embargo_spark.registry import _sql_literal

        con = duckdb.connect()
        for v in values:
            got = con.execute(f"SELECT {_sql_literal(v)}").fetchone()[0]
            assert _canon_value(got) == _canon_value(v), (v, got)
            if v != 0.0:
                assert struct.pack("<d", got) == struct.pack("<d", v)

    @given(st.lists(st.text(max_size=40), min_size=1, max_size=20))
    @settings(max_examples=30, deadline=None)
    def test_string_pin_literal_round_trips(self, values):
        import duckdb

        from etl_embargo_spark.registry import _sql_literal

        con = duckdb.connect()
        for v in values:
            if "\x00" in v:
                continue  # NUL is not storable in a SQL literal
            got = con.execute(f"SELECT {_sql_literal(v)}").fetchone()[0]
            assert got == v, (repr(v), repr(got))


class TestMediaCodecProperties:
    @given(
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=1, max_value=16),
        st.binary(min_size=1, max_size=256),
    )
    @settings(max_examples=25, deadline=None)
    def test_ppm_encode_decode_identity(self, w, h, seed_bytes):
        """Encoding arbitrary pixel data as P6 and re-decoding through the
        numpy header parser recovers the exact dims and pixel block —
        the identity the real-codec path rests on."""
        import numpy as np

        need = w * h * 3
        pixels = np.resize(
            np.frombuffer(seed_bytes, dtype=np.uint8), need
        )
        payload = f"P6\n{w} {h}\n255\n".encode("ascii") + pixels.tobytes()
        # replicate the kernel's parse exactly
        parts = payload.split(maxsplit=4)
        gw, gh = int(parts[1]), int(parts[2])
        hdr_len = len(payload) - (gw * gh * 3)
        px = np.frombuffer(payload[hdr_len:], dtype=np.uint8)
        assert (gw, gh) == (w, h)
        assert np.array_equal(px, pixels)

    @given(st.binary(min_size=2, max_size=400))
    @settings(max_examples=25, deadline=None)
    def test_wav_encode_decode_identity(self, raw):
        """PCM16 WAV encode → RIFF chunk-walk decode recovers the exact
        sample array and rate for arbitrary payload sizes."""
        import struct

        import numpy as np

        rate = 8000
        samples = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128
        ) * 64
        data = samples.tobytes()
        hdr = (
            b"RIFF"
            + struct.pack("<I", 36 + len(data))
            + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
            + b"data"
            + struct.pack("<I", len(data))
        )
        b = hdr + data
        # replicate the kernel's chunk walk
        assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
        pos, got_rate, got_data = 12, 0, b""
        while pos + 8 <= len(b):
            cid = b[pos:pos + 4]
            clen = struct.unpack("<I", b[pos + 4:pos + 8])[0]
            body = b[pos + 8:pos + 8 + clen]
            if cid == b"fmt ":
                got_rate = struct.unpack("<I", body[4:8])[0]
            elif cid == b"data":
                got_data = body
            pos += 8 + clen + (clen % 2)
        assert got_rate == rate
        assert np.array_equal(
            np.frombuffer(got_data, dtype=np.int16), samples
        )
