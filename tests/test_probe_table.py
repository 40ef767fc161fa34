"""Spark-free guards for tools/probe_sf3.py's adjudication semantics
(round 11): the proxy-pair-rows waiver for rollup-shaped dedup queries
and the base behaviors it must not disturb."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.probe_sf3 import PROXY_ROWS, render_table  # noqa: E402


class TestProbeRenderTable:
    def test_rollup_query_waived_by_proxy_growth(self):
        # q_dedup_minhash: 4-row rollup (rows× = 1.0) but time tracks the
        # 8.9× pair growth measured by q_dedup_levenshtein in the same run
        t3 = {"q_dedup_minhash": 42.0, "q_dedup_levenshtein": 60.0}
        t1 = {"q_dedup_minhash": 7.0, "q_dedup_levenshtein": 8.0}
        r3 = {"q_dedup_minhash": 4, "q_dedup_levenshtein": 668232}
        r1 = {"q_dedup_minhash": 4, "q_dedup_levenshtein": 74874}
        table, failures, errors = render_table(t3, t1, r3, r1, 5.0, 1.2, 5.0)
        assert not failures and not errors
        assert "ok (≤ q_dedup_levenshtein rows×)" in table

    def test_proxy_waiver_still_bounded(self):
        # a genuine blowup past proxy-growth × slack still FAILs
        t3 = {"q_dedup_minhash": 100.0, "q_dedup_levenshtein": 60.0}
        t1 = {"q_dedup_minhash": 7.0, "q_dedup_levenshtein": 8.0}
        r3 = {"q_dedup_minhash": 4, "q_dedup_levenshtein": 668232}
        r1 = {"q_dedup_minhash": 4, "q_dedup_levenshtein": 74874}
        _, failures, _ = render_table(t3, t1, r3, r1, 5.0, 1.2, 5.0)
        assert failures == ["q_dedup_minhash"]

    def test_proxy_absent_falls_back_to_own_rows(self):
        # when the proxy query is not in the run, the rollup falls back
        # to its own rows growth (and fails if that cannot waive it)
        t3 = {"q_dedup_minhash": 42.0}
        t1 = {"q_dedup_minhash": 7.0}
        r3 = {"q_dedup_minhash": 4}
        r1 = {"q_dedup_minhash": 4}
        _, failures, _ = render_table(t3, t1, r3, r1, 5.0, 1.2, 5.0)
        assert failures == ["q_dedup_minhash"]

    def test_non_proxy_queries_unchanged(self):
        # output-bound detail query keeps the plain rows× waiver
        t3 = {"q_spatial_join": 115.0}
        t1 = {"q_spatial_join": 16.0}
        r3 = {"q_spatial_join": 125074864}
        r1 = {"q_spatial_join": 13900561}
        table, failures, _ = render_table(t3, t1, r3, r1, 5.0, 1.2, 5.0)
        assert not failures
        assert "ok (≤ rows×)" in table

    def test_proxy_map_targets_exist_in_probe_set(self):
        from tools.probe_sf3 import PROBE_QUERIES

        for src, proxy in PROXY_ROWS.items():
            assert src in PROBE_QUERIES
            assert proxy in PROBE_QUERIES
