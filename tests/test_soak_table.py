"""Spark-free guards for tools/soak.py's ratio-table semantics.

The soak gate's credibility rests on three renderer behaviors added in
rounds 6-7 (VERDICT r6 #3 / ADVICE r6): the sf0.1 denominator floor must
not silently hide real superlinearity (WARN when the raw ratio is past
the gate but the floored one passes), measured output row counts must
ride the table so cardinality adjudication is numbers-not-prose, and
errors must stay errors.  These are pure functions — pin them without a
session.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from soak import SF01_FLOOR, render_table  # noqa: E402


class TestSoakRenderTable:
    def test_fail_when_floored_ratio_past_gate(self):
        t1 = {"q_bad": 50.0}
        t01 = {"q_bad": 1.0}
        _, failures, errors, warns = render_table(t1, t01, 12.0, 2.0)
        assert failures == ["q_bad"]
        assert not errors and not warns

    def test_warn_when_only_raw_ratio_past_gate(self):
        # sf0.1 = 0.2 s (below the floor): raw 3.0/0.2 = 15x > 12x but
        # floored 3.0/0.35 = 8.6x passes -> WARN, not FAIL, not silent ok
        t1 = {"q_floorhidden": 3.0}
        t01 = {"q_floorhidden": 0.2}
        assert 3.0 / SF01_FLOOR < 12.0 < 3.0 / 0.2
        _, failures, errors, warns = render_table(t1, t01, 12.0, 2.0)
        assert warns == ["q_floorhidden"]
        assert not failures

    def test_sub_threshold_never_fails_or_warns(self):
        t1 = {"q_tiny": 1.5}  # below min_seconds
        t01 = {"q_tiny": 0.05}
        _, failures, errors, warns = render_table(t1, t01, 12.0, 2.0)
        assert not failures and not errors and not warns

    def test_rows_columns_and_growth_rendered(self):
        t1 = {"q_x": 5.0}
        t01 = {"q_x": 1.0}
        table, *_ = render_table(
            t1, t01, 12.0, 2.0, {"q_x": 1000}, {"q_x": 10}
        )
        header, _, row = table.splitlines()
        assert "rows sf1" in header and "rows×" in header
        assert "| 1000 |" in row and "| 10 |" in row
        assert "100.0×" in row

    def test_missing_rowcounts_render_as_dash(self):
        t1 = {"q_x": 5.0}
        t01 = {"q_x": 1.0}
        table, *_ = render_table(t1, t01, 12.0, 2.0)
        row = table.splitlines()[2]
        assert "| — | — | — |" in row

    def test_error_rows_survive_rowcount_plumbing(self):
        t1 = {"q_err": -1.0, "q_ok": 3.0}
        t01 = {"q_err": 1.0, "q_ok": 1.0}
        _, failures, errors, warns = render_table(
            t1, t01, 12.0, 2.0, {"q_err": -1, "q_ok": 5}, {"q_ok": 5}
        )
        assert errors == ["q_err"]
        assert not failures

    def test_rows_growth_waiver_still_ok_when_stable(self, monkeypatch):
        # 20x time for 100x output growth, prior round recorded ~20x:
        # output-bound, stable -> ok (the r10 q_spatial_join shape)
        import soak as soak_mod

        monkeypatch.setattr(
            soak_mod, "_prior_ratios", lambda: {"q_out": 19.0}
        )
        t1, t01 = {"q_out": 20.0}, {"q_out": 1.0}
        table, failures, errors, warns = soak_mod.render_table(
            t1, t01, 12.0, 2.0, {"q_out": 100000}, {"q_out": 1000}
        )
        assert not failures and not warns
        assert "ok (≤ rows×)" in table

    def test_rows_growth_waiver_warns_on_drift(self, monkeypatch):
        # ADVICE r10: the waiver is bounded — 60x time for 100x output
        # would previously auto-pass; with a prior committed ratio of
        # 12.8x it now WARNs instead of silently waiving
        import soak as soak_mod

        monkeypatch.setattr(
            soak_mod, "_prior_ratios", lambda: {"q_out": 12.8}
        )
        t1, t01 = {"q_out": 60.0}, {"q_out": 1.0}
        table, failures, errors, warns = soak_mod.render_table(
            t1, t01, 12.0, 2.0, {"q_out": 100000}, {"q_out": 1000}
        )
        assert warns == ["q_out"]
        assert "WARN (waiver drift)" in table
        assert not failures

    def test_rows_growth_waiver_ceiling_without_prior(self, monkeypatch):
        # no prior recorded ratio: the absolute ceiling (40x) gates
        import soak as soak_mod

        monkeypatch.setattr(soak_mod, "_prior_ratios", lambda: {})
        t1, t01 = {"q_new": 60.0}, {"q_new": 1.0}
        table, failures, errors, warns = soak_mod.render_table(
            t1, t01, 12.0, 2.0, {"q_new": 100000}, {"q_new": 1000}
        )
        assert warns == ["q_new"]
        assert "WARN (waiver ceiling)" in table
        assert not failures
