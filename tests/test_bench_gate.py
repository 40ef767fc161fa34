"""Spark-free guards for bench.py's load start-gate (VERDICT r10 #4).

Three consecutive rounds the driver bench artifact was contended and
needed min-merge archaeology; the gate either waits for a quiet box or
stamps ``contended: true`` so downstream tooling auto-prefers the
min-merge sidecar.  Pure time/loadavg plumbing — pin it without a
session (bench imports the registry, so importing the module is cheap
but constructing queries is not; these tests only touch the gate).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


class TestBenchLoadGate:
    def _fresh_bench(self, monkeypatch, loadavgs, max_load="2.0", wait="1"):
        """Import bench with a scripted os.getloadavg sequence."""
        monkeypatch.setenv("SPARK_GRAFT_BENCH_MAX_LOAD", max_load)
        monkeypatch.setenv("SPARK_GRAFT_BENCH_LOAD_WAIT", wait)
        for mod in list(sys.modules):
            if mod == "bench":
                del sys.modules[mod]
        import bench  # noqa: F401

        seq = iter(loadavgs)
        last = loadavgs[-1]

        def fake_loadavg():
            try:
                v = next(seq)
            except StopIteration:
                v = last
            return (v, v, v)

        monkeypatch.setattr(bench.os, "getloadavg", fake_loadavg)
        # the spin sleeps 15 s between polls; don't actually sleep
        monkeypatch.setattr(bench.time, "sleep", lambda s: None)
        return bench

    def test_quiet_box_passes_immediately(self, monkeypatch):
        bench = self._fresh_bench(monkeypatch, [0.5])
        assert bench._wait_for_quiet_box() is True

    def test_contended_box_times_out_false(self, monkeypatch):
        # never drops below the threshold within the wait budget
        bench = self._fresh_bench(monkeypatch, [9.0], wait="0")
        assert bench._wait_for_quiet_box() is False

    def test_box_going_quiet_mid_wait_passes(self, monkeypatch):
        bench = self._fresh_bench(monkeypatch, [9.0, 9.0, 1.0], wait="600")
        assert bench._wait_for_quiet_box() is True


class TestBenchRescue:
    """The in-run rescue pass (VERDICT r11 #3): suspects are queries
    reading > RESCUE_FACTOR x their last COMMITTED time; _prior_times
    reads HEAD, never the working tree (which is the run's own output)."""

    def _bench(self):
        for mod in list(sys.modules):
            if mod == "bench":
                del sys.modules[mod]
        import bench

        return bench

    def test_prior_times_reads_committed_file(self, monkeypatch):
        bench = self._bench()
        import json as _json
        import subprocess

        calls = {}

        class R:
            stdout = _json.dumps({"queries": {"q_a": 1.0, "q_bad": "x"}})

        def fake_run(cmd, **kw):
            calls["cmd"] = cmd
            return R()

        monkeypatch.setattr(bench, "_prior_times", bench._prior_times)
        monkeypatch.setattr(subprocess, "run", fake_run, raising=True)
        got = bench._prior_times()
        assert calls["cmd"][:2] == ["git", "show"]
        assert calls["cmd"][2].startswith("HEAD:")
        assert got == {"q_a": 1.0}  # non-numeric entries dropped

    def test_prior_times_empty_on_missing_blob(self, monkeypatch):
        bench = self._bench()
        import subprocess

        def fake_run(cmd, **kw):
            raise subprocess.CalledProcessError(128, cmd)

        monkeypatch.setattr(subprocess, "run", fake_run, raising=True)
        assert bench._prior_times() == {}

    def test_suspect_selection_logic(self):
        bench = self._bench()
        prior = {"q_a": 1.0, "q_b": 1.0}
        timings = {"q_a": 2.0, "q_b": 3.0, "q_new": 50.0, "q_err": -1.0}
        suspects = [
            n
            for n, t in timings.items()
            if t > 0
            and prior.get(n, -1.0) > 0
            and t > bench.RESCUE_FACTOR * prior[n]
        ]
        # q_a is 2x (under 2.5x), q_b is 3x (suspect), q_new has no
        # prior (new queries are never rescue suspects), q_err failed
        assert suspects == ["q_b"]
