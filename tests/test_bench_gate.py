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
