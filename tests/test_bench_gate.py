"""Round-5 harness guards: the bench regression gate (`bench.py --check`)
and a smoke of the long-haul stability harness (bench/longhaul.py) — both
pure logic, runnable on the CPU backend."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

from pitchvis_tpu.runtime import native


def _load_bench_module():
    spec = importlib.util.spec_from_file_location(
        "bench_root", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestBenchCheckGate:
    def _run(self, tmp_path, monkeypatch, committed, live_values, lower=()):
        bench = _load_bench_module()
        monkeypatch.chdir(tmp_path)
        with open("BENCH_SWEEP.json", "w") as f:
            json.dump(committed, f)
        import pitchvis_tpu.bench.configs as cfgs

        fake = {k: (lambda v=v: {"value": v}) for k, v in live_values.items()}
        monkeypatch.setattr(cfgs, "ALL_CONFIGS", fake)
        monkeypatch.setattr(bench, "_LOWER_IS_BETTER", set(lower))
        return bench._check(repeats=2)

    def test_pass_within_envelope(self, tmp_path, monkeypatch):
        committed = {"a": {"value": 100.0, "unit": "x"}}
        assert self._run(tmp_path, monkeypatch, committed, {"a": 41.0}) == 0

    def test_fail_beyond_envelope(self, tmp_path, monkeypatch, capsys):
        committed = {"a": {"value": 100.0, "unit": "x"},
                     "b": {"value": 10.0, "unit": "x"}}
        rc = self._run(tmp_path, monkeypatch, committed, {"a": 39.0, "b": 10.0})
        assert rc == 1
        out = capsys.readouterr().out
        assert '"regressed": ["a"]' in out

    def test_lower_is_better_direction(self, tmp_path, monkeypatch):
        # latency-style: committed 100, live 240 -> ratio 0.417 -> pass;
        # live 260 -> 0.385 -> fail
        committed = {"lat": {"value": 100.0, "unit": "ms"}}
        assert self._run(tmp_path, monkeypatch, committed, {"lat": 240.0},
                         lower=("lat",)) == 0
        assert self._run(tmp_path, monkeypatch, committed, {"lat": 260.0},
                         lower=("lat",)) == 1

    def test_removed_config_is_skipped_not_fatal(self, tmp_path, monkeypatch):
        committed = {"gone": {"value": 5.0, "unit": "x"},
                     "a": {"value": 1.0, "unit": "x"}}
        assert self._run(tmp_path, monkeypatch, committed, {"a": 1.0}) == 0


@pytest.mark.skipif(not native.available(), reason="native library not built")
class TestLonghaulSmoke:
    def test_longhaul_smoke(self, tmp_path, small_params):
        """One sub-minute longhaul pass on tiny shapes: the harness drives
        the real cadenced serve loop, records a per-minute row with all
        fields, survives its own churn, and writes a valid artifact."""
        from pitchvis_tpu.bench.longhaul import longhaul

        out = str(tmp_path / "LONGHAUL.json")
        report = longhaul(
            n_streams=2, minutes=0.15, rate_hz=30.0, hops_per_dispatch=2,
            n_producers=1, path="time", fast=False,
            reset_every_s=3.0, rebuild_every_s=5.0,
            out_path=out, vqt_params=small_params,
        )
        assert os.path.exists(out)
        with open(out) as f:
            on_disk = json.load(f)
        assert on_disk["per_minute"] == report["per_minute"]
        assert len(report["per_minute"]) >= 1
        row = report["per_minute"][0]
        for key in ("rss_mb", "published", "served_realtime_fraction",
                    "outputs_finite", "skipped_deadlines_total"):
            assert key in row
        assert row["rss_mb"] > 0
        assert report["summary"]["minutes_recorded"] >= 1
        assert report["summary"]["all_outputs_finite"]


@pytest.mark.skipif(not native.available(), reason="native library not built")
class TestServingMemoryFlat:
    def test_serving_rss_flat_on_cpu(self, small_params):
        """Framework-side leak regression (round-5 longhaul finding): the
        45-minute longhaul measured host RSS growing ~1:1 with every
        host->device transfer THROUGH THE AXON TUNNEL (platform bug: all
        transfer APIs retain their payload, no reclaim API works —
        docs/PERFORMANCE.md has the attribution matrix). The framework
        itself must stay flat: on the CPU backend the same serving loop's
        RSS drift over hundreds of windows is bounded by allocator noise,
        proving no reference leak lives in step_multi/serve/publish."""
        import gc

        from pitchvis_tpu.runtime.server import StreamServer

        def rss_mb():
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        return int(line.split()[1]) / 1024.0

        B, k = 8, 4
        srv = StreamServer(B, small_params, buffer_seconds=2.0)
        hop = srv._hop
        block = np.random.default_rng(0).standard_normal(
            (B, hop * k)).astype(np.float32) * 0.05
        try:
            # warm: compile + let numpy/jax arenas settle
            for _ in range(10):
                srv.push_batch(block)
                out, _ = srv.step_multi(k, per_hop=True)
            np.asarray(out[-1].peaks[0, 0])
            gc.collect()
            r0 = rss_mb()
            n = 150
            for _ in range(n):
                srv.push_batch(block)
                out, _ = srv.step_multi(k, per_hop=True)
                np.asarray(out[-1].peaks[0, 0])
            gc.collect()
            drift = rss_mb() - r0
            # 150 windows x ~0.5 MB of staging each; a transfer-retention
            # bug like the tunnel's would show >= 70 MB here
            assert drift < 40.0, f"serving loop leaked {drift:.1f} MB on CPU"
        finally:
            srv.close()
