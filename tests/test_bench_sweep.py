"""bench.py sweep-aggregation logic (no real benchmarks run)."""

import json
import sys
import types


class TestRunSweep:
    def _run(self, monkeypatch, tmp_path, configs, repeats=3):
        import bench

        fake = types.SimpleNamespace(ALL_CONFIGS=configs)
        monkeypatch.setitem(
            sys.modules, "pitchvis_tpu.bench.configs", fake
        )
        monkeypatch.chdir(tmp_path)
        bench._run_sweep(repeats)
        with open(tmp_path / "BENCH_SWEEP.json") as f:
            return json.load(f)

    def test_median_run_taken_verbatim(self, monkeypatch, tmp_path):
        """The reported entry is the RUN closest to the median, verbatim —
        including inverse-proportional extra fields like the latency
        config's headroom vs_baseline (a linear rescale of run 0 would be
        wrong there; round-3 review finding)."""
        runs = iter(
            [
                {"metric": "lat_ms", "value": 5.0, "unit": "ms", "vs_baseline": 16.7 / 5.0},
                {"metric": "lat_ms", "value": 20.0, "unit": "ms", "vs_baseline": 16.7 / 20.0},
                {"metric": "lat_ms", "value": 10.0, "unit": "ms", "vs_baseline": 16.7 / 10.0},
            ]
        )
        sweep = self._run(monkeypatch, tmp_path, {"lat": lambda: next(runs)})
        entry = sweep["lat"]
        assert entry["value"] == 10.0  # the median run
        assert entry["vs_baseline"] == 16.7 / 10.0  # ITS OWN ratio, not rescaled
        assert sorted(entry["runs"]) == [5.0, 10.0, 20.0]
        assert entry["config"] == "lat"

    def test_throughput_median(self, monkeypatch, tmp_path):
        runs = iter(
            [
                {"metric": "fps", "value": 100.0, "unit": "f/s", "vs_baseline": 10.0},
                {"metric": "fps", "value": 300.0, "unit": "f/s", "vs_baseline": 30.0},
                {"metric": "fps", "value": 200.0, "unit": "f/s", "vs_baseline": 20.0},
            ]
        )
        sweep = self._run(monkeypatch, tmp_path, {"fps": lambda: next(runs)})
        assert sweep["fps"]["value"] == 200.0
        assert sweep["fps"]["vs_baseline"] == 20.0
