"""Headline benchmark: batched VQT throughput on one chip.

Default run prints TWO JSON lines of the form
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
the exact f32 fused-Pallas number first (round-over-round continuity), then
the flagship bf16 fast mode LAST — the driver records the final line. The
bf16 mode's error budget is pinned by tests/test_bf16.py (<=0.016 dB at
default parameters on musical signals).

`--config all` additionally persists the full sweep (every entry in
bench/configs.py ALL_CONFIGS — currently 13: offline f32/bf16, five
streaming shapes, latency, analysis, serial, train, train_corpus, render) to
BENCH_SWEEP.json, each config reported as the run closest to the median
over --repeats runs (default 3), so round-over-round regressions are
detectable despite the host's 2x throttle-window variance
(docs/PERFORMANCE.md).

Baseline: the Rust reference computes one default-parameter VQT frame in
0.165 ms on a desktop CPU core (VQT_REVIEW.md:12-15) ~= 6,060 frames/s.
vs_baseline = our frames/s / 6060.
"""

from __future__ import annotations

import json
import statistics
import sys


def _run_sweep(repeats: int) -> None:
    from pitchvis_tpu.bench.configs import ALL_CONFIGS

    sweep = {}
    for key, fn in ALL_CONFIGS.items():
        runs = []
        for _ in range(repeats):
            runs.append(fn())
        values = [r["value"] for r in runs]
        median = statistics.median(values)
        # take the run CLOSEST to the median verbatim (its vs_baseline and
        # any extra keys are then mutually consistent — a linear rescale
        # would be wrong for inverse metrics like the latency config's
        # headroom factor)
        result = dict(min(runs, key=lambda r: abs(r["value"] - median)))
        result["config"] = key
        result["runs"] = values
        sweep[key] = result
        print(json.dumps(result))
    with open("BENCH_SWEEP.json", "w") as f:
        json.dump(sweep, f, indent=1)


def main() -> None:
    from pitchvis_tpu.bench.configs import ALL_CONFIGS, bench_offline_vqt
    from pitchvis_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    if "--config" in sys.argv:
        name = sys.argv[sys.argv.index("--config") + 1]
        if name == "all":
            repeats = (
                int(sys.argv[sys.argv.index("--repeats") + 1])
                if "--repeats" in sys.argv
                else 3
            )
            _run_sweep(repeats)
            return
        result = ALL_CONFIGS[name]()
        print(json.dumps(result))
        return

    kwargs = {}
    if "--path" in sys.argv:
        kwargs["path"] = sys.argv[sys.argv.index("--path") + 1]
    if "--batch" in sys.argv:
        kwargs["batch"] = int(sys.argv[sys.argv.index("--batch") + 1])
    if "--fast" in sys.argv:
        print(json.dumps(bench_offline_vqt(fast=True, **kwargs)))
        return
    if kwargs:
        print(json.dumps(bench_offline_vqt(**kwargs)))
        return
    # default: exact f32 line for continuity, flagship bf16 fast mode LAST
    print(json.dumps(bench_offline_vqt()))
    print(json.dumps(bench_offline_vqt(fast=True)))


if __name__ == "__main__":
    main()
