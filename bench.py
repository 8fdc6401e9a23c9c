"""Headline benchmark: batched VQT throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the Rust reference computes one default-parameter VQT frame in
0.165 ms on a desktop CPU core (VQT_REVIEW.md:12-15) ~= 6,060 frames/s.
vs_baseline = our frames/s / 6060.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax

    from pitchvis_tpu.core.config import VqtParameters
    from pitchvis_tpu.ops.vqt import Vqt

    params = VqtParameters()
    path = "time"
    if "--path" in sys.argv:
        path = sys.argv[sys.argv.index("--path") + 1]
    batch = 1024
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])

    vqt = Vqt(params, path=path)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, params.n_fft)).astype(np.float32) * 0.1
    xd = jax.device_put(x)

    # compile + warmup
    out = vqt.calculate_vqt_batch_in_db(xd)
    out.block_until_ready()

    n_iter = 20
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = vqt.calculate_vqt_batch_in_db(xd)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / n_iter
        best = min(best, dt)

    frames_per_sec = batch / best
    baseline = 6060.0  # reference frames/s on one CPU core (0.165 ms/frame)
    print(
        json.dumps(
            {
                "metric": "vqt_frames_per_sec_per_chip",
                "value": round(frames_per_sec, 1),
                "unit": "frames/s",
                "vs_baseline": round(frames_per_sec / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
