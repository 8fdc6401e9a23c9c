"""Golden-file tooling.

Generates and checks golden VQT spectra: fixed synthetic signals (sine
mixtures, chirps, noise bursts — deterministic seeds) are run through the
float64 NumPy oracle (`ops/vqt_ref.py`, the literal port of the reference
semantics) and stored as .npz. Regression tests then hold every compute path
to the goldens, so kernel/compiler changes can't silently shift the spectrum.

Regenerate (only when semantics intentionally change):
    python -m pitchvis_tpu.io.golden tests/golden
"""

from __future__ import annotations

import os
import sys

import numpy as np

from ..core.config import VqtParameters, VqtRange
from ..kernel.builder import get_kernel
from ..ops.vqt_ref import vqt_frame_db_np

GOLDEN_PARAMS = VqtParameters(
    sr=22050.0,
    n_fft=8192,
    range=VqtRange(min_freq=110.0, octaves=4, buckets_per_octave=24),
    sparsity_quantile=0.999,
    quality=1.6,
    gamma=4.8 * 1.6,
)


def golden_signals(params: VqtParameters) -> dict[str, np.ndarray]:
    """Deterministic test signals covering tones, chords, chirps, noise."""
    n = params.n_fft
    sr = params.sr
    t = np.arange(n) / sr
    rng = np.random.default_rng(1234)

    sigs = {
        "tone_a3": np.sin(2 * np.pi * 220.0 * t) / 12.0,
        "chord_a_major": (
            np.sin(2 * np.pi * 220.0 * t)
            + np.sin(2 * np.pi * 277.18 * t)
            + np.sin(2 * np.pi * 329.63 * t)
        )
        / 12.0,
        "detuned_pair": (
            np.sin(2 * np.pi * 440.0 * t) + np.sin(2 * np.pi * 452.0 * t)
        )
        / 12.0,
        "chirp": np.sin(2 * np.pi * (150.0 * t + 400.0 * t * t)) / 12.0,
        "noise": rng.standard_normal(n) * 0.02,
        "tone_plus_noise": np.sin(2 * np.pi * 523.25 * t) / 12.0
        + rng.standard_normal(n) * 0.005,
        "silence": np.zeros(n),
        "impulse": np.eye(1, n, n // 2)[0] * 0.5,
    }
    return {k: v.astype(np.float32) for k, v in sigs.items()}


def generate(out_dir: str, params: VqtParameters = GOLDEN_PARAMS) -> str:
    kernel = get_kernel(params)
    sigs = golden_signals(params)
    blobs = {}
    for name, x in sigs.items():
        blobs[f"in_{name}"] = x
        blobs[f"out_{name}"] = vqt_frame_db_np(kernel, x)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "vqt_golden.npz")
    np.savez_compressed(path, **blobs)
    return path


def load(path: str) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    out = {}
    with np.load(path) as z:
        names = sorted(k[3:] for k in z.files if k.startswith("in_"))
        for name in names:
            out[name] = (z[f"in_{name}"], z[f"out_{name}"])
    return out


if __name__ == "__main__":
    target = sys.argv[1] if len(sys.argv) > 1 else "tests/golden"
    print(generate(target))
