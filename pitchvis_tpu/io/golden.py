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


def generate(out_dir: str, params: VqtParameters = GOLDEN_PARAMS,
             filename: str = "vqt_golden.npz") -> str:
    kernel = get_kernel(params)
    sigs = golden_signals(params)
    blobs = {}
    for name, x in sigs.items():
        blobs[f"in_{name}"] = x
        blobs[f"out_{name}"] = vqt_frame_db_np(kernel, x)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, filename)
    np.savez_compressed(path, **blobs)
    return path


def streaming_signal(params: VqtParameters, seconds: float = 1.5) -> np.ndarray:
    """Deterministic streaming test signal: A-major arpeggio with onsets and
    a noise floor (exercises AGC gain motion and EMA state)."""
    sr = params.sr
    n = int(sr * seconds)
    t = np.arange(n) / sr
    rng = np.random.default_rng(42)
    sig = rng.standard_normal(n) * 0.002
    for i, f in enumerate([220.0, 277.18, 329.63, 440.0]):
        start = int(i * 0.3 * sr)
        if start >= n:  # short signals: skip notes past the end
            continue
        seg = slice(start, n)
        tt = t[seg] - start / sr
        sig[seg] += np.sin(2 * np.pi * f * tt) * 0.1 * np.exp(-tt * 1.5)
    return sig.astype(np.float32)


def generate_streaming(out_dir: str, params: VqtParameters | None = None,
                       filename: str = "streaming_golden.npz", hop_hz: float = 60.0,
                       seconds: float = 1.5) -> str:
    """Streaming golden: a fixed signal through ring+AGC+VQT at 60 Hz hops
    (the serving pipeline's stateful path), storing every hop's spectrum.
    A kernel or dB-semantics or AGC regression shifts these spectra."""
    from ..core.config import VqtParameters as VP
    from ..models.pipeline import StreamingPipeline

    params = params or VP()
    sig = streaming_signal(params, seconds)
    hop = int(params.sr / hop_hz)
    pipe = StreamingPipeline(1, params)
    spectra = []
    gains = []
    for i in range(len(sig) // hop):
        out = pipe.step(sig[None, i * hop : (i + 1) * hop], hop / params.sr)
        spectra.append(np.asarray(out.x_vqt[0]))
        gains.append(float(np.asarray(out.gain[0])))
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, filename)
    np.savez_compressed(
        path, signal=sig, hop=hop, spectra=np.stack(spectra), gains=np.asarray(gains)
    )
    return path


def load(path: str) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    out = {}
    with np.load(path) as z:
        names = sorted(k[3:] for k in z.files if k.startswith("in_"))
        for name in names:
            out[name] = (z[f"in_{name}"], z[f"out_{name}"])
    return out


if __name__ == "__main__":
    # The streaming golden runs the JAX pipeline; generate on the CPU
    # backend so the stored spectra match what the (CPU-forced) test suite
    # replays. The frame goldens are pure NumPy f64 and platform-free.
    # Both the env var AND the config update are needed: the environment
    # presets JAX_PLATFORMS=axon and the config update alone does not
    # reliably win against it (measured: the axon backend still
    # initializes and shifts spectra by ~5e-4 dB).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    target = sys.argv[1] if len(sys.argv) > 1 else "tests/golden"
    print(generate(target))
    print(generate(target, VqtParameters(), "vqt_golden_default.npz"))
    print(generate_streaming(target))
