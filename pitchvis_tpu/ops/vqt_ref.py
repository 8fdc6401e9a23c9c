"""NumPy reference implementation of the per-frame VQT compute.

Mirrors `Vqt::calculate_vqt_instant_in_db` (pitchvis_analysis/src/vqt.rs:
866-916) and `power_to_db` (vqt.rs:922-954) exactly: per window group, slice
the input, real FFT over the half spectrum, complex kernel mat-vec plus
conjugate-part accumulation, then dB conversion. Used as the golden oracle
for the JAX/Pallas paths (<=1e-4 max abs error contract, BASELINE.md)."""

from __future__ import annotations

import numpy as np

from ..kernel.builder import VqtKernel

REF_POWER = 0.3 * 0.3
A_MIN = 1e-6 * 1e-6
TOP_DB = 60.0


def power_to_db_np(x_vqt: np.ndarray) -> np.ndarray:
    """dB conversion relative to a fixed reference power, clamped to a 60 dB
    range below the frame maximum and shifted non-negative (vqt.rs:922-954).

    Accepts complex VQT coefficients of shape (..., n_buckets); the frame
    max/min reductions run over the last axis.
    """
    ref_db = 10.0 * np.log10(REF_POWER)
    power = np.abs(x_vqt) ** 2
    log_spec = 10.0 * np.log10(np.maximum(power, A_MIN)) - ref_db

    log_spec_max = log_spec.max(axis=-1, keepdims=True)
    log_spec_min = log_spec.min(axis=-1, keepdims=True)
    floor = log_spec_max - TOP_DB
    log_spec_min = np.maximum(log_spec_min, floor)

    clamped = np.maximum(log_spec, floor)
    return np.where(log_spec_min > 0.0, clamped - log_spec_min, np.maximum(clamped, 0.0))


def vqt_frame_complex_np(kernel: VqtKernel, x: np.ndarray) -> np.ndarray:
    """Complex VQT coefficients of one n_fft frame (before dB)."""
    assert x.shape == (kernel.params.n_fft,), "input must be exactly n_fft samples"
    out = np.zeros(kernel.n_buckets, dtype=np.complex128)
    for g in kernel.window_groups:
        begin, end = g.window
        spectrum = np.fft.rfft(x[begin:end].astype(np.float64))
        y = g.filter_bank @ spectrum
        if g.has_negative_part:
            y = y + np.conj(g.negative_filter_bank @ spectrum)
        out[g.row_offset : g.row_offset + g.n_filters] = y
    return out


def vqt_frame_db_np(kernel: VqtKernel, x: np.ndarray) -> np.ndarray:
    """Per-frame VQT in dB scale (vqt.rs:866-916)."""
    return power_to_db_np(vqt_frame_complex_np(kernel, x)).astype(np.float32)
