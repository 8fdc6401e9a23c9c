"""Batched polyphase resampling.

The reference resamples WASM microphone input (44.1/48 kHz) to 22050 Hz with
rubato's `FftFixedIn` (pitchvis_audio/src/audio_wasm.rs:176-209). The
TPU-native equivalent is a windowed-sinc polyphase resampler expressed as a
gather + small contraction per output sample — static shapes, batched over
streams, MXU/VPU friendly (BASELINE.json names the batched polyphase
resampler as a pipeline stage).

For a rational ratio L/M (out/in): y[j] = sum_t h[phase_j + t*L] * x[m_j - t]
with m_j = floor(j*M/L), phase_j = (j*M) mod L, h a lowpass prototype of
length T*L scaled by L. Chunk sizes are constrained to multiples of M so the
phase pattern is static per chunk (the streaming state is just the last T-1
input samples).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


def _design_prototype(l: int, m: int, taps_per_phase: int) -> np.ndarray:
    """Windowed-sinc lowpass prototype for L-fold interpolation followed by
    M-fold decimation; cutoff at min(1/L, 1/M) of the upsampled Nyquist with
    a small rolloff margin, Blackman-Harris windowed."""
    n_taps = taps_per_phase * l
    cutoff = 0.95 * min(1.0 / l, 1.0 / m)  # fraction of upsampled rate /2 pairs
    t = np.arange(n_taps) - (n_taps - 1) / 2.0
    sinc = np.sinc(cutoff * t)
    w = (
        0.35875
        - 0.48829 * np.cos(2 * np.pi * np.arange(n_taps) / (n_taps - 1))
        + 0.14128 * np.cos(4 * np.pi * np.arange(n_taps) / (n_taps - 1))
        - 0.01168 * np.cos(6 * np.pi * np.arange(n_taps) / (n_taps - 1))
    )
    h = sinc * w
    h *= cutoff  # normalize lowpass gain
    h *= l  # compensate zero-stuffing
    # normalize DC gain exactly: sum over each phase ~ 1
    h /= np.sum(h) / l
    return h.astype(np.float64)


@dataclass(frozen=True)
class ResamplerSpec:
    sr_in: int
    sr_out: int
    l: int
    m: int
    taps_per_phase: int

    @property
    def history_len(self) -> int:
        return self.taps_per_phase


def make_spec(sr_in: int, sr_out: int, taps_per_phase: int = 24) -> ResamplerSpec:
    g = math.gcd(sr_in, sr_out)
    return ResamplerSpec(sr_in, sr_out, l=sr_out // g, m=sr_in // g, taps_per_phase=taps_per_phase)


class PolyphaseResampler:
    """Streaming batched resampler: fixed input chunks (multiple of M) ->
    fixed output chunks of n_in * L / M samples."""

    def __init__(self, sr_in: int, sr_out: int, chunk_in: int, taps_per_phase: int = 24):
        self.spec = make_spec(sr_in, sr_out, taps_per_phase)
        l, m, t = self.spec.l, self.spec.m, taps_per_phase
        if chunk_in % m != 0:
            raise ValueError(f"chunk_in must be a multiple of {m} for sr {sr_in}->{sr_out}")
        self.chunk_in = chunk_in
        self.chunk_out = chunk_in * l // m

        # group delay: the prototype peaks at (n_taps-1)/2 upsampled ticks
        self.delay_secs = (t * l - 1) / 2.0 / (l * sr_in)

        h = _design_prototype(l, m, t)
        j = np.arange(self.chunk_out)
        pos = j * m  # position in upsampled grid
        m_j = pos // l  # input-sample index of phase start
        phase = pos % l
        # h index for tap t_i: phase + t_i * l ; input index: m_j - t_i
        taps = np.stack([h[phase + ti * l] for ti in range(t)], axis=1)  # (n_out, T)
        self._taps = jnp.asarray(taps, jnp.float32)
        # gather indices into [history | chunk] of length T-1 + chunk_in:
        # absolute input index (m_j - ti) maps to offset (T-1) + m_j - ti
        idx = (t - 1) + m_j[:, None] - np.arange(t)[None, :]
        assert idx.min() >= 0
        self._idx = jnp.asarray(idx, jnp.int32)  # (n_out, T)

    def init_state(self, n_streams: int) -> jnp.ndarray:
        """History: the last T-1 input samples per stream."""
        return jnp.zeros((n_streams, self.spec.taps_per_phase - 1), jnp.float32)

    def process(self, history: jnp.ndarray, chunk: jnp.ndarray):
        """(B, T-1) history + (B, chunk_in) -> (new history, (B, chunk_out))."""
        assert chunk.shape[-1] == self.chunk_in
        ext = jnp.concatenate([history, chunk], axis=-1)  # (B, T-1+chunk_in)
        windows = ext[:, self._idx]  # (B, n_out, T)
        out = jnp.einsum("bot,ot->bo", windows, self._taps)
        new_history = ext[:, -(self.spec.taps_per_phase - 1) :]
        return new_history, out


def resample(x: np.ndarray, sr_in: int, sr_out: int, taps_per_phase: int = 24) -> np.ndarray:
    """Offline convenience: resample (..., n) host audio, trimming to a
    multiple of M."""
    spec = make_spec(sr_in, sr_out, taps_per_phase)
    x = np.atleast_2d(np.asarray(x, np.float32))
    n = (x.shape[-1] // spec.m) * spec.m
    rs = PolyphaseResampler(sr_in, sr_out, n, taps_per_phase)
    _, out = rs.process(rs.init_state(x.shape[0]), jnp.asarray(x[..., :n]))
    return np.asarray(out)
