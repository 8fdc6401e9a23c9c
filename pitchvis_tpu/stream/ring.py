"""Device-resident ring buffer for batched audio streams.

The reference's communication backend is a mutex-protected host ring buffer
written by the audio callback and snapshotted per frame
(pitchvis_audio/src/lib.rs:17-28, pitchvis_viewer/src/vqt_system.rs:59-67).
The TPU-native equivalent keeps a (B, buffer_len) rolled buffer as part of
the jitted streaming carry: each step shifts the window left by the chunk
size and appends the AGC-processed chunk, so the last sample is always
"now" and the VQT reads the trailing n_fft samples with no host round-trip.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core.config import AgcParameters
from ..ops.agc import agc_chunk


class RingState(struct.PyTreeNode):
    """Carry: (B, L) sample window, (B,) AGC gain, plus the reference's
    RingBuffer diagnostics (gain is surfaced to consumers; latency/chunk ms
    are static properties of the configuration)."""

    buffer: jnp.ndarray  # (B, L) f32, last column is "now"
    gain: jnp.ndarray  # (B,)

    @classmethod
    def init(cls, n_streams: int, buffer_len: int) -> "RingState":
        return cls(
            buffer=jnp.zeros((n_streams, buffer_len), jnp.float32),
            gain=jnp.ones(n_streams, jnp.float32),
        )


def ring_push(
    state: RingState,
    chunk: jnp.ndarray,
    agc_params: AgcParameters = AgcParameters(),
) -> RingState:
    """Pushes one chunk per stream: AGC-process the chunk (silence-freeze
    semantics) and append it; whole chunks containing any NON-FINITE sample
    are rejected for that stream (the reference rejects on !is_finite(),
    audio_desktop.rs:102-105 — an Inf would collapse the AGC gain and
    poison every VQT frame the window still covers)."""
    b, t = chunk.shape
    assert state.buffer.shape[0] == b
    if t > state.buffer.shape[1]:
        raise ValueError(
            f"chunk of {t} samples exceeds the {state.buffer.shape[1]}-sample "
            "ring buffer; raise buffer_len or lower the hop"
        )

    bad = jnp.any(~jnp.isfinite(chunk), axis=-1)
    safe_chunk = jnp.where(bad[:, None], 0.0, chunk)

    new_gain, processed = agc_chunk(state.gain, safe_chunk, agc_params)

    rolled = jnp.concatenate([state.buffer[:, t:], processed], axis=-1)
    new_buffer = jnp.where(bad[:, None], state.buffer, rolled)
    new_gain = jnp.where(bad, state.gain, new_gain)
    return RingState(buffer=new_buffer, gain=new_gain)


def ring_window(state: RingState, n_fft: int) -> jnp.ndarray:
    """The trailing n_fft samples per stream (the VQT input)."""
    if n_fft > state.buffer.shape[1]:
        # buffer[:, -n_fft:] would silently return the whole (shorter)
        # buffer and surface later as an opaque VQT shape mismatch
        raise ValueError(
            f"n_fft {n_fft} exceeds the {state.buffer.shape[1]}-sample ring "
            "buffer; init the ring with buffer_len >= n_fft"
        )
    return state.buffer[:, -n_fft:]
