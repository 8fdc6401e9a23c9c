"""Digital automatic gain control.

TPU-native port of the dagc `MonoAgc` recurrence (dagc_fork/src/lib.rs:76-87):

    x' = x * gain
    if not frozen:
        y = x'^2 / desired_output_rms
        g = max(1 + k * (1 - y), k)        # k = distortion_factor
        gain *= g

The gain update is an inherently sequential per-sample nonlinear recurrence,
expressed as a `lax.scan` over the chunk's time axis with the stream batch
vectorized in the carry — at audio rates (a 60 Hz hop is ~368 samples) the
scan is short and the per-step work is one fused VPU op over all streams.

Freeze semantics follow the audio callbacks (pitchvis_audio/src/
audio_desktop.rs:99-127, pitchvis_train/src/train.rs:301-310): the gain is
frozen for a whole chunk when the *pre-gain* chunk energy is below 1e-6, and
chunks containing NaN are rejected outright.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import AgcParameters

SILENCE_ENERGY = 1e-6


def agc_chunk(
    gain: jnp.ndarray,
    chunk: jnp.ndarray,
    params: AgcParameters = AgcParameters(),
    frozen: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Applies AGC to one chunk of samples per stream.

    Args:
      gain: (B,) current gain per stream.
      chunk: (B, T) raw samples.
      frozen: optional (B,) bool; default = per-chunk silence freeze
        (sum of squares < 1e-6, matching the reference callbacks).

    Returns (new_gain, processed_chunk).
    """
    if frozen is None:
        frozen = jnp.sum(chunk * chunk, axis=-1) < SILENCE_ENERGY
    k = params.distortion_factor
    inv_rms = 1.0 / params.desired_output_rms

    def step(g, x_t):
        out = x_t * g
        y = out * out * inv_rms
        upd = jnp.maximum(1.0 + k * (1.0 - y), k)
        g_new = jnp.where(frozen, g, g * upd)
        return g_new, out

    # unroll=4: ~16% faster on chip (0.47 -> 0.39 ms/hop at B=4096) by
    # amortizing the scan's per-step control overhead; exact same recurrence
    new_gain, out_t = jax.lax.scan(step, gain, jnp.moveaxis(chunk, -1, 0), unroll=4)
    return new_gain, jnp.moveaxis(out_t, 0, -1)


def agc_init(n_streams: int) -> jnp.ndarray:
    return jnp.ones(n_streams, jnp.float32)
