"""ML inference stage: VQT history -> MIDI base-pitch strengths.

Port of the viewer's ml_system (pitchvis_viewer/src/ml_system.rs:24-69): a
T-frame history of smoothed VQT spectra feeds the trained Conv1d+MLP and the
128 sigmoid outputs land in ``ml_midi_base_pitches`` for display gating
(update.rs:247-255). The reference's version is bit-rotted (it reads a
removed `history` field and disagrees with train.py about T); here the
history is an explicit rolling carry and T matches the training window.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from .pitch_mlp import PitchMLP


class MlState(struct.PyTreeNode):
    """Rolling (T, n_buckets) history per stream (newest last)."""

    history: jnp.ndarray

    @classmethod
    def init(cls, t_window: int, n_buckets: int) -> "MlState":
        return cls(history=jnp.zeros((t_window, n_buckets), jnp.float32))


@partial(jax.jit, static_argnums=(0,))
def ml_step(
    model: PitchMLP,
    params,
    state: MlState,
    x_vqt_smoothed: jnp.ndarray,
) -> tuple[MlState, jnp.ndarray]:
    """Pushes the newest frame and infers (128,) MIDI strengths."""
    history = jnp.concatenate([state.history[1:], x_vqt_smoothed[None, :]], axis=0)
    out = model.apply(params, history.reshape(1, 1, -1))[0]
    return MlState(history=history), out


def ml_step_batch(model: PitchMLP, params, state: MlState, x: jnp.ndarray):
    """Batched over streams: state.history (B, T, n), x (B, n)."""
    history = jnp.concatenate([state.history[:, 1:], x[:, None, :]], axis=1)
    b = history.shape[0]
    out = model.apply(params, history.reshape(b, 1, -1))
    return MlState(history=history), out


def init_ml_state_batch(n_streams: int, t_window: int, n_buckets: int) -> MlState:
    return MlState(history=jnp.zeros((n_streams, t_window, n_buckets), jnp.float32))
