"""Pitch-recognition model: Conv1d + MLP -> 128 MIDI sigmoid outputs.

Flax port of the reference's PyTorch model (pitchvis_train/train.py:67-106):
Conv1d(1->16, kernel 5, stride 2, no padding) -> ReLU -> max_pool(2) ->
Linear(mlp_size) -> ReLU -> [Linear + ReLU + Dropout(0.1)] * mlp_layers ->
Linear(128) -> sigmoid. Input is a window of T consecutive VQT frames
flattened to (B, 1, T * n_buckets).

Note: the reference is internally inconsistent about T (train.py uses T=5,
ml_system.rs:5 uses T=3); T is a constructor argument here with the training
default of 5.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

DEFAULT_T = 5
DEFAULT_N_BUCKETS = 7 * 36  # train config: 7 octaves, 36 buckets/octave
N_MIDI = 128


class PitchMLP(nn.Module):
    input_bins: int = DEFAULT_T * DEFAULT_N_BUCKETS
    mlp_size: int = 1024
    mlp_layers: int = 2
    output_size: int = N_MIDI
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        """x: (B, 1, input_bins) or (B, input_bins). Returns (B, 128) in
        (0, 1)."""
        if x.ndim == 2:
            x = x[:, None, :]
        if x.shape[-1] != self.input_bins:
            # every layer shape derives from the actual input, so a
            # t_window/n_buckets mismatch would otherwise only surface as a
            # cryptic Dense kernel-shape error when applying trained params
            raise ValueError(
                f"input has {x.shape[-1]} bins, model configured for "
                f"{self.input_bins}"
            )
        b = x.shape[0]
        # Conv1d(1, 16, k=5, s=2, p=0): flax conv is NWC
        h = jnp.transpose(x, (0, 2, 1))  # (B, L, 1)
        h = nn.Conv(16, kernel_size=(5,), strides=(2,), padding="VALID")(h)
        h = nn.relu(h)
        # max_pool1d(kernel 2, stride 2)
        h = nn.max_pool(h, window_shape=(2,), strides=(2,))
        h = h.transpose(0, 2, 1).reshape(b, -1)  # channel-major flatten like torch

        h = nn.relu(nn.Dense(self.mlp_size)(h))
        for _ in range(self.mlp_layers):
            h = nn.relu(nn.Dense(self.mlp_size)(h))
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.output_size)(h)
        return nn.sigmoid(h)


def infer_window(params, model: PitchMLP, vqt_frames: jnp.ndarray) -> jnp.ndarray:
    """Inference hook mirroring ml_system::infer (pitchvis_viewer/src/
    ml_system.rs:24-38): T history frames (B, T, n_buckets) -> (B, 128)
    MIDI base-pitch strengths."""
    b = vqt_frames.shape[0]
    flat = vqt_frames.reshape(b, 1, -1)
    return model.apply(params, flat)
