"""Fused Pallas kernel for peak primitives (local maxima + prominences).

Status: EXACT but NOT the default. Measured on the TPU (scan-amortized,
B=256, n=588): this kernel 3.7 ms/step vs 1.3 ms for the XLA n^2 masked
reductions in `ops/peaks.py` — XLA vectorizes the n^2 planes ACROSS frames
and pipelines them better than this kernel's sequential per-frame loop, and
its fusion keeps the (B, n, n) intermediates from materializing after all.
Kept as a validated alternative formulation (bit-identical results) and as
the reference for the Mosaic constraints it encodes:

* everything 2D; batch rides the lane dimension of transposed in/outputs
  (lane-sized tiles), un-transposed by XLA outside
* NO dynamic lane indexing: per-frame columns are extracted with one-hot
  masked reductions and results accumulate into VMEM scratch via one-hot
  writes
* `pltpu.roll` shifts must be non-negative; bool "any" as float max
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38
_POS = 3.0e38


def _peaks_kernel(x_ref, xt_ref, mask_t_ref, prom_t_ref, mask_acc, prom_acc, *, n: int, bt: int):
    i_col = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # peak index i
    j_row = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)  # scanned index j
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (1, bt), 1)  # frame lane

    mask_acc[:, :] = jnp.zeros((n, bt), jnp.float32)
    prom_acc[:, :] = jnp.zeros((n, bt), jnp.float32)

    def one_frame(b, carry):
        onehot = (lane_b == b).astype(jnp.float32)  # (1, bt)
        xi = jnp.sum(xt_ref[:, :] * onehot, axis=1, keepdims=True)  # (n, 1)
        xj = x_ref[pl.ds(b, 1), :]  # (1, n) dynamic sublane read

        # plateau run bounds: change[j] = x[j] != x[j-1] (True at j=0);
        # next_diff[j] = x[j+1] != x[j] (True at j=n-1)
        x_prev = pltpu.roll(xj, 1, axis=1)
        x_next = pltpu.roll(xj, n - 1, axis=1)  # roll by -1 (shifts >= 0)
        prev_diff = (xj != x_prev) | (j_row == 0)
        next_diff = (xj != x_next) | (j_row == n - 1)

        le = j_row <= i_col  # (n, n)
        ge = j_row >= i_col
        s = jnp.max(jnp.where(le & prev_diff, j_row, 0), axis=1, keepdims=True)
        e = jnp.min(jnp.where(ge & next_diff, j_row, n - 1), axis=1, keepdims=True)

        # x[s-1] < x_i / x[e+1] < x_i via one-hot row selects (int-max "any")
        less = (xj < xi).astype(jnp.float32)
        prev_less = jnp.max(jnp.where(j_row == s - 1, less, 0.0), axis=1, keepdims=True)
        next_less = jnp.max(jnp.where(j_row == e + 1, less, 0.0), axis=1, keepdims=True)
        mid = (s + e) // 2
        is_peak = (
            (s > 0) & (e < n - 1) & (prev_less > 0.0) & (next_less > 0.0) & (i_col == mid)
        )

        # prominence: nearest strictly-greater bounds + window minima
        greater = xj > xi
        left_bound = jnp.max(
            jnp.where((j_row < i_col) & greater, j_row, -1), axis=1, keepdims=True
        )
        right_bound = jnp.min(
            jnp.where((j_row > i_col) & greater, j_row, n), axis=1, keepdims=True
        )
        left_min = jnp.min(
            jnp.where((j_row > left_bound) & le, xj, _POS), axis=1, keepdims=True
        )
        right_min = jnp.min(
            jnp.where(ge & (j_row < right_bound), xj, _POS), axis=1, keepdims=True
        )
        prom = xi - jnp.maximum(left_min, right_min)

        # one-hot accumulate into the (n, bt) scratch (no dynamic lane write)
        mask_acc[:, :] += is_peak.astype(jnp.float32) * onehot
        prom_acc[:, :] += prom * onehot
        return carry

    jax.lax.fori_loop(0, bt, one_frame, 0)
    mask_t_ref[:, :] = mask_acc[:, :]
    prom_t_ref[:, :] = prom_acc[:, :]


def local_maxima_and_prominences_pallas(
    x: jax.Array, *, batch_tile: int = 128, interpret: bool | None = None
) -> tuple[jax.Array, jax.Array]:
    """(B, n) spectra -> ((B, n) bool local-max mask, (B, n) f32 prominence),
    matching ops.peaks.local_maxima / prominences exactly.

    The transposed in/outputs put the batch on the lane dimension, so batch
    tiles are lane-sized (multiples of 128) unless a single tile covers the
    whole batch."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n = x.shape
    if b <= batch_tile:
        bt = b_pad = b
    else:
        bt = -(-min(batch_tile, b) // 128) * 128
        b_pad = -(-b // bt) * bt
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0)))

    mask_t, prom_t = pl.pallas_call(
        functools.partial(_peaks_kernel, n=n, bt=bt),
        grid=(b_pad // bt,),
        in_specs=[
            pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((n, b_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, bt), jnp.float32),
            pltpu.VMEM((n, bt), jnp.float32),
        ],
        interpret=interpret,
    )(x, x.T)
    return mask_t.T[:b] > 0.5, prom_t.T[:b]
