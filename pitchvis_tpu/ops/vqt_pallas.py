"""Fused Pallas VQT kernel.

One `pallas_call` computes the entire multi-group VQT power spectrum:

* the batch tile's 8192-sample tail window is loaded into VMEM **once** and
  every window group's matmul slices it in place (the XLA path re-reads each
  group's sub-window from HBM: ~15.4k samples/frame vs 8.2k here);
* per-group time-domain weights stream from HBM in K-tiles with
  double-buffered async DMA overlapping the MXU;
* the complex magnitude-squared (re^2 + im^2) is fused into the kernel so
  only (B, n_buckets) power leaves, not (B, 2*n_buckets) re/im pairs.

Group weights are zero-padded to lane multiples of 128 at pack time
(re and im halves padded separately so the power combine stays a static
split). Mathematically identical to ops/vqt.py's "time" path.

All multi-rate window groups nest inside the largest group's window (they
share a common center or are right-aligned; vqt.rs:627-634), which is what
makes the single-tail load valid — asserted at pack time.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernel.builder import VqtKernel
from .vqt import precision_for

LANE = 128
K_TILE = 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_pytree_node_class
@dataclass
class PallasVqtArrays:
    """Padded per-group weights + static geometry for the fused kernel."""

    weights: tuple[jax.Array, ...]  # per group (w_g, 2*nf_pad_g) f32, HBM
    offsets: tuple[int, ...]  # group window offset within the tail
    window_sizes: tuple[int, ...]
    nf: tuple[int, ...]  # true filter counts
    nf_pad: tuple[int, ...]
    tail: int  # tail window size (largest group window)
    n_fft: int
    n_buckets: int

    def tree_flatten(self):
        return (self.weights,), (
            self.offsets,
            self.window_sizes,
            self.nf,
            self.nf_pad,
            self.tail,
            self.n_fft,
            self.n_buckets,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        (weights,) = children
        return cls(weights, *aux)

    @classmethod
    def from_kernel(cls, kernel: VqtKernel, dtype=jnp.float32) -> "PallasVqtArrays":
        """``dtype=jnp.bfloat16``: fast mode — halves the weight DMA traffic
        (this kernel is DMA-bound) and each K-tile matmul becomes ONE MXU
        pass with f32 accumulation instead of HIGHEST's 6-pass f32
        decomposition. Error budget identical to the dense bf16 path
        (tests/test_bf16.py)."""
        n_fft = kernel.params.n_fft
        tail_begin = min(g.window[0] for g in kernel.window_groups)
        tail = n_fft - tail_begin
        weights = []
        offsets = []
        sizes = []
        nf = []
        nf_pad = []
        for g in kernel.window_groups:
            begin, end = g.window
            assert begin >= tail_begin and end <= n_fft, "group window outside tail"
            w = g.w_time  # (window, 2*nf)
            f = g.n_filters
            fp = _round_up(f, LANE)
            padded = np.zeros((w.shape[0], 2 * fp), np.float32)
            padded[:, :f] = w[:, :f]  # re half
            padded[:, fp : fp + f] = w[:, f:]  # im half
            weights.append(jnp.asarray(padded, dtype=dtype))
            offsets.append(begin - tail_begin)
            sizes.append(w.shape[0])
            nf.append(f)
            nf_pad.append(fp)
        return cls(
            weights=tuple(weights),
            offsets=tuple(offsets),
            window_sizes=tuple(sizes),
            nf=tuple(nf),
            nf_pad=tuple(nf_pad),
            tail=tail,
            n_fft=n_fft,
            n_buckets=kernel.n_buckets,
        )


def _vqt_kernel_body(x_ref, *rest, geometry):
    """Grid step: one batch tile. rest = (*w_refs_hbm, out_ref, acc, wbuf,
    sems)."""
    offsets, sizes, nfs, nf_pads = geometry
    n_groups = len(offsets)
    w_refs = rest[:n_groups]
    out_ref = rest[n_groups]
    acc_ref = rest[n_groups + 1]
    wbuf_ref = rest[n_groups + 2]
    sem = rest[n_groups + 3]

    col = 0
    for g in range(n_groups):
        w_g = w_refs[g]
        off = offsets[g]
        size = sizes[g]
        nf = nfs[g]
        nfp = nf_pads[g]
        width = 2 * nfp
        # groups SMALLER than K_TILE (reachable at e.g. 36 bpo + quality 1.8,
        # which yields a 512-sample group) use their own size as the tile;
        # a non-K_TILE-divisible size gets a short FINAL tile (all sizes are
        # trace-time constants, so every iteration keeps static shapes) —
        # truncating to size//kt tiles would silently DROP the remainder
        # samples from the dot product
        kt = min(K_TILE, size)
        n_k = -(-size // kt)

        def dma(slot, k_idx):
            kk = min(kt, size - k_idx * kt)
            return pltpu.make_async_copy(
                w_g.at[pl.ds(k_idx * kt, kk), :],
                wbuf_ref.at[slot, pl.ds(0, kk), pl.ds(0, width)],
                sem.at[slot],
            )

        dma(0, 0).start()
        acc_ref[:, :width] = jnp.zeros_like(acc_ref[:, :width])
        for k in range(n_k):
            slot = k % 2
            if k + 1 < n_k:
                dma((k + 1) % 2, k + 1).start()
            dma(slot, k).wait()
            kk = min(kt, size - k * kt)
            x_sub = x_ref[:, pl.ds(off + k * kt, kk)]
            w_tile = wbuf_ref[slot, pl.ds(0, kk), pl.ds(0, width)]
            # bf16 weights: one MXU pass, f32 accumulate; f32: exact 6-pass
            acc_ref[:, :width] += jnp.dot(
                x_sub.astype(w_tile.dtype),
                w_tile,
                preferred_element_type=jnp.float32,
                precision=precision_for(w_tile.dtype),
            )
        re = acc_ref[:, pl.ds(0, nfp)]
        im = acc_ref[:, pl.ds(nfp, nfp)]
        power = re * re + im * im
        out_ref[:, pl.ds(col, nf)] = power[:, :nf]
        col += nf


# VMEM budget for the resident-weights kernel: the v5e scoped limit is
# 16 MB; leave ~1 MB headroom for Mosaic's own temporaries/semaphores.
_VMEM_RESIDENT_BUDGET = 15 * 1024 * 1024
# Resident mode prefers a SMALL batch tile: the weights occupy most of
# VMEM, and the MXU is indifferent to M=64/128/512 at these K (measured
# within 1% on the streaming kernel). 64 fits the accounting below at
# default-class configs; 128 exceeds the limit once block double-buffering
# is counted (and was measured to OOM the eager compile path). Tiles are
# tried largest-first: configs whose weights outgrow the bt=64 budget
# (e.g. a live rebuild at quality*1.1 -> 13.5 MB bf16) drop to bt=32
# and stay resident instead of falling off the fast path.
_RESIDENT_BATCH_TILES = (64, 32)


def _vqt_resident_kernel_body(x_ref, *rest, geometry):
    """Resident-weights variant: every group's FULL padded weight matrix
    lives in VMEM for the whole grid (constant index_map -> fetched once),
    so each group is ONE un-tiled MXU dot — no split-K accumulator traffic,
    no DMA double-buffering. Only reachable in bf16 fast mode at default-
    class configs (all weights ~10.5 MB); f32 falls back to the streaming
    kernel below. Measured: ~1.9x the streaming kernel's throughput at
    B=2048 (docs/PERFORMANCE.md round-3 section)."""
    offsets, sizes, nfs, nf_pads = geometry
    n_groups = len(offsets)
    w_refs = rest[:n_groups]
    out_ref = rest[n_groups]

    col = 0
    for g in range(n_groups):
        w = w_refs[g][...]
        off = offsets[g]
        size = sizes[g]
        nf = nfs[g]
        nfp = nf_pads[g]
        x_sub = x_ref[:, pl.ds(off, size)]
        y = jnp.dot(
            x_sub.astype(w.dtype),
            w,
            preferred_element_type=jnp.float32,
            precision=precision_for(w.dtype),
        )
        re = y[:, :nfp]
        im = y[:, nfp : 2 * nfp]
        power = re * re + im * im
        out_ref[:, pl.ds(col, nf)] = power[:, :nf]
        col += nf


def _resident_feasible(arrays: "PallasVqtArrays", batch_tile: int) -> bool:
    """VMEM accounting for the resident kernel. Mosaic DOUBLE-BUFFERS the
    grid-revisited input/output blocks (prefetch of step i+1 overlaps step
    i), so x and out count twice; the weights (constant index_map) are
    fetched once. Validated against measured compiles at default-class bf16:
    bt=64 -> ~14.2 MB (compiles, incl. eagerly), bt=128 -> ~17.4 MB
    (rejected here, and measured to OOM the 16 MB scoped limit)."""
    w_bytes = sum(int(np.prod(w.shape)) * w.dtype.itemsize for w in arrays.weights)
    x_bytes = 2 * batch_tile * arrays.tail * arrays.weights[0].dtype.itemsize
    # live per-group intermediates: the (bt, 2*nfp) f32 dot result + power
    acc_bytes = 2 * batch_tile * 2 * max(arrays.nf_pad) * 4
    out_bytes = 2 * batch_tile * arrays.n_buckets * 4
    return w_bytes + x_bytes + acc_bytes + out_bytes <= _VMEM_RESIDENT_BUDGET


def vqt_power_pallas(
    arrays: PallasVqtArrays,
    x: jax.Array,
    *,
    batch_tile: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    """|VQT|^2 of a batch of frames via the fused kernel.

    x: (B, n_fft) or (B, tail) f32 -> (B, n_buckets) f32.
    """
    if x.shape[1] == arrays.n_fft:
        x = jax.lax.slice_in_dim(x, arrays.n_fft - arrays.tail, arrays.n_fft, axis=1)
    assert x.shape[1] == arrays.tail, f"expected tail {arrays.tail}, got {x.shape[1]}"
    w_dtype = arrays.weights[0].dtype
    if w_dtype == jnp.bfloat16:
        # fast mode: the kernel multiplies in bf16 anyway (x_sub is cast to
        # the weight dtype inside), so casting BEFORE the pallas_call halves
        # the input-tail DMA into VMEM at identical numerics (~3-5% on chip)
        x = x.astype(w_dtype)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Mosaic requires the block's sublane dim divisible by 8 or equal to the
    # array dim: a single tile covers small batches exactly; otherwise tiles
    # are multiples of 8 and the batch is padded up. Pick the kernel variant
    # FIRST so the batch is padded exactly once, to the chosen tile.
    b = x.shape[0]
    if b == 0:  # grid of 0 tiles is degenerate; match the dense paths
        return jnp.zeros((0, arrays.n_buckets), jnp.float32)
    if b <= batch_tile:
        bt = b_pad = b
    else:
        bt = _round_up(min(batch_tile, b), 8)
        b_pad = _round_up(b, bt)
    # Resident-weights fast path: shrink the batch tile so the full weight
    # set stays VMEM-resident across the grid (bf16 default-class configs).
    resident = False
    for tile in _RESIDENT_BATCH_TILES:
        bt_res = bt if b <= tile else min(bt, tile)
        if _resident_feasible(arrays, bt_res):
            resident = True
            bt = bt_res
            b_pad = _round_up(b, bt_res)
            break
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0)))

    max_width = 2 * max(arrays.nf_pad)
    geometry = (arrays.offsets, arrays.window_sizes, arrays.nf, arrays.nf_pad)

    if resident:
        out = pl.pallas_call(
            functools.partial(_vqt_resident_kernel_body, geometry=geometry),
            grid=(b_pad // bt,),
            in_specs=[
                pl.BlockSpec(
                    (bt, arrays.tail), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            ]
            + [
                pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
                for w in arrays.weights
            ],
            out_specs=pl.BlockSpec(
                (bt, arrays.n_buckets), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((b_pad, arrays.n_buckets), jnp.float32),
            interpret=interpret,
        )(x, *arrays.weights)
        return out[:b]

    out = pl.pallas_call(
        functools.partial(_vqt_kernel_body, geometry=geometry),
        grid=(b_pad // bt,),
        in_specs=[
            pl.BlockSpec((bt, arrays.tail), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        # Weights pinned to HBM: with ANY, Mosaic places a weight set that
        # happens to fit VMEM (e.g. 13.5 MB bf16 after a quality*1.1
        # rebuild) into scoped VMEM on top of the double-buffered blocks
        # and the compile dies at 18 MB > 16 MB scoped limit. The kernel
        # DMAs its own K-tiles; the weights must stay off-chip.
        + [
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
            for _ in arrays.weights
        ],
        out_specs=pl.BlockSpec((bt, arrays.n_buckets), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, arrays.n_buckets), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bt, max_width), jnp.float32),  # accumulator
            pltpu.VMEM((2, K_TILE, max_width), arrays.weights[0].dtype),  # weight double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, *arrays.weights)
    return out[:b]


def vqt_db_pallas(arrays: PallasVqtArrays, x: jax.Array, **kw) -> jax.Array:
    from .vqt import power_to_db

    return power_to_db(vqt_power_pallas(arrays, x, **kw))
