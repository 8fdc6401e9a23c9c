"""Experiment (round-2 verdict item 4 / ROADMAP item 2): two-pass Pallas
prominence kernel sharing the x>h comparison plane across the four
reductions of ops/peaks.py::prominences_compact.

Plane-traffic accounting (per candidate-slot x position element):
  XLA formulation: 4 independent masked reduces
    pass L-bound: cmp(j<c), cmp(x>h), and, select, max   = 5 ops
    pass R-bound: cmp(j>c), cmp(x>h), and, select, min   = 5 ops  (x>h recomputed
                  unless XLA multi-output-fuses the two reduces)
    pass L-min:   cmp(j>lb), cmp(j<=c), and, select, min = 5 ops
    pass R-min:   cmp(j>=c), cmp(j<rb), and, select, min = 5 ops
    total <= 20 ops/element, 4 plane traversals
  Two-pass kernel: gt=x>h computed ONCE per pass-1 element; both bounds from
  it (7 ops); pass 2 shares the x load for both minima (8 ops):
    total ~15 ops/element, 2 plane traversals
  -> theoretical ceiling ~1.33x IF XLA does zero cross-reduce fusion today.

Run on the real chip from /root/repo: python exp_prom_pallas.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pitchvis_tpu.ops.peaks import _NEG, _POS, local_maxima, prominences_compact

LANE = 128


def _bounds_kernel(x_ref, c_ref, h_ref, lb_ref, rb_ref, *, n):
    """Grid (batch_tiles, j_tiles): accumulate both bounds from ONE shared
    gt plane per (bt, n2, LANE) tile. Output blocks are revisited across the
    j axis (TPU grids iterate sequentially), so the running max/min lives in
    the output refs themselves."""
    bt, n2 = c_ref.shape
    jt = pl.program_id(1)
    j = jax.lax.broadcasted_iota(jnp.int32, (bt, n2, LANE), 2) + jt * LANE
    xj = x_ref[...][:, None, :]
    ci = c_ref[...][:, :, None]
    gt = xj > h_ref[...][:, :, None]  # the SHARED comparison plane

    lb_t = jnp.max(jnp.where(gt & (j < ci), j, -1), axis=2)
    rb_t = jnp.min(jnp.where(gt & (j > ci), j, n), axis=2)

    @pl.when(jt == 0)
    def _init():
        lb_ref[...] = lb_t
        rb_ref[...] = rb_t

    @pl.when(jt > 0)
    def _acc():
        lb_ref[...] = jnp.maximum(lb_ref[...], lb_t)
        rb_ref[...] = jnp.minimum(rb_ref[...], rb_t)


def _mins2_kernel(x_ref, c_ref, h_ref, lb_ref, rb_ref, lmin_ref, rmin_ref, *, n):
    """Second pass: both window minima from ONE x tile load per grid step,
    each carried in its own output ref across the j tiles."""
    bt, n2 = c_ref.shape
    jt = pl.program_id(1)
    j = jax.lax.broadcasted_iota(jnp.int32, (bt, n2, LANE), 2) + jt * LANE
    xj = x_ref[...][:, None, :]
    ci = c_ref[...][:, :, None]
    lbi = lb_ref[...][:, :, None]
    rbi = rb_ref[...][:, :, None]

    lmin_t = jnp.min(jnp.where((j > lbi) & (j <= ci), xj, _POS), axis=2)
    rmin_t = jnp.min(jnp.where((j >= ci) & (j < rbi), xj, _POS), axis=2)

    @pl.when(jt == 0)
    def _init():
        lmin_ref[...] = lmin_t
        rmin_ref[...] = rmin_t

    @pl.when(jt > 0)
    def _acc():
        lmin_ref[...] = jnp.minimum(lmin_ref[...], lmin_t)
        rmin_ref[...] = jnp.minimum(rmin_ref[...], rmin_t)


def prominences_compact_pallas(x, lmax, *, batch_tile=8, interpret=None):
    """Batched (B, n) -> per-bin prominences, exact vs prominences_compact."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n = x.shape
    n2 = (n + 1) // 2
    pad = 2 * n2 - n
    n2p = -(-n2 // LANE) * LANE  # pad candidate axis to lane multiple
    n_pad = -(-n // LANE) * LANE

    xp = jnp.pad(x, ((0, 0), (0, pad)), constant_values=_NEG)
    lp = jnp.pad(lmax, ((0, 0), (0, pad)), constant_values=False)
    x2 = xp.reshape(b, n2, 2)
    l2 = lp.reshape(b, n2, 2)
    first = l2[:, :, 0]
    valid = first | l2[:, :, 1]
    k = jnp.arange(n2)[None, :]
    c = jnp.where(first, k * 2, k * 2 + 1).astype(jnp.int32)
    h = jnp.where(first, x2[:, :, 0], x2[:, :, 1])
    h = jnp.where(valid, h, _POS)

    c = jnp.pad(c, ((0, 0), (0, n2p - n2)), constant_values=0)
    h = jnp.pad(h, ((0, 0), (0, n2p - n2)), constant_values=_POS)
    x_in = jnp.pad(x, ((0, 0), (0, n_pad - n)), constant_values=_NEG)

    bt = min(batch_tile, b)
    b_pad = -(-b // bt) * bt
    if b_pad != b:
        x_in = jnp.pad(x_in, ((0, b_pad - b), (0, 0)), constant_values=_NEG)
        c = jnp.pad(c, ((0, b_pad - b), (0, 0)), constant_values=0)
        h = jnp.pad(h, ((0, b_pad - b), (0, 0)), constant_values=_POS)

    grid = (b_pad // bt, n_pad // LANE)
    x_spec = pl.BlockSpec((bt, LANE), lambda i, jt: (i, jt))
    k_spec = pl.BlockSpec((bt, n2p), lambda i, jt: (i, 0))

    lb, rb = pl.pallas_call(
        functools.partial(_bounds_kernel, n=n),
        grid=grid,
        in_specs=[x_spec, k_spec, k_spec],
        out_specs=[k_spec, k_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, n2p), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, n2p), jnp.int32),
        ],
        interpret=interpret,
    )(x_in, c, h)

    # pass 2: two running minima (max/min do not commute across tiles, so
    # the left and right minima are separate carried outputs)
    lmin, rmin = pl.pallas_call(
        functools.partial(_mins2_kernel, n=n),
        grid=grid,
        in_specs=[x_spec, k_spec, k_spec, k_spec, k_spec],
        out_specs=[k_spec, k_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, n2p), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, n2p), jnp.float32),
        ],
        interpret=interpret,
    )(x_in, c, h, lb, rb)
    prom_k = (h - jnp.maximum(lmin, rmin))[:b, :n2]

    prom_k = jnp.where(valid, prom_k, _NEG)
    out2 = jnp.stack(
        [
            jnp.where(first, prom_k, _NEG),
            jnp.where(~first & l2[:, :, 1], prom_k, _NEG),
        ],
        axis=2,
    )
    return out2.reshape(b, -1)[:, :n]


def main():
    rng = np.random.default_rng(0)
    n = 588
    B = 2048
    x = np.cumsum(rng.standard_normal((B, n)), axis=1).astype(np.float32) * 2
    xj = jnp.asarray(x)
    lmax = jax.jit(jax.vmap(local_maxima))(xj)

    ref_fn = jax.jit(jax.vmap(lambda a, m: prominences_compact(a, m)))
    want = np.asarray(ref_fn(xj, lmax))

    for bt in (8, 16, 32):
        got = np.asarray(
            jax.jit(lambda a, m: prominences_compact_pallas(a, m, batch_tile=bt))(xj, lmax)
        )
        valid = np.asarray(lmax)
        ok = np.allclose(got[valid], want[valid], atol=1e-6)
        print(f"bt={bt}: exact={ok}")
        if not ok:
            bad = np.argwhere(valid & ~np.isclose(got, want, atol=1e-6))[:3]
            print("  mismatches:", [(tuple(i), got[tuple(i)], want[tuple(i)]) for i in bad])
            continue

        # scan-amortized timing, hard barrier
        def run(fn):
            @jax.jit
            def prog(a, m):
                def body(carry, i):
                    p = fn(a + 1e-6 * i, m)
                    return carry + jnp.sum(jnp.where(m, p, 0.0)), None
                tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(16, dtype=jnp.float32))
                return tot
            float(prog(xj, lmax))  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(prog(xj, lmax))
                best = min(best, time.perf_counter() - t0)
            return best / 16

        t_pal = run(lambda a, m: prominences_compact_pallas(a, m, batch_tile=bt))
        print(f"  pallas bt={bt}: {t_pal*1e3:.3f} ms/step ({B/t_pal/1e3:.0f}k frames/s)")

    t_ref = run_ref = None
    def runref():
        @jax.jit
        def prog(a, m):
            def body(carry, i):
                p = jax.vmap(prominences_compact)(a + 1e-6 * i, m)
                return carry + jnp.sum(jnp.where(m, p, 0.0)), None
            tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(16, dtype=jnp.float32))
            return tot
        float(prog(xj, lmax))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(prog(xj, lmax))
            best = min(best, time.perf_counter() - t0)
        return best / 16
    t_ref = runref()
    print(f"XLA prominences_compact: {t_ref*1e3:.3f} ms/step ({B/t_ref/1e3:.0f}k frames/s)")


if __name__ == "__main__":
    main()
