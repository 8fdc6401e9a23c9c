"""Batched TPU VQT transform.

The TPU-native counterpart of `Vqt::calculate_vqt_instant_in_db`
(pitchvis_analysis/src/vqt.rs:866-916). Two compute paths, both driven by the
packed kernel from :mod:`pitchvis_tpu.kernel.builder`:

* ``path="freq"``: per window group, batched real FFT of the input slice,
  then ONE real MXU matmul ``[Re X | Im X] @ w_freq -> [Re y | Im y]``
  (positive-frequency and conjugate-part kernels pre-folded).
* ``path="time"``: no runtime FFT at all — the sparsified frequency kernel is
  folded through the DFT at build time, so each group is a single dense
  matmul ``x_window @ w_time -> [Re y | Im y]``. This is the preferred MXU
  mapping: at default parameters the whole transform is 4 matmuls totalling
  ~25 MFLOP/frame, trivially batched over thousands of streams.

Both paths are exact reformulations of the reference computation (linear
algebra identities only); they agree with the NumPy oracle to ~1e-5 in f32.

The dB conversion (vqt.rs:922-954) is a per-frame reduction fused by XLA into
the surrounding graph.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import VqtParameters
from ..kernel.builder import VqtKernel, get_kernel

REF_POWER = 0.3 * 0.3
A_MIN = 1e-6 * 1e-6
TOP_DB = 60.0


def power_to_db(power: jax.Array) -> jax.Array:
    """dB relative to REF_POWER, clamped to TOP_DB below the frame max and
    shifted non-negative (vqt.rs:922-954). ``power`` is |y|^2 with shape
    (..., n_buckets); reductions run over the last axis."""
    ref_db = 10.0 * np.log10(REF_POWER)
    log_spec = 10.0 * jnp.log10(jnp.maximum(power, A_MIN)) - ref_db

    log_spec_max = jnp.max(log_spec, axis=-1, keepdims=True)
    log_spec_min = jnp.min(log_spec, axis=-1, keepdims=True)
    floor = log_spec_max - TOP_DB
    log_spec_min = jnp.maximum(log_spec_min, floor)

    clamped = jnp.maximum(log_spec, floor)
    return jnp.where(log_spec_min > 0.0, clamped - log_spec_min, jnp.maximum(clamped, 0.0))


@jax.tree_util.register_pytree_node_class
@dataclass
class VqtArrays:
    """Device-resident kernel weights (a pytree, so it can be donated /
    sharded / closed over by jit)."""

    w_freq: tuple[jax.Array, ...]  # per group (2*n_spec, 2*n_filt) f32
    w_time: tuple[jax.Array, ...]  # per group (window, 2*n_filt) f32
    windows: tuple[tuple[int, int], ...]
    n_filters: tuple[int, ...]
    n_fft: int
    n_buckets: int

    def tree_flatten(self):
        return (self.w_freq, self.w_time), (
            self.windows,
            self.n_filters,
            self.n_fft,
            self.n_buckets,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        w_freq, w_time = children
        windows, n_filters, n_fft, n_buckets = aux
        return cls(w_freq, w_time, windows, n_filters, n_fft, n_buckets)

    @classmethod
    def from_kernel(
        cls, kernel: VqtKernel, dtype=jnp.float32, path: str | None = None
    ) -> "VqtArrays":
        """``path``: upload only the weight set that path uses ("time" or
        "freq"); None uploads both (a Vqt instance uses exactly one, so
        callers with a fixed path should pass it — the sets are comparable
        in size and the unused one would double the weight HBM footprint)."""
        groups = kernel.window_groups
        return cls(
            w_freq=(
                tuple(jnp.asarray(g.w_freq, dtype=dtype) for g in groups)
                if path in (None, "freq")
                else ()
            ),
            w_time=(
                tuple(jnp.asarray(g.w_time, dtype=dtype) for g in groups)
                if path in (None, "time")
                else ()
            ),
            windows=tuple(g.window for g in groups),
            n_filters=tuple(g.n_filters for g in groups),
            n_fft=kernel.params.n_fft,
            n_buckets=kernel.n_buckets,
        )


def _group_power_freq(x_win: jax.Array, w_freq: jax.Array, precision) -> jax.Array:
    """rFFT + one real matmul -> |y|^2 for one window group.

    x_win: (B, window_size) f32. Returns (B, n_filt) f32.
    """
    spec = jnp.fft.rfft(x_win)  # (B, n_spec) complex64
    xr = jnp.real(spec)
    xi = jnp.imag(spec)
    packed = jnp.concatenate([xr, xi], axis=-1).astype(w_freq.dtype)  # (B, 2*n_spec)
    # bf16 fast mode: bf16 weights -> ONE MXU pass with f32 accumulation
    # (vs HIGHEST's 6-pass f32 decomposition); f32 weights are unchanged.
    y = jnp.dot(
        packed, w_freq, precision=precision, preferred_element_type=jnp.float32
    )  # (B, 2*n_filt) f32
    n_filt = w_freq.shape[1] // 2
    return y[:, :n_filt] ** 2 + y[:, n_filt:] ** 2


def _group_power_time(x_win: jax.Array, w_time: jax.Array, precision) -> jax.Array:
    """Single time-domain matmul -> |y|^2 for one window group."""
    y = jnp.dot(
        x_win.astype(w_time.dtype),
        w_time,
        precision=precision,
        preferred_element_type=jnp.float32,
    )  # (B, 2*n_filt) f32
    n_filt = w_time.shape[1] // 2
    return y[:, :n_filt] ** 2 + y[:, n_filt:] ** 2


def vqt_power_batch(
    arrays: VqtArrays,
    x: jax.Array,
    *,
    path: str = "time",
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """|VQT|^2 of a batch of frames. x: (B, n_fft) f32 -> (B, n_buckets)."""
    assert x.ndim == 2 and x.shape[1] == arrays.n_fft, (
        f"input must be (B, n_fft={arrays.n_fft}), got {x.shape}"
    )
    parts = []
    for i, (begin, end) in enumerate(arrays.windows):
        x_win = jax.lax.slice_in_dim(x, begin, end, axis=1)
        if path == "freq":
            parts.append(_group_power_freq(x_win, arrays.w_freq[i], precision))
        elif path == "time":
            parts.append(_group_power_time(x_win, arrays.w_time[i], precision))
        else:
            raise ValueError(f"unknown VQT path {path!r}")
    return jnp.concatenate(parts, axis=-1)


def vqt_db_batch(
    arrays: VqtArrays,
    x: jax.Array,
    *,
    path: str = "time",
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Batched VQT in dB (the streaming hot op). (B, n_fft) -> (B, n_buckets)."""
    return power_to_db(vqt_power_batch(arrays, x, path=path, precision=precision))


# Shared jitted entry points (one compile cache for all Vqt instances).
_vqt_db_batch_jit = jax.jit(vqt_db_batch, static_argnames=("path", "precision"))
_vqt_power_batch_jit = jax.jit(vqt_power_batch, static_argnames=("path", "precision"))


# Serving batch tile for the fused Pallas kernel: 512 measured ~5% over 256
# on the real chip (fewer weight re-streams per batch); shrinks to the batch
# for small batches, so it is safe as a universal default.
PALLAS_BATCH_TILE = 512


def precision_for(weight_dtype):
    """The matmul precision every entry point pairs with a weight dtype:
    bf16 -> one-pass DEFAULT (the point of fast mode), f32 -> exact HIGHEST
    (6-pass decomposition). Single source of the pairing — the dense paths
    here and the Pallas kernel bodies all call it."""
    return (
        jax.lax.Precision.DEFAULT
        if weight_dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )


@functools.lru_cache(maxsize=None)
def _pallas_jits():
    """Shared jitted Pallas entry points (one compile cache for all Vqt
    instances, like _vqt_db_batch_jit for the dense paths), with the
    serving batch tile every other pallas caller uses."""
    from .vqt_pallas import vqt_db_pallas, vqt_power_pallas

    return (
        jax.jit(functools.partial(vqt_db_pallas, batch_tile=PALLAS_BATCH_TILE)),
        jax.jit(functools.partial(vqt_power_pallas, batch_tile=PALLAS_BATCH_TILE)),
    )


def make_vqt_arrays(kernel: VqtKernel, *, path: str = "time", fast: bool = False):
    """Uniform kernel-upload constructor for every serving entry point.

    Returns :class:`VqtArrays` for the dense paths ("time" / "freq") or
    :class:`~pitchvis_tpu.ops.vqt_pallas.PallasVqtArrays` for the fused
    Pallas kernel (``path="pallas"``). ``fast=True`` stores the weights in
    bfloat16 (single-pass MXU matmuls with f32 accumulation; error budget in
    tests/test_bf16.py)."""
    dtype = jnp.bfloat16 if fast else jnp.float32
    if path == "pallas":
        from .vqt_pallas import PallasVqtArrays

        return PallasVqtArrays.from_kernel(kernel, dtype=dtype)
    if path not in ("time", "freq"):
        raise ValueError(f"unknown VQT path {path!r}")
    return VqtArrays.from_kernel(kernel, dtype=dtype, path=path)


def vqt_db_auto(arrays, x: jax.Array, *, path: str = "time") -> jax.Array:
    """Path-dispatching dB VQT used by the serving stack (models/pipeline.py,
    runtime/server.py): routes ``path="pallas"`` to the fused kernel and the
    dense paths through :func:`vqt_db_batch` with the MXU precision inferred
    from the weight dtype (bf16 weights -> one-pass DEFAULT, f32 -> exact
    HIGHEST — the same pairing the benchmarks use).

    Reference analog: the one-and-only VQT the viewer runs in its frame loop
    (pitchvis_viewer/src/vqt_system.rs:40-68) — with this entry point the
    flagship serving path runs the repo's best kernel, not the second-best.
    """
    if path == "pallas":
        from .vqt_pallas import vqt_db_pallas

        return vqt_db_pallas(arrays, x, batch_tile=PALLAS_BATCH_TILE)
    w = arrays.w_time if path == "time" else arrays.w_freq
    precision = precision_for(w[0].dtype if w else jnp.float32)
    return vqt_db_batch(arrays, x, path=path, precision=precision)


class Vqt:
    """User-facing VQT analyzer, API-compatible in spirit with the reference's
    ``Vqt`` (vqt.rs:440-505): ``Vqt(params)`` builds + uploads the kernel;
    :meth:`calculate_vqt_instant_in_db` computes one frame; the batched entry
    points are the TPU-native extension.

    ``path``: "time" (default; FFT-free dense matmuls, best MXU mapping) or
    "freq" (batched rFFT + one matmul per group, mirrors the reference's
    structure).

    ``fast=True`` enables the bf16 fast mode: kernel weights are stored in
    bfloat16 and the per-group matmuls run as a single MXU pass with f32
    accumulation (vs the default f32 HIGHEST 6-pass decomposition), halving
    the weight HBM traffic as well. Measured error budget at default
    parameters (see tests/test_bf16.py): <=0.15 dB max / ~0.01 dB mean on
    the dB spectra, peak SETS identical on musical signals; downstream
    analysis (EMA horizons, calmness, tuning) sees sub-threshold deltas.
    """

    def __init__(
        self,
        params: VqtParameters | None = None,
        *,
        path: str = "time",
        precision=None,
        fast: bool = False,
    ):
        self.params = params or VqtParameters()
        self.kernel = get_kernel(self.params)
        dtype = jnp.bfloat16 if fast else jnp.float32
        self.path = path
        self.fast = fast
        if precision is not None and path == "pallas":
            # the fused kernel derives its precision from the weight dtype
            # (fast=False -> f32/HIGHEST, fast=True -> bf16 one-pass);
            # silently accepting e.g. HIGHEST with bf16 weights would hand
            # the user less precision than they asked for
            raise ValueError(
                "path='pallas' pairs precision with the weight dtype "
                "(use fast=False for exact f32); precision applies to the "
                "dense 'time'/'freq' paths"
            )
        if precision is None:
            # the pairing every other entry point uses (vqt_db_auto, the
            # benchmarks): bf16 weights -> one-pass DEFAULT (the point of
            # fast mode), f32 -> exact HIGHEST. An explicit argument wins.
            precision = precision_for(dtype)
        self.precision = precision
        self.delay_secs = self.kernel.delay_secs
        if path == "pallas":
            from .vqt_pallas import PallasVqtArrays

            # only the packed Pallas weights — ALSO uploading the dense
            # w_time + w_freq sets would double the weight HBM footprint
            self.arrays = PallasVqtArrays.from_kernel(self.kernel, dtype=dtype)
            # shared jits with the serving batch tile (PALLAS_BATCH_TILE) —
            # a per-instance jax.jit would retrace per Vqt instance and ran
            # the kernel at the function-default tile (round-4 review)
            self._db_batch, self._power_batch = _pallas_jits()
        else:
            self.arrays = VqtArrays.from_kernel(self.kernel, dtype=dtype, path=path)
            self._db_batch = functools.partial(
                _vqt_db_batch_jit, path=path, precision=precision
            )
            self._power_batch = functools.partial(
                _vqt_power_batch_jit, path=path, precision=precision
            )

    @property
    def n_buckets(self) -> int:
        return self.params.n_buckets

    @property
    def delay(self) -> float:
        """Algorithmic latency in seconds — the reference's `vqt.delay`
        (vqt.rs:505, 756: (n_fft - window_center)/sr). Alias of
        `delay_secs` for drop-in familiarity."""
        return self.delay_secs

    def calculate_vqt_instant_in_db(self, x) -> np.ndarray:
        """Single-frame convenience wrapper (vqt.rs:866). x: (n_fft,)."""
        x = jnp.asarray(x, dtype=jnp.float32)[None, :]
        return np.asarray(self._db_batch(self.arrays, x))[0]

    def calculate_vqt_batch_in_db(self, x) -> jax.Array:
        """Batched frames: (B, n_fft) -> (B, n_buckets) in dB."""
        return self._db_batch(self.arrays, jnp.asarray(x, dtype=jnp.float32))

    def calculate_vqt_batch_power(self, x) -> jax.Array:
        return self._power_batch(self.arrays, jnp.asarray(x, dtype=jnp.float32))
