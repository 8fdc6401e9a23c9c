"""Fused Pallas VQT kernel tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pitchvis_tpu.ops.vqt import Vqt
from pitchvis_tpu.ops.vqt_pallas import PallasVqtArrays, vqt_db_pallas, vqt_power_pallas
from pitchvis_tpu.utils.signal import create_sines_batch


@pytest.fixture(scope="module")
def pallas_arrays(small_kernel):
    return PallasVqtArrays.from_kernel(small_kernel)


class TestPallasVqt:
    def test_geometry(self, pallas_arrays, small_kernel):
        """All group windows nest inside the tail; padding preserves counts."""
        assert pallas_arrays.tail == max(g.window_size for g in small_kernel.window_groups)
        assert sum(pallas_arrays.nf) == small_kernel.n_buckets
        for off, size in zip(pallas_arrays.offsets, pallas_arrays.window_sizes):
            assert off >= 0 and off + size <= pallas_arrays.tail
        for fp in pallas_arrays.nf_pad:
            assert fp % 128 == 0

    def test_matches_time_path(self, pallas_arrays, small_params, small_vqt):
        x = create_sines_batch(small_params, [[220.0], [440.0, 1000.0], [330.0]])
        ref = np.asarray(small_vqt.calculate_vqt_batch_in_db(x))
        got = np.asarray(vqt_db_pallas(pallas_arrays, x, batch_tile=2))
        # split-K accumulation costs ~1e-3 dB vs the single-dot time path
        assert np.abs(got - ref).max() < 2e-2

    def test_accepts_tail_only_input(self, pallas_arrays, small_params, small_vqt):
        x = create_sines_batch(small_params, [[523.25]])
        full = np.asarray(vqt_power_pallas(pallas_arrays, x, batch_tile=1))
        tail = np.asarray(
            vqt_power_pallas(pallas_arrays, x[:, -pallas_arrays.tail :], batch_tile=1)
        )
        np.testing.assert_allclose(full, tail, rtol=1e-6)

    def test_batch_padding(self, pallas_arrays, small_params):
        """Batch not divisible by the tile is padded and unpadded correctly."""
        x = create_sines_batch(small_params, [[220.0], [440.0], [660.0]])
        a = np.asarray(vqt_power_pallas(pallas_arrays, x, batch_tile=2))
        b = np.asarray(vqt_power_pallas(pallas_arrays, x, batch_tile=4))
        assert a.shape == (3, pallas_arrays.n_buckets)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-10)


class TestPeaksPallas:
    """The alternative fused peaks kernel must match ops/peaks.py exactly."""

    def test_matches_xla_formulation(self):
        import jax
        import numpy as np

        from pitchvis_tpu.ops.peaks import local_maxima, prominences
        from pitchvis_tpu.ops.peaks_pallas import local_maxima_and_prominences_pallas

        rng = np.random.default_rng(0)
        x = np.cumsum(rng.standard_normal((12, 128)), axis=1).astype(np.float32) * 2
        mask, prom = local_maxima_and_prominences_pallas(jnp.asarray(x), batch_tile=4)
        m_ref = np.asarray(jax.vmap(local_maxima)(jnp.asarray(x)))
        p_ref = np.asarray(jax.vmap(prominences)(jnp.asarray(x)))
        np.testing.assert_array_equal(np.asarray(mask), m_ref)
        np.testing.assert_allclose(np.asarray(prom), p_ref, atol=1e-6)

    def test_plateaus(self):
        import jax
        import numpy as np

        from pitchvis_tpu.ops.peaks import local_maxima
        from pitchvis_tpu.ops.peaks_pallas import local_maxima_and_prominences_pallas

        rng = np.random.default_rng(1)
        x = np.round(np.cumsum(rng.standard_normal((4, 96)), axis=1)).astype(np.float32)
        mask, _ = local_maxima_and_prominences_pallas(jnp.asarray(x))
        m_ref = np.asarray(jax.vmap(local_maxima)(jnp.asarray(x)))
        np.testing.assert_array_equal(np.asarray(mask), m_ref)


class TestResidentKernel:
    """Round-3 fast path: when the full padded weight set fits the VMEM
    budget, vqt_power_pallas switches to the resident-weights kernel (one
    un-tiled MXU dot per group, no split-K accumulator). Both kernels must
    agree with the dense time path; the selection must be budget-driven."""

    def test_resident_and_streaming_agree(self, pallas_arrays, small_params, small_vqt, monkeypatch):
        from pitchvis_tpu.ops import vqt_pallas as vp

        x = create_sines_batch(small_params, [[220.0], [440.0, 1000.0], [330.0]])
        ref = np.asarray(small_vqt.calculate_vqt_batch_in_db(x))

        assert vp._resident_feasible(pallas_arrays, 4)  # small config fits
        got_res = np.asarray(vqt_db_pallas(pallas_arrays, x, batch_tile=2))
        monkeypatch.setattr(vp, "_resident_feasible", lambda *a: False)
        got_str = np.asarray(vqt_db_pallas(pallas_arrays, x, batch_tile=2))

        assert np.abs(got_res - ref).max() < 2e-2
        assert np.abs(got_str - ref).max() < 2e-2
        # the resident path is a single dot per group: at least as accurate
        # as the split-K streaming accumulation
        assert np.abs(got_res - ref).max() <= np.abs(got_str - ref).max() + 1e-6

    def test_budget_rejects_oversized(self, pallas_arrays):
        from pitchvis_tpu.ops import vqt_pallas as vp

        huge_tile = vp._VMEM_RESIDENT_BUDGET  # forces x_bytes over budget
        assert not vp._resident_feasible(pallas_arrays, huge_tile)

    def test_resident_batch_padding(self, pallas_arrays, small_params):
        """Batch not divisible by the resident tile pads and unpads."""
        x = create_sines_batch(small_params, [[220.0], [440.0], [660.0]])
        a = np.asarray(vqt_power_pallas(pallas_arrays, x, batch_tile=2))
        b = np.asarray(vqt_power_pallas(pallas_arrays, x, batch_tile=8))
        assert a.shape == (3, pallas_arrays.n_buckets)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-10)


class TestSmallWindowGroups:
    def test_group_smaller_than_k_tile(self):
        """Round-2 review: configs whose smallest window group is below
        K_TILE (e.g. 36 bpo at quality 1.8 -> a 512-sample group) truncated
        n_k to 0 — the group DMA'd out of bounds and output zero power. The
        tile now shrinks to the group size."""
        import numpy as np

        from pitchvis_tpu.core.config import VqtParameters, VqtRange
        from pitchvis_tpu.kernel.builder import get_kernel
        from pitchvis_tpu.ops.vqt import VqtArrays, vqt_db_batch
        from pitchvis_tpu.ops.vqt_pallas import PallasVqtArrays, vqt_db_pallas

        params = VqtParameters(
            sr=22050.0,
            n_fft=16384,
            quality=1.8,
            gamma=4.8 * 1.8,
            range=VqtRange(min_freq=110.0, octaves=6, buckets_per_octave=36),
        )
        kernel = get_kernel(params)
        assert min(g.w_time.shape[0] for g in kernel.window_groups) < 1024, (
            "config no longer produces a sub-K_TILE group; pick another"
        )
        rng = np.random.default_rng(0)
        x = (rng.standard_normal((4, params.n_fft)) * 0.1).astype(np.float32)
        want = np.asarray(vqt_db_batch(VqtArrays.from_kernel(kernel), x))
        got = np.asarray(vqt_db_pallas(PallasVqtArrays.from_kernel(kernel), x))
        np.testing.assert_allclose(got, want, atol=2e-3)


class TestRemainderKTile:
    def _synthetic_arrays(self, sizes, nfs, tail, dtype=jnp.float32, seed=0):
        """Hand-built PallasVqtArrays with right-aligned synthetic groups —
        the geometry from_kernel produces, without needing a VqtParameters
        set that happens to yield these window sizes."""
        rng = np.random.default_rng(seed)
        weights, offsets, nf_pad = [], [], []
        for size, f in zip(sizes, nfs):
            fp = -(-f // 128) * 128
            padded = np.zeros((size, 2 * fp), np.float32)
            padded[:, :f] = rng.standard_normal((size, f)) * 0.01
            padded[:, fp : fp + f] = rng.standard_normal((size, f)) * 0.01
            weights.append(jnp.asarray(padded, dtype=dtype))
            offsets.append(tail - size)
            nf_pad.append(fp)
        return PallasVqtArrays(
            weights=tuple(weights),
            offsets=tuple(offsets),
            window_sizes=tuple(sizes),
            nf=tuple(nfs),
            nf_pad=tuple(nf_pad),
            tail=tail,
            n_fft=tail,
            n_buckets=sum(nfs),
        )

    def _reference(self, arrays, x):
        out = []
        for w, off, size, f, fp in zip(
            arrays.weights, arrays.offsets, arrays.window_sizes,
            arrays.nf, arrays.nf_pad,
        ):
            y = x[:, off : off + size].astype(np.float64) @ np.asarray(
                w, np.float64
            )
            out.append(y[:, :f] ** 2 + y[:, fp : fp + f] ** 2)
        return np.concatenate(out, axis=1)

    def test_non_divisible_group_sizes(self):
        """Round-4 review: a group window LARGER than K_TILE but not a
        multiple of it silently dropped its remainder samples (size//kt
        tiles) — wrong power with no error. The final tile is now short."""
        rng = np.random.default_rng(1)
        # 1536 = 1.5*K_TILE (remainder 512), 1100 (remainder 76), 700 (<kt)
        arrays = self._synthetic_arrays([1536, 1100, 700], [7, 130, 3], tail=1536)
        x = (rng.standard_normal((5, arrays.tail)) * 0.3).astype(np.float32)
        got = np.asarray(vqt_power_pallas(arrays, x, batch_tile=4))
        want = self._reference(arrays, x)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-9)

    def test_empty_batch(self):
        """B=0 returns an empty spectrum like the dense paths (was a
        ZeroDivisionError in the tile arithmetic)."""
        arrays = self._synthetic_arrays([1024], [5], tail=1024)
        out = np.asarray(
            vqt_power_pallas(arrays, np.zeros((0, 1024), np.float32))
        )
        assert out.shape == (0, 5)


class TestRebuiltConfigVmem:
    """Round-4 chip OOM regression: a live rebuild at quality*1.1 grows the
    default bf16 weight set to ~13.5 MB, which (a) must drop the resident
    tile to 32 instead of falling off the resident path, and (b) must never
    let the streaming kernel's ANY-space weights land in scoped VMEM (the
    mid-soak rebuild at B=3840 died at 18 MB > 16 MB scoped limit before
    the weights were pinned to HBM)."""

    def test_rebuilt_quality_tile_selection_and_parity(self):
        import dataclasses

        import jax.numpy as jnp
        import numpy as np

        from pitchvis_tpu.core.config import VqtParameters
        from pitchvis_tpu.kernel.builder import get_kernel
        from pitchvis_tpu.ops.vqt import VqtArrays, vqt_db_batch
        from pitchvis_tpu.ops.vqt_pallas import (
            PallasVqtArrays,
            _resident_feasible,
            vqt_db_pallas,
        )

        p = VqtParameters()
        rebuilt = dataclasses.replace(p, quality=p.quality * 1.1)
        kernel = get_kernel(rebuilt)
        arrs = PallasVqtArrays.from_kernel(kernel, dtype=jnp.bfloat16)
        w_mb = sum(int(np.prod(w.shape)) * 2 for w in arrs.weights) / 2**20
        assert w_mb > 12, "rebuilt config no longer stresses VMEM; pick another"
        assert not _resident_feasible(arrs, 64)
        assert _resident_feasible(arrs, 32)

        # numerics at a batch that crosses the tile boundary (interpret mode
        # on CPU; the real-chip compile at B=3840 is checked in the soak)
        rng = np.random.default_rng(1)
        x = (rng.standard_normal((72, kernel.params.n_fft)) * 0.1).astype(np.float32)
        f32 = PallasVqtArrays.from_kernel(kernel)
        want = np.asarray(vqt_db_batch(VqtArrays.from_kernel(kernel), x))
        np.testing.assert_allclose(
            np.asarray(vqt_db_pallas(f32, x)), want, atol=2e-3
        )
