"""Kernel construction contract tests (vs pitchvis_analysis/src/vqt.rs)."""

import numpy as np
import pytest

from pitchvis_tpu.core.config import VqtParameters, VqtRange
from pitchvis_tpu.core.errors import AboveNyquistError, WindowExceedsNFftError
from pitchvis_tpu.kernel.builder import build_kernel, filter_bank_params, kernel_stats


class TestFilterBankParams:
    def test_default_structure(self, default_kernel):
        """Defaults produce 4 window groups of 8192/4096/2048/1024 samples
        (vqt.rs:133-134) and 588 filters."""
        stats = kernel_stats(default_kernel)
        assert stats["window_sizes"] == [8192, 4096, 2048, 1024]
        assert sum(stats["group_filters"]) == 588

    def test_delay_under_100ms(self, default_kernel):
        """vqt.rs:1078-1085: default delay < 100 ms."""
        assert default_kernel.delay_secs * 1000.0 < 100.0
        assert default_kernel.delay_secs * 1000.0 > 90.0  # ~98 ms

    def test_no_coverage_gaps_at_default_q(self, default_kernel):
        """Q=1.6 covers the full spectrum without -3 dB gaps (vqt.rs:203-211)."""
        assert default_kernel.coverage_gaps == []

    def test_downscaling_monotone(self, default_params):
        filters = filter_bank_params(default_params)
        factors = [f.sr_downscaling_factor for f in filters]
        assert all(a >= b for a, b in zip(factors, factors[1:]))
        # lowest bin at 55 Hz: sr/2^k >= 2*1.15*55 -> k = 7 (factor 128)
        assert factors[0] == 128

    def test_above_nyquist_error(self):
        with pytest.raises(AboveNyquistError):
            build_kernel(
                VqtParameters(range=VqtRange(min_freq=55.0, octaves=9, buckets_per_octave=12))
            )

    def test_window_exceeds_nfft_error(self):
        with pytest.raises(WindowExceedsNFftError):
            build_kernel(VqtParameters(quality=20.0, gamma=0.01))

    def test_window_lengths(self, default_kernel):
        """w = Q*sr/(alpha*f + gamma); longest ~4337 samples at 55 Hz."""
        wl0 = default_kernel.filter_params[0].window_length
        assert abs(wl0 - 4337.4) < 1.0


class TestSparsity:
    def test_sparsity_quantile_keeps_mass(self, default_kernel):
        """Sparse kernel keeps ~a few % of coefficients (vqt.rs:159-160) but
        >= 99.9% of each filter's L1 mass by construction."""
        stats = kernel_stats(default_kernel)
        assert stats["sparsity"] < 0.10

    def test_conjugate_part_small(self, default_kernel):
        """Conjugate-part holds ~1% of kernel mass (vqt.rs:129-131)."""
        pos = sum(np.abs(g.filter_bank).sum() for g in default_kernel.window_groups)
        neg = sum(np.abs(g.negative_filter_bank).sum() for g in default_kernel.window_groups)
        assert neg / pos < 0.05
        assert neg > 0  # it exists


class TestPackings:
    def test_w_freq_matches_complex_matvec(self, small_kernel):
        """The packed real matmul must equal A@X + conj(N@X) exactly."""
        g = small_kernel.window_groups[0]
        rng = np.random.default_rng(0)
        n_spec = g.n_spectrum
        x = rng.standard_normal(n_spec) + 1j * rng.standard_normal(n_spec)
        want = g.filter_bank @ x + np.conj(g.negative_filter_bank @ x)
        packed = np.concatenate([x.real, x.imag])
        got = packed @ g.w_freq.astype(np.float64)
        got = got[: g.n_filters] + 1j * got[g.n_filters :]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)

    def test_w_time_matches_fft_path(self, small_kernel):
        """Time-domain fold-through must equal rfft + complex matvec."""
        g = small_kernel.window_groups[0]
        rng = np.random.default_rng(1)
        xw = rng.standard_normal(g.window_size)
        spec = np.fft.rfft(xw)
        want = g.filter_bank @ spec + np.conj(g.negative_filter_bank @ spec)
        got = xw @ g.w_time.astype(np.float64)
        got = got[: g.n_filters] + 1j * got[g.n_filters :]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


class TestCache:
    def test_disk_cache_roundtrip(self, tmp_path, monkeypatch, small_params):
        import pitchvis_tpu.kernel.builder as b

        monkeypatch.setenv("PITCHVIS_TPU_CACHE", str(tmp_path))
        b.get_kernel.cache_clear()
        k1 = b.get_kernel(small_params)
        b.get_kernel.cache_clear()
        k2 = b.get_kernel(small_params)  # loaded from disk
        assert k1.delay_secs == k2.delay_secs
        for g1, g2 in zip(k1.window_groups, k2.window_groups):
            assert g1.window == g2.window
            np.testing.assert_array_equal(g1.filter_bank, g2.filter_bank)
            np.testing.assert_array_equal(g1.w_time, g2.w_time)
        b.get_kernel.cache_clear()


class TestPresetConfigs:
    """The reference's per-binary parameter presets build valid kernels
    (pitchvis_serial/src/main.rs:17-39, pitchvis_train/src/train.rs:30-41)."""

    def test_serial_preset(self):
        from pitchvis_tpu.core.config import SERIAL_VQT_PARAMETERS
        from pitchvis_tpu.kernel.builder import get_kernel, kernel_stats

        k = get_kernel(SERIAL_VQT_PARAMETERS)
        stats = kernel_stats(k)
        assert sum(stats["group_filters"]) == 5 * 36
        assert k.delay_secs < 0.100

    def test_train_preset(self):
        from pitchvis_tpu.core.config import TRAIN_VQT_PARAMETERS
        from pitchvis_tpu.kernel.builder import get_kernel, kernel_stats

        k = get_kernel(TRAIN_VQT_PARAMETERS)
        stats = kernel_stats(k)
        assert sum(stats["group_filters"]) == 7 * 36
        # Q=10, gamma=5.3Q: longer windows, higher delay than default
        assert 0.08 < k.delay_secs < 0.5


class TestNearNyquistTop:
    def test_top_frequency_just_below_nyquist_builds(self):
        """Top frequencies in (sr/2.3, sr/2] pass the Nyquist check but make
        the downscaling exponent negative; it must saturate to factor 1
        (round-2 review: `1 << -1` crashed the builder)."""
        from pitchvis_tpu.core.config import VqtParameters, VqtRange
        from pitchvis_tpu.kernel.builder import filter_bank_params

        params = VqtParameters(
            sr=22050.0,
            n_fft=8192,
            range=VqtRange(min_freq=160.0, octaves=6, buckets_per_octave=12),
        )
        # highest bin ~10.2 kHz: inside (sr/2.3, sr/2]
        filters = filter_bank_params(params)
        assert min(f.sr_downscaling_factor for f in filters) == 1
        assert all(f.sr_downscaling_factor >= 1 for f in filters)
