"""VQT transform contract tests, re-expressing the reference test suite
(pitchvis_analysis/src/vqt.rs:991-1128, lib.rs:50-72) plus JAX/NumPy parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pitchvis_tpu.ops.vqt import Vqt, VqtArrays, power_to_db, vqt_db_batch
from pitchvis_tpu.ops.vqt_ref import power_to_db_np, vqt_frame_db_np
from pitchvis_tpu.utils.signal import create_sines, create_sines_batch


def bin_freq(params, k):
    return params.range.min_freq * 2.0 ** (k / params.range.buckets_per_octave)


class TestParity:
    """JAX paths vs the NumPy oracle (the <=1e-4 parity contract of
    BASELINE.md, evaluated in linear power; dB tolerance reflects f32)."""

    @pytest.mark.parametrize("path", ["freq", "time"])
    def test_matches_oracle_f32(self, small_params, small_kernel, path):
        x = create_sines(small_params, [110.0, 440.0, 1244.5])
        ref = vqt_frame_db_np(small_kernel, x)
        got = Vqt(small_params, path=path).calculate_vqt_instant_in_db(x)
        assert np.abs(got - ref).max() < 5e-4  # dB; f32 rounding only

    def test_paths_agree(self, small_params):
        x = create_sines_batch(small_params, [[220.0], [660.0, 1318.5]])
        a = Vqt(small_params, path="freq").calculate_vqt_batch_in_db(x)
        b = Vqt(small_params, path="time").calculate_vqt_batch_in_db(x)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 5e-4

    def test_delay_alias(self, small_params):
        """vqt.delay (the reference's attribute name) == delay_secs > 0."""
        v = Vqt(small_params)
        assert v.delay == v.delay_secs > 0.0

    def test_exact_in_f64(self, small_params, small_kernel):
        """With float64 enabled the JAX graph reproduces the oracle to 1e-8:
        the reformulation is algebraically exact; only dtype differs."""
        x = create_sines(small_params, [207.65, 880.0])
        ref = vqt_frame_db_np(small_kernel, x)
        with jax.enable_x64(True):
            arrays = VqtArrays.from_kernel(small_kernel, dtype=jnp.float64)
            # time path: no FFT in the graph (XLA CPU has no f64 FFT)
            got_t = vqt_db_batch(arrays, jnp.asarray(x, jnp.float64)[None, :], path="time")
        # residual ~1e-6 dB: the packed weights are stored f32 (math is f64)
        assert np.abs(np.asarray(got_t)[0] - ref).max() < 5e-6
        # freq packing in f64 with a NumPy-computed spectrum
        parts = []
        for i, (begin, end) in enumerate(arrays.windows):
            spec = np.fft.rfft(x[begin:end].astype(np.float64))
            packed = np.concatenate([spec.real, spec.imag])
            y = packed @ np.asarray(arrays.w_freq[i], np.float64)
            nf = y.shape[0] // 2
            parts.append(y[:nf] ** 2 + y[nf:] ** 2)
        from pitchvis_tpu.ops.vqt_ref import power_to_db_np

        got_f = power_to_db_np(np.sqrt(np.concatenate(parts)))
        assert np.abs(got_f - ref).max() < 1e-4  # w_freq stored as f32

    def test_batch_consistency(self, small_vqt, small_params):
        """Batched rows equal single-frame results."""
        xs = create_sines_batch(small_params, [[110.0], [550.0], [2000.0]])
        batch = np.asarray(small_vqt.calculate_vqt_batch_in_db(xs))
        for i in range(3):
            single = small_vqt.calculate_vqt_instant_in_db(xs[i])
            np.testing.assert_allclose(batch[i], single, atol=1e-5)


class TestToneResponse:
    """Behavioral contracts from the reference test suite."""

    def test_peak_at_correct_bin(self, small_vqt, small_params):
        """A pure tone at a bin center produces its maximum at that bin."""
        n = small_params.n_buckets
        ks = [10, n // 3, n // 2, 2 * n // 3, n - 6]
        xs = create_sines_batch(small_params, [[bin_freq(small_params, k)] for k in ks])
        out = np.asarray(small_vqt.calculate_vqt_batch_in_db(xs))
        for row, k in zip(out, ks):
            assert abs(int(np.argmax(row)) - k) <= 1

    def test_bandwidth_flatness_sampled(self, small_vqt, small_params):
        """vqt.rs:996-1027 (sampled): sweeping a pure tone, the max single-bin
        response minus min total response stays < 3 dB."""
        n = small_params.n_buckets
        bpo = small_params.range.buckets_per_octave
        # sample sub-bin positions across the range, skipping the first/last
        # half semitone like the reference
        positions = np.linspace(bpo / 24, n - 1 - bpo / 24, 36)
        freqs = [[bin_freq(small_params, p)] for p in positions]
        out = np.asarray(small_vqt.calculate_vqt_batch_in_db(create_sines_batch(small_params, freqs)))
        max_single = out.max(axis=1).max()
        min_sum = out.sum(axis=1).min()
        assert max_single - min_sum < 3.0

    def test_group_boundary_continuity(self, small_vqt, small_params, small_kernel):
        """vqt.rs:1032-1076: response spread < 3 dB across every multi-rate
        group boundary (+- quarter semitone sweep)."""
        filters = small_kernel.filter_params
        boundaries = [
            b.freq
            for a, b in zip(filters, filters[1:])
            if a.sr_downscaling_factor != b.sr_downscaling_factor
        ]
        assert boundaries
        for boundary in boundaries:
            steps = np.arange(-6, 7)
            freqs = [[boundary * 2.0 ** (s / (6.0 * 4.0 * 12.0))] for s in steps]
            out = np.asarray(
                small_vqt.calculate_vqt_batch_in_db(create_sines_batch(small_params, freqs))
            )
            responses = out.max(axis=1)
            assert responses.max() - responses.min() < 3.0, f"boundary {boundary} Hz"

    def test_response_flat_across_octaves(self, small_vqt, small_params):
        """lib.rs:50-72 (sampled): max response varies < 6 dB over the range."""
        n = small_params.n_buckets
        positions = np.linspace(2.0, n - 3.0, 24)
        freqs = [[bin_freq(small_params, p)] for p in positions]
        out = np.asarray(small_vqt.calculate_vqt_batch_in_db(create_sines_batch(small_params, freqs)))
        responses = out.max(axis=1)
        assert responses.max() - responses.min() < 6.0


class TestPowerToDb:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        z = rng.standard_normal((4, 64)) * np.exp(rng.uniform(-12, 2, (4, 64)))
        power = np.abs(z) ** 2
        ref = power_to_db_np(z.astype(np.complex128))
        got = np.asarray(power_to_db(jnp.asarray(power, jnp.float32)))
        np.testing.assert_allclose(got, ref, atol=1e-3)

    def test_zeros_well_defined(self):
        out = np.asarray(power_to_db(jnp.zeros((2, 16))))
        assert np.all(np.isfinite(out))
        assert np.all(out == 0.0)  # uniform floor, whole frame negative -> cut at 0

    def test_nonnegative_and_60db_range(self):
        rng = np.random.default_rng(1)
        power = jnp.asarray(np.exp(rng.uniform(-40, 5, (8, 128))), jnp.float32)
        out = np.asarray(power_to_db(power))
        assert out.min() >= 0.0
        assert out.max() - out.min() <= 60.0 + 1e-3

    def test_silence_frame_in_batch(self, small_vqt, small_params):
        """One silent frame inside a batch must not corrupt others (per-frame
        reductions)."""
        xs = np.stack([np.zeros(small_params.n_fft, np.float32), create_sines(small_params, [440.0])])
        out = np.asarray(small_vqt.calculate_vqt_batch_in_db(xs))
        assert np.all(np.isfinite(out))
        single = small_vqt.calculate_vqt_instant_in_db(xs[1])
        # batch-size-dependent matmul tiling costs a few ulps
        np.testing.assert_allclose(out[1], single, atol=5e-5)
