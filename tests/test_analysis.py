"""Analysis chain tests: EMA contracts (util.rs:143-225), preprocess
behavior (analysis.rs:415-428), two-tone resolution (lib.rs:17-48), calmness
and afterglow semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from pitchvis_tpu.core.config import AnalysisParameters, VqtRange
from pitchvis_tpu.models.analysis import (
    AnalysisState,
    analysis_step,
    analysis_step_batch,
    init_state_batch,
)
from pitchvis_tpu.utils.ema import ema_update


class TestEma:
    def test_frame_rate_independence(self):
        """util.rs:143-181: low/high FPS EMAs converge within 0.05."""
        y_low = jnp.asarray(0.0)
        for target in (1.0, 2.0, 3.0, 4.0):
            for _ in range(2):
                y_low = ema_update(y_low, target, 0.25, 1.0)
        y_high = jnp.asarray(0.0)
        for target in (1.0, 2.0, 3.0, 4.0):
            for _ in range(4):
                y_high = ema_update(y_high, target, 0.125, 1.0)
        assert abs(float(y_low) - float(y_high)) < 0.05

    def test_exact_composability(self):
        """util.rs:184-225: n updates with dt/n == one update with dt."""
        results = []
        for n in (3, 10, 100):
            y = jnp.asarray(0.0)
            for _ in range(n):
                y = ema_update(y, 1.0, 0.5 / n, 1.0)
            results.append(float(y))
        assert max(results) - min(results) < 0.02
        # analytic: 1 - exp(-2 * 0.5 / 1.0) = 1 - 1/e
        assert abs(results[-1] - (1.0 - np.exp(-1.0))) < 0.02

    def test_passthrough_when_horizon_zero(self):
        y = ema_update(jnp.asarray(5.0), 1.0, 0.016, 0.0)
        assert float(y) == 1.0

    def test_per_bin_horizons(self):
        y = ema_update(jnp.zeros(3), jnp.ones(3), 0.1, jnp.asarray([0.0, 0.1, 10.0]))
        out = np.asarray(y)
        assert out[0] == 1.0
        assert out[1] > 0.8
        assert out[2] < 0.05


PARAMS = AnalysisParameters()
RANGE = VqtRange(min_freq=55.0, octaves=2, buckets_per_octave=24)


class TestAnalysisStep:
    def test_zeros_well_defined(self):
        """analysis.rs:415-428: preprocess on zeros is well-defined."""
        state = AnalysisState.init(RANGE.n_buckets)
        state, out = analysis_step(PARAMS, RANGE, state, jnp.zeros(RANGE.n_buckets), 1.0)
        assert np.all(np.asarray(out.x_vqt_smoothed) == 0.0)
        assert not np.asarray(out.peaks).any()
        assert np.all(np.isfinite(np.asarray(out.x_vqt_afterglow)))
        assert float(out.scene_calmness) == 0.0

    def test_single_tone_detected(self):
        n = RANGE.n_buckets
        x = np.zeros(n, np.float32)
        p = 20
        x[p - 1 : p + 2] = [12.0, 25.0, 12.0]
        state = AnalysisState.init(n)
        state, out = analysis_step(PARAMS, RANGE, state, jnp.asarray(x), 2.0)
        peaks = np.where(np.asarray(out.peaks))[0]
        np.testing.assert_array_equal(peaks, [p])
        assert abs(float(out.peak_center[p]) - p) < 0.05
        # pitch accuracy written at the rounded center bin
        assert float(out.pitch_accuracy[p]) > 0.9

    def test_smoothing_approaches_input(self):
        n = RANGE.n_buckets
        x = jnp.full(n, 10.0)
        state = AnalysisState.init(n)
        for _ in range(5):
            state, out = analysis_step(PARAMS, RANGE, state, x, 0.2)
        assert np.all(np.asarray(out.x_vqt_smoothed) > 9.5)

    def test_calmness_rises_on_sustained_peak(self):
        n = RANGE.n_buckets
        x = np.zeros(n, np.float32)
        x[19:22] = [10.0, 25.0, 10.0]
        state = AnalysisState.init(n)
        for _ in range(30):
            state, out = analysis_step(PARAMS, RANGE, state, jnp.asarray(x), 0.2)
        assert float(out.calmness[20]) > 0.5
        assert float(out.scene_calmness) > 0.5
        # a bin far away stays un-calm
        assert float(out.calmness[40]) < 0.05

    def test_scene_calmness_holds_in_silence(self):
        """calmness.rs:92-95: silence holds the scene value."""
        n = RANGE.n_buckets
        x = np.zeros(n, np.float32)
        x[19:22] = [10.0, 25.0, 10.0]
        state = AnalysisState.init(n)
        for _ in range(30):
            state, _ = analysis_step(PARAMS, RANGE, state, jnp.asarray(x), 0.2)
        held = float(state.scene_calmness)
        for _ in range(10):
            state, _ = analysis_step(PARAMS, RANGE, state, jnp.zeros(n), 0.2)
        # released-note shadow decays over ~3.5 s horizon; scene must not
        # collapse to zero immediately and must hold once silence is total
        assert float(state.scene_calmness) > 0.25 * held

    def test_afterglow_decays_and_floors(self):
        n = RANGE.n_buckets
        x = np.zeros(n, np.float32)
        x[20] = 30.0
        state = AnalysisState.init(n)
        state, out = analysis_step(PARAMS, RANGE, state, jnp.asarray(x), 0.5)
        first = float(out.x_vqt_afterglow[20])
        assert first > 0.0
        state, out = analysis_step(PARAMS, RANGE, state, jnp.zeros(n), 0.5)
        second = float(out.x_vqt_afterglow[20])
        decay = 0.85 - 0.15 * (20 / n)
        assert second <= first
        assert second >= first * decay - 1e-4

    def test_peakfilter_zeroes_nonpeaks(self):
        n = RANGE.n_buckets
        x = np.full(n, 2.0, np.float32)
        x[20] = 25.0
        state = AnalysisState.init(n)
        state, out = analysis_step(PARAMS, RANGE, state, jnp.asarray(x), 2.0)
        pf = np.asarray(out.x_vqt_peakfiltered)
        assert pf[20] > 0
        assert (pf > 0).sum() == np.asarray(out.peaks).sum()

    def test_tuning_inaccuracy_detects_detune(self):
        n = RANGE.n_buckets
        state = AnalysisState.init(n)
        # peak centered between two semitones: bins 20/21 equal heights with
        # 2 bins/semitone -> center ~20.5 -> 25 cents off
        x = np.zeros(n, np.float32)
        x[19:23] = [10.0, 25.0, 25.0, 10.0]
        for _ in range(40):
            state, out = analysis_step(PARAMS, RANGE, state, jnp.asarray(x), 0.5)
        assert float(out.tuning_inaccuracy) > 5.0  # cents

    def test_batched_matches_single(self):
        n = RANGE.n_buckets
        xs = np.zeros((3, n), np.float32)
        xs[0, 20] = 25.0
        xs[1, 30] = 20.0
        states = init_state_batch(3, n)
        states, outs = analysis_step_batch(PARAMS, RANGE, states, jnp.asarray(xs), 0.5)
        s_single = AnalysisState.init(n)
        s_single, out_single = analysis_step(PARAMS, RANGE, s_single, jnp.asarray(xs[1]), 0.5)
        np.testing.assert_allclose(
            np.asarray(outs.x_vqt_smoothed[1]), np.asarray(out_single.x_vqt_smoothed), atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(outs.peaks[1]), np.asarray(out_single.peaks)
        )


class TestPitchAccuracyRounding:
    def test_exact_half_bin_center_writes_up(self):
        """A continuous center at exactly i+0.5 must write accuracy at bin
        i+1 with a NEGATIVE deviation (f32::round half-away-from-zero,
        pitch_analysis.rs:27,36) — jnp.round's half-to-even would write at
        bin i with a positive deviation whenever i is even."""
        import jax.numpy as jnp

        from pitchvis_tpu.models.analysis import _pitch_accuracy_deviation

        n, bpo = 24, 12  # 1 bucket per semitone: center units == semitones
        mask = jnp.zeros(n, bool).at[4].set(True)
        center = jnp.zeros(n).at[4].set(4.5)  # exact half between 4 and 5
        acc, dev = _pitch_accuracy_deviation(mask, center, bpo)
        acc, dev = np.asarray(acc), np.asarray(dev)
        assert acc[5] == 0.0 and dev[5] == -0.5  # 4.5 - round(4.5)=5
        assert acc[4] == 0.0 and dev[4] == 0.0  # NOT written at the even bin


class TestTwoToneResolution:
    def test_close_frequencies_resolved(self, default_params, default_vqt):
        """lib.rs:17-48 (sampled): two tones a semitone apart resolve as
        exactly 2 peaks from ~2.6 octaves above min_freq upward."""
        from pitchvis_tpu.utils.signal import create_sines_batch

        params = default_params
        octs = [2.7, 3.5, 4.5, 5.5, 6.3]
        freqs = []
        for o in octs:
            f1 = params.range.min_freq * 2.0**o
            freqs.append([f1, f1 * 2.0 ** (1.0 / 12.0)])
        out = np.asarray(default_vqt.calculate_vqt_batch_in_db(create_sines_batch(params, freqs)))

        aparams = AnalysisParameters()
        n = params.n_buckets
        for row in out:
            state = AnalysisState.init(n)
            state, res = analysis_step(aparams, params.range, state, jnp.asarray(row), 1.1)
            assert int(np.asarray(res.peaks).sum()) == 2
