"""Tone-response contracts at DEFAULT parameters (588 bins, n_fft 32768).

Round-1 verdict: every sweep contract ran only at the reduced test config; a
default-config regression in filter placement would have passed the suite.
These re-express the reference's default-parameter tests — sampled sweeps
instead of the reference's dense ones to keep CPU time bounded, but at the
exact default kernel:

* bandwidth flatness          vqt.rs:996-1027   (< 3 dB)
* group-boundary continuity   vqt.rs:1032-1076  (< 3 dB)
* range flatness              lib.rs:50-72      (< 6 dB)
* two-tone semitone resolution lib.rs:17-48     (2 peaks above ~333 Hz)
"""

import jax.numpy as jnp
import numpy as np

from pitchvis_tpu.core.config import AnalysisParameters
from pitchvis_tpu.models.analysis import AnalysisState, analysis_step
from pitchvis_tpu.utils.signal import create_sines_batch


def bin_freq(params, k):
    return params.range.min_freq * 2.0 ** (k / params.range.buckets_per_octave)


class TestDefaultToneContracts:
    def test_peak_at_correct_bin(self, default_vqt, default_params):
        n = default_params.n_buckets
        ks = [10, 100, 200, 294, 400, 500, n - 8]
        xs = create_sines_batch(default_params, [[bin_freq(default_params, k)] for k in ks])
        out = np.asarray(default_vqt.calculate_vqt_batch_in_db(xs))
        for row, k in zip(out, ks):
            assert abs(int(np.argmax(row)) - k) <= 1, k

    def test_bandwidth_flatness_dense(self, default_vqt, default_params):
        """vqt.rs:996-1027 at defaults, DENSE: sweep a pure tone over every
        1/20 bucket across all 588 bins (~11.7k positions, skipping the first
        and last half bucket like the reference); max single-bin response
        minus min total response stays < 3 dB. Batched 512 frames per device
        call — the whole sweep runs in a few seconds on the CPU backend."""
        n = default_params.n_buckets
        bpo = default_params.range.buckets_per_octave
        sub = 20  # SUBDIVISIONS_PER_BUCKET
        idx = np.arange(sub // 2, n * sub - sub // 2)
        freqs = default_params.range.min_freq * 2.0 ** (
            idx.astype(np.float64) / (bpo * sub)
        )
        max_single = -np.inf
        min_sum = np.inf
        for i in range(0, len(freqs), 512):
            xs = create_sines_batch(
                default_params, [[f] for f in freqs[i : i + 512]]
            )
            out = np.asarray(default_vqt.calculate_vqt_batch_in_db(xs))
            max_single = max(max_single, out.max(axis=1).max())
            min_sum = min(min_sum, out.sum(axis=1).min())
        assert max_single - min_sum < 3.0, (max_single, min_sum)

    def test_group_boundary_continuity(self, default_vqt, default_params, default_kernel):
        """vqt.rs:1032-1076 at defaults: response spread < 3 dB across every
        multi-rate window-group boundary (+- quarter semitone, 41 steps —
        the reference's STEPS=20, i in -20..=20)."""
        filters = default_kernel.filter_params
        boundaries = [
            b.freq
            for a, b in zip(filters, filters[1:])
            if a.sr_downscaling_factor != b.sr_downscaling_factor
        ]
        assert len(boundaries) >= 3  # defaults: 4 window groups
        steps = 20
        freqs = []
        for boundary in boundaries:
            for s in range(-steps, steps + 1):
                freqs.append([boundary * 2.0 ** (s / (steps * 4.0 * 12.0))])
        out = np.asarray(
            default_vqt.calculate_vqt_batch_in_db(create_sines_batch(default_params, freqs))
        )
        responses = out.max(axis=1).reshape(len(boundaries), 2 * steps + 1)
        for b, resp in zip(boundaries, responses):
            assert resp.max() - resp.min() < 3.0, f"boundary {b} Hz"

    def test_range_flatness(self, default_vqt, default_params):
        """lib.rs:50-72 at defaults: max response varies < 6 dB."""
        n = default_params.n_buckets
        positions = np.linspace(2.0, n - 3.0, 30)
        freqs = [[bin_freq(default_params, p)] for p in positions]
        out = np.asarray(
            default_vqt.calculate_vqt_batch_in_db(create_sines_batch(default_params, freqs))
        )
        responses = out.max(axis=1)
        assert responses.max() - responses.min() < 6.0

    def test_two_tone_semitone_resolution(self, default_vqt, default_params):
        """lib.rs:17-48 at defaults: two simultaneous tones a semitone apart
        resolve as exactly 2 peaks from 2.6 octaves above min_freq (~333 Hz)
        up to half an octave below the top, through the full analysis chain
        (one preprocess step at dt=1.1 s, like the reference test)."""
        rng = default_params.range
        # sampled sweep over the reference's range (it uses 30 subdiv/octave)
        log_notes = np.linspace(2.6, rng.octaves - 0.55, 16)
        freqs = [
            [rng.min_freq * 2.0 ** p, rng.min_freq * 2.0 ** (p + 1.0 / 12.0)]
            for p in log_notes
        ]
        out = np.asarray(
            default_vqt.calculate_vqt_batch_in_db(create_sines_batch(default_params, freqs))
        )
        ap = AnalysisParameters()
        for log_note, row in zip(log_notes, out):
            state = AnalysisState.init(rng.n_buckets)
            _, res = analysis_step(ap, rng, state, jnp.asarray(row), jnp.float32(1.1))
            n_peaks = int(np.asarray(res.peaks).sum())
            assert n_peaks == 2, f"log_note {log_note}: {n_peaks} peaks"
