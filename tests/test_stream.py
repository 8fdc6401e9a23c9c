"""AGC, ring buffer, resampler, and end-to-end streaming pipeline tests
(vs dagc_fork/src/lib.rs:93-108 and the reference's callback semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pitchvis_tpu.core.config import AgcParameters, VqtParameters, VqtRange
from pitchvis_tpu.ops.agc import agc_chunk, agc_init
from pitchvis_tpu.ops.resample import PolyphaseResampler, resample
from pitchvis_tpu.stream.ring import RingState, ring_push, ring_window


def agc_reference(gain, samples, desired_rms, k, frozen):
    """Literal NumPy port of dagc MonoAgc::process for cross-checking."""
    out = np.empty_like(samples)
    for i, x in enumerate(samples):
        x = x * gain
        out[i] = x
        if not frozen:
            y = x * x / desired_rms
            g = max(1.0 + k * (1.0 - y), k)
            gain = gain * g
    return gain, out


class TestAgc:
    def test_matches_reference_recurrence(self):
        rng = np.random.default_rng(0)
        samples = (rng.standard_normal(256) * 0.05).astype(np.float32)
        p = AgcParameters()
        want_gain, want = agc_reference(1.0, samples.astype(np.float64), p.desired_output_rms, p.distortion_factor, False)
        got_gain, got = agc_chunk(agc_init(1), jnp.asarray(samples)[None, :], p,
                                  frozen=jnp.asarray([False]))
        np.testing.assert_allclose(np.asarray(got)[0], want, rtol=1e-5)
        assert abs(float(got_gain[0]) - want_gain) < 1e-4

    def test_freeze_semantics(self):
        """dagc it_works (lib.rs:93-108): frozen -> gain unchanged; unfrozen
        -> gain changes."""
        p = AgcParameters(desired_output_rms=0.001, distortion_factor=0.0001)
        samples = jnp.asarray([[0.5, 1.0, -0.2]])
        g1, _ = agc_chunk(agc_init(1), samples, p, frozen=jnp.asarray([True]))
        assert float(g1[0]) == 1.0
        g2, _ = agc_chunk(agc_init(1), samples, p, frozen=jnp.asarray([False]))
        assert float(g2[0]) != 1.0

    def test_silence_auto_freeze(self):
        p = AgcParameters()
        quiet = jnp.full((1, 128), 1e-6)
        g, _ = agc_chunk(agc_init(1), quiet, p)
        assert float(g[0]) == 1.0

    def test_gain_converges_to_target_rms(self):
        rng = np.random.default_rng(1)
        p = AgcParameters()
        gain = agc_init(1)
        x = (rng.standard_normal((1, 2048)) * 0.01).astype(np.float32)
        out = None
        for _ in range(40):
            gain, out = agc_chunk(gain, jnp.asarray(x), p)
        rms = float(jnp.sqrt(jnp.mean(out**2)))
        assert abs(rms - np.sqrt(p.desired_output_rms)) / np.sqrt(p.desired_output_rms) < 0.25

    def test_batch_streams_independent(self):
        p = AgcParameters()
        rng = np.random.default_rng(2)
        a = (rng.standard_normal(64) * 0.05).astype(np.float32)
        b = (rng.standard_normal(64) * 0.2).astype(np.float32)
        g_both, out_both = agc_chunk(agc_init(2), jnp.stack([a, b]), p)
        g_a, out_a = agc_chunk(agc_init(1), a[None], p)
        np.testing.assert_allclose(np.asarray(out_both)[0], np.asarray(out_a)[0], atol=1e-6)
        assert abs(float(g_both[0]) - float(g_a[0])) < 1e-6


class TestRing:
    def test_oversized_chunk_rejected(self):
        """A chunk wider than the buffer would otherwise fail with a shape
        broadcast error deep inside the jitted trace."""
        import pytest

        st = RingState.init(2, 16)
        with pytest.raises(ValueError, match="exceeds"):
            ring_push(st, jnp.zeros((2, 32)))

    def test_window_longer_than_buffer_rejected(self):
        """buffer[:, -n_fft:] would silently return a short window and
        surface later as an opaque VQT shape mismatch."""
        import pytest

        st = RingState.init(2, 16)
        with pytest.raises(ValueError, match="n_fft"):
            ring_window(st, 32)

    def test_push_and_window(self):
        st = RingState.init(2, 16)
        # small amplitudes: AGC gain moves by <= distortion_factor per sample
        vals = np.arange(8, dtype=np.float32) * 0.01
        st = ring_push(st, jnp.tile(jnp.asarray(vals), (2, 1)))
        w = np.asarray(ring_window(st, 8))
        np.testing.assert_allclose(w[0], vals, rtol=1e-2)
        # older samples rolled out correctly
        assert np.all(np.asarray(st.buffer)[:, :8] == 0.0)

    def test_nan_chunk_rejected_per_stream(self):
        st = RingState.init(2, 8)
        good = np.full(4, 0.5, np.float32)
        bad = good.copy()
        bad[2] = np.nan
        st2 = ring_push(st, jnp.asarray(np.stack([good, bad])))
        buf = np.asarray(st2.buffer)
        assert np.all(np.isfinite(buf))
        assert buf[0, -4:].max() > 0  # stream 0 accepted
        assert np.all(buf[1] == 0.0)  # stream 1 rejected entirely
        assert float(st2.gain[1]) == 1.0

    def test_inf_chunk_rejected_like_reference(self):
        """The reference rejects on !is_finite() (audio_desktop.rs:102-105):
        an Inf sample would collapse the AGC gain by ~1e4 and poison every
        VQT frame its window covers — the whole chunk must be dropped."""
        st = RingState.init(2, 8)
        good = np.full(4, 0.5, np.float32)
        bad = good.copy()
        bad[1] = np.inf
        st2 = ring_push(st, jnp.asarray(np.stack([good, bad])))
        buf = np.asarray(st2.buffer)
        assert np.all(np.isfinite(buf))
        assert np.all(buf[1] == 0.0)
        assert float(st2.gain[1]) == 1.0


class TestResampler:
    @pytest.mark.parametrize("sr_in", [44100, 48000])
    def test_sine_preserved(self, sr_in):
        sr_out = 22050
        f = 440.0
        t_in = np.arange(sr_in // 2) / sr_in
        x = np.sin(2 * np.pi * f * t_in).astype(np.float32)
        y = resample(x, sr_in, sr_out)[0]
        # compare against an ideal sine delayed by the filter group delay
        from pitchvis_tpu.ops.resample import PolyphaseResampler, make_spec

        spec = make_spec(sr_in, sr_out)
        delay = (spec.taps_per_phase * spec.l - 1) / 2.0 / (spec.l * sr_in)
        t_out = np.arange(len(y)) / sr_out
        ideal = np.sin(2 * np.pi * f * (t_out - delay))
        skip = 256
        err = np.abs(y[skip:-skip] - ideal[skip : len(y) - skip])
        assert err.max() < 0.01

    def test_streaming_matches_offline(self):
        sr_in, sr_out = 48000, 22050
        m = 320  # M for 48000->22050
        chunk_in = m * 3
        rng = np.random.default_rng(0)
        x = rng.standard_normal(chunk_in * 4).astype(np.float32) * 0.1
        rs = PolyphaseResampler(sr_in, sr_out, chunk_in)
        state = rs.init_state(1)
        outs = []
        for i in range(4):
            state, o = rs.process(state, jnp.asarray(x[None, i * chunk_in : (i + 1) * chunk_in]))
            outs.append(np.asarray(o)[0])
        streamed = np.concatenate(outs)
        full = PolyphaseResampler(sr_in, sr_out, chunk_in * 4)
        _, offline = full.process(full.init_state(1), jnp.asarray(x[None, :]))
        np.testing.assert_allclose(streamed, np.asarray(offline)[0], atol=1e-5)

    def test_bad_chunk_size_raises(self):
        with pytest.raises(ValueError):
            PolyphaseResampler(48000, 22050, 100)

    def test_history_len_matches_state(self):
        """ResamplerSpec.history_len is the sizing contract for callers
        allocating their own per-stream history: it must equal what
        init_state allocates and process() carries (T-1, not T)."""
        from pitchvis_tpu.ops.resample import make_spec

        spec = make_spec(48000, 22050)
        rs = PolyphaseResampler(48000, 22050, spec.m * 2)
        state = rs.init_state(3)
        assert state.shape == (3, spec.history_len)
        new_state, _ = rs.process(state, jnp.zeros((3, spec.m * 2)))
        assert new_state.shape == (3, spec.history_len)

    def test_fft_chunk_resample_repeatable(self):
        """resample() on one FftChunkResampler instance is stateless across
        calls: a second identical call must return identical output (a
        leftover pending/OLA tail used to shift the window grid)."""
        from pitchvis_tpu.ops.resample import FftChunkResampler

        rng = np.random.default_rng(3)
        x = (rng.standard_normal(20000) * 0.1).astype(np.float64)
        r = FftChunkResampler(48000, 22050)
        y1 = r.resample(x)
        y2 = r.resample(x)
        np.testing.assert_array_equal(y1, y2)


class TestResamplerSpecContract:
    """Quantified filter contract for the mic-rate ingest resampler
    (round-3 verdict item 6; the reference's rubato FftFixedIn stage,
    pitchvis_audio/src/audio_wasm.rs:176-209). Thresholds are what the
    24-tap/phase Blackman-Harris prototype measurably provides; the
    load-bearing guarantee for THIS pipeline is the last test: the VQT
    analysis band (<= ~4.2 kHz at default range) sees a flat passband and
    >= 90 dB rejection of anything that would alias into it."""

    @staticmethod
    def _tone_level_db(f: float, sr_in: int, sr_out: int = 22050) -> float:
        t_in = np.arange(sr_in) / sr_in
        y = resample(np.sin(2 * np.pi * f * t_in).astype(np.float32), sr_in, sr_out)[0]
        seg = y[len(y) // 4 :]
        return 20.0 * np.log10(np.sqrt(2.0 * np.mean(seg**2)) + 1e-12)

    @pytest.mark.parametrize("sr_in", [44100, 48000])
    def test_passband_ripple(self, sr_in):
        # flat within +-0.1 dB up to half the output Nyquist (5512 Hz),
        # well above the default VQT range top (~4.2 kHz)
        for f in (55, 110, 440, 1000, 2000, 4186, 5512):
            assert abs(self._tone_level_db(f, sr_in)) < 0.1, f
        # -3 dB point is beyond 0.8x output Nyquist
        assert self._tone_level_db(8820, sr_in) > -3.0

    @pytest.mark.parametrize("sr_in", [44100, 48000])
    def test_stopband_attenuation(self, sr_in):
        # transition band straddles the output Nyquist; deep stopband by
        # 1.45x Nyquist and >= 90 dB at the frequencies that would fold
        # back into the analysis band
        assert self._tone_level_db(16000, sr_in) < -45.0
        assert self._tone_level_db(18200, sr_in) < -90.0
        assert self._tone_level_db(20000, sr_in) < -90.0

    @pytest.mark.parametrize("sr_in", [44100, 48000])
    def test_alias_into_analysis_band_rejected(self, sr_in):
        """A tone whose fold-back lands INSIDE the VQT range (f_alias =
        sr_out - f <= 4.2 kHz => f >= 17.85 kHz) must be >= 90 dB down."""
        sr_out = 22050
        for f_alias in (1000.0, 3000.0, 4186.0):
            f = sr_out - f_alias
            t_in = np.arange(sr_in) / sr_in
            y = resample(np.sin(2 * np.pi * f * t_in).astype(np.float32), sr_in, sr_out)[0]
            seg = y[len(y) // 4 :].astype(np.float64)
            spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
            freqs = np.fft.rfftfreq(len(seg), 1.0 / sr_out)
            band = spec[np.abs(freqs - f_alias) < 50.0].max()
            full_scale = len(seg) / 4.0  # hann-windowed unit sine peak
            assert 20 * np.log10(band / full_scale + 1e-12) < -90.0, f_alias

    @pytest.mark.parametrize("sr_in", [44100, 48000])
    def test_group_delay(self, sr_in):
        """Measured impulse delay equals the documented closed form within
        one output sample."""
        from pitchvis_tpu.ops.resample import PolyphaseResampler, make_spec

        sr_out = 22050
        spec = make_spec(sr_in, sr_out)
        rs = PolyphaseResampler(sr_in, sr_out, 50 * spec.m)
        x = np.zeros(8000, np.float32)  # multiple of m for both rates
        x[2000] = 1.0
        y = resample(x, sr_in, sr_out)[0]
        measured = np.argmax(np.abs(y)) / sr_out - 2000 / sr_in
        assert abs(measured - rs.delay_secs) < 1.0 / sr_out


class TestResamplerCrossValidation:
    """Mutual validation of the serving-path PolyphaseResampler against an
    INDEPENDENT second implementation of the reference's resampling design:
    `FftChunkResampler`, the FFT-domain chunk algorithm family of rubato's
    `FftFixedIn` (audio_wasm.rs:176-209 — fixed input chunks, spectrum
    antialias + truncation, overlap-add). rubato's exact output is not
    reproducible here (no Rust toolchain), so two from-scratch designs
    agreeing to the filters' passband spec is the strongest available
    substitute (ROADMAP item 1 honesty framing)."""

    @staticmethod
    def _align_poly(yp: np.ndarray, delay_out_samples: float, n: int) -> np.ndarray:
        """Remove the polyphase group delay with an exact fractional shift
        (FFT phase ramp) so the two outputs share a time base."""
        spec = np.fft.rfft(yp[:n].astype(np.float64))
        f = np.fft.rfftfreq(n)
        return np.fft.irfft(spec * np.exp(2j * np.pi * f * delay_out_samples), n)

    @staticmethod
    def _poly_delay_out(sr_in: int, sr_out: int = 22050) -> float:
        from pitchvis_tpu.ops.resample import make_spec

        spec = make_spec(sr_in, sr_out)
        return (spec.taps_per_phase * spec.l - 1) / 2.0 / (spec.l * sr_in) * sr_out

    @pytest.mark.parametrize("sr_in", [44100, 48000])
    def test_fft_oracle_matches_analytic(self, sr_in):
        """The oracle itself is validated against closed-form truth: a
        two-tone resampled by FftChunkResampler matches the analytically
        resampled signal to > 120 dB SNR."""
        from pitchvis_tpu.ops.resample import FftChunkResampler

        sr_out = 22050
        t = np.arange(sr_in) / sr_in
        x = 0.5 * np.sin(2 * np.pi * 440.0 * t) + 0.25 * np.sin(2 * np.pi * 1320.0 * t)
        y = FftChunkResampler(sr_in, sr_out).resample(x)
        ty = np.arange(len(y)) / sr_out
        ref = 0.5 * np.sin(2 * np.pi * 440.0 * ty) + 0.25 * np.sin(2 * np.pi * 1320.0 * ty)
        sl = slice(1000, len(y) - 1000)
        snr = 10 * np.log10(np.mean(ref[sl] ** 2) / np.mean((y[sl] - ref[sl]) ** 2))
        assert snr > 120.0, snr

    @pytest.mark.parametrize("sr_in", [44100, 48000])
    def test_polyphase_matches_fft_oracle_tones(self, sr_in):
        from pitchvis_tpu.ops.resample import FftChunkResampler

        sr_out = 22050
        t = np.arange(sr_in) / sr_in
        x = (
            0.5 * np.sin(2 * np.pi * 440.0 * t) + 0.25 * np.sin(2 * np.pi * 1320.0 * t)
        ).astype(np.float32)
        y = FftChunkResampler(sr_in, sr_out).resample(x)
        yp = resample(x, sr_in, sr_out)[0]
        n = min(len(y), len(yp))
        ypa = self._align_poly(yp, self._poly_delay_out(sr_in), n)
        sl = slice(2000, n - 2000)
        snr = 10 * np.log10(np.mean(y[sl] ** 2) / np.mean((ypa[sl] - y[sl]) ** 2))
        assert snr > 70.0, snr  # measured ~88-91 dB (f32 polyphase floor)

    @pytest.mark.parametrize("sr_in", [44100, 48000])
    def test_polyphase_matches_fft_oracle_noise(self, sr_in):
        """Band-limited (50 Hz - 5 kHz, the VQT analysis band) noise through
        both implementations agrees sample-for-sample after group-delay
        alignment — the broadband version of the tone contract."""
        from pitchvis_tpu.ops.resample import FftChunkResampler

        sr_out = 22050
        rng = np.random.default_rng(1)
        n = sr_in
        w = np.fft.rfft(rng.standard_normal(n))
        fr = np.fft.rfftfreq(n, 1 / sr_in)
        w[(fr < 50) | (fr > 5000)] = 0
        x = np.fft.irfft(w, n)
        x = (0.2 * x / np.abs(x).max()).astype(np.float32)
        y = FftChunkResampler(sr_in, sr_out).resample(x)
        yp = resample(x, sr_in, sr_out)[0]
        nn = min(len(y), len(yp))
        ypa = self._align_poly(yp, self._poly_delay_out(sr_in), nn)
        sl = slice(2000, nn - 2000)
        snr = 10 * np.log10(np.mean(y[sl] ** 2) / np.mean((ypa[sl] - y[sl]) ** 2))
        assert snr > 50.0, snr  # measured ~61-65 dB

    def test_fft_streaming_ragged_chunks_match_offline(self):
        """FftChunkResampler's streaming process() is chunk-size invariant
        (bit-exact), like the polyphase streaming contract above."""
        from pitchvis_tpu.ops.resample import FftChunkResampler

        sr_in, sr_out = 48000, 22050
        rng = np.random.default_rng(3)
        x = (rng.standard_normal(sr_in // 2) * 0.1).astype(np.float32)
        offline = FftChunkResampler(sr_in, sr_out).resample(x)

        r = FftChunkResampler(sr_in, sr_out)
        xs = np.concatenate([np.zeros(r.h_in), x, np.zeros(2 * r.h_in)])
        outs, i = [], 0
        while i < len(xs):
            c = int(rng.integers(1, 5000))
            outs.append(r.process(xs[i : i + c]))
            i += c
        ys = np.concatenate([o for o in outs if len(o)])
        np.testing.assert_array_equal(
            ys[r.h_out : r.h_out + len(offline)], offline
        )


class TestPipeline:
    def test_step_multi_matches_sequential(self, small_params):
        """K hops via the scanned multi-step equal K sequential steps."""
        from pitchvis_tpu.models.pipeline import StreamingPipeline

        rng = np.random.default_rng(0)
        hop = 368
        k = 4
        chunks = (rng.standard_normal((k, 2, hop)) * 0.05).astype(np.float32)
        dt = hop / small_params.sr

        seq = StreamingPipeline(2, small_params)
        outs = [seq.step(chunks[i], dt) for i in range(k)]
        multi = StreamingPipeline(2, small_params)
        m_out = multi.step_multi(chunks, dt)

        np.testing.assert_allclose(
            np.asarray(m_out.x_vqt[-1]), np.asarray(outs[-1].x_vqt), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(multi.state.ring.gain), np.asarray(seq.state.ring.gain), atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(m_out.analysis.peaks[-1]), np.asarray(outs[-1].analysis.peaks)
        )

    def test_end_to_end_tone(self, small_params):
        """Streaming sim (BASELINE config #2/#3): feed a tone through
        AGC+ring+VQT+analysis at 60 Hz hops; the right peak must emerge."""
        from pitchvis_tpu.models.pipeline import StreamingPipeline

        params = small_params
        pipe = StreamingPipeline(2, params)
        f = params.range.min_freq * 2.0 ** (30.0 / params.range.buckets_per_octave)
        hop = 368
        t = np.arange(params.n_fft + hop * 40) / params.sr
        tone = (0.1 * np.sin(2 * np.pi * f * t)).astype(np.float32)
        out = None
        for i in range(40):
            chunk = tone[i * hop : (i + 1) * hop]
            chunks = np.stack([chunk, np.zeros_like(chunk)])
            out = pipe.step(chunks, hop / params.sr)
        peaks0 = np.where(np.asarray(out.analysis.peaks[0]))[0]
        assert len(peaks0) == 1 and abs(peaks0[0] - 30) <= 1
        assert not np.asarray(out.analysis.peaks[1]).any()  # silent stream
        assert float(out.gain[0]) > 1.0  # AGC pulled quiet tone up
        assert float(out.gain[1]) == 1.0  # silence frozen


class TestPipelineChurn:
    def test_reset_stream_matches_fresh_pipeline(self, small_params):
        """Recycling a batch slot of the on-device pipeline equals a freshly
        constructed pipeline for that stream, bit-for-bit, while other
        streams keep their carries."""
        from pitchvis_tpu.models.pipeline import StreamingPipeline

        rng = np.random.default_rng(5)
        hop = 368
        chunks = (rng.standard_normal((4, 2, hop)) * 0.05).astype(np.float32)
        dt = hop / small_params.sr

        pipe = StreamingPipeline(2, small_params, with_viewer=True)
        for c in chunks:
            pipe.step(c, dt)
        before_other = np.asarray(pipe.state.analysis.x_vqt_smoothed[0]).copy()

        pipe.reset_stream(1)
        assert float(pipe.state.ring.gain[1]) == 1.0
        assert np.all(np.asarray(pipe.state.ring.buffer[1]) == 0.0)
        assert np.all(np.asarray(pipe.state.analysis.x_vqt_smoothed[1]) == 0.0)
        np.testing.assert_array_equal(
            np.asarray(pipe.state.analysis.x_vqt_smoothed[0]), before_other
        )

        # the recycled slot now evolves exactly like a fresh single-stream
        # pipeline fed the same audio
        fresh = StreamingPipeline(1, small_params, with_viewer=True)
        chunks2 = (rng.standard_normal((3, 1, hop)) * 0.05).astype(np.float32)
        for c in chunks2:
            out_slot = pipe.step(np.concatenate([np.zeros_like(c), c]), dt)
            out_fresh = fresh.step(c, dt)
        np.testing.assert_allclose(
            np.asarray(out_slot.x_vqt[1]), np.asarray(out_fresh.x_vqt[0]), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(out_slot.analysis.peaks[1]),
            np.asarray(out_fresh.analysis.peaks[0]),
        )


class TestPipelineRebuild:
    def test_rebuild_preserves_audio(self, small_params):
        """The device-ring live rebuild: kernel swap mid-stream keeps the
        buffered audio, so the tone is still detected right after."""
        import dataclasses

        from pitchvis_tpu.models.pipeline import StreamingPipeline

        f = small_params.range.min_freq * 2.0 ** (30.0 / small_params.range.buckets_per_octave)
        hop = 368
        t = np.arange(hop * 46) / small_params.sr
        tone = (0.1 * np.sin(2 * np.pi * f * t)).astype(np.float32)

        pipe = StreamingPipeline(1, small_params)
        for i in range(40):
            out = pipe.step(tone[None, i * hop : (i + 1) * hop], hop / small_params.sr)
        assert np.asarray(out.analysis.peaks[0]).any()

        new_params = dataclasses.replace(small_params, quality=1.2)
        pipe.rebuild(new_params)
        assert pipe.vqt_params.quality == 1.2
        out = pipe.step(tone[None, 40 * hop : 41 * hop], hop / small_params.sr)
        peaks = np.where(np.asarray(out.analysis.peaks[0]))[0]
        assert any(abs(int(p) - 30) <= 1 for p in peaks)

        # layout change re-initializes the bin-indexed carries
        wider = dataclasses.replace(
            new_params, range=dataclasses.replace(new_params.range, octaves=3)
        )
        pipe.rebuild(wider)
        out = pipe.step(tone[None, 41 * hop : 42 * hop], hop / small_params.sr)
        assert out.x_vqt.shape == (1, wider.n_buckets)

        with pytest.raises(ValueError):
            pipe.rebuild(dataclasses.replace(wider, sr=44100.0))
        with pytest.raises(ValueError):
            pipe.rebuild(dataclasses.replace(wider, n_fft=1 << 20))

    def test_rebuild_to_larger_n_fft_with_buffer_len(self, small_params):
        """buffer_len headroom makes a live rebuild to a LARGER n_fft
        possible (without it the ring is exactly n_fft and the rebuild
        error's advice was unfollowable — round-4 review finding)."""
        import dataclasses

        from pitchvis_tpu.models.pipeline import StreamingPipeline

        bigger = dataclasses.replace(small_params, n_fft=small_params.n_fft * 2)
        # no headroom: rejected
        pipe = StreamingPipeline(1, small_params)
        with pytest.raises(ValueError, match="buffer"):
            pipe.rebuild(bigger)
        # with headroom: succeeds and keeps serving
        pipe = StreamingPipeline(1, small_params, buffer_len=bigger.n_fft)
        pipe.step(np.zeros((1, 368), np.float32), 368 / small_params.sr)
        pipe.rebuild(bigger)
        out = pipe.step(np.zeros((1, 368), np.float32), 368 / small_params.sr)
        assert out.x_vqt.shape == (1, bigger.n_buckets)
        with pytest.raises(ValueError, match="shorter than n_fft"):
            StreamingPipeline(1, small_params, buffer_len=small_params.n_fft // 2)

    def test_rebuild_rejects_layout_change_with_ml_model(self, small_params):
        """Trained ML params are bin-layout-bound: a range change with a
        model attached must raise upfront, not crash the next step inside
        jit with a flax shape error (round-3 review finding)."""
        import dataclasses

        import jax

        from pitchvis_tpu.models.pipeline import StreamingPipeline
        from pitchvis_tpu.models.pitch_mlp import PitchMLP

        t_window = 3
        n = small_params.n_buckets
        model = PitchMLP(input_bins=t_window * n, mlp_size=32, mlp_layers=1)
        mp = model.init(jax.random.PRNGKey(0), np.zeros((1, 1, t_window * n), np.float32))
        pipe = StreamingPipeline(
            1, small_params, ml_model=model, ml_params=mp, ml_t_window=t_window
        )
        wider = dataclasses.replace(
            small_params, range=dataclasses.replace(small_params.range, octaves=3)
        )
        with pytest.raises(ValueError, match="ML"):
            pipe.rebuild(wider)
        # a layout-preserving rebuild is still fine with the model attached
        pipe.rebuild(dataclasses.replace(small_params, quality=1.3))
        out = pipe.step(np.zeros((1, 368), np.float32), 368 / small_params.sr)
        assert out.ml_midi.shape == (1, 128)


class TestPallasServing:
    """Round-2 verdict item 1: path="pallas" routes the flagship serving
    pipeline through the fused Pallas VQT kernel (ops/vqt_pallas.py), so the
    repo's fastest kernel is the one the frame loop runs — the reference
    analog is the viewer's one-and-only VQT in its per-frame update
    (pitchvis_viewer/src/vqt_system.rs:40-68)."""

    def _tone_chunks(self, params, k=6, hop=368, n_streams=2):
        f = params.range.min_freq * 2.0 ** (30.0 / params.range.buckets_per_octave)
        t = np.arange(hop * k) / params.sr
        tone = (0.1 * np.sin(2 * np.pi * f * t)).astype(np.float32)
        rng = np.random.default_rng(7)
        noise = (rng.standard_normal(hop * k) * 0.03).astype(np.float32)
        per_stream = [tone, noise][:n_streams]
        return np.stack(
            [np.stack([s[i * hop : (i + 1) * hop] for s in per_stream]) for i in range(k)]
        )

    def test_pipeline_pallas_matches_time(self, small_params):
        from pitchvis_tpu.models.pipeline import StreamingPipeline

        chunks = self._tone_chunks(small_params)
        dt = 368 / small_params.sr
        pal = StreamingPipeline(2, small_params, path="pallas")
        ref = StreamingPipeline(2, small_params)
        for chunk in chunks:
            out_pal = pal.step(chunk, dt)
            out_ref = ref.step(chunk, dt)
        # split-K accumulation costs ~1e-3 dB vs the single-dot time path
        np.testing.assert_allclose(
            np.asarray(out_pal.x_vqt), np.asarray(out_ref.x_vqt), atol=2e-2
        )
        np.testing.assert_allclose(
            np.asarray(pal.state.ring.gain), np.asarray(ref.state.ring.gain), atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(out_pal.analysis.peaks), np.asarray(out_ref.analysis.peaks)
        )

    def test_pipeline_pallas_multi_hop(self, small_params):
        """The scanned multi-hop entry runs the fused kernel inside lax.scan."""
        from pitchvis_tpu.models.pipeline import StreamingPipeline

        chunks = self._tone_chunks(small_params, k=3)
        dt = 368 / small_params.sr
        multi = StreamingPipeline(2, small_params, path="pallas")
        seq = StreamingPipeline(2, small_params, path="pallas")
        m_out = multi.step_multi(chunks, dt)
        for chunk in chunks:
            s_out = seq.step(chunk, dt)
        np.testing.assert_allclose(
            np.asarray(m_out.x_vqt[-1]), np.asarray(s_out.x_vqt), atol=1e-5
        )

    def test_pipeline_pallas_fast_mode_budget(self, small_params):
        """fast=True (bf16 weights) through the serving pipeline stays inside
        the documented dB error budget and finds the same tone peak."""
        from pitchvis_tpu.models.pipeline import StreamingPipeline

        chunks = self._tone_chunks(small_params)
        dt = 368 / small_params.sr
        fast = StreamingPipeline(2, small_params, path="pallas", fast=True)
        exact = StreamingPipeline(2, small_params, path="pallas")
        for chunk in chunks:
            out_fast = fast.step(chunk, dt)
            out_exact = exact.step(chunk, dt)
        # bf16 budget (test_bf16.py pins <=0.15 dB max at default params)
        assert (
            np.abs(np.asarray(out_fast.x_vqt) - np.asarray(out_exact.x_vqt)).max() < 0.3
        )
        # the musical content is identical: same peak set on the tone stream
        np.testing.assert_array_equal(
            np.asarray(out_fast.analysis.peaks[0]),
            np.asarray(out_exact.analysis.peaks[0]),
        )


class TestFusedPipeline:
    """VERDICT item 8: ML inference + LED color stages fused into the one
    jitted serving step (mirrors common.rs:2076-2118's single frame update)."""

    def test_fused_matches_separate_stages(self, small_params):
        import jax
        from pitchvis_tpu.io.led import led_frame_values
        from pitchvis_tpu.models.ml_system import init_ml_state_batch, ml_step_batch
        from pitchvis_tpu.models.pipeline import StreamingPipeline
        from pitchvis_tpu.models.pitch_mlp import PitchMLP

        t_window = 3
        n = small_params.n_buckets
        model = PitchMLP(input_bins=t_window * n, mlp_size=32, mlp_layers=1)
        mp = model.init(jax.random.PRNGKey(0), np.zeros((1, 1, t_window * n), np.float32))

        rng = np.random.default_rng(0)
        hop = 368
        chunks = (rng.standard_normal((3, 2, hop)) * 0.05).astype(np.float32)
        dt = hop / small_params.sr

        fused = StreamingPipeline(
            2, small_params, ml_model=model, ml_params=mp,
            ml_t_window=t_window, with_led=True,
        )
        plain = StreamingPipeline(2, small_params)

        ml_state = init_ml_state_batch(2, t_window, n)
        for i in range(3):
            out_f = fused.step(chunks[i], dt)
            out_p = plain.step(chunks[i], dt)
            ml_state, want_ml = ml_step_batch(model, mp, ml_state, out_p.analysis.x_vqt_smoothed)

        # analysis outputs unchanged by fusion
        np.testing.assert_allclose(
            np.asarray(out_f.x_vqt), np.asarray(out_p.x_vqt), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(out_f.analysis.peaks), np.asarray(out_p.analysis.peaks)
        )
        # fused ML equals the standalone stage fed with the same spectra
        assert out_f.ml_midi.shape == (2, 128)
        np.testing.assert_allclose(np.asarray(out_f.ml_midi), np.asarray(want_ml), atol=1e-4)
        # fused LED equals the standalone stage on the same analysis outputs
        want_led = jax.vmap(
            lambda m, c, s: led_frame_values(small_params.range, m, c, s)
        )(out_p.analysis.peaks, out_p.analysis.peak_center, out_p.analysis.peak_size)
        assert out_f.led.dtype == np.uint8
        np.testing.assert_array_equal(np.asarray(out_f.led), np.asarray(want_led))

    def test_fused_viewer_stage(self, small_params):
        """with_viewer=True emits every display-derived quantity of the
        reference's update_display pass, equal to the standalone viewer
        functions fed with the same analysis outputs, with the ball fade
        carry threaded through the pipeline state."""
        import jax
        from pitchvis_tpu.models.pipeline import StreamingPipeline
        from pitchvis_tpu.models.viewer import (
            BallState,
            bloom_intensity,
            chroma_vector,
            spectrogram_row_vqt,
            update_balls,
        )

        rng = np.random.default_rng(2)
        hop = 368
        chunks = (rng.standard_normal((3, 2, hop)) * 0.05).astype(np.float32)
        dt = hop / small_params.sr

        fused = StreamingPipeline(2, small_params, with_viewer=True)
        plain = StreamingPipeline(2, small_params)

        ball_state = jax.vmap(lambda _: BallState.init(small_params.n_buckets))(
            np.arange(2)
        )
        for i in range(3):
            out_f = fused.step(chunks[i], dt)
            out_p = plain.step(chunks[i], dt)
            a = out_p.analysis
            ball_state, want_balls = jax.vmap(
                lambda bs, p, c, s, cal, acc, dev: update_balls(
                    small_params.range, bs, p, c, s, cal, acc, dev, dt
                )
            )(
                ball_state, a.peaks, a.peak_center, a.peak_size,
                a.calmness, a.pitch_accuracy, a.pitch_deviation,
            )

        v = out_f.viewer
        assert v is not None
        np.testing.assert_allclose(
            np.asarray(v.balls.position), np.asarray(want_balls.position), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(v.balls.scale), np.asarray(want_balls.scale), atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(v.balls.visible), np.asarray(want_balls.visible)
        )
        want_chroma = jax.vmap(lambda xs: chroma_vector(xs, small_params.range))(
            a.x_vqt_smoothed
        )
        np.testing.assert_allclose(np.asarray(v.chroma), np.asarray(want_chroma), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(v.bloom), np.asarray(bloom_intensity(a.scene_calmness)), atol=1e-6
        )
        want_row = jax.vmap(lambda xs: spectrogram_row_vqt(small_params.range, xs))(
            a.x_vqt_smoothed
        )
        assert v.spectrogram_row.dtype == np.uint8
        np.testing.assert_array_equal(np.asarray(v.spectrogram_row), np.asarray(want_row))

    def test_fused_multi_hop(self, small_params):
        """step_multi carries the ML history through the scan."""
        import jax
        from pitchvis_tpu.models.pipeline import StreamingPipeline
        from pitchvis_tpu.models.pitch_mlp import PitchMLP

        t_window = 3
        n = small_params.n_buckets
        model = PitchMLP(input_bins=t_window * n, mlp_size=32, mlp_layers=1)
        mp = model.init(jax.random.PRNGKey(0), np.zeros((1, 1, t_window * n), np.float32))

        rng = np.random.default_rng(1)
        hop = 368
        chunks = (rng.standard_normal((4, 2, hop)) * 0.05).astype(np.float32)
        dt = hop / small_params.sr

        multi = StreamingPipeline(
            2, small_params, ml_model=model, ml_params=mp,
            ml_t_window=t_window, with_led=True,
        )
        seq = StreamingPipeline(
            2, small_params, ml_model=model, ml_params=mp,
            ml_t_window=t_window, with_led=True,
        )
        m_out = multi.step_multi(chunks, dt)
        for i in range(4):
            s_out = seq.step(chunks[i], dt)
        np.testing.assert_allclose(
            np.asarray(m_out.ml_midi[-1]), np.asarray(s_out.ml_midi), atol=1e-4
        )
        np.testing.assert_array_equal(np.asarray(m_out.led[-1]), np.asarray(s_out.led))
