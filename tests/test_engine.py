"""Component contracts for the full SoundFont render engine
(pitchvis_tpu/synth/engine.py vs rustysynth_fork's render path:
volume_envelope.rs, modulation_envelope.rs, lfo.rs, bi_quad_filter.rs,
oscillator.rs, reverb.rs, chorus.rs, voice_collection.rs, channel.rs)."""

import numpy as np
import pytest

from pitchvis_tpu.synth.engine import (
    BiQuadFilter,
    Chorus,
    Lfo,
    MidiFileSequencer,
    ModulationEnvelope,
    Oscillator,
    Reverb,
    Synthesizer,
    SynthesizerSettings,
    VolumeEnvelope,
)
from pitchvis_tpu.synth.midi import load_midi, write_midi
from pitchvis_tpu.synth.sf2 import (
    GEN_EXCLUSIVE_CLASS,
    GEN_FREQ_VIB_LFO,
    GEN_INITIAL_FILTER_FC,
    GEN_SUSTAIN_VOL_ENV,
    GEN_VIB_LFO_TO_PITCH,
    SoundFont,
    write_minimal_sf2,
)

SR = 22050


@pytest.fixture(scope="module")
def sine_font_factory(tmp_path_factory):
    def make(name, **kwargs):
        t = np.arange(400)
        wave = 0.8 * np.sin(2 * np.pi * t / 50)  # 441 Hz at 22050
        path = str(tmp_path_factory.mktemp("engf") / f"{name}.sf2")
        write_minimal_sf2(path, wave, SR, root_key=69, loop=True, **kwargs)
        return SoundFont.from_file(path)

    return make


def _synth(font, effects=False, polyphony=64):
    return Synthesizer(
        font,
        SynthesizerSettings(SR, maximum_polyphony=polyphony, enable_reverb_and_chorus=effects),
    )


class TestVolumeEnvelope:
    def test_dahdsr_stages(self):
        env = VolumeEnvelope(SR)
        # delay 10ms, attack 20ms, hold 10ms, decay 100ms, sustain 0.5, release 50ms
        env.start(0.01, 0.02, 0.01, 0.1, 0.5, 0.05)
        assert env.value == 0.0  # in delay
        env.process(int(0.02 * SR))  # t=20ms: mid-attack (10..30ms)
        assert 0.3 < env.value < 0.7
        env.process(int(0.015 * SR))  # t=35ms: hold (30..40ms)
        assert env.value == 1.0
        env.process(int(0.06 * SR))  # t=95ms: decay, exponential toward sustain
        v1 = env.value
        assert 0.5 <= v1 < 1.0
        env.process(int(0.5 * SR))  # deep into decay: clamped at sustain
        assert env.value == pytest.approx(0.5)
        env.release()
        alive = env.process(int(0.01 * SR))
        assert alive and 0.0 < env.value < 0.5
        # exponential release eventually drops below audibility -> dead
        assert not env.process(int(0.2 * SR))

    def test_decay_is_exponential(self):
        """value = exp(-9.226 * t / decay), the reference's dB-linear decay
        (volume_envelope.rs:59)."""
        env = VolumeEnvelope(SR)
        env.start(0.0, 1e-5, 0.0, 1.0, 0.0, 0.1)
        env.process(int(0.25 * SR))
        t = env.processed_sample_count / SR
        assert env.value == pytest.approx(np.exp(-9.226 * t), rel=0.02)

    def test_priority_ordering(self):
        """Stealing priority: delay > attack > hold > decay > release
        (volume_envelope.rs:103-137)."""
        vals = []
        env = VolumeEnvelope(SR)
        env.start(0.01, 0.02, 0.01, 0.1, 0.5, 0.05)
        vals.append(env.priority)  # delay
        env.process(int(0.02 * SR))
        vals.append(env.priority)  # attack
        env.process(int(0.015 * SR))
        vals.append(env.priority)  # hold
        env.process(int(0.08 * SR))
        vals.append(env.priority)  # decay
        env.release()
        env.process(64)
        vals.append(env.priority)  # release
        assert vals == sorted(vals, reverse=True)


class TestModulationEnvelope:
    def test_linear_decay_and_release(self):
        env = ModulationEnvelope(SR)
        env.start(0.0, 1e-5, 0.0, 1.0, 0.2, 0.5)
        env.process(int(0.5 * SR))
        t = env.processed_sample_count / SR
        # linear decay: value = (decay_end - t) / decay
        assert env.value == pytest.approx(1.0 - t, rel=0.05)
        env.process(int(2.0 * SR))
        assert env.value == pytest.approx(0.2)  # sustain floor


class TestLfo:
    def test_triangle_with_delay(self):
        lfo = Lfo(SR, 64)
        lfo.start(delay=0.1, frequency=5.0)  # period 0.2s
        # still in delay
        for _ in range(int(0.05 * SR / 64)):
            lfo.process()
        assert lfo.value == 0.0
        # advance to delay + quarter period: triangle peak +1
        while lfo.processed_sample_count / SR < 0.1 + 0.05:
            lfo.process()
        assert lfo.value == pytest.approx(1.0, abs=0.1)
        # at delay + 3/4 period: trough -1
        while lfo.processed_sample_count / SR < 0.1 + 0.15:
            lfo.process()
        assert lfo.value == pytest.approx(-1.0, abs=0.1)

    def test_inactive_below_frequency_floor(self):
        lfo = Lfo(SR, 64)
        lfo.start(0.0, 1e-4)
        lfo.process()
        assert lfo.value == 0.0


class TestBiQuadFilter:
    def test_low_pass_response(self):
        f = BiQuadFilter(SR)
        f.set_low_pass_filter(1000.0, 1.0)
        t = np.arange(4096) / SR

        def gain(freq):
            f.clear_buffer()
            f.set_low_pass_filter(1000.0, 1.0)
            x = np.sin(2 * np.pi * freq * t).astype(np.float32)
            y = x.copy()
            f.process(y)
            return np.abs(y[2048:]).max()

        assert gain(100.0) == pytest.approx(1.0, abs=0.1)  # passband
        assert gain(8000.0) < 0.05  # stopband (-26 dB+)

    def test_resonance_peak(self):
        """Q > 1 produces a gain peak near the cutoff (bi_quad_filter.rs
        peak-height approximation)."""
        f = BiQuadFilter(SR)
        t = np.arange(8192) / SR
        x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
        f.set_low_pass_filter(1000.0, 4.0)
        y = x.copy()
        f.process(y)
        peak = np.abs(y[4096:]).max()
        assert peak == pytest.approx(4.0, rel=0.15)

    def test_above_nyquist_disables(self):
        f = BiQuadFilter(SR)
        f.set_low_pass_filter(0.6 * SR, 1.0)
        assert not f.active
        x = np.random.default_rng(0).standard_normal(64).astype(np.float32)
        y = x.copy()
        f.process(y)
        np.testing.assert_array_equal(x, y)


class TestOscillator:
    def _data(self):
        # a ramp makes interpolation errors obvious
        return np.arange(-100, 400, dtype=np.int16)

    def test_no_loop_ends(self):
        osc = Oscillator(SR)
        data = self._data()
        osc.start(0, SR, 0, 200, 0, 200, 60, 0, 0, 100)
        block = np.zeros(64, np.float32)
        assert osc.process(data, block, 60.0)  # unity pitch ratio
        np.testing.assert_allclose(block, data[:64].astype(np.float32) / 32768.0, atol=1e-6)
        for _ in range(2):
            osc.process(data, block, 60.0)
        # position now 192; next block crosses end=200 -> zero tail
        assert osc.process(data, block, 60.0)
        assert np.all(block[8:] == 0.0)
        assert not osc.process(data, block, 60.0)  # dead

    def test_loop_wraps_continuously(self):
        osc = Oscillator(SR)
        data = self._data()
        osc.start(1, SR, 0, 200, 50, 150, 60, 0, 0, 100)
        block = np.zeros(64, np.float32)
        for _ in range(10):
            assert osc.process(data, block, 60.0)
        # after wrapping, samples stay within the loop range [50, 150)
        lo, hi = data[50] / 32768.0, data[150] / 32768.0
        assert block.min() >= lo - 1e-5 and block.max() <= hi + 1e-5

    def test_pitch_ratio_doubles_per_octave(self):
        osc = Oscillator(SR)
        data = self._data()
        osc.start(1, SR, 0, 200, 0, 200, 60, 0, 0, 100)
        block = np.zeros(64, np.float32)
        osc.process(data, block, 72.0)  # +1 octave
        # position advanced 2 samples per output sample
        assert osc.position == pytest.approx(128.0, abs=1e-6)


class TestReverb:
    def test_impulse_tail(self):
        rv = Reverb(SR)
        n = 64
        out_l = np.zeros(n, np.float32)
        out_r = np.zeros(n, np.float32)
        imp = np.zeros(n, np.float32)
        imp[0] = 1.0
        rv.process(imp, out_l, out_r)
        silence = np.zeros(n, np.float32)
        energy = []
        for _ in range(200):  # ~0.6 s
            rv.process(silence, out_l, out_r)
            energy.append(float(np.abs(out_l).sum() + np.abs(out_r).sum()))
        energy = np.array(energy)
        assert energy.max() > 0.0  # a tail exists
        # decays: late tail below early tail
        assert energy[150:].mean() < energy[10:40].mean()
        # stereo decorrelation from the 23-sample spread
        rv2 = Reverb(SR)
        rv2.process(imp, out_l, out_r)
        assert np.abs(out_l - out_r).max() >= 0.0  # defined


class TestChorus:
    def test_delayed_copy(self):
        ch = Chorus(SR, 0.002, 0.0019, 0.4)
        n = 256
        imp = np.zeros(n, np.float32)
        imp[0] = 1.0
        out_l = np.zeros(n, np.float32)
        out_r = np.zeros(n, np.float32)
        ch.process(imp, imp.copy(), out_l, out_r)
        # the left tap starts at ~delay+0 of the sine table -> ~44 samples
        peak_l = int(np.argmax(np.abs(out_l)))
        assert 1 <= peak_l <= int((0.002 + 0.0019) * SR) + 2
        assert np.abs(out_l).max() > 0.4
        # right tap is 90 degrees into the table -> different delay
        peak_r = int(np.argmax(np.abs(out_r)))
        assert peak_r != peak_l


class TestVoiceManagement:
    def test_polyphony_steal_lowest_priority(self, sine_font_factory):
        font = sine_font_factory("steal")
        synth = _synth(font, polyphony=8)
        buf = np.zeros(256, np.float32)
        for key in range(60, 68):
            synth.note_on(0, key, 100)
        synth.render(buf, buf.copy())
        # release one note -> its envelope priority drops below the others
        synth.note_off(0, 60)
        for _ in range(4):
            synth.render(buf, buf.copy())
        synth.note_on(0, 80, 100)
        keys = sorted(v.key for v in synth.get_active_voices())
        assert 80 in keys and len(keys) == 8 and 60 not in keys

    def test_exclusive_class_reuses_voice(self, sine_font_factory):
        font = sine_font_factory("excl", instrument_gens=[(GEN_EXCLUSIVE_CLASS, 1)])
        synth = _synth(font)
        synth.note_on(0, 60, 100)
        synth.note_on(0, 64, 100)  # same exclusive class -> reuses the voice
        assert len(synth.get_active_voices()) == 1
        assert synth.get_active_voices()[0].key == 64


class TestChannelState:
    def test_pitch_bend_shifts_frequency(self, sine_font_factory):
        font = sine_font_factory("bend")
        synth = _synth(font)
        synth.process_midi_message(0, 0xE0, 0, 127)  # max bend = +2 semitones
        synth.note_on(0, 69, 100)
        n = 16384
        left = np.zeros(n, np.float32)
        synth.render(left, left.copy())
        spec = np.abs(np.fft.rfft(left[2048:]))
        f = np.argmax(spec) * SR / (n - 2048)
        assert abs(f - 441.0 * 2 ** (2 / 12)) < 10.0

    def test_channel_volume_is_squared(self, sine_font_factory):
        """GM: gain scales with (volume * expression)^2 (voice.rs:232-234)."""
        font = sine_font_factory("vol")

        def rms_at_volume(v):
            synth = _synth(font)
            synth.process_midi_message(0, 0xB0, 0x07, v)
            synth.note_on(0, 69, 100)
            buf = np.zeros(8192, np.float32)
            synth.render(buf, buf.copy())
            return float(np.sqrt((buf[4096:] ** 2).mean()))

        full, half = rms_at_volume(127), rms_at_volume(64)
        assert half / full == pytest.approx((64 / 127) ** 2, rel=0.1)

    def test_hold_pedal_defers_release(self, sine_font_factory):
        font = sine_font_factory("hold", instrument_gens=[(GEN_SUSTAIN_VOL_ENV, 0)])
        synth = _synth(font)
        synth.process_midi_message(0, 0xB0, 0x40, 127)  # pedal down
        synth.note_on(0, 69, 100)
        buf = np.zeros(4096, np.float32)
        synth.render(buf, buf.copy())
        synth.note_off(0, 69)
        for _ in range(5):
            synth.render(buf, buf.copy())
        assert len(synth.get_active_voices()) == 1  # held
        synth.process_midi_message(0, 0xB0, 0x40, 0)  # pedal up
        for _ in range(20):
            synth.render(buf, buf.copy())
        assert len(synth.get_active_voices()) == 0


class TestModulation:
    def test_vibrato_widens_spectrum(self, sine_font_factory):
        plain = sine_font_factory("plain")
        vib = sine_font_factory(
            "vib",
            instrument_gens=[(GEN_VIB_LFO_TO_PITCH, 100), (GEN_FREQ_VIB_LFO, 0)],
        )  # 100 cents depth, 8.176 Hz LFO

        def spectral_width(font):
            synth = _synth(font)
            synth.note_on(0, 69, 100)
            n = 32768
            buf = np.zeros(n, np.float32)
            synth.render(buf, buf.copy())
            spec = np.abs(np.fft.rfft(buf[8192:]))
            freqs = np.arange(len(spec)) * SR / (n - 8192)
            keep = (freqs > 300) & (freqs < 650)
            p = spec[keep] ** 2
            f = freqs[keep]
            mean = (p * f).sum() / p.sum()
            return float(np.sqrt((p * (f - mean) ** 2).sum() / p.sum()))

        assert spectral_width(vib) > 2.0 * spectral_width(plain)

    def test_filter_cutoff_darkens(self, sine_font_factory, tmp_path):
        """A low initialFilterFc removes the harmonics of a bright source."""
        t = np.arange(400)
        square = 0.5 * np.sign(np.sin(2 * np.pi * t / 50))
        bright_path = str(tmp_path / "bright.sf2")
        dark_path = str(tmp_path / "dark.sf2")
        write_minimal_sf2(bright_path, square, SR, root_key=69, loop=True)
        write_minimal_sf2(
            dark_path, square, SR, root_key=69, loop=True,
            instrument_gens=[(GEN_INITIAL_FILTER_FC, 7000)],  # ~470 Hz
        )

        def hf_ratio(path):
            synth = _synth(SoundFont.from_file(path))
            synth.note_on(0, 69, 100)
            n = 16384
            buf = np.zeros(n, np.float32)
            synth.render(buf, buf.copy())
            spec = np.abs(np.fft.rfft(buf[4096:])) ** 2
            freqs = np.arange(len(spec)) * SR / (n - 4096)
            return float(spec[freqs > 1000].sum() / spec.sum())

        assert hf_ratio(dark_path) < 0.25 * hf_ratio(bright_path)


class TestEndToEnd:
    def test_reverb_tail_present_in_mix(self, sine_font_factory, tmp_path):
        font = sine_font_factory("rv")
        midi_path = str(tmp_path / "rv.mid")
        write_midi(midi_path, [(0.0, 0.3, 0, 69, 110)])
        synth = Synthesizer(font, SynthesizerSettings(SR))  # effects ON (default)
        seq = MidiFileSequencer(synth)
        seq.play(load_midi(midi_path))
        n = int(1.5 * SR)
        left = np.zeros(n, np.float32)
        right = np.zeros(n, np.float32)
        seq.render(left, right)
        # voice is gone after release, but the reverb tail still sounds
        tail = left[int(1.0 * SR):]
        assert len(synth.get_active_voices()) == 0
        assert np.abs(tail).max() > 1e-6
        # and the stereo channels differ (combs are spread by 23 samples)
        assert np.abs(left - right).max() > 1e-4


def _native_available():
    try:
        from pitchvis_tpu.runtime import native

        return native.available()
    except Exception:
        return False


@pytest.mark.skipif(not _native_available(), reason="native library not built")
class TestNativeEngine:
    """The C++ engine (native/synth_engine.cpp) must match the NumPy
    reference implementation sample-for-sample (f32 accumulation-order
    tolerance)."""

    def _midi(self, tmp_path):
        path = str(tmp_path / "nat.mid")
        write_midi(
            path,
            [(0.0, 0.5, 0, 69, 100), (0.25, 0.7, 0, 76, 90), (0.6, 0.5, 1, 52, 120)],
        )
        return load_midi(path)

    def test_matches_reference_engine(self, sine_font_factory, tmp_path):
        from pitchvis_tpu.synth.engine_native import NativeSequencer, NativeSynthesizer

        font = sine_font_factory("native")
        midi = self._midi(tmp_path)
        n = 2 * SR

        synth = Synthesizer(font, SynthesizerSettings(SR))
        seq = MidiFileSequencer(synth)
        seq.play(midi)
        l1 = np.zeros(n, np.float32)
        r1 = np.zeros(n, np.float32)
        seq.render(l1, r1)

        ns = NativeSynthesizer(font, SR)
        nq = NativeSequencer(ns)
        nq.play(midi)
        l2 = np.zeros(n, np.float32)
        r2 = np.zeros(n, np.float32)
        nq.render(l2, r2)

        assert np.abs(l1 - l2).max() < 1e-4
        assert np.abs(r1 - r2).max() < 1e-4
        assert np.abs(l1).max() > 0.01  # actually sounding

    def test_native_voice_introspection(self, sine_font_factory):
        from pitchvis_tpu.synth.engine_native import NativeSynthesizer

        font = sine_font_factory("natvoice")
        synth = Synthesizer(font, SynthesizerSettings(SR))
        ns = NativeSynthesizer(font, SR)
        buf = np.zeros(1024, np.float32)
        for s in (synth, ns):
            s.note_on(0, 60, 110)
            s.render(buf.copy(), buf.copy())
        ref = synth.get_active_voices()[0]
        got = ns.get_active_voices()[0]
        assert got.key == ref.key == 60
        assert got.current_mix_gain_left == pytest.approx(ref.current_mix_gain_left, abs=1e-5)

    def test_train_loop_matches_python_pipeline(self, sine_font_factory, tmp_path):
        """pv_train_synthesize (windows + previous-snapshot labels) agrees
        with the Python chunk loop in dataset.annotate_midi."""
        from pitchvis_tpu.synth.engine_native import synthesize_labeled, windows_from_stream

        font = sine_font_factory("natloop")
        midi = self._midi(tmp_path)
        sr, chunk, step, n_fft, bufsize = SR, 2112, 3, 8192, 2 * SR
        stream, labels = synthesize_labeled(
            font, midi, sample_rate=sr, chunk=chunk, step_chunks=step, max_seconds=2.0,
        )
        windows = windows_from_stream(stream, len(labels), chunk=chunk,
                                      step_chunks=step, n_fft=n_fft)
        # python mirror
        from pitchvis_tpu.synth.engine import (
            MidiFileSequencer as PySeq,
            Synthesizer as PySynth,
            SynthesizerSettings,
        )

        synth = PySynth(font, SynthesizerSettings(sr))
        seq = PySeq(synth)
        seq.play(midi)
        ring = np.zeros(bufsize, np.float32)
        gain, written, cc = 1.0, 0, 0
        left = np.zeros(chunk, np.float32)
        right = np.zeros(chunk, np.float32)
        py_windows, py_labels = [], []
        prev: dict[int, float] = {}
        total = int(sr * min(midi.get_length(), 2.0))
        while written < total:
            cc += 1
            seq.render(left, right)
            written += chunk
            mono = (left + right) / 2.0
            frozen = float(np.sum(mono**2)) < 1e-6
            ring = np.concatenate([ring[chunk:], mono])
            tail = ring[-chunk:].copy()
            if frozen:
                tail *= gain
            else:
                g = gain
                for i in range(len(tail)):
                    x = tail[i] * g
                    tail[i] = x
                    g *= max(1.0 + 0.001 * (1.0 - x * x / 0.07), 0.001)
                gain = g
            ring[-chunk:] = tail
            if cc % step:
                continue
            py_windows.append(ring[-n_fft:].copy())
            py_labels.append(prev)
            prev = {}
            for v in synth.get_active_voices():
                gv = (v.current_mix_gain_left + v.current_mix_gain_right) / 2.0 * gain
                if gv > prev.get(v.key, -1.0):
                    prev[v.key] = gv
        assert len(windows) == len(py_windows)
        for w, pw in zip(windows, py_windows):
            assert np.abs(w - pw).max() < 1e-3
        for lab, plab in zip(labels, py_labels):
            assert set(lab) == set(plab)
            for k in lab:
                assert lab[k] == pytest.approx(plab[k], rel=1e-2, abs=1e-4)


class TestMalformedSf2:
    """Round-2 review findings: sample addresses and loop bounds come from
    untrusted SF2 generators; both engines must stay memory-safe, produce
    finite audio, and agree with each other on malformed input (the native
    engine previously read out of bounds where the Python engine raised)."""

    def _make_font(self, tmp_path, name, **kwargs):
        t = np.arange(400)
        wave = 0.8 * np.sin(2 * np.pi * t / 50)  # 441 Hz at 22050
        path = str(tmp_path / f"{name}.sf2")
        write_minimal_sf2(path, wave, SR, root_key=69, loop=True, **kwargs)
        return SoundFont.from_file(path)

    def _render(self, synth, n=4096):
        synth.note_on(0, 69, 100)
        left = np.zeros(n, np.float32)
        right = np.zeros(n, np.float32)
        synth.render(left, right)
        return left

    def _check_both(self, font):
        py = self._render(Synthesizer(font, SynthesizerSettings(SR)))
        assert np.isfinite(py).all()
        if _native_available():
            from pitchvis_tpu.synth.engine_native import NativeSynthesizer

            nat = self._render(NativeSynthesizer(font, SR))
            assert np.isfinite(nat).all()
            assert np.abs(py - nat).max() < 1e-4
        return py

    def test_out_of_bounds_end_loop_offset(self, tmp_path):
        """end_loop pushed far past the wave data (the reproduced native
        heap-overread): indices clamp to the wave instead."""
        from pitchvis_tpu.synth.sf2 import GEN_ENDLOOP_OFFSET

        font = self._make_font(
            tmp_path, "oob", instrument_gens=[(GEN_ENDLOOP_OFFSET, 30000)]
        )
        self._check_both(font)

    def test_zero_length_loop(self, tmp_path):
        """start_loop == end_loop (division by zero in the wrap): the voice
        falls back to one-shot playback instead of emitting NaNs."""
        from pitchvis_tpu.synth.sf2 import GEN_STARTLOOP_OFFSET

        font = self._make_font(
            tmp_path, "zloop", instrument_gens=[(GEN_STARTLOOP_OFFSET, 400)]
        )
        py = self._check_both(font)
        assert np.abs(py[:256]).max() > 0.0  # the one-shot pass still sounds

    def test_negative_start_offset(self, tmp_path):
        """start pushed before the wave data: indices clamp at 0."""
        from pitchvis_tpu.synth.sf2 import GEN_START_ADDRS_OFFSET

        font = self._make_font(
            tmp_path, "negstart", instrument_gens=[(GEN_START_ADDRS_OFFSET, -32000)]
        )
        self._check_both(font)

    def test_duplicate_preset_last_wins(self, tmp_path):
        """Fonts with duplicate (bank, patch) ids: both engines must pick the
        LAST one (rustysynth's HashMap insert order), distinguished here by a
        +12 semitone preset-zone coarse tune on the duplicate."""
        import copy

        from pitchvis_tpu.synth.sf2 import GEN_COARSE_TUNE

        font = self._make_font(tmp_path, "dup")
        dup = copy.deepcopy(font.presets[0])
        for r in dup.regions:
            r.gs[GEN_COARSE_TUNE] += 12
        font.presets.append(dup)
        font.preset_lookup = {
            (p.bank_number << 16) | p.patch_number: i for i, p in enumerate(font.presets)
        }

        py = self._check_both(font)
        # dominant frequency must be an octave up (882 Hz, the duplicate)
        spec = np.abs(np.fft.rfft(py * np.hanning(len(py))))
        f_peak = np.argmax(spec) * SR / len(py)
        assert abs(f_peak - 882.0) < 40.0, f_peak


class TestAdversarialWaveData:
    """Degenerate wave tables (adversarial SF2s whose smpl chunk is shorter
    than the sample headers claim): voices must go silent, never index out
    of bounds — the contract both oscillators document."""

    def _osc(self, loop_mode):
        osc = Oscillator(SR)
        # generators claim a 100-sample region with a 50-sample loop
        osc.start(loop_mode, SR, 0, 100, 0, 50, 60, 0, 0, 100)
        return osc

    @pytest.mark.parametrize("loop_mode", [0, 1])
    @pytest.mark.parametrize("n_data", [0, 1])
    def test_python_oscillator_silent(self, loop_mode, n_data):
        osc = self._osc(loop_mode)
        block = np.ones(64, np.float32)
        alive = osc.process(np.zeros(n_data, np.int16), block, 60.0)
        assert alive is False
        assert np.all(block == 0.0)

    @pytest.mark.skipif(not _native_available(), reason="native library not built")
    def test_native_empty_wave_renders_silence(self, sine_font_factory, monkeypatch):
        from pitchvis_tpu.synth import engine_native

        font = sine_font_factory("emptywave")
        tables = dict(engine_native.font_tables(font))
        tables["wave"] = np.zeros(0, np.int16)  # headers still claim samples
        monkeypatch.setattr(engine_native, "font_tables", lambda f: tables)
        ns = engine_native.NativeSynthesizer(font, SR)
        ns.note_on(0, 60, 100)
        left = np.full(2048, 7.0, np.float32)
        right = np.full(2048, 7.0, np.float32)
        ns.render(left, right)
        assert np.all(left == 0.0) and np.all(right == 0.0)


@pytest.mark.skipif(not _native_available(), reason="native library not built")
class TestNativeSettingsValidation:
    """NativeSynthesizer enforces the same validated ranges as
    SynthesizerSettings (block_size < 2 would read before the block in the
    biquad; block_size=0 and tiny sample rates hang the render loop)."""

    @pytest.mark.parametrize(
        "kwargs",
        [
            dict(block_size=0),
            dict(block_size=1),
            dict(block_size=4096),
            dict(maximum_polyphony=1),
            dict(maximum_polyphony=10_000),
        ],
    )
    def test_out_of_range_rejected(self, sine_font_factory, kwargs):
        from pitchvis_tpu.synth.engine_native import NativeSynthesizer

        font = sine_font_factory("badsettings")
        with pytest.raises(ValueError):
            NativeSynthesizer(font, SR, **kwargs)

    def test_bad_sample_rate_rejected(self, sine_font_factory):
        from pitchvis_tpu.synth.engine_native import NativeSynthesizer

        font = sine_font_factory("badsr")
        with pytest.raises(ValueError):
            NativeSynthesizer(font, 100)

    def test_native_create_rejects_directly(self, sine_font_factory):
        """Defense in depth: pv_engine_create itself returns nullptr for
        out-of-range settings (the ctypes wrapper is not the only guard)."""
        import ctypes

        from pitchvis_tpu.runtime import native
        from pitchvis_tpu.synth import engine_native

        lib = native.get_lib()
        font = sine_font_factory("rawcreate")
        t = engine_native.font_tables(font)
        h = lib.pv_engine_create(
            engine_native._i16ptr(t["wave"]), len(t["wave"]),
            engine_native._i16ptr(t["inst_gs"]),
            engine_native._i32ptr(t["inst_extra"]), len(t["inst_gs"]),
            engine_native._i32ptr(t["instruments"]), len(t["instruments"]),
            engine_native._i16ptr(t["preset_gs"]),
            engine_native._i32ptr(t["preset_inst"]), len(t["preset_gs"]),
            engine_native._i32ptr(t["presets"]), len(t["presets"]),
            SR, 1, 64, 0,  # block_size=1: out of range
        )
        assert not ctypes.c_void_p(h).value
