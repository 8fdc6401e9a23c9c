"""SoundFont (SF2) parsing + sample-playback tests (vs rustysynth_fork's
SoundFont/voice render path used by pitchvis_train)."""

import numpy as np
import pytest

from pitchvis_tpu.synth.sf2 import SoundFont, write_minimal_sf2
from pitchvis_tpu.synth.synthesizer import Synthesizer


@pytest.fixture(scope="module")
def sine_font(tmp_path_factory):
    """A single-sample font: one loop of a 441 Hz sine at 22050 Hz (50
    samples per period), root key 69 (A4 = 440 Hz nominal)."""
    sr = 22050
    period = 50  # exactly 441 Hz
    t = np.arange(period * 8)
    sample = 0.8 * np.sin(2 * np.pi * t / period)
    path = str(tmp_path_factory.mktemp("sf2") / "sine.sf2")
    write_minimal_sf2(path, sample, sr, root_key=69, loop=True)
    return SoundFont.from_file(path), path, sr


class TestParsing:
    def test_structure(self, sine_font):
        font, _, sr = sine_font
        assert (0, 0) in font.presets
        preset = font.presets[(0, 0)]
        assert len(preset.regions) == 1
        r = preset.regions[0]
        assert r.sample.sample_rate == sr
        assert r.sample.original_pitch == 69
        assert r.loops
        assert r.contains(60, 100) and r.contains(0, 1) and r.contains(127, 127)
        assert len(font.samples) > 0

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            SoundFont(b"RIFFxxxxnope" + b"\0" * 64)
        with pytest.raises(ValueError):
            SoundFont(b"not even riff")

    def test_pitch_ratio(self, sine_font):
        font, _, _ = sine_font
        r = font.presets[(0, 0)].regions[0]
        assert r.pitch_ratio(69) == pytest.approx(1.0)
        assert r.pitch_ratio(81) == pytest.approx(2.0)
        assert r.pitch_ratio(57) == pytest.approx(0.5)


class TestSamplePlayback:
    def _dominant_freq(self, synth, key, sr, n=16384):
        synth.note_on(0, key, 100)
        left = np.zeros(n, np.float32)
        right = np.zeros(n, np.float32)
        synth.render(left, right)
        spec = np.abs(np.fft.rfft(left[2048:]))
        return np.argmax(spec) * sr / (n - 2048)

    def test_root_key_frequency(self, sine_font):
        font, _, sr = sine_font
        synth = Synthesizer(sr, sound_font=font)
        f = self._dominant_freq(synth, 69, sr)
        assert abs(f - 441.0) < 6.0  # the sample itself is 441 Hz

    def test_pitch_shifted_octave(self, sine_font):
        font, _, sr = sine_font
        synth = Synthesizer(sr, sound_font=font)
        f = self._dominant_freq(synth, 81, sr)
        assert abs(f - 882.0) < 10.0

    def test_loop_sustains(self, sine_font):
        font, _, sr = sine_font
        synth = Synthesizer(sr, sound_font=font)
        synth.note_on(0, 69, 100)
        buf = np.zeros(4096, np.float32)
        for _ in range(10):  # well past the 400-sample sample length
            synth.render(buf, buf.copy())
        assert np.abs(buf).max() > 0.05  # still sounding (looped)
        assert len(synth.get_active_voices()) == 1

    def test_release_ends_voice(self, sine_font):
        font, _, sr = sine_font
        synth = Synthesizer(sr, sound_font=font)
        synth.note_on(0, 69, 100)
        buf = np.zeros(2048, np.float32)
        synth.render(buf, buf.copy())
        synth.note_off(0, 69)
        for _ in range(10):
            synth.render(buf, buf.copy())
        assert len(synth.get_active_voices()) == 0
        assert np.abs(buf).max() < 1e-4

    def test_active_voice_gains_for_labels(self, sine_font):
        """Label extraction (train.rs:318-338) reads current_mix_gain_*."""
        font, _, sr = sine_font
        synth = Synthesizer(sr, sound_font=font)
        synth.note_on(0, 60, 110)
        buf = np.zeros(1024, np.float32)
        synth.render(buf, buf.copy())
        v = synth.get_active_voices()[0]
        assert v.key == 60
        assert v.current_mix_gain_left > 0.5


class TestDatasetWithFont:
    def test_generate_dataset_with_soundfont(self, sine_font, tmp_path):
        from pitchvis_tpu.synth.midi import write_midi
        from pitchvis_tpu.train.dataset import generate_dataset
        from tests.test_synth import SMALL_TRAIN_PARAMS

        _, font_path, _ = sine_font
        midi_path = str(tmp_path / "m.mid")
        write_midi(midi_path, [(0.0, 3.0, 0, 57, 110)])  # A3 = 220 Hz
        data = generate_dataset(
            [midi_path], SMALL_TRAIN_PARAMS, max_seconds_per_file=3.0,
            sound_font_path=font_path,
        )
        row_len = SMALL_TRAIN_PARAMS.n_buckets + 128
        rows = data.reshape(-1, row_len)
        labeled = rows[rows[:, SMALL_TRAIN_PARAMS.n_buckets + 57] > 0.5]
        assert len(labeled) >= 1
        # A3 via the font lands at bin 36 (min_freq 110, 36 bpo)
        assert abs(int(np.argmax(labeled[0, : SMALL_TRAIN_PARAMS.n_buckets])) - 36) <= 2
