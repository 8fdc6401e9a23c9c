"""Synthesizer / MIDI / dataset-generation tests (vs rustysynth_fork usage in
pitchvis_train/src/train.rs)."""

import numpy as np
import pytest

from pitchvis_tpu.core.config import VqtParameters, VqtRange
from pitchvis_tpu.synth.midi import load_midi, parse_midi, write_midi
from pitchvis_tpu.synth.synthesizer import MidiFileSequencer, Synthesizer, key_to_freq
from pitchvis_tpu.train.dataset import (
    center_vqt_samples,
    generate_data_row,
    generate_dataset,
)


class TestMidi:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "t.mid")
        notes = [(0.0, 0.5, 0, 60, 100), (0.25, 0.5, 0, 64, 90), (1.0, 0.25, 1, 45, 80)]
        write_midi(path, notes)
        midi = load_midi(path)
        ons = [e for e in midi.events if e.kind == "on"]
        offs = [e for e in midi.events if e.kind == "off"]
        assert len(ons) == 3 and len(offs) == 3
        assert ons[0].key == 60 and abs(ons[0].time - 0.0) < 1e-3
        assert abs(ons[1].time - 0.25) < 1e-3
        assert ons[2].channel == 1
        assert abs(midi.get_length() - 1.25) < 1e-2

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            parse_midi(b"not a midi file at all")


class TestSynth:
    def test_tone_frequency(self):
        sr = 22050
        synth = Synthesizer(sr)
        synth.note_on(0, 69, 100)  # A4 = 440 Hz
        left = np.zeros(8192, np.float32)
        right = np.zeros(8192, np.float32)
        synth.render(left, right)
        spec = np.abs(np.fft.rfft(left[2048:]))  # skip attack
        f_peak = np.argmax(spec) * sr / len(left[2048:])
        assert abs(f_peak - 440.0) < 8.0
        assert np.max(np.abs(left)) > 0.01

    def test_active_voices_and_release(self):
        sr = 22050
        synth = Synthesizer(sr)
        synth.note_on(0, 60, 100)
        synth.note_on(0, 64, 100)
        buf = np.zeros(1024, np.float32)
        synth.render(buf, buf.copy())
        voices = synth.get_active_voices()
        assert sorted(v.key for v in voices) == [60, 64]
        assert all(v.current_mix_gain_left > 0 for v in voices)
        synth.note_off(0, 60)
        # render past the release tail
        for _ in range(20):
            synth.render(buf, buf.copy())
        assert [v.key for v in synth.get_active_voices()] == [64]

    def test_sequencer_plays_events(self, tmp_path):
        path = str(tmp_path / "seq.mid")
        write_midi(path, [(0.0, 0.3, 0, 57, 100)])  # A3
        midi = load_midi(path)
        synth = Synthesizer(22050)
        seq = MidiFileSequencer(synth)
        seq.play(midi)
        left = np.zeros(2205, np.float32)
        right = np.zeros(2205, np.float32)
        seq.render(left, right)
        assert np.abs(left).max() > 0.01
        assert len(synth.get_active_voices()) == 1

    def test_key_to_freq(self):
        assert abs(key_to_freq(69) - 440.0) < 1e-6
        assert abs(key_to_freq(33) - 55.0) < 1e-3  # A1 = FREQ_A1_MIDI_KEY_ID


SMALL_TRAIN_PARAMS = VqtParameters(
    sr=22050.0,
    n_fft=8192,
    range=VqtRange(min_freq=110.0, octaves=4, buckets_per_octave=36),
    quality=10.0,
    gamma=53.0,
)


class TestDataset:
    def test_generate_data_row(self):
        row = generate_data_row({60: 0.9, 45: 0.2}, np.ones(144, np.float32), 144)
        assert row.shape == (144 + 128,)
        assert row[144 + 60] == 1.0  # attack > 0.5
        assert row[144 + 45] == 0.0  # attack <= 0.5

    def test_end_to_end_generation(self, tmp_path):
        """train.rs:112-207 end to end on a tiny MIDI corpus: the labeled
        key must coincide with VQT energy at the right bin."""
        path = str(tmp_path / "corpus.mid")
        # MIDI key 57 = A3 = 220 Hz = bin 36 for min_freq=110, 36 bpo
        write_midi(path, [(0.0, 3.0, 0, 57, 110)])
        data = generate_dataset([path], SMALL_TRAIN_PARAMS, max_seconds_per_file=3.0)
        row_len = SMALL_TRAIN_PARAMS.n_buckets + 128
        assert len(data) % row_len == 0
        rows = data.reshape(-1, row_len)
        assert len(rows) >= 2
        labeled = rows[rows[:, SMALL_TRAIN_PARAMS.n_buckets + 57] > 0.5]
        assert len(labeled) >= 1
        vqt_part = labeled[0, : SMALL_TRAIN_PARAMS.n_buckets]
        assert abs(int(np.argmax(vqt_part)) - 36) <= 2

    def test_center_vqt_augmentation(self):
        """train.rs:466-499: positives centered at 40 semitones, negatives
        shifted by the fixed shift table."""
        bps = 3
        note = 30
        vqt = np.array(
            [1000.0 - abs(i - note * bps) for i in range(86 * bps)], np.float32
        )
        pos, neg = center_vqt_samples({33 + note: 1.0}, vqt, bps, 7)
        assert len(pos) == 1
        assert pos[0][0][40 * bps] == 1000.0
        shifts = [-24, -19, -12, -9, -8, -7, -6, -5, -4, -3, 3, 4, 5, 6, 7, 8, 9, 12, 19, 24]
        assert len(neg) == len(shifts)
        for (sample, _), shift in zip(neg, shifts):
            assert sample[(40 - shift) * bps] == 1000.0
