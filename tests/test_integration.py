"""Cross-subsystem integration: the synthesizer's output through the full
serving pipeline must analyze back to the notes that were played.

This ties together the SF2 render engine (synth/), the streaming serving
step (models/pipeline.py: ring + AGC + VQT + analysis), and the note
mathematics — the whole point of the system: MIDI in, correct pitches out.
Reference analog: the viewer running on rustysynth-rendered audio.
"""

import numpy as np
import pytest

from pitchvis_tpu.core.config import VqtParameters, VqtRange

# reduced-size analysis config (multi-rate, cheap on CPU)
PARAMS = VqtParameters(
    sr=22050.0,
    n_fft=8192,
    range=VqtRange(min_freq=110.0, octaves=4, buckets_per_octave=24),
    sparsity_quantile=0.999,
    quality=1.6,
    gamma=4.8 * 1.6,
)


def midi_key_bin(key: int) -> int:
    """Expected peak bin for a MIDI key under PARAMS (min_freq 110 Hz = A2
    = key 45)."""
    return round((key - 45) * PARAMS.range.buckets_per_octave / 12.0)


@pytest.fixture(scope="module")
def chord_audio(tmp_path_factory):
    """An A-minor triad (A3, C4, E4) rendered by the FULL SF2 engine."""
    from pitchvis_tpu.synth.engine import (
        MidiFileSequencer,
        Synthesizer,
        SynthesizerSettings,
    )
    from pitchvis_tpu.synth.midi import load_midi, write_midi
    from pitchvis_tpu.synth.sf2 import SoundFont, write_minimal_sf2

    d = tmp_path_factory.mktemp("integ")
    sr = int(PARAMS.sr)
    t = np.arange(400)
    # near-sine sample: keeps harmonics weak so the peak set is the triad
    wave = 0.8 * np.sin(2 * np.pi * t / 50)
    sf_path = str(d / "integ.sf2")
    write_minimal_sf2(sf_path, wave, sr, root_key=69, loop=True)
    midi_path = str(d / "integ.mid")
    keys = [57, 60, 64]  # A3, C4, E4
    write_midi(midi_path, [(0.0, 2.0, 0, k, 100) for k in keys])

    synth = Synthesizer(
        SoundFont.from_file(sf_path),
        SynthesizerSettings(sr, enable_reverb_and_chorus=False),
    )
    seq = MidiFileSequencer(synth)
    seq.play(load_midi(midi_path))
    n = int(1.6 * sr)
    left = np.zeros(n, np.float32)
    right = np.zeros(n, np.float32)
    seq.render(left, right)
    return (left + right) / 2.0, keys


class TestMidiToPeaks:
    def test_chord_detected_through_serving_pipeline(self, chord_audio):
        from pitchvis_tpu.models.pipeline import StreamingPipeline

        audio, keys = chord_audio
        pipe = StreamingPipeline(1, PARAMS)
        hop = int(PARAMS.sr / 60.0)
        out = None
        for i in range(len(audio) // hop):
            out = pipe.step(audio[None, i * hop : (i + 1) * hop], hop / PARAMS.sr)
        peaks = np.where(np.asarray(out.analysis.peaks[0]))[0]
        want = [midi_key_bin(k) for k in keys]
        for w in want:
            assert any(abs(int(p) - w) <= 1 for p in peaks), (
                f"note bin {w} not among detected peaks {peaks.tolist()}"
            )
        # and nothing wildly spurious: every detected peak is near a note
        # or one of its low harmonics (octave / octave+fifth / 2 octaves)
        harmonic_offsets = (0, 24, 38, 48)  # unison, +1 oct, +oct+fifth, +2 oct
        for p in peaks:
            ok = any(
                abs(int(p) - (w + h)) <= 1 for w in want for h in harmonic_offsets
            )
            assert ok, f"spurious peak at bin {int(p)} (notes at {want})"

    def test_chord_detected_on_pallas_fast_path(self, chord_audio):
        """Same audio through the flagship serving config (fused Pallas VQT,
        bf16 weights): identical note set."""
        from pitchvis_tpu.models.pipeline import StreamingPipeline

        audio, keys = chord_audio
        pipe = StreamingPipeline(1, PARAMS, path="pallas", fast=True)
        hop = int(PARAMS.sr / 60.0)
        out = None
        for i in range(len(audio) // hop):
            out = pipe.step(audio[None, i * hop : (i + 1) * hop], hop / PARAMS.sr)
        peaks = np.where(np.asarray(out.analysis.peaks[0]))[0]
        for k in keys:
            w = midi_key_bin(k)
            assert any(abs(int(p) - w) <= 1 for p in peaks), (
                f"note bin {w} not among detected peaks {peaks.tolist()}"
            )
