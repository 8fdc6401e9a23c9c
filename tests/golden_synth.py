"""Deterministic construction of the synth-engine golden scenario.

Shared by the golden test (tests/test_engine_golden.py) and the one-shot
generator (``python -m tests.golden_synth`` from the repo root) that wrote
the committed ``tests/golden/synth_golden.npz``. Everything is built from
code — font waveform, SF2 bytes, MIDI file — so the golden pins the FULL
render chain: SF2 writer + parser, region lookup, DAHDSR envelopes, LFOs,
biquad, stereo pan, reverb + chorus sends, block sequencer
(rustysynth_fork/src: synthesizer.rs, voice.rs, reverb.rs, chorus.rs,
midifile_sequencer.rs semantics).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

SR = 22050
SECONDS = 1.2
GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "synth_golden.npz")

# channel 0: overlapping melody notes; channel 1: low chord held past a
# note-off (release tails + polyphony); velocities vary the mix gains
NOTES = [
    (0.00, 0.50, 0, 69, 100),
    (0.25, 0.70, 0, 76, 90),
    (0.40, 0.30, 0, 81, 70),
    (0.10, 0.90, 1, 45, 120),
    (0.10, 0.90, 1, 52, 80),
]


def build_font(dir_path: str):
    from pitchvis_tpu.synth.sf2 import SoundFont, write_minimal_sf2

    t = np.arange(400)
    # two harmonics -> non-trivial spectrum; loops cleanly every 50 samples
    wave = 0.7 * np.sin(2 * np.pi * t / 50) + 0.2 * np.sin(4 * np.pi * t / 50)
    path = os.path.join(dir_path, "golden.sf2")
    write_minimal_sf2(path, wave, SR, root_key=69, loop=True)
    return SoundFont.from_file(path)


def build_midi(dir_path: str):
    from pitchvis_tpu.synth.midi import load_midi, write_midi

    path = os.path.join(dir_path, "golden.mid")
    write_midi(path, NOTES)
    return load_midi(path)


def render_numpy() -> tuple[np.ndarray, np.ndarray]:
    """The f64/NumPy reference engine with reverb + chorus enabled."""
    from pitchvis_tpu.synth.engine import (
        MidiFileSequencer,
        Synthesizer,
        SynthesizerSettings,
    )

    with tempfile.TemporaryDirectory() as d:
        synth = Synthesizer(
            build_font(d), SynthesizerSettings(SR, enable_reverb_and_chorus=True)
        )
        seq = MidiFileSequencer(synth)
        seq.play(build_midi(d))
        n = int(SECONDS * SR)
        left = np.zeros(n, np.float32)
        right = np.zeros(n, np.float32)
        seq.render(left, right)
    return left, right


def main() -> None:
    left, right = render_numpy()
    assert np.abs(left).max() > 0.01, "golden scenario must actually sound"
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    np.savez_compressed(GOLDEN_PATH, left=left, right=right)
    print(f"wrote {GOLDEN_PATH}: {len(left)} samples, peak {np.abs(left).max():.4f}")


if __name__ == "__main__":
    main()
