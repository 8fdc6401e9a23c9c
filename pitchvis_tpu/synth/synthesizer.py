"""Polyphonic MIDI synthesizer for training-data generation.

Capability equivalent of the reference's vendored rustysynth fork
(rustysynth_fork/src/synthesizer.rs, voice.rs, midi_file_sequencer.rs): a
voice-per-note renderer with per-voice envelopes and introspectable mix
gains — the fork's deltas vs upstream are exactly `get_active_voices()` and
public `key` / `current_mix_gain_*` (synthesizer.rs:525-527, voice.rs:38-39),
which the training pipeline uses for labels (train.rs:318-338).

Instead of SoundFont sample playback this synthesizer uses per-program
harmonic additive voices (bandlimited) with ADSR envelopes: training only
needs realistic harmonic spectra + accurate active-voice gains, not
general-MIDI fidelity. The render core optionally delegates to the native
C++ kernel (pitchvis_tpu/synth/native.py) when built; the NumPy path is the
reference implementation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .midi import MidiFile

A4_KEY = 69
A4_FREQ = 440.0


def key_to_freq(key: int) -> float:
    return A4_FREQ * 2.0 ** ((key - A4_KEY) / 12.0)


@dataclass
class ProgramTimbre:
    """Harmonic amplitude profile + ADSR (seconds, sustain level)."""

    harmonics: np.ndarray
    attack: float = 0.01
    decay: float = 0.15
    sustain: float = 0.7
    release: float = 0.25


def _harmonics(rolloff: float, n: int = 10) -> np.ndarray:
    h = np.arange(1, n + 1, dtype=np.float64)
    a = 1.0 / h**rolloff
    return (a / np.sqrt((a**2).sum())).astype(np.float64)


# GM family -> timbre (coarse: family = program // 8)
_FAMILY_TIMBRES = {
    0: ProgramTimbre(_harmonics(1.6), 0.005, 0.8, 0.25, 0.2),  # piano
    1: ProgramTimbre(_harmonics(2.2), 0.003, 0.5, 0.3, 0.15),  # chromatic perc
    2: ProgramTimbre(_harmonics(1.4), 0.02, 0.3, 0.8, 0.3),  # organ
    3: ProgramTimbre(_harmonics(1.2), 0.004, 0.4, 0.5, 0.2),  # guitar
    4: ProgramTimbre(_harmonics(1.1), 0.01, 0.3, 0.7, 0.25),  # bass
    5: ProgramTimbre(_harmonics(1.3), 0.06, 0.2, 0.85, 0.35),  # strings
    6: ProgramTimbre(_harmonics(1.5), 0.05, 0.25, 0.8, 0.3),  # ensemble
    7: ProgramTimbre(_harmonics(1.8), 0.03, 0.2, 0.85, 0.2),  # brass
    8: ProgramTimbre(_harmonics(2.0), 0.04, 0.2, 0.8, 0.25),  # reed
    9: ProgramTimbre(_harmonics(2.5), 0.03, 0.2, 0.85, 0.25),  # pipe
}
_DEFAULT_TIMBRE = _FAMILY_TIMBRES[0]


@dataclass
class Voice:
    """One sounding note (voice.rs): public key and current mix gains are
    what the label extractor reads."""

    channel: int
    key: int
    velocity: int
    freq: float
    timbre: ProgramTimbre
    phase: float = 0.0
    age: float = 0.0  # seconds since note-on
    released_at: float | None = None
    current_mix_gain_left: float = 0.0
    current_mix_gain_right: float = 0.0

    def envelope(self, t: np.ndarray) -> np.ndarray:
        """ADSR evaluated at per-sample ages t (vectorized)."""
        tb = self.timbre
        env = np.where(
            t < tb.attack,
            t / max(tb.attack, 1e-5),
            np.where(
                t < tb.attack + tb.decay,
                1.0 - (1.0 - tb.sustain) * (t - tb.attack) / max(tb.decay, 1e-5),
                tb.sustain,
            ),
        )
        if self.released_at is not None:
            tr = t - self.released_at
            env = np.where(tr > 0, env * np.maximum(1.0 - tr / max(tb.release, 1e-5), 0.0), env)
        return env

    def done(self) -> bool:
        return (
            self.released_at is not None
            and self.age > self.released_at + self.timbre.release
        )


@dataclass
class SampleVoice:
    """SoundFont sample-playback voice: pitch-shifted looped sample with an
    attack/release envelope from the region's volume-envelope generators."""

    channel: int
    key: int
    velocity: int
    region: object  # sf2.Region
    font: object  # sf2.SoundFont
    out_rate: float
    position: float = 0.0
    age: float = 0.0
    released_at: float | None = None
    current_mix_gain_left: float = 0.0
    current_mix_gain_right: float = 0.0

    def done(self) -> bool:
        r = self.region
        if self.released_at is not None and self.age > self.released_at + r.release_secs:
            return True
        if not r.loops and self.position >= (r.sample.end - r.sample.start):
            return True
        return False

    def render_into(self, mix: np.ndarray, master_gain: float) -> None:
        r = self.region
        s = r.sample
        n = len(mix)
        data = self.font.samples
        step = r.pitch_ratio(self.key) * s.sample_rate / self.out_rate
        pos = self.position + step * np.arange(n)
        length = s.end - s.start
        if r.loops and s.end_loop > s.start_loop:
            loop_start = s.start_loop - s.start
            loop_len = s.end_loop - s.start_loop
            over = pos >= (s.end_loop - s.start)
            pos = np.where(over, loop_start + np.mod(pos - loop_start, loop_len), pos)
        pos = np.clip(pos, 0.0, length - 1.001)
        i0 = pos.astype(np.int64)
        frac = (pos - i0).astype(np.float32)
        base = s.start
        wave = data[base + i0] * (1.0 - frac) + data[base + i0 + 1] * frac
        if not r.loops:
            wave = np.where(self.position + step * np.arange(n) < length, wave, 0.0)

        # envelope: linear attack, sustain 1, linear release
        t = self.age + np.arange(n) / self.out_rate
        env = np.minimum(t / max(r.attack_secs, 1e-4), 1.0)
        if self.released_at is not None:
            tr = t - self.released_at
            env = np.where(tr > 0, env * np.maximum(1.0 - tr / max(r.release_secs, 1e-4), 0.0), env)
        atten = 10.0 ** (-r.attenuation_cb / 200.0)  # centibels
        vel_gain = self.velocity / 127.0
        mix += (master_gain * vel_gain * atten) * env.astype(np.float32) * wave

        self.position += step * n
        self.age += n / self.out_rate
        self.current_mix_gain_left = float(vel_gain * env[-1])
        self.current_mix_gain_right = self.current_mix_gain_left


class Synthesizer:
    """Real-time polyphonic renderer (synthesizer.rs at capability level).
    With a `sound_font` (synth/sf2.py SoundFont) voices play SF2 samples;
    without one they use the additive-harmonic timbres."""

    MAX_VOICES = 64

    def __init__(self, sample_rate: int = 22050, sound_font=None):
        self.sample_rate = sample_rate
        self.voices: list = []
        self.programs = [0] * 16
        self.master_gain = 0.18
        self.sound_font = sound_font

    def process_program_change(self, channel: int, program: int) -> None:
        self.programs[channel] = program

    def note_on(self, channel: int, key: int, velocity: int) -> None:
        if channel == 9:  # percussion channel: no pitched content
            return
        if len(self.voices) >= self.MAX_VOICES:
            self.voices.pop(0)
        if self.sound_font is not None:
            bank = 128 if channel == 9 else 0
            for region in self.sound_font.regions_for(bank, self.programs[channel], key, velocity):
                self.voices.append(
                    SampleVoice(channel, key, velocity, region, self.sound_font, self.sample_rate)
                )
            return
        timbre = _FAMILY_TIMBRES.get(self.programs[channel] // 8, _DEFAULT_TIMBRE)
        self.voices.append(
            Voice(channel, key, velocity, key_to_freq(key), timbre)
        )

    def note_off(self, channel: int, key: int) -> None:
        for v in self.voices:
            if v.channel == channel and v.key == key and v.released_at is None:
                v.released_at = v.age

    def render(self, left: np.ndarray, right: np.ndarray) -> None:
        """Renders len(left) samples into the provided buffers (the
        rustysynth render API shape). Uses the native C++ voice kernel when
        built (additive voices only); the NumPy path below is the reference
        implementation."""
        if self.sound_font is not None:
            mix32 = np.zeros(len(left), np.float32)
            for v in self.voices:
                v.render_into(mix32, self.master_gain)
            self.voices = [v for v in self.voices if not v.done()]
            left[:] = mix32
            right[:] = mix32
            return
        if self._try_native_render(left, right):
            return
        n = len(left)
        sr = self.sample_rate
        t_rel = np.arange(n) / sr
        mix = np.zeros(n, np.float64)
        nyq = sr / 2.0

        for v in self.voices:
            ages = v.age + t_rel
            env = v.envelope(ages)
            amp = (v.velocity / 127.0) * self.master_gain
            # bandlimited additive synthesis
            wave = np.zeros(n, np.float64)
            for h, a in enumerate(v.timbre.harmonics, start=1):
                fh = v.freq * h
                if fh >= nyq:
                    break
                wave += a * np.sin(v.phase * h + 2.0 * math.pi * fh * t_rel)
            sig = amp * env * wave
            mix += sig
            # voice state advance
            v.phase = (v.phase + 2.0 * math.pi * v.freq * n / sr) % (2.0 * math.pi)
            v.age += n / sr
            # per-voice mix gain excludes the master volume (rustysynth's
            # current_mix_gain_* is the voice's own velocity/envelope gain,
            # voice.rs:38-39) — label extraction thresholds depend on this
            gain_now = float((v.velocity / 127.0) * env[-1])
            v.current_mix_gain_left = gain_now
            v.current_mix_gain_right = gain_now

        self.voices = [v for v in self.voices if not v.done()]
        left[:] = mix.astype(np.float32)
        right[:] = mix.astype(np.float32)

    def _try_native_render(self, left: np.ndarray, right: np.ndarray) -> bool:
        try:
            from ..runtime import native
        except Exception:
            return False
        if not native.available():
            return False
        n = len(left)
        vs = self.voices
        if not vs:
            left[:] = 0.0
            right[:] = 0.0
            return True
        mix = np.zeros(n, np.float32)
        freq = np.array([v.freq for v in vs], np.float64)
        phase = np.array([v.phase for v in vs], np.float64)
        age = np.array([v.age for v in vs], np.float64)
        released = np.array(
            [v.released_at if v.released_at is not None else -1.0 for v in vs], np.float64
        )
        vel = np.array([v.velocity / 127.0 for v in vs], np.float64)
        amp = vel * self.master_gain
        harm = np.stack([v.timbre.harmonics for v in vs]).astype(np.float64)
        gains = native.synth_render(
            mix, float(self.sample_rate), freq, phase, age, released, amp,
            np.array([v.timbre.attack for v in vs], np.float64),
            np.array([v.timbre.decay for v in vs], np.float64),
            np.array([v.timbre.sustain for v in vs], np.float64),
            np.array([v.timbre.release for v in vs], np.float64),
            harm,
        )
        for v, p, a, g, vl in zip(vs, phase, age, gains, vel):
            v.phase = float(p)
            v.age = float(a)
            env_last = float(g) / max(float(vl) * self.master_gain, 1e-12)
            gain_now = float(vl) * env_last
            v.current_mix_gain_left = gain_now
            v.current_mix_gain_right = gain_now
        self.voices = [v for v in vs if not v.done()]
        left[:] = mix
        right[:] = mix
        return True

    def get_active_voices(self) -> list[Voice]:
        """The fork's introspection hook (synthesizer.rs:525-527)."""
        return list(self.voices)


class MidiFileSequencer:
    """Plays a MidiFile through a Synthesizer in render-sized chunks
    (rustysynth_fork/src/midi_file_sequencer.rs)."""

    def __init__(self, synthesizer: Synthesizer):
        self.synthesizer = synthesizer
        self._midi: MidiFile | None = None
        self._cursor = 0
        self._now = 0.0

    def play(self, midi: MidiFile, loop: bool = False) -> None:
        del loop
        self._midi = midi
        self._cursor = 0
        self._now = 0.0

    def render(self, left: np.ndarray, right: np.ndarray) -> None:
        assert self._midi is not None, "call play() first"
        n = len(left)
        end = self._now + n / self.synthesizer.sample_rate
        events = self._midi.events
        # dispatch all events inside this chunk at chunk granularity
        while self._cursor < len(events) and events[self._cursor].time < end:
            ev = events[self._cursor]
            if ev.kind == "on":
                self.synthesizer.note_on(ev.channel, ev.key, ev.velocity)
            elif ev.kind == "off":
                self.synthesizer.note_off(ev.channel, ev.key)
            elif ev.kind == "program":
                self.synthesizer.process_program_change(ev.channel, ev.program)
            self._cursor += 1
        self.synthesizer.render(left, right)
        self._now = end
