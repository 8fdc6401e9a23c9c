"""Fully on-device training-data generation.

The host pipeline (train/dataset.py) mirrors the reference: sequential
chunked synthesis + AGC on the CPU, batched VQT on the device. This module
moves the DSP onto the TPU as well:

* **Synthesis is stateless in absolute time**: an additive voice's phase is
  2*pi*f*(t - t_on), so the whole signal renders as one batched
  (notes x samples) sin-sum — no sequential chunk loop, no phase carry.
  Matches synth/synthesizer.py's additive voices to f32 tolerance.
* **AGC** runs as a lax.scan over chunks (the dagc recurrence inside each
  chunk via ops/agc, per-chunk silence freeze), entirely on device.
* **Windows + VQT + labels** are the existing batched stages.

Only MIDI parsing and the note schedule stay on the host.

Single-file economics: the sequential dagc scan (one sample at a time for
one stream) keeps the TPU nearly idle, so the native host pipeline is ~2x
faster for one file. The device path wins when generation batches many
files (the AGC scan and synthesis are vectorized over the batch axis) or
when no native toolchain is available.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TRAIN_VQT_PARAMETERS, AgcParameters, VqtParameters
from ..ops.agc import agc_chunk
from ..ops.vqt import Vqt
from ..synth.midi import MidiFile
from ..synth.synthesizer import _DEFAULT_TIMBRE, _FAMILY_TIMBRES, key_to_freq
from .dataset import STEP_SIZE_IN_CHUNKS, generate_data_row

MAX_HARMONICS = 10


@dataclass
class NoteSchedule:
    """Host-side note table extracted from a MidiFile (percussion dropped)."""

    t_on: np.ndarray  # (K,) seconds
    t_off: np.ndarray  # (K,) seconds (note-off time; end of file if none)
    key: np.ndarray  # (K,) int
    velocity: np.ndarray  # (K,)
    harmonics: np.ndarray  # (K, MAX_HARMONICS)
    attack: np.ndarray
    decay: np.ndarray
    sustain: np.ndarray
    release: np.ndarray
    # (K,) absolute seconds a voice is force-silenced by the 64-voice pool
    # (inf = never evicted); see _polyphony_forced_ends
    t_cut: np.ndarray | None = None

    def __len__(self) -> int:
        return len(self.t_on)


def schedule_from_midi(
    midi: MidiFile, length: float, quantize_secs: float | None = None
) -> NoteSchedule:
    """`quantize_secs` rounds event times UP to the dispatch grid, mirroring
    MidiFileSequencer's block-start dispatch (an event inside a block fires
    at the start of the next block, midifile_sequencer.rs:60-76) so device
    and host renders align sample-exactly. Pass 64/sr to match the default
    block size."""

    def q(t: float) -> float:
        if quantize_secs is None:
            return t
        return math.ceil(t / quantize_secs - 1e-9) * quantize_secs

    programs = [0] * 16
    open_notes: dict[tuple[int, int], list] = {}
    rows = []
    for ev in midi.events:
        if ev.kind == "program":
            programs[ev.channel] = ev.program
        elif ev.kind == "on" and ev.channel != 9:
            timbre = _FAMILY_TIMBRES.get(programs[ev.channel] // 8, _DEFAULT_TIMBRE)
            row = [q(ev.time), length, ev.key, ev.velocity, timbre]
            open_notes.setdefault((ev.channel, ev.key), []).append(row)
            rows.append(row)
        elif ev.kind == "off":
            # the host synthesizer's note_off releases ALL unreleased voices
            # for (channel, key) (synth/synthesizer.py note_off), so close
            # every open note here too — popping only the oldest would keep a
            # second overlapping same-key note sounding on the device path
            stack = open_notes.pop((ev.channel, ev.key), None)
            if stack:
                for row in stack:
                    row[1] = q(ev.time)

    k = len(rows)
    sched = NoteSchedule(
        t_on=np.array([r[0] for r in rows], np.float32),
        t_off=np.array([min(r[1], length) for r in rows], np.float32),
        key=np.array([r[2] for r in rows], np.int32),
        velocity=np.array([r[3] for r in rows], np.float32),
        harmonics=np.zeros((k, MAX_HARMONICS), np.float32),
        attack=np.array([r[4].attack for r in rows], np.float32),
        decay=np.array([r[4].decay for r in rows], np.float32),
        sustain=np.array([r[4].sustain for r in rows], np.float32),
        release=np.array([r[4].release for r in rows], np.float32),
    )
    for i, r in enumerate(rows):
        h = r[4].harmonics[:MAX_HARMONICS]
        sched.harmonics[i, : len(h)] = h
    if quantize_secs is not None:
        sched.t_cut = _polyphony_forced_ends(sched, quantize_secs)
    return sched


def _polyphony_forced_ends(
    sched: NoteSchedule, block_secs: float, max_voices: int = 64
) -> np.ndarray:
    """Simulates synth/synthesizer.py's voice pool over the schedule:
    ``note_on`` evicts the OLDEST live voice when the pool holds
    ``MAX_VOICES=64`` (``voices.pop(0)``), and finished voices leave the
    pool at the first block boundary STRICTLY after their envelope end
    (``done()`` is checked after each rendered block). Returns per-note
    absolute times the pool force-silences them (inf = never evicted) —
    without this, dense files (>64 overlapping voices incl. release tails)
    rendered different audio AND different labels on the device path than
    the host additive synthesizer."""
    order = np.argsort(sched.t_on, kind="stable")  # dispatch order
    forced = np.full(len(sched), np.inf, np.float32)
    live: list[tuple[float, int]] = []  # insertion-ordered (leave_time, idx)
    for i in order:
        t = float(sched.t_on[i])
        live = [(d, j) for (d, j) in live if d > t]
        if len(live) >= max_voices:
            _, j = live.pop(0)
            forced[j] = t
        env_end = float(sched.t_off[i]) + float(sched.release[i])
        leave = (math.floor(env_end / block_secs) + 1) * block_secs
        live.append((leave, int(i)))
    return forced


def _envelope(t_rel, released_rel, attack, decay, sustain, release):
    """ADSR matching synth.synthesizer.Voice.envelope (vectorized, absolute
    note-relative time)."""
    env = jnp.where(
        t_rel < attack,
        t_rel / jnp.maximum(attack, 1e-5),
        jnp.where(
            t_rel < attack + decay,
            1.0 - (1.0 - sustain) * (t_rel - attack) / jnp.maximum(decay, 1e-5),
            sustain,
        ),
    )
    tr = t_rel - released_rel
    env = jnp.where(tr > 0.0, env * jnp.maximum(1.0 - tr / jnp.maximum(release, 1e-5), 0.0), env)
    return jnp.where(t_rel >= 0.0, env, 0.0)


DEFAULT_MASTER_GAIN = 0.18


def _render_core(
    t_on, t_off, freq, vel, harmonics, attack, decay, sustain, release, t_cut,
    n_samples: int, sr: float, master_gain: float,
) -> jax.Array:
    """Shared synthesis body ((K,) note arrays -> (n_samples,) f32 mono):
    ADSR envelope x band-limited harmonic stack x velocity, summed over
    notes. The single implementation behind both render_schedule_device and
    the fused _render_agc_jit (previously duplicated; a fix in one copy
    would silently not apply to the other). ``t_cut`` (K,) absolute seconds
    force-silences evicted voices (the host pool's pop(0), see
    _polyphony_forced_ends)."""
    t = jnp.arange(n_samples, dtype=jnp.float32) / sr  # (T,)
    t_rel = t[None, :] - t_on[:, None]  # (K, T)
    env = _envelope(
        t_rel, (t_off - t_on)[:, None], attack[:, None], decay[:, None],
        sustain[:, None], release[:, None],
    )
    env = jnp.where(t[None, :] < t_cut[:, None], env, 0.0)
    nyq = sr / 2.0
    wave = jnp.zeros_like(t_rel)
    for h in range(MAX_HARMONICS):
        fh = freq[:, None] * (h + 1)
        amp_h = jnp.where(fh < nyq, harmonics[:, h : h + 1], 0.0)
        wave = wave + amp_h * jnp.sin(2.0 * jnp.pi * fh * t_rel)
    sig = jnp.sum(master_gain * (vel[:, None] / 127.0) * env * wave, axis=0)
    return sig.astype(jnp.float32)


def render_schedule_device(
    sched: NoteSchedule, n_samples: int, sr: float, master_gain: float = DEFAULT_MASTER_GAIN
) -> jax.Array:
    """Renders the full mono signal on device: (n_samples,) f32."""
    if len(sched) == 0:
        return jnp.zeros(n_samples, jnp.float32)
    return _render_core(
        jnp.asarray(sched.t_on),
        jnp.asarray(sched.t_off),
        jnp.asarray(key_to_freq_array(sched.key)),
        jnp.asarray(sched.velocity),
        jnp.asarray(sched.harmonics),
        jnp.asarray(sched.attack),
        jnp.asarray(sched.decay),
        jnp.asarray(sched.sustain),
        jnp.asarray(sched.release),
        jnp.asarray(
            sched.t_cut
            if sched.t_cut is not None
            else np.full(len(sched), np.inf, np.float32)
        ),
        n_samples, sr, master_gain,
    )


def key_to_freq_array(keys: np.ndarray) -> np.ndarray:
    return (440.0 * 2.0 ** ((keys.astype(np.float64) - 69) / 12.0)).astype(np.float32)


TRAIN_AGC = AgcParameters(desired_output_rms=0.07, distortion_factor=0.001)  # train.rs:271


def agc_signal_device(
    signal: jax.Array, chunk: int, params: AgcParameters = TRAIN_AGC
) -> jax.Array:
    """dagc over the whole signal as a scan over chunks (per-chunk silence
    freeze, matching the host callbacks)."""
    n = (signal.shape[0] // chunk) * chunk
    chunks = signal[:n].reshape(-1, 1, chunk)  # (C, B=1, chunk)

    def step(gain, c):
        g, out = agc_chunk(gain, c, params, frozen=None)
        return g, out

    _, outs = jax.lax.scan(step, jnp.ones(1, jnp.float32), chunks)
    return outs.reshape(-1)


def active_keys_at(sched: NoteSchedule, t: float, agc_gain: float) -> dict[int, float]:
    """Host-side label extraction at time t (train.rs:318-338 semantics:
    per-voice gain = velocity/127 * envelope, max per key, times AGC gain).
    Vectorized over the note table (the per-note Python loop dominated
    wall-clock on large files: O(total_notes) per capture); pool-evicted
    voices (t >= t_cut) are excluded like the host's get_active_voices."""
    t_rel = t - sched.t_on.astype(np.float64)
    rel_rel = (sched.t_off - sched.t_on).astype(np.float64)
    release = sched.release.astype(np.float64)
    alive = (t_rel >= 0) & (t_rel <= rel_rel + release)
    if sched.t_cut is not None:
        alive &= t < sched.t_cut
    if not alive.any():
        return {}
    attack = sched.attack.astype(np.float64)
    decay = sched.decay.astype(np.float64)
    sustain = sched.sustain.astype(np.float64)
    env = np.where(
        t_rel < attack,
        t_rel / np.maximum(attack, 1e-5),
        np.where(
            t_rel < attack + decay,
            1.0 - (1.0 - sustain) * (t_rel - attack) / np.maximum(decay, 1e-5),
            sustain,
        ),
    )
    tr = t_rel - rel_rel
    env = np.where(tr > 0, env * np.maximum(1.0 - tr / np.maximum(release, 1e-5), 0.0), env)
    gain = sched.velocity.astype(np.float64) / 127.0 * env * agc_gain
    out: dict[int, float] = {}
    for i in np.nonzero(alive)[0]:
        key = int(sched.key[i])
        g = float(gain[i])
        if g > out.get(key, -1.0):
            out[key] = g
    return out


import functools


@functools.partial(jax.jit, static_argnames=("n_samples", "sr", "chunk"))
def _render_agc_jit(
    t_on, t_off, freq, vel, harmonics, attack, decay, sustain, release, t_cut,
    *, n_samples: int, sr: float, chunk: int,
):
    """One compiled program: render the full signal + AGC it + per-chunk
    gains. Note arrays are padded to a static bucket (vel=0 rows silent)."""
    sig = _render_core(
        t_on, t_off, freq, vel, harmonics, attack, decay, sustain, release,
        t_cut, n_samples, sr, DEFAULT_MASTER_GAIN,
    )

    def step(gain, c):
        g, out = agc_chunk(gain, c, TRAIN_AGC, frozen=None)
        return g, (out, g)

    _, (outs, gains) = jax.lax.scan(step, jnp.ones(1, jnp.float32), sig.reshape(-1, 1, chunk))
    return outs.reshape(-1), gains[:, 0]


def annotate_midi_device(
    midi: MidiFile,
    vqt: Vqt,
    params: VqtParameters = TRAIN_VQT_PARAMETERS,
    step_size_in_chunks: int = STEP_SIZE_IN_CHUNKS,
    max_seconds: float | None = None,
) -> list[tuple[dict[int, float], np.ndarray]]:
    """Device-rendered equivalent of train/dataset.annotate_midi: same
    capture cadence (every `step_size_in_chunks`-th vqt-delay chunk, labels
    from the PREVIOUS capture's voice snapshot), synthesis + AGC + VQT all
    on the TPU in one compiled program per (length, note-bucket) shape."""
    sr = int(params.sr)
    from .dataset import _chunk_samples

    chunk = _chunk_samples(vqt, sr)  # the ONE chunk-grid rule (train.rs:243-247)

    length = midi.get_length()
    if max_seconds is not None:
        length = min(length, max_seconds)
    # ROUND UP to whole chunks: the host loop (dataset.py annotate_midi)
    # renders full chunks until written >= sample_count, so flooring here
    # would emit one fewer capture row for partial-chunk file lengths
    n_samples = -(-int(sr * length) // chunk) * chunk
    if n_samples == 0:
        return []

    sched = schedule_from_midi(midi, length, quantize_secs=64 / sr)
    if len(sched) == 0:
        return []
    # pad the note table to a power-of-two bucket for compile reuse
    k = len(sched)
    k_pad = max(16, 1 << (k - 1).bit_length())

    def pad(a, fill=0.0):
        return np.concatenate([a, np.full((k_pad - k,) + a.shape[1:], fill, a.dtype)])

    processed, gains = _render_agc_jit(
        jnp.asarray(pad(sched.t_on, 1e9)),  # padded notes never start
        jnp.asarray(pad(sched.t_off, 1e9)),
        jnp.asarray(pad(key_to_freq_array(sched.key), 1.0)),
        jnp.asarray(pad(sched.velocity)),
        jnp.asarray(pad(sched.harmonics)),
        jnp.asarray(pad(sched.attack, 1.0)),
        jnp.asarray(pad(sched.decay, 1.0)),
        jnp.asarray(pad(sched.sustain)),
        jnp.asarray(pad(sched.release, 1.0)),
        jnp.asarray(pad(sched.t_cut, np.inf)),
        n_samples=n_samples, sr=float(sr), chunk=chunk,
    )
    gains = np.asarray(gains)

    n_chunks = n_samples // chunk
    capture_chunks = [c for c in range(1, n_chunks + 1) if c % step_size_in_chunks == 0]
    if not capture_chunks:
        return []

    # windows ending at each capture chunk boundary (ring starts zeroed) —
    # the same slicing + pow2-bucketed VQT the host path uses (shared
    # helpers; this code previously duplicated both)
    from ..synth.engine_native import windows_from_stream
    from .dataset import _batched_specs

    windows = windows_from_stream(
        np.asarray(processed), len(capture_chunks),
        chunk=chunk, step_chunks=step_size_in_chunks, n_fft=params.n_fft,
    )
    specs = _batched_specs(vqt, windows)

    # labels: previous capture's snapshot (train.rs:317-347)
    out = []
    prev: dict[int, float] = {}
    for idx, c in enumerate(capture_chunks):
        t_end = c * chunk / sr
        active = active_keys_at(sched, t_end, float(gains[c - 1]))
        out.append((prev, specs[idx]))
        prev = active
    return out


def generate_dataset_device(
    midi_paths: list[str],
    params: VqtParameters = TRAIN_VQT_PARAMETERS,
    out_path: str | None = None,
    max_seconds_per_file: float | None = None,
) -> np.ndarray:
    """data.npy-layout dataset with on-device synthesis+AGC+VQT."""
    from ..synth.midi import load_midi

    vqt = Vqt(params)
    rows: list[np.ndarray] = []
    for p in midi_paths:
        try:
            midi = load_midi(p)
        except Exception as e:
            print(f"failed to parse midi file {p}: {e}")
            continue
        for active, spec in annotate_midi_device(
            midi, vqt, params, max_seconds=max_seconds_per_file
        ):
            rows.append(generate_data_row(active, spec, params.n_buckets))
    data = np.concatenate(rows) if rows else np.zeros(0, np.float32)
    if out_path:
        np.save(out_path, data)
    return data
