"""ctypes bindings for the native host runtime (native/pitchvis_native.cpp).

Builds on demand (`make -C native`) and degrades gracefully: `available()`
is False when no compiler/library is present and pure-Python fallbacks are
used by the callers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpitchvis_native.so")

_lib = None
_tried = False


def _make() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True, timeout=120
        )
        return True
    except Exception:
        return False


def _stale() -> bool:
    """True when the built library predates any native source (a pulled
    commit that adds an entry point would otherwise dlsym-fail below and
    crash instead of degrading to available()=False)."""
    try:
        built = os.path.getmtime(_LIB_PATH)
        for name in os.listdir(_NATIVE_DIR):
            if name.endswith((".cpp", ".c", ".h")) and not name.startswith("alsa"):
                if os.path.getmtime(os.path.join(_NATIVE_DIR, name)) > built:
                    return True
    except OSError:
        pass
    return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if (not os.path.exists(_LIB_PATH) or _stale()) and not _make():
        if not os.path.exists(_LIB_PATH):
            return None  # never built and no toolchain
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        _bind(lib)
    except (OSError, AttributeError):
        # a stale prebuilt library missing a newer entry point: one rebuild
        # attempt, then graceful degradation (callers use Python fallbacks)
        if not _make():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            _bind(lib)
        except (OSError, AttributeError):
            return None
    _lib = lib
    return _lib


def _bind(lib) -> None:
    lib.pv_rb_create.restype = ctypes.c_void_p
    lib.pv_rb_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
    lib.pv_rb_destroy.argtypes = [ctypes.c_void_p]
    lib.pv_rb_write.restype = ctypes.c_int32
    lib.pv_rb_write.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.pv_rb_write_agc.restype = ctypes.c_int32
    lib.pv_rb_write_agc.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_float, ctypes.c_float,
    ]
    lib.pv_rb_write_batch.restype = ctypes.c_int64
    lib.pv_rb_write_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32, ctypes.c_float, ctypes.c_float,
    ]
    lib.pv_rb_snapshot.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.pv_rb_consume.restype = ctypes.c_int64
    lib.pv_rb_consume.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
    ]
    lib.pv_rb_mark_consumed.argtypes = [ctypes.c_void_p]
    lib.pv_rb_snapshot_consume.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.pv_rb_gain.restype = ctypes.c_double
    lib.pv_rb_gain.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.pv_rb_reset.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.pv_rb_written.restype = ctypes.c_uint64
    lib.pv_rb_written.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.pv_rb_export.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_float),
    ]
    lib.pv_rb_import.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_float),
    ]
    lib.pv_rs_create.restype = ctypes.c_void_p
    lib.pv_rs_create.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.pv_rs_destroy.argtypes = [ctypes.c_void_p]
    lib.pv_rs_reset.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.pv_rs_process.restype = ctypes.c_int64
    lib.pv_rs_process.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.pv_agc_process.restype = ctypes.c_float
    lib.pv_agc_process.argtypes = [
        ctypes.c_float, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_int32,
    ]
    lib.pv_synth_render.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_double, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
    ]
    # --- full SoundFont engine (native/synth_engine.cpp) ---
    lib.pv_engine_create.restype = ctypes.c_void_p
    lib.pv_engine_create.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.pv_engine_destroy.argtypes = [ctypes.c_void_p]
    lib.pv_engine_reset.argtypes = [ctypes.c_void_p]
    lib.pv_engine_midi.argtypes = [ctypes.c_void_p] + [ctypes.c_int32] * 4
    lib.pv_engine_note_on.argtypes = [ctypes.c_void_p] + [ctypes.c_int32] * 3
    lib.pv_engine_note_off.argtypes = [ctypes.c_void_p] + [ctypes.c_int32] * 2
    lib.pv_engine_render.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.pv_engine_active_voices.restype = ctypes.c_int32
    lib.pv_engine_active_voices.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
    ]
    lib.pv_seq_create.restype = ctypes.c_void_p
    lib.pv_seq_create.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.pv_seq_destroy.argtypes = [ctypes.c_void_p]
    lib.pv_seq_render.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.pv_train_synthesize.restype = ctypes.c_int64
    lib.pv_train_synthesize.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int32,
    ]


def available() -> bool:
    return _load() is not None


def get_lib():
    """The loaded CDLL (or None): for callers binding additional wrappers."""
    return _load()


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class NativeRingBank:
    """Lock-free per-stream ring buffers with batched snapshot (the host
    staging stage feeding device_put). The TPU-scale counterpart of the
    reference's Arc<Mutex<RingBuffer>> (pitchvis_audio/src/lib.rs:17-28)."""

    def __init__(self, n_streams: int, capacity: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable; build native/ first")
        self._lib = lib
        self._handle = ctypes.c_void_p(lib.pv_rb_create(n_streams, capacity))
        self.n_streams = n_streams
        self.capacity = capacity

    def write(self, stream: int, samples: np.ndarray, *, agc: bool = True,
              desired_rms: float = 0.07, distortion: float = 1e-4) -> bool:
        """Appends a chunk; returns False when rejected (NaN guard)."""
        samples = np.ascontiguousarray(samples, np.float32)
        if agc:
            ret = self._lib.pv_rb_write_agc(
                self._handle, stream, _fptr(samples), len(samples),
                desired_rms, distortion,
            )
        else:
            ret = self._lib.pv_rb_write(self._handle, stream, _fptr(samples), len(samples))
        return ret == 0

    def write_batch(self, ids: np.ndarray | None, samples: np.ndarray, *,
                    agc: bool = True, desired_rms: float = 0.07,
                    distortion: float = 1e-4) -> np.ndarray:
        """Appends one equal-length chunk to many streams in ONE native
        call: row k of ``samples`` (rows, n) goes to stream ``ids[k]``
        (``None`` = rows 0..rows-1). The capacity-scale ingest primitive —
        per-stream ``write`` costs one Python/ctypes dispatch per stream
        per tick, which caps host ingest thousands of streams short of
        what the memcpys allow. Per-row NaN guard: returns an ok[rows]
        bool array (rejected rows leave their ring untouched)."""
        samples = np.ascontiguousarray(samples, np.float32)
        if samples.ndim != 2:
            raise ValueError(f"samples must be (rows, n), got {samples.shape}")
        rows = samples.shape[0]
        if ids is None:
            ids = np.arange(rows, dtype=np.int64)
        else:
            ids = np.ascontiguousarray(ids, np.int64)
            if ids.shape != (rows,):
                raise ValueError(f"ids shape {ids.shape} != ({rows},)")
        if rows and (ids.min() < 0 or ids.max() >= self.n_streams):
            raise ValueError("stream id out of range")
        ok = np.empty(rows, np.uint8)
        self._lib.pv_rb_write_batch(
            self._handle, ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            rows, _fptr(samples), samples.shape[1],
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            1 if agc else 0, desired_rms, distortion,
        )
        return ok.astype(bool)

    def snapshot(self, window: int) -> tuple[np.ndarray, np.ndarray]:
        """Trailing `window` samples of all streams -> ((B, window), gains)."""
        out = np.empty((self.n_streams, window), np.float32)
        gains = np.empty(self.n_streams, np.float32)
        self._lib.pv_rb_snapshot(self._handle, _fptr(out), _fptr(gains), window)
        return out, gains

    def consume(
        self, n: int, max_lag: int = -1, out: np.ndarray | None = None
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Delta-ingest read: the next `n` unconsumed samples per stream ->
        ((B, n) chunks, gains[B], advanced[B] bool). All-or-nothing per
        stream: a row with fewer than n unread samples stays put (zeros,
        advanced=False) so its device window freezes like a stalled
        snapshot. Backlogs beyond `max_lag` samples (-1 = ring capacity)
        are skipped realtime-style.

        ``out`` (a C-contiguous float32 (B, n) view) receives the chunks in
        place — step_multi stages k hops into one (k, B, n) buffer without
        a second copy per hop."""
        if out is None:
            out = np.empty((self.n_streams, n), np.float32)
        else:
            assert out.dtype == np.float32 and out.shape == (self.n_streams, n)
            assert out.flags["C_CONTIGUOUS"]
        gains = np.empty(self.n_streams, np.float32)
        adv = np.empty(self.n_streams, np.uint8)
        self._lib.pv_rb_consume(
            self._handle, _fptr(out), _fptr(gains),
            adv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, max_lag,
        )
        return out, gains, adv.astype(bool)

    def mark_consumed(self) -> None:
        """Aligns every read cursor with its write head — call right after
        materializing a full-window snapshot so consume() continues from it."""
        self._lib.pv_rb_mark_consumed(self._handle)

    def snapshot_consume(self, window: int) -> tuple[np.ndarray, np.ndarray]:
        """snapshot + mark_consumed fused per stream against ONE head read:
        samples pushed during the copy stay unconsumed (a separate
        mark_consumed afterwards would splice them out of the audio). The
        delta path's window (re)materialization primitive."""
        out = np.empty((self.n_streams, window), np.float32)
        gains = np.empty(self.n_streams, np.float32)
        self._lib.pv_rb_snapshot_consume(self._handle, _fptr(out), _fptr(gains), window)
        return out, gains

    def gain(self, stream: int) -> float:
        return float(self._lib.pv_rb_gain(self._handle, stream))

    def reset(self, stream: int) -> None:
        """Recycles one slot for a new stream: clears audio, write position,
        and AGC gain. The slot's previous producer must have stopped
        (per-stream single-producer contract); a concurrent snapshot is
        safe."""
        self._lib.pv_rb_reset(self._handle, stream)

    def written(self, stream: int) -> int:
        return int(self._lib.pv_rb_written(self._handle, stream))

    def export_state(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Checkpoint image: (audio[B, capacity] trailing windows, heads[B]
        total-written counters, gains[B] AGC gains). Snapshot-consistent
        against concurrent producers."""
        audio = np.empty((self.n_streams, self.capacity), np.float32)
        heads = np.empty(self.n_streams, np.uint64)
        gains = np.empty(self.n_streams, np.float32)
        self._lib.pv_rb_export(
            self._handle, _fptr(audio),
            heads.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), _fptr(gains),
        )
        return audio, heads, gains

    def import_state(self, audio: np.ndarray, heads: np.ndarray,
                     gains: np.ndarray) -> None:
        """Restores an export_state image. Restart path only: the bank must
        be quiesced (no concurrent producers) — unlike snapshot/reset this
        write is not race-safe."""
        audio = np.ascontiguousarray(audio, np.float32)
        heads = np.ascontiguousarray(heads, np.uint64)
        gains = np.ascontiguousarray(gains, np.float32)
        if audio.shape != (self.n_streams, self.capacity):
            raise ValueError(
                f"audio image shape {audio.shape} != ({self.n_streams}, {self.capacity})"
            )
        if heads.shape != (self.n_streams,) or gains.shape != (self.n_streams,):
            # pv_rb_import reads n_streams entries from each; shorter
            # buffers would be read out of bounds
            raise ValueError(
                f"heads/gains shapes {heads.shape}/{gains.shape} != ({self.n_streams},)"
            )
        self._lib.pv_rb_import(
            self._handle, _fptr(audio),
            heads.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), _fptr(gains),
        )

    def close(self) -> None:
        if self._handle:
            self._lib.pv_rb_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeResamplerBank:
    """Per-stream streaming polyphase resampling at ingest (the native
    mirror of ops/resample.py; the reference's rubato FftFixedIn stage,
    pitchvis_audio/src/audio_wasm.rs:176-209). One bank per input rate;
    the prototype filter comes from ops/resample.py so host and device
    paths share identical coefficients."""

    def __init__(self, n_streams: int, sr_in: int, sr_out: int,
                 taps_per_phase: int = 24):
        from ..ops.resample import _design_prototype, make_spec

        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.spec = make_spec(sr_in, sr_out, taps_per_phase)
        h = np.ascontiguousarray(
            _design_prototype(self.spec.l, self.spec.m, taps_per_phase), np.float64
        )
        self._handle = ctypes.c_void_p(
            lib.pv_rs_create(
                n_streams, self.spec.l, self.spec.m, taps_per_phase,
                h.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            )
        )
        self.n_streams = n_streams

    def process(self, stream: int, samples: np.ndarray) -> np.ndarray:
        """Feeds one chunk; returns the resampled samples now available
        (input not filling a whole M-block is carried to the next call)."""
        samples = np.ascontiguousarray(samples, np.float32)
        out_cap = (len(samples) + self.spec.m) // self.spec.m * self.spec.l
        out = np.empty(out_cap, np.float32)
        n = self._lib.pv_rs_process(
            self._handle, stream, _fptr(samples), len(samples), _fptr(out), out_cap
        )
        if n < 0:
            raise RuntimeError("resampler output buffer undersized (bug)")
        return out[:n]

    def reset(self, stream: int) -> None:
        self._lib.pv_rs_reset(self._handle, stream)

    def close(self) -> None:
        if self._handle:
            self._lib.pv_rs_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def agc_process(gain: float, samples: np.ndarray, desired_rms: float,
                distortion: float, frozen: bool) -> float:
    """In-place native dagc recurrence; returns the updated gain."""
    lib = _load()
    assert lib is not None
    assert samples.dtype == np.float32 and samples.flags.c_contiguous
    return float(
        lib.pv_agc_process(gain, _fptr(samples), len(samples), desired_rms,
                           distortion, int(frozen))
    )


def synth_render(mix: np.ndarray, sample_rate: float, freq, phase, age,
                 released_at, amp, attack, decay, sustain, release,
                 harmonics) -> np.ndarray:
    """Native additive-voice render; mutates mix/phase/age, returns per-voice
    end-of-chunk gains."""
    lib = _load()
    assert lib is not None
    n_voices = len(freq)
    n_harm = harmonics.shape[1] if n_voices else 0
    gains = np.zeros(n_voices, np.float64)
    if n_voices == 0:
        return gains
    lib.pv_synth_render(
        _fptr(mix), len(mix), sample_rate, n_voices,
        _dptr(freq), _dptr(phase), _dptr(age), _dptr(released_at), _dptr(amp),
        _dptr(attack), _dptr(decay), _dptr(sustain), _dptr(release),
        _dptr(np.ascontiguousarray(harmonics)), n_harm, _dptr(gains),
    )
    return gains
