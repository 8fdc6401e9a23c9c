"""Differential fuzz of the native ring bank (native/pitchvis_native.cpp)
against a pure-Python model of its documented semantics.

The targeted tests in test_runtime.py pin each behavior in isolation; this
fuzz drives randomized single-threaded operation sequences (write,
write_batch, NaN rejection, consume with skip-ahead, snapshot,
snapshot_consume, mark_consumed, reset, export/import restart) through both
implementations and asserts bit-identical outputs — the wrap/cursor/lag
arithmetic is where an off-by-one would silently corrupt served audio.

Model semantics (mirroring the C++):
  * history = all accepted samples in write order; head = len(history).
    Oversized chunks (n > capacity) still advance head by n, but only the
    trailing `capacity` samples are ever readable — every read position is
    clamped to head - capacity, so a full history list models it exactly.
  * snapshot(window): trailing min(head, window) samples, zero-padded head.
  * consume(n, max_lag): pos = consumed (0 after a reset rewound head);
    backlog beyond max_lag (default capacity) skips ahead; all-or-nothing
    rows; cursor := pos (+n if advanced).
  * snapshot_consume(window): snapshot + cursor := head, fused.
  * reset: head/cursor/audio/gain cleared.
  * export/import: trailing-capacity image + heads + gains, restart-exact.

Concurrency is covered separately (TestNativeRingBank concurrent writers,
the soak legs); this file is deterministic single-thread semantics only.
"""

import numpy as np
import pytest

from pitchvis_tpu.runtime import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native runtime not built"
)

DESIRED_RMS = 0.07
DISTORTION = 1e-4


class ModelBank:
    """Pure-Python reference model of pv_rb_* (see module docstring)."""

    def __init__(self, n_streams: int, capacity: int):
        self.cap = capacity
        self.hist = [np.zeros(0, np.float32) for _ in range(n_streams)]
        self.consumed = [0] * n_streams
        self.gain = [np.float32(1.0)] * n_streams

    def write(self, stream: int, samples: np.ndarray, agc: bool) -> bool:
        samples = np.asarray(samples, np.float32)
        if not np.isfinite(samples).all():
            return False
        if agc:
            # f32 recurrence in C++ operation order (pv_rb_write_agc):
            # x = s*gain; y = x*x*(1/rms); g = max(1 + k*(1-y), k); gain *= g
            frozen = float(np.sum(samples.astype(np.float64) ** 2)) < 1e-6
            inv = np.float32(1.0) / np.float32(DESIRED_RMS)
            k = np.float32(DISTORTION)
            one = np.float32(1.0)
            gain = self.gain[stream]
            out = np.empty_like(samples)
            for i, s in enumerate(samples):
                x = s * gain
                out[i] = x
                if not frozen:
                    y = x * x * inv
                    g = one + k * (one - y)
                    if g < k:
                        g = k
                    gain = gain * g
            self.gain[stream] = gain
            samples = out
        self.hist[stream] = np.concatenate([self.hist[stream], samples])
        return True

    def _head(self, s: int) -> int:
        return len(self.hist[s])

    def snapshot(self, window: int):
        rows = []
        for s in range(len(self.hist)):
            avail = min(self._head(s), window)
            row = np.zeros(window, np.float32)
            if avail:
                row[window - avail:] = self.hist[s][self._head(s) - avail:]
            rows.append(row)
        return np.stack(rows), np.asarray(self.gain, np.float32)

    def consume(self, n: int, max_lag: int = -1):
        cap = self.cap
        lag = cap if (max_lag < 0 or max_lag > cap) else max_lag
        out, adv = [], []
        for s in range(len(self.hist)):
            head = self._head(s)
            pos = self.consumed[s]
            if head < pos:
                pos = 0
            avail = head - pos
            if avail > lag:
                pos = head - lag
                avail = lag
            row = np.zeros(n, np.float32)
            if avail >= n:
                row[:] = self.hist[s][pos : pos + n]
                pos += n
                adv.append(True)
            else:
                adv.append(False)
            self.consumed[s] = pos
            out.append(row)
        return np.stack(out), np.asarray(self.gain, np.float32), np.asarray(adv)

    def mark_consumed(self):
        for s in range(len(self.hist)):
            self.consumed[s] = self._head(s)

    def snapshot_consume(self, window: int):
        res = self.snapshot(window)
        self.mark_consumed()
        return res

    def reset(self, stream: int):
        self.hist[stream] = np.zeros(0, np.float32)
        self.consumed[stream] = 0
        self.gain[stream] = np.float32(1.0)

    def written(self, stream: int) -> int:
        # native heads count skipped samples of oversized chunks too; the
        # model's history includes them, so len() matches
        return self._head(stream)

    def export_state(self):
        audio, gains = self.snapshot(self.cap)
        heads = np.asarray([self._head(s) for s in range(len(self.hist))], np.uint64)
        return audio, heads, gains

    def import_state(self, audio, heads, gains):
        for s in range(len(self.hist)):
            h = int(heads[s])
            avail = min(h, self.cap)
            # unreadable prefix (beyond the retained window) is arbitrary in
            # the native ring too; model it as zeros and never read it
            self.hist[s] = np.concatenate(
                [np.zeros(h - avail, np.float32),
                 np.asarray(audio[s, self.cap - avail:], np.float32)]
            )
            # pv_rb_import does NOT restore read cursors — the serving flow
            # re-materializes the window (snapshot_consume) on the first
            # post-restore hop, which is what aligns them. Model the
            # primitive, not the flow: cursor = 0 like a fresh native bank.
            self.consumed[s] = 0
            self.gain[s] = np.float32(gains[s])


def _chunk(rng, stream: int, seq: int, n: int) -> np.ndarray:
    """Distinct, position-identifying sample values (misreads can't alias)."""
    return ((stream + 1) * 10_000 + seq * 128 + np.arange(n)).astype(np.float32) * 1e-5


def _run_fuzz(seed: int, *, agc: bool, steps: int = 300, n_streams: int = 5,
              capacity: int = 64):
    rng = np.random.default_rng(seed)
    bank = native.NativeRingBank(n_streams, capacity)
    model = ModelBank(n_streams, capacity)
    seq = 0
    try:
        for step in range(steps):
            op = rng.choice(
                ["write", "write_batch", "write_nan", "consume", "snapshot",
                 "snapshot_consume", "mark", "reset", "written", "reincarnate"],
                p=[0.3, 0.14, 0.04, 0.2, 0.08, 0.06, 0.04, 0.06, 0.04, 0.04],
            )
            if op == "write":
                s = int(rng.integers(n_streams))
                # 0-length, sub-cap, and > capacity chunks all exercised
                n = int(rng.choice([0, 1, 7, 16, 33, capacity, capacity + 33]))
                c = _chunk(rng, s, seq, n) if not agc else (
                    rng.standard_normal(n).astype(np.float32) * 0.1)
                seq += 1
                ok_n = bank.write(s, c, agc=agc)
                ok_m = model.write(s, c, agc=agc)
                assert ok_n == ok_m
            elif op == "write_batch":
                rows = int(rng.integers(1, n_streams + 2))  # duplicates allowed
                ids = rng.integers(0, n_streams, rows).astype(np.int64)
                n = int(rng.choice([1, 8, 24]))
                block = np.stack([
                    _chunk(rng, int(ids[k]), seq + k, n) if not agc
                    else rng.standard_normal(n).astype(np.float32) * 0.1
                    for k in range(rows)
                ])
                seq += rows
                ok_n = bank.write_batch(ids, block, agc=agc)
                ok_m = np.asarray([
                    model.write(int(ids[k]), block[k], agc=agc) for k in range(rows)
                ])
                np.testing.assert_array_equal(ok_n, ok_m)
            elif op == "write_nan":
                s = int(rng.integers(n_streams))
                c = _chunk(rng, s, seq, 9)
                c[int(rng.integers(9))] = np.nan
                seq += 1
                assert bank.write(s, c, agc=agc) is False
                assert model.write(s, c, agc=agc) is False
            elif op == "consume":
                n = int(rng.integers(1, 33))
                lag = int(rng.choice([-1, 8, 24, capacity]))
                out_n, g_n, adv_n = bank.consume(n, max_lag=lag)
                out_m, g_m, adv_m = model.consume(n, max_lag=lag)
                np.testing.assert_array_equal(adv_n, adv_m, err_msg=f"step {step}")
                np.testing.assert_array_equal(out_n, out_m, err_msg=f"step {step}")
                np.testing.assert_array_equal(g_n, g_m)
            elif op == "snapshot":
                w = int(rng.integers(1, capacity + 1))
                out_n, g_n = bank.snapshot(w)
                out_m, g_m = model.snapshot(w)
                np.testing.assert_array_equal(out_n, out_m, err_msg=f"step {step}")
                np.testing.assert_array_equal(g_n, g_m)
            elif op == "snapshot_consume":
                w = int(rng.integers(1, capacity + 1))
                out_n, g_n = bank.snapshot_consume(w)
                out_m, g_m = model.snapshot_consume(w)
                np.testing.assert_array_equal(out_n, out_m, err_msg=f"step {step}")
                np.testing.assert_array_equal(g_n, g_m)
            elif op == "mark":
                bank.mark_consumed()
                model.mark_consumed()
            elif op == "reset":
                s = int(rng.integers(n_streams))
                bank.reset(s)
                model.reset(s)
            elif op == "written":
                s = int(rng.integers(n_streams))
                assert bank.written(s) == model.written(s)
            elif op == "reincarnate":
                # checkpoint/restart drill mid-fuzz: export, restore into a
                # FRESH native bank, and continue fuzzing on the restored pair
                audio, heads, gains = bank.export_state()
                m_audio, m_heads, m_gains = model.export_state()
                np.testing.assert_array_equal(audio, m_audio, err_msg=f"step {step}")
                np.testing.assert_array_equal(heads, m_heads)
                np.testing.assert_array_equal(gains, m_gains)
                bank.close()
                bank = native.NativeRingBank(n_streams, capacity)
                bank.import_state(audio, heads, gains)
                model.import_state(m_audio, m_heads, m_gains)
    finally:
        bank.close()


class TestRingFuzz:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
    def test_raw_semantics(self, seed):
        _run_fuzz(seed, agc=False, steps=500)

    @pytest.mark.parametrize("seed", [10, 11, 12])
    def test_agc_semantics(self, seed):
        """Same fuzz with the per-sample f32 AGC recurrence live (gains and
        gained audio must stay bit-identical to the Python f32 loop)."""
        _run_fuzz(seed, agc=True, steps=200)

    def test_tiny_capacity(self):
        """Capacity 8: every chunk wraps, skip-ahead constantly active."""
        for seed in (20, 21):
            _run_fuzz(seed, agc=False, steps=400, n_streams=3, capacity=8)
