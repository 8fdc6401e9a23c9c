"""LED serial output stage.

Vectorized port of `pitchvis_serial`'s `update_serial`
(pitchvis_serial/src/main.rs:122-175): splat continuous peaks onto bins with
a fract^1.9 split between adjacent bins, color-map each bin with the serial
palette (GRAY_LEVEL=5.0, EASING_POW=2.3, pitch rotation so bin 0 = A), scale
by size/max, and frame the bytes as ``0xFF <n_hi> <n_lo> <r g b>*`` with
values quantized by *254 truncation (<= 0xFE, so 0xFF stays a frame marker).

The whole stage is jittable: `led_frame_values` produces the (n, 3) u8 color
block on device; `frame_bytes` adds the 3-byte header on the host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import VqtRange
from ..ops.colors import SERIAL_COLORS, calculate_color

SERIAL_GRAY_LEVEL = 5.0  # pitchvis_serial/src/main.rs:58
SERIAL_EASING_POW = 2.3  # main.rs:59
SPLAT_POW = 1.9  # main.rs:133


def splat_peaks(
    peak_mask: jnp.ndarray, center: jnp.ndarray, size: jnp.ndarray, n_buckets: int
) -> jnp.ndarray:
    """Splat continuous peaks onto the bin grid (main.rs:130-140): bin
    floor(c) gets size*(1 - fract^1.9), bin floor(c)+1 gets size*fract^1.9.
    Matching the reference, overlapping peaks overwrite rather than add
    (iteration in ascending center order => the higher peak index wins).

    Gather/scatter-free: continuous centers are within one bin of their peak
    bin (enhance_peaks_continuous clamps the parabola offset), so the write
    targets are bounded offsets — a bin t can only receive from peaks at
    bins t-2..t+1. Each candidate source is a static roll; applying them in
    ascending source order reproduces the overwrite precedence. The previous
    `.at[].set` formulation lowered to serialized per-peak dynamic-slices on
    TPU (the dominant cost of the whole LED stage)."""
    n = n_buckets
    idx = jnp.arange(n)
    lower = jnp.clip(jnp.floor(center).astype(jnp.int32), 0, n - 1)
    rel = lower - idx  # in {-1, 0, 1} at peak bins
    frac_pow = (center - jnp.floor(center)) ** SPLAT_POW
    v_lo = size * (1.0 - frac_pow)
    v_hi = size * frac_pow
    hi_valid = peak_mask & (lower < n - 1)

    x = jnp.zeros(n, jnp.float32)
    # source peak at bin i = t + i_rel; ascending i_rel = ascending overwrite
    # precedence (the last write wins, like the reference's loop)
    for i_rel in (-2, -1, 0, 1):
        shift = -i_rel  # roll so position t reads source arrays at t + i_rel
        valid = (idx + i_rel >= 0) & (idx + i_rel < n)
        mask_s = jnp.roll(peak_mask, shift) & valid
        rel_s = jnp.roll(rel, shift)
        # lo write lands at t when lower(i) = i + rel = t, i.e. rel == -i_rel
        write_lo = mask_s & (rel_s == -i_rel)
        x = jnp.where(write_lo, jnp.roll(v_lo, shift), x)
        # hi write lands at t when lower(i) + 1 = t, i.e. rel == -i_rel - 1
        write_hi = jnp.roll(hi_valid, shift) & valid & (rel_s == -i_rel - 1)
        x = jnp.where(write_hi, jnp.roll(v_hi, shift), x)
    return x


@partial(jax.jit, static_argnames=("range_",))
def led_frame_values(
    range_: VqtRange,
    peak_mask: jnp.ndarray,
    center: jnp.ndarray,
    size: jnp.ndarray,
) -> jnp.ndarray:
    """(n_buckets, 3) uint8 RGB triples for one LED frame (main.rs:146-168)."""
    n = range_.n_buckets
    bpo = range_.buckets_per_octave
    x = splat_peaks(peak_mask, center, size, n)

    max_size = jnp.max(x)
    # color_coefficient = size / max; silence (max==0) -> all zeros
    # (Rust 0/0 = NaN, cast to u8 saturates to 0; main.rs:162)
    coeff = jnp.where(max_size > 0.0, x / jnp.maximum(max_size, 1e-30), 0.0)

    # pitch rotation: bin 0 (min_freq = A) -> pitch class A (main.rs:153-155)
    idx = jnp.arange(n)
    bucket = ((idx + (bpo - 3 * (bpo // 12))) % bpo).astype(jnp.float32)
    rgb = calculate_color(bpo, bucket, SERIAL_COLORS, SERIAL_GRAY_LEVEL, SERIAL_EASING_POW)

    scaled = rgb * coeff[:, None]
    return jnp.floor(scaled * 254.0).astype(jnp.uint8)


def frame_bytes(values_u8: np.ndarray) -> bytes:
    """0xFF-framed byte stream (main.rs:146-150): header 0xFF + u16 count,
    then the RGB triples."""
    n = values_u8.shape[0]
    header = bytes([0xFF, (n // 256) & 0xFF, n % 256])
    return header + np.asarray(values_u8, np.uint8).tobytes()


def led_frame(range_: VqtRange, peak_mask, center, size) -> bytes:
    """Full LED frame for one stream."""
    return frame_bytes(np.asarray(led_frame_values(range_, peak_mask, center, size)))


class SerialWriter:
    """Host-side serial port writer (optional; requires pyserial or a file
    path / fd). The framework side produces the exact byte frames; this shim
    just writes them at the configured FPS like pitchvis_serial's main loop
    (main.rs:177-231)."""

    def __init__(self, port_or_file, baud_rate: int = 115_200):
        self._own = False
        if hasattr(port_or_file, "write"):
            self._port = port_or_file
            return
        try:
            import serial  # type: ignore
        except ImportError:
            self._port = open(port_or_file, "wb")
            self._own = True
            return
        import os
        import stat

        try:
            mode = os.stat(port_or_file).st_mode
        except OSError:
            mode = None
        if mode is not None and not stat.S_ISCHR(mode):
            # existing non-device target (regular file, FIFO): file output as
            # the docstring promises — don't even try pyserial on it
            self._port = open(port_or_file, "wb")
        else:
            try:
                self._port = serial.Serial(port_or_file, baud_rate, timeout=10)
            except serial.SerialException:
                if mode is not None:
                    # a real character device that failed to open (busy,
                    # permissions, bad baud) is a genuine serial error —
                    # silently writing frames to a plain file would mask it
                    raise
                import warnings

                warnings.warn(
                    f"serial port {port_or_file!r} does not exist; "
                    "writing LED frames to a new plain file instead"
                )
                self._port = open(port_or_file, "wb")
        self._own = True

    def write_frame(self, frame: bytes) -> None:
        self._port.write(frame)
        self._port.flush()

    def close(self) -> None:
        if self._own:
            self._port.close()
