"""Color mapping + LED serial stage tests (vs pitchvis_colors/src/lib.rs and
pitchvis_serial/src/main.rs:122-175)."""

import jax.numpy as jnp
import numpy as np

from pitchvis_tpu.core.config import VqtRange
from pitchvis_tpu.io.led import frame_bytes, led_frame, led_frame_values, splat_peaks
from pitchvis_tpu.ops.colors import (
    COLORS,
    PITCH_NAMES,
    calculate_color,
    lab_to_lch,
    lab_to_srgb_u8,
    lch_to_lab,
    srgb_u8_to_lab,
)


class TestLab:
    def test_known_values(self):
        """Standard CIE Lab values for sRGB primaries (D65, 2 deg)."""
        lab = np.asarray(srgb_u8_to_lab(jnp.asarray([[255, 255, 255], [255, 0, 0], [0, 0, 255]], jnp.float32)))
        np.testing.assert_allclose(lab[0], [100.0, 0.0, 0.0], atol=0.02)
        np.testing.assert_allclose(lab[1], [53.24, 80.09, 67.20], atol=0.05)
        np.testing.assert_allclose(lab[2], [32.30, 79.19, -107.86], atol=0.05)

    def test_roundtrip_u8(self):
        rng = np.random.default_rng(0)
        rgb = rng.integers(0, 256, (64, 3)).astype(np.float32)
        back = np.asarray(lab_to_srgb_u8(srgb_u8_to_lab(jnp.asarray(rgb))))
        np.testing.assert_allclose(back, rgb, atol=1.0)  # u8 round-trip

    def test_lch_roundtrip(self):
        lab = jnp.asarray([[53.2, 80.1, 67.2], [60.0, -20.0, 40.0]])
        back = np.asarray(lch_to_lab(lab_to_lch(lab)))
        np.testing.assert_allclose(back, np.asarray(lab), atol=1e-4)


class TestCalculateColor:
    def test_exact_pitch_returns_base_color(self):
        """lib.rs:74-76: a bucket exactly on a pitch class returns the base
        color (modulo the u8 round trip)."""
        bpo = 12
        for cls in range(12):
            rgb = np.asarray(calculate_color(bpo, jnp.asarray(float(cls))))
            base = np.floor(COLORS[cls] * 255.0) / 255.0
            np.testing.assert_allclose(rgb, base, atol=2.5 / 255.0)

    def test_between_pitches_desaturates(self):
        bpo = 24
        on = np.asarray(calculate_color(bpo, jnp.asarray(2.0)))  # C#
        off = np.asarray(calculate_color(bpo, jnp.asarray(3.0)))  # C#+50ct
        # halfway between pitch classes: fully desaturated toward gray
        assert np.abs(off - off.mean()).max() < 0.05
        assert np.abs(on - on.mean()).max() > 0.1

    def test_wraps_above_octave(self):
        bpo = 12
        a = np.asarray(calculate_color(bpo, jnp.asarray(11.6)))
        # 11.6 rounds to 12 -> class 0 (C), desaturated
        b = np.asarray(calculate_color(bpo, jnp.asarray(0.4)))
        np.testing.assert_allclose(a, b, atol=1.5 / 255.0)

    def test_pitch_names(self):
        assert len(PITCH_NAMES) == 12
        assert PITCH_NAMES[9] == "A"

    def test_rust_round_semantics(self):
        """Every reference-.round() site uses half-away-from-zero
        (rust_round); jnp.round's half-to-even flips exact .5 cases —
        which plateau peak centers produce exactly (round-4 review)."""
        from pitchvis_tpu.utils.rounding import rust_round

        x = jnp.asarray([0.5, 1.5, 2.5, 3.5, 0.49, 1.51])
        np.testing.assert_array_equal(
            np.asarray(rust_round(x)), [1.0, 2.0, 3.0, 4.0, 0.0, 2.0]
        )
        # jnp.round would give [0, 2, 2, 4, ...] — the divergence this guards


RANGE = VqtRange(min_freq=55.0, octaves=5, buckets_per_octave=36)


class TestLed:
    def _peaks(self, n, entries):
        mask = np.zeros(n, bool)
        center = np.zeros(n, np.float32)
        size = np.zeros(n, np.float32)
        for bin_idx, c, s in entries:
            mask[bin_idx] = True
            center[bin_idx] = c
            size[bin_idx] = s
        return jnp.asarray(mask), jnp.asarray(center), jnp.asarray(size)

    def test_splat_fract_pow(self):
        n = RANGE.n_buckets
        mask, center, size = self._peaks(n, [(10, 10.4, 20.0)])
        x = np.asarray(splat_peaks(mask, center, size, n))
        f = 0.4**1.9
        assert abs(x[10] - 20.0 * (1 - f)) < 1e-4
        assert abs(x[11] - 20.0 * f) < 1e-4
        assert x[9] == 0.0

    def test_frame_structure(self):
        n = RANGE.n_buckets
        mask, center, size = self._peaks(n, [(10, 10.0, 20.0), (50, 50.3, 10.0)])
        frame = led_frame(RANGE, mask, center, size)
        assert len(frame) == 3 + 3 * n
        assert frame[0] == 0xFF
        assert frame[1] == n // 256 and frame[2] == n % 256
        body = np.frombuffer(frame[3:], np.uint8)
        assert body.max() <= 0xFE  # 0xFF reserved for framing
        assert body.max() > 0

    def test_silence_frame_all_zero(self):
        """max_size == 0: Rust's NaN-to-u8 saturates to 0 (main.rs:162)."""
        n = RANGE.n_buckets
        mask, center, size = self._peaks(n, [])
        vals = np.asarray(led_frame_values(RANGE, mask, center, size))
        assert vals.dtype == np.uint8
        assert np.all(vals == 0)

    def test_brightest_peak_dominates(self):
        n = RANGE.n_buckets
        mask, center, size = self._peaks(n, [(10, 10.0, 30.0), (50, 50.0, 15.0)])
        vals = np.asarray(led_frame_values(RANGE, mask, center, size))
        assert vals[10].max() > vals[50].max()

    def test_serial_writer_to_file(self, tmp_path):
        from pitchvis_tpu.io.led import SerialWriter

        n = RANGE.n_buckets
        mask, center, size = self._peaks(n, [(20, 20.0, 25.0)])
        frame = led_frame(RANGE, mask, center, size)
        path = tmp_path / "led.bin"
        w = SerialWriter(str(path))
        w.write_frame(frame)
        w.close()
        assert path.read_bytes() == frame
