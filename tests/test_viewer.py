"""Display-derived output tests (vs pitchvis_viewer/src/display_system)."""

import math

import jax.numpy as jnp
import numpy as np

from pitchvis_tpu.core.config import VqtRange
from pitchvis_tpu.models.viewer import (
    SPIRAL_SEGMENTS_PER_SEMITONE,
    BallState,
    bass_cylinder_count,
    CalmnessGraphState,
    SpectrogramState,
    bass_spiral,
    bin_to_spiral,
    bloom_intensity,
    calmness_histogram,
    calmness_to_color,
    chroma_vector,
    spectrogram_row_peaks,
    spectrogram_row_vqt,
    spiral_points,
    update_balls,
)

RANGE = VqtRange(min_freq=55.0, octaves=3, buckets_per_octave=24)


class TestSpiral:
    def test_radius_formula(self):
        """util.rs:11-12: radius = 2*(0.3 + (x/bpo)^0.75)."""
        x, y = bin_to_spiral(24, 24.0)  # one octave up
        r = math.hypot(float(x), float(y))
        assert abs(r - 2.0 * (0.3 + 1.0)) < 1e-4

    def test_one_turn_per_octave(self):
        x0, y0 = bin_to_spiral(24, 0.0)
        x1, y1 = bin_to_spiral(24, 24.0)
        a0 = math.atan2(float(y0), float(x0))
        a1 = math.atan2(float(y1), float(x1))
        assert abs(a0 - a1) < 1e-3  # same angle, larger radius

    def test_spiral_points_shape(self):
        pts = spiral_points(3, 24)
        assert pts.shape == (72, 2)
        assert np.all(np.isfinite(pts))


class TestBloomChroma:
    def test_bloom(self):
        assert abs(float(bloom_intensity(0.5)) - 0.65) < 1e-6
        assert float(bloom_intensity(1.0)) == 1.0  # clamped

    def test_chroma_sums_pitch_classes(self):
        n = RANGE.n_buckets
        x = np.zeros(n, np.float32)
        x[0] = 20.0  # bin 0 = A (55 Hz)
        chroma = np.asarray(chroma_vector(jnp.asarray(x), RANGE))
        assert chroma.shape == (12,)
        assert chroma.argmax() == 9  # A is pitch class 9 (C-referenced)
        assert abs(chroma.max() - 1.0) < 1e-6  # max-normalized

    def test_chroma_octave_invariance(self):
        n = RANGE.n_buckets
        x = np.zeros(n, np.float32)
        x[0] = 20.0
        x[24] = 20.0  # same pitch class, octave up
        chroma = np.asarray(chroma_vector(jnp.asarray(x), RANGE))
        assert chroma.argmax() == 9

    def test_chroma_half_semitone_rounds_away_from_zero(self):
        """bpo=24: bin 1 sits exactly half a semitone up; the reference's
        f32::round assigns it to semitone 1 (away from zero), not 0
        (half-to-even). Regression for the jnp.round misassignment that
        shifted EVERY odd bin one pitch class low at even buckets/semitone."""
        n = RANGE.n_buckets  # bpo = 24
        x = np.full(n, -300.0, np.float32)
        x[1] = 10.0  # dominant power at bin 1
        chroma = np.asarray(chroma_vector(jnp.asarray(x), RANGE))
        semitones_from_c4 = 12.0 * math.log2(RANGE.min_freq / 261.626)
        bin0_class = (round(semitones_from_c4) % 12 + 12) % 12
        want = (1 + bin0_class) % 12  # semitone 1, NOT 0
        assert int(np.argmax(chroma)) == want

    def test_chroma_silence(self):
        chroma = np.asarray(chroma_vector(jnp.zeros(RANGE.n_buckets), RANGE))
        assert np.all(np.isfinite(chroma))


class TestBalls:
    def _step(self, state, peaks_at, dt=1 / 30):
        n = RANGE.n_buckets
        mask = np.zeros(n, bool)
        center = np.zeros(n, np.float32)
        size = np.zeros(n, np.float32)
        for b, c, s in peaks_at:
            mask[b] = True
            center[b] = c
            size[b] = s
        return update_balls(
            RANGE,
            state,
            jnp.asarray(mask),
            jnp.asarray(center),
            jnp.asarray(size),
            jnp.zeros(n),
            jnp.zeros(n),
            jnp.zeros(n),
            dt,
        )

    def test_active_ball_appears_then_fades(self):
        n = RANGE.n_buckets
        state = BallState.init(n)
        state, out = self._step(state, [(30, 30.2, 10.0)])
        assert bool(out.visible[30])
        s0 = float(out.scale[30])
        assert s0 > 0
        # no peaks: ball fades with the per-bin dropoff
        state, out = self._step(state, [])
        s1 = float(out.scale[30])
        dropoff = (0.85 - 0.15 * 30 / n) ** (30.0 * (1 / 30))
        assert abs(s1 - s0 * dropoff) < 1e-5

    def test_neighbors_of_peak_hidden(self):
        n = RANGE.n_buckets
        state = BallState.init(n)
        # first give bin 31 some size so it would be visible
        state, _ = self._step(state, [(31, 31.0, 10.0)])
        # now peak moves to bin 30; bin 31 (within 0.23 semitone = 0.46 bins)
        state, out = self._step(state, [(30, 30.9, 10.0)])
        assert bool(out.visible[30])
        assert not bool(out.visible[31])

    def test_hide_interval_matches_reference_rounding(self):
        """The reference hides every integer bin in
        [round(c-r), round(c+r)] (update.rs:311-318) — an interval up to
        half a bin wider than a plain |bin - c| <= r distance test. bpo=36:
        radius 0.69, center 5.3 -> round(5.99)=6 must be hidden even though
        |6 - 5.3| = 0.7 > 0.69."""
        rng36 = VqtRange(min_freq=55.0, octaves=3, buckets_per_octave=36)
        n = rng36.n_buckets
        state = BallState.init(n)
        mask = np.zeros(n, bool)
        center = np.zeros(n, np.float32)
        size = np.zeros(n, np.float32)
        mask[6] = True  # give bin 6 a ball first
        center[6], size[6] = 6.0, 10.0
        state, _ = update_balls(
            rng36, state, jnp.asarray(mask), jnp.asarray(center),
            jnp.asarray(size), jnp.zeros(n), jnp.zeros(n), jnp.zeros(n), 1 / 30,
        )
        mask[:] = False
        center[:] = 0.0
        size[:] = 0.0
        mask[5] = True
        center[5], size[5] = 5.3, 10.0
        state, out = update_balls(
            rng36, state, jnp.asarray(mask), jnp.asarray(center),
            jnp.asarray(size), jnp.zeros(n), jnp.zeros(n), jnp.zeros(n), 1 / 30,
        )
        assert bool(out.visible[5])  # the peak itself
        assert not bool(out.visible[6])  # inside the reference's interval

    def test_visibility_cutoff_in_transform_units(self):
        """update.rs:153 compares transform.scale (= size/305) against
        0.019: a ball of size 5 (scale 0.0164) is below the cutoff and
        hides as soon as it is no longer an active peak; size 10 stays
        visible while fading."""
        n = RANGE.n_buckets
        small = BallState.init(n)
        small, out = self._step(small, [(30, 30.0, 5.0)])
        assert bool(out.visible[30])  # active placement threshold is 0.002
        small, out = self._step(small, [])
        assert not bool(out.visible[30])  # fading, below 0.019
        big = BallState.init(n)
        big, _ = self._step(big, [(30, 30.0, 10.0)])
        big, out = self._step(big, [])
        assert bool(out.visible[30])  # 10/305 = 0.0328 still above cutoff

    def test_fading_ball_keeps_color_with_alpha_floor(self):
        """update.rs:166-170: a fading ball keeps its material color; only
        alpha decays, floored at 0.7."""
        n = RANGE.n_buckets
        state = BallState.init(n)
        state, out0 = self._step(state, [(30, 30.2, 10.0)])
        rgb0 = np.asarray(out0.rgba[30, :3])
        assert np.any(rgb0 > 0)
        state, out1 = self._step(state, [])
        np.testing.assert_allclose(np.asarray(out1.rgba[30, :3]), rgb0, atol=1e-7)
        assert float(out1.rgba[30, 3]) >= 0.7  # alpha floor
        # many fade frames later the floor holds exactly
        for _ in range(20):
            state, out = self._step(state, [])
        np.testing.assert_allclose(float(out.rgba[30, 3]), 0.7, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.rgba[30, :3]), rgb0, atol=1e-7)


class TestBallsScatterFreeEquivalence:
    """The static-shift formulation of update_balls must equal a plain
    scatter-loop NumPy mirror of the reference semantics on random inputs
    (the rewrite exists for the CLAUDE.md no-data-dependent-scatters rule;
    this pins that it changed nothing)."""

    def _numpy_mirror(self, rng_, state, peaks, center, size, calmness, dt):
        from pitchvis_tpu.models.viewer import (
            FADE_ALPHA_FLOOR,
            PITCH_BALL_SCALE_FACTOR,
            VISIBILITY_CUTOFF,
            pitch_color_rotation,
        )
        from pitchvis_tpu.ops.colors import COLORS, EASING_POW, GRAY_LEVEL
        from pitchvis_tpu.ops.colors import calculate_color as cc

        n = rng_.n_buckets
        dropoff = (0.85 - 0.15 * np.arange(n) / n) ** (30.0 * dt)
        scale = np.asarray(state.scale) * dropoff

        active = np.zeros(n, bool)
        center_at = np.zeros(n)
        size_at = np.zeros(n)
        for i in range(n):
            if peaks[i]:
                k = min(max(int(center[i]), 0), n - 1)
                active[k] = True
                center_at[k] = center[i]
                size_at[k] = size[i]
        max_size = max(float(np.max(np.where(peaks, size, 0.0))), 1e-30)
        coeff = 1.0 - (1.0 - size_at / max_size) ** 2.0
        rot = pitch_color_rotation(rng_.buckets_per_octave)
        rgb = np.asarray(
            cc(rng_.buckets_per_octave,
               jnp.asarray(np.mod(center_at + rot, rng_.buckets_per_octave)),
               COLORS, GRAY_LEVEL, EASING_POW)
        )
        calm_param = np.clip(calmness - 0.27, 0.0, 1.0)
        new_scale = np.where(
            active, size_at * PITCH_BALL_SCALE_FACTOR * (1.0 + 0.2 * calm_param),
            scale,
        )
        faded_alpha = np.maximum(
            np.asarray(state.rgba)[:, 3] * dropoff, FADE_ALPHA_FLOOR
        )
        new_rgba = np.where(
            active[:, None],
            np.concatenate([rgb, coeff[:, None]], axis=-1),
            np.concatenate([np.asarray(state.rgba)[:, :3], faded_alpha[:, None]], axis=-1),
        )
        visible = new_scale >= VISIBILITY_CUTOFF
        visible = np.where(active & (new_scale >= 0.002), True, visible)
        radius = (rng_.buckets_per_octave // 12) * 0.23
        hide = np.zeros(n, bool)
        for i in range(n):
            if peaks[i]:
                lo = int(max(np.floor(center[i] - radius + 0.5), 0))
                hi = int(min(np.floor(center[i] + radius + 0.5), n - 1))
                hide[lo : hi + 1] = True
        hide &= ~active
        return new_scale, new_rgba, visible & ~hide

    def test_fuzz_matches_numpy_scatter_mirror(self):
        from pitchvis_tpu.models.viewer import BallState, update_balls

        for bpo in (24, 36, 84):
            rng_ = VqtRange(min_freq=55.0, octaves=3, buckets_per_octave=bpo)
            n = rng_.n_buckets
            r = np.random.default_rng(bpo)
            state = BallState.init(n)
            # warm the carry with one random placement round first
            for step in range(4):
                peaks = r.random(n) < 0.05
                # the real peak domain: min-distance suppression keeps
                # discrete peaks >= 2 bins apart (ops/peaks.py), which is
                # what makes the trunc(center) keys collision-free
                last = -2
                for i in range(n):
                    if peaks[i]:
                        if i - last < 2:
                            peaks[i] = False
                        else:
                            last = i
                center = np.clip(
                    np.arange(n) + r.uniform(-1.0, 1.0, n), 0, n - 1
                ).astype(np.float32)
                size = r.uniform(0.0, 30.0, n).astype(np.float32)
                calm = r.uniform(0.0, 1.0, n).astype(np.float32)
                want = self._numpy_mirror(
                    rng_, state, peaks, center, size, calm, 1 / 30
                )
                state, out = update_balls(
                    rng_, state, jnp.asarray(peaks), jnp.asarray(center),
                    jnp.asarray(size), jnp.asarray(calm), jnp.zeros(n),
                    jnp.zeros(n), 1 / 30,
                )
                np.testing.assert_allclose(np.asarray(out.scale), want[0], atol=1e-6)
                np.testing.assert_allclose(np.asarray(out.rgba), want[1], atol=1e-5)
                np.testing.assert_array_equal(np.asarray(out.visible), want[2])


class TestSpectrogram:
    def test_vqt_row(self):
        n = RANGE.n_buckets
        x = np.zeros(n, np.float32)
        x[10] = 30.0
        row = np.asarray(spectrogram_row_vqt(RANGE, jnp.asarray(x)))
        assert row.shape == (n, 4)
        assert row.dtype == np.uint8
        assert row[10, 3] > 200  # bright at the peak
        assert row[40, 3] < 100

    def test_peaks_row_gaussian(self):
        n = RANGE.n_buckets
        mask = np.zeros(n, bool)
        center = np.zeros(n, np.float32)
        size = np.zeros(n, np.float32)
        mask[30] = True
        center[30] = 30.0
        size[30] = 10.0
        row = np.asarray(
            spectrogram_row_peaks(RANGE, jnp.asarray(mask), jnp.asarray(center), jnp.asarray(size))
        )
        assert row[30, 3] > row[31, 3] > row[32, 3]
        assert row[35, 3] == 0

    def test_peaks_row_contested_pixel_highest_peak_wins(self):
        """The reference iterates peaks ascending by center with overwrite
        (update.rs:1017-1058), so where two peaks' splat radii overlap the
        HIGHER peak paints the contested pixels — including when both
        rounded centers coincide (2-bin spacing with converging +-1-bin
        centers). A per-peak NumPy port of the reference loop is the oracle."""
        from pitchvis_tpu.ops.colors import COLORS, GRAY_LEVEL, calculate_color
        from pitchvis_tpu.models.viewer import (
            EASING_POW, PEAK_RADIUS, pitch_color_rotation,
        )

        n = RANGE.n_buckets
        rot = pitch_color_rotation(RANGE.buckets_per_octave)

        def oracle(mask, center, size):
            mx = max(float(size[mask].max()), 1e-30)
            row = np.zeros((n, 4))
            for b in np.where(mask)[0]:  # ascending = ascending center
                c, s = float(center[b]), float(size[b])
                bright = min(max((1.0 - (1.0 - s / mx) ** 2.0) * 1.5, 0.0), 1.0)
                rgb = np.asarray(calculate_color(
                    RANGE.buckets_per_octave,
                    (c + rot) % RANGE.buckets_per_octave,
                    COLORS, GRAY_LEVEL, EASING_POW,
                ))
                lo = max(int(np.floor(c - PEAK_RADIUS)), 0)
                hi = min(int(np.ceil(c + PEAK_RADIUS)), n)
                for j in range(lo, hi):
                    d = abs(j - c)
                    if d <= PEAK_RADIUS:
                        fall = np.exp(-d * d / (PEAK_RADIUS * PEAK_RADIUS * 0.5))
                        row[j, :3] = rgb * 1.2
                        row[j, 3] = bright * fall * 1.2
            return np.floor(np.clip(row * 255.0, 0.0, 255.0)).astype(np.uint8)

        cases = [
            (40, 40.9, 10.0, 42, 41.1, 20.0),  # rounded centers COINCIDE at 41
            (40, 40.5, 25.0, 43, 42.6, 8.0),  # overlapping radii, distinct rounds
            (40, 40.0, 10.0, 42, 42.0, 10.0),  # integral centers (ceil-exclusive edge)
        ]
        for bA, cA, sA, bB, cB, sB in cases:
            mask = np.zeros(n, bool)
            center = np.arange(n, dtype=np.float32)
            size = np.zeros(n, np.float32)
            mask[[bA, bB]] = True
            center[bA], center[bB] = cA, cB
            size[bA], size[bB] = sA, sB
            got = np.asarray(spectrogram_row_peaks(
                RANGE, jnp.asarray(mask), jnp.asarray(center), jnp.asarray(size)
            ))
            np.testing.assert_array_equal(got, oracle(mask, center, size),
                                          err_msg=str((cA, cB)))

    def test_quantization_truncates_like_as_u8(self):
        """The reference clamps then casts `as u8` — truncation. Find a
        brightness whose float alpha has a fractional part > 0.6 and assert
        the u8 channel equals the floor, not the round."""
        n = RANGE.n_buckets
        for v in np.linspace(3.0, 30.0, 200):
            x = np.zeros(n, np.float32)
            x[0] = 40.0  # sets the max
            x[5] = v
            mx = 40.0
            normalized = v / (mx + 0.001)
            b = min(max((1.0 - (1.0 - normalized) ** 2.0) * 1.5, 0.0), 1.0)
            alpha_f = min(max(b * 1.2 * 255.0, 0.0), 255.0)
            if alpha_f % 1.0 > 0.6 and alpha_f < 254:
                row = np.asarray(spectrogram_row_vqt(RANGE, jnp.asarray(x)))
                assert row[5, 3] == int(alpha_f)  # floor, not round
                return
        raise AssertionError("no fractional test case found")

    def test_scroll_state(self):
        st = SpectrogramState.init(4, 8)
        row = jnp.full((8, 4), 200, jnp.uint8)
        st = st.push(row)
        assert int(st.write_index) == 1
        img = np.asarray(st.image)
        assert np.all(img[0] == 200)
        assert np.all(img[1] == 0)  # next line cleared


class TestBassSpiral:
    """update.rs:353-426 parity at the data level."""

    def _mk(self, bins_sizes):
        n = RANGE.n_buckets
        mask = np.zeros(n, bool)
        center = np.zeros(n, np.float32)
        size = np.zeros(n, np.float32)
        for b, c, s in bins_sizes:
            mask[b] = True
            center[b] = c
            size[b] = s
        return jnp.asarray(mask), jnp.asarray(center), jnp.asarray(size)

    def test_lit_up_to_lowest_peak(self):
        # lowest peak at fractional bin 24.6 -> 24.6/24*12 = 12.3 semitones
        # -> round = 12 -> 72 segments lit
        out = bass_spiral(RANGE, *self._mk([(24, 24.6, 10.0), (40, 40.0, 20.0)]))
        vis = np.asarray(out.visible)
        assert vis.shape == (bass_cylinder_count(RANGE.octaves),)
        assert vis.shape == (167,)  # min(28*6, 3*72) points -> 167 segments
        assert vis[:72].all() and not vis[72:].any()
        # alpha = 1-(1-10/20)^2 = 0.75 for the lowest (not largest) peak
        np.testing.assert_allclose(float(out.rgba[3]), 0.75, atol=1e-6)

    def test_no_peaks_all_hidden(self):
        out = bass_spiral(RANGE, *self._mk([]))
        assert not np.asarray(out.visible).any()

    def test_lowest_peak_beyond_range_hides_all(self):
        # center semitones = 71.9/24*12 ~ 36 -> 36*6 = 216 >= 167 cylinders
        out = bass_spiral(RANGE, *self._mk([(71, 71.9, 10.0)]))
        assert not np.asarray(out.visible).any()

    def test_cylinder_count_boundary(self):
        """The reference spawns only HIGHEST_BASSNOTE*6 spiral points of
        cylinders (setup.rs:134-137) and early-outs when
        round(center_semitones)*6 >= that count (update.rs:382-387):
        semitone 27 lights 162 segments, semitone 28 (168 >= 167) hides all.
        """
        # bin 54 at 24 bpo = 27 semitones; bin 56 = 28 semitones
        out27 = bass_spiral(RANGE, *self._mk([(54, 54.0, 10.0)]))
        vis27 = np.asarray(out27.visible)
        assert vis27[:162].all() and not vis27[162:].any()
        out28 = bass_spiral(RANGE, *self._mk([(56, 56.0, 10.0)]))
        assert not np.asarray(out28.visible).any()

    def test_color_is_rounded_semitone_pitch_class(self):
        from pitchvis_tpu.models.viewer import pitch_color_rotation
        from pitchvis_tpu.ops.colors import COLORS, EASING_POW, GRAY_LEVEL, calculate_color

        out = bass_spiral(RANGE, *self._mk([(10, 10.4, 5.0)]))
        sem = round(10.4 / 24 * 12)
        ref_bucket = (sem * 24 / 12 + pitch_color_rotation(24)) % 24
        ref = np.asarray(
            calculate_color(24, jnp.float32(ref_bucket), COLORS, GRAY_LEVEL, EASING_POW)
        )
        np.testing.assert_allclose(np.asarray(out.rgba[:3]), ref, atol=1e-6)


class TestCalmnessOverlays:
    def test_threshold_colors(self):
        rgb = np.asarray(calmness_to_color(jnp.asarray([0.1, 0.5, 0.9])))
        np.testing.assert_allclose(rgb[0], [1.0, 0.5, 0.5])  # red
        np.testing.assert_allclose(rgb[1], [1.0, 1.0, 0.5])  # yellow
        np.testing.assert_allclose(rgb[2], [0.5, 0.8, 1.0])  # cyan

    def test_histogram_heights_and_midpoint_colors(self):
        calm = jnp.asarray([0.0, 0.2, 0.8, 1.0])
        out = calmness_histogram(calm)
        np.testing.assert_allclose(np.asarray(out.heights), [0.0, 0.1, 0.4, 0.5])
        # midpoints 0.1, 0.5, 0.9 -> red, yellow, cyan
        np.testing.assert_allclose(np.asarray(out.segment_rgb[0]), [1.0, 0.5, 0.5])
        np.testing.assert_allclose(np.asarray(out.segment_rgb[1]), [1.0, 1.0, 0.5])
        np.testing.assert_allclose(np.asarray(out.segment_rgb[2]), [0.5, 0.8, 1.0])

    def test_graph_ring_ordering(self):
        st = CalmnessGraphState.init(capacity=4)
        for v in (0.1, 0.2, 0.3, 0.4, 0.5):  # wraps once
            st = st.push(v)
        vals, colors = st.trace()
        np.testing.assert_allclose(np.asarray(vals), [0.2, 0.3, 0.4, 0.5], atol=1e-6)
        assert colors.shape == (3, 3)

    def test_fused_pipeline_emits_bass_and_histogram(self, small_params):
        from pitchvis_tpu.models.pipeline import StreamingPipeline

        pipe = StreamingPipeline(2, small_params, with_viewer=True)
        chunk = np.full((2, 368), 0.02, np.float32)
        out = None
        for _ in range(3):
            out = pipe.step(chunk, 1.0 / 60.0)
        n_seg = bass_cylinder_count(small_params.range.octaves)
        assert out.viewer.bass.visible.shape == (2, n_seg)
        assert out.viewer.bass.rgba.shape == (2, 4)
        assert out.viewer.calmness_histogram.heights.shape == (
            2, small_params.n_buckets,
        )
        assert out.viewer.calmness_histogram.segment_rgb.shape == (
            2, small_params.n_buckets - 1, 3,
        )
