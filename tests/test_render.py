"""Rasterizer tests (models/render.py vs noisy_color_rings_2d.wgsl math +
display_system scene composition)."""

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

from pitchvis_tpu.core.config import VqtRange
from pitchvis_tpu.models.render import (
    RenderConfig,
    ball_fragment,
    linear_to_srgb,
    make_scene,
    pitch_indicator_center_dot,
    render_batch,
    render_frame,
    ring_profile,
    simplex_noise3,
    srgb_to_linear,
    tuning_indicator,
)
from pitchvis_tpu.models.viewer import (
    BallState,
    bass_spiral,
    bin_to_spiral,
    update_balls,
)

RANGE = VqtRange(min_freq=55.0, octaves=3, buckets_per_octave=24)
CFG = RenderConfig(width=320, height=180, ball_patch=48)


def _sbdt_np(col: np.ndarray) -> np.ndarray:
    """Independent numpy SomewhatBoringDisplayTransform (Bevy's
    tonemapping.wgsl / Stachowiak's SBDT), re-derived here as a cross-check
    of models.render._tonemap. col: (..., 3) linear."""
    col = np.maximum(np.asarray(col, np.float32), 0.0)
    r, g, b = col[..., 0], col[..., 1], col[..., 2]
    y = 0.2126 * r + 0.7152 * g + 0.0722 * b
    cb = -0.1146 * r - 0.3854 * g + 0.5 * b
    cr = 0.5 * r - 0.4542 * g - 0.0458 * b
    curve = lambda v: 1.0 - np.exp(-v)  # noqa: E731
    bt = curve(np.hypot(cb, cr) * 2.4)
    desat = np.maximum((bt - 0.7) * 0.8, 0.0) ** 2
    desat_col = col * (1.0 - desat[..., None]) + y[..., None] * desat[..., None]
    tm0 = col * np.maximum(0.0, curve(y) / np.maximum(1e-5, y))[..., None]
    tm1 = curve(desat_col)
    w = (bt * bt)[..., None]
    return ((tm0 * (1.0 - w) + tm1 * w) * 0.97).astype(np.float32)


def _scene(bins_sizes, calmness=1.0, accuracy=0.0, deviation=0.0):
    """BallOutputs + BassSpiralOutputs for a list of (bin, center, size)."""
    n = RANGE.n_buckets
    peaks = np.zeros(n, bool)
    center = np.zeros(n, np.float32)
    size = np.zeros(n, np.float32)
    for b, c, s in bins_sizes:
        peaks[b] = True
        center[b] = c
        size[b] = s
    st = BallState.init(n)
    _, balls = update_balls(
        RANGE, st, jnp.asarray(peaks), jnp.asarray(center), jnp.asarray(size),
        jnp.full(n, calmness), jnp.full(n, accuracy), jnp.full(n, deviation),
        1.0 / 60.0,
    )
    bass = bass_spiral(RANGE, jnp.asarray(peaks), jnp.asarray(center),
                       jnp.asarray(size))
    return balls, bass


class TestShaderMath:
    def test_noise_deterministic_and_bounded(self):
        u = np.linspace(0.0, 4.3, 64, dtype=np.float32)
        a = np.asarray(simplex_noise3(u[None, :], u[:, None], 0.8))
        b = np.asarray(simplex_noise3(u[None, :], u[:, None], 0.8))
        np.testing.assert_array_equal(a, b)
        assert a.min() >= -1.0 - 1e-5 and a.max() <= 1.0 + 1e-5
        assert a.std() > 0.05  # not a constant field

    def test_noise_varies_with_time(self):
        u = np.linspace(0.0, 4.3, 16, dtype=np.float32)
        a = np.asarray(simplex_noise3(u[None, :], u[:, None], 0.0))
        b = np.asarray(simplex_noise3(u[None, :], u[:, None], 1.0))
        assert np.abs(a - b).max() > 1e-3

    def test_ring_profile(self):
        """wgsl:116-120: sin(r*sqrt(r)*pi)^2 — zero at center, unity where
        r^1.5 = 0.5."""
        assert float(ring_profile(jnp.float32(0.0))) == 0.0
        r_peak = 0.5 ** (2.0 / 3.0)
        assert abs(float(ring_profile(jnp.float32(r_peak))) - 1.0) < 1e-6
        assert float(ring_profile(jnp.float32(1.0))) < 1e-9  # sin(pi)^2

    def test_center_dot_threshold(self):
        """wgsl:126-141: nothing below accuracy 0.85; lit at the center
        above, dark beyond the 0.08 radius."""
        r0 = jnp.float32(0.0)
        assert float(pitch_indicator_center_dot(r0, 0.84, 1.0)) == 0.0
        assert float(pitch_indicator_center_dot(r0, 1.0, 1.0)) > 0.5
        assert float(pitch_indicator_center_dot(jnp.float32(0.09), 1.0, 1.0)) == 0.0

    def test_tuning_star_mirror_chirality(self):
        """wgsl:231-260: flipping the deviation sign mirrors the spiral star
        (sharp = clockwise, flat = counterclockwise)."""
        xs = np.linspace(-0.24, 0.24, 21, dtype=np.float32)
        X, Y = np.meshgrid(xs, xs)
        R = np.sqrt(X * X + Y * Y).astype(np.float32)
        sharp = np.asarray(tuning_indicator(X, Y, R, 0.3, 2.0))
        flat_mirrored = np.asarray(tuning_indicator(X, -Y, R, -0.3, 2.0))
        np.testing.assert_allclose(sharp, flat_mirrored, atol=1e-6)
        assert sharp.max() > 0.0

    def test_tuning_star_annulus_only(self):
        assert float(tuning_indicator(0.3, 0.0, jnp.float32(0.3), 0.1, 1.0)) == 0.0
        assert float(tuning_indicator(0.005, 0.0, jnp.float32(0.005), 0.1, 1.0)) == 0.0

    def test_full_calm_is_solid_material_disk(self):
        """ring_strength = clamp(1-calmness*1.65)^3 hits 0 at calmness
        1/1.65 (wgsl:426): the fragment returns the material color at any
        interior point, regardless of noise/indicators."""
        rgb = jnp.asarray([0.2, 0.5, 0.8])
        for ux, uy in ((0.0, 0.0), (0.4, -0.3), (-0.7, 0.2)):
            out_rgb, out_a = ball_fragment(
                jnp.float32(ux), jnp.float32(uy), rgb, jnp.float32(0.9),
                jnp.float32(0.75), 1.0, jnp.float32(1.0), jnp.float32(0.4),
            )
            np.testing.assert_allclose(np.asarray(out_rgb), np.asarray(rgb), atol=1e-6)
            np.testing.assert_allclose(float(out_a), 0.9, atol=1e-6)

    def test_boundary_alpha_zero(self):
        """smooth_circle_boundary (wgsl:100-102): alpha fades to 0 at r=1."""
        _, a = ball_fragment(
            jnp.float32(1.0), jnp.float32(0.0), jnp.asarray([1.0, 1.0, 1.0]),
            jnp.float32(1.0), jnp.float32(1.0), 0.0, jnp.float32(0.0),
            jnp.float32(0.0),
        )
        assert float(a) == 0.0

    def test_srgb_round_trip(self):
        c = jnp.asarray([0.0, 0.01, 0.23, 0.5, 1.0])
        np.testing.assert_allclose(
            np.asarray(linear_to_srgb(srgb_to_linear(c))), np.asarray(c), atol=1e-6
        )


class TestScene:
    def test_background_only_matches_closed_form(self):
        """No visible balls, no bass, bloom/names off: every pixel is the
        SBDT-tonemapped clear color or net gray, cross-checked against an
        independent numpy SBDT (the published formula, re-derived here)."""
        cfg = dataclasses.replace(CFG, with_bloom=False, with_pitch_names=False)
        balls, _ = _scene([])
        img = np.asarray(render_frame(cfg, RANGE, balls, None, 0.0, 1.0))
        st = make_scene(cfg, RANGE)
        bg = np.asarray(st.background)[: cfg.height, : cfg.width]
        expected = np.asarray(linear_to_srgb(jnp.asarray(_sbdt_np(bg))))
        expected = np.clip(np.round(expected * 255.0), 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(img, expected)

    def test_net_pixels_differ_from_clear(self):
        st = make_scene(CFG, RANGE)
        bg = np.asarray(st.background)[: CFG.height, : CFG.width]
        clear = np.asarray(srgb_to_linear(jnp.asarray([0.23, 0.23, 0.25])))
        assert (np.abs(bg - clear).sum(-1) > 1e-4).any()  # net drawn
        off = make_scene(RenderConfig(width=64, height=36, with_net=False), RANGE)
        flat = np.asarray(off.background).reshape(-1, 3)
        assert np.unique(flat, axis=0).shape[0] == 1  # uniform clear color
        np.testing.assert_allclose(flat[0], clear, atol=1e-5)

    def test_calm_ball_center_pixel_exact(self):
        """A fully calm lone peak renders a solid disk of exactly its
        material color (alpha = color coefficient = 1 for the only peak):
        center pixel == SBDT(linear(material)) sRGB-encoded (independent
        numpy SBDT)."""
        cfg = RenderConfig(width=320, height=180, ball_patch=48,
                           with_bloom=False, with_pitch_names=False)
        b = 30
        balls, bass = _scene([(b, float(b), 40.0)], calmness=1.0)
        img = np.asarray(render_frame(cfg, RANGE, balls, bass, 0.5, 1.0))

        mat = np.asarray(balls.rgba[b])
        assert abs(mat[3] - 1.0) < 1e-6
        lin = np.asarray(srgb_to_linear(jnp.asarray(mat[:3])))
        expected = np.asarray(linear_to_srgb(jnp.asarray(_sbdt_np(lin[None, None]))))[0, 0]
        expected = np.clip(np.round(expected * 255.0), 0, 255).astype(np.uint8)

        x, y = bin_to_spiral(RANGE.buckets_per_octave, float(np.asarray(balls.position[b, 0] * 0 + b)))
        # pixel of the ball center from its actual position output
        cx, cy = float(balls.position[b, 0]), float(balls.position[b, 1])
        s = cfg.pixel_size
        pi = int(round(cx / s + (cfg.width - 1) / 2.0))
        pj = int(round((cfg.height - 1) / 2.0 - cy / s))
        np.testing.assert_array_equal(img[pj, pi], expected)

    def test_z_order_bigger_ball_on_top(self):
        """update.rs:232-234: z = (size/max-1.01)*12.5 — the bigger ball
        draws on top where two solid disks overlap."""
        cfg = RenderConfig(width=320, height=180, ball_patch=96, with_bloom=False)
        # an octave+1.5 semitones apart: close on the spiral, different
        # colors; sizes keep both radii inside the ball patch
        b1, b2 = 30, 57
        balls, bass = _scene([(b1, float(b1), 60.0), (b2, float(b2), 100.0)],
                             calmness=1.0)
        img = np.asarray(render_frame(cfg, RANGE, balls, bass, 0.5, 1.0))
        s = cfg.pixel_size
        p1 = np.asarray(balls.position[b1, :2])
        p2 = np.asarray(balls.position[b2, :2])
        r1 = 10.0 * float(balls.scale[b1])
        r2 = 10.0 * float(balls.scale[b2])
        assert np.hypot(*(p2 - p1)) < r1 + r2  # they do overlap
        assert max(r1, r2) / s < cfg.ball_patch / 2  # no patch clipping
        # walk from the small center toward the big one until inside both
        for t in np.linspace(0.0, 1.0, 50):
            q = p1 + (p2 - p1) * t
            if np.hypot(*(q - p1)) < 0.8 * r1 and np.hypot(*(q - p2)) < 0.8 * r2:
                break
        pi = int(round(q[0] / s + (cfg.width - 1) / 2.0))
        pj = int(round((cfg.height - 1) / 2.0 - q[1] / s))
        ci = int(round(p2[0] / s + (cfg.width - 1) / 2.0))
        cj = int(round((cfg.height - 1) / 2.0 - p2[1] / s))
        # a probe inside the small ball but outside the big one
        away = (p1 - p2) / np.hypot(*(p1 - p2))
        q2 = p1 + away * 0.6 * r1
        assert np.hypot(*(q2 - p2)) > r2
        q2i = int(round(q2[0] / s + (cfg.width - 1) / 2.0))
        q2j = int(round((cfg.height - 1) / 2.0 - q2[1] / s))
        # the overlap pixel shows the bigger (top) ball's solid color,
        # which differs from the smaller ball's own region
        np.testing.assert_array_equal(img[pj, pi], img[cj, ci])
        assert (img[pj, pi] != img[q2j, q2i]).any()

    def test_bass_spiral_lights_pixels(self):
        cfg = RenderConfig(width=320, height=180, ball_patch=48, with_bloom=False)
        balls, bass = _scene([(30, 30.0, 25.0)])
        lit = np.asarray(render_frame(cfg, RANGE, balls, bass, 0.5, 1.0))
        dark = np.asarray(render_frame(cfg, RANGE, balls, None, 0.5, 1.0))
        assert int(np.sum(np.any(lit != dark, axis=-1))) > 50
        n_lit = int(np.asarray(bass.visible).sum())
        assert n_lit == round(30.0 / 24 * 12) * 6

    def test_bloom_brightens_with_scene_calmness(self):
        balls, bass = _scene([(30, 30.0, 40.0)], calmness=1.0)
        calm = np.asarray(render_frame(CFG, RANGE, balls, bass, 1.0, 1.0))
        tense = np.asarray(render_frame(CFG, RANGE, balls, bass, 0.0, 1.0))
        assert calm.astype(np.int64).sum() > tense.astype(np.int64).sum()

    def test_batch_matches_single(self):
        balls, bass = _scene([(30, 30.3, 25.0), (50, 50.1, 15.0)])
        import jax

        batch_balls = jax.tree.map(lambda x: jnp.stack([x, x]), balls)
        batch_bass = jax.tree.map(lambda x: jnp.stack([x, x]), bass)
        out = np.asarray(
            render_batch(CFG, RANGE, batch_balls, batch_bass,
                         jnp.asarray([0.3, 0.9]), 1.0)
        )
        single0 = np.asarray(render_frame(CFG, RANGE, balls, bass, 0.3, 1.0))
        single1 = np.asarray(render_frame(CFG, RANGE, balls, bass, 0.9, 1.0))
        np.testing.assert_array_equal(out[0], single0)
        np.testing.assert_array_equal(out[1], single1)


class TestRenderStreams:
    def test_selected_rows_match_render_frame(self):
        """render_streams: rasterizing selected rows of a batched serving
        output (ViewerOutputs + scene calmness) == render_frame on each
        selected row (the display-rate consumer path)."""
        import jax

        from pitchvis_tpu.models.pipeline import ViewerOutputs
        from pitchvis_tpu.models.render import render_streams

        scenes = [
            _scene([(30, 30.2, 20.0)]),
            _scene([(50, 49.8, 15.0)], calmness=0.8),
            _scene([(10, 10.0, 25.0)], accuracy=0.95),
        ]
        balls = jax.tree.map(lambda *xs: jnp.stack(xs), *[s[0] for s in scenes])
        bass = jax.tree.map(lambda *xs: jnp.stack(xs), *[s[1] for s in scenes])
        viewer = ViewerOutputs(
            balls=balls, chroma=None, bloom=None, spectrogram_row=None,
            bass=bass, calmness_histogram=None,
        )
        sc = jnp.asarray([0.1, 0.6, 0.9])

        out = np.asarray(
            render_streams(CFG, RANGE, viewer, sc, 1.0, streams=(2, 0))
        )
        assert out.shape == (2, CFG.height, CFG.width, 3)
        exp2 = np.asarray(
            render_frame(CFG, RANGE, scenes[2][0], scenes[2][1], 0.9, 1.0)
        )
        exp0 = np.asarray(
            render_frame(CFG, RANGE, scenes[0][0], scenes[0][1], 0.1, 1.0)
        )
        np.testing.assert_array_equal(out[0], exp2)
        np.testing.assert_array_equal(out[1], exp0)


class TestDemoRender:
    def test_demo_render_cli(self, tmp_path):
        """`demo --tone --render DIR` writes one PNG per hop (the headless
        counterpart of the reference viewer's window)."""
        import os
        import subprocess
        import sys

        out = tmp_path / "frames"
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
        proc = subprocess.run(
            [
                sys.executable, "-m", "pitchvis_tpu.demo",
                "--tone", "440", "--seconds", "0.5", "--fps", "30",
                "--frames", "1", "--render", str(out),
                "--render-size", "160x90",
            ],
            capture_output=True, timeout=600, env=env,
        )
        assert proc.returncode == 0, proc.stderr.decode()[-2000:]
        pngs = sorted(out.glob("frame_*.png"))
        assert len(pngs) == 15
        from PIL import Image

        im = Image.open(pngs[-1])
        assert im.size == (160, 90)


class TestModes:
    def test_performance_mode_scales_balls(self):
        """VisualsMode::Performance shrinks balls 0.7x (update.rs:292-297)."""
        n = RANGE.n_buckets
        peaks = np.zeros(n, bool); center = np.zeros(n, np.float32)
        size = np.zeros(n, np.float32)
        peaks[30] = True; center[30] = 30.0; size[30] = 40.0
        args = (jnp.asarray(peaks), jnp.asarray(center), jnp.asarray(size),
                jnp.zeros(n), jnp.zeros(n), jnp.zeros(n), 1.0 / 60.0)
        _, full = update_balls(RANGE, BallState.init(n), *args)
        _, perf = update_balls(RANGE, BallState.init(n), *args,
                               ball_scale_factor=0.7)
        np.testing.assert_allclose(
            float(perf.scale[30]), 0.7 * float(full.scale[30]), rtol=1e-6
        )

    def test_shader_params_gated_off(self):
        """Outside Normal/Debugging display modes the material params zero
        out, which also drops the calmness size boost (update.rs:268-276)."""
        n = RANGE.n_buckets
        peaks = np.zeros(n, bool); center = np.zeros(n, np.float32)
        size = np.zeros(n, np.float32)
        peaks[30] = True; center[30] = 30.0; size[30] = 40.0
        args = (jnp.asarray(peaks), jnp.asarray(center), jnp.asarray(size),
                jnp.full(n, 1.0), jnp.full(n, 0.95), jnp.full(n, 0.2),
                1.0 / 60.0)
        _, on = update_balls(RANGE, BallState.init(n), *args)
        _, off = update_balls(RANGE, BallState.init(n), *args,
                              shader_params=False)
        assert float(off.calmness[30]) == 0.0
        assert float(off.pitch_accuracy[30]) == 0.0
        assert float(off.pitch_deviation[30]) == 0.0
        # calmness_scale reads the zeroed param: 1.0 vs 1 + 0.2*0.73
        np.testing.assert_allclose(
            float(on.scale[30]) / float(off.scale[30]), 1.0 + 0.2 * 0.73,
            rtol=1e-5,
        )

    def test_galaxy_mode_clear_and_no_bass(self):
        """Galaxy visuals: galaxy clear color, bass spiral hidden
        (update.rs:374-376, 908-916)."""
        from pitchvis_tpu.models.render import CLEAR_COLOR_GALAXY

        cfg = RenderConfig.for_mode(
            "galaxy", width=160, height=96, with_net=False, with_bloom=False
        )
        assert cfg.clear_color == CLEAR_COLOR_GALAXY and not cfg.with_bass
        balls, bass = _scene([(30, 30.0, 25.0)])
        img = np.asarray(render_frame(cfg, RANGE, balls, bass, 0.5, 1.0))
        # corner pixel = tonemapped galaxy clear color (purple-ish, G=0)
        assert img[0, 0, 1] < img[0, 0, 0] and img[0, 0, 2] > 0
        neutral = np.asarray(render_frame(
            RenderConfig(width=160, height=96, with_net=False,
                         with_bloom=False, with_bass=False),
            RANGE, balls, bass, 0.5, 1.0))
        assert (img[0, 0] != neutral[0, 0]).any()


class TestShardedRender:
    """The rasterizer is per-stream independent: dp-sharded rendering must
    match single-device bit-for-bit and stay collective-free."""

    def _batch(self, B):
        import jax

        balls, bass = _scene([(30, 30.3, 25.0), (50, 50.1, 15.0)])
        bb = jax.tree.map(lambda x: jnp.stack([x] * B), balls)
        bs = jax.tree.map(lambda x: jnp.stack([x] * B), bass)
        sc = jnp.linspace(0.0, 1.0, B)
        return bb, bs, sc

    def test_sharded_matches_single(self):
        import jax

        from pitchvis_tpu.parallel.sharding import make_mesh, shard_batch

        cfg = RenderConfig(width=160, height=96, ball_patch=32)
        bb, bs, sc = self._batch(8)
        ref = np.asarray(render_batch(cfg, RANGE, bb, bs, sc, 1.0))

        mesh = make_mesh(8)
        bb_s = jax.tree.map(lambda x: shard_batch(mesh, np.asarray(x)), bb)
        bs_s = jax.tree.map(lambda x: shard_batch(mesh, np.asarray(x)), bs)
        sc_s = shard_batch(mesh, np.asarray(sc))
        out = render_batch(cfg, RANGE, bb_s, bs_s, sc_s, 1.0)
        assert len(out.sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(out), ref)

    def test_sharded_render_collective_free(self):
        import jax

        from pitchvis_tpu.models.render import make_scene as _ms
        from pitchvis_tpu.parallel.sharding import make_mesh, shard_batch

        cfg = RenderConfig(width=160, height=96, ball_patch=32)
        st = _ms(cfg, RANGE)
        bb, bs, sc = self._batch(8)
        mesh = make_mesh(8)
        bb_s = jax.tree.map(lambda x: shard_batch(mesh, np.asarray(x)), bb)
        bs_s = jax.tree.map(lambda x: shard_batch(mesh, np.asarray(x)), bs)
        sc_s = shard_batch(mesh, np.asarray(sc))

        from pitchvis_tpu.models.render import _render_frame_impl

        fn = jax.jit(jax.vmap(
            lambda ba, bsx, scx: _render_frame_impl(
                cfg, RANGE, st.background, st.bass_idx, st.bass_cov,
                st.text_premul, st.text_a,
                ba, bsx, scx, 1.0,
            )
        ))
        text = fn.lower(bb_s, bs_s, sc_s).compile().as_text().lower()
        for op in (
            "all-reduce", "all-gather", "collective-permute", "all-to-all",
            "reduce-scatter",
        ):
            assert op not in text, f"collective {op} in sharded render"


class TestExactPost:
    """The round-5 exact post-processing: Bevy's mip-chain bloom and SBDT
    tonemap as separable-matmul passes, plus the pitch-name ring."""

    def test_tonemap_matches_independent_sbdt(self):
        from pitchvis_tpu.models.render import _tonemap

        rng = np.random.default_rng(3)
        img = (rng.uniform(0.0, 4.0, (16, 16, 3))).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(_tonemap(jnp.asarray(img))), _sbdt_np(img),
            rtol=1e-5, atol=1e-6,
        )

    def test_downsample_preserves_dc(self):
        """The 13-tap filter's weights sum to 1; away from edges a constant
        image passes through every pyramid level unchanged (the separable
        inner+outer decomposition must preserve that)."""
        from pitchvis_tpu.models.render import _apply_pair, _bloom_ops

        down, up = _bloom_ops(160, 96)
        level = jnp.ones((96, 160, 3), jnp.float32)
        for inner, outer in down:
            level = _apply_pair(level, inner) + _apply_pair(level, outer)
            np.testing.assert_allclose(np.asarray(level), 1.0, atol=1e-5)
        for pair in up:
            level = _apply_pair(level, pair)
            np.testing.assert_allclose(np.asarray(level), 1.0, atol=1e-5)

    def test_mip_sizes_follow_bevy_sizing(self):
        from pitchvis_tpu.models.render import _bloom_mip_sizes

        sizes = _bloom_mip_sizes(640, 360)
        assert sizes[0] == (910, 512)  # height capped at MAX_MIP_DIMENSION
        assert len(sizes) == 8
        assert sizes[-1] == (7, 4)

    def test_blend_factor_curve(self):
        """curvature=1.0 specialization: weight `intensity` at mip 0,
        (intensity+1)*high_pass below (see _bloom_blend_factor docstring)."""
        from pitchvis_tpu.models.render import _bloom_blend_factor

        assert _bloom_blend_factor(0.0, 0.0, 7.0) == 0.0
        assert _bloom_blend_factor(0.5, 0.0, 7.0) == 0.5
        assert _bloom_blend_factor(0.0, 1.0, 7.0) == 1.0
        hp7 = 1.0 - min(max((1.0 - 0.52) / 0.52, 0.0), 1.0)
        np.testing.assert_allclose(_bloom_blend_factor(0.3, 7.0, 7.0), 1.3 * hp7)

    def test_soft_threshold_curve(self):
        """The prefilter: zero until threshold-knee, quadratic knee, then
        linear (the published soft_threshold with precomputations)."""
        from pitchvis_tpu.models.render import _bloom

        dark = np.full((36, 64, 3), 0.01, np.float32)
        out = np.asarray(_bloom(jnp.asarray(dark), jnp.float32(1.0), 64, 36))
        # 0.01 < threshold-knee=0.0306: brightpass is 0 -> bloom adds ~0
        np.testing.assert_allclose(out, dark, atol=1e-4)
        bright = np.full((36, 64, 3), 2.0, np.float32)
        out_b = np.asarray(_bloom(jnp.asarray(bright), jnp.float32(1.0), 64, 36))
        assert (out_b > bright + 0.5).all()  # strong additive bloom

    def test_pitch_names_drawn_and_mode_gated(self):
        full = RenderConfig.for_mode("full", width=320, height=184)
        zen = RenderConfig.for_mode("zen", width=320, height=184)
        perf = RenderConfig.for_mode("performance", width=320, height=184)
        assert full.with_pitch_names and perf.with_pitch_names
        assert not zen.with_pitch_names
        balls, _ = _scene([])
        big_rng = VqtRange(min_freq=55.0, octaves=7, buckets_per_octave=84)
        f_full = np.asarray(render_frame(full, big_rng, balls, None, 0.0, 1.0))
        f_zen = np.asarray(render_frame(zen, big_rng, balls, None, 0.0, 1.0))
        assert (f_full != f_zen).any()  # glyph pixels present
        st = make_scene(full, big_rng)
        assert st.text_premul is not None
        assert float(np.asarray(st.text_a).max()) > 0.5  # solid glyph cores


class TestDebugOverlay:
    """Debugging display mode panels (update.rs:474-1144) rasterized."""

    def _dbg(self, n=RANGE.n_buckets, chroma=None, graph=0.0, tex_rgba=None):
        from pitchvis_tpu.models.render import DebugInputs

        xv = np.zeros(n, np.float32)
        xv[10:20] = 15.0
        tex = np.zeros((200, n, 4), np.uint8)
        if tex_rgba is not None:
            tex[:] = tex_rgba
        return DebugInputs(
            x_vqt_smoothed=jnp.asarray(xv),
            peaks=jnp.zeros(n, bool).at[15].set(True),
            peak_center=jnp.zeros(n).at[15].set(15.2),
            peak_size=jnp.zeros(n).at[15].set(15.0),
            calmness=jnp.linspace(0.0, 1.0, n),
            graph_values=jnp.full(300, graph, jnp.float32),
            spectrogram=jnp.asarray(tex),
            spectrogram_write_index=jnp.asarray(100, jnp.int32),
            chroma=jnp.asarray(chroma if chroma is not None
                               else np.zeros(12, np.float32)),
        )

    def test_plain_regions_unchanged_without_debug(self):
        balls, bass = _scene([(30, 30.0, 25.0)])
        cfg = RenderConfig(width=320, height=180, with_bloom=False)
        plain = np.asarray(render_frame(cfg, RANGE, balls, bass, 0.5, 1.0))
        dbg = np.asarray(render_frame(cfg, RANGE, balls, bass, 0.5, 1.0,
                                      debug=self._dbg()))
        assert (plain != dbg).any()  # overlays drew something
        # a corner away from every panel is identical
        np.testing.assert_array_equal(plain[170:, :40], dbg[170:, :40])

    def test_chroma_box_alpha(self):
        """update.rs:1133-1144: box alpha = normalized chroma strength."""
        balls, bass = _scene([])
        cfg = RenderConfig(width=640, height=360, with_bloom=False)
        chroma = np.zeros(12, np.float32)
        chroma[0] = 1.0
        img = np.asarray(render_frame(cfg, RANGE, balls, bass, 0.0, 1.0,
                                      debug=self._dbg(chroma=chroma)))
        off = np.asarray(render_frame(cfg, RANGE, balls, bass, 0.0, 1.0,
                                      debug=self._dbg()))
        u = cfg.height / 720.0
        r0 = int(cfg.height - 30 * u)
        c0 = int((400 + 20) * u)
        c1 = int((400 + 45 * 1 + 20) * u)
        assert (img[r0, c0] != off[r0, c0]).any()  # class 0 box lit
        np.testing.assert_array_equal(img[r0, c1], off[r0, c1])  # class 1 off
        # box 0 shows COLORS[0] at full alpha (blended in sRGB space)
        from pitchvis_tpu.ops.colors import COLORS

        expected = np.clip(np.round(np.asarray(COLORS[0]) * 255.0), 0, 255)
        np.testing.assert_allclose(img[r0, c0], expected, atol=1.0)

    def test_scene_calmness_graph_line(self):
        """update.rs:640-744: 300-point line at (-5,-6.5), threshold color."""
        balls, bass = _scene([])
        cfg = RenderConfig(width=640, height=360, with_bloom=False)
        img = np.asarray(render_frame(cfg, RANGE, balls, bass, 0.0, 1.0,
                                      debug=self._dbg(graph=0.1)))
        s = cfg.pixel_size
        # a point on the flat line: x=-5, y=-6.5+0.1
        pi = int(round(-5.0 / s + (cfg.width - 1) / 2.0))
        pj = int(round((cfg.height - 1) / 2.0 - (-6.5 + 0.1) / s))
        px = img[pj, pi].astype(np.int32)
        assert px[0] > px[1] and px[0] > px[2]  # red (calmness < 0.3)

    def test_spectrogram_blit_region(self):
        """setup.rs:493-515: quad at (-7,6), 12 world units of frequency."""
        balls, bass = _scene([])
        cfg = RenderConfig(width=640, height=360, with_bloom=False)
        img = np.asarray(render_frame(
            cfg, RANGE, balls, bass, 0.0, 1.0,
            debug=self._dbg(tex_rgba=(200, 30, 30, 255)),
        ))
        off = np.asarray(render_frame(cfg, RANGE, balls, bass, 0.0, 1.0,
                                      debug=self._dbg()))
        s = cfg.pixel_size
        pi = int(round(-7.0 / s + (cfg.width - 1) / 2.0))
        pj = int(round((cfg.height - 1) / 2.0 - 3.0 / s))  # inside the quad
        assert img[pj, pi, 0] > img[pj, pi, 1] + 50  # red texture shows
        assert (off[pj, pi] != img[pj, pi]).any()

    def test_spectrum_peak_circle(self):
        """update.rs:582-616: a disk at (center*0.011, size/10) in the
        spectrum panel."""
        from pitchvis_tpu.models.render import _spectrum_panel_origin

        balls, bass = _scene([])
        cfg = RenderConfig(width=640, height=360, with_bloom=False)
        d = self._dbg()
        img = np.asarray(render_frame(cfg, RANGE, balls, bass, 0.0, 1.0,
                                      debug=d))
        plain = np.asarray(render_frame(cfg, RANGE, balls, bass, 0.0, 1.0))
        x0, y0 = _spectrum_panel_origin(cfg, RANGE)
        cx, cy = x0 + 15.2 * 0.011, y0 + 1.5
        s = cfg.pixel_size
        pi = int(round(cx / s + (cfg.width - 1) / 2.0))
        pj = int(round((cfg.height - 1) / 2.0 - cy / s))
        assert (img[pj, pi] != plain[pj, pi]).any()

    def test_batched_debug_render(self):
        import jax

        balls, bass = _scene([(30, 30.0, 25.0)])
        cfg = RenderConfig(width=160, height=96, ball_patch=32)
        bb = jax.tree.map(lambda x: jnp.stack([x, x]), balls)
        bs = jax.tree.map(lambda x: jnp.stack([x, x]), bass)
        d = self._dbg()
        dd = jax.tree.map(lambda x: jnp.stack([x, x]), d)
        out = render_batch(cfg, RANGE, bb, bs, jnp.asarray([0.2, 0.8]), 1.0,
                           debug=dd)
        assert out.shape == (2, 96, 160, 3)
        single = np.asarray(render_frame(cfg, RANGE, balls, bass, 0.2, 1.0,
                                         debug=d))
        np.testing.assert_array_equal(np.asarray(out[0]), single)
