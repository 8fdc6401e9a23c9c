"""Pixel-level rasterizer regression against the committed golden frames.

The chain golden pins the analysis+LED contract and the viewer golden pins
the display math (ball transforms, spiral, overlays) that feeds the
rasterizer; this golden pins the raster itself — the exact uint8 sRGB
frames models/render.py produces for a fixed scene, plain and with the
Debugging overlay panels. Regenerate (after an INTENDED visual change)
with `python -m pitchvis_tpu.io.golden tests/golden render`.
"""

import os

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "render_golden.npz")


class TestRenderGolden:
    def _frames(self):
        from pitchvis_tpu.io.golden import render_scene_inputs
        from pitchvis_tpu.models.render import render_frame

        cfg, rng_cfg, balls, bass, debug, sc, t = render_scene_inputs()
        plain = np.asarray(render_frame(cfg, rng_cfg, balls, bass, sc, t))
        overlay = np.asarray(
            render_frame(cfg, rng_cfg, balls, bass, sc, t, debug=debug)
        )
        return plain, overlay

    def test_frames_match_golden(self):
        plain, overlay = self._frames()
        with np.load(GOLDEN) as z:
            g_plain, g_overlay = z["plain"], z["overlay"]
        assert plain.shape == g_plain.shape and plain.dtype == np.uint8
        assert overlay.shape == g_overlay.shape and overlay.dtype == np.uint8
        # tolerance: one 8-bit step (XLA version-to-version f32 fusion
        # differences land within the final quantization); anything larger
        # is a real visual change
        for got, want, name in ((plain, g_plain, "plain"),
                                (overlay, g_overlay, "overlay")):
            diff = np.abs(got.astype(int) - want.astype(int))
            assert diff.max() <= 1, (
                f"{name}: max pixel diff {diff.max()} at "
                f"{np.unravel_index(diff.argmax(), diff.shape)}"
            )

    def test_golden_is_not_trivial(self):
        """The committed frames actually contain the scene (guards against a
        regenerated-empty golden passing the comparison vacuously)."""
        with np.load(GOLDEN) as z:
            plain, overlay = z["plain"], z["overlay"]
        assert plain.std() > 5.0  # balls + net over the clear color
        # the overlay draws panels the plain frame does not have
        assert np.abs(overlay.astype(int) - plain.astype(int)).max() > 20
