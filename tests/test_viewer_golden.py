"""Viewer-derived-outputs golden regression (§2.4 display math).

The committed golden (tests/golden/viewer_golden.npz) pins per-frame
trajectories of every display quantity the reference's update_display pass
derives (pitchvis_viewer/src/display_system/update.rs): ball transforms,
RGBA, scale, visibility and shader params (update.rs:136-334), chroma
(1090-1144), bloom (336-351), the VQT spectrogram row (930-1087), the bass
spiral (353-426) and the calmness histogram (745-869) — over two
deterministic 6 s signals at the serial parameters. The chain golden pins
the analysis+LED contract; this pins the display math on top of it, so a
refactor of models/viewer.py cannot silently shift what a frontend draws.

f32 paths reproduce the golden bitwise on the CPU backend (same compiled
programs as the generator, io/golden.py::generate_viewer); Pallas/f32 in
interpret mode executes the same f32 dots in the same order.
"""

import os

import numpy as np
import pytest

from pitchvis_tpu.core.config import SERIAL_VQT_PARAMETERS
from pitchvis_tpu.io.golden import run_chain

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "viewer_golden.npz")
SIGNALS = ("arpeggio", "chord")

EXACT_KEYS = ("ball_visible", "spectrogram_row", "bass_visible", "led")
FLOAT_KEYS = (
    "ball_position", "ball_rgba", "ball_scale", "ball_calmness",
    "ball_pitch_accuracy", "ball_pitch_deviation", "chroma", "bloom",
    "bass_rgba", "hist_heights", "hist_segment_rgb",
)


@pytest.fixture(scope="module")
def golden():
    with np.load(GOLDEN) as z:
        return {k: z[k] for k in z.files}


def _assert_matches(res, g, name):
    for k in EXACT_KEYS:
        np.testing.assert_array_equal(res[k], g[f"{name}_{k}"], err_msg=k)
    for k in FLOAT_KEYS:
        np.testing.assert_allclose(
            np.nan_to_num(res[k]), np.nan_to_num(g[f"{name}_{k}"]),
            atol=1e-6, err_msg=k,
        )


class TestViewerGolden:
    @pytest.mark.parametrize("name", SIGNALS)
    def test_time_f32_matches(self, golden, name):
        res = run_chain(
            SERIAL_VQT_PARAMETERS, golden[f"in_{name}"], with_viewer=True
        )
        _assert_matches(res, golden, name)

    def test_pallas_f32_matches(self, golden):
        res = run_chain(
            SERIAL_VQT_PARAMETERS, golden["in_arpeggio"], path="pallas",
            with_viewer=True,
        )
        _assert_matches(res, golden, "arpeggio")


class TestGoldenInvariants:
    """Structural invariants of the committed trajectories themselves."""

    def test_bass_spiral_is_prefix(self, golden):
        """Lit bass segments are always a prefix from the spiral base
        (update.rs:353-426 lights segments 0..k up to the lowest peak)."""
        for name in SIGNALS:
            vis = golden[f"{name}_bass_visible"]
            # once a segment is dark, everything above it is dark too
            assert not (np.diff(vis.astype(np.int8), axis=1) > 0).any()

    def test_spectrogram_row_is_rgba8(self, golden):
        row = golden["arpeggio_spectrogram_row"]
        assert row.dtype == np.uint8
        assert row.shape[-1] == 4

    def test_display_motion_is_nontrivial(self, golden):
        """The golden actually exercises the display: balls become visible
        and fade, bloom moves with scene calmness, the bass spiral lights."""
        for name in SIGNALS:
            assert golden[f"{name}_ball_visible"].any()
            assert golden[f"{name}_bass_visible"].any()
            bloom = golden[f"{name}_bloom"]
            assert bloom.max() - bloom.min() > 0.05
