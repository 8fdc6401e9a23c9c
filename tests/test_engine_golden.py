"""Committed golden render for the SoundFont engine (round-2 verdict item 8).

The scenario (font waveform, SF2 bytes, MIDI, reverb+chorus settings) is
fully code-defined in tests/golden_synth.py; the committed
``tests/golden/synth_golden.npz`` pins the NumPy reference engine's stereo
output. Any unintended change anywhere in the render chain — SF2
writer/parser, region lookup, envelopes, LFOs, biquad, pan, effects sends,
block sequencer — shows up as a golden mismatch. The native C++ engine is
held to the same golden within the documented deviation budget (its
oscillator positions are f64 like the NumPy engine, but single-block f32
accumulation orders differ; see native/synth_engine.cpp header).

Regenerate (ONLY after an intentional, reviewed behavior change):
``python -m tests.golden_synth``.
"""

import numpy as np
import pytest

from tests.golden_synth import GOLDEN_PATH, SR, build_font, build_midi, render_numpy


@pytest.fixture(scope="module")
def golden():
    with np.load(GOLDEN_PATH) as z:
        return z["left"].copy(), z["right"].copy()


class TestSynthGolden:
    def test_numpy_engine_matches_golden(self, golden):
        left, right = render_numpy()
        gl, gr = golden
        assert left.shape == gl.shape
        # same engine that generated it: tolerance only for libm/BLAS
        # differences across environments
        np.testing.assert_allclose(left, gl, atol=1e-6)
        np.testing.assert_allclose(right, gr, atol=1e-6)
        assert np.abs(gl).max() > 0.01  # the golden actually sounds

    def test_native_engine_matches_golden(self, golden, tmp_path):
        native = pytest.importorskip("pitchvis_tpu.runtime.native")
        if not native.available():
            pytest.skip("native library not built")
        from pitchvis_tpu.synth.engine_native import NativeSequencer, NativeSynthesizer

        ns = NativeSynthesizer(
            build_font(str(tmp_path)), SR, enable_reverb_and_chorus=True
        )
        nq = NativeSequencer(ns)
        nq.play(build_midi(str(tmp_path)))
        gl, gr = golden
        left = np.zeros(len(gl), np.float32)
        right = np.zeros(len(gr), np.float32)
        nq.render(left, right)
        # f32 accumulation-order budget (same as test_engine.py's
        # native-vs-NumPy contract)
        assert np.abs(left - gl).max() < 1e-4
        assert np.abs(right - gr).max() < 1e-4
