"""bf16 fast-mode error budget (ROADMAP item 2 / VERDICT round-1 item 9).

The fast mode stores the VQT kernel weights in bfloat16 and runs each
window-group matmul as a single MXU pass with f32 accumulation
(ops/vqt.py). Everything downstream of |y|^2 — dB conversion, EMA
smoothing, peaks, calmness, tuning — stays f32. These tests pin the
per-stage error budget at DEFAULT parameters (588 bins, n_fft 32768):

  stage 1 (VQT dB spectra):   max <= 0.15 dB, mean <= 0.02 dB
  stage 2 (analysis smoothed): max <= 0.15 dB (EMA cannot amplify)
  stage 3 (peak sets):        identical on musical signals
  stage 4 (continuous peaks): center within 0.02 bins, size within 0.2 dB

The reference has no reduced-precision mode (f32 throughout,
vqt.rs:866-916); this is a TPU-native extension that roughly doubles
VQT throughput per chip (see bench --config offline_vqt_bf16).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pitchvis_tpu.ops.vqt import Vqt
from pitchvis_tpu.utils.signal import create_sines_batch

# A small set of musical test signals: single tones across the range,
# a triad, and a dense cluster (worst case for cancellation error).
CHORDS = [
    [110.0],
    [440.0],
    [1760.0],
    [220.0, 277.18, 329.63],  # A3 major triad
    [440.0, 493.88, 523.25, 587.33],  # dense cluster
]


@pytest.fixture(scope="module")
def spectra_pair(default_params):
    x = create_sines_batch(default_params, CHORDS)
    db_f32 = np.asarray(Vqt(default_params).calculate_vqt_batch_in_db(x))
    db_bf16 = np.asarray(Vqt(default_params, fast=True).calculate_vqt_batch_in_db(x))
    return db_f32, db_bf16


class TestVqtStage:
    def test_db_error_budget_tones(self, spectra_pair):
        db_f32, db_bf16 = spectra_pair
        err = np.abs(db_f32 - db_bf16)
        assert err.max() <= 0.15, f"max dB error {err.max():.4f}"
        assert err.mean() <= 0.02, f"mean dB error {err.mean():.4f}"

    def test_db_error_budget_noise(self, default_params):
        rng = np.random.default_rng(0)
        x = (rng.standard_normal((4, default_params.n_fft)) * 0.1).astype(np.float32)
        db_f32 = np.asarray(Vqt(default_params).calculate_vqt_batch_in_db(x))
        db_bf16 = np.asarray(Vqt(default_params, fast=True).calculate_vqt_batch_in_db(x))
        err = np.abs(db_f32 - db_bf16)
        assert err.max() <= 0.3, f"max dB error on noise {err.max():.4f}"
        assert err.mean() <= 0.05, f"mean dB error on noise {err.mean():.4f}"

    def test_fast_pallas_matches_fast_time(self, default_params):
        """The bf16 Pallas kernel (halved weight DMA + single-pass MXU) obeys
        the same budget vs the f32 reference as the dense bf16 time path."""
        x = create_sines_batch(default_params, CHORDS[:2])
        db_f32 = np.asarray(Vqt(default_params).calculate_vqt_batch_in_db(x))
        db_pl = np.asarray(
            Vqt(default_params, path="pallas", fast=True).calculate_vqt_batch_in_db(x)
        )
        err = np.abs(db_f32 - db_pl)
        assert err.max() <= 0.15, f"pallas bf16 max dB error {err.max():.4f}"


class TestFastModePrecisionPairing:
    def test_vqt_fast_defaults_to_one_pass(self, small_params):
        """Vqt(fast=True) must pair bf16 weights with DEFAULT precision (one
        MXU pass — the point of fast mode); HIGHEST would silently run the
        6-pass decomposition fast mode exists to avoid. f32 stays HIGHEST,
        and an explicit argument always wins."""
        import jax

        from pitchvis_tpu.ops.vqt import Vqt

        assert Vqt(small_params, fast=True).precision == jax.lax.Precision.DEFAULT
        assert Vqt(small_params).precision == jax.lax.Precision.HIGHEST
        v = Vqt(small_params, fast=True, precision=jax.lax.Precision.HIGHEST)
        assert v.precision == jax.lax.Precision.HIGHEST

    def test_pallas_rejects_explicit_precision(self, small_params):
        """The fused kernel derives precision from the weight dtype; an
        explicit argument it would silently ignore must raise instead
        (round-4 review finding). Shared jits also serve every instance."""
        import pytest

        from pitchvis_tpu.ops.vqt import Vqt
        import jax

        with pytest.raises(ValueError, match="pallas"):
            Vqt(small_params, path="pallas", precision=jax.lax.Precision.HIGHEST)
        a = Vqt(small_params, path="pallas")
        b = Vqt(small_params, path="pallas")
        assert a._db_batch is b._db_batch  # one compile cache, no retrace


class TestAnalysisStages:
    """Feed both spectra through the identical f32 analysis step and compare
    the downstream quantities — the bf16 perturbation must stay below every
    behavioral threshold."""

    @pytest.fixture(scope="class")
    def analysis_pair(self, default_params, spectra_pair):
        from pitchvis_tpu.core.config import AnalysisParameters
        from pitchvis_tpu.models.analysis import analysis_step, init_state_batch

        db_f32, db_bf16 = spectra_pair
        ap = AnalysisParameters()
        outs = []
        for db in (db_f32, db_bf16):
            state = init_state_batch(db.shape[0], default_params.n_buckets)
            step = jax.jit(
                jax.vmap(
                    lambda s, x: analysis_step(
                        ap, default_params.range, s, x, 1.0 / 60.0
                    )
                )
            )
            # several hops of the same frame: exercises the EMA carries
            for _ in range(5):
                state, out = step(state, jnp.asarray(db))
            outs.append(jax.tree.map(np.asarray, out))
        return outs

    def test_smoothed_spectra_budget(self, analysis_pair):
        a, b = analysis_pair
        err = np.abs(a.x_vqt_smoothed - b.x_vqt_smoothed)
        assert err.max() <= 0.15, f"smoothed max dB error {err.max():.4f}"

    def test_peak_sets_identical(self, analysis_pair):
        a, b = analysis_pair
        np.testing.assert_array_equal(a.peaks, b.peaks)

    def test_continuous_peaks_budget(self, analysis_pair):
        a, b = analysis_pair
        on = a.peaks
        if on.any():
            d_center = np.abs(a.peak_center - b.peak_center)[on]
            d_size = np.abs(a.peak_size - b.peak_size)[on]
            assert d_center.max() <= 0.02, f"center drift {d_center.max():.4f} bins"
            assert d_size.max() <= 0.2, f"size drift {d_size.max():.4f} dB"

    def test_scene_scalars_budget(self, analysis_pair):
        a, b = analysis_pair
        assert np.abs(a.scene_calmness - b.scene_calmness).max() <= 0.01
        assert np.abs(a.tuning_inaccuracy - b.tuning_inaccuracy).max() <= 0.5  # cents


class TestPipelineFastMode:
    def test_streaming_pipeline_fast(self, small_params):
        """fast=True end to end through the serving step: same peak set as
        the f32 pipeline on a musical chunk stream."""
        from pitchvis_tpu.models.pipeline import StreamingPipeline
        from pitchvis_tpu.utils.signal import create_sines

        hop = 368
        tone = create_sines(small_params, [220.0, 330.0])
        plain = StreamingPipeline(1, small_params)
        fast = StreamingPipeline(1, small_params, fast=True)
        for i in range(4):
            chunk = tone[None, i * hop : (i + 1) * hop]
            out_p = plain.step(chunk, hop / small_params.sr)
            out_f = fast.step(chunk, hop / small_params.sr)
        np.testing.assert_array_equal(
            np.asarray(out_p.analysis.peaks), np.asarray(out_f.analysis.peaks)
        )
        err = np.abs(np.asarray(out_p.x_vqt) - np.asarray(out_f.x_vqt))
        assert err.max() <= 0.3, f"pipeline dB error {err.max():.4f}"

    def test_vqt_db_auto_precision_inference(self, small_params, small_kernel):
        """vqt_db_auto (the serving dispatch) must pair bf16 weights with the
        one-pass DEFAULT MXU precision and f32 weights with exact HIGHEST —
        i.e. agree bitwise with the explicitly-configured Vqt entry points."""
        import jax
        import jax.numpy as jnp

        from pitchvis_tpu.ops.vqt import VqtArrays, make_vqt_arrays, vqt_db_auto, vqt_db_batch
        from pitchvis_tpu.utils.signal import create_sines_batch

        x = create_sines_batch(small_params, [[220.0, 440.0], [330.0]])
        for fast in (False, True):
            arrays = make_vqt_arrays(small_kernel, path="time", fast=fast)
            assert isinstance(arrays, VqtArrays)
            want = vqt_db_batch(
                arrays,
                x,
                path="time",
                precision=(
                    jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
                ),
            )
            got = vqt_db_auto(arrays, x, path="time")
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
