"""Golden-file regression: every compute path vs stored f64-oracle spectra,
at the reduced config AND at full default parameters (588 bins, n_fft 32768),
plus a streaming golden (ring+AGC+VQT over a fixed signal)."""

import os

import numpy as np
import pytest

from pitchvis_tpu.io.golden import GOLDEN_PARAMS, load
from pitchvis_tpu.kernel.builder import get_kernel
from pitchvis_tpu.ops.vqt import Vqt
from pitchvis_tpu.ops.vqt_pallas import PallasVqtArrays, vqt_db_pallas

_DIR = os.path.join(os.path.dirname(__file__), "golden")
GOLDEN_PATH = os.path.join(_DIR, "vqt_golden.npz")
GOLDEN_DEFAULT_PATH = os.path.join(_DIR, "vqt_golden_default.npz")
STREAMING_GOLDEN_PATH = os.path.join(_DIR, "streaming_golden.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN_PATH), reason="golden files not generated"
)


@pytest.fixture(scope="module")
def goldens():
    return load(GOLDEN_PATH)


@pytest.fixture(scope="module")
def golden_kernel():
    return get_kernel(GOLDEN_PARAMS)


class TestGoldenRegression:
    @pytest.mark.parametrize("path", ["time", "freq"])
    def test_jax_paths(self, goldens, path):
        vqt = Vqt(GOLDEN_PARAMS, path=path)
        names = sorted(goldens)
        x = np.stack([goldens[n][0] for n in names])
        want = np.stack([goldens[n][1] for n in names])
        got = np.asarray(vqt.calculate_vqt_batch_in_db(x))
        err = np.abs(got - want).max()
        assert err < 5e-4, f"max dB error {err} vs goldens"

    def test_pallas_path(self, goldens, golden_kernel):
        pa = PallasVqtArrays.from_kernel(golden_kernel)
        names = sorted(goldens)
        x = np.stack([goldens[n][0] for n in names])
        want = np.stack([goldens[n][1] for n in names])
        got = np.asarray(vqt_db_pallas(pa, x, batch_tile=4))
        assert np.abs(got - want).max() < 2e-2

    def test_oracle_reproducible(self, goldens, golden_kernel):
        """The oracle itself regenerates the stored goldens bit-for-bit."""
        from pitchvis_tpu.ops.vqt_ref import vqt_frame_db_np

        name = "chord_a_major"
        x, want = goldens[name]
        np.testing.assert_array_equal(vqt_frame_db_np(golden_kernel, x), want)


@pytest.mark.skipif(
    not os.path.exists(GOLDEN_DEFAULT_PATH), reason="default goldens not generated"
)
class TestLoadFormatGuard:
    def test_load_rejects_non_frame_goldens(self, tmp_path):
        """load() reads only generate()'s in_/out_ frame pairs; handing it
        the chain or streaming golden must raise a clear error instead of
        KeyError / silently returning {} (round-4 review finding)."""
        import numpy as np
        import pytest

        chain_like = tmp_path / "chain.npz"
        np.savez(chain_like, in_sine=np.zeros(8), sine_peaks=np.zeros((4, 2)))
        with pytest.raises(ValueError, match="in_/out_"):
            load(str(chain_like))
        streaming_like = tmp_path / "streaming.npz"
        np.savez(streaming_like, spectra=np.zeros((4, 8)))
        with pytest.raises(ValueError, match="in_/out_"):
            load(str(streaming_like))


class TestGoldenDefaultParams:
    """Round-1 verdict item 3a: the same golden regression at FULL default
    parameters — a default-config regression in filter placement or dB
    semantics fails here even if the reduced config stays intact."""

    @pytest.fixture(scope="class")
    def goldens_default(self):
        return load(GOLDEN_DEFAULT_PATH)

    @pytest.mark.parametrize("path", ["time", "freq"])
    def test_jax_paths(self, goldens_default, default_params, path):
        vqt = Vqt(default_params, path=path)
        names = sorted(goldens_default)
        x = np.stack([goldens_default[n][0] for n in names])
        want = np.stack([goldens_default[n][1] for n in names])
        got = np.asarray(vqt.calculate_vqt_batch_in_db(x))
        err = np.abs(got - want).max()
        assert err < 5e-4, f"max dB error {err} vs default-param goldens"

    def test_pallas_path(self, goldens_default, default_params, default_kernel):
        pa = PallasVqtArrays.from_kernel(default_kernel)
        names = sorted(goldens_default)
        x = np.stack([goldens_default[n][0] for n in names])
        want = np.stack([goldens_default[n][1] for n in names])
        got = np.asarray(vqt_db_pallas(pa, x, batch_tile=4))
        assert np.abs(got - want).max() < 2e-2

    def test_oracle_reproducible(self, goldens_default, default_kernel):
        from pitchvis_tpu.ops.vqt_ref import vqt_frame_db_np

        x, want = goldens_default["detuned_pair"]
        np.testing.assert_array_equal(vqt_frame_db_np(default_kernel, x), want)


@pytest.mark.skipif(
    not os.path.exists(STREAMING_GOLDEN_PATH), reason="streaming golden not generated"
)
class TestStreamingGolden:
    """Round-1 verdict item 3c: a fixed signal through the STATEFUL serving
    path (ring buffer + dagc AGC + VQT) at 60 Hz hops, every hop's spectrum
    pinned. Catches regressions in ring indexing, AGC recurrence/freeze
    semantics, and dB conversion that single-frame goldens cannot see."""

    def test_replay_matches_stored(self, default_params):
        from pitchvis_tpu.models.pipeline import StreamingPipeline

        with np.load(STREAMING_GOLDEN_PATH) as z:
            sig = z["signal"]
            hop = int(z["hop"])
            want_spectra = z["spectra"]
            want_gains = z["gains"]

        pipe = StreamingPipeline(1, default_params)
        n_hops = len(sig) // hop
        assert n_hops == want_spectra.shape[0]
        got_spectra = []
        got_gains = []
        for i in range(n_hops):
            out = pipe.step(sig[None, i * hop : (i + 1) * hop], hop / default_params.sr)
            got_spectra.append(np.asarray(out.x_vqt[0]))
            got_gains.append(float(np.asarray(out.gain[0])))
        np.testing.assert_allclose(np.stack(got_spectra), want_spectra, atol=1e-3)
        np.testing.assert_allclose(np.asarray(got_gains), want_gains, rtol=1e-4)
