"""Golden-file regression: every compute path vs stored f64-oracle spectra."""

import os

import numpy as np
import pytest

from pitchvis_tpu.io.golden import GOLDEN_PARAMS, load
from pitchvis_tpu.kernel.builder import get_kernel
from pitchvis_tpu.ops.vqt import Vqt
from pitchvis_tpu.ops.vqt_pallas import PallasVqtArrays, vqt_db_pallas

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "vqt_golden.npz")

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
