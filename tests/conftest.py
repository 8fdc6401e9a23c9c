"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests (shard_map over a Mesh) run without TPU hardware.
Must run before any jax import."""

import os

# The environment presets JAX_PLATFORMS=axon (the TPU tunnel), so a
# setdefault is not enough — force the CPU platform via jax.config, which
# wins as long as no backend has initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
prev = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from pitchvis_tpu.core.config import VqtParameters, VqtRange  # noqa: E402


# A reduced parameter set for dense sweep tests: same structure (multiple
# window groups), much cheaper than the 588-bin default.
SMALL_PARAMS = VqtParameters(
    sr=22050.0,
    n_fft=8192,
    range=VqtRange(min_freq=110.0, octaves=4, buckets_per_octave=24),
    sparsity_quantile=0.999,
    quality=1.6,
    gamma=4.8 * 1.6,
)


@pytest.fixture(scope="session")
def small_params():
    return SMALL_PARAMS


@pytest.fixture(scope="session")
def default_params():
    return VqtParameters()


@pytest.fixture(scope="session")
def small_kernel(small_params):
    from pitchvis_tpu.kernel.builder import get_kernel

    return get_kernel(small_params)


@pytest.fixture(scope="session")
def default_kernel(default_params):
    from pitchvis_tpu.kernel.builder import get_kernel

    return get_kernel(default_params)


@pytest.fixture(scope="session")
def small_vqt(small_params):
    from pitchvis_tpu.ops.vqt import Vqt

    return Vqt(small_params)


@pytest.fixture(scope="session")
def default_vqt(default_params):
    from pitchvis_tpu.ops.vqt import Vqt

    return Vqt(default_params)


def rng(seed=0):
    return np.random.default_rng(seed)
