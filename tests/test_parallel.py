"""Multi-chip sharding tests on the 8-device virtual CPU mesh (conftest sets
--xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pitchvis_tpu.parallel.sharding import make_mesh, replicate, shard_batch, stream_sharding

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices"
)


class TestSharding:
    def test_mesh_and_placement(self):
        mesh = make_mesh(4)
        x = shard_batch(mesh, np.zeros((8, 16), np.float32))
        assert x.sharding.is_equivalent_to(stream_sharding(mesh), ndim=2)
        assert len(x.sharding.device_set) == 4

    def test_replicate(self):
        mesh = make_mesh(4)
        tree = {"w": np.ones((3, 3), np.float32)}
        rep = replicate(mesh, tree)
        assert len(rep["w"].sharding.device_set) == 4

    def test_sharded_vqt_matches_single_device(self, small_params, small_kernel):
        from pitchvis_tpu.ops.vqt import VqtArrays, vqt_db_batch
        from pitchvis_tpu.utils.signal import create_sines_batch

        mesh = make_mesh(8)
        arrays = VqtArrays.from_kernel(small_kernel)
        x = create_sines_batch(
            small_params, [[110.0 * 2 ** (i / 8)] for i in range(8)]
        )
        ref = np.asarray(vqt_db_batch(arrays, jnp.asarray(x)))

        arrays_r = replicate(mesh, arrays)
        xs = shard_batch(mesh, x)
        out = jax.jit(lambda a, v: vqt_db_batch(a, v))(arrays_r, xs)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
        assert len(out.sharding.device_set) == 8

    def test_sharded_pipeline_step(self, small_params):
        """Full pipeline (ring+AGC+VQT+analysis) with the stream axis sharded
        over the mesh: one jitted step, outputs stay sharded."""
        from pitchvis_tpu.models.pipeline import init_pipeline_state, pipeline_step
        from pitchvis_tpu.ops.vqt import VqtArrays

        mesh = make_mesh(8)
        batch = 16
        arrays = replicate(mesh, VqtArrays.from_kernel(
            __import__("pitchvis_tpu.kernel.builder", fromlist=["get_kernel"]).get_kernel(small_params)
        ))
        state = jax.tree.map(
            lambda a: shard_batch(mesh, np.asarray(a)),
            init_pipeline_state(batch, small_params),
        )
        chunk = shard_batch(mesh, np.full((batch, 368), 0.01, np.float32))
        state, out = pipeline_step(arrays, state, chunk, 1.0 / 60.0, vqt_params=small_params)
        assert out.x_vqt.shape == (batch, small_params.n_buckets)
        assert np.all(np.isfinite(np.asarray(out.x_vqt)))
        assert len(out.x_vqt.sharding.device_set) == 8

    def test_graft_dryrun(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(4)


class TestMultihost:
    def test_single_host_degenerates(self):
        from pitchvis_tpu.parallel.sharding import make_multihost_mesh, multihost_stream_sharding

        mesh = make_multihost_mesh()
        assert mesh.devices.shape[0] == 1  # one host here
        assert mesh.axis_names == ("hosts", "dp")
        sh = multihost_stream_sharding(mesh)
        x = jax.device_put(np.zeros((16, 8), np.float32), sh)
        assert len(x.sharding.device_set) == len(jax.devices())
