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


class TestShardedPallasServing:
    """The flagship serving path (path="pallas", fast=True) over the dp mesh:
    the exact code the headline bench runs, partitioned by the shard_map
    boundary in make_sharded_pipeline_step (GSPMD cannot split a Mosaic
    custom call by itself). Pallas runs in interpret mode on CPU devices."""

    @staticmethod
    def _run(params, batch, hop, mesh_shape=None):
        from pitchvis_tpu.kernel.builder import get_kernel
        from pitchvis_tpu.models.pipeline import init_pipeline_state, pipeline_step
        from pitchvis_tpu.ops.vqt import make_vqt_arrays
        from pitchvis_tpu.parallel.sharding import make_sharded_pipeline_step

        kernel = get_kernel(params)
        arrays = make_vqt_arrays(kernel, path="pallas", fast=True)
        state0 = init_pipeline_state(batch, params)
        chunk = (
            np.random.default_rng(7).standard_normal((batch, hop)).astype(np.float32)
            * 0.05
        )

        ref_state, ref_out = pipeline_step(
            arrays, state0, jnp.asarray(chunk), 1.0 / 60.0,
            vqt_params=params, path="pallas",
        )

        mesh = make_mesh(8)
        step = make_sharded_pipeline_step(mesh, vqt_params=params, path="pallas")
        arrays_r = replicate(mesh, arrays)
        state_s = jax.tree.map(lambda a: shard_batch(mesh, np.asarray(a)), state0)
        chunk_s = shard_batch(mesh, chunk)
        out_state, out = step(arrays_r, state_s, chunk_s, jnp.float32(1.0 / 60.0))
        return mesh, step, (arrays_r, state_s, chunk_s), ref_out, out

    def test_sharded_matches_single_device(self, small_params):
        _, _, _, ref_out, out = self._run(small_params, batch=16, hop=368)
        # bf16 fast mode: the kernel is bitwise-deterministic, so sharded and
        # single-device runs execute the SAME per-stream program — tolerance
        # only covers dB-domain accumulation-order neutrality (none expected)
        np.testing.assert_allclose(
            np.asarray(out.x_vqt), np.asarray(ref_out.x_vqt), atol=2e-2
        )
        np.testing.assert_allclose(
            np.asarray(out.analysis.peak_size),
            np.asarray(ref_out.analysis.peak_size),
            atol=2e-2,
        )
        assert len(out.x_vqt.sharding.device_set) == 8

    def test_collective_free_hlo(self, small_params):
        mesh, step, args, _, _ = self._run(small_params, batch=16, hop=368)
        text = step.lower(*args, jnp.float32(1.0 / 60.0)).compile().as_text()
        for op in (
            "all-reduce", "all-gather", "collective-permute", "all-to-all",
            "reduce-scatter",
        ):
            assert op not in text, f"collective {op} in sharded pallas serving"

    def test_per_stream_dt_shards_with_batch(self, small_params):
        """pipeline_step documents dt as 'scalar or (B,)'; the sharded step
        must shard a (B,) dt with the stream axis (a replicated spec hands
        each shard the full-length vector and fails the broadcast)."""
        import jax.numpy as jnp

        from pitchvis_tpu.kernel.builder import get_kernel
        from pitchvis_tpu.models.pipeline import init_pipeline_state, pipeline_step
        from pitchvis_tpu.ops.vqt import make_vqt_arrays
        from pitchvis_tpu.parallel.sharding import (
            make_mesh, make_sharded_pipeline_step, replicate, shard_batch,
        )

        batch, hop = 16, 368
        kernel = get_kernel(small_params)
        arrays = make_vqt_arrays(kernel, path="pallas", fast=True)
        state0 = init_pipeline_state(batch, small_params)
        rng = np.random.default_rng(3)
        chunk = (rng.standard_normal((batch, hop)) * 0.05).astype(np.float32)
        dt_b = rng.uniform(1 / 70, 1 / 50, batch).astype(np.float32)

        _, ref = pipeline_step(
            arrays, state0, jnp.asarray(chunk), jnp.asarray(dt_b),
            vqt_params=small_params, path="pallas",
        )
        mesh = make_mesh(8)
        step = make_sharded_pipeline_step(
            mesh, vqt_params=small_params, path="pallas"
        )
        _, out = step(
            replicate(mesh, arrays),
            jax.tree.map(lambda a: shard_batch(mesh, np.asarray(a)), state0),
            shard_batch(mesh, chunk),
            shard_batch(mesh, dt_b),
        )
        np.testing.assert_allclose(
            np.asarray(out.analysis.x_vqt_smoothed),
            np.asarray(ref.analysis.x_vqt_smoothed),
            atol=2e-2,
        )

    def test_default_parameter_shapes(self, default_params):
        """One case at the DEFAULT config (n_fft=32768, 588 bins) — the same
        shapes the real-chip headline bench serves."""
        _, _, _, ref_out, out = self._run(default_params, batch=8, hop=368)
        assert out.x_vqt.shape == (8, default_params.n_buckets)
        np.testing.assert_allclose(
            np.asarray(out.x_vqt), np.asarray(ref_out.x_vqt), atol=2e-2
        )
        assert np.all(np.isfinite(np.asarray(out.x_vqt)))


class TestMultihost:
    def test_single_host_degenerates(self):
        from pitchvis_tpu.parallel.sharding import make_multihost_mesh, multihost_stream_sharding

        mesh = make_multihost_mesh()
        assert mesh.devices.shape[0] == 1  # one host here
        assert mesh.axis_names == ("hosts", "dp")
        sh = multihost_stream_sharding(mesh)
        x = jax.device_put(np.zeros((16, 8), np.float32), sh)
        assert len(x.sharding.device_set) == len(jax.devices())


class TestShardedStreamServer:
    """StreamServer(mesh=...): one ingest server drives every local chip —
    the fused delta program is shard_map-partitioned over the stream axis
    (Pallas kernel included), staying collective-free."""

    def _drive(self, small_params, mesh=None, hops=3):
        from pitchvis_tpu.runtime.server import StreamServer

        B = 8
        f = small_params.range.min_freq * 2.0 ** (30.0 / small_params.range.buckets_per_octave)
        sr = small_params.sr
        hop = int(sr / 60.0)
        srv = StreamServer(
            B, small_params, buffer_seconds=1.0, path="pallas", fast=True,
            mesh=mesh,
        )
        t = np.arange(int(sr * 0.8)) / sr
        for s in range(B):  # distinct tone per stream: cross-slice bleed shows
            tone = (0.1 * np.sin(2 * np.pi * f * (s % 3 + 1) / 2 * t)).astype(np.float32)
            srv.push(s, tone)
        out = None
        phase = len(t) / sr
        for _ in range(hops):
            for s in range(B):
                c = (0.1 * np.sin(
                    2 * np.pi * f * (s % 3 + 1) / 2 * (np.arange(hop) / sr + phase)
                )).astype(np.float32)
                srv.push(s, c)
            phase += hop / sr
            out, gains = srv.step(dt=1.0 / 60.0)
        return srv, out, gains

    def test_sharded_matches_single_server(self, small_params):
        from pitchvis_tpu.parallel.sharding import make_mesh

        mesh = make_mesh(8)
        srv_s, out_s, gains_s = self._drive(small_params, mesh=mesh)
        srv_r, out_r, gains_r = self._drive(small_params, mesh=None)
        try:
            assert len(out_s.x_vqt_smoothed.sharding.device_set) == 8
            np.testing.assert_array_equal(
                np.asarray(out_s.peaks), np.asarray(out_r.peaks)
            )
            # per-device batch tiling changes the Pallas kernel's padded
            # shapes -> last-ulp accumulation differences, same budget as
            # TestShardedPallasServing
            np.testing.assert_allclose(
                np.asarray(out_s.x_vqt_smoothed),
                np.asarray(out_r.x_vqt_smoothed),
                atol=2e-2,
            )
            np.testing.assert_array_equal(gains_s, gains_r)
        finally:
            srv_s.close()
            srv_r.close()

    def test_sharded_delta_collective_free(self, small_params):
        import jax

        from pitchvis_tpu.parallel.sharding import make_mesh

        mesh = make_mesh(8)
        srv, out, _ = self._drive(small_params, mesh=mesh, hops=1)
        try:
            hop = srv._hop
            chunks = srv._put_batch(
                np.zeros((srv.n_streams, hop), srv._host_dtype or np.float32)
            )
            advs = srv._put_batch(np.ones(srv.n_streams, bool))
            dt_b = srv._put_batch(np.full(srv.n_streams, 1.0 / 60.0, np.float32))
            args = (
                srv.arrays,
                (srv.analysis_state, srv.ml_state, srv.balls_state),
                srv.ml_params, srv._window, chunks, advs, dt_b,
            )
            text = srv._delta_fn.lower(*args).compile().as_text()
            for op in (
                "all-reduce", "all-gather", "collective-permute", "all-to-all",
                "reduce-scatter",
            ):
                assert op not in text, f"collective {op} in sharded server hop"
        finally:
            srv.close()

    def test_sharded_step_multi_and_reset(self, small_params):
        from pitchvis_tpu.parallel.sharding import make_mesh

        mesh = make_mesh(8)
        srv, out, _ = self._drive(small_params, mesh=mesh, hops=2)
        try:
            srv.reset_stream(3)  # row update must keep the mesh placement
            hop = srv._hop
            for s in range(srv.n_streams):
                srv.push(s, np.zeros(2 * hop, np.float32))
            out, gains = srv.step_multi(2)
            assert len(out.x_vqt_smoothed.sharding.device_set) == 8
            assert np.isfinite(np.asarray(out.x_vqt_smoothed)).all()
            assert not np.asarray(out.peaks[3]).any()  # reset slot silenced
        finally:
            srv.close()

    def test_sharded_serve_loop(self, small_params):
        """server.serve() over a mesh-sharded server: the loop thread's
        sharded dispatches and the element-barrier publish work across
        every virtual device; a reset lands correctly mid-serve."""
        from pitchvis_tpu.parallel.sharding import make_mesh
        from pitchvis_tpu.runtime.server import StreamServer

        mesh = make_mesh(8)
        B = 8
        f = small_params.range.min_freq * 2.0 ** (30.0 / small_params.range.buckets_per_octave)
        sr = small_params.sr
        srv = StreamServer(
            B, small_params, buffer_seconds=2.0, path="pallas", fast=True,
            mesh=mesh,
        )
        t = np.arange(int(sr * 1.2)) / sr
        tone = (0.1 * np.sin(2 * np.pi * f * t)).astype(np.float32)
        for s in range(0, B, 2):  # tone on even slots, silence on odd
            srv.push(s, tone)
        with srv.serve(rate_hz=120.0) as loop:
            trip = loop.wait_next(timeout=120.0)
            assert trip is not None
            srv.reset_stream(0)
            final = loop.wait_next(seq=trip[0], timeout=120.0)
            assert final is not None
        _seq, out, _gains = loop.latest()
        assert len(out.x_vqt_smoothed.sharding.device_set) == 8
        peaks = np.asarray(out.peaks)
        assert not peaks[0].any()  # reset mid-serve silenced slot 0
        for s in (2, 4, 6):
            idx = np.where(peaks[s])[0]
            assert len(idx) == 1 and abs(idx[0] - 30) <= 1
        for s in (1, 3, 5, 7):
            assert not peaks[s].any()
        srv.close()

    def test_sharded_cadenced_serve(self, small_params):
        """publish="per_hop" over a mesh: the per-hop stacked program is
        shard_map-partitioned (hop axis replicated, stream axis sharded)
        and every published slice is finite with the right peaks."""
        from pitchvis_tpu.parallel.sharding import make_mesh
        from pitchvis_tpu.runtime.server import StreamServer

        mesh = make_mesh(8)
        B = 8
        f = small_params.range.min_freq * 2.0 ** (30.0 / small_params.range.buckets_per_octave)
        sr = small_params.sr
        srv = StreamServer(
            B, small_params, buffer_seconds=2.0, path="pallas", fast=True,
            mesh=mesh,
        )
        t = np.arange(int(sr * 1.2)) / sr
        tone = (0.1 * np.sin(2 * np.pi * f * t)).astype(np.float32)
        for s in range(0, B, 2):
            srv.push(s, tone)
        with srv.serve(
            rate_hz=240.0, hops_per_dispatch=2, publish="per_hop"
        ) as loop:
            trip = loop.wait_next(seq=3, timeout=240.0)
            assert trip is not None
        assert loop.stats["published"] == loop.stats["hops"]
        _seq, out, gains = loop.latest()
        assert gains.shape == (B,)
        peaks = np.asarray(out.peaks)
        assert np.isfinite(np.asarray(out.x_vqt_smoothed)).all()
        for s in (0, 2, 4, 6):
            idx = np.where(peaks[s])[0]
            assert len(idx) == 1 and abs(idx[0] - 30) <= 1
        for s in (1, 3, 5, 7):
            assert not peaks[s].any()
        srv.close()

    def test_custom_axis_name_mesh(self, small_params):
        """The server's device placement must follow the mesh's actual axis
        names (shard_batch defaults to every mesh axis), not assume 'dp'."""
        from pitchvis_tpu.parallel.sharding import make_mesh

        mesh = make_mesh(8, axis_name="streams")
        srv, out, _ = self._drive(small_params, mesh=mesh, hops=2)
        try:
            assert len(out.x_vqt_smoothed.sharding.device_set) == 8
            assert np.isfinite(np.asarray(out.x_vqt_smoothed)).all()
            srv.reset_stream(1)  # row update re-pins the custom sharding
            out2, _ = srv.step(dt=1.0 / 60.0)
            assert not np.asarray(out2.peaks[1]).any()
        finally:
            srv.close()

    def test_sharded_snapshot_mode(self, small_params):
        """ingest="snapshot" + mesh: the re-shipped-window program is also
        shard_map-partitioned (scalar dt spec, unlike the delta path)."""
        from pitchvis_tpu.parallel.sharding import make_mesh
        from pitchvis_tpu.runtime.server import StreamServer

        mesh = make_mesh(8)
        srv = StreamServer(
            8, small_params, buffer_seconds=1.0, path="pallas", fast=True,
            mesh=mesh, ingest="snapshot",
        )
        try:
            f = small_params.range.min_freq * 2.0 ** (
                30.0 / small_params.range.buckets_per_octave
            )
            t = np.arange(int(small_params.sr * 0.8)) / small_params.sr
            srv.push(0, (0.1 * np.sin(2 * np.pi * f * t)).astype(np.float32))
            out, _ = srv.step(dt=1.0 / 60.0)
            assert len(out.x_vqt_smoothed.sharding.device_set) == 8
            assert np.asarray(out.peaks[0]).any()
            assert np.isfinite(np.asarray(out.x_vqt_smoothed)).all()
        finally:
            srv.close()
