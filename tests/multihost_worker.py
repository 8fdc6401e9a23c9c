"""Worker process for the real multi-process multi-host tests
(test_multihost.py).

Each worker is one "host" of an n_procs x devices_per_host virtual cluster:
it initializes jax.distributed, builds the ("hosts", "dp") mesh via
make_multihost_mesh, ingests its process-LOCAL slice of the stream batch
(multi-host serving ingest: each host feeds its own streams), and runs one
fused pipeline step on the global sharded arrays. Usage:

    python multihost_worker.py <process_id> <coordinator_port> \
        [n_processes=2] [devices_per_host=4]
"""

import os
import sys

# must happen before any jax import: each worker is a CPU "host" with
# devices_per_host virtual devices
_N_DEV = int(sys.argv[4]) if len(sys.argv) > 4 else 4
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={_N_DEV}"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid = int(sys.argv[1])
    port = sys.argv[2]
    n_procs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=n_procs, process_id=pid
    )
    assert jax.process_count() == n_procs
    assert jax.local_device_count() == _N_DEV
    assert jax.device_count() == n_procs * _N_DEV

    import numpy as np

    from pitchvis_tpu.core.config import VqtParameters, VqtRange
    from pitchvis_tpu.kernel.builder import get_kernel
    from pitchvis_tpu.models.pipeline import init_pipeline_state, pipeline_step
    from pitchvis_tpu.ops.vqt import VqtArrays
    from pitchvis_tpu.parallel.sharding import (
        make_multihost_mesh,
        multihost_stream_sharding,
        replicated,
    )

    params = VqtParameters(
        n_fft=2048,
        range=VqtRange(min_freq=220.0, octaves=3, buckets_per_octave=12),
    )
    kernel = get_kernel(params)  # cache pre-warmed by the parent test

    mesh = make_multihost_mesh()
    assert mesh.devices.shape == (n_procs, _N_DEV), mesh.devices.shape
    assert mesh.axis_names == ("hosts", "dp")

    sh_stream = multihost_stream_sharding(mesh)
    sh_rep = replicated(mesh)

    global_batch = 16
    local_batch = global_batch // jax.process_count()

    def global_sharded(local_np):
        return jax.make_array_from_process_local_data(
            sh_stream, local_np, global_shape=(global_batch,) + local_np.shape[1:]
        )

    # weights replicated on every device of every host (each process supplies
    # the full array)
    arrays = jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(
            sh_rep, np.asarray(a), global_shape=np.asarray(a).shape
        ),
        VqtArrays.from_kernel(kernel),
    )
    # state + chunk: each host ingests only ITS streams (host-local ingest)
    state = jax.tree.map(
        lambda a: global_sharded(np.asarray(a)[:local_batch]),
        init_pipeline_state(global_batch, params),
    )
    rng = np.random.default_rng(100 + pid)  # per-host audio feeds differ
    chunk = global_sharded(
        (rng.standard_normal((local_batch, 256)) * 0.05).astype(np.float32)
    )

    state, out = pipeline_step(arrays, state, chunk, 1.0 / 60.0, vqt_params=params)
    assert out.x_vqt.shape == (global_batch, params.n_buckets)
    # each host addresses exactly its own half of the stream axis
    local_rows = sum(s.data.shape[0] for s in out.x_vqt.addressable_shards)
    assert local_rows == local_batch, local_rows
    assert all(np.all(np.isfinite(np.asarray(s.data))) for s in out.x_vqt.addressable_shards)

    # serving is communication-free: no collective may appear in the HLO
    # (streams are independent; a collective would put DCN in the hot path)
    text = (
        pipeline_step.lower(arrays, state, chunk, 1.0 / 60.0, vqt_params=params)
        .compile()
        .as_text()
    )
    for op in ("all-reduce", "all-gather", "all-to-all", "collective-permute", "reduce-scatter"):
        assert op not in text, f"unexpected collective {op} in serving HLO"

    print(f"[{pid}] MULTIHOST_OK", flush=True)


if __name__ == "__main__":
    main()
