"""Multi-chip scale-out.

The reference is single-host; its only concurrency is an audio thread feeding
a mutex-protected ring buffer (pitchvis_audio/src/lib.rs:17-28). The
TPU-native scaling mechanism is batch parallelism over independent audio
streams: the stream axis is sharded over a device mesh ("dp"); no
cross-stream communication is needed for the VQT/analysis pipeline, so
collectives only appear in the (small) ML training step (gradient psum) and
in debug reductions.

Layout: streams ride the "dp" mesh axis over ICI; weights (the VQT kernel
matrices and ML params) are replicated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def make_multihost_mesh(axis_name: str = "dp", dcn_axis: str = "hosts") -> Mesh:
    """Multi-host mesh: a ("hosts", "dp") grid with the host axis on DCN and
    the per-host chip axis on ICI. Streams shard over BOTH axes (they are
    independent, so the layout only determines which host feeds which
    streams); weights stay replicated, so no collective ever crosses DCN in
    serving. Call `jax.distributed.initialize()` first on every host.

    On a single host this degenerates to a (1, n_chips) grid and behaves
    exactly like `make_mesh`."""
    # jax.devices() global order is NOT guaranteed process-contiguous on
    # real multi-host topologies — sort by owning process first so each
    # "hosts" row holds exactly one process's chips (otherwise the dp axis
    # would silently span DCN and the layout guarantee above would be false)
    devices = np.array(sorted(jax.devices(), key=lambda d: (d.process_index, d.id)))
    n_hosts = max(int(jax.process_count()), 1)
    per_host = len(devices) // n_hosts
    return Mesh(devices.reshape(n_hosts, per_host), (dcn_axis, axis_name))


def multihost_stream_sharding(mesh: Mesh) -> NamedSharding:
    """Stream axis sharded over hosts x chips — the multihost-named alias of
    ``stream_sharding``'s default (one rule, two entry points)."""
    return stream_sharding(mesh)


def stream_sharding(mesh: Mesh, axis_name=None) -> NamedSharding:
    """Leading (stream/batch) axis sharded over the mesh — by default over
    EVERY mesh axis (matching the shard_map specs), so meshes with custom
    axis names or multiple axes work without naming 'dp'."""
    axes = tuple(mesh.axis_names) if axis_name is None else axis_name
    return NamedSharding(mesh, P(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, x, axis_name=None):
    """Places a host batch onto the mesh, stream axis sharded."""
    return jax.device_put(x, stream_sharding(mesh, axis_name))


def replicate(mesh: Mesh, tree):
    """Replicates a pytree of arrays (e.g. VQT kernel weights) on all devices."""
    sh = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def make_sharded_pipeline_step(mesh: Mesh, *, multi: bool = False, **static_kwargs):
    """The multi-chip serving step: ``pipeline_step`` wrapped in
    ``jax.shard_map`` with the stream axis split over EVERY mesh axis and the
    kernel arrays replicated.

    Sharding propagation alone is enough for the dense ``path="time"`` VQT
    (GSPMD partitions plain dots), but the flagship ``path="pallas"`` kernel
    lowers to a Mosaic custom call that GSPMD cannot split — without an
    explicit shard_map boundary the partitioner would all-gather the batch
    and run the whole kernel on every chip. Inside shard_map each device runs
    the full fused step (Pallas VQT included) on its local stream shard;
    streams are independent, so the program stays collective-free
    (asserted in tests/test_parallel.py / tests/test_multihost.py).

    ``multi=True`` wraps ``pipeline_step_multi`` instead (chunks/outputs gain
    a leading scan axis K that stays unsharded). ``static_kwargs`` are the
    usual pipeline statics (vqt_params=..., path=..., ...). Returns a jitted
    ``(arrays, state, chunk, dt) -> (state, outputs)``.
    """
    from ..models.pipeline import pipeline_step, pipeline_step_multi

    base = pipeline_step_multi if multi else pipeline_step
    fn = functools.partial(base, **static_kwargs)
    batch = P(tuple(mesh.axis_names))
    scan_batch = P(None, tuple(mesh.axis_names))
    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        # dt is per-stream (sharded WITH the batch): pipeline_step documents
        # "scalar or (B,) seconds per hop", and a replicated spec would hand
        # each shard the full-length vector and fail the broadcast
        in_specs=(P(), batch, scan_batch if multi else batch, batch),
        out_specs=(batch, scan_batch if multi else batch),
        # pallas_call's out_shape carries no varying-manual-axes metadata, so
        # the vma typecheck cannot see through it; every output is per-stream
        # (mapped) by construction and the equality test below pins that.
        check_vma=False,
    )

    def step(arrays, state, chunk, dt):
        b = chunk.shape[-2]
        dt_b = jnp.broadcast_to(jnp.asarray(dt, jnp.float32), (b,))
        return mapped(arrays, state, chunk, dt_b)

    return jax.jit(step)
