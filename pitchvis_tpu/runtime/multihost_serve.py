"""Runnable multi-host serving recipe (ROADMAP item 4, round-2 verdict 7).

The production deployment shape for serving thousands of audio streams over
a multi-host TPU pod slice:

* every host runs THIS script as one `jax.distributed` process;
* ingest is host-local: each host owns a native lock-free ring bank
  (native/pitchvis_native.cpp) fed by its producer threads (here: synthetic
  tone producers standing in for network receivers), with AGC applied at
  write time like the reference's audio callback;
* per step, each host snapshots its local streams' trailing windows and
  assembles the GLOBAL batch with `jax.make_array_from_process_local_data`
  over the ("hosts", "dp") mesh — the serving step compiles collective-free
  (asserted at startup), so nothing ever crosses DCN in the hot path;
* only the end-of-run bench aggregation reduces across hosts (one small
  all-gather outside the serving loop); process 0 prints ONE JSON line:
  aggregate streams x realtime factor for the whole cluster.

Run one process per host:

    python -m pitchvis_tpu.runtime.multihost_serve \
        --coordinator <host0>:<port> --processes N --process-id I \
        --streams-per-host 512 --seconds 10

or demo the whole recipe on one machine with virtual CPU hosts:

    python -m pitchvis_tpu.runtime.multihost_serve --spawn 2 \
        --devices-per-host 4 --streams-per-host 8 --seconds 2 --small
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time


def _parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--coordinator", default=None, help="host:port of process 0")
    p.add_argument("--processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--spawn", type=int, default=0,
                   help="single-machine demo: spawn N virtual-host workers")
    p.add_argument("--devices-per-host", type=int, default=0,
                   help="force N virtual CPU devices (testing; 0 = real chips)")
    p.add_argument("--streams-per-host", type=int, default=64)
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--hop-hz", type=float, default=60.0)
    p.add_argument("--path", default="time", choices=["time", "freq", "pallas"])
    p.add_argument("--fast", action="store_true", help="bf16 VQT weights")
    p.add_argument("--small", action="store_true",
                   help="reduced VQT parameters (fast compile; CI/demo)")
    return p.parse_args(argv)


def _spawn(args) -> int:
    """Launcher: N local worker processes with a fresh coordinator port."""
    import socket
    import subprocess

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    cmd_base = [
        sys.executable, "-m", "pitchvis_tpu.runtime.multihost_serve",
        "--coordinator", f"127.0.0.1:{port}",
        "--processes", str(args.spawn),
        "--devices-per-host", str(args.devices_per_host or 4),
        "--streams-per-host", str(args.streams_per_host),
        "--seconds", str(args.seconds),
        "--hop-hz", str(args.hop_hz),
        "--path", args.path,
    ] + (["--small"] if args.small else []) + (["--fast"] if args.fast else [])
    procs = [
        subprocess.Popen(cmd_base + ["--process-id", str(i)])
        for i in range(args.spawn)
    ]
    rc = 0
    for p in procs:
        rc |= p.wait()
    return rc


def main(argv=None) -> int:
    args = _parse_args(argv if argv is not None else sys.argv[1:])
    if args.spawn:
        return _spawn(args)

    if args.devices_per_host:
        # virtual CPU hosts: must be set before jax initializes
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={args.devices_per_host}"
        )
    import jax

    if args.devices_per_host:
        jax.config.update("jax_platforms", "cpu")
    if args.coordinator and args.processes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.processes,
            process_id=args.process_id,
        )

    import numpy as np

    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from ..core.config import AnalysisParameters, VqtParameters, VqtRange
    from ..kernel.builder import get_kernel
    from ..models.analysis import analysis_step_batch, init_state_batch
    from ..ops.vqt import make_vqt_arrays, vqt_db_auto
    from ..parallel.sharding import make_multihost_mesh, multihost_stream_sharding, replicated
    from .native import NativeRingBank, available as native_available

    pid = jax.process_index()
    n_hosts = max(jax.process_count(), 1)
    params = (
        VqtParameters(
            n_fft=2048,
            range=VqtRange(min_freq=220.0, octaves=3, buckets_per_octave=12),
        )
        if args.small
        else VqtParameters()
    )
    aparams = AnalysisParameters()
    kernel = get_kernel(params)
    sr = params.sr
    hop = int(sr / args.hop_hz)
    local_streams = args.streams_per_host
    global_streams = local_streams * n_hosts

    mesh = make_multihost_mesh()
    sh_stream = multihost_stream_sharding(mesh)
    sh_rep = replicated(mesh)

    def rep(a):
        a = np.asarray(a)
        return jax.make_array_from_process_local_data(sh_rep, a, global_shape=a.shape)

    def glob(local):
        return jax.make_array_from_process_local_data(
            sh_stream, local, global_shape=(global_streams,) + local.shape[1:]
        )

    arrays = jax.tree.map(rep, make_vqt_arrays(kernel, path=args.path, fast=args.fast))
    # init rows are uniform, so each host only materializes ITS slice (a
    # global init would cost O(n_hosts) redundant host memory per process)
    analysis_state = jax.tree.map(
        lambda a: glob(np.asarray(a)),
        init_state_batch(local_streams, params.n_buckets),
    )

    # --- host-local ingest: native ring bank + producer threads -------------
    use_native = native_available()
    capacity = max(int(sr * 2.0), params.n_fft)
    # the NumPy fallback's producer/consumer need explicit synchronization
    # (the native bank gets it from the per-stream atomic head)
    ring_lock = threading.Lock()
    if use_native:
        rings = NativeRingBank(local_streams, capacity)
    else:  # pure-NumPy fallback keeps the recipe runnable without a compiler
        host_rings = np.zeros((local_streams, capacity), np.float32)

    stop = threading.Event()

    def producer():
        """Synthetic per-stream tones (stand-in for network receivers)."""
        rng = np.random.default_rng(1000 + pid)
        freqs = rng.uniform(
            params.range.min_freq * 1.5, params.range.min_freq * 5.0, local_streams
        )
        t0 = 0
        while not stop.is_set():
            t = (t0 + np.arange(hop)) / sr
            block = (0.1 * np.sin(2 * np.pi * freqs[:, None] * t[None, :])).astype(
                np.float32
            )
            if use_native:
                rings.write_batch(None, block)  # one call for all local streams
            else:
                with ring_lock:
                    host_rings[:] = np.roll(host_rings, -hop, axis=1)
                    host_rings[:, -hop:] = block
            t0 += hop
            time.sleep(0.2 / args.hop_hz)  # produce ~5x realtime, bounded

    producer_thread = threading.Thread(target=producer, daemon=True)
    producer_thread.start()

    # shard_map boundary (same rationale as runtime/server.py): the Pallas
    # path's Mosaic custom call cannot be partitioned by GSPMD — without the
    # explicit boundary the partitioner all-gathers the batch and the HLO
    # assertion below aborts startup for path="pallas". Inside shard_map each
    # device serves its local stream slice, collective-free by construction
    # (the time path too; the assertion stays as belt and braces).
    from jax.sharding import NamedSharding, PartitionSpec as P

    if global_streams % mesh.size:
        raise SystemExit(
            f"streams ({global_streams}) must divide over the {mesh.size}-device mesh"
        )

    def _step(a, st, x, dt):
        return analysis_step_batch(
            aparams, params.range, st, vqt_db_auto(a, x, path=args.path), dt
        )

    batch_spec = P(tuple(mesh.axis_names))
    step_fn = jax.jit(jax.shard_map(
        _step, mesh=mesh,
        in_specs=(P(), batch_spec, batch_spec, P()),
        out_specs=(batch_spec, batch_spec), check_vma=False,
    ))

    # serving must be collective-free: assert once on the compiled HLO
    probe = glob(np.zeros((local_streams, params.n_fft), np.float32))
    text = step_fn.lower(arrays, analysis_state, probe, 1.0 / args.hop_hz).compile().as_text()
    for op in ("all-reduce", "all-gather", "all-to-all", "collective-permute", "reduce-scatter"):
        if op in text:  # not `assert`: must survive python -O in production
            raise RuntimeError(f"collective {op} in the serving hot path")

    def one_step(state):
        if use_native:
            windows, _gains = rings.snapshot(params.n_fft)
        else:
            with ring_lock:
                windows = host_rings[:, -params.n_fft :].copy()
        x = glob(np.ascontiguousarray(windows, np.float32))
        state, out = step_fn(arrays, state, x, 1.0 / args.hop_hz)
        # hard barrier on the local shard (metadata alone proves nothing)
        np.asarray(out.x_vqt_smoothed.addressable_shards[0].data.ravel()[0])
        return state

    # warm with a REAL call: .lower().compile() above does NOT seed the jit
    # dispatch cache, so without this the first loop step would pay the full
    # compile inside the timed window and corrupt the reported rate
    analysis_state = one_step(analysis_state)

    # --- serve loop ---------------------------------------------------------
    t0 = time.monotonic()
    deadline = t0 + args.seconds
    steps = 0
    while time.monotonic() < deadline:
        analysis_state = one_step(analysis_state)
        steps += 1
    elapsed = max(time.monotonic() - t0, 1e-9)

    # --- aggregated bench line (the ONLY cross-host reduction; off the hot
    # path): all-gather each host's step rate, process 0 reports the cluster
    local_rate = np.array([steps * local_streams / elapsed], np.float64)
    gathered = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("hosts")), local_rate, global_shape=(n_hosts,)
    )
    total_rate = float(jax.jit(lambda g: g.sum())(gathered))
    # stop + JOIN the producer BEFORE destroying the ring bank: a write
    # racing pv_rb_destroy would dereference a freed handle
    stop.set()
    producer_thread.join(timeout=10)
    if use_native and not producer_thread.is_alive():
        # a producer still alive after the timeout (burst-throttled host mid
        # np.roll) must NOT have the handle freed under it; leaking the bank
        # at process exit is the safe failure
        rings.close()
    if pid == 0:
        realtime = total_rate / args.hop_hz
        print(json.dumps({
            "metric": "multihost_streams_realtime_factor",
            "value": round(realtime, 1),
            "unit": "x realtime (aggregate)",
            "hosts": n_hosts,
            "streams": global_streams,
            "steps_per_host": steps,
            "native_ingest": use_native,
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
