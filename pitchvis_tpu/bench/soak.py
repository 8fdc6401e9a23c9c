"""Sustained capacity soak at claimed scale (round-3 verdict item 5).

docs/PERFORMANCE.md claims ~3,800-3,900 concurrent 60 Hz realtime streams
per chip on the flagship path; this harness PROVES the sustained version of
that number and writes the evidence to ``artifacts/SOAK.json``:

* **pipeline leg** — StreamingPipeline(path="pallas", fast=True) at the
  claimed stream count for several wall-clock minutes, hops micro-batched
  (``step_multi``), with serving churn running concurrently: a
  ``reset_stream`` every few seconds and ONE live mid-soak ``rebuild``
  (parameter change at unchanged bin layout, the debounced-tuner shape).
  Records the sustained aggregate realtime factor (audio-seconds processed
  per wall-second, counting every pause the churn causes).
* **server leg** — the live-ingest stack (StreamServer, native ring bank)
  at a host-transfer-feasible stream count with concurrent producer
  threads, pipelined stepping, churn, and one live rebuild for the same
  duration; records sustained hop rate and p50/p95 hop times.
* **server_capacity leg** — live ingest at the FULL claimed stream count
  through the throughput serving mode (``step_multi``); on a networked
  tunnel this measures the wire-bandwidth bound (the phase breakdown and
  co-located extrapolation live in docs/PERFORMANCE.md).
* **serve_loop leg** — the self-driving loop (``StreamServer.serve()``)
  pacing 60 Hz hops on its own thread at the interactive stream count,
  with producers + a consumer (``wait_next`` per published hop) + churn +
  one live rebuild; records the consumer-observed publish rate,
  inter-publish p50/p95, and the loop's deadline-skip counters. A second
  pass (``serve_loop_throughput``) runs the same leg with
  ``hops_per_dispatch=k``, where each dispatch scan-amortizes k hops so
  the audio cadence holds rate_hz through a tunnel whose round-trip
  exceeds the hop period; a third (``serve_loop_cadenced``) runs the
  INTERACTIVE round-5 mode (``publish="per_hop"``: every hop of the fused
  k-hop dispatch published on its own grid slot, one barrier per window,
  one-deep dispatch overlap) — the leg whose published_per_s /
  served_realtime_fraction answer "does 60 Hz interactive serving hold
  through this tunnel".

Run:  python -m pitchvis_tpu.bench.soak [--streams 3840] [--minutes 3] ...
(also ``python -m pitchvis_tpu.xtask soak``). The driver-facing capacity
claim lives in docs/DEPLOYMENT.md §2.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import threading
import time

import numpy as np


def _tone_producer(server, stop, writes, k, lo, hi, sr):
    """Shared producer loop of the live-ingest legs: pushes 100 ms of tone
    to every stream in its range once per 100 ms via ONE batched native
    call (``push_batch`` — per-stream ``push`` caps host ingest on Python
    dispatch alone thousands of streams short of the ring bandwidth).
    Realtime ingest when the host keeps up; the report's
    ingest_realtime_fraction records whether it did (this VM has one
    burst-throttled core). Native writes release the GIL."""
    rng = np.random.default_rng(k)
    t = np.arange(sr // 10) / sr
    block = np.stack([
        (0.1 * np.sin(
            2 * np.pi * 110.0 * (1 + (s % 32)) * float(rng.uniform(0.98, 1.02)) * t
        )).astype(np.float32)
        for s in range(lo, hi)
    ])
    ids = np.arange(lo, hi, dtype=np.int64)
    while not stop.is_set():
        t0 = time.monotonic()
        server.push_batch(block, ids)
        writes[k] += block.size
        time.sleep(max(0.0, 0.1 - (time.monotonic() - t0)))


def _start_producers(server, stop, n_streams, n_producers, sr):
    writes = [0] * n_producers
    threads = [
        threading.Thread(
            target=_tone_producer,
            args=(server, stop, writes, k,
                  k * n_streams // n_producers, (k + 1) * n_streams // n_producers,
                  sr),
            daemon=True,
        )
        for k in range(n_producers)
    ]
    return threads, writes


def soak_pipeline(
    n_streams: int = 3840,
    minutes: float = 3.0,
    hops_per_call: int = 16,
    path: str = "pallas",
    fast: bool = True,
    reset_every_s: float = 5.0,
) -> dict:
    """Device-ring capacity leg. Input chunks are pre-staged on device and
    rotated (the same amortization the streaming bench and a >realtime
    deployment use — ingest bandwidth is the server leg's job)."""
    import jax

    from ..core.config import VqtParameters
    from ..models.pipeline import StreamingPipeline

    params = VqtParameters()
    pipe = StreamingPipeline(n_streams, params, path=path, fast=fast)
    hop = int(params.sr / 60.0)
    dt_hop = hop / params.sr
    rng = np.random.default_rng(0)
    banks = [
        jax.device_put(
            (rng.standard_normal((hops_per_call, n_streams, hop)) * 0.05).astype(
                np.float32
            )
        )
        for _ in range(2)
    ]

    out = pipe.step_multi(banks[0], dt_hop)  # compile
    np.asarray(out.x_vqt[-1, 0, 0])  # barrier

    deadline = time.monotonic() + minutes * 60.0
    rebuild_at = time.monotonic() + minutes * 30.0  # halfway
    next_reset = time.monotonic() + reset_every_s
    hops = resets = 0
    rebuilds = []
    t_start = time.monotonic()
    i = 0
    while time.monotonic() < deadline:
        out = pipe.step_multi(banks[i % 2], dt_hop)
        np.asarray(out.x_vqt[-1, 0, 0])  # keep the loop honest (no pile-up)
        hops += hops_per_call
        i += 1
        now = time.monotonic()
        if now >= next_reset:
            pipe.reset_stream(int(rng.integers(0, n_streams)))
            resets += 1
            next_reset = now + reset_every_s
        if rebuild_at is not None and now >= rebuild_at:
            t0 = time.monotonic()
            pipe.rebuild(dataclasses.replace(params, quality=params.quality * 1.1))
            rebuilds.append(round(time.monotonic() - t0, 2))
            rebuild_at = None
    wall = time.monotonic() - t_start
    audio_secs = hops * dt_hop * n_streams
    final = np.asarray(out.x_vqt[-1])
    return {
        "leg": "pipeline",
        "minutes": minutes,
        "n_streams": n_streams,
        "path": path,
        "fast": fast,
        "wall_s": round(wall, 1),
        "hops": hops,
        "resets": resets,
        "rebuild_wall_s": rebuilds,
        "aggregate_realtime_factor": round(audio_secs / wall, 1),
        "streams_sustainable_at_60hz": int(audio_secs / wall),
        "outputs_finite": bool(np.isfinite(final).all()),
    }


def soak_server(
    n_streams: int = 1024,
    minutes: float = 3.0,
    n_producers: int = 4,
    path: str = "pallas",
    fast: bool = True,
    reset_every_s: float = 5.0,
    hops_per_call: int = 1,
    leg: str = "server",
) -> dict:
    """Live-ingest leg: concurrent producers push tones into the native
    ring bank while the analysis thread runs pipelined steps; churn +
    one live rebuild happen mid-soak. ``hops_per_call=k`` soaks the
    THROUGHPUT serving mode instead (``step_multi``: k ingest-fed hops
    scan-amortized into one dispatch — how multi-thousand-stream capacity
    is actually served); hop percentiles then report the amortized
    per-hop charge."""
    import dataclasses as dc

    from ..core.config import VqtParameters
    from ..runtime.server import StreamServer

    params = VqtParameters()
    server = StreamServer(
        n_streams, params, buffer_seconds=2.0, path=path, fast=fast
    )
    sr = int(params.sr)
    stop = threading.Event()
    threads, writes = _start_producers(server, stop, n_streams, n_producers, sr)

    if hops_per_call > 1:
        out, _ = server.step_multi(hops_per_call, dt=1.0 / 60.0)  # compile
    else:
        out, _ = server.step(dt=1.0 / 60.0)  # compile
    np.asarray(out.peaks[0])

    for th in threads:
        th.start()
    rng = np.random.default_rng(1)
    deadline = time.monotonic() + minutes * 60.0
    rebuild_at = time.monotonic() + minutes * 30.0
    next_reset = time.monotonic() + reset_every_s
    steps = resets = 0
    rebuilds = []
    times = []
    res = None  # a deadline that lapses before the first step leaves no result
    t_start = time.monotonic()
    advanced0 = server.stats["advanced"]  # exclude the compile/prime hops
    if hops_per_call == 1:
        server.step(pipelined=True, dt=None)  # prime
    try:
        while time.monotonic() < deadline:
            t0 = time.perf_counter()
            if hops_per_call > 1:
                res = server.step_multi(hops_per_call)
            else:
                res = server.step(pipelined=True)
            if res is not None:
                np.asarray(res[0].peaks[0, 0])
            times.append((time.perf_counter() - t0) / hops_per_call)
            steps += 1
            now = time.monotonic()
            if now >= next_reset:
                server.reset_stream(int(rng.integers(0, n_streams)))
                resets += 1
                next_reset = now + reset_every_s
            if rebuild_at is not None and now >= rebuild_at:
                t0 = time.monotonic()
                server.rebuild(dc.replace(params, quality=params.quality * 1.1))
                rebuilds.append(round(time.monotonic() - t0, 2))
                rebuild_at = None
        # multi mode has no pipelined tail to flush; its last result is res
        final = server.flush() if hops_per_call == 1 else res
        finite = bool(
            final is not None
            and np.isfinite(np.asarray(final[0].x_vqt_smoothed)).all()
        )
    finally:
        stop.set()
        for th in threads:
            th.join(timeout=10)
        server.close()
    wall = time.monotonic() - t_start
    times.sort()
    hops = steps * hops_per_call
    stats = dict(server.stats)
    return {
        "leg": leg,
        "minutes": minutes,
        "n_streams": n_streams,
        "path": path,
        "fast": fast,
        "hops_per_call": hops_per_call,
        "wall_s": round(wall, 1),
        "steps": steps,
        "hops": hops,
        "hops_per_s": round(hops / wall, 2),
        # per-hop charge (amortized when hops_per_call > 1)
        # a deadline that lapses before the first step leaves no timings
        # (same guard soak_serve_loop's gaps get) — None, not IndexError,
        # so the other legs' results still reach SOAK.json
        "hop_p50_ms": round(times[len(times) // 2] * 1e3, 1) if times else None,
        "hop_p95_ms": (
            round(times[int(len(times) * 0.95)] * 1e3, 1) if times else None
        ),
        "samples_ingested": sum(writes),
        "ingest_realtime_fraction": round(
            sum(writes) / (n_streams * sr * wall), 3
        ),
        # audio actually ADVANCED through analysis per stream-second of
        # wall: the sustained serving realtime fraction at this scale
        "served_realtime_fraction": round(
            (stats["advanced"] - advanced0) * (server._hop / sr)
            / (n_streams * wall), 3
        ),
        "resets": resets,
        "rebuild_wall_s": rebuilds,
        "outputs_finite": finite,
        "serving_stats": stats,
    }


def soak_serve_loop(
    n_streams: int = 512,
    minutes: float = 3.0,
    rate_hz: float = 60.0,
    n_producers: int = 4,
    path: str = "pallas",
    fast: bool = True,
    reset_every_s: float = 5.0,
    hops_per_dispatch: int = 1,
    publish: str = "latest",
    leg: str = "serve_loop",
) -> dict:
    """Self-driving-loop leg: ``StreamServer.serve()`` owns the dispatch
    cadence while producers push and the main thread plays consumer
    (``wait_next`` + one-element fetch per published hop — the honesty
    barrier a real display client provides); churn and one live rebuild
    run on the control plane mid-soak. Records the consumer-observed
    publish rate and inter-publish p50/p95 against the 60 Hz target."""
    import dataclasses as dc

    from ..core.config import VqtParameters
    from ..runtime.server import StreamServer

    params = VqtParameters()
    server = StreamServer(
        n_streams, params, buffer_seconds=2.0, path=path, fast=fast
    )
    sr = int(params.sr)
    stop = threading.Event()
    threads, writes = _start_producers(server, stop, n_streams, n_producers, sr)

    # compile the program the LOOP will dispatch before pacing starts (the
    # multi-hop modes run step_multi variants, different jitted programs) —
    # for BOTH parameter sets, so the mid-soak live rebuild swaps kernels
    # without paying a fresh jit compile inside the measurement window (a
    # deployment pays it once per set via the persistent cache; longhaul
    # primes the same way)
    retuned = dataclasses.replace(params, quality=params.quality * 1.1)

    def prime():
        if publish == "per_hop":
            # the cadenced loop's catch-up windows dispatch 2k hops
            server.step_multi(2 * hops_per_dispatch, dt=1.0 / 60.0, per_hop=True)
            out, _ = server.step_multi(hops_per_dispatch, dt=1.0 / 60.0, per_hop=True)
            out = out[-1]  # per_hop returns a k-tuple of per-hop trees
        elif hops_per_dispatch > 1:
            out, _ = server.step_multi(hops_per_dispatch, dt=1.0 / 60.0)
        else:
            out, _ = server.step(dt=1.0 / 60.0)
        np.asarray(out.peaks[0])

    prime()
    server.rebuild(retuned)
    prime()
    server.rebuild(params)
    prime()  # each rebuild re-creates the jit wrappers; prime the FINAL set
    # too, or the loop's first window pays a re-trace

    for th in threads:
        th.start()
    rng = np.random.default_rng(1)
    deadline = time.monotonic() + minutes * 60.0
    rebuild_at = time.monotonic() + minutes * 30.0
    next_reset = time.monotonic() + reset_every_s
    resets = 0
    rebuilds = []
    publish_t = []
    last_seq = 0
    t_start = time.monotonic()
    advanced0 = server.stats["advanced"]  # exclude the compile hop
    loop = server.serve(
        rate_hz=rate_hz, hops_per_dispatch=hops_per_dispatch, publish=publish
    )
    try:
        while time.monotonic() < deadline:
            nxt = loop.wait_next(seq=last_seq, timeout=30.0)
            if nxt is None:
                continue
            last_seq, outputs, _gains = nxt
            np.asarray(outputs.scene_calmness[0])  # consumer fetch = barrier
            publish_t.append(time.monotonic())
            now = publish_t[-1]
            if now >= next_reset:
                server.reset_stream(int(rng.integers(0, n_streams)))
                resets += 1
                next_reset = now + reset_every_s
            if rebuild_at is not None and now >= rebuild_at:
                t0 = time.monotonic()
                server.rebuild(dc.replace(params, quality=params.quality * 1.1))
                rebuilds.append(round(time.monotonic() - t0, 2))
                rebuild_at = None
        final = loop.stop()
        finite = bool(
            final is not None
            and np.isfinite(np.asarray(final[1].x_vqt_smoothed)).all()
        )
        loop_stats = dict(loop.stats)
        serving_stats = dict(server.stats)
    finally:
        stop.set()
        for th in threads:
            th.join(timeout=10)
        server.close()
    wall = time.monotonic() - t_start
    # with <2 observations there is no gap statistic; report null rather
    # than writing literal NaN into the JSON artifact (unparseable strictly)
    gaps = sorted(np.diff(publish_t)) if len(publish_t) > 1 else []
    return {
        "leg": leg,
        "minutes": minutes,
        "n_streams": n_streams,
        "rate_hz": rate_hz,
        "path": path,
        "fast": fast,
        "hops_per_dispatch": hops_per_dispatch,
        "publish": publish,
        "wall_s": round(wall, 1),
        # audio actually advanced through analysis per stream-second of wall
        "served_realtime_fraction": round(
            (serving_stats["advanced"] - advanced0) * (server._hop / sr)
            / (n_streams * wall), 3
        ),
        "published": loop_stats["published"],
        "published_per_s": round(loop_stats["published"] / wall, 2),
        # the consumer always reads the NEWEST hop (latest-wins, like a
        # display client); it observes fewer publishes than the loop makes
        # when its own fetch round-trip exceeds the publish period
        "consumer_observed": len(publish_t),
        "consumer_gap_p50_ms": (
            round(float(gaps[len(gaps) // 2]) * 1e3, 1) if gaps else None
        ),
        "consumer_gap_p95_ms": (
            round(float(gaps[int(len(gaps) * 0.95)]) * 1e3, 1) if gaps else None
        ),
        "samples_ingested": sum(writes),
        "ingest_realtime_fraction": round(sum(writes) / (n_streams * sr * wall), 3),
        "resets": resets,
        "rebuild_wall_s": rebuilds,
        "outputs_finite": finite,
        "loop_stats": loop_stats,
        "serving_stats": serving_stats,
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--streams", type=int, default=3840)
    ap.add_argument("--server-streams", type=int, default=1024)
    ap.add_argument("--capacity-streams", type=int, default=3840)
    ap.add_argument("--capacity-hops-per-call", type=int, default=16)
    ap.add_argument("--loop-streams", type=int, default=512)
    ap.add_argument("--loop-throughput-hops", type=int, default=16)
    ap.add_argument("--loop-cadenced-hops", type=int, default=8)
    ap.add_argument("--minutes", type=float, default=3.0)
    ap.add_argument("--out", default="artifacts/SOAK.json")
    ap.add_argument("--skip-server", action="store_true")
    ap.add_argument("--skip-capacity", action="store_true")
    ap.add_argument("--skip-pipeline", action="store_true")
    ap.add_argument("--skip-loop", action="store_true")
    args = ap.parse_args(argv)

    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    # skipped legs keep their previous results (re-run one leg without
    # discarding the others' committed evidence)
    report: dict = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                report = json.load(f)
        except (OSError, json.JSONDecodeError):
            report = {}
    # per-leg "minutes" is authoritative (skipped legs keep their own);
    # this top-level field describes THIS invocation only
    report["minutes_per_leg"] = args.minutes
    if not args.skip_pipeline:
        report["pipeline"] = soak_pipeline(args.streams, args.minutes)
        print(json.dumps(report["pipeline"]), flush=True)
    from ..runtime.native import available

    if not args.skip_server:
        if available():
            report["server"] = soak_server(args.server_streams, args.minutes)
            print(json.dumps(report["server"]), flush=True)
        else:
            report["server"] = {"skipped": "native library unavailable"}
    if not args.skip_capacity:
        # claimed-capacity live-ingest leg: full stream count, batched
        # producers, THROUGHPUT serving (step_multi) — the deployment shape
        # the ~3,800-streams/chip claim describes (docs/DEPLOYMENT.md §2)
        if available():
            report["server_capacity"] = soak_server(
                args.capacity_streams, args.minutes,
                hops_per_call=args.capacity_hops_per_call,
                leg="server_capacity",
            )
            print(json.dumps(report["server_capacity"]), flush=True)
        else:
            report["server_capacity"] = {"skipped": "native library unavailable"}
    if not args.skip_loop:
        if available():
            report["serve_loop"] = soak_serve_loop(args.loop_streams, args.minutes)
            print(json.dumps(report["serve_loop"]), flush=True)
            # throughput cadence: serve(hops_per_dispatch=k) — each dispatch
            # scan-amortizes k ingest-fed hops and publishes the newest, so
            # the audio cadence holds rate_hz through a networked tunnel
            # whose per-dispatch round-trip exceeds the hop period
            report["serve_loop_throughput"] = soak_serve_loop(
                args.loop_streams, args.minutes,
                hops_per_dispatch=args.loop_throughput_hops,
                leg="serve_loop_throughput",
            )
            print(json.dumps(report["serve_loop_throughput"]), flush=True)
            # cadenced interactive mode: publish="per_hop" — one fused k-hop
            # dispatch, ONE barrier, every hop published on its own grid
            # slot, so 60 device-complete hops/s hold through a tunnel whose
            # round-trip exceeds the hop period (runtime/loop.py::
            # _run_cadenced; the round-5 interactive-cadence fix)
            report["serve_loop_cadenced"] = soak_serve_loop(
                args.loop_streams, args.minutes,
                hops_per_dispatch=args.loop_cadenced_hops,
                publish="per_hop",
                leg="serve_loop_cadenced",
            )
            print(json.dumps(report["serve_loop_cadenced"]), flush=True)
        else:
            report["serve_loop"] = {"skipped": "native library unavailable"}
            report["serve_loop_throughput"] = {"skipped": "native library unavailable"}
            report["serve_loop_cadenced"] = {"skipped": "native library unavailable"}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
