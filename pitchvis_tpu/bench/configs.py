"""The benchmark configurations, reproducible on one chip. The five
BASELINE.json families plus their fast-path / latency / parallel variants
(see ALL_CONFIGS at the bottom — 13 entries):

1. offline_vqt[_bf16]  — batched offline VQT, default params
2. streaming[...]      — ring + dagc AGC + VQT + EMA @ 60 Hz hops, incl.
                         the bf16 Pallas serving path and the fused
                         (ML+LED) step; `latency` is the un-amortized
                         per-hop p50/p95
3. analysis            — full analysis chain (peaks, calmness, tuning)
4. serial              — spectrum -> colors -> 0xFF-framed LED byte stream
5. train[_corpus]      — MIDI -> SF2 render -> batched VQT labels ->
                         inference; _corpus adds the rayon-style file pool
6. render              — the headless-viewer rasterizer (scene -> uint8
                         frames), a TPU-native extension

Each bench returns a dict with metric/value/unit/vs_baseline. The reference
baseline for VQT-bound configs is 6,060 frames/s (0.165 ms/frame on one CPU
core, VQT_REVIEW.md:12-15); the serial path baseline is its 30 FPS loop rate;
train-config baseline is frames labeled per second (reference: single frame
VQT per rayon task, same 0.165 ms scale at Q=10).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_VQT_FPS = 6060.0


def _sync(out):
    """Hard execution barrier: fetch one element of one output buffer.
    (block_until_ready does not reliably wait on the axon tunnel platform;
    a host transfer of any output requires the execution to have finished.)"""
    leaves = [a for a in jax.tree.leaves(out) if hasattr(a, "ravel")]
    if leaves:
        np.asarray(leaves[0].ravel()[0])
    return out


def _best_time(fn, n_iter=10, repeats=3):
    _sync(fn())  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(n_iter):
            out = fn()
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best


def bench_offline_vqt(
    batch: int = 2048, path: str = "pallas", inner: int = 32, fast: bool = False
) -> dict:
    """Headline: batched VQT throughput. The timed unit is ONE device
    program that runs `inner` VQT batches in a lax.scan (input perturbed per
    iteration to defeat CSE) and reduces the outputs to a scalar — immune to
    dispatch-pipelining artifacts and impossible to satisfy without doing
    the work.

    fast=True benches the bf16 fast mode (ops/vqt.py: bf16 weights, one MXU
    pass, f32 accumulation) on the dense time path."""
    import jax.numpy as jnp

    from ..core.config import VqtParameters
    from ..kernel.builder import get_kernel
    from ..ops.vqt import VqtArrays, vqt_db_batch

    params = VqtParameters()
    kernel = get_kernel(params)
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((batch, params.n_fft)).astype(np.float32) * 0.1)

    if path == "pallas":
        from ..ops.vqt_pallas import PallasVqtArrays, vqt_db_pallas

        arrays = PallasVqtArrays.from_kernel(
            kernel, dtype=jnp.bfloat16 if fast else jnp.float32
        )
        # bt=512 measured ~5% over 256 (fewer weight re-streams per batch)
        compute = lambda a, xi: vqt_db_pallas(a, xi, batch_tile=512)
    else:
        arrays = VqtArrays.from_kernel(
            kernel, dtype=jnp.bfloat16 if fast else jnp.float32
        )
        precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
        compute = lambda a, xi: vqt_db_batch(a, xi, path=path, precision=precision)

    @jax.jit
    def run(arrays, x):
        def body(carry, i):
            out = compute(arrays, x * (1.0 + 1e-6 * i))
            return carry + jnp.sum(out), None
        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(inner, dtype=jnp.float32))
        return total

    float(run(arrays, x))  # warm + hard barrier (see _sync)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(arrays, x))
        best = min(best, time.perf_counter() - t0)
    fps = batch * inner / best
    return {
        "metric": "vqt_bf16_frames_per_sec_per_chip" if fast else "vqt_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_VQT_FPS, 2),
    }


def bench_streaming(
    n_streams: int = 512,
    hops_per_call: int = 8,
    fused: bool = False,
    path: str = "time",
    fast: bool = False,
    with_viewer: bool = False,
) -> dict:
    """Config #2: 60 Hz hops through ring+AGC+VQT+analysis; measures
    aggregate realtime factor per chip (streams * realtime). Hops are
    micro-batched over time (lax.scan inside one device call) to amortize
    dispatch, the intended shape for >realtime workloads.

    fused=True additionally runs the ML inference and LED color stages in
    the SAME device program (the reference's single frame update,
    common.rs:2076-2118) — the overhead vs analysis-only is the fusion
    cost of the full display-ready serving step. path="pallas" + fast=True
    serve the flagship bf16 fused-Pallas VQT (round-3: the fastest kernel
    now rides the serving pipeline). with_viewer=True (implies fused) also
    fuses every update_display-derived output (pitch balls with fade
    carry, chroma, bloom, spectrogram rows, bass spiral, calmness
    histogram — the complete per-stream display state short of pixels)."""
    if with_viewer:
        fused = True
    from ..core.config import VqtParameters
    from ..models.pipeline import StreamingPipeline

    params = VqtParameters()
    if fused:
        from ..models.pitch_mlp import PitchMLP

        t_window = 3
        model = PitchMLP(input_bins=t_window * params.n_buckets)
        mp = model.init(
            jax.random.PRNGKey(0),
            np.zeros((1, 1, t_window * params.n_buckets), np.float32),
        )
        pipe = StreamingPipeline(
            n_streams, params, ml_model=model, ml_params=mp,
            ml_t_window=t_window, with_led=True, path=path, fast=fast,
            with_viewer=with_viewer,
        )
    else:
        pipe = StreamingPipeline(n_streams, params, path=path, fast=fast)
    hop = int(params.sr / 60.0)
    rng = np.random.default_rng(0)
    chunks = jax.device_put(
        rng.standard_normal((hops_per_call, n_streams, hop)).astype(np.float32) * 0.05
    )
    dt_hop = hop / params.sr

    def step():
        return pipe.step_multi(chunks, dt_hop)

    dt = _best_time(step, n_iter=5) / hops_per_call
    realtime_factor = n_streams * dt_hop / dt
    name = "streaming_fused" if fused else "streaming"
    if with_viewer:
        name += "_viewer"
    if path == "pallas":
        name += "_pallas_bf16" if fast else "_pallas"
    return {
        "metric": f"{name}_realtime_factor_per_chip",
        "value": round(realtime_factor, 1),
        "unit": "x realtime (aggregate)",
        "vs_baseline": round(realtime_factor / 100.0, 2),  # ~100x realtime/core ref
    }


def bench_latency(
    n_streams: int = 512, iters: int = 60, path: str = "pallas", fast: bool = True
) -> dict:
    """Config #2b: per-hop serving LATENCY of the realtime loop — dispatch
    through the tunnel + device compute + host fetch for ONE 60 Hz hop, the
    number an interactive deployment actually feels (the reference's frame
    budget is 16.7 ms at 60 FPS). Unlike the throughput configs this is
    deliberately NOT scan-amortized. Reports the median over `iters` hops;
    p95 recorded alongside (tunnel dispatch is bursty). vs_baseline =
    16.7 ms budget / p50 (headroom factor)."""
    from ..core.config import VqtParameters
    from ..models.pipeline import StreamingPipeline

    params = VqtParameters()
    pipe = StreamingPipeline(n_streams, params, path=path, fast=fast)
    hop = int(params.sr / 60.0)
    rng = np.random.default_rng(0)
    chunk = (rng.standard_normal((n_streams, hop)) * 0.05).astype(np.float32)
    dt_hop = hop / params.sr

    _sync(pipe.step(chunk, dt_hop))  # compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = pipe.step(chunk, dt_hop)
        _sync(out)  # hard barrier: latency includes the result fetch
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]
    p95 = times[int(len(times) * 0.95)]

    # one-deep pipelining: dispatch hop N+1 BEFORE fetching hop N's result.
    # On a co-located chip this overlaps fetch with the next hop's compute;
    # through THIS networked tunnel it measures ~= the synchronous p50
    # (dispatch itself blocks on a transport round-trip), which is why the
    # documented mitigation for this deployment shape is hop micro-batching
    # (pipeline_step_multi), not client-side pipelining.
    prev = pipe.step(chunk, dt_hop)
    t0 = time.perf_counter()
    for _ in range(iters):
        nxt = pipe.step(chunk, dt_hop)
        _sync(prev)
        prev = nxt
    pipelined = (time.perf_counter() - t0) / iters
    _sync(prev)
    result = {
        "metric": "serving_hop_latency_p50_ms",
        "value": round(p50 * 1e3, 2),
        "unit": "ms",
        "vs_baseline": round((1000.0 / 60.0) / (p50 * 1e3), 2),
        "p95_ms": round(p95 * 1e3, 2),
        "pipelined_hop_ms": round(pipelined * 1e3, 2),
        "n_streams": n_streams,
    }

    # the SHIPPED serving mode: StreamServer.step(pipelined=True) — the hop
    # the production server actually charges its caller (host snapshot +
    # dispatch + previous hop's fetch, overlapping device compute).
    from ..runtime.native import available as native_available

    if native_available():
        from ..runtime.server import StreamServer

        srv = StreamServer(n_streams, params, buffer_seconds=1.0, path=path, fast=fast)
        srv.push(0, chunk[0])
        _sync(srv.step(dt=dt_hop))  # compile
        srv.step(pipelined=True, dt=dt_hop)  # prime the one-deep queue
        stimes = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = srv.step(pipelined=True, dt=dt_hop)
            _sync(out)
            stimes.append(time.perf_counter() - t0)
        _sync(srv.flush())
        stimes.sort()
        result["server_pipelined_hop_p50_ms"] = round(stimes[len(stimes) // 2] * 1e3, 2)
        result["server_pipelined_hop_p95_ms"] = round(
            stimes[int(len(stimes) * 0.95)] * 1e3, 2
        )

        # throughput deployments: step_multi(k) scan-amortizes k ingest-fed
        # hops into ONE dispatch — the per-hop charge divides by k (this is
        # how the >3,000-stream capacity figure is actually served).
        k = 8
        _sync(srv.step_multi(k, dt=dt_hop)[0])  # compile the multi program
        mtimes = []
        for _ in range(max(8, iters // k)):
            t0 = time.perf_counter()
            out, _ = srv.step_multi(k, dt=dt_hop)
            _sync(out)
            mtimes.append((time.perf_counter() - t0) / k)
        mtimes.sort()
        result["server_multi_hop_ms"] = round(mtimes[len(mtimes) // 2] * 1e3, 2)
        result["server_multi_k"] = k

        # the self-driving loop (serve()): consumer-observed gap between
        # published device-complete hops at the 60 Hz target cadence
        loop = srv.serve(rate_hz=60.0)
        gaps = []
        last = 0
        prev_t = None
        while len(gaps) < iters:
            trip = loop.wait_next(seq=last, timeout=30.0)
            if trip is None:
                break
            last = trip[0]
            now = time.perf_counter()
            if prev_t is not None:
                gaps.append(now - prev_t)
            prev_t = now
        loop.stop()
        if gaps:
            gaps.sort()
            result["serve_loop_gap_p50_ms"] = round(gaps[len(gaps) // 2] * 1e3, 2)
            result["serve_loop_gap_p95_ms"] = round(
                gaps[int(len(gaps) * 0.95)] * 1e3, 2
            )
        srv.close()
    return result


def bench_analysis(n_streams: int = 2048, inner: int = 32) -> dict:
    """Config #3: full analysis chain. Like the VQT headline, the timed unit
    is one device program scanning `inner` steps (state threaded through the
    scan, input perturbed against CSE) — per-call dispatch through the
    tunnel costs up to ~30 ms in throttled windows and would otherwise
    dominate the measurement."""
    from ..core.config import AnalysisParameters, VqtParameters
    from ..models.analysis import analysis_step_batch, init_state_batch

    params = VqtParameters()
    aparams = AnalysisParameters()
    n = params.n_buckets
    state = init_state_batch(n_streams, n)
    rng = np.random.default_rng(0)
    x = jax.device_put((rng.random((n_streams, n)) * 30).astype(np.float32))

    @jax.jit
    def run(state, x):
        def body(s, i):
            s, out = analysis_step_batch(aparams, params.range, s, x * (1.0 + 1e-4 * i), 1.0 / 60.0)
            return s, jnp.sum(out.peak_size)
        _, sums = jax.lax.scan(body, state, jnp.arange(inner, dtype=jnp.float32))
        return sums[-1]

    float(run(state, x))  # warm + hard barrier
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(state, x))
        best = min(best, time.perf_counter() - t0)
    fps = n_streams * inner / best
    return {
        "metric": "analysis_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_VQT_FPS, 2),
    }


def bench_serial(n_streams: int = 2048, inner: int = 32) -> dict:
    """Config #4: spectrum -> peak splat -> LCh color mapping -> u8 LED
    values. Scan-amortized inside one device program like the other
    throughput configs (the stage itself is tiny — per-call dispatch through
    the tunnel would dominate by 100x otherwise)."""
    from ..core.config import SERIAL_VQT_PARAMETERS
    from ..io.led import led_frame_values

    rng_cfg = SERIAL_VQT_PARAMETERS.range
    n = rng_cfg.n_buckets
    rng = np.random.default_rng(0)
    mask = jnp.asarray(rng.random((n_streams, n)) > 0.9)
    center = jnp.asarray(np.tile(np.arange(n, dtype=np.float32) + 0.3, (n_streams, 1)))
    size = jax.device_put((rng.random((n_streams, n)) * 20).astype(np.float32))

    batched = jax.vmap(lambda m, c, s: led_frame_values(rng_cfg, m, c, s))

    @jax.jit
    def run(mask, center, size):
        def body(carry, i):
            out = batched(mask, center, size * (1.0 + 1e-4 * i))
            return carry + jnp.sum(out.astype(jnp.float32)), None
        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(inner, dtype=jnp.float32))
        return total

    float(run(mask, center, size))  # warm + hard barrier
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(mask, center, size))
        best = min(best, time.perf_counter() - t0)
    fps = n_streams * inner / best
    return {
        "metric": "led_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 2),  # reference loop runs at 30 FPS
    }


def bench_train(seconds: float = 12.0, device_gen: bool = False) -> dict:
    """Config #5: MIDI -> SoundFont-rendered audio -> batched VQT labels ->
    model inference; measures labeled frames per second end to end. Default
    mirrors the reference train.rs (rustysynth + SF2 rendering, AGC, voice
    snapshots): the full engine's render loop runs in native C++
    (native/synth_engine.cpp) and the VQT labeling is batched on-device.
    device_gen=True instead uses the fully on-device generator
    (train/device_dataset.py), whose scan-based AGC amortizes when many
    files run as one batch."""
    import os
    import tempfile

    from ..core.config import TRAIN_VQT_PARAMETERS
    from ..models.pitch_mlp import PitchMLP
    from ..ops.vqt import Vqt
    from ..synth.midi import load_midi, write_midi
    from ..synth.sf2 import SoundFont, write_minimal_sf2
    from ..train.dataset import annotate_midi
    from ..train.device_dataset import annotate_midi_device

    params = TRAIN_VQT_PARAMETERS
    vqt = Vqt(params)
    with tempfile.TemporaryDirectory() as d:
        font = None
        if not device_gen:
            # a small GM-ish font: looped sine sample, full key range
            sr = int(params.sr)
            sf_path = os.path.join(d, "bench.sf2")
            wave = 0.7 * np.sin(2 * np.pi * np.arange(sr // 2) * 441.0 / sr)
            write_minimal_sf2(sf_path, wave, sr, root_key=69, loop=True)
            font = SoundFont.from_file(sf_path)

        def annotate(m, **kw):
            if device_gen:
                return annotate_midi_device(m, vqt, params, **kw)
            return annotate_midi(m, vqt, params, sound_font=font, **kw)

        midi_path = os.path.join(d, "bench.mid")
        notes = [(i * 0.25, 0.4, 0, 40 + (i % 24), 100) for i in range(int(seconds * 4))]
        write_midi(midi_path, notes)
        midi = load_midi(midi_path)
        annotate(midi, max_seconds=seconds)  # warm compile
        t0 = time.perf_counter()
        annotated = annotate(midi, max_seconds=seconds)
        gen_dt = time.perf_counter() - t0

    model = PitchMLP(input_bins=5 * params.n_buckets)
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 5 * params.n_buckets)))
    frames = jnp.asarray(np.stack([a[1] for a in annotated]))
    windows = jnp.stack([frames[i : i + 5].reshape(-1) for i in range(len(annotated) - 4)])
    infer = jax.jit(lambda w: model.apply(mp, w[:, None, :]))
    infer_dt = _best_time(lambda: infer(windows), n_iter=5)

    fps = len(annotated) / (gen_dt + infer_dt)
    return {
        "metric": "train_labeled_frames_per_sec",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 2),  # ~1 frame per vqt-delay chunk x3
    }


def bench_train_corpus(
    n_files: int = 6, seconds: float = 8.0, n_workers: int = 4
) -> dict:
    """Config #5b: multi-file corpus generation (the reference's rayon
    par_iter over MIDI files, train.rs:146-153) through the GIL-releasing
    native thread pool (train/dataset.py n_workers). Reports the parallel
    labeled-frames/s; the extra "speedup_vs_serial" key records the measured
    gain over n_workers=1 on THIS host — on a multi-core host the native
    render scales near-linearly, on a single-core host (this VM: nproc=1)
    only the render/device-VQT overlap remains."""
    import os
    import tempfile

    from ..core.config import TRAIN_VQT_PARAMETERS
    from ..synth.midi import write_midi
    from ..synth.sf2 import write_minimal_sf2
    from ..train.dataset import generate_dataset

    params = TRAIN_VQT_PARAMETERS
    sr = int(params.sr)
    with tempfile.TemporaryDirectory() as d:
        sf_path = os.path.join(d, "bench.sf2")
        wave = 0.7 * np.sin(2 * np.pi * np.arange(sr // 2) * 441.0 / sr)
        write_minimal_sf2(sf_path, wave, sr, root_key=69, loop=True)
        paths = []
        for i in range(n_files):
            p = os.path.join(d, f"{i}.mid")
            notes = [
                (j * 0.25, 0.4, 0, 36 + ((j + 5 * i) % 36), 100)
                for j in range(int(seconds * 4))
            ]
            write_midi(p, notes)
            paths.append(p)
        kw = dict(
            params=params, sound_font_path=sf_path, max_seconds_per_file=seconds
        )
        generate_dataset(paths[:1], n_workers=1, **kw)  # warm compile caches

        t0 = time.perf_counter()
        serial = generate_dataset(paths, n_workers=1, **kw)
        dt_serial = time.perf_counter() - t0
        t0 = time.perf_counter()
        parallel = generate_dataset(paths, n_workers=n_workers, **kw)
        dt_parallel = time.perf_counter() - t0
    row = params.n_buckets + 128
    frames = len(parallel) // row
    assert len(serial) == len(parallel)
    fps = frames / dt_parallel
    return {
        "metric": "train_corpus_labeled_frames_per_sec",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 2),  # same scale as bench_train
        "speedup_vs_serial": round(dt_serial / dt_parallel, 2),
        "n_workers": n_workers,
    }


def bench_render(
    n_streams: int = 64,
    width: int = 640,
    height: int = 360,
    max_balls: int = 64,
    inner: int = 4,
) -> dict:
    """Config #6 (TPU-native extension; the reference renders ONE stream
    through a GPU-backed window at 60 FPS): the headless-viewer rasterizer
    (models/render.py — spider net, bass spiral, WGSL ball fragment, bloom,
    tonemap) as a reproducible throughput number. Renders a B-stream batch
    of live 3-peak scenes at ``width``x``height``, scan-amortized over
    ``inner`` display frames with the shader ``time`` advancing per frame
    (which also defeats CSE). vs_baseline = rendered frames/s / 60 = how
    many realtime 60 FPS displays one chip sustains."""
    from ..core.config import VqtParameters
    from ..models.render import RenderConfig, _render_frame_impl, make_scene
    from ..models.viewer import BallState, bass_spiral, update_balls

    rng_cfg = VqtParameters().range
    n = rng_cfg.n_buckets
    cfg = RenderConfig(width=width, height=height, max_balls=max_balls)
    st = make_scene(cfg, rng_cfg)

    rng = np.random.default_rng(0)
    peaks = np.zeros((n_streams, n), bool)
    center = np.tile(np.arange(n, dtype=np.float32), (n_streams, 1))
    size = np.zeros((n_streams, n), np.float32)
    for b in range(n_streams):
        bins = rng.choice(np.arange(12, n - 12), size=3, replace=False)
        peaks[b, bins] = True
        center[b, bins] = bins + rng.uniform(-0.4, 0.4, 3)
        size[b, bins] = rng.uniform(8.0, 25.0, 3)
    calm = np.full((n_streams, n), 0.5, np.float32)
    acc = np.full((n_streams, n), 0.9, np.float32)
    dev = np.full((n_streams, n), 0.1, np.float32)

    balls = jax.vmap(
        lambda p, c, s, cl, a, d: update_balls(
            rng_cfg, BallState.init(n), p, c, s, cl, a, d, 1.0 / 60.0
        )[1]
    )(
        jnp.asarray(peaks), jnp.asarray(center), jnp.asarray(size),
        jnp.asarray(calm), jnp.asarray(acc), jnp.asarray(dev),
    )
    bass = jax.vmap(lambda p, c, s: bass_spiral(rng_cfg, p, c, s))(
        jnp.asarray(peaks), jnp.asarray(center), jnp.asarray(size)
    )
    scene_calm = jnp.full((n_streams,), 0.5, jnp.float32)

    @jax.jit
    def run(balls, bass, scene_calm, times):
        def body(carry, t):
            out = jax.vmap(
                lambda ba, bs, sc: _render_frame_impl(
                    cfg, rng_cfg, st.background, st.bass_idx, st.bass_cov,
                    st.text_premul, st.text_a,
                    ba, bs, sc, t,
                )
            )(balls, bass, scene_calm)
            return carry + jnp.sum(out.astype(jnp.uint32)), None

        total, _ = jax.lax.scan(
            body, jnp.uint32(0), times
        )
        return total

    times = jnp.arange(inner, dtype=jnp.float32) / 60.0
    best = _best_time(lambda: run(balls, bass, scene_calm, times), n_iter=1)
    fps = n_streams * inner / best
    return {
        "metric": "render_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 2),
        "raster": f"{width}x{height}",
        "max_balls": max_balls,
    }


ALL_CONFIGS = {
    "offline_vqt": bench_offline_vqt,
    "offline_vqt_bf16": lambda: bench_offline_vqt(fast=True),
    "streaming": bench_streaming,
    "streaming_pallas_bf16": lambda: bench_streaming(
        n_streams=2048, path="pallas", fast=True
    ),
    "streaming_fused": lambda: bench_streaming(fused=True),
    # the TRUE flagship serving number: the full display-ready step (ML +
    # LED fused) on the fastest VQT kernel
    "streaming_fused_pallas_bf16": lambda: bench_streaming(
        fused=True, path="pallas", fast=True
    ),
    # ...and with the complete viewer stage fused too (every
    # update_display-derived output, short of rasterized pixels)
    "streaming_fused_viewer_pallas_bf16": lambda: bench_streaming(
        with_viewer=True, path="pallas", fast=True
    ),
    "latency": bench_latency,
    "analysis": bench_analysis,
    "serial": bench_serial,
    "train": bench_train,
    "train_corpus": bench_train_corpus,
    "render": bench_render,
}
