"""Multi-stream serving runtime.

Combines the native lock-free ring bank (ingest side, written by arbitrary
producer threads) with the jitted device pipeline (compute side). In the
default ``ingest="delta"`` mode the rolling analysis windows live ON the
device: each hop the analysis thread consumes only the newly pushed samples
per stream (native read cursors, freeze-on-underrun) and the fused program
rolls the windows, runs the VQT + analysis (+ optional ML/LED/viewer
stages), optionally sharded over every local chip. This is the production
counterpart of the reference's audio-thread / main-thread split
(pitchvis_viewer/src/vqt_system.rs:40-68) scaled to thousands of streams
per chip; ``ingest="snapshot"`` keeps the original re-ship-the-window data
path for parity tests and one-shot analyses.

AGC runs in the native ingest (per-chunk, like the reference's audio
callback), so the device pipeline receives pre-gained samples; the device
ring/AGC path (models/pipeline.py) remains available for fully-on-device
deployments where producers feed fixed-size batches directly.
"""

from __future__ import annotations

import threading
import time

import jax
import numpy as np

from flax import struct

from ..core.config import AnalysisParameters, VqtParameters
from ..kernel.builder import get_kernel
from ..models.analysis import AnalysisOutputs, analysis_step_batch, init_state_batch
from ..ops.vqt import make_vqt_arrays, vqt_db_auto
from ..models.pipeline import build_rebuilt_arrays, derived_stages, reset_state_row
from .native import NativeRingBank, NativeResamplerBank, available as native_available


class ServeOutputs(struct.PyTreeNode):
    """Per-hop outputs when any fused output stage (ML / LED / viewer) is
    enabled on the server; mirrors models.pipeline.PipelineOutputs minus the
    device-ring diagnostics (gains come from the native ingest)."""

    analysis: AnalysisOutputs
    ml_midi: object = None  # (B, 128) MIDI strengths when ml_model is set
    led: object = None  # (B, n_buckets, 3) u8 LED colors when with_led
    viewer: object = None  # models.pipeline.ViewerOutputs when with_viewer


class CompactOutputs(struct.PyTreeNode):
    """fetch="led": only what an LED/display consumer reads per hop — cuts
    the per-hop fetch from the ~10 MB full analysis pytree (B=512) to
    ~0.9 MB of u8 colors plus two scalars per stream."""

    led: object  # (B, n_buckets, 3) u8
    scene_calmness: object  # (B,)
    tuning_inaccuracy: object  # (B,)


class StreamServer:
    """Ingest + batched analysis server for `n_streams` concurrent streams."""

    def __init__(
        self,
        n_streams: int,
        vqt_params: VqtParameters | None = None,
        analysis_params: AnalysisParameters | None = None,
        buffer_seconds: float = 4.0,
        path: str = "time",
        fast: bool = False,
        ingest: str = "delta",
        hop_seconds: float = 1.0 / 60.0,
        max_lag_seconds: float = 0.25,
        max_catchup_hops: int = 1,
        ml_model=None,
        ml_params=None,
        ml_t_window: int | None = None,
        with_led: bool = False,
        with_viewer: bool = False,
        fetch: str = "full",
        mesh=None,
    ):
        """``path="pallas"`` serves the fused Pallas VQT kernel (the repo's
        fastest); ``fast=True`` additionally stores the weights in bf16
        (error budget: tests/test_bf16.py). Reference analog: the viewer's
        one VQT in its frame loop (pitchvis_viewer/src/vqt_system.rs:40-68).

        ``ingest`` picks how audio reaches the device each hop:

        * ``"delta"`` (default) — the rolling analysis window lives ON the
          device; each hop ships only the newly ingested ``hop_seconds`` of
          samples per stream (~50x fewer bytes than re-shipping the window,
          which measured as THE hop cost: 16 MB ring copy + 8 MB tunnel
          send per hop at B=512 vs ~0.8 MB total here). Underrunning
          producers freeze their window (all-or-nothing consume — same
          stall a trailing snapshot gives them); backlogs drain via up to
          ``max_catchup_hops`` extra fused hops per step and are skipped
          realtime-style beyond ``max_lag_seconds``. The window is
          (re)materialized from the full ring on the first step and after
          rebuild()/restore, so push-then-serve warmups see all audio.
        * ``"snapshot"`` — re-ship the trailing window every hop (simplest
          data path; kept for parity tests and one-shot analyses).

        Fused output stages (the same stages models.pipeline fuses into its
        step): ``ml_model``/``ml_params`` adds the ML inference with its
        rolling smoothed-VQT history; ``with_led`` the per-stream LED color
        block; ``with_viewer`` every display-derived output (pitch balls
        with fade carry, chroma, bloom, spectrogram row, bass spiral,
        calmness histogram). When any is enabled, step() returns
        ``ServeOutputs``; otherwise the bare analysis outputs (unchanged
        API). ``fetch="led"`` (implies with_led) returns ``CompactOutputs``
        — just LED bytes + scene scalars, ~10x fewer fetch bytes for
        display-only deployments.

        ``mesh`` (a ``jax.sharding.Mesh``, e.g. ``parallel.sharding.
        make_mesh()``) shards the stream batch over the mesh's chips: the
        fused programs are wrapped in ``shard_map`` (the Pallas kernel is a
        Mosaic custom call GSPMD cannot split on its own), each chip serves
        its contiguous slice of streams, and the program stays
        collective-free (streams are independent). ``n_streams`` must be
        divisible by the mesh size. One server process then drives every
        local chip; multi-HOST scale-out composes this with per-host
        servers (runtime/multihost_serve.py)."""
        if not native_available():
            raise RuntimeError(
                "native runtime unavailable — use models.pipeline.StreamingPipeline"
            )
        if ingest not in ("delta", "snapshot"):
            raise ValueError(f"ingest must be 'delta' or 'snapshot', got {ingest!r}")
        if fetch not in ("full", "led"):
            raise ValueError(f"fetch must be 'full' or 'led', got {fetch!r}")
        if fetch == "led":
            with_led = True
        if mesh is not None and n_streams % mesh.size != 0:
            raise ValueError(
                f"n_streams {n_streams} must divide evenly over the "
                f"{mesh.size}-device mesh"
            )
        self.mesh = mesh
        self.vqt_params = vqt_params or VqtParameters()
        self.analysis_params = analysis_params or AnalysisParameters()
        self.path = path
        self.fast = fast
        self.ingest = ingest
        self._hop = max(1, int(self.vqt_params.sr * hop_seconds))
        self._max_lag = max(self._hop, int(self.vqt_params.sr * max_lag_seconds))
        self._max_catchup = max(0, int(max_catchup_hops))
        self._window = None  # device-resident rolling window (delta mode)
        self.kernel = get_kernel(self.vqt_params)
        self.arrays = make_vqt_arrays(self.kernel, path=path, fast=fast)
        capacity = max(int(round(self.vqt_params.sr * buffer_seconds)), self.vqt_params.n_fft)
        if self._hop > capacity:
            # pv_rb_consume's all-or-nothing read could then NEVER be
            # satisfied (max_lag clamps to capacity < hop): every stream
            # would silently freeze forever
            raise ValueError(
                f"hop_seconds ({self._hop} samples) exceeds the ring "
                f"capacity ({capacity}); raise buffer_seconds or lower the hop"
            )
        self.rings = NativeRingBank(n_streams, capacity)
        self.analysis_state = init_state_batch(n_streams, self.vqt_params.n_buckets)
        self.n_streams = n_streams
        # fused output stages (mirroring models.pipeline.pipeline_step)
        self.ml_model, self.ml_params = ml_model, ml_params
        if ml_model is not None and ml_t_window is None:
            from ..models.pitch_mlp import DEFAULT_T

            ml_t_window = DEFAULT_T
        self._ml_t = ml_t_window
        self.with_led, self.with_viewer, self.fetch = with_led, with_viewer, fetch
        self.ml_state = self._init_ml(n_streams)
        self.balls_state = self._init_balls(n_streams)
        if mesh is not None:
            from ..parallel.sharding import replicate

            self.analysis_state = self._put_state(self.analysis_state)
            self.ml_state = self._put_state(self.ml_state)
            self.balls_state = self._put_state(self.balls_state)
            if self.ml_params is not None:
                self.ml_params = replicate(mesh, self.ml_params)
        self._last_step = None
        self._pending = None  # in-flight (outputs, gains) when pipelining
        self._serve_loop = None  # active self-driving loop (see serve())
        # serving observability (the reference surfaces its runtime stats in
        # the debug UI, common.rs:244-318): updated by the analysis thread,
        # read by anyone (plain ints; last-writer-wins is fine for counters)
        self.stats = {
            "hops": 0,  # fused dispatches (incl. catch-up + multi inner hops)
            "catchup_hops": 0,  # extra hops draining bursty backlogs
            "advanced": 0,  # stream-hops that consumed audio
            "frozen": 0,  # stream-hops frozen by producer underrun
            "materializations": 0,  # full-window rebuilds (init/rebuild/restore)
        }
        # serializes the read-modify-write of analysis_state between the
        # analysis thread (step) and the control plane (reset_stream): a
        # reset landing mid-step would otherwise be overwritten by step's
        # state assignment, leaving the recycled slot with the old client's
        # EMA carries
        self._state_lock = threading.Lock()
        # resets that land while a step's fused dispatch is in flight are
        # re-applied to that step's result before it is written back (the
        # dispatch captures analysis_state under the lock, so a concurrent
        # reset_stream would otherwise be overwritten)
        self._resets_in_flight: set[int] = set()
        # ingest resamplers, one bank per producer rate, created lazily
        self._resamplers: dict[int, NativeResamplerBank] = {}
        self._resampler_lock = threading.Lock()
        # memoized dispatch plans (see _refresh_dispatch): same-layout live
        # rebuilds swap kernels without re-tracing the fused programs
        self._dispatch_cache: dict = {}

        self._refresh_dispatch()

    # -- device placement (single chip or sharded over self.mesh) -------------
    def _put_batch(self, x):
        """Host batch array -> device(s); stream axis sharded over the mesh
        when one is configured (each chip receives only its slice)."""
        if self.mesh is None:
            return jax.device_put(x)
        from ..parallel.sharding import shard_batch

        return shard_batch(self.mesh, x)

    def _put_scan_batch(self, x):
        """(K, B, ...) multi-hop staging: hop axis replicated, stream axis
        sharded."""
        if self.mesh is None:
            return jax.device_put(x)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            x, NamedSharding(self.mesh, P(None, tuple(self.mesh.axis_names)))
        )

    def _put_state(self, tree):
        if self.mesh is None or tree is None:
            return tree
        from ..parallel.sharding import shard_batch

        return jax.tree.map(lambda a: shard_batch(self.mesh, a), tree)

    # -- fused-stage state helpers --------------------------------------------
    def _init_ml(self, n: int):
        if self.ml_model is None:
            return None
        from ..models.ml_system import init_ml_state_batch

        return init_ml_state_batch(n, self._ml_t, self.vqt_params.n_buckets)

    def _init_balls(self, n: int):
        if not self.with_viewer:
            return None
        import jax.numpy as jnp

        from ..models.viewer import BallState

        nb = self.vqt_params.n_buckets
        return jax.vmap(lambda _: BallState.init(nb))(jnp.arange(n))

    def _fresh_rows(self):
        """One freshly initialized (B=1) row of the full carried state tuple
        (analysis, ml, balls) — the device side of stream-slot recycling.
        Call with self._state_lock held (reads the live n_buckets)."""
        return (
            init_state_batch(1, self.vqt_params.n_buckets),
            self._init_ml(1),
            self._init_balls(1),
        )

    def _refresh_dispatch(self) -> None:
        """(Re)builds the per-parameter-set dispatch plan; called at init and
        after every rebuild()/retune_analysis(). The jitted programs take
        the kernel ARRAYS as arguments and close only over the analysis
        parameters + bin layout (+ fixed per-instance config), so the plan
        is memoized on (analysis_params, range): a same-layout VQT rebuild
        — the live-tuning hot path — swaps kernels without re-tracing, and
        the serving loop's next hop is an ordinary cached dispatch.

        Three bandwidth/latency decisions live here:

        * ONE fused jit per hop (VQT + analysis) instead of two — each
          dispatch through a networked runtime costs up to ~30 ms, and the
          two stages have no host decision between them.
        * snapshot only the window the kernel actually reads: the fused
          Pallas kernel consumes the `tail` (largest group window, 8192
          samples at defaults), not the full n_fft=32768 — 4x less
          host->device traffic on the flagship path (measured: device_put
          dominates the hop at ~60 MB/s through the tunnel).
        * bf16 fast mode casts on the HOST before the transfer — the kernel
          casts x to the weight dtype anyway (identical round-to-nearest
          numerics), so shipping bf16 halves the bytes again. Measured
          (B=256, real chip): 0.56 s full-f32 transfer -> 0.073 s
          tail-bf16, hop p50 0.62 s -> ~0.13 s.
        """
        path, arrays = self.path, self.arrays
        aparams, rng = self.analysis_params, self.vqt_params.range
        ml_model, with_led, with_viewer = self.ml_model, self.with_led, self.with_viewer
        fetch = self.fetch
        any_stage = ml_model is not None or with_led or with_viewer

        # per-rebuild plumbing that depends on the ARRAYS (not the traces)
        self._snap_len = int(getattr(arrays, "tail", self.vqt_params.n_fft))
        self._host_dtype = None
        if path == "pallas" and arrays.weights[0].dtype == jax.numpy.bfloat16:
            import ml_dtypes

            self._host_dtype = ml_dtypes.bfloat16
        if self.mesh is not None:
            from ..parallel.sharding import replicate as _replicate

            self.arrays = _replicate(self.mesh, self.arrays)

        # everything else in the plan closes only over (aparams, rng,
        # snap_len) + fixed per-instance config -> memoize the jit wrappers
        key = (aparams, rng, self._snap_len)
        cached = self._dispatch_cache.get(key)
        if cached is not None:
            (self._step_fn, self._delta_fn, self._delta_multi_fn,
             self._delta_multi_perhop_fn) = cached
            return

        import jax.numpy as jnp

        def advance(state, x_vqt, mlp, dt):
            """Analysis + fused output stages over the carried state tuple
            (analysis, ml, balls). Returns (new_state, packed outputs)."""
            analysis, ml, balls = state
            new_analysis, outputs = analysis_step_batch(aparams, rng, analysis, x_vqt, dt)
            dt_b = jnp.broadcast_to(jnp.asarray(dt, jnp.float32), (x_vqt.shape[0],))
            new_ml, ml_midi, led, new_balls, viewer = derived_stages(
                rng, outputs, dt_b,
                ml_model=ml_model, ml_params=mlp, ml_state=ml,
                with_led=with_led, balls_state=balls, with_viewer=with_viewer,
            )
            if fetch == "led":
                packed = CompactOutputs(
                    led=led,
                    scene_calmness=outputs.scene_calmness,
                    tuning_inaccuracy=outputs.tuning_inaccuracy,
                )
            elif any_stage:
                packed = ServeOutputs(
                    analysis=outputs, ml_midi=ml_midi, led=led, viewer=viewer
                )
            else:
                packed = outputs  # bare analysis outputs: the original API
            return (new_analysis, new_ml, new_balls), packed

        def fused(arrays, state, mlp, x, dt):
            x_vqt = vqt_db_auto(arrays, x, path=path)
            return advance(state, x_vqt, mlp, dt)

        snap_len = self._snap_len

        def roll_window(window, chunk, advanced):
            # roll the device-resident window by one hop; streams whose
            # producer underran keep their old window (freeze == the stall a
            # trailing snapshot would give them)
            hop = chunk.shape[1]
            if hop >= snap_len:
                rolled = chunk[:, -snap_len:]
            else:
                rolled = jnp.concatenate([window[:, hop:], chunk], axis=1)
            return jnp.where(advanced[:, None], rolled, window)

        def fused_delta(arrays, state, mlp, window, chunk, advanced, dt):
            window = roll_window(window, chunk, advanced)
            x_vqt = vqt_db_auto(arrays, window, path=path)
            new_state, packed = advance(state, x_vqt, mlp, dt)
            return new_state, window, packed

        def fused_delta_multi(arrays, state, mlp, window, chunks, advs, dt_hop):
            # K hops in one dispatch (lax.scan over the hop axis) — the
            # throughput twin of models.pipeline.pipeline_step_multi, fed by
            # the native ingest rings. Every hop advances the carried state
            # (incl. ML history and ball fades); only the LAST hop's outputs
            # are returned (intermediate pure outputs are dead code and get
            # DCE'd), so fetch bytes stay flat in K.
            def body(carry, inp):
                state, window = carry
                chunk, adv = inp
                window = roll_window(window, chunk, adv)
                x_vqt = vqt_db_auto(arrays, window, path=path)
                state, _ = advance(state, x_vqt, mlp, dt_hop)
                return (state, window), None

            (state, window), _ = jax.lax.scan(
                body, (state, window), (chunks[:-1], advs[:-1])
            )
            return fused_delta(arrays, state, mlp, window, chunks[-1], advs[-1], dt_hop)

        def fused_delta_multi_perhop(arrays, state, mlp, window, chunks, advs, dt_hop):
            # The CADENCED serving variant: same K-hop scan, but every hop's
            # packed outputs come back as a K-TUPLE of separate trees —
            # sliced INSIDE this one program, so the serve loop publishes
            # hop i with zero additional device calls (a lazy host-side
            # a[i] tree-map would cost ~n_leaves dispatch round-trips per
            # hop through a networked runtime, which measurably re-created
            # the per-hop RTT this mode exists to remove). One dispatch,
            # one barrier, K individually publishable device-complete hop
            # trees: the device advances K hops of the audio clock
            # autonomously (the reference pays zero per-frame transport —
            # its VQT runs in-process, pitchvis_viewer/src/vqt_system.rs:
            # 40-68).
            def body(carry, inp):
                state, window = carry
                chunk, adv = inp
                window = roll_window(window, chunk, adv)
                x_vqt = vqt_db_auto(arrays, window, path=path)
                state, packed = advance(state, x_vqt, mlp, dt_hop)
                return (state, window), packed

            (state, window), packed = jax.lax.scan(body, (state, window), (chunks, advs))
            k = chunks.shape[0]
            per_hop = tuple(
                jax.tree.map(lambda a, i=i: a[i], packed) for i in range(k)
            )
            return state, window, per_hop

        if self.mesh is None:
            self._step_fn = jax.jit(fused)
            self._delta_fn = jax.jit(fused_delta)
            self._delta_multi_fn = jax.jit(fused_delta_multi)
            self._delta_multi_perhop_fn = jax.jit(fused_delta_multi_perhop)
        else:
            # shard_map boundary: the Pallas kernel is a Mosaic custom call
            # GSPMD cannot split on its own (parallel/sharding.py has the
            # full rationale); each chip runs the fused program on its local
            # stream slice — collective-free by construction
            from jax.sharding import PartitionSpec as P

            mesh = self.mesh
            batch = P(tuple(mesh.axis_names))
            scan_batch = P(None, tuple(mesh.axis_names))
            rep = P()
            self._step_fn = jax.jit(jax.shard_map(
                fused, mesh=mesh,
                in_specs=(rep, batch, rep, batch, rep),
                out_specs=(batch, batch), check_vma=False,
            ))
            # dt is per-stream (B,) on the delta path (catch-up hops advance
            # only the draining streams' clocks) -> batch spec, not rep
            self._delta_fn = jax.jit(jax.shard_map(
                fused_delta, mesh=mesh,
                in_specs=(rep, batch, rep, batch, batch, batch, batch),
                out_specs=(batch, batch, batch), check_vma=False,
            ))
            self._delta_multi_fn = jax.jit(jax.shard_map(
                fused_delta_multi, mesh=mesh,
                in_specs=(rep, batch, rep, batch, scan_batch, scan_batch, rep),
                out_specs=(batch, batch, batch), check_vma=False,
            ))
            # per-hop outputs are a K-tuple of (B, ...) trees: every leaf
            # is stream-sharded like a single hop's outputs
            self._delta_multi_perhop_fn = jax.jit(jax.shard_map(
                fused_delta_multi_perhop, mesh=mesh,
                in_specs=(rep, batch, rep, batch, scan_batch, scan_batch, rep),
                out_specs=(batch, batch, batch), check_vma=False,
            ))
        self._dispatch_cache[key] = (
            self._step_fn, self._delta_fn, self._delta_multi_fn,
            self._delta_multi_perhop_fn,
        )
        if len(self._dispatch_cache) > 8:  # bound a pathological tuner storm
            self._dispatch_cache.pop(next(iter(self._dispatch_cache)))

    # -- ingest side (any thread) -------------------------------------------
    def push(self, stream: int, samples: np.ndarray, sr: float | None = None) -> bool:
        """Appends raw samples for one stream (AGC applied natively).

        ``sr`` declares the PRODUCER's sample rate: 44.1/48 kHz microphone
        feeds are resampled to the server rate in the native ingest path
        (per-stream streaming polyphase state; the reference's rubato
        FftFixedIn stage, pitchvis_audio/src/audio_wasm.rs:176-209) before
        AGC + ring write. Omit (or pass the server rate) for pre-matched
        audio. A stream must keep one rate between resets (per-stream
        single-producer contract)."""
        if sr is not None and int(sr) != int(self.vqt_params.sr):
            bank = self._resamplers.get(int(sr))
            if bank is None:
                with self._resampler_lock:
                    bank = self._resamplers.setdefault(
                        int(sr),
                        NativeResamplerBank(
                            self.n_streams, int(sr), int(self.vqt_params.sr)
                        ),
                    )
            samples = bank.process(stream, samples)
            if len(samples) == 0:
                return True  # carried to the next chunk
        return self.rings.write(stream, samples)

    def push_batch(self, samples: np.ndarray, streams: np.ndarray | None = None,
                   sr: float | None = None) -> np.ndarray:
        """Appends one equal-length chunk to MANY streams in a single
        native call: row k of ``samples`` (rows, n) goes to stream
        ``streams[k]`` (``None`` = streams 0..rows-1). This is the
        capacity-scale ingest path — per-stream ``push`` costs one
        Python/ctypes dispatch per stream per tick, which caps host
        ingest far below what the ring memcpys allow (a network/SHM
        frontend delivers audio in exactly this batched shape anyway).
        AGC is applied natively per row; returns an ok[rows] bool array
        (NaN-guard rejections per row, like ``push``).

        ``sr`` declares the producers' common sample rate; mic-rate
        batches resample per stream before the ring write (the streaming
        state is per-stream, and resampled lengths are ragged, so this
        leg falls back to per-row writes)."""
        samples = np.asarray(samples, np.float32)
        if samples.ndim != 2:
            raise ValueError(f"samples must be (rows, n), got {samples.shape}")
        rows = samples.shape[0]
        ids = (np.arange(rows, dtype=np.int64) if streams is None
               else np.ascontiguousarray(streams, np.int64))
        if ids.shape != (rows,):
            raise ValueError(f"streams shape {ids.shape} != ({rows},)")
        if rows and (ids.min() < 0 or ids.max() >= self.n_streams):
            raise ValueError("stream id out of range")
        if sr is not None and int(sr) != int(self.vqt_params.sr):
            # resampled lengths are ragged per row -> per-row writes
            return np.array(
                [self.push(int(s), row, sr=sr) for s, row in zip(ids, samples)]
            )
        return self.rings.write_batch(ids, samples)

    # -- control plane -------------------------------------------------------
    def reset_stream(self, stream: int) -> None:
        """Recycles one slot for a NEW client stream (serving churn): clears
        the native ring (audio, write position, AGC gain) and that slot's
        analysis state (EMA spectra, calmness, afterglow, tuning carries),
        so the new stream starts from the same state a fresh server would
        give it. Call from the control plane after the slot's previous
        producer has stopped; safe against a concurrent step() (the state
        update is serialized on a lock), and push() on OTHER streams is
        unaffected. A snapshot racing the native ring clear may observe one
        partially-cleared window (a single glitched frame); every later
        frame is clean."""
        self.rings.reset(stream)
        with self._resampler_lock:
            for bank in self._resamplers.values():
                bank.reset(stream)
        with self._state_lock:
            # fresh rows built INSIDE the lock: a layout-changing rebuild()
            # landing between an unlocked read and the row write would make
            # the fresh row shape-mismatched and lose the reset
            state = (self.analysis_state, self.ml_state, self.balls_state)
            state = reset_state_row(state, self._fresh_rows(), stream)
            state = self._put_state(state)  # re-pin mesh sharding (no-op otherwise)
            self.analysis_state, self.ml_state, self.balls_state = state
            if self._window is not None:
                # the recycled slot's device window still holds the OLD
                # client's audio (delta mode never re-ships it)
                self._window = self._put_batch(self._window.at[stream].set(0))
            self._resets_in_flight.add(int(stream))

    def retune_analysis(self, analysis_params: AnalysisParameters) -> None:
        """Swaps the analysis parameter set while serving — the analysis
        half of live tuning. The reference applies these per frame
        (common.rs:847-1102, plain resource mutation); here they are
        jit-static fields of the fused programs, so the swap rebuilds the
        dispatch plan (a recompile, cached per parameter set — which is why
        the tuning frontend debounces analysis keystrokes the same 2 s as
        VQT ones, io/keytune.py). State carries are shape-independent of
        these parameters and persist."""
        with self._state_lock:
            self.analysis_params = analysis_params
            self._refresh_dispatch()

    def rebuild(self, vqt_params: VqtParameters) -> None:
        """Swaps in a new VQT parameter set while serving — the live-tuning
        story end to end: feed `core.tuning.ParameterTuner.take_rebuilt()`'s
        output here (the reference's debounced rebuild swaps its VQT
        resource the same way, common.rs:1105-1165). Rebuilds the kernel +
        device arrays (cached if seen before); the ring bank and its audio
        are preserved (raw samples are parameter-independent). Analysis
        carries persist when the bin layout is unchanged and are
        re-initialized when it changes (EMA state is bin-indexed).
        Raises ValueError for parameter sets this server cannot host
        (different sample rate, n_fft beyond the ring capacity)."""
        kernel, arrays, layout_changed = build_rebuilt_arrays(
            self.vqt_params, vqt_params, max_n_fft=self.rings.capacity,
            path=self.path, fast=self.fast, ml_attached=self.ml_model is not None,
        )
        with self._state_lock:
            self.kernel = kernel
            self.arrays = arrays
            self.vqt_params = vqt_params
            if layout_changed:
                # fresh bin-indexed carries are created on the default
                # device; re-pin the mesh sharding (identity otherwise)
                self.analysis_state = self._put_state(
                    init_state_batch(self.n_streams, vqt_params.n_buckets)
                )
                self.balls_state = self._put_state(self._init_balls(self.n_streams))
            self._refresh_dispatch()
            # the window length (tail/n_fft) may have changed; the delta
            # path re-materializes it from the ring on the next step (the
            # ring keeps the raw audio, so nothing is lost)
            self._window = None

    # -- compute side (analysis thread) --------------------------------------
    def _dispatch(self, dt: float | None):
        """Snapshots + dispatches one hop; returns async (outputs, gains).

        All device work is dispatched without blocking: the outputs are jax
        arrays that materialize on first host read. Race rules are identical
        to the synchronous step (arrays/params captured under the lock;
        analysis_state re-read after the VQT dispatch so concurrent
        reset_stream calls are preserved; rebuild landing mid-dispatch
        retries under the new parameter set)."""
        now = time.monotonic()
        if dt is None:
            dt = 1.0 / 60.0 if self._last_step is None else max(now - self._last_step, 1e-4)
        self._last_step = now
        if self.ingest == "delta":
            return self._dispatch_delta(dt)

        for _ in range(3):  # retried only if a rebuild lands mid-step
            arrays, params, state, step_fn, snap_len, host_dtype, _ = (
                self._capture("_step_fn")
            )
            windows, gains = self.rings.snapshot(snap_len)
            if host_dtype is not None:
                windows = windows.astype(host_dtype)
            x = self._put_batch(windows)
            new_state, outputs = step_fn(arrays, state, self.ml_params, x, dt)
            if self._writeback(params, new_state, None):
                return outputs, gains
        raise RuntimeError("rebuild storm: step() could not complete")  # debounce prevents this

    def _capture(self, fn_attr: str):
        """Captures the dispatch plan + carried state under the lock; also
        clears the resets-in-flight set (everything added after this point
        landed mid-flight and is re-applied by _writeback)."""
        with self._state_lock:
            arrays, params = self.arrays, self.vqt_params
            state = (self.analysis_state, self.ml_state, self.balls_state)
            fn = getattr(self, fn_attr)
            snap_len, host_dtype = self._snap_len, self._host_dtype
            window = self._window
            self._resets_in_flight.clear()
        return arrays, params, state, fn, snap_len, host_dtype, window

    def _materialize_window(self, snap_len: int, host_dtype):
        """(Re)builds the device-resident window from the ring — a FUSED
        native snapshot+mark against one head read per stream, so samples
        racing the copy stay unconsumed (two separate calls would splice
        them out of the audio: in neither the window nor any consume)."""
        w, _ = self.rings.snapshot_consume(snap_len)
        if host_dtype is not None:
            w = w.astype(host_dtype)
        self.stats["materializations"] += 1
        return self._put_batch(w)

    def _writeback(self, params, new_state, new_window) -> bool:
        """Commits a hop's carried state; False = a rebuild landed mid-step
        (caller recomputes under the new parameter set). Resets that raced
        the dispatch are re-applied (their rows were computed from captured
        pre-reset state and would otherwise resurrect the old client)."""
        with self._state_lock:
            if self.vqt_params is not params:
                return False
            for s in self._resets_in_flight:
                new_state = reset_state_row(new_state, self._fresh_rows(), s)
                if new_window is not None:
                    new_window = new_window.at[s].set(0)
            if self._resets_in_flight:
                # row updates may drop the mesh sharding; re-pin it (a
                # no-op device_put when already correctly placed)
                new_state = self._put_state(new_state)
                if new_window is not None:
                    new_window = self._put_batch(new_window)
            self.analysis_state, self.ml_state, self.balls_state = new_state
            if new_window is not None:
                self._window = new_window
            return True

    def _dispatch_delta(self, dt: float):
        """Delta-ingest hop: consume the newly pushed `hop` samples per
        stream and roll the device-resident window, instead of re-shipping
        the whole trailing window. Host+transfer bytes drop ~50x (the
        measured hop cost at B=512: 16 MB ring copy + 8 MB tunnel send per
        hop -> ~0.8 MB). Race rules match the snapshot dispatch; the window
        carry follows the same capture/write-back discipline as
        analysis_state, and is re-materialized from the ring whenever it is
        invalid (first step, post-rebuild, post-restore)."""
        hop_dt = np.float32(self._hop / self.vqt_params.sr)
        for _ in range(3):  # retried only if a rebuild lands mid-step
            arrays, params, state, fn, snap_len, host_dtype, window = (
                self._capture("_delta_fn")
            )
            if window is None or window.shape[1] != snap_len:
                window = self._materialize_window(snap_len, host_dtype)
            new_state, new_window = state, window
            outputs = gains = None
            # stats accumulate locally and commit only on a successful
            # write-back: a rebuild-discarded attempt re-consumes the same
            # audio on retry and would otherwise double-count
            acc = {"hops": 0, "catchup_hops": 0, "advanced": 0, "frozen": 0}
            for k in range(1 + self._max_catchup):
                chunks, g, adv = self.rings.consume(self._hop, self._max_lag)
                if k > 0 and not adv.any():
                    break  # backlog drained; nothing would advance
                if host_dtype is not None:
                    chunks = chunks.astype(host_dtype)
                # per-stream dt: hop 0 advances every stream by the caller's
                # wall-clock dt (streams that underran still decay, like a
                # stalled snapshot); a catch-up hop advances ONLY the
                # draining streams' audio clocks — wall time did not pass
                # again, so frozen neighbors must not double-decay
                if k == 0:
                    dt_b = np.full(self.n_streams, dt, np.float32)
                else:
                    dt_b = np.where(adv, hop_dt, np.float32(0.0)).astype(np.float32)
                new_state, new_window, outputs = fn(
                    arrays, new_state, self.ml_params, new_window,
                    self._put_batch(chunks), self._put_batch(adv),
                    self._put_batch(dt_b),
                )
                gains = g
                n_adv = int(adv.sum())
                acc["hops"] += 1
                acc["catchup_hops"] += int(k > 0)
                acc["advanced"] += n_adv
                if k == 0:
                    # only wall-clock hops count underruns: on a catch-up
                    # hop a stream with no backlog is NOT underrunning
                    acc["frozen"] += self.n_streams - n_adv
            if self._writeback(params, new_state, new_window):
                for key, v in acc.items():
                    self.stats[key] += v
                return outputs, gains
        raise RuntimeError("rebuild storm: step() could not complete")  # debounce prevents this

    def _guard_manual_dispatch(self) -> None:
        """While a serve loop is active, the loop thread is the ONLY
        dispatcher: a second thread stepping concurrently would race the
        pipelined _pending swap and double-advance the analysis clock."""
        loop = self._serve_loop
        if (
            loop is not None
            and loop.running
            and threading.current_thread() is not loop._thread
        ):
            raise RuntimeError(
                "a serve loop owns this server's dispatch; stop() it "
                "before stepping manually"
            )

    def step_multi(self, k: int, dt: float | None = None, per_hop: bool = False):
        """``k`` hops in ONE fused dispatch (lax.scan over the hop axis) —
        the ingest-fed twin of ``pipeline_step_multi``: amortizes the
        per-dispatch transport round-trip for throughput deployments
        (>realtime catch-up, offline drains, batch re-analysis of buffered
        audio). Returns the LAST hop's (outputs, gains); every hop advances
        analysis time by hop/sr (the audio clock — ``dt`` only overrides
        that pacing). Requires ingest="delta". Race rules match step().

        ``per_hop=True`` returns EVERY hop's outputs as a k-TUPLE of
        per-hop trees, sliced inside the one dispatch (plus ``gains`` as
        (k, B)) — the cadenced serving mode (``serve(publish="per_hop")``):
        one dispatch, one transport round-trip, k individually publishable
        device-complete hops with zero per-hop host slicing. Bit-exact vs
        k single ``step()`` calls at audio-clock pacing
        (tests/test_runtime.py::TestCadencedServing)."""
        if self.ingest != "delta":
            raise RuntimeError("step_multi requires ingest='delta'")
        if k < 1:
            raise ValueError("k must be >= 1")
        self._guard_manual_dispatch()
        hop_dt = (self._hop / self.vqt_params.sr) if dt is None else dt
        self._last_step = time.monotonic()
        fn_attr = "_delta_multi_perhop_fn" if per_hop else "_delta_multi_fn"
        for _ in range(3):  # retried only if a rebuild lands mid-step
            arrays, params, state, fn, snap_len, host_dtype, window = (
                self._capture(fn_attr)
            )
            if window is None or window.shape[1] != snap_len:
                window = self._materialize_window(snap_len, host_dtype)
            chunks = np.empty((k, self.n_streams, self._hop), np.float32)
            advs = np.empty((k, self.n_streams), bool)
            gains_all = np.empty((k, self.n_streams), np.float32)
            for i in range(k):
                # consume writes the hop's chunks straight into the staging
                # buffer's row (no second (B, hop) copy per hop)
                _, gains_all[i], advs[i] = self.rings.consume(
                    self._hop, self._max_lag, out=chunks[i]
                )
            staged = chunks.astype(host_dtype) if host_dtype is not None else chunks
            n_adv = int(advs.sum())
            new_state, new_window, outputs = fn(
                arrays, state, self.ml_params, window,
                self._put_scan_batch(staged), self._put_scan_batch(advs), hop_dt,
            )
            if self._writeback(params, new_state, new_window):
                # committed post-write-back: a rebuild-discarded attempt
                # would otherwise double-count the re-consumed audio
                self.stats["hops"] += k
                self.stats["advanced"] += n_adv
                self.stats["frozen"] += k * self.n_streams - n_adv
                return outputs, (gains_all if per_hop else gains_all[-1])
        raise RuntimeError("rebuild storm: step_multi() could not complete")

    def step(self, pipelined: bool = False, dt: float | None = None):
        """One analysis update over all streams. Returns (outputs, gains).

        ``pipelined=True`` ships the one-deep dispatch overlap the reference
        gets from its audio-thread/main-thread split
        (pitchvis_viewer/src/vqt_system.rs:59-67): this hop is snapshotted
        and dispatched immediately, and the PREVIOUS hop's (outputs, gains)
        — which the device finished while the host was preparing this hop —
        are returned (None on the first call; drain the last hop with
        ``flush()``). The caller therefore never waits for device compute +
        tunnel round-trip inside its 60 Hz budget, only for host-side
        snapshot + dispatch. Outputs lag ingest by exactly one hop.

        ``dt`` overrides the wall-clock frame delta (deterministic replays
        and tests); by default it is measured between step calls."""
        self._guard_manual_dispatch()
        result = self._dispatch(dt)
        if not pipelined:
            return result
        prev, self._pending = self._pending, result
        return prev

    def flush(self):
        """Returns the in-flight pipelined hop's (outputs, gains) without
        dispatching a new one (None if nothing is pending)."""
        prev, self._pending = self._pending, None
        return prev

    def serve(
        self,
        rate_hz: float = 60.0,
        pipelined: bool = True,
        on_outputs=None,
        sync: str = "element",
        hops_per_dispatch: int = 1,
        publish: str = "latest",
    ):
        """Starts the self-driving dispatch loop: a background analysis
        thread paces ``step(pipelined=...)`` at ``rate_hz`` and publishes
        each hop's (outputs, gains) for consumers (``latest()`` /
        ``wait_next()`` on the returned :class:`runtime.loop.ServeLoop`).
        The server owns the serving cadence — producers only ``push()``,
        consumers only read — mirroring the reference viewer's framework-
        driven Update schedule (common.rs:2082-2118). ``on_outputs(seq,
        outputs, gains)``, if given, runs on the loop thread per hop.
        ``sync`` is the publish policy: ``"element"`` (default) barriers
        each hop on a one-scalar fetch so published outputs are
        device-complete and the loop self-paces to the true hop round-trip
        (protects consumers on networked devices); ``"host"`` materializes
        the whole output pytree to numpy before publishing (pair with
        ``fetch="led"``); ``"none"`` publishes raw async dispatch handles.
        ``hops_per_dispatch=k`` (requires ``ingest="delta"``) is the
        THROUGHPUT mode: each dispatch scan-amortizes k ingest-fed hops
        (``step_multi`` — the per-hop charge divides by k, how the
        multi-thousand-stream capacity is actually served), publishes the
        newest hop, and the deadline grid spaces dispatches k/rate_hz
        apart so the audio cadence still averages ``rate_hz``.
        ``publish="per_hop"`` (with ``hops_per_dispatch=k``) is the
        CADENCED mode: the same k-hop fused dispatch, but EVERY hop's
        outputs come back stacked and the loop publishes each on its own
        1/rate_hz grid slot after ONE barrier — 60 device-complete
        published hops/s through a tunnel whose round-trip exceeds the
        hop period, at the cost of ~k/rate_hz added display latency
        (the interactive serving mode; runtime/loop.py::_run_cadenced).
        One loop per server; ``stop()`` (or the context manager) releases
        it. The control plane (push / reset_stream / rebuild / checkpoint)
        stays available while serving — step()'s existing race rules cover
        the loop thread exactly as they cover a caller-driven thread."""
        from .loop import ServeLoop

        # check-and-assign under the state lock: two racing serve() calls
        # must not both start loops stepping the same server (their
        # pipelined _pending swaps would interleave)
        with self._state_lock:
            if self._serve_loop is not None and self._serve_loop.running:
                raise RuntimeError(
                    "server is already serving (stop() the active loop)"
                )
            # a leftover from MANUAL pipelined stepping must not become the
            # loop's first publish (the loop publishes only hops it
            # dispatched; its own exit path always drains the slot)
            self._pending = None
            self._serve_loop = ServeLoop(
                self, rate_hz, pipelined, on_outputs, sync, hops_per_dispatch,
                publish,
            )
            return self._serve_loop

    def close(self) -> None:
        loop = self._serve_loop
        if loop is not None and loop.running:
            try:
                loop.stop()
            except RuntimeError:
                pass  # the loop error stays readable on loop.error
        self.rings.close()
        with self._resampler_lock:
            for bank in self._resamplers.values():
                bank.close()
            self._resamplers.clear()
