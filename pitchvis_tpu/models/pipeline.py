"""The flagship end-to-end streaming pipeline: one jitted step per hop.

Reference data flow (ARCHITECTURE.md:44-48): Audio -> Ring Buffer (AGC in the
audio callback) -> VQT -> Analysis -> Display/Serial/ML. The reference runs
this per frame for ONE stream across an audio thread and a render thread;
here the whole chain is a single pure function over a state pytree with a
leading stream-batch axis, jitted once and dispatched per hop:

    state, outputs = pipeline_step(vqt_arrays, state, chunk, dt)

Thousands of concurrent streams ride the batch axis of one chip; multi-chip
scale-out shards that axis over a mesh (parallel/sharding.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ..core.config import AgcParameters, AnalysisParameters, VqtParameters
from ..kernel.builder import get_kernel
from ..ops.vqt import make_vqt_arrays, vqt_db_auto
from ..stream.ring import RingState, ring_push, ring_window
from .analysis import (
    AnalysisOutputs,
    AnalysisState,
    analysis_step_batch,
    init_state_batch,
)
from .ml_system import MlState, init_ml_state_batch, ml_step_batch


def build_rebuilt_arrays(old_params, new_params, *, max_n_fft: int, path: str,
                         fast: bool, ml_attached: bool = False):
    """Shared validation + construction for the live rebuilds
    (StreamingPipeline.rebuild / runtime.server.StreamServer.rebuild).
    Returns (kernel, arrays, layout_changed). Raises ValueError for sets
    the running deployment cannot host."""
    if float(new_params.sr) != float(old_params.sr):
        raise ValueError(
            "sample-rate changes require a new pipeline/server (buffered audio is rate-bound)"
        )
    if new_params.n_fft > max_n_fft:
        raise ValueError(
            f"n_fft {new_params.n_fft} exceeds the available ring length "
            f"{max_n_fft}; construct with a larger buffer "
            "(StreamingPipeline(buffer_len=...) / StreamServer(buffer_seconds=...))"
        )
    if ml_attached and new_params.range != old_params.range:
        raise ValueError(
            "bin-layout changes are incompatible with the attached ML "
            "model (its params are trained for the current layout); "
            "construct a new pipeline/server with matching ml_params"
        )
    kernel = get_kernel(new_params)  # validates; VqtError on bad combos
    arrays = make_vqt_arrays(kernel, path=path, fast=fast)
    return kernel, arrays, new_params.range != old_params.range


@jax.jit
def reset_state_row(state, fresh, idx):
    """Overwrites batch row `idx` of every leaf of a state pytree with the
    corresponding freshly-initialized (B=1) value — the device side of
    stream-slot recycling, shared by StreamingPipeline.reset_stream and
    runtime.server.StreamServer.reset_stream (one compiled program per
    pytree structure, reused for any idx)."""
    return jax.tree.map(lambda a, f: a.at[idx].set(f[0]), state, fresh)


class PipelineState(struct.PyTreeNode):
    ring: RingState
    analysis: AnalysisState
    # rolling VQT history for the fused ML inference stage; None when the
    # pipeline runs without ML (a None leaf is an empty pytree under jit)
    ml: MlState | None = None
    # per-stream pitch-ball fade carry for the fused viewer stage
    balls: "BallState | None" = None


class ViewerOutputs(struct.PyTreeNode):
    """Display-derived quantities of the reference's update_display pass
    (models/viewer.py), emitted per stream from the fused serving step."""

    balls: "BallOutputs"  # per-bin ball position/rgba/scale/visibility
    chroma: jnp.ndarray  # (B, 12) C4-referenced pitch-class power
    bloom: jnp.ndarray  # (B,) bloom intensity = clamp(1.3*scene_calmness)
    spectrogram_row: jnp.ndarray  # (B, n_buckets, 4) RGBA8 VQT-mode row
    bass: "BassSpiralOutputs"  # spiral coloring up to the lowest peak
    calmness_histogram: "CalmnessHistogramOutputs"  # debug-overlay contour


class PipelineOutputs(struct.PyTreeNode):
    x_vqt: jnp.ndarray  # (B, n_buckets) raw dB spectra
    gain: jnp.ndarray  # (B,) AGC gain (RingBuffer.gain diagnostic)
    analysis: AnalysisOutputs
    ml_midi: jnp.ndarray | None = None  # (B, 128) MIDI strengths (fused ML)
    led: jnp.ndarray | None = None  # (B, n_buckets, 3) u8 LED colors
    viewer: "ViewerOutputs | None" = None  # fused display-derived outputs


def init_pipeline_state(
    n_streams: int,
    params: VqtParameters,
    buffer_len: int | None = None,
    ml_t_window: int | None = None,
    with_viewer: bool = False,
) -> PipelineState:
    buffer_len = buffer_len or params.n_fft
    if buffer_len < params.n_fft:
        raise ValueError(
            f"buffer_len {buffer_len} is shorter than n_fft {params.n_fft}"
        )
    balls = None
    if with_viewer:
        from .viewer import BallState

        balls = jax.vmap(lambda _: BallState.init(params.n_buckets))(
            jnp.arange(n_streams)
        )
    return PipelineState(
        ring=RingState.init(n_streams, buffer_len),
        analysis=init_state_batch(n_streams, params.n_buckets),
        balls=balls,
        ml=(
            init_ml_state_batch(n_streams, ml_t_window, params.n_buckets)
            if ml_t_window
            else None
        ),
    )


@partial(
    jax.jit,
    static_argnames=(
        "vqt_params", "analysis_params", "agc_params", "path", "ml_model",
        "with_led", "with_viewer",
    ),
)
def pipeline_step(
    vqt_arrays,  # VqtArrays, or PallasVqtArrays when path="pallas"
    state: PipelineState,
    chunk: jnp.ndarray,
    dt: jnp.ndarray,
    *,
    vqt_params: VqtParameters,
    analysis_params: AnalysisParameters = AnalysisParameters(),
    agc_params: AgcParameters = AgcParameters(),
    path: str = "time",
    ml_model=None,
    ml_params=None,
    with_led: bool = False,
    with_viewer: bool = False,
) -> tuple[PipelineState, PipelineOutputs]:
    """One hop for all streams: push chunk (NaN-guarded, silence-frozen AGC),
    VQT on the trailing n_fft window, full analysis step — and, optionally,
    the ML inference, LED color, and viewer-display stages fused into the
    SAME device program, mirroring the reference's single frame update
    (pitchvis_viewer/src/app/common.rs:2076-2118: vqt -> analysis -> display
    in one Bevy Update pass).

    chunk: (B, hop) raw samples; dt: scalar or (B,) seconds per hop.
    ml_model/ml_params: a PitchMLP + its params; requires state.ml (see
    init_pipeline_state(ml_t_window=...)). with_led: emit the per-stream
    (n_buckets, 3) u8 LED color block (io/led.py) alongside the analysis.
    with_viewer: emit every display-derived quantity of update_display
    (pitch balls with fade carry, chroma, bloom, spectrogram row); requires
    state.balls (init_pipeline_state(with_viewer=True)).
    """
    ring = ring_push(state.ring, chunk, agc_params)
    window = ring_window(ring, vqt_params.n_fft)
    # path="pallas" dispatches to the fused kernel (ops/vqt_pallas.py);
    # vqt_arrays must then be PallasVqtArrays (make_vqt_arrays handles both)
    x_vqt = vqt_db_auto(vqt_arrays, window, path=path)

    dt_b = jnp.broadcast_to(jnp.asarray(dt, jnp.float32), (chunk.shape[0],))
    # batched entry: prominences use the pair-compacted exact fast path
    # (ops/peaks.py prominences_compact)
    new_analysis, outputs = analysis_step_batch(
        analysis_params, vqt_params.range, state.analysis, x_vqt, dt_b
    )

    new_ml, ml_midi, led, new_balls, viewer = derived_stages(
        vqt_params.range, outputs, dt_b,
        ml_model=ml_model, ml_params=ml_params, ml_state=state.ml,
        with_led=with_led, balls_state=state.balls, with_viewer=with_viewer,
    )

    return (
        PipelineState(ring=ring, analysis=new_analysis, ml=new_ml, balls=new_balls),
        PipelineOutputs(
            x_vqt=x_vqt, gain=ring.gain, analysis=outputs, ml_midi=ml_midi,
            led=led, viewer=viewer,
        ),
    )


def derived_stages(
    rng_cfg,
    outputs: AnalysisOutputs,
    dt_b,
    *,
    ml_model=None,
    ml_params=None,
    ml_state: MlState | None = None,
    with_led: bool = False,
    balls_state=None,
    with_viewer: bool = False,
):
    """Post-analysis output stages shared by pipeline_step and the ingest-fed
    StreamServer: fused ML inference (rolling smoothed-VQT history,
    ml_system.rs:24-38), the LED color block (io/led.py), and every
    display-derived quantity of update_display (models/viewer.py). Returns
    (new_ml_state, ml_midi, led, new_balls_state, viewer); disabled stages
    pass their state through and emit None."""
    new_ml = ml_state
    ml_midi = None
    if ml_model is not None:
        new_ml, ml_midi = ml_step_batch(
            ml_model, ml_params, ml_state, outputs.x_vqt_smoothed
        )

    led = None
    if with_led:
        from ..io.led import led_frame_values

        led = jax.vmap(
            lambda m, c, s: led_frame_values(rng_cfg, m, c, s)
        )(outputs.peaks, outputs.peak_center, outputs.peak_size)

    new_balls = balls_state
    viewer = None
    if with_viewer:
        from .viewer import (
            bass_spiral,
            bloom_intensity,
            calmness_histogram,
            chroma_vector,
            spectrogram_row_vqt,
            update_balls,
        )

        new_balls, ball_out = jax.vmap(
            lambda bs, p, c, s, cal, acc, dev, d: update_balls(
                rng_cfg, bs, p, c, s, cal, acc, dev, d
            )
        )(
            balls_state, outputs.peaks, outputs.peak_center, outputs.peak_size,
            outputs.calmness, outputs.pitch_accuracy, outputs.pitch_deviation,
            dt_b,
        )
        viewer = ViewerOutputs(
            balls=ball_out,
            chroma=jax.vmap(lambda xs: chroma_vector(xs, rng_cfg))(
                outputs.x_vqt_smoothed
            ),
            bloom=bloom_intensity(outputs.scene_calmness),
            spectrogram_row=jax.vmap(
                lambda xs: spectrogram_row_vqt(rng_cfg, xs)
            )(outputs.x_vqt_smoothed),
            bass=jax.vmap(
                lambda p, c, s: bass_spiral(rng_cfg, p, c, s)
            )(outputs.peaks, outputs.peak_center, outputs.peak_size),
            calmness_histogram=jax.vmap(calmness_histogram)(outputs.calmness),
        )

    return new_ml, ml_midi, led, new_balls, viewer


@partial(
    jax.jit,
    static_argnames=(
        "vqt_params", "analysis_params", "agc_params", "path", "ml_model",
        "with_led", "with_viewer",
    ),
)
def pipeline_step_multi(
    vqt_arrays,  # VqtArrays, or PallasVqtArrays when path="pallas"
    state: PipelineState,
    chunks: jnp.ndarray,
    dt: jnp.ndarray,
    *,
    vqt_params: VqtParameters,
    analysis_params: AnalysisParameters = AnalysisParameters(),
    agc_params: AgcParameters = AgcParameters(),
    path: str = "time",
    ml_model=None,
    ml_params=None,
    with_led: bool = False,
    with_viewer: bool = False,
) -> tuple[PipelineState, PipelineOutputs]:
    """K hops in one device call (lax.scan over the hop axis): amortizes the
    per-dispatch overhead for throughput-oriented workloads (offline
    processing, dataset labeling, >realtime serving).

    chunks: (K, B, hop). Outputs are stacked along a leading K axis.
    """

    def body(s, chunk):
        s2, out = pipeline_step(
            vqt_arrays,
            s,
            chunk,
            dt,
            vqt_params=vqt_params,
            analysis_params=analysis_params,
            agc_params=agc_params,
            path=path,
            ml_model=ml_model,
            ml_params=ml_params,
            with_led=with_led,
            with_viewer=with_viewer,
        )
        return s2, out

    return jax.lax.scan(body, state, chunks)


class StreamingPipeline:
    """Convenience wrapper owning the kernel arrays and state.

    Mirrors the reference's per-frame loop (pitchvis_serial/src/main.rs:
    207-230 / vqt_system.rs:40-68) but batched: feed `hop`-sized host chunks
    for B streams, receive the full analysis outputs.
    """

    def __init__(
        self,
        n_streams: int,
        vqt_params: VqtParameters | None = None,
        analysis_params: AnalysisParameters | None = None,
        agc_params: AgcParameters | None = None,
        path: str = "time",
        ml_model=None,
        ml_params=None,
        ml_t_window: int | None = None,
        with_led: bool = False,
        with_viewer: bool = False,
        fast: bool = False,
        buffer_len: int | None = None,
    ):
        # ``buffer_len`` sizes the device ring beyond n_fft (>= n_fft): the
        # headroom a live rebuild() to a LARGER n_fft needs (the error in
        # build_rebuilt_arrays points here); default = exactly n_fft.
        # default ml_t_window to the model's training default (T=5,
        # models/pitch_mlp.py DEFAULT_T) — a mismatched history window makes
        # the flattened Dense input shape fail against trained params
        if ml_t_window is None:
            from .pitch_mlp import DEFAULT_T

            ml_t_window = DEFAULT_T
        self.vqt_params = vqt_params or VqtParameters()
        self.analysis_params = analysis_params or AnalysisParameters()
        self.agc_params = agc_params or AgcParameters()
        self.path = path
        self.fast = fast
        self.ml_model = ml_model
        self.ml_params = ml_params
        self.with_led = with_led
        self.with_viewer = with_viewer
        self.kernel = get_kernel(self.vqt_params)
        # fast=True: bf16 VQT weights -> single-pass MXU matmuls with f32
        # accumulation (error budget documented in ops/vqt.py + test_bf16.py);
        # everything downstream of |y|^2 stays f32. path="pallas" uploads the
        # packed fused-kernel weights instead of the dense sets.
        self.arrays = make_vqt_arrays(self.kernel, path=path, fast=fast)
        self.ml_t_window = ml_t_window if ml_model is not None else None
        self.state = init_pipeline_state(
            n_streams,
            self.vqt_params,
            buffer_len=buffer_len,
            ml_t_window=self.ml_t_window,
            with_viewer=with_viewer,
        )
        self.delay_secs = self.kernel.delay_secs

    def _kwargs(self):
        return dict(
            vqt_params=self.vqt_params,
            analysis_params=self.analysis_params,
            agc_params=self.agc_params,
            path=self.path,
            ml_model=self.ml_model,
            ml_params=self.ml_params,
            with_led=self.with_led,
            with_viewer=self.with_viewer,
        )

    def step(self, chunk, dt) -> PipelineOutputs:
        self.state, out = pipeline_step(
            self.arrays, self.state, jnp.asarray(chunk, jnp.float32), dt, **self._kwargs()
        )
        return out

    def step_multi(self, chunks, dt) -> PipelineOutputs:
        """(K, B, hop) chunks -> K hops in one device call."""
        self.state, out = pipeline_step_multi(
            self.arrays, self.state, jnp.asarray(chunks, jnp.float32), dt, **self._kwargs()
        )
        return out

    def rebuild(self, vqt_params: VqtParameters) -> None:
        """Swaps in a new VQT parameter set while streaming — the device-
        ring counterpart of StreamServer.rebuild (feed it
        ParameterTuner.take_rebuilt()'s output). The ring audio and AGC
        gains are preserved (raw samples are parameter-independent);
        analysis/ML/viewer carries persist when the bin layout is unchanged
        and re-initialize when it changes (they are bin-indexed). Raises
        ValueError for sets this pipeline cannot host (different sample
        rate, n_fft beyond the ring length, or a bin-layout change while an
        ML model is attached — trained ML params are layout-bound, so that
        requires a new pipeline with retrained params)."""
        buffer_len = int(self.state.ring.buffer.shape[1])
        kernel, arrays, layout_changed = build_rebuilt_arrays(
            self.vqt_params, vqt_params, max_n_fft=buffer_len,
            path=self.path, fast=self.fast, ml_attached=self.ml_model is not None,
        )
        self.arrays = arrays
        if layout_changed:
            n_streams = int(self.state.ring.buffer.shape[0])
            fresh = init_pipeline_state(
                n_streams,
                vqt_params,
                buffer_len=buffer_len,
                ml_t_window=self.ml_t_window,
                with_viewer=self.with_viewer,
            )
            self.state = PipelineState(
                ring=self.state.ring,  # audio survives the swap
                analysis=fresh.analysis,
                ml=fresh.ml,
                balls=fresh.balls,
            )
        self.kernel = kernel
        self.vqt_params = vqt_params
        self.delay_secs = kernel.delay_secs  # diagnostic must track the swap

    def reset_stream(self, idx: int) -> None:
        """Serving churn for the fully-on-device deployment: recycle batch
        slot `idx` for a NEW stream — ring samples, AGC gain, analysis
        carries, and (when fused) the ML history and ball-fade state all
        return to their fresh-server values. Other slots are untouched.
        Host-side counterpart: runtime/server.py::StreamServer.reset_stream.
        """
        fresh = init_pipeline_state(
            1,
            self.vqt_params,
            buffer_len=int(self.state.ring.buffer.shape[1]),
            ml_t_window=self.ml_t_window,
            with_viewer=self.with_viewer,
        )
        self.state = reset_state_row(self.state, fresh, idx)
