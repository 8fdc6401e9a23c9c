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
from ..ops.vqt import VqtArrays, vqt_db_batch
from ..stream.ring import RingState, ring_push, ring_window
from .analysis import AnalysisOutputs, AnalysisState, analysis_step, init_state_batch


class PipelineState(struct.PyTreeNode):
    ring: RingState
    analysis: AnalysisState


class PipelineOutputs(struct.PyTreeNode):
    x_vqt: jnp.ndarray  # (B, n_buckets) raw dB spectra
    gain: jnp.ndarray  # (B,) AGC gain (RingBuffer.gain diagnostic)
    analysis: AnalysisOutputs


def init_pipeline_state(
    n_streams: int, params: VqtParameters, buffer_len: int | None = None
) -> PipelineState:
    buffer_len = buffer_len or params.n_fft
    assert buffer_len >= params.n_fft
    return PipelineState(
        ring=RingState.init(n_streams, buffer_len),
        analysis=init_state_batch(n_streams, params.n_buckets),
    )


@partial(
    jax.jit,
    static_argnames=("vqt_params", "analysis_params", "agc_params", "path"),
)
def pipeline_step(
    vqt_arrays: VqtArrays,
    state: PipelineState,
    chunk: jnp.ndarray,
    dt: jnp.ndarray,
    *,
    vqt_params: VqtParameters,
    analysis_params: AnalysisParameters = AnalysisParameters(),
    agc_params: AgcParameters = AgcParameters(),
    path: str = "time",
) -> tuple[PipelineState, PipelineOutputs]:
    """One hop for all streams: push chunk (NaN-guarded, silence-frozen AGC),
    VQT on the trailing n_fft window, full analysis step.

    chunk: (B, hop) raw samples; dt: scalar or (B,) seconds per hop.
    """
    ring = ring_push(state.ring, chunk, agc_params)
    window = ring_window(ring, vqt_params.n_fft)
    x_vqt = vqt_db_batch(vqt_arrays, window, path=path)

    dt_b = jnp.broadcast_to(jnp.asarray(dt, jnp.float32), (chunk.shape[0],))
    new_analysis, outputs = jax.vmap(
        lambda s, x, d: analysis_step(analysis_params, vqt_params.range, s, x, d)
    )(state.analysis, x_vqt, dt_b)

    return (
        PipelineState(ring=ring, analysis=new_analysis),
        PipelineOutputs(x_vqt=x_vqt, gain=ring.gain, analysis=outputs),
    )


@partial(
    jax.jit,
    static_argnames=("vqt_params", "analysis_params", "agc_params", "path"),
)
def pipeline_step_multi(
    vqt_arrays: VqtArrays,
    state: PipelineState,
    chunks: jnp.ndarray,
    dt: jnp.ndarray,
    *,
    vqt_params: VqtParameters,
    analysis_params: AnalysisParameters = AnalysisParameters(),
    agc_params: AgcParameters = AgcParameters(),
    path: str = "time",
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
    ):
        self.vqt_params = vqt_params or VqtParameters()
        self.analysis_params = analysis_params or AnalysisParameters()
        self.agc_params = agc_params or AgcParameters()
        self.path = path
        self.kernel = get_kernel(self.vqt_params)
        self.arrays = VqtArrays.from_kernel(self.kernel)
        self.state = init_pipeline_state(n_streams, self.vqt_params)
        self.delay_secs = self.kernel.delay_secs

    def step(self, chunk, dt) -> PipelineOutputs:
        self.state, out = pipeline_step(
            self.arrays,
            self.state,
            jnp.asarray(chunk, jnp.float32),
            dt,
            vqt_params=self.vqt_params,
            analysis_params=self.analysis_params,
            agc_params=self.agc_params,
            path=self.path,
        )
        return out

    def step_multi(self, chunks, dt) -> PipelineOutputs:
        """(K, B, hop) chunks -> K hops in one device call."""
        self.state, out = pipeline_step_multi(
            self.arrays,
            self.state,
            jnp.asarray(chunks, jnp.float32),
            dt,
            vqt_params=self.vqt_params,
            analysis_params=self.analysis_params,
            agc_params=self.agc_params,
            path=self.path,
        )
        return out
