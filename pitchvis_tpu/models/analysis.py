"""The per-frame analysis chain as a single jitted step over a state pytree.

TPU-native equivalent of `AnalysisState::preprocess`
(pitchvis_analysis/src/analysis.rs:288-404) and its modules: calmness
(analysis_modules/calmness.rs), afterglow + peak filter
(analysis_modules/afterglow.rs), pitch accuracy / tuning
(analysis_modules/pitch_analysis.rs). The reference runs this per frame on
one stream on the CPU; here the whole chain is one pure function
``analysis_step(state, x_vqt, dt) -> (state', outputs)`` that vmaps over a
stream batch and fuses into the surrounding XLA graph.

Peak sets are per-bin masks (see ops/peaks.py) instead of the reference's
``HashSet<usize>``; all downstream math is bin-indexed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ..core.config import AnalysisParameters, VqtRange
from ..ops.peaks import (
    enhance_peaks_continuous,
    find_peaks_mask,
    local_maxima,
    prominences_compact,
    promote_bass_peaks,
)
from ..utils.ema import ema_update
from ..utils.rounding import rust_round


class AnalysisState(struct.PyTreeNode):
    """Carry state of the analysis chain (analysis.rs:119-177). All arrays
    are per-bin f32 unless noted; scalars are 0-d f32."""

    x_vqt_smoothed: jnp.ndarray
    x_vqt_afterglow: jnp.ndarray
    calmness: jnp.ndarray
    released_note_calmness: jnp.ndarray
    scene_calmness: jnp.ndarray  # scalar
    tuning_inaccuracy: jnp.ndarray  # scalar, cents

    @classmethod
    def init(cls, n_buckets: int) -> "AnalysisState":
        z = jnp.zeros(n_buckets, jnp.float32)
        s = jnp.zeros((), jnp.float32)
        return cls(
            x_vqt_smoothed=z,
            x_vqt_afterglow=z,
            calmness=z,
            released_note_calmness=z,
            scene_calmness=s,
            tuning_inaccuracy=s,
        )


class AnalysisOutputs(struct.PyTreeNode):
    """Per-frame outputs consumed by display / serial / ML stages."""

    x_vqt_smoothed: jnp.ndarray
    x_vqt_peakfiltered: jnp.ndarray
    x_vqt_afterglow: jnp.ndarray
    peaks: jnp.ndarray  # bool mask of discrete peaks
    peak_center: jnp.ndarray  # continuous center per peak bin (frac bins)
    peak_size: jnp.ndarray  # continuous (bass-promoted) size per peak bin, dB
    calmness: jnp.ndarray
    pitch_accuracy: jnp.ndarray
    pitch_deviation: jnp.ndarray
    scene_calmness: jnp.ndarray  # scalar
    tuning_inaccuracy: jnp.ndarray  # scalar, cents


def _smoothing_horizons(
    params: AnalysisParameters, rng: VqtRange, scene_calmness: jnp.ndarray
) -> jnp.ndarray:
    """Per-bin EMA horizons in seconds (analysis.rs:196-208, 291-323):
    base * frequency multiplier (1.5 bass -> 1.0 treble) * calmness
    multiplier (0.6 energetic -> 2.0 calm), truncated to whole ms like the
    reference's Duration::from_millis(duration_ms as u64). base == 0 means
    passthrough (horizon 0)."""
    n = rng.n_buckets
    octave_fraction = jnp.arange(n, dtype=jnp.float32) / (rng.buckets_per_octave * rng.octaves)
    freq_mult = 1.5 - 0.5 * octave_fraction
    calm_mult = params.vqt_smoothing_calmness_min + (
        params.vqt_smoothing_calmness_max - params.vqt_smoothing_calmness_min
    ) * scene_calmness
    base_ms = params.vqt_smoothing_duration_base * 1000.0
    horizon_ms = jnp.floor(base_ms * freq_mult * calm_mult)
    return jnp.where(base_ms > 0.0, horizon_ms / 1000.0, 0.0)


def _update_calmness(
    params: AnalysisParameters,
    rng: VqtRange,
    x_vqt: jnp.ndarray,
    x_smoothed: jnp.ndarray,
    dt: jnp.ndarray,
    calmness: jnp.ndarray,
    released: jnp.ndarray,
    scene: jnp.ndarray,
    precomputed_raw: tuple[jnp.ndarray, jnp.ndarray] | None = None,
):
    """Per-bin + scene calmness (calmness.rs:23-95): bins within ~+-30 ct of
    an *unsmoothed*-VQT peak EMA toward 1, others toward 0; released-note
    shadow contributes at 30% weight; amplitude(power)-weighted scene average
    EMA'd; holds in silence."""
    n = rng.n_buckets
    radius = rng.buckets_per_octave // 12 // 3

    peak_mask = find_peaks_mask(
        x_vqt,
        params.peak_config,
        rng.buckets_per_octave,
        precomputed=precomputed_raw,
        suppress_iterations=params.suppress_iterations,
    )

    # dilate: bin i is "around" a peak p iff i in [p - radius, p + radius),
    # i.e. there is a peak at i + delta for delta in [-radius+1, radius]
    # (calmness.rs:41-47)
    around = peak_mask
    for delta in range(-radius + 1, radius + 1):
        if delta == 0:
            continue
        shift = -delta
        around = around | (jnp.roll(peak_mask, shift) & _roll_valid(n, shift))

    horizon = params.note_calmness_smoothing_duration
    calm_up = ema_update(calmness, 1.0, dt, horizon)
    calm_down = ema_update(calmness, 0.0, dt, horizon)
    new_calm = jnp.where(around, calm_up, calm_down)
    # active bins sync the released shadow; inactive bins decay it
    new_released = jnp.where(around, calm_up, ema_update(released, 0.0, dt, horizon))

    amp_power = jnp.power(10.0, x_smoothed / 10.0)
    w_active = jnp.where(around, amp_power, 0.0)
    rel_contrib = jnp.where(~around & (new_released > 0.01), new_released, 0.0)
    # the released weight is SELF-weighted (0.3 * the released value, a
    # dimensionless <=0.3 mixed with amplitude-power weights) — faithful to
    # calmness.rs:79-83 (`released_weight = released_contribution * 0.3;
    # sum += released_contribution * released_weight`), quirk included
    w_released = rel_contrib * 0.3

    weighted = jnp.sum(new_calm * w_active) + jnp.sum(rel_contrib * w_released)
    wsum = jnp.sum(w_active) + jnp.sum(w_released)

    target = weighted / jnp.maximum(wsum, 1e-30)
    new_scene = jnp.where(
        wsum > 0.0,
        ema_update(scene, target, dt, params.scene_calmness_smoothing_duration),
        scene,  # silence: hold (calmness.rs:92-95)
    )
    return new_calm, new_released, new_scene


def _roll_valid(n: int, off: int) -> jnp.ndarray:
    """Mask of positions where jnp.roll by `off` did not wrap around."""
    idx = jnp.arange(n)
    if off > 0:
        return idx >= off
    return idx < n + off


def _update_afterglow(afterglow: jnp.ndarray, x_smoothed: jnp.ndarray) -> jnp.ndarray:
    """x *= 0.85 - 0.15*(i/n), floored at the smoothed value
    (afterglow.rs:10-21)."""
    n = afterglow.shape[0]
    decay = 0.85 - 0.15 * (jnp.arange(n, dtype=jnp.float32) / n)
    return jnp.maximum(afterglow * decay, x_smoothed)


def _pitch_accuracy_deviation(
    peak_mask: jnp.ndarray, center: jnp.ndarray, buckets_per_octave: int
):
    """Per-peak deviation from the nearest semitone, written at the rounded
    center bin (pitch_analysis.rs:12-42)."""
    n = peak_mask.shape[0]
    idx = jnp.arange(n)
    c_semi = center * 12.0 / buckets_per_octave
    # rust_round: f32::round is half-away-from-zero; a two-bin plateau's
    # parabola center is exactly i+0.5, where half-to-even would flip the
    # write bin and the deviation sign vs the reference
    deviation = c_semi - rust_round(c_semi)
    accuracy = jnp.maximum(1.0 - 2.0 * jnp.abs(deviation), 0.0)

    # the rounded center is within one bin of the peak bin, so the scatter
    # is three static shifts + a precedence select (no data-dependent
    # scatter, which serializes on TPU)
    rel = jnp.clip(rust_round(center).astype(jnp.int32), 0, n - 1) - idx
    acc_out = jnp.zeros(n, jnp.float32)
    dev_out = jnp.zeros(n, jnp.float32)
    for r in (-1, 0, 1):
        write = peak_mask & (rel == r)
        # target position t receives from source i = t - r; valid when the
        # shift did not wrap
        m = jnp.roll(write, r) & _roll_valid(n, r)
        acc_out = jnp.where(m, jnp.roll(jnp.where(write, accuracy, 0.0), r), acc_out)
        dev_out = jnp.where(m, jnp.roll(jnp.where(write, deviation, 0.0), r), dev_out)
    return acc_out, dev_out


def _update_tuning_inaccuracy(
    params: AnalysisParameters,
    peak_mask: jnp.ndarray,
    center: jnp.ndarray,
    size: jnp.ndarray,
    buckets_per_octave: int,
    dt: jnp.ndarray,
    tuning: jnp.ndarray,
) -> jnp.ndarray:
    """Power-weighted mean |cents| drift, EMA'd (pitch_analysis.rs:48-75)."""
    power = jnp.where(peak_mask, jnp.power(10.0, size / 10.0), 0.0)
    c_semi = center * 12.0 / buckets_per_octave
    # |x - round(x)| is rounding-mode-independent at .5; rust_round for
    # uniformity with every other reference-.round() site
    drift = jnp.abs(c_semi - rust_round(c_semi))
    power_sum = jnp.sum(power)
    avg = jnp.where(power_sum > 0.0, jnp.sum(drift * power) / jnp.maximum(power_sum, 1e-30), 0.0)
    return ema_update(tuning, 100.0 * avg, dt, params.tuning_inaccuracy_smoothing_duration)


def _analysis_core(
    params: AnalysisParameters,
    rng: VqtRange,
    state: AnalysisState,
    x_vqt: jnp.ndarray,
    dt: jnp.ndarray,
    x_smoothed: jnp.ndarray,
    pre: tuple[jnp.ndarray, jnp.ndarray],
    pre_raw: tuple[jnp.ndarray, jnp.ndarray],
) -> tuple[AnalysisState, AnalysisOutputs]:
    """Steps 2-6 of the analysis chain, given the smoothed spectrum and the
    precomputed (local maxima, prominences) pairs for the smoothed and raw
    spectra. Shared between the per-frame and the batched entry points (the
    batched one computes prominences with the windowed fast path)."""
    n = rng.n_buckets

    # 2. discrete peaks: bassline config below/at highest_bassnote, general.
    # highest_bassnote (12*2+4 = 28) is compared against RAW bin indices —
    # deliberately faithful to analysis.rs:338/346, which filters
    # `**p <= highest_bassnote` on bins even though the value reads like a
    # semitone count (at 84 bpo the bass band is bins 0-28, ~55-69 Hz)
    #    config above (analysis.rs:331-349). Local maxima and prominences are
    #    threshold-independent, so they run once per spectrum and are shared
    #    between the two configs.
    idx = jnp.arange(n)
    bass_mask = find_peaks_mask(
        x_smoothed, params.bassline_peak_config, rng.buckets_per_octave,
        precomputed=pre, suppress_iterations=params.suppress_iterations,
    )
    gen_mask = find_peaks_mask(
        x_smoothed, params.peak_config, rng.buckets_per_octave,
        precomputed=pre, suppress_iterations=params.suppress_iterations,
    )
    peaks = (bass_mask & (idx <= params.highest_bassnote)) | (
        gen_mask & (idx > params.highest_bassnote)
    )

    # 3. continuous peak refinement + bass harmonic promotion
    center, size = enhance_peaks_continuous(peaks, x_smoothed, rng)
    size = promote_bass_peaks(
        peaks, center, size, x_smoothed, rng, params.highest_bassnote, params.harmonic_threshold
    )

    # 4. peak filter + afterglow
    x_peakfiltered = jnp.where(peaks, x_smoothed, 0.0)
    afterglow = _update_afterglow(state.x_vqt_afterglow, x_smoothed)

    # 5. calmness (peaks from the *unsmoothed* spectrum)
    calm, released, scene = _update_calmness(
        params, rng, x_vqt, x_smoothed, dt,
        state.calmness, state.released_note_calmness, state.scene_calmness,
        precomputed_raw=pre_raw,
    )

    # 6. tuning inaccuracy + per-bin pitch accuracy/deviation
    tuning = _update_tuning_inaccuracy(
        params, peaks, center, size, rng.buckets_per_octave, dt, state.tuning_inaccuracy
    )
    accuracy, deviation = _pitch_accuracy_deviation(peaks, center, rng.buckets_per_octave)

    new_state = AnalysisState(
        x_vqt_smoothed=x_smoothed,
        x_vqt_afterglow=afterglow,
        calmness=calm,
        released_note_calmness=released,
        scene_calmness=scene,
        tuning_inaccuracy=tuning,
    )
    outputs = AnalysisOutputs(
        x_vqt_smoothed=x_smoothed,
        x_vqt_peakfiltered=x_peakfiltered,
        x_vqt_afterglow=afterglow,
        peaks=peaks,
        peak_center=jnp.where(peaks, center, 0.0),
        peak_size=jnp.where(peaks, size, 0.0),
        calmness=calm,
        pitch_accuracy=accuracy,
        pitch_deviation=deviation,
        scene_calmness=scene,
        tuning_inaccuracy=tuning,
    )
    return new_state, outputs


def _smooth(params, rng, state, x_vqt, dt):
    """Step 1: calmness- and frequency-adaptive EMA smoothing."""
    horizons = _smoothing_horizons(params, rng, state.scene_calmness)
    return ema_update(state.x_vqt_smoothed, x_vqt, dt, horizons)


def _min_heights(params: AnalysisParameters) -> tuple[float, float]:
    """(smoothed-spectrum prefilter, raw-spectrum prefilter): prominences are
    only read at candidates above these heights (calmness peaks use only the
    general config, calmness.rs:30)."""
    return (
        min(params.peak_config.min_height, params.bassline_peak_config.min_height),
        params.peak_config.min_height,
    )


@partial(jax.jit, static_argnums=(0, 1))
def analysis_step(
    params: AnalysisParameters,
    rng: VqtRange,
    state: AnalysisState,
    x_vqt: jnp.ndarray,
    dt: jnp.ndarray,
) -> tuple[AnalysisState, AnalysisOutputs]:
    """One frame of the analysis chain (analysis.rs:288-404). ``x_vqt`` is a
    dB spectrum (n_buckets,), ``dt`` the frame time in seconds."""
    n = rng.n_buckets
    assert x_vqt.shape == (n,)
    dt = jnp.asarray(dt, jnp.float32)

    x_smoothed = _smooth(params, rng, state, x_vqt, dt)
    # prominences on the pair-compacted candidate axis (ops/peaks.py):
    # exact at every local maximum, at half the O(n^2) reduction cost.
    min_h, min_h_raw = _min_heights(params)
    lm_s = local_maxima(x_smoothed)
    lm_r = local_maxima(x_vqt)
    pre = (lm_s, prominences_compact(x_smoothed, lm_s, min_h))
    pre_raw = (lm_r, prominences_compact(x_vqt, lm_r, min_h_raw))
    return _analysis_core(params, rng, state, x_vqt, dt, x_smoothed, pre, pre_raw)


@partial(jax.jit, static_argnums=(0, 1))
def analysis_step_batch(
    params: AnalysisParameters,
    rng: VqtRange,
    state: AnalysisState,
    x_vqt: jnp.ndarray,
    dt: jnp.ndarray,
) -> tuple[AnalysisState, AnalysisOutputs]:
    """Batched analysis over independent streams: state arrays and x_vqt have
    a leading stream axis; dt is (B,) or scalar.

    The prominence stage intentionally stays on the vmapped exact
    pair-compacted formulation: a windowed reset-scan alternative (6x fewer
    VPU lanes on paper) was built and measured 4.7x SLOWER at B=2048 — its
    ~260-step elementwise chain exceeds XLA's fusion horizon, so the (B,
    n/2) carry round-trips HBM every step, while the exact O(n^2/2) masked
    broadcast-reductions fuse into single-pass loops at ~VPU peak. See
    docs/PERFORMANCE.md."""
    dt = jnp.broadcast_to(jnp.asarray(dt, jnp.float32), (x_vqt.shape[0],))
    return jax.vmap(lambda s, x, d: analysis_step(params, rng, s, x, d))(state, x_vqt, dt)


def init_state_batch(n_streams: int, n_buckets: int) -> AnalysisState:
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a, (n_streams,) + a.shape).copy(),
        AnalysisState.init(n_buckets),
    )
