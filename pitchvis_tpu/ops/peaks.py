"""Vectorized spectral peak detection.

TPU-native reimplementation of the reference's peak pipeline
(`pitchvis_analysis/src/analysis_modules/peak_detection.rs`), which wraps the
`find_peaks` crate (a scipy.signal.find_peaks port). The reference returns a
variable-size ``HashSet<usize>``; JAX needs static shapes, so peaks are
represented as **per-bin masks and per-bin continuous values** — downstream
consumers (splat, calmness radius, accuracy scatter) are all bin-indexed
anyway, and a fixed top-K extraction is provided for list consumers.

Algorithms (scipy semantics, filter order: height -> distance -> prominence):

* local maxima with plateau handling (plateau midpoint is the peak position)
* prominence via "nearest strictly-greater element" found with binary lifting
  over a sparse range-max table (O(n log n), fully vectorized, static shapes)
  and range-min queries for the window minima
* min-distance suppression (priority = peak height, ties to the higher index,
  matching scipy's argsort-from-the-end iteration) computed as a Jacobi
  fixpoint: a candidate is suppressed iff an unsuppressed higher-priority
  candidate lies strictly within `distance`. The greedy solution is the
  unique fixpoint; iteration converges in <= longest decreasing-priority
  chain (practically 2-3 rounds), bounded by a `lax.while_loop`.

All functions operate on a single spectrum (n,) and are `vmap`-friendly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core.config import PeakDetectionParameters, VqtRange

_NEG = jnp.float32(-3.0e38)
_POS = jnp.float32(3.0e38)


def min_separation_bins(buckets_per_octave: int) -> int:
    """0.4-semitone minimum peak separation (peak_detection.rs:37), with
    Rust's round-half-away-from-zero."""
    return int(math.floor(buckets_per_octave * 0.4 / 12.0 + 0.5))


def first_allowed_bin(buckets_per_octave: int) -> int:
    """Drop the lowest ~half semitone (peak_detection.rs:45): min_bin =
    div_ceil(buckets_per_octave / 12, 2)."""
    per_semitone = buckets_per_octave // 12
    return -(-per_semitone // 2)


def local_maxima(x: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask of local maxima with plateau handling: a plateau run
    [s, e] is a peak iff x[s-1] < x[s] and x[e+1] < x[e]; the peak position
    is the plateau midpoint (s + e) // 2. Edges cannot be peaks."""
    n = x.shape[0]
    idx = jnp.arange(n)

    # run_start[i]: first index of the equal-value run containing i
    change = jnp.concatenate([jnp.ones(1, bool), x[1:] != x[:-1]])
    run_start = jax.lax.cummax(jnp.where(change, idx, 0))
    # run_end[i]: last index of the run
    change_next = jnp.concatenate([x[1:] != x[:-1], jnp.ones(1, bool)])
    run_end = n - 1 - jax.lax.cummax(jnp.where(change_next, n - 1 - idx, 0)[::-1])[::-1]

    s = run_start
    e = run_end
    prev_ok = (s > 0) & (x[jnp.maximum(s - 1, 0)] < x)
    next_ok = (e < n - 1) & (x[jnp.minimum(e + 1, n - 1)] < x)
    mid = (s + e) // 2
    return prev_ok & next_ok & (idx == mid)


def _build_tables(x: jnp.ndarray, combine, pad_value):
    """Sparse table: t[k][i] = combine over x[i : i + 2^k] (padded)."""
    n = x.shape[0]
    levels = max(1, math.ceil(math.log2(max(n, 2))) + 1)
    tables = [x]
    for k in range(1, levels):
        span = 1 << (k - 1)
        prev = tables[-1]
        shifted = jnp.concatenate([prev[span:], jnp.full((span,), pad_value, x.dtype)])
        tables.append(combine(prev, shifted))
    return jnp.stack(tables)  # (levels, n)


def _prev_greater(x: jnp.ndarray, max_table: jnp.ndarray) -> jnp.ndarray:
    """For each i, the largest j < i with x[j] > x[i], or -1. Binary lifting:
    shrink the left boundary `pos` while the span max stays <= x[i]."""
    n = x.shape[0]
    levels = max_table.shape[0]
    pos = jnp.arange(n)
    for k in range(levels - 1, -1, -1):
        span = 1 << k
        cand = pos - span
        ok = cand >= 0
        span_max = max_table[k, jnp.maximum(cand, 0)]
        take = ok & (span_max <= x)
        pos = jnp.where(take, cand, pos)
    return pos - 1


def _next_greater(x: jnp.ndarray, max_table: jnp.ndarray) -> jnp.ndarray:
    """For each i, the smallest j > i with x[j] > x[i], or n."""
    n = x.shape[0]
    levels = max_table.shape[0]
    end = jnp.arange(n) + 1  # exclusive right boundary of scanned region
    for k in range(levels - 1, -1, -1):
        span = 1 << k
        ok = end + span <= n
        span_max = max_table[k, jnp.minimum(end, n - 1)]
        take = ok & (span_max <= x)
        end = jnp.where(take, end + span, end)
    return end


def _range_min(min_table: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """min over x[lo..hi] inclusive (lo <= hi), standard two-span RMQ."""
    n = min_table.shape[1]
    length = hi - lo + 1
    k = jnp.where(length > 1, jnp.log2(length.astype(jnp.float32)).astype(jnp.int32), 0)
    span = jnp.left_shift(1, k)
    a = min_table[k, jnp.clip(lo, 0, n - 1)]
    b = min_table[k, jnp.clip(hi - span + 1, 0, n - 1)]
    return jnp.minimum(a, b)


def prominences(x: jnp.ndarray) -> jnp.ndarray:
    """Per-bin scipy-style prominence (valid at local maxima): the peak
    height minus the higher of the two window minima, where each window
    extends to the nearest strictly-greater sample (or the signal edge)."""
    n = x.shape[0]
    max_table = _build_tables(x, jnp.maximum, _NEG)
    min_table = _build_tables(x, jnp.minimum, _POS)
    idx = jnp.arange(n)

    left_bound = _prev_greater(x, max_table)  # -1 if none
    right_bound = _next_greater(x, max_table)  # n if none

    left_min = _range_min(min_table, jnp.maximum(left_bound + 1, 0), idx)
    right_min = _range_min(min_table, idx, jnp.minimum(right_bound - 1, n - 1))
    return x - jnp.maximum(left_min, right_min)


def _suppress_by_distance(candidate: jnp.ndarray, height: jnp.ndarray, distance: int):
    """Greedy min-distance selection (scipy _select_by_peak_distance):
    among candidates, iteratively suppress any with an unsuppressed
    strictly-higher-priority candidate strictly within `distance` bins.
    Priority = (height, index); larger index wins ties."""
    n = height.shape[0]
    idx = jnp.arange(n)

    def has_higher_neighbor(suppressed):
        alive = candidate & ~suppressed
        hit = jnp.zeros(n, bool)
        for off in range(-(distance - 1), distance):
            if off == 0:
                continue
            j = idx + off
            valid = (j >= 0) & (j < n)
            jc = jnp.clip(j, 0, n - 1)
            higher = (height[jc] > height) | ((height[jc] == height) & (jc > idx))
            hit = hit | (valid & alive[jc] & higher)
        return hit & candidate

    def cond(state):
        suppressed, changed = state
        return changed

    def body(state):
        suppressed, _ = state
        new = has_higher_neighbor(suppressed)
        return new, jnp.any(new != suppressed)

    suppressed, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros(n, bool), jnp.array(True))
    )
    return candidate & ~suppressed


def find_peaks_mask(
    x: jnp.ndarray,
    config: PeakDetectionParameters,
    buckets_per_octave: int,
) -> jnp.ndarray:
    """Discrete peak mask, matching `find_peaks` (peak_detection.rs:26-51):
    local maxima filtered by min_height, then min-distance (0.4 semitones),
    then min_prominence; the first ~half semitone of bins is dropped."""
    mask = local_maxima(x)
    mask = mask & (x >= config.min_height)
    d = min_separation_bins(buckets_per_octave)
    if d >= 2:
        mask = _suppress_by_distance(mask, x, d)
    prom = prominences(x)
    mask = mask & (prom >= config.min_prominence)
    min_bin = first_allowed_bin(buckets_per_octave)
    return mask & (jnp.arange(x.shape[0]) >= min_bin)


def enhance_peaks_continuous(
    peak_mask: jnp.ndarray, x: jnp.ndarray, rng: VqtRange
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sub-bin peak refinement (peak_detection.rs:61-148): fit a Lagrange
    parabola in log-frequency space around each peak, clamp its maximum to
    the neighbor bins, and linearly interpolate the amplitude at the refined
    center.

    Returns per-bin arrays (center, size); entries are only meaningful where
    ``peak_mask`` is set. Centers are in fractional bins; sizes in dB >= 0.
    """
    n = x.shape[0]
    idx = jnp.arange(n)

    xm = x[jnp.maximum(idx - 1, 0)]
    x0 = x
    xp = x[jnp.minimum(idx + 1, n - 1)]

    # Uniform log-f spacing: the Lagrange parabola maximum reduces to
    # p + (y- - y+) / (2 (y- - 2 y0 + y+)) bins; the reference's explicit
    # log-f arithmetic is algebraically identical for exact log spacing.
    denom = xm - 2.0 * x0 + xp
    offset = jnp.where(jnp.abs(denom) < 1e-12, 0.0, (xm - xp) / (2.0 * denom))
    offset = jnp.clip(offset, -1.0, 1.0)

    center = idx.astype(jnp.float32) + offset
    center = jnp.clip(center, 0.0, n - 1.0)

    lower = jnp.floor(center).astype(jnp.int32)
    upper = jnp.minimum(lower + 1, n - 1)
    frac = center - lower
    size = jnp.maximum(x[lower] * (1.0 - frac) + x[upper] * frac, 0.0)

    # Edge bins use the discrete values directly (peak_detection.rs:71-77).
    edge = (idx < 1) | (idx > n - 2)
    center = jnp.where(edge, idx.astype(jnp.float32), center)
    size = jnp.where(edge, x, size)
    return center, size


def promote_bass_peaks(
    peak_mask: jnp.ndarray,
    center: jnp.ndarray,
    size: jnp.ndarray,
    x: jnp.ndarray,
    rng: VqtRange,
    highest_bassnote: int,
    harmonic_threshold: float,
) -> jnp.ndarray:
    """Harmonic-content boost for bass peaks (peak_detection.rs:172-241):
    score harmonics 2..5 (weights .5/.3/.15/.05) in the power domain against
    `harmonic_threshold` * fundamental power; boost the peak by
    ``10*log10(min(1 + 0.5*score/fundamental, 1.5))`` dB."""
    n = x.shape[0]
    bpo = float(rng.buckets_per_octave)
    is_bass = peak_mask & (center <= float(highest_bassnote))

    fundamental_power = jnp.power(10.0, size / 10.0)

    score = jnp.zeros_like(size)
    for harmonic, weight in zip((2, 3, 4, 5), (0.5, 0.3, 0.15, 0.05)):
        # harmonic bin = center + bpo * log2(h)
        hb = center + bpo * math.log2(harmonic)
        in_range = (hb >= 0.0) & (hb < n)
        lo = jnp.clip(jnp.floor(hb).astype(jnp.int32), 0, n - 1)
        hi = jnp.clip(jnp.ceil(hb).astype(jnp.int32), 0, n - 1)
        frac = hb - jnp.floor(hb)
        amp_db = jnp.where(lo == hi, x[lo], x[lo] * (1.0 - frac) + x[hi] * frac)
        hp = jnp.power(10.0, amp_db / 10.0)
        present = in_range & (hp > fundamental_power * harmonic_threshold)
        score = score + jnp.where(present, hp * weight, 0.0)

    boost = jnp.minimum(1.0 + 0.5 * score / jnp.maximum(fundamental_power, 1e-6), 1.5)
    boosted = size + 10.0 * jnp.log10(boost)
    return jnp.where(is_bass & (score > 0.0), boosted, size)


def top_k_peaks(
    peak_mask: jnp.ndarray, center: jnp.ndarray, size: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fixed-size peak list for list consumers (display balls, ML): the k
    largest peaks by size, returned in ascending center order with a validity
    mask. Invalid slots have center=+inf, size=0."""
    neg = jnp.where(peak_mask, size, -1.0)
    vals, idxs = jax.lax.top_k(neg, k)
    valid = vals >= 0.0
    c = jnp.where(valid, center[idxs], jnp.inf)
    s = jnp.where(valid, size[idxs], 0.0)
    order = jnp.argsort(c)
    return c[order], s[order], valid[order]
