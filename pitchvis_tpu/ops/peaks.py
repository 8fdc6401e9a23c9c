"""Vectorized spectral peak detection.

TPU-native reimplementation of the reference's peak pipeline
(`pitchvis_analysis/src/analysis_modules/peak_detection.rs`), which wraps the
`find_peaks` crate (a scipy.signal.find_peaks port). The reference returns a
variable-size ``HashSet<usize>``; JAX needs static shapes, so peaks are
represented as **per-bin masks and per-bin continuous values** — downstream
consumers (splat, calmness radius, accuracy scatter) are all bin-indexed
anyway, and a fixed top-K extraction is provided for list consumers.

Algorithms (scipy semantics, filter order: height -> distance -> prominence):

* local maxima with plateau handling (plateau midpoint is the peak position),
  O(n log n): run boundaries + packed-cummax segmented fills, no n^2 pass
* prominence via "nearest strictly-greater element" + window minima computed
  as masked broadcast-reductions — O(n^2) at every bin (`prominences`, the
  reference formulation) or O(n^2/2) on a pair-compacted candidate axis
  covering every local maximum (`prominences_compact`, the hot path)
* min-distance suppression (priority = peak height, ties to the higher index,
  matching scipy's argsort-from-the-end iteration) computed as a Jacobi
  fixpoint: a candidate is suppressed iff an unsuppressed higher-priority
  candidate lies strictly within `distance`. The greedy solution is the
  unique fixpoint; the default while_loop iterates to exact convergence
  (musical spectra: 2-3 rounds; adversarial decreasing-priority chains: up
  to the chain length, which is why the bounded mode is opt-in).

TPU performance rule observed throughout: NO data-dependent gathers or
scatters. Batched gathers inside loops/scans lower to serialized
dynamic-slices on TPU (measured ~1000x slower than the VPU); every lookup
here is either a static shift (jnp.roll + validity mask), a bounded-offset
select, or a masked broadcast-reduction. All functions operate on a single
spectrum (n,) and are `vmap`-friendly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import PeakDetectionParameters, VqtRange

# NumPy (not jnp) scalars: a module-level jnp constant would initialize the
# JAX backend at import time, pinning the platform before user code (or the
# golden generator / tests) can choose it.
_NEG = np.float32(-3.0e38)
_POS = np.float32(3.0e38)


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
    is the plateau midpoint (s + e) // 2. Edges cannot be peaks.

    O(n log n), gather-free: the neighbor comparisons x[s-1] < x and
    x[e+1] < x are evaluated once at each run boundary (where the neighbor
    is just roll(x, +-1)) and propagated along the run by a segmented
    forward/backward fill, implemented as a cummax over (index, flag) pairs
    packed into one integer (the index majorizes, so the scan carries the
    flag of the *latest* run boundary at or before each position)."""
    n = x.shape[0]
    idx = jnp.arange(n)

    # run boundaries of equal-value plateaus
    change = jnp.concatenate([jnp.ones(1, bool), x[1:] != x[:-1]])
    change_next = jnp.concatenate([x[1:] != x[:-1], jnp.ones(1, bool)])

    # Flags at run boundaries. The roll wrap-around only corrupts position 0
    # (start) / n-1 (end), whose runs are excluded by s > 0 / e < n-1 below.
    start_flag = change & (jnp.roll(x, 1) < x)
    end_flag = change_next & (jnp.roll(x, -1) < x)

    # forward-fill (run_start, start_flag) along runs in ONE packed cummax
    packed = jax.lax.cummax(
        jnp.where(change, idx * 2 + start_flag.astype(jnp.int32), -1)
    )
    s = packed >> 1
    prev_less = packed % 2 == 1
    # backward-fill (run_end, end_flag)
    ridx = n - 1 - idx
    packed_r = jax.lax.cummax(
        jnp.where(change_next, ridx * 2 + end_flag.astype(jnp.int32), -1)[::-1]
    )[::-1]
    e = n - 1 - (packed_r >> 1)
    next_less = packed_r % 2 == 1

    prev_ok = (s > 0) & prev_less
    next_ok = (e < n - 1) & next_less
    mid = (s + e) // 2
    return prev_ok & next_ok & (idx == mid)






def prominences(x: jnp.ndarray) -> jnp.ndarray:
    """Per-bin scipy-style prominence (valid at local maxima): the peak
    height minus the higher of the two window minima, where each window
    extends to the nearest strictly-greater sample (or the signal edge).

    Computed as four O(n^2) masked broadcast-reductions with NO
    data-dependent gathers: on TPU, batched gathers inside loops/scans lower
    to serialized dynamic-slices (~1000x slower than the VPU), while n^2
    masked reduces fuse into dense vector code. For n <= ~1k spectra this is
    the faster *and* simpler formulation (588^2 = 346k lanes per reduce)."""
    n = x.shape[0]
    idx = jnp.arange(n)
    i = idx[:, None]  # peak position
    j = idx[None, :]  # scanned position
    xi = x[:, None]
    xj = x[None, :]

    # nearest strictly-greater element on each side (-1 / n if none)
    left_bound = jnp.max(jnp.where((j < i) & (xj > xi), j, -1), axis=1)
    right_bound = jnp.min(jnp.where((j > i) & (xj > xi), j, n), axis=1)

    # window minima: min x[left_bound+1 .. i] and min x[i .. right_bound-1]
    left_min = jnp.min(
        jnp.where((j > left_bound[:, None]) & (j <= i), xj, _POS), axis=1
    )
    right_min = jnp.min(
        jnp.where((j >= i) & (j < right_bound[:, None]), xj, _POS), axis=1
    )
    return x - jnp.maximum(left_min, right_min)


def prominences_compact(
    x: jnp.ndarray,
    lmax: jnp.ndarray,
    min_height: float | None = None,
) -> jnp.ndarray:
    """Per-bin prominences, computed only at local maxima (optionally
    pre-filtered by ``min_height``); all other bins read as -inf-ish.
    Exactly equal to :func:`prominences` at every local-maximum bin —
    downstream peak masks only ever read prominence there.

    The trick: consecutive local maxima are always >= 2 bins apart (between
    two plateau-peaks there must be a strictly lower valley bin), so the
    bin pair (2k, 2k+1) holds at most one candidate. Compaction to n/2
    candidate slots and the scatter-back are therefore pure reshapes — no
    sort, no top-k, no gathers — and the four O(n^2) masked reductions of
    :func:`prominences` (the dominant analysis-chain cost at scale) become
    O(n^2/2) with every slot meaningful."""
    n = x.shape[0]
    n2 = (n + 1) // 2
    pad = 2 * n2 - n
    xp = jnp.pad(x, (0, pad), constant_values=_NEG)
    lp = jnp.pad(lmax, (0, pad), constant_values=False)
    if min_height is not None:
        lp = lp & (xp >= min_height)
    x2 = xp.reshape(n2, 2)
    l2 = lp.reshape(n2, 2)
    first = l2[:, 0]
    valid = (first | l2[:, 1])[:, None]
    c = jnp.where(first, jnp.arange(n2) * 2, jnp.arange(n2) * 2 + 1)[:, None]
    h = jnp.where(first, x2[:, 0], x2[:, 1])[:, None]
    # invalid slots get h=+inf so the bound reductions terminate immediately
    hi = jnp.where(valid, h, _POS)

    j = jnp.arange(n)[None, :]
    xj = x[None, :]
    # same four reductions as `prominences`, on the compact candidate axis
    left_bound = jnp.max(jnp.where((j < c) & (xj > hi), j, -1), axis=1, keepdims=True)
    right_bound = jnp.min(jnp.where((j > c) & (xj > hi), j, n), axis=1, keepdims=True)
    left_min = jnp.min(jnp.where((j > left_bound) & (j <= c), xj, _POS), axis=1, keepdims=True)
    right_min = jnp.min(jnp.where((j >= c) & (j < right_bound), xj, _POS), axis=1, keepdims=True)
    prom_k = jnp.where(valid, h - jnp.maximum(left_min, right_min), _NEG)[:, 0]

    # scatter back to bin space: elementwise selects + reshape
    out2 = jnp.stack(
        [jnp.where(first, prom_k, _NEG), jnp.where(~first & l2[:, 1], prom_k, _NEG)],
        axis=1,
    )
    return out2.reshape(-1)[:n]


def _suppress_by_distance(
    candidate: jnp.ndarray,
    height: jnp.ndarray,
    distance: int,
    max_iterations: int | None = None,
):
    """Greedy min-distance selection (scipy _select_by_peak_distance):
    among candidates, iteratively suppress any with an unsuppressed
    strictly-higher-priority candidate strictly within `distance` bins.
    Priority = (height, index); larger index wins exact-height ties.

    Tie-order audit (round-5 verdict item 6). The reference wraps the Rust
    `find_peaks` crate v0.1.5 (reference Cargo.lock; used at
    pitchvis_analysis/src/analysis_modules/peak_detection.rs:26-51), whose
    distance filter is the same scipy-family greedy: process peaks from
    highest to lowest priority, suppressing lower ones in range. For exact
    ties both scipy (unstable introsort argsort) and the crate (Rust sort's
    unspecified equal-key order) are deterministic-but-unspecified; this
    implementation pins the one total order that is EXPRESSIBLE as a pure
    elementwise rule — (height, index) lexicographic, larger index wins —
    which equals greedy processing under a STABLE priority sort. The crate's
    source is not vendored in the reference tree and this environment has no
    cargo/network to fetch it (attempt recorded, ROADMAP.md), so the pin is
    a checked fixture rather than a source-matched one:
    tests/test_peaks.py::TestExactTieOrder pins 2-tie and
    3-tie clusters (where scipy's small-array argsort happens to agree) and
    fuzzes tie-heavy spectra against an independent stable-sort greedy.

    The greedy solution is the unique Jacobi fixpoint, reached in <= the
    longest decreasing-priority chain of overlapping candidates.
    ``max_iterations=None`` iterates a `while_loop` to exact convergence;
    a fixed int unrolls a bounded `fori_loop` (no per-iteration convergence
    sync — the production fast path; musical spectra converge in <= 3)."""
    n = height.shape[0]
    idx = jnp.arange(n)

    def has_higher_neighbor(suppressed):
        alive = candidate & ~suppressed
        hit = jnp.zeros(n, bool)
        for off in range(-(distance - 1), distance):
            if off == 0:
                continue
            # neighbor j = i + off via static shift (no gathers)
            valid = (idx + off >= 0) & (idx + off < n)
            h_j = jnp.roll(height, -off)
            alive_j = jnp.roll(alive, -off)
            higher = (h_j > height) | ((h_j == height) & (off > 0))
            hit = hit | (valid & alive_j & higher)
        return hit & candidate

    if max_iterations is not None:
        suppressed = jax.lax.fori_loop(
            0,
            max_iterations,
            lambda _, s: has_higher_neighbor(s),
            jnp.zeros(n, bool),
        )
        return candidate & ~suppressed

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
    *,
    precomputed: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    suppress_iterations: int | None = None,
) -> jnp.ndarray:
    """Discrete peak mask, matching `find_peaks` (peak_detection.rs:26-51):
    local maxima filtered by min_height, then min-distance (0.4 semitones),
    then min_prominence; the first ~half semitone of bins is dropped.

    ``precomputed``: optional (local_maxima, prominences) pair — both are
    threshold-independent, so callers applying several configs to the same
    spectrum (analysis.rs:331-349) compute them once.
    """
    if precomputed is None:
        mask, prom = local_maxima(x), None
    else:
        mask, prom = precomputed
    mask = mask & (x >= config.min_height)
    d = min_separation_bins(buckets_per_octave)
    if d >= 2:
        mask = _suppress_by_distance(mask, x, d, suppress_iterations)
    if prom is None:
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

    xm = jnp.roll(x, 1)  # x[i-1]; wrap only affects edge bins (overridden)
    x0 = x
    xp = jnp.roll(x, -1)  # x[i+1]

    # Uniform log-f spacing: the Lagrange parabola maximum reduces to
    # p + (y- - y+) / (2 (y- - 2 y0 + y+)) bins; the reference's explicit
    # log-f arithmetic is algebraically identical for exact log spacing.
    denom = xm - 2.0 * x0 + xp
    offset = jnp.where(jnp.abs(denom) < 1e-12, 0.0, (xm - xp) / (2.0 * denom))
    offset = jnp.clip(offset, -1.0, 1.0)

    center = jnp.clip(idx.astype(jnp.float32) + offset, 0.0, n - 1.0)

    # linear interpolation at the refined center: the offset is within one
    # bin of i, so both interpolation endpoints are selects over {x[i-1],
    # x[i], x[i+1]} — no data-dependent gathers
    size_pos = x0 * (1.0 - offset) + xp * offset  # offset in [0, 1]
    size_neg = xm * (-offset) + x0 * (1.0 + offset)  # offset in [-1, 0)
    size = jnp.maximum(jnp.where(offset >= 0.0, size_pos, size_neg), 0.0)

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
    idx = jnp.arange(n)
    bpo = float(rng.buckets_per_octave)
    is_bass = peak_mask & (center <= float(highest_bassnote))

    fundamental_power = jnp.power(10.0, size / 10.0)

    def shifted(d: int) -> jnp.ndarray:
        """x[i + d] via static shift; out-of-range filled with -inf-ish
        (never selected: in_range masks such cases)."""
        return jnp.where((idx + d >= 0) & (idx + d < n), jnp.roll(x, -d), _NEG)

    score = jnp.zeros_like(size)
    for harmonic, weight in zip((2, 3, 4, 5), (0.5, 0.3, 0.15, 0.05)):
        # harmonic bin = center + bpo*log2(h); center is within one bin of i,
        # so floor(hb) - i takes one of three static values -> selects over
        # static shifts instead of gathers
        c_h = bpo * math.log2(harmonic)
        hb = center + c_h
        in_range = (hb >= 0.0) & (hb < n)
        lo_rel_mid = math.floor(c_h)
        lo_rel = jnp.floor(hb).astype(jnp.int32) - idx
        x_lo = jnp.full(n, _NEG)
        x_hi = jnp.full(n, _NEG)
        for d in (lo_rel_mid - 1, lo_rel_mid, lo_rel_mid + 1):
            x_lo = jnp.where(lo_rel == d, shifted(d), x_lo)
            x_hi = jnp.where(lo_rel == d, shifted(d + 1), x_hi)
        frac = hb - jnp.floor(hb)
        lo_is_hi = (frac == 0.0) | (jnp.floor(hb) >= n - 1)
        amp_db = jnp.where(lo_is_hi, x_lo, x_lo * (1.0 - frac) + x_hi * frac)
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
