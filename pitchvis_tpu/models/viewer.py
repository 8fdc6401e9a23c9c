"""Display-derived outputs.

The reference's Bevy/WGSL presentation layer is out of scope for a TPU
framework, but every quantity it derives from the analysis is exposed here as
batched, jittable outputs (SURVEY.md section 7), so a renderer (or a headless
consumer) gets exactly what `update_display` computes:

* log-spiral ball geometry (display_system/util.rs:9-20)
* per-ball state: position, color, alpha, scale, calmness/accuracy shader
  params, exponential fade, proximity hiding (update.rs:136-334)
* bloom intensity = clamp(1.3 * scene_calmness) (update.rs:336-351)
* chroma vector: power per pitch class, C4-referenced, max-normalized
  (update.rs:1090-1144)
* scrolling spectrogram rows in VQT and Peaks modes (update.rs:930-1087)
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.config import VqtRange
from ..ops.colors import COLORS, EASING_POW, GRAY_LEVEL, calculate_color
from ..utils.rounding import rust_round

PITCH_BALL_SCALE_FACTOR = 1.0 / 305.0  # update.rs:23
VISIBILITY_CUTOFF = 0.019  # update.rs:147 — compared against transform.scale
FADE_ALPHA_FLOOR = 0.7  # update.rs:169 — fading balls never drop below this
C4_FREQ = 261.626  # update.rs:1108
PEAK_RADIUS = 2.0  # spectrogram peak splat radius (update.rs)
SPIRAL_SEGMENTS_PER_SEMITONE = 6  # update.rs:22
HIGHEST_BASSNOTE = 28  # semitones; setup.rs:24 (12*2+4)


def bass_cylinder_count(octaves: int) -> int:
    """Number of bass-spiral cylinders the reference spawns (setup.rs:127-172):
    consecutive-point segments over the first HIGHEST_BASSNOTE*6 visual spiral
    points (72 per octave), i.e. `take(168).tuple_windows()` -> one less
    segment than points."""
    n_points = min(HIGHEST_BASSNOTE * SPIRAL_SEGMENTS_PER_SEMITONE,
                   octaves * 12 * SPIRAL_SEGMENTS_PER_SEMITONE)
    return n_points - 1
CALMNESS_HISTORY_CAPACITY = 300  # app/common.rs:2037
CALMNESS_HISTOGRAM_HEIGHT_SCALE = 0.5  # update.rs:795


def bin_to_spiral(buckets_per_octave: int, x) -> tuple:
    """Log-spiral coordinates of a (fractional) bin (util.rs:9-20):
    radius = 2*(0.3 + (x/bpo)^0.75), one turn per octave, bin 0 at angle 0
    measured so that (-cos, sin) orients like the reference."""
    x = jnp.asarray(x, jnp.float32)
    radius = 2.0 * (0.3 + (x / buckets_per_octave) ** 0.75)
    angle = (x + buckets_per_octave) / buckets_per_octave * 2.0 * math.pi
    return -jnp.cos(angle) * radius, jnp.sin(angle) * radius


def spiral_points(octaves: int, buckets_per_octave: int) -> np.ndarray:
    """(n_buckets, 2) static ball positions (util.rs:3-7)."""
    x, y = bin_to_spiral(buckets_per_octave, jnp.arange(octaves * buckets_per_octave))
    return np.stack([np.asarray(x), np.asarray(y)], axis=-1)


def bloom_intensity(scene_calmness) -> jnp.ndarray:
    """update.rs:346-347."""
    return jnp.clip(jnp.asarray(scene_calmness) * 1.3, 0.0, 1.0)


def pitch_color_rotation(buckets_per_octave: int):
    """The viewer rotates bins by (bpo - 3*(bpo/12)) so bin 0 (A) maps to
    pitch class A (update.rs:220-222)."""
    return buckets_per_octave - 3 * (buckets_per_octave // 12)


def chroma_vector(x_vqt_smoothed: jnp.ndarray, rng: VqtRange) -> jnp.ndarray:
    """12-bin chroma: power summed per pitch class (C4-referenced), then
    max-normalized (update.rs:1103-1131)."""
    n = rng.n_buckets
    semitones_from_c4 = 12.0 * math.log2(rng.min_freq / C4_FREQ)
    # Rust f32::round is half-away-from-zero (Python round is half-to-even)
    bin0 = math.floor(abs(semitones_from_c4) + 0.5) * (
        -1 if semitones_from_c4 < 0 else 1
    )
    bin0_class = (bin0 % 12 + 12) % 12

    # half-away-from-zero like the reference's .round(); the operand is
    # non-negative so floor(x+0.5) suffices (jnp.round is half-to-even and
    # misassigns every half-semitone bin when bpo/12 is even)
    semitone = jnp.floor(
        jnp.arange(n) * 12.0 / rng.buckets_per_octave + 0.5
    ).astype(jnp.int32)
    pitch_class = (semitone + bin0_class) % 12
    power = jnp.power(10.0, x_vqt_smoothed / 10.0)
    chroma = jax.ops.segment_sum(power, pitch_class, num_segments=12)
    mx = jnp.max(chroma)
    return jnp.where(mx > 0.0, chroma / jnp.maximum(mx, 1e-30), chroma)


class BallState(struct.PyTreeNode):
    """Per-bin "pitch ball" carry (scale decays exponentially when the bin's
    peak disappears; update.rs:136-184). `center` keeps the last placed
    fractional position so a fading ball stays where its peak was instead of
    snapping to the integer bin; `rgba` and `calm` keep the last placed
    color/shader params the same way (the reference's ball entities keep
    their Transform AND material while fading, with alpha decaying toward
    the 0.7 floor, update.rs:166-170)."""

    scale: jnp.ndarray  # (n,)
    z_offset: jnp.ndarray  # (n,) background drift of fading balls
    center: jnp.ndarray  # (n,) last placed fractional bin position
    rgba: jnp.ndarray  # (n, 4) last placed color (alpha decays while fading)
    calm: jnp.ndarray  # (n,) last placed calmness shader param

    @classmethod
    def init(cls, n_buckets: int) -> "BallState":
        return cls(
            scale=jnp.zeros(n_buckets),
            z_offset=jnp.zeros(n_buckets),
            center=jnp.arange(n_buckets, dtype=jnp.float32),
            rgba=jnp.zeros((n_buckets, 4)),
            calm=jnp.zeros(n_buckets),
        )


class BallOutputs(struct.PyTreeNode):
    position: jnp.ndarray  # (n, 3) spiral x, y, z-order
    rgba: jnp.ndarray  # (n, 4)
    scale: jnp.ndarray  # (n,)
    visible: jnp.ndarray  # (n,) bool
    calmness: jnp.ndarray  # shader params (update.rs:263-266)
    pitch_accuracy: jnp.ndarray
    pitch_deviation: jnp.ndarray


@partial(
    jax.jit, static_argnames=("rng", "shader_params", "ball_scale_factor")
)
def update_balls(
    rng: VqtRange,
    state: BallState,
    peaks: jnp.ndarray,
    peak_center: jnp.ndarray,
    peak_size: jnp.ndarray,
    calmness: jnp.ndarray,
    pitch_accuracy: jnp.ndarray,
    pitch_deviation: jnp.ndarray,
    dt,
    *,
    shader_params: bool = True,
    ball_scale_factor: float = 1.0,
) -> tuple[BallState, BallOutputs]:
    """One display frame of ball state (update.rs:136-334): fade all balls
    with the per-bin dropoff (0.85 - 0.15*i/n)^(30*dt), then re-place/refresh
    balls whose bin holds a continuous peak (keyed by trunc(center)), hide
    balls within 0.23 semitones of any peak, keep peaks themselves visible.

    ``shader_params=False`` models display modes other than
    Normal/Debugging: the calmness/accuracy/deviation material params are
    zeroed (update.rs:268-272), which also drops the calmness size boost
    (calmness_scale reads the zeroed param, update.rs:276).
    ``ball_scale_factor=0.7`` is VisualsMode::Performance
    (update.rs:292-297)."""
    n = rng.n_buckets
    idx = jnp.arange(n)
    dt = jnp.asarray(dt, jnp.float32)

    # fade (update.rs:155-166)
    dropoff = (0.85 - 0.15 * idx.astype(jnp.float32) / n) ** (30.0 * dt)
    scale = state.scale * dropoff
    z_offset = state.z_offset - 0.001 * 30.0 * dt

    def shifted(x, d, fill):
        """x[i] moved to bin i+d, no wraparound (vacated lanes = fill)."""
        y = jnp.roll(x, d, axis=-1)
        edge = (idx < d) if d > 0 else (idx >= n + d)
        return jnp.where(edge, fill, y) if d != 0 else x

    # active peaks keyed by trunc(center) (update.rs:208-212). Peak centers
    # clamp to one bin of their source (ops/peaks.py enhance), so the key
    # scatter is THREE static shifts. Measured on-chip: the scatter form
    # lowers fine here (unique keys, one set — not the serialized-gather
    # pathology docs/PERFORMANCE.md documents), so this form is perf-neutral;
    # it is kept for the repo's static-shift convention AND because it
    # DEFINES the duplicate-key order (higher source bin wins, matching the
    # reference's ascending peak iteration) where a scatter left it undefined
    key_off = jnp.clip(peak_center.astype(jnp.int32), 0, n - 1) - idx
    active = jnp.zeros(n, bool)
    center_at = jnp.zeros(n)
    size_at = jnp.zeros(n)
    # d descending: when two peaks key the same bin (possible at the
    # 2-bin min distance with ±1-bin centers), the HIGHER source bin wins,
    # like the reference's ascending peak iteration with overwrite
    for d in (1, 0, -1):
        src = peaks & (key_off == d)
        hit = shifted(src, d, False)
        active = active | hit
        center_at = jnp.where(hit, shifted(peak_center, d, 0.0), center_at)
        size_at = jnp.where(hit, shifted(peak_size, d, 0.0), size_at)

    max_size = jnp.maximum(jnp.max(jnp.where(peaks, peak_size, 0.0)), 1e-30)
    color_coefficient = 1.0 - (1.0 - size_at / max_size) ** 2.0

    rotation = pitch_color_rotation(rng.buckets_per_octave)
    bucket = jnp.mod(center_at + rotation, rng.buckets_per_octave)
    rgb = calculate_color(rng.buckets_per_octave, bucket, COLORS, GRAY_LEVEL, EASING_POW)

    if shader_params:
        calm_param = jnp.clip(calmness - 0.27, 0.0, 1.0)  # update.rs:264
        out_accuracy = pitch_accuracy
        out_deviation = pitch_deviation
    else:  # update.rs:268-272 — params zeroed outside Normal/Debugging
        calm_param = jnp.zeros_like(calmness)
        out_accuracy = jnp.zeros_like(pitch_accuracy)
        out_deviation = jnp.zeros_like(pitch_deviation)
    calmness_scale = 1.0 + 0.2 * calm_param

    new_scale = jnp.where(
        active,
        size_at * ball_scale_factor * PITCH_BALL_SCALE_FACTOR * calmness_scale,
        scale,
    )
    z_order = jnp.where(active, (size_at / max_size - 1.01) * 12.5, z_offset)
    z_offset = jnp.where(active, jnp.zeros_like(z_offset), z_offset)

    # fading balls keep the position AND material their peak last had
    # (update.rs keeps the entity Transform and color, decaying only alpha
    # toward the 0.7 floor, update.rs:166-170); active bins get fresh
    # color + alpha = color_coefficient
    new_center = jnp.where(active, center_at, state.center)
    faded_alpha = jnp.maximum(state.rgba[:, 3] * dropoff, FADE_ALPHA_FLOOR)
    new_rgba = jnp.where(
        active[:, None],
        jnp.concatenate([rgb, color_coefficient[:, None]], axis=-1),
        jnp.concatenate([state.rgba[:, :3], faded_alpha[:, None]], axis=-1),
    )
    new_calm = jnp.where(active, calm_param, state.calm)
    x, y = bin_to_spiral(rng.buckets_per_octave, new_center)
    position = jnp.stack([x, y, z_order], axis=-1)

    # visibility compares the TRANSFORM scale against the cutoff
    # (update.rs:153,175: size * PITCH_BALL_SCALE_FACTOR >= 0.019);
    # placement additionally shows any active ball above 0.002
    # (update.rs:299-302)
    visible = new_scale >= VISIBILITY_CUTOFF
    visible = jnp.where(active & (new_scale >= 0.002), True, visible)

    # hide every integer bin in [round(center-radius), round(center+radius)]
    # around each peak, except the peak bins themselves (update.rs:305-327;
    # radius uses the reference's INTEGER division bpo/12). round() in Rust
    # is half-away-from-zero -> floor(x+0.5) on these non-negative centers.
    # Bin j is hidden by the peak at source bin i iff lo_i <= j <= hi_i;
    # |j - i| <= radius + 1.5, so this is a static-shift window too
    radius = (rng.buckets_per_octave // 12) * 0.23
    lo = jnp.floor(peak_center - radius + 0.5)
    hi = jnp.floor(peak_center + radius + 0.5)
    hide = jnp.zeros(n, bool)
    span = int(radius) + 2
    for d in range(-span, span + 1):
        j = idx + d
        src = peaks & (lo <= j) & (j <= hi)
        hide = hide | shifted(src, d, False)
    hide = hide & ~active
    visible = visible & ~hide

    new_state = BallState(
        scale=new_scale, z_offset=z_offset, center=new_center,
        rgba=new_rgba, calm=new_calm,
    )
    return new_state, BallOutputs(
        position=position,
        rgba=new_rgba,
        scale=new_scale,
        visible=visible,
        calmness=new_calm,
        pitch_accuracy=out_accuracy,
        pitch_deviation=out_deviation,
    )


def spectrogram_row_vqt(rng: VqtRange, x_vqt_smoothed: jnp.ndarray) -> jnp.ndarray:
    """(n, 4) RGBA8 spectrogram row in VQT mode (update.rs:960-1005):
    brightness = clamp((1-(1-v/max)^2)*1.5), color = pitch color * 1.2."""
    n = rng.n_buckets
    mx = jnp.max(x_vqt_smoothed)
    normalized = x_vqt_smoothed / (mx + 0.001)
    brightness = jnp.where(mx > 0.0, jnp.clip((1.0 - (1.0 - normalized) ** 2.0) * 1.5, 0.0, 1.0), 0.0)

    rotation = pitch_color_rotation(rng.buckets_per_octave)
    bucket = ((jnp.arange(n) + rotation) % rng.buckets_per_octave).astype(jnp.float32)
    rgb = calculate_color(rng.buckets_per_octave, bucket, COLORS, GRAY_LEVEL, EASING_POW)
    rgba = jnp.concatenate([rgb * 1.2, brightness[:, None] * 1.2], axis=-1)
    # the reference clamps then `as u8` — truncation, not rounding
    # (update.rs:998-1001)
    return jnp.floor(jnp.clip(rgba * 255.0, 0.0, 255.0)).astype(jnp.uint8)


def spectrogram_row_peaks(
    rng: VqtRange, peaks: jnp.ndarray, peak_center: jnp.ndarray, peak_size: jnp.ndarray
) -> jnp.ndarray:
    """(n, 4) RGBA8 row in Peaks mode (update.rs:1008-1065): each continuous
    peak splats a Gaussian of radius 2 bins with its pitch color."""
    n = rng.n_buckets
    idx = jnp.arange(n, dtype=jnp.float32)
    max_size = jnp.maximum(jnp.max(jnp.where(peaks, peak_size, 0.0)), 1e-30)

    rotation = pitch_color_rotation(rng.buckets_per_octave)

    brightness = jnp.clip((1.0 - (1.0 - peak_size / max_size) ** 2.0) * 1.5, 0.0, 1.0)
    bucket = jnp.mod(peak_center + rotation, rng.buckets_per_octave)
    rgb = calculate_color(rng.buckets_per_octave, bucket, COLORS, GRAY_LEVEL, EASING_POW)

    rgba = jnp.zeros((n, 4))
    # Pixel j is painted by the peak at source bin j-s whose bin window
    # [floor(c-R), ceil(c+R)) contains j with |j-c| <= R (update.rs:1038-1046;
    # centers sit within one bin of their source, ops/peaks.py enhance, so s
    # spans [-(R+1), R+1]). The reference iterates peaks ASCENDING by center
    # with overwrite (update.rs:1017-1058), so the highest in-radius peak
    # wins every contested pixel: iterate s DESCENDING (= source bin
    # ascending) with selects — defined winner everywhere, no scatter (a
    # duplicate-index .at[].set left contested pixels undefined and an
    # ascending-offset loop let the LOWER peak win).
    radius = int(PEAK_RADIUS)
    for s in range(radius + 1, -radius - 2, -1):

        def shift(x):
            y = jnp.roll(x, s, axis=0)
            edge = (jnp.arange(n) < s) if s > 0 else (jnp.arange(n) >= n + s)
            return jnp.where(edge if x.ndim == 1 else edge[:, None], 0.0, y)

        src_peak = shift(peaks.astype(jnp.float32)) > 0.5
        src_center = shift(peak_center)
        distance = jnp.abs(idx - src_center)
        # the reference's bin loop runs floor(c-R) .. ceil(c+R) EXCLUSIVE:
        # when c+R is exactly integral that upper-edge bin is skipped even
        # though its distance == R
        valid = (
            src_peak
            & (distance <= PEAK_RADIUS)
            & (idx < jnp.ceil(src_center + PEAK_RADIUS))
        )
        falloff = jnp.exp(-distance * distance / (PEAK_RADIUS * PEAK_RADIUS * 0.5))
        px = jnp.concatenate(
            [shift(rgb) * 1.2, (shift(brightness) * falloff)[:, None] * 1.2],
            axis=-1,
        )
        rgba = jnp.where(valid[:, None], px, rgba)
    # clamp then truncate, like the reference's `as u8` (update.rs:1052-1058)
    return jnp.floor(jnp.clip(rgba * 255.0, 0.0, 255.0)).astype(jnp.uint8)


class BassSpiralOutputs(struct.PyTreeNode):
    visible: jnp.ndarray  # (n_segments,) bool — lit cylinders, base upward
    rgba: jnp.ndarray  # (4,) shared color of every lit segment


def bass_spiral(
    rng: VqtRange,
    peaks: jnp.ndarray,
    peak_center: jnp.ndarray,
    peak_size: jnp.ndarray,
) -> BassSpiralOutputs:
    """Bass-spiral coloring up to the LOWEST continuous peak
    (update.rs:353-426): segments 0..round(center_semitones)*6 light up in
    the pitch color of the rounded semitone, with alpha
    1-(1-size/max_size)^2. No peaks, or a lowest peak beyond the CYLINDER
    range, leaves every segment hidden (the reference hides all cylinders
    first and returns early when round(center)*6 >= the spawned cylinder
    count, update.rs:382-387; only HIGHEST_BASSNOTE*6 spiral points get
    cylinders, setup.rs:134-137)."""
    n_segments = bass_cylinder_count(rng.octaves)
    bpo = rng.buckets_per_octave

    has_peak = jnp.any(peaks)
    # lowest peak via masked reduction, not a data-dependent gather (the
    # fused serving step runs this per hop; CLAUDE.md performance rule)
    first = peaks & (jnp.cumsum(peaks) == 1)
    center = jnp.sum(jnp.where(first, peak_center, 0.0)) / bpo * 12.0  # semitones
    size = jnp.sum(jnp.where(first, peak_size, 0.0))
    rounded = rust_round(center)  # center.round(), update.rs:382/390
    n_lit = rounded * SPIRAL_SEGMENTS_PER_SEMITONE  # update.rs:390
    in_range = n_lit < n_segments  # cylinder_entities.len(), update.rs:382-387

    lit = jnp.arange(n_segments) < n_lit.astype(jnp.int32)
    visible = lit & has_peak & in_range

    # one color for every lit segment: the rounded semitone's pitch class
    # (update.rs:398-406)
    color_map_ref = rounded * bpo / 12.0
    rotation = pitch_color_rotation(bpo)
    bucket = jnp.mod(color_map_ref + rotation, bpo)
    rgb = calculate_color(bpo, bucket, COLORS, GRAY_LEVEL, EASING_POW)
    max_size = jnp.maximum(jnp.max(jnp.where(peaks, peak_size, 0.0)), 1e-30)
    alpha = 1.0 - (1.0 - size / max_size) ** 2.0
    rgba = jnp.concatenate([rgb, alpha[None]])
    return BassSpiralOutputs(visible=visible, rgba=rgba)


def calmness_to_color(calmness: jnp.ndarray) -> jnp.ndarray:
    """(...,) calmness -> (..., 3) srgb: cyan >0.7, yellow >0.3, red below
    (update.rs:27-35)."""
    calmness = jnp.asarray(calmness)
    cyan = jnp.array([0.5, 0.8, 1.0])
    yellow = jnp.array([1.0, 1.0, 0.5])
    red = jnp.array([1.0, 0.5, 0.5])
    c = calmness[..., None]
    return jnp.where(c > 0.7, cyan, jnp.where(c > 0.3, yellow, red))


class CalmnessHistogramOutputs(struct.PyTreeNode):
    heights: jnp.ndarray  # (n,) contour heights = calmness * 0.5
    segment_rgb: jnp.ndarray  # (n-1, 3) per-segment color from midpoint


def calmness_histogram(calmness: jnp.ndarray) -> CalmnessHistogramOutputs:
    """Per-bin calmness contour of the debugging overlay (update.rs:745-869):
    line heights are calmness * 0.5 and each segment is colored by the
    calmness_to_color threshold palette at the midpoint of its endpoints.
    The quad/triangle mesh the reference builds from these is presentation
    glue; the heights + colors ARE the data content."""
    heights = calmness * CALMNESS_HISTOGRAM_HEIGHT_SCALE
    mid = (calmness[..., :-1] + calmness[..., 1:]) * 0.5
    return CalmnessHistogramOutputs(heights=heights, segment_rgb=calmness_to_color(mid))


class CalmnessGraphState(struct.PyTreeNode):
    """Scene-calmness history ring of the debugging overlay
    (update.rs:640-744; capacity 300 at app/common.rs:2037). ``push`` writes
    the newest smoothed scene calmness; ``trace`` returns the values ordered
    oldest -> newest plus the per-segment threshold colors — the x/y line
    positions the reference derives from these are presentation glue."""

    values: jnp.ndarray  # (capacity,) circular
    write_index: jnp.ndarray  # scalar int32

    @classmethod
    def init(cls, capacity: int = CALMNESS_HISTORY_CAPACITY) -> "CalmnessGraphState":
        return cls(
            values=jnp.zeros(capacity, jnp.float32),
            write_index=jnp.zeros((), jnp.int32),
        )

    def push(self, scene_calmness) -> "CalmnessGraphState":
        cap = self.values.shape[0]
        vals = jax.lax.dynamic_update_index_in_dim(
            self.values, jnp.asarray(scene_calmness, jnp.float32), self.write_index, 0
        )
        return CalmnessGraphState(values=vals, write_index=(self.write_index + 1) % cap)

    def trace(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(values oldest->newest (capacity,), segment colors (capacity-1, 3)).
        Segment i's color keys off its OLDER endpoint, like update.rs:683-688."""
        ordered = jnp.roll(self.values, -self.write_index)
        return ordered, calmness_to_color(ordered[:-1])


class SpectrogramState(struct.PyTreeNode):
    """Circular-buffer spectrogram (height, n, 4) u8, newest row at
    write_index; the scroll shader's V-offset equals write_index/height
    (spectrogram_scroll.wgsl)."""

    image: jnp.ndarray
    write_index: jnp.ndarray  # scalar int32

    @classmethod
    def init(cls, height: int, n_buckets: int) -> "SpectrogramState":
        return cls(
            image=jnp.zeros((height, n_buckets, 4), jnp.uint8),
            write_index=jnp.zeros((), jnp.int32),
        )

    def push(self, row: jnp.ndarray) -> "SpectrogramState":
        h = self.image.shape[0]
        img = jax.lax.dynamic_update_index_in_dim(self.image, row, self.write_index, 0)
        nxt = (self.write_index + 1) % h
        img = jax.lax.dynamic_update_index_in_dim(
            img, jnp.zeros_like(row), nxt, 0
        )  # clear next line (update.rs:1068-1074)
        return SpectrogramState(image=img, write_index=nxt)
