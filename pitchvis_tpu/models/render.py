"""TPU rasterizer for the PitchVis scene.

The reference presents its analysis through a Bevy/wgpu app
(pitchvis_viewer/src/display_system/): an orthographic 2D camera over a
log-spiral of 588 "pitch balls" shaded by `noisy_color_rings_2d.wgsl`, a
spider net, a bass spiral, and HDR bloom. That GUI stack is platform glue —
but the *image* it produces is math, and this module computes it as one
batched, jittable JAX program so the framework can serve rendered frames
with no GPU/windowing stack — measured at ~720 frames/s = 12 concurrent
realtime 60 FPS 360p displays per chip with the exact post chain
(`bench.py --config render` is the reproducible number; the exact 512-high
bloom pyramid is now the per-frame bound). Analysis itself scales to
thousands of streams; rendering is the display-rate consumer path for the
streams somebody is watching (render_streams).

Faithful pieces (exact formulas, cited):
* scene layout: camera `FixedVertical { viewport_height: 38*0.41421357 }`
  (setup.rs:359-363), clear color srgb(0.23, 0.23, 0.25) (mod.rs:18-19),
  20x20 ball quads on the spiral (setup.rs:110), spider net rays of radius
  octaves*2.2 + visual spiral polyline, thickness 0.05, srgb(0.3, 0.3, 0.3)
  at z=-13 (setup.rs:174-223), bass cylinders 0.05 wide at z=-12.7
  (setup.rs:127-172), back-to-front alpha blending in z order (Bevy 2D
  transparent pass; ball z = (size/max-1.01)*12.5, update.rs:232-234).
* the ball fragment shader (noisy_color_rings_2d.wgsl, ACTIVE options):
  Gustavson simplex noise (lines 6-75), `ring(uv) = sin(r*sqrt(r)*pi)^2`
  (116-120), the pitch-accuracy center dot (126-141), the spiral-star
  tuning indicator (231-260), the fragment composition with
  `ring_strength = clamp(1-calmness*1.65)^3` and the smooth circle
  boundary (395-429).
* shading happens in LINEAR color space (Bevy converts `Color::srgb*`
  uniforms to LinearRgba before upload); sRGB encode happens at the end.

* post-processing, ported from the published implementations behind the
  reference's camera components (the crates are Bevy's, not vendored in
  the reference tree, so the port is pinned by this repo's own pixel
  goldens rather than a GPU capture): the full mip-chain bloom
  (bevy_core_pipeline bloom: 13-tap Jimenez downsample pyramid at the
  512-high internal resolution, soft-threshold prefilter 0.17/0.82, 3x3
  tent upsampling, compute_blend_factor per-mip weights for the
  reference's Additive settings, setup.rs:367-377) — expressed as
  separable MXU matmul pairs (see `_resample_matrix`), and
  `Tonemapping::SomewhatBoringDisplayTransform` (Stachowiak's SBDT as
  shipped in Bevy's tonemapping.wgsl, setup.rs:358).
* the pitch-name Text2d ring (setup.rs:386-416): DejaVuSans glyphs (the
  same typeface the reference ships) baked into a committed atlas
  (models/glyph_atlas.py) and composited as a static layer. Known
  layout-metric deviation (<0.5 px): Bevy's 1.2 em line box vs FreeType's
  ascent+descent (see glyph_atlas.py docstring).

This is a DISPLAY-RATE stage (it runs per rendered frame, not per analysis
hop); it deliberately uses a sorted `lax.scan` with per-ball dynamic patch
updates, which is fine here and NOT subject to the hot-path gather rule in
ops/peaks.py (that rule is about the per-hop analysis chain).
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.config import VqtRange
from .viewer import (
    HIGHEST_BASSNOTE,
    SPIRAL_SEGMENTS_PER_SEMITONE,
    BallOutputs,
    BassSpiralOutputs,
    bass_cylinder_count,
    bloom_intensity,
)

# setup.rs:359-363 — FixedVertical viewport height in world units
VIEWPORT_HEIGHT = 38.0 * 0.414_213_57
# mod.rs:18-21 — clear colors (sRGB)
CLEAR_COLOR = (0.23, 0.23, 0.25)  # CLEAR_COLOR_NEUTRAL
CLEAR_COLOR_GALAXY = (0.05, 0.0, 0.05)
BALL_HALF_EXTENT = 10.0  # setup.rs:110 — Rectangle::new(20, 20) half size
NET_COLOR = (0.3, 0.3, 0.3)  # setup.rs:200/220
NET_THICKNESS = 0.05  # setup.rs:197/215
BASS_WIDTH = 0.05  # setup.rs:159 — Rectangle::new(0.05, h + 0.01)
BASS_END_EXTENSION = 0.005  # the h + 0.01 overhang, half per end
# setup.rs:367-377 — the reference's Bloom component settings
BLOOM_THRESHOLD = 0.17  # prefilter.threshold
BLOOM_SOFTNESS = 0.82  # prefilter.threshold_softness
BLOOM_LF_BOOST = 1.0  # low_frequency_boost
BLOOM_LF_CURVATURE = 1.0  # low_frequency_boost_curvature
BLOOM_HIGH_PASS = 0.52  # high_pass_frequency
# bevy_core_pipeline bloom internals: the pyramid runs at a fixed internal
# resolution capped at 512 px high (MAX_MIP_DIMENSION), mip count
# ilog2(512).max(2) - 1 = 8
BLOOM_MAX_MIP_DIMENSION = 512
BLOOM_MIP_COUNT = 8


def srgb_to_linear(c):
    """IEC 61966-2-1 decode (what Bevy's Color::srgb -> LinearRgba does)."""
    c = jnp.asarray(c, jnp.float32)
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c):
    c = jnp.asarray(c, jnp.float32)
    c = jnp.maximum(c, 0.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _step(edge, x):
    return jnp.where(x >= edge, 1.0, 0.0)


def simplex_noise3(x, y, z):
    """Gustavson/McEwan 3D simplex noise, an exact f32 port of
    `simplexNoise3` in noisy_color_rings_2d.wgsl:6-75 (component-wise; the
    vec3/vec4 lanes of the WGSL are unrolled)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    z = jnp.asarray(z, jnp.float32)
    C_x, C_y = np.float32(1.0 / 6.0), np.float32(1.0 / 3.0)

    def permute4(v):
        return jnp.mod((v * 34.0 + 1.0) * v, 289.0)

    s = (x + y + z) * C_y
    ix, iy, iz = jnp.floor(x + s), jnp.floor(y + s), jnp.floor(z + s)
    t = (ix + iy + iz) * C_x
    x0x, x0y, x0z = x - ix + t, y - iy + t, z - iz + t

    # g = step(x0.yzx, x0.xyz); l = 1 - g
    gx, gy, gz = _step(x0y, x0x), _step(x0z, x0y), _step(x0x, x0z)
    lx, ly, lz = 1.0 - gx, 1.0 - gy, 1.0 - gz
    # i1 = min(g.xyz, l.zxy); i2 = max(g.xyz, l.zxy)
    i1x, i1y, i1z = jnp.minimum(gx, lz), jnp.minimum(gy, lx), jnp.minimum(gz, ly)
    i2x, i2y, i2z = jnp.maximum(gx, lz), jnp.maximum(gy, lx), jnp.maximum(gz, ly)

    x1x, x1y, x1z = x0x - i1x + C_x, x0y - i1y + C_x, x0z - i1z + C_x
    x2x, x2y, x2z = x0x - i2x + 2.0 * C_x, x0y - i2y + 2.0 * C_x, x0z - i2z + 2.0 * C_x
    x3x, x3y, x3z = x0x - 1.0 + 3.0 * C_x, x0y - 1.0 + 3.0 * C_x, x0z - 1.0 + 3.0 * C_x

    ix, iy, iz = jnp.mod(ix, 289.0), jnp.mod(iy, 289.0), jnp.mod(iz, 289.0)
    # p = permute4(permute4(permute4(iz + [0,i1z,i2z,1]) + iy + [...]) + ix + [...])
    p = [None] * 4
    adds = [
        (0.0, 0.0, 0.0),
        (i1z, i1y, i1x),
        (i2z, i2y, i2x),
        (1.0, 1.0, 1.0),
    ]
    inner = [permute4(iz + a[0]) for a in adds]
    mid = [permute4(inner[k] + iy + adds[k][1]) for k in range(4)]
    p = [permute4(mid[k] + ix + adds[k][2]) for k in range(4)]

    ns_x = np.float32(2.0 / 7.0 - 0.0)  # n_*D.w - D.x with n_=1/7, D=(0,.5,1,2)
    ns_y = np.float32(1.0 / 7.0 * 0.5 - 1.0)  # n_*D.y - D.z
    ns_z = np.float32(1.0 / 7.0 * 1.0 - 0.0)  # n_*D.z - D.x

    gx4, gy4, gz4, h4 = [], [], [], []
    for k in range(4):
        j = p[k] - 49.0 * jnp.floor(p[k] * ns_z * ns_z)
        x_ = jnp.floor(j * ns_z)
        y_ = jnp.floor(j - 7.0 * x_)
        xg = x_ * ns_x + ns_y
        yg = y_ * ns_x + ns_y
        hg = 1.0 - jnp.abs(xg) - jnp.abs(yg)
        # b0/b1 + s0/s1 + sh reshuffle, unrolled per lane:
        sx = jnp.floor(xg) * 2.0 + 1.0
        sy = jnp.floor(yg) * 2.0 + 1.0
        sh = -_step(hg, 0.0)
        a0x = xg + sx * sh
        a0y = yg + sy * sh
        gx4.append(a0x)
        gy4.append(a0y)
        gz4.append(hg)
        h4.append(hg)

    xs = [(x0x, x0y, x0z), (x1x, x1y, x1z), (x2x, x2y, x2z), (x3x, x3y, x3z)]
    total = 0.0
    for k in range(4):
        px, py, pz = gx4[k], gy4[k], gz4[k]
        norm = 1.79284291400159 - 0.85373472095314 * (px * px + py * py + pz * pz)
        px, py, pz = px * norm, py * norm, pz * norm
        cx, cy, cz = xs[k]
        m = jnp.maximum(0.6 - (cx * cx + cy * cy + cz * cz), 0.0)
        m = m * m
        total = total + m * m * (px * cx + py * cy + pz * cz)
    return 42.0 * total


def ring_profile(r):
    """noisy_color_rings_2d.wgsl:116-120: sin(r*sqrt(r)*pi)^2."""
    f = jnp.sin(r * jnp.sqrt(jnp.maximum(r, 0.0)) * math.pi)
    return f * f


def pitch_indicator_center_dot(r, pitch_accuracy, time):
    """ACTIVE option 1 (wgsl:126-141): white center dot above accuracy 0.85,
    pulsing at 3 rad/s."""
    threshold = 0.85
    accuracy_factor = (pitch_accuracy - threshold) / (1.0 - threshold)
    dot_falloff = _smoothstep(0.08, 0.0, r)
    pulse = 0.85 + 0.15 * jnp.sin(time * 3.0)
    lit = jnp.where(pitch_accuracy < threshold, 0.0, accuracy_factor)
    return dot_falloff * lit * pulse


def tuning_indicator(uv_x, uv_y, r, pitch_deviation, time):
    """ACTIVE option 1 (wgsl:231-260): 6-pointed spiral star; sharp spirals
    clockwise, flat counterclockwise."""
    angle = jnp.arctan2(uv_y, uv_x)
    star_angle = angle * 6.0
    spiral_angle = star_angle + r * (pitch_deviation * 4.0) * math.pi * 4.0
    star_intensity = jnp.maximum(0.0, jnp.cos(spiral_angle)) * (
        1.0 - _smoothstep(0.15, 0.25, r)
    )
    accuracy = 1.0 - jnp.abs(pitch_deviation) * 2.0
    pulse = 0.7 + 0.3 * jnp.sin(time * 3.0)
    brightness = (0.3 + (1.0 - 0.3) * accuracy) * pulse  # mix(0.3, 1.0, accuracy)
    out = star_intensity * brightness
    return jnp.where((r > 0.25) | (r < 0.01), 0.0, out)


def ball_fragment(uv_x, uv_y, mat_rgb_linear, mat_a, calmness, time,
                  pitch_accuracy, pitch_deviation):
    """The full fragment (wgsl:395-429) at shader-local uv in [-1,1]^2.
    `mat_rgb_linear` is the material color in LINEAR space (Bevy converts
    the sRGB uniform before upload); returns (rgb_linear, alpha)."""
    mesh_u = (uv_x + 1.0) * 0.5
    mesh_v = (uv_y + 1.0) * 0.5
    r = jnp.sqrt(uv_x * uv_x + uv_y * uv_y)

    f_noise_raw = simplex_noise3(mesh_u * 4.3, mesh_v * 4.3, time * 0.8)
    f_noise = jnp.clip(f_noise_raw - 0.15, 0.0, 1.0)
    f_ring = ring_profile(r)

    mix_t = (f_noise * calmness * f_ring)[..., None]
    ring_rgb = mat_rgb_linear * (1.0 - mix_t) + 1.0 * mix_t
    ring_a = mat_a * f_ring

    acc = pitch_indicator_center_dot(r, pitch_accuracy, time)
    tun = tuning_indicator(uv_x, uv_y, r, pitch_deviation, time)
    final_rgb = ring_rgb + ((acc + tun) * 0.4)[..., None]

    c = jnp.clip(1.0 - calmness * 1.65, 0.0, 1.0)
    ring_strength = c * c * c
    rs_rgb = jnp.asarray(ring_strength)[..., None]  # broadcast vs the rgb axis
    out_rgb = mat_rgb_linear * (1.0 - rs_rgb) + final_rgb * rs_rgb
    out_a = mat_a * (1.0 - ring_strength) + ring_a * ring_strength

    edge = _smoothstep(0.96, 1.0, r)
    return out_rgb, out_a * (1.0 - edge)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Frozen (jit-static) raster parameters. ``ball_patch`` is the square
    pixel tile each ball renders into; balls whose on-screen radius exceeds
    patch/2 are clipped at the tile edge (at the default 360p a ball needs
    scale > ~0.19 to clip — beyond anything the serving chain produces).
    ``max_balls`` bounds how many balls shade per frame: the K frontmost
    visible ones (a live scene shows at most a few dozen — active peaks
    plus fading trails); overflow drops the backmost/smallest."""

    width: int = 640
    height: int = 360
    viewport_height: float = VIEWPORT_HEIGHT
    ball_patch: int = 96
    max_balls: int = 64
    with_bloom: bool = True
    with_net: bool = True
    with_bass: bool = True
    with_pitch_names: bool = True
    clear_color: tuple = CLEAR_COLOR

    @classmethod
    def for_mode(cls, visuals_mode: str = "full", **kw) -> "RenderConfig":
        """Config for a SettingsState.visuals_mode: Galaxy uses the galaxy
        clear color (update.rs:908-916) and hides the bass spiral
        (update_bass_spiral's Galaxy early-out, update.rs:374-376);
        zen/full/performance use the neutral clear color. Pitch names show
        in Full and Performance only (show_hide_pitch_names,
        update.rs:871-885). (Performance additionally shrinks balls 0.7x —
        that lives in viewer.update_balls(ball_scale_factor=0.7), not
        here.)"""
        mode = str(getattr(visuals_mode, "value", visuals_mode)).lower()
        if mode == "galaxy":
            kw.setdefault("clear_color", CLEAR_COLOR_GALAXY)
            kw.setdefault("with_bass", False)
        if mode not in ("full", "performance"):
            kw.setdefault("with_pitch_names", False)
        return cls(**kw)

    @property
    def pixel_size(self) -> float:
        return self.viewport_height / self.height

    # The raster is computed at sublane-aligned (multiple-of-8) dimensions
    # and cropped on output: measured on this chip, a 320x180 render is ~4x
    # slower than 320x184 (the per-ball dynamic-slice composite relayouts
    # on unaligned rows); padding is free by comparison.
    @property
    def padded_width(self) -> int:
        return (self.width + 7) // 8 * 8

    @property
    def padded_height(self) -> int:
        return (self.height + 7) // 8 * 8


def _pixel_grid(cfg: RenderConfig):
    """World coordinates of pixel centers over the PADDED raster; x right,
    y up, origin at the center of the visible (unpadded) image (the
    orthographic camera at the origin). Padding rows/cols extend the grid
    beyond the right/bottom edge and are cropped after rendering."""
    s = cfg.pixel_size
    xs = (np.arange(cfg.padded_width) - (cfg.width - 1) / 2.0) * s
    ys = ((cfg.height - 1) / 2.0 - np.arange(cfg.padded_height)) * s
    return xs.astype(np.float32), ys.astype(np.float32)


def _segment_coverage(xs, ys, p0, p1, half_width, aa):
    """Antialiased coverage of a thick segment over the pixel grid (numpy,
    precompute only)."""
    px = xs[None, :] - p0[0]
    py = ys[:, None] - p0[1]
    dx, dy = p1[0] - p0[0], p1[1] - p0[1]
    seg_len2 = max(dx * dx + dy * dy, 1e-12)
    t = np.clip((px * dx + py * dy) / seg_len2, 0.0, 1.0)
    qx = px - t * dx
    qy = py - t * dy
    d = np.sqrt(qx * qx + qy * qy)
    return np.clip((half_width + 0.5 * aa - d) / aa, 0.0, 1.0)


def _scale_bitmap(cov_u8: np.ndarray, s: float):
    """Downscale a u8 coverage bitmap by factor ``s`` (< 1) with area-ish
    quality: 2x box reductions while the remaining factor is below 0.5,
    then one bilinear resample to the exact target size. Returns
    ``(coverage [0,1], a, b)`` where original pixel coordinate p maps to
    output coordinate ``a*p + b`` (needed to place the glyph center)."""
    cov = cov_u8.astype(np.float32) / 255.0
    a, b = 1.0, 0.0
    while s < 0.5:
        h2, w2 = cov.shape[0] // 2 * 2, cov.shape[1] // 2 * 2
        cov = cov[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3))
        a, b = a / 2.0, (b - 0.5) / 2.0  # box reduce: p' = (p - 0.5) / 2
        s *= 2.0
    h_out = max(int(round(cov.shape[0] * (s))), 1)
    w_out = max(int(round(cov.shape[1] * (s))), 1)
    yi = (np.arange(h_out) + 0.5) / s - 0.5
    xi = (np.arange(w_out) + 0.5) / s - 0.5
    y0 = np.clip(np.floor(yi).astype(np.int64), 0, cov.shape[0] - 1)
    y1 = np.clip(y0 + 1, 0, cov.shape[0] - 1)
    x0 = np.clip(np.floor(xi).astype(np.int64), 0, cov.shape[1] - 1)
    x1 = np.clip(x0 + 1, 0, cov.shape[1] - 1)
    fy = np.clip(yi - y0, 0.0, 1.0)[:, None].astype(np.float32)
    fx = np.clip(xi - x0, 0.0, 1.0)[None, :].astype(np.float32)
    out = (
        cov[y0][:, x0] * (1 - fy) * (1 - fx)
        + cov[y0][:, x1] * (1 - fy) * fx
        + cov[y1][:, x0] * fy * (1 - fx)
        + cov[y1][:, x1] * fy * fx
    )
    # bilinear stage: p'' = (p' + 0.5) * s - 0.5
    return out, a * s, (b + 0.5) * s - 0.5


def _stamp_bitmap(premul, alpha, cov, rgb_linear, row0: float, col0: float):
    """Alpha-composites a coverage bitmap (top-left at float raster coords
    (row0, col0)) into the premultiplied layer arrays in place, with
    bilinear subpixel placement and edge clipping."""
    ri, rf = int(np.floor(row0)), row0 - np.floor(row0)
    ci, cf = int(np.floor(col0)), col0 - np.floor(col0)
    pad = np.pad(cov, ((1, 1), (1, 1)))
    shifted = (
        pad[1:, 1:] * (1 - rf) * (1 - cf)
        + pad[1:, :-1] * (1 - rf) * cf
        + pad[:-1, 1:] * rf * (1 - cf)
        + pad[:-1, :-1] * rf * cf
    )[: cov.shape[0] + 1, : cov.shape[1] + 1]
    h, w = shifted.shape
    hp, wp = alpha.shape[0], alpha.shape[1]
    r0, c0 = max(ri, 0), max(ci, 0)
    r1, c1 = min(ri + h, hp), min(ci + w, wp)
    if r1 <= r0 or c1 <= c0:
        return
    sub = shifted[r0 - ri : r1 - ri, c0 - ci : c1 - ci, None]
    premul[r0:r1, c0:c1] = rgb_linear * sub + premul[r0:r1, c0:c1] * (1.0 - sub)
    alpha[r0:r1, c0:c1] = sub + alpha[r0:r1, c0:c1] * (1.0 - sub)


class SceneStatics:
    """Precomputed per-(config, range) raster data: the linear-space
    background (clear color + spider net), the bass-spiral segment index
    map (nearest cylinder per pixel, -1 where none) + coverage, and the
    static pitch-name overlay layer."""

    def __init__(self, cfg: RenderConfig, rng: VqtRange):
        xs, ys = _pixel_grid(cfg)
        aa = cfg.pixel_size
        clear = np.asarray(srgb_to_linear(np.asarray(cfg.clear_color, np.float32)))
        hp, wp = cfg.padded_height, cfg.padded_width
        background = np.broadcast_to(clear, (hp, wp, 3)).astype(np.float32).copy()

        # visual spiral points: 72 per octave (setup.rs:47-48)
        from .viewer import bin_to_spiral

        n_vis = rng.octaves * 12 * SPIRAL_SEGMENTS_PER_SEMITONE
        vx, vy = bin_to_spiral(
            12 * SPIRAL_SEGMENTS_PER_SEMITONE, np.arange(n_vis, dtype=np.float32)
        )
        vx, vy = np.asarray(vx), np.asarray(vy)

        if cfg.with_net:
            cov = np.zeros((hp, wp), np.float32)
            radius = rng.octaves * 2.2  # setup.rs:184
            for i in range(12):
                a = i / 12.0 * 2.0 * math.pi
                p1 = (radius * math.cos(a), radius * math.sin(a))
                cov = np.maximum(
                    cov,
                    _segment_coverage(xs, ys, (0.0, 0.0), p1, NET_THICKNESS / 2, aa),
                )
            for i in range(n_vis - 1):
                cov = np.maximum(
                    cov,
                    _segment_coverage(
                        xs, ys, (vx[i], vy[i]), (vx[i + 1], vy[i + 1]),
                        NET_THICKNESS / 2, aa,
                    ),
                )
            net = np.asarray(srgb_to_linear(np.asarray(NET_COLOR, np.float32)))
            background = background * (1.0 - cov[..., None]) + net * cov[..., None]

        n_cyl = bass_cylinder_count(rng.octaves)
        bass_idx = np.full((hp, wp), -1, np.int32)
        bass_cov = np.zeros((hp, wp), np.float32)
        if cfg.with_bass:
            for i in range(n_cyl):
                p0 = np.array([vx[i], vy[i]])
                p1 = np.array([vx[i + 1], vy[i + 1]])
                d = p1 - p0
                nrm = d / max(np.hypot(*d), 1e-9)
                # the cylinder rect is (h + 0.01) long: extend half per end
                c = _segment_coverage(
                    xs, ys,
                    tuple(p0 - nrm * BASS_END_EXTENSION),
                    tuple(p1 + nrm * BASS_END_EXTENSION),
                    BASS_WIDTH / 2, aa,
                )
                take = c > bass_cov
                bass_idx[take] = i
                bass_cov[take] = c[take]

        # -- pitch-name ring (setup.rs:386-416): 12 static Text2d entities,
        # DejaVuSans 40px scaled 0.02, centered on the outermost 12 visual-
        # spiral points squashed by (0.85 + 0.025*|x|), colored with the
        # pitch-class palette; z=-0.02 puts them in front of the balls.
        # Baked from the committed glyph atlas into a premultiplied layer.
        self.text_premul = self.text_a = None
        if cfg.with_pitch_names:
            layer = self._pitch_name_layer(cfg, rng, xs, ys)
            if layer is not None:
                self.text_premul = jnp.asarray(layer[0])
                self.text_a = jnp.asarray(layer[1])

        self.background = jnp.asarray(background)
        self.bass_idx = jnp.asarray(bass_idx)
        self.bass_cov = jnp.asarray(bass_cov)
        self.n_cylinders = n_cyl

    @staticmethod
    def _pitch_name_layer(cfg: RenderConfig, rng: VqtRange, xs, ys):
        """Rasterizes the 12 pitch-name glyphs into one premultiplied
        (rgb, alpha) overlay layer, or None if the committed atlas is
        missing."""
        from ..ops.colors import COLORS
        from .glyph_atlas import ATLAS_FONT_PX, REFERENCE_FONT_PX, load_atlas
        from .viewer import bin_to_spiral

        atlas = load_atlas()
        if atlas is None:
            import warnings

            warnings.warn(
                "pitch-name atlas missing; run "
                "`python -m pitchvis_tpu.models.glyph_atlas` to regenerate",
                stacklevel=2,
            )
            return None
        hp, wp = cfg.padded_height, cfg.padded_width
        H, W = cfg.height, cfg.width
        s = cfg.pixel_size
        # raster px per atlas px: Text2d scale 0.02 applied to the 40px
        # font, atlas rendered at ATLAS_FONT_PX
        scale = 0.02 * (REFERENCE_FONT_PX / ATLAS_FONT_PX) / s
        # outermost 12 points of the (octaves, 12) spiral (setup.rs:395-397)
        tx, ty = bin_to_spiral(
            12, np.arange((rng.octaves - 1) * 12, rng.octaves * 12, dtype=np.float32)
        )
        tx, ty = np.asarray(tx), np.asarray(ty)
        premul = np.zeros((hp, wp, 3), np.float32)
        alpha = np.zeros((hp, wp, 1), np.float32)
        for idx in range(12):
            pitch_idx = (idx + 12 - 3) % 12  # setup.rs:398
            x, y = tx[idx], ty[idx]
            squash = 0.85 + 0.025 * abs(x)  # setup.rs:401
            x, y = x * squash, y * squash
            bitmap, center = atlas[pitch_idx]
            cov, a_lin, b_off = _scale_bitmap(bitmap, scale)
            # glyph layout-box center -> raster pixel position
            col_c = x / s + (W - 1) / 2.0
            row_c = (H - 1) / 2.0 - y / s
            col0 = col_c - (a_lin * float(center[0]) + b_off)
            row0 = row_c - (a_lin * float(center[1]) + b_off)
            _stamp_bitmap(premul, alpha, cov,
                          np.asarray(srgb_to_linear(
                              np.asarray(COLORS[pitch_idx], np.float32))),
                          row0, col0)
        return premul, alpha


@lru_cache(maxsize=8)
def make_scene(cfg: RenderConfig, rng: VqtRange) -> SceneStatics:
    return SceneStatics(cfg, rng)


def _resample_matrix(n_out: int, n_in: int, taps, texel_offsets=True) -> np.ndarray:
    """1-D clamp-to-edge bilinear resampling operator M (n_out, n_in):
    ``M @ x`` equals GPU-sampler bilinear sampling of x at every output
    pixel center, summed over ``taps`` = [(offset, weight), ...]. Offsets
    are in SOURCE texels (``texel_offsets=True``, the WGSL
    ``textureSample(..., offset)`` convention) or source-texture UV units.
    Expressing the taps as dense operators turns the whole bloom pyramid
    into pairs of small matmuls (one per axis) — the MXU-native form of the
    GPU's bilinear-sampler passes, bit-faithful per tap."""
    m = np.zeros((n_out, n_in), np.float64)
    for off, w in taps:
        o = off if texel_offsets else off * n_in
        src = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5 + o
        i0 = np.floor(src).astype(np.int64)
        frac = src - i0
        i1 = np.clip(i0 + 1, 0, n_in - 1)
        i0 = np.clip(i0, 0, n_in - 1)
        np.add.at(m, (np.arange(n_out), i0), w * (1.0 - frac))
        np.add.at(m, (np.arange(n_out), i1), w * frac)
    return m.astype(np.float32)


def _bloom_mip_sizes(view_w: int, view_h: int):
    """bevy_core_pipeline bloom texture sizing: internal height capped at
    MAX_MIP_DIMENSION (512), width scaled to keep the viewport aspect,
    BLOOM_MIP_COUNT mips halving from there."""
    w0 = max(int(round(view_w * BLOOM_MAX_MIP_DIMENSION / view_h)), 1)
    return [
        (max(w0 >> i, 1), max(BLOOM_MAX_MIP_DIMENSION >> i, 1))
        for i in range(BLOOM_MIP_COUNT)
    ]


# The 13-tap downsample filter (Jimenez SIGGRAPH 2014, as shipped in Bevy's
# bloom downsampling shader): center/edge/corner weights 0.125/0.0625/
# 0.03125 on the +-2 texel grid plus 0.125 on each +-1 diagonal. Both tap
# groups factor exactly into per-axis 1-D kernels (the +-1 group:
# sqrt(0.125) per axis tap; the +-2 group: 4:2:1 weights scaling to
# 0.03125 at the corners), which is what makes the matmul form exact.
_DOWN_INNER_1D = [(-1.0, math.sqrt(0.125)), (1.0, math.sqrt(0.125))]
_DOWN_OUTER_1D = [
    (-2.0, math.sqrt(0.03125)),
    (0.0, 2.0 * math.sqrt(0.03125)),
    (2.0, math.sqrt(0.03125)),
]


@lru_cache(maxsize=8)
def _bloom_ops(view_w: int, view_h: int):
    """Per-(view size) static operator matrices for the bloom pyramid:
    downsample pairs (inner + outer 13-tap groups) and tent-upsample pairs
    per mip transition. Numpy at trace time; baked into the jit as
    constants."""
    sizes = [(view_w, view_h)] + _bloom_mip_sizes(view_w, view_h)
    down = []
    for (w_in, h_in), (w_out, h_out) in zip(sizes[:-1], sizes[1:]):
        # numpy (NOT jnp): this cache outlives jit traces, and device
        # arrays created inside a trace would leak tracers; einsum embeds
        # numpy operands as constants
        down.append(tuple(
            (
                _resample_matrix(h_out, h_in, taps),
                _resample_matrix(w_out, w_in, taps).T,
            )
            for taps in (_DOWN_INNER_1D, _DOWN_OUTER_1D)
        ))
    # upsampling tent: 0.004 UV radius, x scaled by the viewport aspect
    # ratio (Bevy's uniforms.aspect), weights (0.25, 0.5, 0.25) per axis
    aspect = view_w / view_h
    up = []
    for (w_in, h_in), (w_out, h_out) in zip(sizes[::-1][:-1], sizes[::-1][1:]):
        taps_y = [(-0.004, 0.25), (0.0, 0.5), (0.004, 0.25)]
        taps_x = [(-0.004 / aspect, 0.25), (0.0, 0.5), (0.004 / aspect, 0.25)]
        up.append((
            _resample_matrix(h_out, h_in, taps_y, texel_offsets=False),
            _resample_matrix(w_out, w_in, taps_x, texel_offsets=False).T,
        ))
    return down, up


def _apply_pair(x, pair):
    """(H_in, W_in, 3) -> (H_out, W_out, 3) via the separable operator pair
    (two dense matmuls per channel batch — MXU work, f32)."""
    my, mxT = pair
    h_out, w_out = my.shape[0], mxT.shape[1]
    y = jnp.einsum("oh,hwc->owc", my, x, precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("owc,wp->opc", y, mxT, precision=jax.lax.Precision.HIGHEST)


def _bloom_blend_factor(intensity, mip: float, max_mip: float):
    """Bevy's compute_blend_factor for the reference's settings
    (setup.rs:367-377: low_frequency_boost 1.0, curvature 1.0, high-pass
    0.52, Additive). curvature=1.0 makes the boost exponent infinite:
    (1 - mip/max)^inf is 1.0 at mip 0 and 0.0 beyond (IEEE pow), so
    lf_boost is exactly 0 for mip 0 and 1.0 for every deeper mip — the
    composite weight is `intensity` at the finest mip and
    (intensity + 1) * high_pass(mip) below."""
    frac = mip / max_mip
    # (1 - frac)^(1/(1-curvature)) with curvature=1.0: pow(base, +inf) is
    # 1.0 iff base == 1.0 (i.e. mip 0), else 0.0 (IEEE 754 pow semantics,
    # matching Rust f32::powf)
    powed = 1.0 if frac <= 0.0 else 0.0
    lf_boost = (1.0 - powed) * BLOOM_LF_BOOST  # Additive: no (1-I) scaling
    high_pass = 1.0 - min(max((frac - BLOOM_HIGH_PASS) / BLOOM_HIGH_PASS, 0.0), 1.0)
    return (intensity + lf_boost) * high_pass


def _bloom(img, intensity, view_w: int, view_h: int):
    """Bevy's mip-chain bloom (bevy_core_pipeline/src/bloom, the
    implementation behind the reference's Bloom component,
    setup.rs:367-377), computed as MXU matmul pairs:

    * 13-tap downsample pyramid at the fixed 512-high internal resolution,
      first level clamped to [1e-4, 3.4e38] and soft-thresholded with the
      published knee curve (threshold 0.17, softness 0.82),
    * 3x3 tent upsampling (0.004 UV radius, aspect-corrected),
    * per-mip composite weights from compute_blend_factor (intensity +
      low-frequency boost, high-pass rolloff), applied through one
      accumulating upsample chain so each pyramid level contributes
      exactly its documented weight, Additive composite into the view.

    ``intensity`` is driven per frame as 1.3 * scene_calmness
    (update.rs:336-351). ``img`` is the VISIBLE (unpadded) linear view."""
    down, up = _bloom_ops(view_w, view_h)

    # -- downsample first: 13-tap from the view + clamp + soft threshold ----
    (inner, outer) = down[0]
    m0 = _apply_pair(img, inner) + _apply_pair(img, outer)
    m0 = jnp.clip(m0, 1e-4, 3.40282347e38)
    knee = BLOOM_THRESHOLD * min(max(BLOOM_SOFTNESS, 0.0), 1.0)
    brightness = jnp.max(m0, axis=-1, keepdims=True)
    softness = jnp.clip(brightness - (BLOOM_THRESHOLD - knee), 0.0, 2.0 * knee)
    softness = softness * softness * (0.25 / (knee + 0.00001))
    contribution = jnp.maximum(brightness - BLOOM_THRESHOLD, softness)
    contribution = contribution / jnp.maximum(brightness, 0.00001)
    m0 = m0 * contribution

    mips = [m0]
    for pair2 in down[1:]:
        inner, outer = pair2
        mips.append(_apply_pair(mips[-1], inner) + _apply_pair(mips[-1], outer))

    # -- upsample + composite: one accumulating tent chain ------------------
    max_mip = float(BLOOM_MIP_COUNT - 1)
    v = mips[-1] * _bloom_blend_factor(intensity, max_mip, max_mip)
    for i, pair in enumerate(up[:-1]):
        mip_idx = BLOOM_MIP_COUNT - 2 - i
        v = _apply_pair(v, pair) + mips[mip_idx] * _bloom_blend_factor(
            intensity, float(mip_idx), max_mip
        )
    return img + _apply_pair(v, up[-1])


def _tonemap(img):
    """Bevy's ``Tonemapping::SomewhatBoringDisplayTransform``
    (setup.rs:358) — Tomasz Stachowiak's SBDT exactly as shipped in Bevy's
    tonemapping.wgsl: luminance tonemapped by 1-exp(-v), bright saturated
    colors desaturated toward luma via the BT.709 YCbCr chroma magnitude,
    blended by bt^2, final 0.97 multiplier. Color grading is the identity
    (the reference does not set any)."""
    col = jnp.maximum(img, 0.0)
    r, g, b = col[..., 0], col[..., 1], col[..., 2]
    # rgb_to_ycbcr (BT.709 matrix, column-major in the WGSL)
    y = 0.2126 * r + 0.7152 * g + 0.0722 * b
    cb = -0.1146 * r - 0.3854 * g + 0.5 * b
    cr = 0.5 * r - 0.4542 * g - 0.0458 * b

    def curve(v):
        return 1.0 - jnp.exp(-v)

    bt = curve(jnp.sqrt(cb * cb + cr * cr) * 2.4)
    desat = jnp.maximum((bt - 0.7) * 0.8, 0.0)
    desat = desat * desat
    desat_col = col * (1.0 - desat[..., None]) + y[..., None] * desat[..., None]
    tm_luma = curve(y)
    tm0 = col * jnp.maximum(
        0.0, tm_luma / jnp.maximum(1e-5, y)
    )[..., None]
    tm1 = curve(desat_col)
    w = (bt * bt)[..., None]
    return (tm0 * (1.0 - w) + tm1 * w) * 0.97


class DebugInputs(struct.PyTreeNode):
    """Per-frame data for the Debugging display mode's overlay panels
    (update.rs: spectrum 474-638, scene-calmness graph 640-744, calmness
    histogram 745-869, spectrogram 1007-1087, chroma 1090-1144). All
    unbatched; `render_batch` vmaps over a batched instance."""

    x_vqt_smoothed: jnp.ndarray  # (n,)
    peaks: jnp.ndarray  # (n,) bool
    peak_center: jnp.ndarray  # (n,)
    peak_size: jnp.ndarray  # (n,)
    calmness: jnp.ndarray  # (n,)
    graph_values: jnp.ndarray  # (capacity,) scene calmness oldest->newest
    spectrogram: jnp.ndarray  # (height, n, 4) u8 circular rows
    spectrogram_write_index: jnp.ndarray  # scalar int32
    chroma: jnp.ndarray  # (12,)


def _overlay_polyline(cfg, img, x0, dx, ys_world, seg_rgb_lin, seg_alpha,
                      thickness):
    """Alpha-blend a polyline onto the linear-space raster by column
    sampling: point i sits at (x0 + i*dx, ys_world[i]); segment attributes
    (n-1,) color/alpha. Lines thinner than a pixel draw one antialiased
    pixel row (the reference's 0.01-0.02 world thickness is sub-pixel at
    these raster sizes)."""
    s = cfg.pixel_size
    H, W = cfg.height, cfg.width
    Hp, Wp = cfg.padded_height, cfg.padded_width
    n = ys_world.shape[0]
    colw = (jnp.arange(Wp, dtype=jnp.float32) - (W - 1) / 2.0) * s
    f = (colw - x0) / dx
    valid = (f >= 0.0) & (f <= n - 1.0)
    i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, n - 2)
    t = jnp.clip(f - i0.astype(jnp.float32), 0.0, 1.0)
    y = ys_world[i0] * (1.0 - t) + ys_world[i0 + 1] * t  # (Wp,)
    rgb = seg_rgb_lin[i0]  # (Wp, 3)
    a_col = seg_alpha[i0] * valid.astype(jnp.float32)  # (Wp,)
    roww = ((H - 1) / 2.0 - jnp.arange(Hp, dtype=jnp.float32)) * s
    half_t = jnp.maximum(thickness * 0.5, s * 0.5)
    cov = jnp.clip(
        (half_t + 0.5 * s - jnp.abs(roww[:, None] - y[None, :])) / s, 0.0, 1.0
    )
    a = (cov * a_col[None, :])[..., None]
    return rgb[None, :, :] * a + img * (1.0 - a)


def _spectrum_panel_origin(cfg: RenderConfig, rng: VqtRange):
    """update.rs:495-501: top-right anchored at (max.x - n*0.011 - 0.2,
    max.y - 4.2) of the orthographic view area."""
    max_x = cfg.viewport_height * cfg.width / cfg.height / 2.0
    max_y = cfg.viewport_height / 2.0
    return max_x - rng.n_buckets * 0.011 - 0.2, max_y - 4.2


def _debug_world_panels(cfg: RenderConfig, rng: VqtRange, img, d: DebugInputs):
    """The z=-13 debug meshes: spectrum line + peak circles
    (update.rs:474-638), the mirrored calmness histogram (745-869) and the
    scene-calmness graph (640-744)."""
    from ..ops.colors import COLORS, GRAY_LEVEL, calculate_color
    from .viewer import calmness_to_color, pitch_color_rotation

    n = rng.n_buckets
    bpo = rng.buckets_per_octave
    rot = pitch_color_rotation(bpo)
    x0, y0 = _spectrum_panel_origin(cfg, rng)

    # spectrum: points (i*0.011, v/10); segment i colored at bucket
    # (i+0.5+rot)%bpo with easing_pow 10.0 and alpha
    # 1-(0.5 - v_i/max/2)^0.5 (update.rs:516-580)
    v = d.x_vqt_smoothed
    vmax = jnp.maximum(jnp.max(v), 1e-30)
    segi = jnp.arange(n - 1, dtype=jnp.float32)
    seg_rgb = srgb_to_linear(
        calculate_color(bpo, jnp.mod(segi + 0.5 + rot, bpo), COLORS,
                        GRAY_LEVEL, 10.0)
    )
    seg_alpha = 1.0 - jnp.sqrt(jnp.clip(0.5 - v[:-1] / vmax / 2.0, 0.0, 1.0))
    img = _overlay_polyline(cfg, img, x0, 0.011, y0 + v / 10.0, seg_rgb,
                            seg_alpha, 0.02)

    # peak circles: filled disks r=0.08 at (center*0.011, size/10), colored
    # at bucket (round(center)+0.5+rot)%bpo, alpha 0.9 (update.rs:582-616)
    s = cfg.pixel_size
    H, W = cfg.height, cfg.width
    Hp, Wp = cfg.padded_height, cfg.padded_width
    KP = min(16, n)
    order = jnp.argsort(-d.peaks.astype(jnp.float32))[:KP]
    gate = d.peaks[order].astype(jnp.float32)
    pxw = x0 + d.peak_center[order] * 0.011
    pyw = y0 + d.peak_size[order] / 10.0
    from ..utils.rounding import rust_round

    pbucket = jnp.mod(rust_round(d.peak_center[order]) + 0.5 + rot, bpo)
    prgb = srgb_to_linear(
        calculate_color(bpo, pbucket, COLORS, GRAY_LEVEL, 10.0)
    )  # (KP, 3)
    PR = 0.08
    P2 = min(max(int(2.0 * PR / s) + 3, 4), Hp, Wp)
    ci = jnp.clip(jnp.round(pxw / s + (W - 1) / 2.0).astype(jnp.int32) - P2 // 2,
                  0, max(Wp - P2, 0))
    cj = jnp.clip(jnp.round((H - 1) / 2.0 - pyw / s).astype(jnp.int32) - P2 // 2,
                  0, max(Hp - P2, 0))
    dp = jnp.arange(P2, dtype=jnp.float32)
    wxp = (ci[:, None].astype(jnp.float32) + dp[None, :] - (W - 1) / 2.0) * s
    wyp = ((H - 1) / 2.0 - cj[:, None].astype(jnp.float32) - dp[None, :]) * s
    ddx = (wxp - pxw[:, None])[:, None, :]
    ddy = (wyp - pyw[:, None])[:, :, None]
    rr = jnp.sqrt(ddx * ddx + ddy * ddy)  # (KP, P2, P2)
    cov = jnp.clip((PR + 0.5 * s - rr) / s, 0.0, 1.0)
    pa = cov * 0.9 * gate[:, None, None]

    def disk(im, b):
        b_ci, b_cj, rgb, a = b
        a = a[..., None]
        patch = jax.lax.dynamic_slice(im, (b_cj, b_ci, 0), (P2, P2, 3))
        patch = rgb[None, None, :] * a + patch * (1.0 - a)
        return jax.lax.dynamic_update_slice(im, patch, (b_cj, b_ci, 0)), None

    img, _ = jax.lax.scan(disk, img, (ci, cj, prgb, pa))

    # calmness histogram: the same anchor, y mirrored (scale (1,-1,1)),
    # heights calmness*0.5, midpoint threshold colors (update.rs:773-846)
    mid = (d.calmness[:-1] + d.calmness[1:]) * 0.5
    img = _overlay_polyline(
        cfg, img, x0, 0.011, y0 - d.calmness * 0.5,
        srgb_to_linear(calmness_to_color(mid)), jnp.ones(n - 1), 0.01,
    )

    # scene-calmness graph at (-5, -6.5), scale (3, 1): x = i/cap - 0.5,
    # segment color keyed off the OLDER endpoint (update.rs:663-688)
    cap = d.graph_values.shape[0]
    img = _overlay_polyline(
        cfg, img, -5.0 - 1.5, 3.0 / cap, -6.5 + d.graph_values,
        srgb_to_linear(calmness_to_color(d.graph_values[:-1])),
        jnp.ones(cap - 1), 0.01,
    )
    return img


def _blit_spectrogram(cfg: RenderConfig, rng: VqtRange, img, d: DebugInputs):
    """The spectrogram display quad (setup.rs:493-515: center (-7, 6) at
    z=5, frequency axis vertical spanning 12 world units with low bins at
    the bottom, time horizontal with the newest row at the right edge —
    spectrogram_scroll.wgsl's fract(v + 1 - write_index/height) scroll,
    nearest sampling)."""
    tex = d.spectrogram
    Hs = tex.shape[0]
    n = rng.n_buckets
    vis_h = 12.0
    vis_w = vis_h * Hs / n  # setup.rs:498-499
    s = cfg.pixel_size
    H, W = cfg.height, cfg.width
    Hp, Wp = cfg.padded_height, cfg.padded_width
    colw = (jnp.arange(Wp, dtype=jnp.float32) - (W - 1) / 2.0) * s
    roww = ((H - 1) / 2.0 - jnp.arange(Hp, dtype=jnp.float32)) * s
    u = (colw - (-7.0 - vis_w / 2.0)) / vis_w  # 0 left -> 1 right
    vf = (roww - (6.0 - vis_h / 2.0)) / vis_h  # 0 bottom -> 1 top
    valid = ((u >= 0.0) & (u < 1.0))[None, :] & ((vf >= 0.0) & (vf < 1.0))[:, None]
    bin_idx = jnp.clip(jnp.round(vf * (n - 1)).astype(jnp.int32), 0, n - 1)
    # newest row (write_index-1) at u=1; the cleared next line at u=0
    trow = jnp.mod(
        d.spectrogram_write_index
        - 1
        - jnp.round((1.0 - u) * (Hs - 1)).astype(jnp.int32),
        Hs,
    )
    px = tex[trow[None, :], bin_idx[:, None]].astype(jnp.float32) / 255.0
    a = (px[..., 3] * valid.astype(jnp.float32))[..., None]
    rgb = srgb_to_linear(px[..., :3])  # Rgba8UnormSrgb texture
    return rgb * a + img * (1.0 - a)


def _chroma_boxes(cfg: RenderConfig, srgb_img, chroma):
    """The 12 chroma UI boxes (setup.rs:518-540: 40px squares at
    left=400+45*pc, bottom=10 in the reference's UI pixels — scaled here by
    height/720 — alpha = normalized pitch-class power, update.rs:1133-1144).
    UI draws after tonemapping, so this blends in display sRGB space;
    border radius and the 0.5-alpha border are not rasterized."""
    from ..ops.colors import COLORS

    u = cfg.height / 720.0
    H, W = cfg.height, cfg.width
    rows = jnp.arange(srgb_img.shape[0], dtype=jnp.float32)[:, None]
    cols = jnp.arange(srgb_img.shape[1], dtype=jnp.float32)[None, :]
    for pc in range(12):
        left = (400.0 + 45.0 * pc) * u
        size = 40.0 * u
        top = H - (10.0 + 40.0) * u
        mask = (
            (rows >= top) & (rows < top + size) & (cols >= left)
            & (cols < left + size) & (rows < H) & (cols < W)
        )
        a = jnp.where(mask, chroma[pc], 0.0)[..., None]
        color = jnp.asarray(COLORS[pc], jnp.float32)
        srgb_img = color[None, None, :] * a + srgb_img * (1.0 - a)
    return srgb_img


@partial(jax.jit, static_argnames=("cfg", "rng"))
def _render_frame_impl(
    cfg: RenderConfig,
    rng: VqtRange,
    background, bass_idx, bass_cov,
    text_rgb, text_a,
    balls: BallOutputs,
    bass: BassSpiralOutputs,
    scene_calmness,
    time,
    debug: DebugInputs | None = None,
):
    img = background
    time = jnp.asarray(time, jnp.float32)

    if cfg.with_bass:
        # prefix-lit cylinders: pixel lit iff its segment index < lit count
        n_lit = jnp.sum(bass.visible.astype(jnp.int32))
        lit = (bass_idx >= 0) & (bass_idx < n_lit)
        bass_rgb = srgb_to_linear(bass.rgba[:3])
        a = jnp.where(lit, bass_cov * bass.rgba[3], 0.0)[..., None]
        img = bass_rgb * a + img * (1.0 - a)

    if debug is not None:  # the z=-13 debug meshes draw under the balls
        img = _debug_world_panels(cfg, rng, img, debug)

    # --- pitch balls, back to front (Bevy 2D transparent pass sorts by z) ---
    # Only the max_balls FRONTMOST visible balls render (the scene shows at
    # most a few dozen: live peaks + their fading trails); if more are
    # visible, the backmost (smallest z = drawn first = smallest on screen,
    # update.rs:232-234) drop. The expensive fragment shading runs for all
    # K patches in ONE vectorized pass; only the cheap composite is a scan.
    s = cfg.pixel_size
    H, W = cfg.height, cfg.width  # the VISIBLE image (centering math)
    Hp, Wp = cfg.padded_height, cfg.padded_width  # the compute raster
    P = min(cfg.ball_patch, Hp, Wp)  # a patch cannot exceed the raster
    K = min(cfg.max_balls, balls.position.shape[0])

    z = balls.position[:, 2]
    gate_all = balls.visible & (balls.scale > 1e-5)
    key = jnp.where(gate_all, z, -jnp.inf)
    # K frontmost (largest z) via argsort, NOT lax.top_k: the TopK
    # custom-call is opaque to GSPMD and forces an all-gather under a
    # dp-sharded batch (test_render.py::TestShardedRender); sort partitions
    # trivially along the batch dim
    order = jnp.argsort(-key)[:K][::-1]  # composite back to front

    cx = balls.position[order, 0]
    cy = balls.position[order, 1]
    rgb_lin = srgb_to_linear(balls.rgba[order, :3])
    mat_a = balls.rgba[order, 3]
    scale = balls.scale[order]
    gate = gate_all[order].astype(jnp.float32)
    calm = balls.calmness[order]
    acc = balls.pitch_accuracy[order]
    dev = balls.pitch_deviation[order]

    half = jnp.maximum(BALL_HALF_EXTENT * scale, 1e-6)

    # pixel index of the ball center
    pi = cx / s + (W - 1) / 2.0
    pj = (H - 1) / 2.0 - cy / s
    start_i = jnp.clip(jnp.round(pi).astype(jnp.int32) - P // 2, 0, max(Wp - P, 0))
    start_j = jnp.clip(jnp.round(pj).astype(jnp.int32) - P // 2, 0, max(Hp - P, 0))
    # (measured: 8-aligning these offsets gains <1% with the exact bloom
    # in the pipeline — the pyramid matmuls, not the composite, now bound
    # the frame)

    di = jnp.arange(P, dtype=jnp.float32)
    # world coords of every patch pixel: (K, P)
    wx = (start_i[:, None].astype(jnp.float32) + di[None, :] - (W - 1) / 2.0) * s
    wy = ((H - 1) / 2.0 - start_j[:, None].astype(jnp.float32) - di[None, :]) * s
    uv_x = (wx - cx[:, None])[:, None, :] / half[:, None, None]  # (K, 1, P)
    uv_y = -(wy - cy[:, None])[:, :, None] / half[:, None, None]  # (K, P, 1)

    patch_rgb, patch_a = ball_fragment(
        uv_x, uv_y,
        rgb_lin[:, None, None, :], mat_a[:, None, None],
        calm[:, None, None], time,
        acc[:, None, None], dev[:, None, None],
    )  # (K, P, P, 3), (K, P, P)
    patch_a = patch_a * gate[:, None, None]

    def body(im, b):
        b_si, b_sj, rgb, a = b
        a = a[..., None]
        patch = jax.lax.dynamic_slice(im, (b_sj, b_si, 0), (P, P, 3))
        patch = rgb * a + patch * (1.0 - a)
        return jax.lax.dynamic_update_slice(im, patch, (b_sj, b_si, 0)), None

    img, _ = jax.lax.scan(body, img, (start_i, start_j, patch_rgb, patch_a))

    if text_rgb is not None:  # pitch-name ring at z=-0.02, over the balls
        # the layer is premultiplied (glyphs over-composited at bake time)
        img = text_rgb + img * (1.0 - text_a)

    if debug is not None:  # the spectrogram quad sits at z=5, above the balls
        img = _blit_spectrogram(cfg, rng, img, debug)

    # bloom + tonemap run on the VISIBLE view (the padded rows/cols exist
    # only for the ball composite's sublane alignment; Bevy's bloom sizes
    # its pyramid from the camera viewport)
    img = img[: cfg.height, : cfg.width]
    if cfg.with_bloom:
        img = _bloom(img, bloom_intensity(scene_calmness), cfg.width, cfg.height)
    img = _tonemap(img)
    srgb = linear_to_srgb(jnp.clip(img, 0.0, None))
    if debug is not None:  # chroma boxes are UI: post-tonemap, sRGB space
        srgb = _chroma_boxes(cfg, srgb, debug.chroma)
    return jnp.clip(jnp.round(srgb * 255.0), 0.0, 255.0).astype(jnp.uint8)


def render_frame(
    cfg: RenderConfig,
    rng: VqtRange,
    balls: BallOutputs,
    bass: BassSpiralOutputs | None,
    scene_calmness,
    time,
    statics: SceneStatics | None = None,
    debug: DebugInputs | None = None,
) -> jnp.ndarray:
    """Rasterize one frame -> (height, width, 3) uint8 sRGB. Passing
    ``debug`` adds the Debugging display mode's overlay panels."""
    st = statics if statics is not None else make_scene(cfg, rng)
    if bass is None:
        n = st.n_cylinders
        bass = BassSpiralOutputs(
            visible=jnp.zeros(n, bool), rgba=jnp.zeros(4, jnp.float32)
        )
    return _render_frame_impl(
        cfg, rng, st.background, st.bass_idx, st.bass_cov,
        st.text_premul, st.text_a,
        balls, bass, scene_calmness, time, debug,
    )


def render_streams(
    cfg: RenderConfig,
    rng: VqtRange,
    viewer,
    scene_calmness,
    time,
    streams=(0,),
    statics: SceneStatics | None = None,
) -> jnp.ndarray:
    """Rasterize selected stream rows of a batched serving output ->
    (len(streams), height, width, 3) uint8. ``viewer`` is the fused
    ``ViewerOutputs`` a StreamServer/StreamingPipeline step emits under
    ``with_viewer=True`` (models/pipeline.py); ``scene_calmness`` the
    matching (B,) analysis output. This is the display-rate consumer path:
    a serving deployment renders the handful of streams somebody is
    actually watching, not the whole batch."""
    idx = jnp.asarray(streams)
    balls = jax.tree.map(lambda a: a[idx], viewer.balls)
    bass = jax.tree.map(lambda a: a[idx], viewer.bass)
    sc = jnp.asarray(scene_calmness)[idx]
    return render_batch(cfg, rng, balls, bass, sc, time, statics=statics)


def render_batch(
    cfg: RenderConfig,
    rng: VqtRange,
    balls: BallOutputs,
    bass: BassSpiralOutputs,
    scene_calmness,
    time,
    statics: SceneStatics | None = None,
    debug: DebugInputs | None = None,
) -> jnp.ndarray:
    """Batched rasterize -> (B, height, width, 3) uint8; ``balls``/``bass``
    (and ``debug`` if given) carry a leading stream axis (the shapes the
    fused pipeline emits), ``time`` is shared."""
    st = statics if statics is not None else make_scene(cfg, rng)
    if debug is None:
        fn = jax.vmap(
            lambda ba, bs, sc: _render_frame_impl(
                cfg, rng, st.background, st.bass_idx, st.bass_cov,
                st.text_premul, st.text_a,
                ba, bs, sc, time,
            )
        )
        return fn(balls, bass, jnp.asarray(scene_calmness))
    fn = jax.vmap(
        lambda ba, bs, sc, dbg: _render_frame_impl(
            cfg, rng, st.background, st.bass_idx, st.bass_cov,
            st.text_premul, st.text_a,
            ba, bs, sc, time, dbg,
        )
    )
    return fn(balls, bass, jnp.asarray(scene_calmness), debug)
