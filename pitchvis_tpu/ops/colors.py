"""Pitch-class color mapping.

Vectorized JAX port of `pitchvis_colors` (pitchvis_colors/src/lib.rs): the
12-tone palette, and `calculate_color` (lib.rs:93-117) which maps a
fractional pitch bucket to RGB by converting the nearest pitch-class base
color to LCh, scaling chroma by a saturation easing of the distance to the
pitch-class center, and blending lightness toward a gray level.

The reference converts through the Rust `lab` crate with u8-quantized
round-trips (lib.rs:102,115): base colors are truncated to u8 before
RGB->LCh, and the final LCh->RGB result is rounded and clamped to u8. Both
quantizations are replicated here for bit-comparability.

Color math: sRGB (D65) <-> CIE Lab with the standard epsilon/kappa constants,
matching the `lab` crate's formulas.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.rounding import rust_round

# pitchvis_colors/src/lib.rs:19-34
COLORS = np.array(
    [
        [0.85, 0.36, 0.36],  # C
        [0.01, 0.52, 0.71],  # C#
        [0.97, 0.76, 0.05],  # D
        [0.45, 0.34, 0.63],  # Eb
        [0.47, 0.77, 0.22],  # E
        [0.78, 0.32, 0.52],  # F
        [0.00, 0.64, 0.56],  # F#
        [0.95, 0.54, 0.23],  # G
        [0.30, 0.37, 0.64],  # Ab
        [1.00, 0.96, 0.03],  # A
        [0.57, 0.30, 0.55],  # Bb
        [0.12, 0.71, 0.34],  # B
    ],
    dtype=np.float32,
)

# pitchvis_serial/src/main.rs:44-57
SERIAL_COLORS = np.array(
    [
        [0.95, 0.10, 0.10],
        [0.01, 0.52, 0.71],
        [0.97, 0.79, 0.00],
        [0.45, 0.34, 0.63],
        [0.47, 0.99, 0.02],
        [0.88, 0.02, 0.52],
        [0.00, 0.80, 0.55],
        [0.99, 0.54, 0.03],
        [0.25, 0.30, 0.64],
        [0.95, 0.99, 0.00],
        [0.52, 0.00, 0.60],
        [0.05, 0.80, 0.15],
    ],
    dtype=np.float32,
)

PITCH_NAMES = ["C", "C♯", "D", "E♭", "E", "F", "F♯", "G", "A♭", "A", "B♭", "B"]

GRAY_LEVEL = 60.0  # lib.rs:54
EASING_POW = 1.3  # lib.rs:55

# D65 white point and sRGB matrices (lab crate constants)
_WHITE = np.array([0.95047, 1.0, 1.08883])
_RGB2XYZ = np.array(
    [
        [0.4124564, 0.3575761, 0.1804375],
        [0.2126729, 0.7151522, 0.0721750],
        [0.0193339, 0.1191920, 0.9503041],
    ]
)
_XYZ2RGB = np.linalg.inv(_RGB2XYZ)
_EPS = 216.0 / 24389.0
_KAPPA = 24389.0 / 27.0


def _mat3(v: jnp.ndarray, m: np.ndarray) -> jnp.ndarray:
    """Explicit 3x3 color-matrix transform: elementwise mul-adds stay in
    true f32 on TPU (a jnp.dot would ride the MXU at bf16 by default)."""
    cols = [
        v[..., 0] * float(m[i][0]) + v[..., 1] * float(m[i][1]) + v[..., 2] * float(m[i][2])
        for i in range(3)
    ]
    return jnp.stack(cols, axis=-1)


def srgb_u8_to_lab(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) u8-valued sRGB -> CIE Lab (D65)."""
    c = rgb_u8.astype(jnp.float32) / 255.0
    lin = jnp.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)
    xyz = _mat3(lin, _RGB2XYZ)
    t = xyz / jnp.asarray(_WHITE, jnp.float32)
    f = jnp.where(t > _EPS, jnp.cbrt(t), (_KAPPA * t + 16.0) / 116.0)
    l = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return jnp.stack([l, a, b], axis=-1)


def lab_to_srgb_u8(lab: jnp.ndarray) -> jnp.ndarray:
    """CIE Lab -> sRGB with the lab crate's round+clamp u8 quantization."""
    l, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (l + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def finv(f):
        f3 = f**3
        return jnp.where(f3 > _EPS, f3, (116.0 * f - 16.0) / _KAPPA)

    # lab crate: y uses the L > kappa*eps branch
    y = jnp.where(l > _KAPPA * _EPS, ((l + 16.0) / 116.0) ** 3, l / _KAPPA)
    xyz = jnp.stack([finv(fx), y, finv(fz)], axis=-1) * jnp.asarray(_WHITE, jnp.float32)
    lin = _mat3(xyz, _XYZ2RGB)
    c = jnp.where(lin > 0.0031308, 1.055 * lin ** (1.0 / 2.4) - 0.055, 12.92 * lin)
    # floor(x + 0.5): Rust f32::round (half AWAY from zero, the lab crate's
    # quantization) — jnp.round is half-to-even and differs at exact .5
    return jnp.clip(jnp.floor(c * 255.0 + 0.5), 0.0, 255.0)


def lab_to_lch(lab: jnp.ndarray) -> jnp.ndarray:
    l, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    c = jnp.sqrt(a * a + b * b)
    h = jnp.arctan2(b, a)
    return jnp.stack([l, c, h], axis=-1)


def lch_to_lab(lch: jnp.ndarray) -> jnp.ndarray:
    l, c, h = lch[..., 0], lch[..., 1], lch[..., 2]
    return jnp.stack([l, c * jnp.cos(h), c * jnp.sin(h)], axis=-1)


def calculate_color(
    buckets_per_octave: int,
    bucket: jnp.ndarray,
    colors: np.ndarray = COLORS,
    gray_level: float = GRAY_LEVEL,
    easing_pow: float = EASING_POW,
) -> jnp.ndarray:
    """Vectorized `calculate_color` (pitchvis_colors/src/lib.rs:93-117).

    bucket: (...,) fractional pitch buckets. Returns (..., 3) RGB in [0, 1].
    """
    pitch_continuous = 12.0 * bucket / buckets_per_octave
    # f32::round (half-away-from-zero, lib.rs:102-103): at bpo=24 every odd
    # bin is an exact half-semitone, where half-to-even picks the WRONG
    # pitch class (and saturation) vs the reference
    nearest = rust_round(pitch_continuous)
    cls = (nearest.astype(jnp.int32)) % 12

    # The palette has 12 entries: convert the WHOLE table to LCh once
    # (constant-folded at compile time) and pick per element with a one-hot
    # masked reduction — a data-dependent per-element gather in the fused
    # per-hop serving step serializes on TPU (CLAUDE.md performance rule),
    # and the forward sRGB->Lab chain only has 12 distinct inputs anyway.
    # Bit-identical to gathering the base color and converting per element
    # (same traced ops, same f32 inputs).
    base_u8 = jnp.floor(jnp.asarray(colors, jnp.float32) * 255.0)  # lib.rs:102
    lch_table = lab_to_lch(srgb_u8_to_lab(base_u8))  # (12, 3)
    one_hot = (cls[..., None] == jnp.arange(12)).astype(jnp.float32)
    # masked broadcast-sum, NOT jnp.dot/einsum: a matmul would ride the MXU
    # at bf16 default precision (CLAUDE.md 3x3-transform rule); exactly one
    # mask element is 1.0, so the f32 VPU sum is an exact select
    lch = jnp.sum(one_hot[..., None] * lch_table, axis=-2)

    inaccuracy = jnp.abs(pitch_continuous - nearest)
    saturation = 1.0 - (2.0 * inaccuracy) ** easing_pow

    l = saturation * lch[..., 0] + (1.0 - saturation) * gray_level
    c = lch[..., 1] * saturation
    out_u8 = lab_to_srgb_u8(lch_to_lab(jnp.stack([l, c, lch[..., 2]], axis=-1)))
    return out_u8 / 255.0
