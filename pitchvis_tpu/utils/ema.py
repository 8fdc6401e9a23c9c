"""Frame-rate-independent exponential moving average.

Mirrors `EmaMeasurement` (pitchvis_analysis/src/util.rs:90-137): the decay is
``alpha = 1 - exp(-2 * dt / horizon)``, the exact continuous-time form, so
updating n times with dt/n equals one update with dt (toward a constant
target). A horizon of 0 (the reference's ``None``) means passthrough.

These are pure functions over arrays — the EMA state lives in the analysis
state pytree and is updated inside the jitted step."""

from __future__ import annotations

import jax.numpy as jnp


def ema_alpha(dt, horizon):
    """alpha = 1 - exp(-2 dt / horizon); passthrough (alpha=1) when horizon<=0.

    `dt` is a scalar; `horizon` may be a scalar or per-bin array (seconds).
    """
    horizon = jnp.asarray(horizon, dtype=jnp.float32)
    safe = jnp.where(horizon > 0.0, horizon, 1.0)
    alpha = 1.0 - jnp.exp(-2.0 * dt / safe)
    return jnp.where(horizon > 0.0, alpha, 1.0)


def ema_update(y, x, dt, horizon):
    """One EMA step toward x over timestep dt (util.rs:106-125)."""
    return y + ema_alpha(dt, horizon) * (x - y)


def ema_update_with_alpha(y, x, alpha):
    return y + alpha * (x - y)
