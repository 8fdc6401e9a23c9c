"""Persistent XLA compilation cache across processes.

JAX's executable cache is per-process by default, so every new server /
demo / bench process pays the full jit compile of the serving step again —
up to ~250 s for the fully fused default-parameter pipeline on this class
of host (docs/PERFORMANCE.md). Enabling the persistent cache serializes
compiled executables to disk; verified to work through the axon
remote-compile tunnel (a fresh process's first serving step dropped from
2.2 s to 0.8 s at a reduced config; the fused default config amortizes its
multi-minute compile the same way).

The kernel builder's own cache (.cache/vqt_kernel_*.npz) covers the host
side; this covers the device executables. Both live under the same cache
root (PITCHVIS_TPU_CACHE env var, default `.cache/`), and both are safe to
delete.
"""

from __future__ import annotations

import os


def enable_compilation_cache(
    path: str | None = None, min_compile_secs: float = 1.0
) -> str:
    """Turns on JAX's persistent compilation cache for this process.

    Call before (or after — config updates apply to future compiles) the
    first jit compile. Every CLI entry point (demo, bench, xtask,
    multihost_serve) calls this; library users embedding the package call
    it themselves if they want cross-process warm starts.

    ``path``: cache directory (default: `<cache root>/xla`).
    ``min_compile_secs``: only executables that took at least this long to
    compile are persisted (keeps the cache free of trivial kernels).
    Returns the cache directory used."""
    import jax

    if path is None:
        from ..kernel.builder import _cache_dir

        path = os.path.join(_cache_dir(), "xla")
    os.makedirs(path, exist_ok=True)
    if path != jax.config.jax_compilation_cache_dir:
        # JAX pins the cache object at its first get/put; a later config
        # re-point is silently ignored (writes keep landing in the OLD dir)
        # unless the cache is explicitly reset
        try:
            from jax._src.compilation_cache import reset_cache

            reset_cache()
        except (ImportError, AttributeError):  # private API; best effort
            pass
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return path
