"""Persistent XLA compilation cache.

Remote TPU compiles cost 1-12 minutes per new HLO shape (ARCHITECTURE.md);
the reference has no analogue (GHC compiles once at build time).  Enabling
``jax_compilation_cache_dir`` persists compiled executables keyed on the
HLO, so every process after the first (bench retries, CLI re-runs,
checkpoint resumes after a worker crash) skips the compile entirely.

Call :func:`enable_compilation_cache` before the first jit execution; it is
idempotent and safe on backends that don't support the cache (the config
simply has no effect there).
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "tpu_ray", "xla"
)


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Honors ``TPU_RAY_CACHE_DIR`` (set it to ``0``/``off`` to disable).
    Returns the directory used ('' when disabled).
    """
    env = os.environ.get("TPU_RAY_CACHE_DIR")
    if env is not None and env.lower() in ("0", "off", "none", ""):
        return ""
    cache_dir = cache_dir or env or _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache EVERYTHING: through the remote-worker tunnel even an eager
    # convert_element_type costs ~0.4 s to compile, and a render's ~40
    # scene-build/driver mini-ops add ~16 s of pure compile to every cold
    # process (measured, tools/r3/measure_warm_anatomy.py) - trade a little
    # disk for never re-paying any remote compile
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
