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
    _sync_prebuilt(cache_dir)
    return cache_dir


def _sync_prebuilt(cache_dir: str, prebuilt_dir: str | None = None) -> int:
    """Unpack repo-shipped prebuilt executables into the cache.

    The reference compiles once at build time (GHC, stack.yaml:52-55); our
    equivalent of its build artifact is ``prebuilt/xla/``: the persistent-
    cache entries (gzipped) for the benchmark suite's executables, packaged
    by tools/r3/make_prebuilt.py.  A fresh environment that would otherwise
    pay 150-600 s of remote TPU compilation per program starts warm
    instead.  Entries are keyed by the HLO + compile options + jax version,
    so a mismatched environment simply never hits them (dead weight, not
    wrong results).  Set ``TPU_RAY_PREBUILT=0`` to skip.
    """
    env = os.environ.get("TPU_RAY_PREBUILT", "")
    if env.lower() in ("0", "off", "none"):
        return 0
    pre = prebuilt_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "prebuilt", "xla")
    if not os.path.isdir(pre):
        return 0
    import gzip
    import shutil

    n = 0
    for name in os.listdir(pre):
        if not name.endswith(".gz"):
            continue
        dst = os.path.join(cache_dir, name[:-3])
        if os.path.exists(dst):
            continue
        tmp = dst + ".tmp"
        try:
            with gzip.open(os.path.join(pre, name), "rb") as f_in, \
                    open(tmp, "wb") as f_out:
                shutil.copyfileobj(f_in, f_out)
            os.replace(tmp, dst)  # atomic: concurrent processes race safely
            n += 1
        except OSError:
            try:
                os.remove(tmp)
            except OSError:
                pass
    return n
