"""Test harness: force the CPU backend with 8 virtual devices.

Multi-chip sharding (tpu_ray.parallel) is validated on a virtual CPU mesh,
per the standard JAX testing recipe; the axon TPU plugin ignores the
JAX_PLATFORMS env var, so the platform is pinned via jax.config instead.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# Cap in-process compiler state: a full-suite run compiles hundreds of
# XLA:CPU programs in one process, and jaxlib's CPU backend segfaulted
# twice (r5) inside backend_compile_and_load near the END of the suite -
# same spot, only when everything compiles fresh (previously a poisoned
# persistent cache absorbed some compiles; see utils/cache.py on why
# that cache is now off for CPU).  Dropping compiled executables between
# test modules keeps the live-program count bounded; modules recompile
# their own programs anyway (shapes rarely repeat across files).
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
