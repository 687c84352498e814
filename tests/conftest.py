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
