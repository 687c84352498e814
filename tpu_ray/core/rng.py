"""Counter-based RNG + Monte-Carlo direction samplers.

The reference threads a splitmix ``StdGen`` through every computation via an
``STRef`` (reference: src/Random.hs:1-29, src/Lib.hs:86-188, 1119-1228).  On
TPU there is no sequential state: we use JAX's counter-based threefry keys,
derived per (wave, bounce, purpose) with ``fold_in`` so every draw is
reproducible and order-independent.

The rejection samplers of the reference (``randomInUnitSphere``,
``randomInUnitDisk``, src/Lib.hs:1160-1185) are replaced by exact analytic
(inverse-CDF) samplers with identical output distributions - data-dependent
loops do not vectorize on the VPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "uniform",
    "in_unit_disk",
    "unit_vector",
    "cosine_direction",
    "to_sphere",
]

TWO_PI = 2.0 * jnp.pi


def uniform(key, shape=(), lo=0.0, hi=1.0) -> jnp.ndarray:
    """U[lo, hi) float32 (reference ``randomDouble``/``randomDoubleR``)."""
    return jax.random.uniform(key, shape, jnp.float32, lo, hi)


def in_unit_disk(key, shape=()) -> jnp.ndarray:
    """Uniform point in the unit disk, z = 0 (reference: src/Lib.hs:1178-1185).

    Analytic: r = sqrt(u1), theta = 2*pi*u2 - same distribution as the
    reference's rejection loop.
    """
    u = jax.random.uniform(key, shape + (2,), jnp.float32)
    r = jnp.sqrt(u[..., 0])
    theta = TWO_PI * u[..., 1]
    return jnp.stack(
        [r * jnp.cos(theta), r * jnp.sin(theta), jnp.zeros_like(r)], axis=-1
    )


def unit_vector(key, shape=()) -> jnp.ndarray:
    """Uniform direction on the unit sphere (reference: src/Lib.hs:1187-1197).

    Same analytic construction as the reference: z = 2u-1, a = 2*pi*u'.
    """
    u = jax.random.uniform(key, shape + (2,), jnp.float32)
    a = TWO_PI * u[..., 0]
    z = 2.0 * u[..., 1] - 1.0
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([r * jnp.cos(a), r * jnp.sin(a), z], axis=-1)


def cosine_direction(key, shape=()) -> jnp.ndarray:
    """Cosine-weighted direction about +z (reference: src/Lib.hs:1206-1217)."""
    u = jax.random.uniform(key, shape + (2,), jnp.float32)
    r1, r2 = u[..., 0], u[..., 1]
    z = jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))
    phi = TWO_PI * r1
    sq_r2 = jnp.sqrt(r2)
    return jnp.stack([jnp.cos(phi) * sq_r2, jnp.sin(phi) * sq_r2, z], axis=-1)


def to_sphere(key, radius, dist_squared, shape=()) -> jnp.ndarray:
    """Direction in the cone subtended by a sphere (reference: src/Lib.hs:1219-1228).

    Local frame: +z points at the sphere center.  ``radius``/``dist_squared``
    broadcast against ``shape``.
    """
    u = jax.random.uniform(key, shape + (2,), jnp.float32)
    r1, r2 = u[..., 0], u[..., 1]
    cos_theta_max = jnp.sqrt(jnp.maximum(1.0 - radius * radius / dist_squared, 0.0))
    z = 1.0 + r2 * (cos_theta_max - 1.0)
    phi = TWO_PI * r1
    sq = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([jnp.cos(phi) * sq, jnp.sin(phi) * sq, z], axis=-1)
