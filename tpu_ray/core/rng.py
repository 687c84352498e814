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
    "unit_vector_from",
    "cosine_direction_from",
    "to_sphere_from",
    "hash_uniforms",
    "hash_uniforms2",
    "lane_uniforms",
    "path_ids",
]

TWO_PI = 2.0 * jnp.pi


def _murmur3_fmix(x: jnp.ndarray) -> jnp.ndarray:
    """murmur3 finalizer: full-avalanche 32-bit mix."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def hash_uniforms(seed: jnp.ndarray, n: int) -> jnp.ndarray:
    """n decorrelated U[0,1) floats per uint32 seed: (R,) -> (R, n).

    A cheap counter-hash (murmur3 finalizer) for per-lane camera-sample
    streams inside the bounce loop, where a full per-lane threefry fold_in
    chain is overkill; path-space randomness stays on threefry.
    """
    cols = []
    for i in range(n):
        salt = jnp.uint32(0x9E3779B9) * jnp.uint32(i + 1)
        bits = _murmur3_fmix(_murmur3_fmix(seed.astype(jnp.uint32) + salt) ^ salt)
        cols.append(bits)
    bits = jnp.stack(cols, axis=-1)
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def hash_uniforms2(a: jnp.ndarray, b: jnp.ndarray, n: int) -> jnp.ndarray:
    """n U[0,1) floats keyed by a 2-word counter: ((R,), (R,)) -> (R, n).

    Avoids the 32-bit wrap/collision structure of packing (slot, sample)
    into one linear word: ``a`` is fully avalanched before ``b`` (scaled by
    an odd constant) is xored in, so distinct (a, b) pairs collide only at
    the random 2^-32 rate, never systematically.
    """
    seed = _murmur3_fmix(a.astype(jnp.uint32) + jnp.uint32(0x9E3779B9)) ^ (
        b.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
    )
    return hash_uniforms(seed, n)


def lane_uniforms(key, lane_ids: jnp.ndarray, n: int) -> jnp.ndarray:
    """n U[0,1) floats per lane, keyed by *lane id*: (R,) -> (R, n).

    Unlike ``jax.random.uniform(key, (R, n))`` - whose values depend on a
    lane's position in the array - each row here is a pure function of
    (key, lane_ids[i]).  Rendering the same pixel slot therefore draws the
    same path-space randomness no matter how the pool is banded, compacted,
    padded or sharded; tests/test_render.py relies on this for exact
    banded == unbanded == meshed equality.

    The per-draw generator is the murmur3 counter hash (3 full-avalanche
    fmix rounds per output), not threefry (~100+ ALU ops per 2 outputs):
    this runs once per lane per bounce in the integrator's hot loop, and
    the distribution/chi-square tests in tests/test_core.py and the
    estimator tests in tests/test_shading.py hold it to the same quality
    bar.  The two threefry key words seed the stream, so draws stay
    decorrelated across (wave, bounce, purpose) keys.
    """
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    base = _murmur3_fmix(lane_ids.astype(jnp.uint32) + kd[0]) ^ kd[1]
    return hash_uniforms(base, n)


def lane_uniform_col(key, lane_ids: jnp.ndarray, i: int) -> jnp.ndarray:
    """Column ``i`` of :func:`lane_uniforms`' stream without materializing
    the earlier columns: one U[0,1) f32 per lane.

    Used for draws consumed OUTSIDE ops/scatter.py (e.g. the integrators'
    Russian-roulette survival test on column 14) that must come from the
    same per-(key, lane id) stream as the scatter draws so the Pallas
    kernels (megakernel._hash_col on the same base) reproduce them.
    """
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    base = _murmur3_fmix(lane_ids.astype(jnp.uint32) + kd[0]) ^ kd[1]
    salt = jnp.uint32(0x9E3779B9) * jnp.uint32(i + 1)
    bits = _murmur3_fmix(_murmur3_fmix(base + salt) ^ salt)
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 24))


def path_ids(work: jnp.ndarray, bounce: jnp.ndarray) -> jnp.ndarray:
    """Synthetic per-lane draw ids for the work-queue integrator: a
    schedule-independent mix of (work item, bounce).

    Passed as ``lane_ids`` to :func:`lane_uniforms` (and as ``slot_ids`` to
    the fused shading kernel) with a key that is CONSTANT across pool
    iterations, this keys every path-space draw by (render key, purpose,
    work item, bounce) - the draws no longer depend on which pool
    iteration, epoch, or lane position the path happens to occupy.  The
    work item is globally unique per camera sample and the bounce is
    unique along a path, so streams never collide systematically; ``work``
    is avalanched before ``bounce`` is folded in (same construction as
    :func:`hash_uniforms2`).
    """
    return _murmur3_fmix(
        work.astype(jnp.uint32) + jnp.uint32(0x9E3779B9)
    ) ^ (bounce.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))


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


def unit_vector_from(u: jnp.ndarray) -> jnp.ndarray:
    """Uniform direction on the unit sphere from 2 uniforms (..., 2)
    (reference: src/Lib.hs:1187-1197): z = 2u-1, a = 2*pi*u'."""
    a = TWO_PI * u[..., 0]
    z = 2.0 * u[..., 1] - 1.0
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([r * jnp.cos(a), r * jnp.sin(a), z], axis=-1)


def unit_vector(key, shape=()) -> jnp.ndarray:
    return unit_vector_from(jax.random.uniform(key, shape + (2,), jnp.float32))


def cosine_direction_from(u: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted direction about +z from 2 uniforms
    (reference: src/Lib.hs:1206-1217)."""
    r1, r2 = u[..., 0], u[..., 1]
    z = jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))
    phi = TWO_PI * r1
    sq_r2 = jnp.sqrt(r2)
    return jnp.stack([jnp.cos(phi) * sq_r2, jnp.sin(phi) * sq_r2, z], axis=-1)


def cosine_direction(key, shape=()) -> jnp.ndarray:
    return cosine_direction_from(jax.random.uniform(key, shape + (2,), jnp.float32))


def to_sphere_from(u: jnp.ndarray, radius, dist_squared) -> jnp.ndarray:
    """Direction in the cone subtended by a sphere, from 2 uniforms
    (reference: src/Lib.hs:1219-1228).  Local frame: +z points at the
    sphere center; ``radius``/``dist_squared`` broadcast."""
    r1, r2 = u[..., 0], u[..., 1]
    cos_theta_max = jnp.sqrt(jnp.maximum(1.0 - radius * radius / dist_squared, 0.0))
    z = 1.0 + r2 * (cos_theta_max - 1.0)
    phi = TWO_PI * r1
    sq = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([jnp.cos(phi) * sq, jnp.sin(phi) * sq, z], axis=-1)


def to_sphere(key, radius, dist_squared, shape=()) -> jnp.ndarray:
    return to_sphere_from(
        jax.random.uniform(key, shape + (2,), jnp.float32), radius, dist_squared
    )
