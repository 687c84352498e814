"""Batched 3-vector math on ``(..., 3)`` arrays.

TPU-native counterpart of the reference's ``Vec3`` layer
(reference: src/Lib.hs:200-318).  Instead of a boxed strict record per
vector, every quantity is a trailing-axis-3 array so the whole wavefront of
rays is one SIMD value; XLA fuses these elementwise ops into the consuming
kernels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "dot",
    "cross",
    "length",
    "squared_length",
    "normalize",
    "where3",
    "reflect",
    "refract",
    "onb_from_w",
    "onb_local",
]


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Inner product over the trailing axis (reference: src/Lib.hs:256-257)."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cross product over the trailing axis (reference: src/Lib.hs:259-261)."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def squared_length(a: jnp.ndarray) -> jnp.ndarray:
    return dot(a, a)


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(squared_length(a))


def normalize(a: jnp.ndarray) -> jnp.ndarray:
    """Unit vector (reference ``makeUnitVector``, src/Lib.hs:247-248).

    Zero vectors map to zero instead of NaN so masked-out lanes stay finite.
    """
    n2 = squared_length(a)
    inv = jnp.where(n2 > 0.0, 1.0 / jnp.sqrt(jnp.maximum(n2, 1e-30)), 0.0)
    return a * inv[..., None]


def where3(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``jnp.where`` with a rank-(n-1) mask broadcast over the vector axis."""
    return jnp.where(mask[..., None], a, b)


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection (reference: src/Lib.hs:887-888)."""
    return v - 2.0 * dot(v, n)[..., None] * n


def refract(uv: jnp.ndarray, n: jnp.ndarray, etai_over_etat: jnp.ndarray) -> jnp.ndarray:
    """Snell refraction of a *unit* direction (reference: src/Lib.hs:890-896)."""
    cos_theta = dot(-uv, n)
    r_out_parallel = etai_over_etat[..., None] * (uv + cos_theta[..., None] * n)
    k = jnp.maximum(1.0 - squared_length(r_out_parallel), 0.0)
    r_out_perp = -jnp.sqrt(k)[..., None] * n
    return r_out_parallel + r_out_perp


def onb_from_w(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Orthonormal basis whose w-axis is ``unit(n)`` (reference: src/Lib.hs:272-279)."""
    w = normalize(n)
    a = where3(
        jnp.abs(w[..., 0]) > 0.9,
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], w.dtype), w.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], w.dtype), w.shape),
    )
    v = normalize(cross(w, a))
    u = cross(w, v)
    return u, v, w


def onb_local(uvw: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray], vec: jnp.ndarray) -> jnp.ndarray:
    """Local->world transform of ``vec`` by the basis (reference: src/Lib.hs:269-270)."""
    u, v, w = uvw
    return vec[..., 0:1] * u + vec[..., 1:2] * v + vec[..., 2:3] * w


def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` for small tables, as a one-hot MXU contraction.

    TPU gathers pay a per-op scalar-indexing cost (~4-5 ms per gather at 1M
    lanes regardless of row width, measured PERFLOG.md round 2); a one-hot
    (R, N) x (N, C) matmul at ``Precision.HIGHEST`` is bit-exact (one 1.0
    per row; the bf16-pass decomposition is exact for products by 1.0) and
    as fast or faster at every table size tested (N=2..1409).  XLA fuses
    the one-hot into the matmul, so no (R, N) intermediate hits HBM.

    Integer tables round-trip through f32 (exact for |x| < 2^24).  1-D
    tables return 1-D results.
    """
    squeeze = table.ndim == 1
    t2 = table[:, None] if squeeze else table
    n = t2.shape[0]
    one_hot = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :])
    if jnp.issubdtype(t2.dtype, jnp.integer):
        out = jnp.einsum("rn,nc->rc", one_hot.astype(jnp.float32),
                         t2.astype(jnp.float32),
                         precision=jax.lax.Precision.HIGHEST)
        out = out.astype(t2.dtype)
    else:
        out = jnp.einsum("rn,nc->rc", one_hot.astype(t2.dtype), t2,
                         precision=jax.lax.Precision.HIGHEST)
    return out[:, 0] if squeeze else out
