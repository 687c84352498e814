"""Light-list sampling and density for book-3 importance sampling.

Replaces the reference's light BVH hooks (``htblRandom``/``htblPdfValue``,
src/Lib.hs:662-724).  The reference picks a BVH child weighted by leaf count
(every leaf has count 1) and evaluates the density as the count-weighted mean
of per-leaf densities - equivalent to a uniform pick over a flat light list
and a plain mean, which is what we do.  Rect lights are stored as world-space
parallelograms (quads), so any orientation - and any rigid instancing - is
supported.

Deliberate fixes over the reference (documented deviations):
* quad lights of all orientations sample and evaluate correctly; the
  reference only implements the XZ case and silently returns direction
  (1,0,0) / density 0 for the others (src/Lib.hs:684-688, 708-712, 724).
* ``cosThetaMax`` is clamped at 0 so sampling toward a sphere from inside it
  cannot produce NaN (src/Lib.hs:690-693 takes an unguarded sqrt).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng, vec
from ..models.scene_data import LIGHT_QUAD, SceneData

TWO_PI = 2.0 * jnp.pi


def sample_lights_from(scene: SceneData, u5: jnp.ndarray, origin):
    """Draw a direction toward a uniformly chosen light from 5 uniforms
    (pick, quad u/v, cone u/v) per lane.

    ``origin``: (R, 3) shading points.  Returns (R, 3) *unnormalized*
    directions, matching ``htblRandom`` (src/Lib.hs:707-724).
    """
    L = scene.n_lights
    lights = scene.lights
    pick = jnp.minimum((u5[:, 0] * L).astype(jnp.int32), L - 1)

    # all six per-light fields in ONE one-hot row pull (six separate TPU
    # gathers measured ~8 ms net at 1M lanes; this is ~0 - PERFLOG.md)
    packed = jnp.concatenate([
        lights.quad_p0, lights.quad_e1, lights.quad_e2, lights.center,
        lights.radius[:, None],
        (lights.kind == LIGHT_QUAD).astype(lights.radius.dtype)[:, None],
    ], axis=1)                      # (L, 14)
    row = vec.take_rows(packed, pick)

    # quad: uniform point on the parallelogram (src/Lib.hs:708-712)
    p_quad = row[:, 0:3] + u5[:, 1:2] * row[:, 3:6] + u5[:, 2:3] * row[:, 6:9]
    dir_quad = p_quad - origin

    # sphere: solid-angle cone sample via an ONB (src/Lib.hs:713-718)
    dc = row[:, 9:12] - origin
    d2 = vec.squared_length(dc)
    local = rng.to_sphere_from(u5[:, 3:5], row[:, 12], jnp.maximum(d2, 1e-12))
    dir_sph = vec.onb_local(vec.onb_from_w(dc), local)

    return vec.where3(row[:, 13] > 0.5, dir_quad, dir_sph)


def sample_lights(scene: SceneData, key, origin):
    """Key-based wrapper over :func:`sample_lights_from`."""
    u5 = jax.random.uniform(key, (origin.shape[0], 5))
    return sample_lights_from(scene, u5, origin)


def lights_pdf(scene: SceneData, origin, direction):
    """Mean density of the light-sampling strategy for a *unit* direction.

    Mirrors ``htblPdfValue`` (src/Lib.hs:673-705): quads contribute
    dist^2 / (|cos| * area) when the probe ray hits them, spheres contribute
    1/solid_angle when hit, others 0; the mixture weight is uniform.
    """
    lights = scene.lights
    L = scene.n_lights
    eps = jnp.float32(scene.t_min)
    o = origin[:, None, :]      # (R, 1, 3)
    d = direction[:, None, :]

    # quad probe (cf. the parallelogram solve in ops/intersect.py)
    n = lights.quad_n[None]     # (1, L, 3)
    dn = vec.dot(d, n)
    t = (lights.quad_d[None] - vec.dot(o, n)) / dn
    x = o + t[..., None] * d - lights.quad_p0[None]
    uq = vec.dot(x, lights.quad_inv1[None])
    vq = vec.dot(x, lights.quad_inv2[None])
    hit_quad = (t > eps) & (uq >= 0.0) & (uq <= 1.0) & (vq >= 0.0) & (vq <= 1.0)
    pdf_quad = jnp.where(
        hit_quad,
        t * t / jnp.maximum(jnp.abs(dn) * lights.quad_area[None], 1e-12),
        0.0,
    )

    # sphere probe + solid angle (src/Lib.hs:689-693)
    oc = o - lights.center[None]
    bq = vec.dot(oc, d)
    cq = vec.dot(oc, oc) - lights.radius[None] ** 2
    disc = bq * bq - cq
    sd = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1, t2 = -bq - sd, -bq + sd
    hit_sph = (disc > 0.0) & ((t1 > eps) | (t2 > eps))
    cos_theta_max = jnp.sqrt(
        jnp.maximum(
            1.0 - lights.radius[None] ** 2 / jnp.maximum(vec.dot(oc, oc), 1e-12),
            0.0,
        )
    )
    solid_angle = TWO_PI * (1.0 - cos_theta_max)
    pdf_sph = jnp.where(hit_sph, 1.0 / jnp.maximum(solid_angle, 1e-12), 0.0)

    pdf = jnp.where(lights.kind[None] == LIGHT_QUAD, pdf_quad, pdf_sph)
    return jnp.sum(pdf, axis=1) / L
