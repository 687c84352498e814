"""Light-list sampling and density for book-3 importance sampling.

Replaces the reference's light BVH hooks (``htblRandom``/``htblPdfValue``,
src/Lib.hs:662-724).  The reference picks a BVH child weighted by leaf count
(every leaf has count 1) and evaluates the density as the count-weighted mean
of per-leaf densities - equivalent to a uniform pick over a flat light list
and a plain mean, which is what we do.

Deliberate fixes over the reference (documented deviations):
* rect lights of all three orientations sample and evaluate correctly; the
  reference only implements the XZ case and silently returns direction
  (1,0,0) / density 0 for the others (src/Lib.hs:684-688, 708-712, 724).
* ``cosThetaMax`` is clamped at 0 so sampling toward a sphere from inside it
  cannot produce NaN (src/Lib.hs:690-693 takes an unguarded sqrt).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng, vec
from ..models.scene_data import LIGHT_RECT, LIGHT_SPHERE, SceneData

TWO_PI = 2.0 * jnp.pi


def sample_lights(scene: SceneData, key, origin):
    """Draw a direction toward a uniformly chosen light.

    ``origin``: (R, 3) shading points.  Returns (R, 3) *unnormalized*
    directions, matching ``htblRandom`` (src/Lib.hs:707-724).
    """
    L = scene.n_lights
    lights = scene.lights
    k_pick, k_rect, k_cone = jax.random.split(key, 3)
    R = origin.shape[0]
    pick = jax.random.randint(k_pick, (R,), 0, L)

    # rect: uniform point on the rectangle (src/Lib.hs:708-712)
    b = lights.rect_bounds[pick]  # (R, 5)
    uv = jax.random.uniform(k_rect, (R, 2))
    i = b[:, 0] + uv[:, 0] * (b[:, 1] - b[:, 0])
    j = b[:, 2] + uv[:, 1] * (b[:, 3] - b[:, 2])
    p_rect = (
        i[:, None] * lights.rect_i[pick]
        + j[:, None] * lights.rect_j[pick]
        + b[:, 4:5] * lights.rect_k[pick]
    )
    dir_rect = p_rect - origin

    # sphere: solid-angle cone sample via an ONB (src/Lib.hs:713-718)
    dc = lights.center[pick] - origin
    d2 = vec.squared_length(dc)
    local = rng.to_sphere(k_cone, lights.radius[pick], jnp.maximum(d2, 1e-12), (R,))
    dir_sph = vec.onb_local(vec.onb_from_w(dc), local)

    return vec.where3(lights.kind[pick] == LIGHT_RECT, dir_rect, dir_sph)


def lights_pdf(scene: SceneData, origin, direction):
    """Mean density of the light-sampling strategy for a *unit* direction.

    Mirrors ``htblPdfValue`` (src/Lib.hs:673-705): rects contribute
    dist^2 / (|cos| * area) when the probe ray hits them, spheres contribute
    1/solid_angle when hit, others 0; the mixture weight is uniform.
    """
    lights = scene.lights
    L = scene.n_lights
    eps = jnp.float32(scene.t_min)
    o = origin[:, None, :]      # (R, 1, 3)
    d = direction[:, None, :]

    # rect probe (cf. rectHit, src/Lib.hs:1014-1028)
    b = lights.rect_bounds[None]           # (1, L, 5)
    o_k = vec.dot(o, lights.rect_k[None])
    d_k = vec.dot(d, lights.rect_k[None])
    t = (b[..., 4] - o_k) / d_k
    i = vec.dot(o, lights.rect_i[None]) + t * vec.dot(d, lights.rect_i[None])
    j = vec.dot(o, lights.rect_j[None]) + t * vec.dot(d, lights.rect_j[None])
    hit_rect = (
        (t > eps)
        & (i >= b[..., 0]) & (i <= b[..., 1])
        & (j >= b[..., 2]) & (j <= b[..., 3])
    )
    area = (b[..., 1] - b[..., 0]) * (b[..., 3] - b[..., 2])
    pdf_rect = jnp.where(
        hit_rect, t * t / jnp.maximum(jnp.abs(d_k) * area, 1e-12), 0.0
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
        jnp.maximum(1.0 - lights.radius[None] ** 2 / jnp.maximum(vec.dot(oc, oc), 1e-12), 0.0)
    )
    solid_angle = TWO_PI * (1.0 - cos_theta_max)
    pdf_sph = jnp.where(hit_sph, 1.0 / jnp.maximum(solid_angle, 1e-12), 0.0)

    pdf = jnp.where(lights.kind[None] == LIGHT_RECT, pdf_rect, pdf_sph)
    return jnp.sum(pdf, axis=1) / L
