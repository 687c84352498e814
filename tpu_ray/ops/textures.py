"""Vectorized texture evaluation.

Replaces the reference ``textureValue`` dispatch (src/Lib.hs:496-513) with
gather-based evaluation over a wavefront of shading points.  Scene-level
static flags prune unused kinds at trace time, so e.g. a scene without
Perlin textures compiles no noise gathers at all.

Checker textures recurse exactly one level (their children are evaluated as
non-checker base textures), which covers the reference's usage; the scene
compiler rejects nested checkers.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import vec
from ..models.scene_data import (
    TEX_CHECKER,
    TEX_IMAGE,
    TEX_PERLIN,
    SceneData,
)

_EPS = 1e-4  # reference epsilon (src/Lib.hs:76-77) used in image clamping
PERLIN_POINTS = 256


def _perlin_noise(scene: SceneData, pid, q):
    """One octave of gradient noise (reference ``noise``, src/Lib.hs:441-461).

    ``pid``: (R,) perlin-table row per lane; ``q``: (R, 3) pre-scaled point.
    """
    texs = scene.texs
    ijk = jnp.floor(q)
    uvw = q - ijk
    ijk = ijk.astype(jnp.int32)
    # hermite smoothing for the interpolation weights (src/Lib.hs:472-476)
    h = uvw * uvw * (3.0 - 2.0 * uvw)
    acc = jnp.zeros(q.shape[:-1], q.dtype)
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                ix = jnp.mod(ijk[..., 0] + di, PERLIN_POINTS)
                jx = jnp.mod(ijk[..., 1] + dj, PERLIN_POINTS)
                kx = jnp.mod(ijk[..., 2] + dk, PERLIN_POINTS)
                idx = (
                    texs.perlin_perm[pid, 0, ix]
                    ^ texs.perlin_perm[pid, 1, jx]
                    ^ texs.perlin_perm[pid, 2, kx]
                )
                g = texs.perlin_grad[pid, idx]  # (R, 3)
                w0 = jnp.where(di == 1, h[..., 0], 1.0 - h[..., 0])
                w1 = jnp.where(dj == 1, h[..., 1], 1.0 - h[..., 1])
                w2 = jnp.where(dk == 1, h[..., 2], 1.0 - h[..., 2])
                offset = uvw - jnp.array([di, dj, dk], q.dtype)
                acc = acc + w0 * w1 * w2 * vec.dot(g, offset)
    return acc


def _marble(scene: SceneData, tex_id, p):
    texs = scene.texs
    return marble_from(scene, texs.perlin_id[tex_id], texs.scale[tex_id], p)


def marble_from(scene: SceneData, pid, sc, p):
    """Turbulence-phase marble (reference ``turb``/``marbleTexture``,
    src/Lib.hs:486-494, 512-513): 0.5 * (1 + sin(z + 10 * |sum w_n noise(2^n p)|)),
    7 octaves, noise scaled per texture."""
    sc = sc[..., None]
    acc = jnp.zeros(p.shape[:-1], p.dtype)
    pp = p
    weight = 1.0
    for _ in range(7):
        acc = acc + weight * _perlin_noise(scene, pid, sc * pp)
        pp = 2.0 * pp
        weight = weight * 0.5
    turb = jnp.abs(acc)
    return 0.5 * (1.0 + jnp.sin(p[..., 2] + 10.0 * turb))


def _image_value(scene: SceneData, tex_id, u, v):
    return image_value_from(scene, scene.texs.image_id[tex_id], u, v)


def image_value_from(scene: SceneData, iid, u, v):
    """Image lookup with the reference's clamping and v-flip (src/Lib.hs:504-509)."""
    size = scene.texs.img_size[iid].astype(jnp.float32)  # (R, 2) = (w, h)
    nx, ny = size[..., 0], size[..., 1]
    i = jnp.floor(jnp.clip(u * nx, 0.0, nx - _EPS)).astype(jnp.int32)
    j = jnp.floor(jnp.clip((1.0 - v) * ny - _EPS, 0.0, ny - _EPS)).astype(jnp.int32)
    return scene.texs.img_atlas[iid, j, i]


def _base_value(scene: SceneData, tex_id, u, v, p):
    """Evaluate non-checker textures by id."""
    texs = scene.texs
    kind = texs.kind[tex_id]
    value = texs.color[tex_id]
    if scene.has_perlin:
        m = _marble(scene, tex_id, p)
        white = jnp.ones_like(value)
        value = vec.where3(kind == TEX_PERLIN, m[..., None] * white, value)
    if scene.has_image:
        value = vec.where3(kind == TEX_IMAGE, _image_value(scene, tex_id, u, v), value)
    return value


def texture_value(scene: SceneData, tex_id, u, v, p):
    """``textureValue`` over a wavefront: (R,) ids -> (R, 3) linear albedo."""
    value = _base_value(scene, tex_id, u, v, p)
    if scene.has_checker:
        # sign-of-sines checker (src/Lib.hs:498-501)
        sines = (
            jnp.sin(10.0 * p[..., 0])
            * jnp.sin(10.0 * p[..., 1])
            * jnp.sin(10.0 * p[..., 2])
        )
        odd = _base_value(scene, scene.texs.odd[tex_id], u, v, p)
        even = _base_value(scene, scene.texs.even[tex_id], u, v, p)
        checker = vec.where3(sines < 0.0, odd, even)
        value = vec.where3(scene.texs.kind[tex_id] == TEX_CHECKER, checker, value)
    return value


def texture_value_packed(scene: SceneData, mp, u, v, p):
    """``textureValue`` from packed material-payload rows (R, 16).

    One gather already happened (the payload fetch); only Perlin octaves and
    image lookups still touch tables.  Falls back to the id-based path when a
    checker has non-constant children (scene.checker_fancy).
    """
    tex_kind = mp[:, 3].astype(jnp.int32)
    value = mp[:, 4:7]
    if scene.has_checker:
        sines = (
            jnp.sin(10.0 * p[..., 0])
            * jnp.sin(10.0 * p[..., 1])
            * jnp.sin(10.0 * p[..., 2])
        )
        checker = vec.where3(sines < 0.0, mp[:, 7:10], mp[:, 10:13])
        value = vec.where3(tex_kind == TEX_CHECKER, checker, value)
    if scene.has_perlin:
        m = marble_from(scene, mp[:, 14].astype(jnp.int32), mp[:, 13], p)
        value = vec.where3(
            tex_kind == TEX_PERLIN, m[..., None] * jnp.ones_like(value), value
        )
    if scene.has_image:
        value = vec.where3(
            tex_kind == TEX_IMAGE,
            image_value_from(scene, mp[:, 15].astype(jnp.int32), u, v),
            value,
        )
    return value
