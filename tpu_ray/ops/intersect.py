"""Wavefront intersection: every ray vs. every primitive, in lockstep.

TPU-native replacement for the reference's recursive BVH descent and
per-variant ``hit`` pattern match (src/Lib.hs:970-1109).  A wavefront of R
rays is tested against the primitive table in chunks; each chunk computes a
candidate hit distance for all four primitive kinds as masked vector math on
the VPU and reduces a running (t, prim) minimum.  Divergence-free, static
shapes, nothing but elementwise ops and reductions - exactly what XLA fuses
into a single pass over the (R, C) tile.

Constant-density media (reference: src/Lib.hs:1053-1080) draw their
free-flight distance from a per-(ray, prim) uniform.  Computing each medium
independently against t_max = +inf and min-reducing afterwards is
distributionally identical to the reference's sequential traversal that
clips t_max to the closest hit so far: the exponential sample is compared
against the same minimum either way.

Instance transforms (``Translate``/``Rotate``, reference src/Lib.hs:1029-1052)
are applied by moving the ray into object space; hit t is invariant under
rigid motion.  Front-face flags are computed once in object space (the
reference re-derives them per wrapper with an already-flipped normal, a
no-op quirk for every scene it ships - see SURVEY.md section 2.3).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core import vec
from ..models.scene_data import (
    PRIM_MEDIUM_BOX,
    PRIM_MEDIUM_SPHERE,
    PRIM_RECT,
    PRIM_SPHERE,
    SceneData,
)

INF = float('inf')
# epsilon used by the reference for the second boundary probe of a medium
# (src/Lib.hs:1057) and for rect bbox padding
MED_EPS = 1e-4
CHUNK = 512


@struct.dataclass
class HitRecord:
    """Batched hit record (reference ``Hit``, src/Lib.hs:320-337)."""

    hit: jnp.ndarray      # (R,) bool
    t: jnp.ndarray        # (R,)
    point: jnp.ndarray    # (R, 3) world space
    normal: jnp.ndarray   # (R, 3) world space, flipped against the ray
    front: jnp.ndarray    # (R,) bool
    u: jnp.ndarray        # (R,)
    v: jnp.ndarray        # (R,)
    mat: jnp.ndarray      # (R,) int32
    prim: jnp.ndarray     # (R,) int32


def _object_space(scene: SceneData, sl, ro, rd):
    """Rays in each primitive's object frame: x_o = R^T (x_w - off)."""
    if scene.any_transform:
        rot = sl(scene.prims.xf_rot)          # (C, 3, 3)
        off = sl(scene.prims.xf_off)          # (C, 3)
        ro_o = jnp.einsum("cij,rci->rcj", rot, ro[:, None, :] - off[None],
                           precision="highest")
        rd_o = jnp.einsum("cij,ri->rcj", rot, rd, precision="highest")
    else:
        ro_o = ro[:, None, :]
        rd_o = rd[:, None, :]
    return ro_o, rd_o


def _chunk_t(scene: SceneData, start: int, count: int, ro, rd, rt, u_med,
             t_min, t_max):
    """Hit distance of every ray against prims [start, start+count) -> (R, C)."""
    sl = lambda a: jax.lax.slice_in_dim(a, start, start + count, axis=0)
    prims = scene.prims
    kind = sl(prims.kind)[None, :]            # (1, C)
    ro_o, rd_o = _object_space(scene, sl, ro, rd)

    a = vec.dot(rd_o, rd_o)                   # (R, C) or (R, 1)
    t = jnp.full(ro.shape[:1] + (count,), INF)

    # ---- spheres (+ medium-sphere boundaries): quadratic, src/Lib.hs:1081-1105
    if scene.has_spheres:
        center = sl(prims.center)             # (C, 3)
        if scene.has_moving:
            # moving sphere lerps its center by ray time (src/Lib.hs:1106-1108)
            dt = rt[:, None] - sl(prims.time0)[None, :]
            ct = center[None] + sl(prims.velocity)[None] * dt[..., None]
        else:
            ct = center[None]
        oc = ro_o - ct
        b = vec.dot(oc, rd_o)
        c = vec.dot(oc, oc) - sl(prims.radius)[None] ** 2
        disc = b * b - a * c
        ok = disc > 0.0
        sd = jnp.sqrt(jnp.maximum(disc, 0.0))
        inv_a = 1.0 / a
        t1 = (-b - sd) * inv_a
        t2 = (-b + sd) * inv_a
        t_sph = jnp.where(
            ok & (t1 > t_min) & (t1 < t_max), t1,
            jnp.where(ok & (t2 > t_min) & (t2 < t_max), t2, INF),
        )
        t = jnp.where(kind == PRIM_SPHERE, t_sph, t)

    # ---- rects: plane solve + bounds, src/Lib.hs:1005-1028
    if scene.has_rects:
        ri, rj, rk = sl(prims.rect_i), sl(prims.rect_j), sl(prims.rect_k)
        bounds = sl(prims.rect_bounds)        # (C, 5)
        o_k = vec.dot(ro_o, rk[None])
        d_k = vec.dot(rd_o, rk[None])
        tr = (bounds[None, :, 4] - o_k) / d_k  # d_k == 0 -> +-inf, fails bounds
        i = vec.dot(ro_o, ri[None]) + tr * vec.dot(rd_o, ri[None])
        j = vec.dot(ro_o, rj[None]) + tr * vec.dot(rd_o, rj[None])
        ok_r = (
            (tr > t_min) & (tr < t_max)
            & (i >= bounds[None, :, 0]) & (i <= bounds[None, :, 1])
            & (j >= bounds[None, :, 2]) & (j <= bounds[None, :, 3])
        )
        t = jnp.where(kind == PRIM_RECT, jnp.where(ok_r, tr, INF), t)

    # ---- constant media: exponential free flight, src/Lib.hs:1053-1080
    if scene.has_media:
        # entry/exit of the boundary over (-inf, +inf)
        te = jnp.full_like(t, INF)
        tx = jnp.full_like(t, -INF)
        exists = jnp.zeros(t.shape, bool)
        # sphere boundary: both roots (computed by the sphere section above;
        # has_spheres is implied by any PRIM_MEDIUM_SPHERE in the scene)
        if scene.has_spheres:
            te = jnp.where(kind == PRIM_MEDIUM_SPHERE, t1, te)
            tx = jnp.where(kind == PRIM_MEDIUM_SPHERE, t2, tx)
            exists = exists | ((kind == PRIM_MEDIUM_SPHERE) & ok)
        # box boundary: slab test (cf. boxRayIntersect, src/Lib.hs:798-814)
        inv_d = 1.0 / rd_o
        ta = (sl(prims.box_min)[None] - ro_o) * inv_d
        tb = (sl(prims.box_max)[None] - ro_o) * inv_d
        te_box = jnp.max(jnp.minimum(ta, tb), axis=-1)
        tx_box = jnp.min(jnp.maximum(ta, tb), axis=-1)
        te = jnp.where(kind == PRIM_MEDIUM_BOX, te_box, te)
        tx = jnp.where(kind == PRIM_MEDIUM_BOX, tx_box, tx)
        exists = exists | ((kind == PRIM_MEDIUM_BOX) & (tx_box > te_box))
        # second boundary probe starts at entry + eps (src/Lib.hs:1057)
        exists = exists & (tx > te + MED_EPS)
        rec1 = jnp.maximum(t_min, te)
        rec2 = tx
        dlen = jnp.sqrt(a)
        dist_inside = (rec2 - rec1) * dlen
        hit_dist = sl(prims.neg_inv_density)[None] * jnp.log(
            jnp.maximum(u_med, 1e-12)
        )
        ok_m = exists & (rec1 < rec2) & (hit_dist <= dist_inside)
        t_med = jnp.where(ok_m, rec1 + hit_dist / dlen, INF)
        t = jnp.where(kind >= PRIM_MEDIUM_SPHERE, t_med, t)

    return t


def intersect_scene(scene: SceneData, ro, rd, rt, key, t_max=INF) -> HitRecord:
    """Closest hit of each ray against the whole scene.

    ``ro``/``rd``: (R, 3); ``rt``: (R,) ray times; ``key`` feeds the medium
    free-flight sampling (one uniform per ray x medium chunk).
    """
    n = scene.n_prims
    t_min = jnp.float32(scene.t_min)
    R = ro.shape[0]

    best_t = jnp.full((R,), INF)
    best_i = jnp.zeros((R,), jnp.int32)
    for ci, start in enumerate(range(0, n, CHUNK)):
        count = min(CHUNK, n - start)
        if scene.has_media:
            u_med = jax.random.uniform(jax.random.fold_in(key, ci), (R, count))
        else:
            u_med = None
        t = _chunk_t(scene, start, count, ro, rd, rt, u_med, t_min, t_max)
        ct = jnp.min(t, axis=1)
        cidx = jnp.argmin(t, axis=1).astype(jnp.int32) + start
        closer = ct < best_t
        best_t = jnp.where(closer, ct, best_t)
        best_i = jnp.where(closer, cidx, best_i)

    return _hit_record(scene, ro, rd, rt, best_t, best_i)


def _hit_record(scene: SceneData, ro, rd, rt, t, idx) -> HitRecord:
    """Reconstruct the full hit record for each ray's winning primitive."""
    prims = scene.prims
    hit = jnp.isfinite(t)
    ts = jnp.where(hit, t, 1.0)  # keep dead lanes finite
    kind = prims.kind[idx]
    mat = prims.mat[idx]

    point = ro + ts[:, None] * rd
    if scene.any_transform:
        rot = prims.xf_rot[idx]               # (R, 3, 3)
        off = prims.xf_off[idx]
        ro_o = jnp.einsum("rij,ri->rj", rot, ro - off, precision="highest")
        rd_o = jnp.einsum("rij,ri->rj", rot, rd, precision="highest")
    else:
        ro_o, rd_o = ro, rd
    p_o = ro_o + ts[:, None] * rd_o

    # sphere normal + spherical UV (src/Lib.hs:1096-1105)
    ct = prims.center[idx]
    if scene.has_moving:
        ct = ct + prims.velocity[idx] * (rt - prims.time0[idx])[:, None]
    n_sph = (p_o - ct) / jnp.maximum(prims.radius[idx], 1e-12)[:, None]
    phi = jnp.arctan2(n_sph[..., 2], n_sph[..., 0])
    theta = jnp.arcsin(jnp.clip(n_sph[..., 1], -1.0, 1.0))
    u_sph = 1.0 - (phi + jnp.pi) / (2.0 * jnp.pi)
    v_sph = (theta + jnp.pi / 2.0) / jnp.pi

    normal_o, uu, vv = n_sph, u_sph, v_sph
    if scene.has_rects:
        # rect normal + planar UV (src/Lib.hs:1014-1026)
        ri, rj = prims.rect_i[idx], prims.rect_j[idx]
        rk = prims.rect_k[idx]
        b = prims.rect_bounds[idx]
        i = vec.dot(p_o, ri)
        j = vec.dot(p_o, rj)
        u_rect = (i - b[:, 0]) / (b[:, 1] - b[:, 0])
        v_rect = (j - b[:, 2]) / (b[:, 3] - b[:, 2])
        is_rect = kind == PRIM_RECT
        normal_o = vec.where3(is_rect, rk, normal_o)
        uu = jnp.where(is_rect, u_rect, uu)
        vv = jnp.where(is_rect, v_rect, vv)

    front = vec.dot(rd_o, normal_o) < 0.0
    normal_o = vec.where3(front, normal_o, -normal_o)
    if scene.any_transform:
        normal_w = jnp.einsum("rij,rj->ri", rot, normal_o, precision="highest")
    else:
        normal_w = normal_o

    if scene.has_media:
        # medium hits: fixed normal (1,0,0), front face, uv = 0
        # (src/Lib.hs:1073-1079)
        is_med = kind >= PRIM_MEDIUM_SPHERE
        med_n = jnp.broadcast_to(
            jnp.array([1.0, 0.0, 0.0], normal_w.dtype), normal_w.shape
        )
        normal_w = vec.where3(is_med, med_n, normal_w)
        front = jnp.where(is_med, True, front)
        uu = jnp.where(is_med, 0.0, uu)
        vv = jnp.where(is_med, 0.0, vv)

    return HitRecord(
        hit=hit, t=t, point=point, normal=normal_w, front=front,
        u=uu, v=vv, mat=mat, prim=idx,
    )
