"""Wavefront intersection: every ray vs. every primitive, in lockstep.

TPU-native replacement for the reference's recursive BVH descent and
per-variant ``hit`` pattern match (src/Lib.hs:970-1109).  A wavefront of R
rays is tested against the primitive table in chunks; each chunk computes a
candidate hit distance for all four primitive kinds as masked vector math on
the VPU and reduces a running (t, prim) minimum.  Divergence-free, static
shapes, nothing but elementwise ops and reductions - exactly what XLA fuses
into a single pass over the (R, C) tile.

All geometry lives in world space: the reference's ``Translate``/``Rotate``
wrappers (src/Lib.hs:1029-1052) are baked into sphere centers (rotation
invariant) and into quad corner/edge vectors at scene-build time, so no ray
is ever moved into object space - except for medium *boxes*, the one shape
whose slab test needs its own frame.

Constant-density media (reference: src/Lib.hs:1053-1080) draw their
free-flight distance from a per-(ray, prim) uniform.  Computing each medium
independently against t_max = +inf and min-reducing afterwards is
distributionally identical to the reference's sequential traversal that
clips t_max to the closest hit so far: the exponential sample is compared
against the same minimum either way.

Front-face flags are computed once against the world normal (the reference
re-derives them per instancing wrapper with an already-flipped normal, a
no-op quirk for every scene it ships - see SURVEY.md section 2.3).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core import vec
from ..models.scene_data import (
    PRIM_BOX,
    PRIM_MEDIUM_BOX,
    PRIM_MEDIUM_SPHERE,
    PRIM_QUAD,
    PRIM_SPHERE,
    SceneData,
)

INF = float("inf")
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


def _chunk_t(scene: SceneData, prims, ro, rd, rt, u_med, t_min, t_max,
             do_spheres=None, do_quads=None, do_media=None, do_boxes=None,
             sphere_mxu: bool = False, moving=None):
    """Hit distance of every ray against a chunk of prims -> (R, C).

    ``prims``: a PrimArrays pytree whose leading dimension is the chunk.
    The ``do_*`` flags restrict the math to the kinds a (homogeneous) chunk
    actually contains; they default to the scene's feature flags.

    ``sphere_mxu`` (engine "mxu") computes the sphere quadratic's ray-prim
    cross terms as two (R, 3) @ (3, C) matmuls on the MXU instead of
    per-pair VPU subtract/dot chains, after shifting both rays and centers
    to the chunk centroid (the expanded b = ro'.d - c'.d and
    |oc|^2 = |ro'|^2 - 2 ro'.c' + |c'|^2 forms lose f32 conditioning when
    |ro| >> |oc| - round 1 measured visible artifacts at |p| ~ 1000
    uncentered; the centroid shift keeps the operand magnitudes at chunk
    scale).  Values differ from the classic form at ~1e-6 relative, so
    this is an ENGINE choice, not a default (goldens pin the classic
    path); requires a static scene (moving centers vary per ray - no
    shared matmul operand).

    KEEP IN SYNC with ops/bvh.py::_one_prim_t and
    ops/intersect_pallas.py::_kernel (same math, different layouts); the
    BVH/Pallas test files enforce exact agreement.
    """
    do_spheres = scene.has_spheres if do_spheres is None else do_spheres
    do_quads = scene.has_quads if do_quads is None else do_quads
    do_media = scene.has_media if do_media is None else do_media
    do_boxes = scene.has_solid_box if do_boxes is None else do_boxes
    sl = lambda a: a
    kind = prims.kind[None, :]                # (1, C)
    a = vec.dot(rd, rd)[:, None]              # (R, 1)
    t = jnp.full((ro.shape[0], prims.kind.shape[0]), INF)

    # ---- spheres (+ medium-sphere boundaries): quadratic, src/Lib.hs:1081-1105
    if do_spheres or (do_media and scene.has_spheres):
        # ``moving``: the scene compiler sorts static spheres first, so the
        # static sub-sweep skips the lerp (exact: zero-velocity lerp is the
        # identity); None = the scene-level flag (media boundaries etc.)
        moving_ = scene.has_moving if moving is None else moving
        center = prims.center                 # (C, 3)
        if sphere_mxu and not moving_:
            hi = jax.lax.Precision.HIGHEST
            m = jnp.mean(center, axis=0)      # chunk centroid
            cp = center - m                   # (C, 3), chunk-scale
            rop = ro - m                      # (R, 3)
            M_rc = jnp.einsum("ri,ci->rc", rop, cp, precision=hi)
            M_dc = jnp.einsum("ri,ci->rc", rd, cp, precision=hi)
            b = vec.dot(rop, rd)[:, None] - M_dc
            c = (vec.dot(rop, rop)[:, None] - 2.0 * M_rc
                 + (vec.dot(cp, cp) - sl(prims.radius) ** 2)[None])
        else:
            if moving_:
                # moving sphere lerps its center by ray time
                # (src/Lib.hs:1106-1108)
                dt = rt[:, None] - sl(prims.time0)[None, :]
                ct = center[None] + sl(prims.velocity)[None] * dt[..., None]
                oc = ro[:, None, :] - ct
            else:
                oc = ro[:, None, :] - center[None]
            b = vec.dot(oc, rd[:, None, :])
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

    # ---- quads: world-space parallelogram solve (generalizes the rect
    # plane solve of src/Lib.hs:1005-1028 to any rigid instancing)
    if do_quads:
        n = sl(prims.quad_n)                  # (C, 3)
        dn = vec.dot(rd[:, None, :], n[None])
        tq = (sl(prims.quad_d)[None] - vec.dot(ro[:, None, :], n[None])) / dn
        x = ro[:, None, :] + tq[..., None] * rd[:, None, :] - sl(prims.quad_p0)[None]
        uq = vec.dot(x, sl(prims.quad_inv1)[None])
        vq = vec.dot(x, sl(prims.quad_inv2)[None])
        ok_q = (
            (tq > t_min) & (tq < t_max)
            & (uq >= 0.0) & (uq <= 1.0) & (vq >= 0.0) & (vq <= 1.0)
        )
        t = jnp.where(kind == PRIM_QUAD, jnp.where(ok_q, tq, INF), t)

    # ---- solid boxes: world-space axis-aligned slab test.  One test
    # replaces the reference cuboid's fold over 6 rects (src/Lib.hs:594-605,
    # 989-1004): closest-t is identical (entry face if in front of t_min,
    # else exit face for rays starting inside the box)
    if do_boxes:
        inv_d = 1.0 / rd[:, None, :]
        ta = (sl(prims.box_min)[None] - ro[:, None, :]) * inv_d
        tb = (sl(prims.box_max)[None] - ro[:, None, :]) * inv_d
        tn_b = jnp.max(jnp.minimum(ta, tb), axis=-1)
        tf_b = jnp.min(jnp.maximum(ta, tb), axis=-1)
        ok_b = tf_b > tn_b
        t_box = jnp.where(
            ok_b & (tn_b > t_min) & (tn_b < t_max), tn_b,
            jnp.where(ok_b & (tf_b > t_min) & (tf_b < t_max), tf_b, INF),
        )
        t = jnp.where(kind == PRIM_BOX, t_box, t)

    # ---- constant media: exponential free flight, src/Lib.hs:1053-1080
    if do_media:
        # entry/exit of the boundary over (-inf, +inf)
        te = jnp.full_like(t, INF)
        tx = jnp.full_like(t, -INF)
        exists = jnp.zeros(t.shape, bool)
        # sphere boundary: both quadratic roots from the sphere section
        if scene.has_spheres:
            te = jnp.where(kind == PRIM_MEDIUM_SPHERE, t1, te)
            tx = jnp.where(kind == PRIM_MEDIUM_SPHERE, t2, tx)
            exists = exists | ((kind == PRIM_MEDIUM_SPHERE) & ok)
        # box boundary: slab test in the box's object frame
        # (cf. boxRayIntersect, src/Lib.hs:798-814)
        if scene.has_box_media:
            if scene.any_transform:
                rot = sl(prims.xf_rot)
                off = sl(prims.xf_off)
                ro_o = jnp.einsum(
                    "cij,rci->rcj", rot, ro[:, None, :] - off[None],
                    precision="highest",
                )
                rd_o = jnp.einsum("cij,ri->rcj", rot, rd, precision="highest")
            else:
                ro_o = ro[:, None, :]
                rd_o = rd[:, None, :]
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
        u_chunk = u_med[:, sl(prims.medium_slot)]  # (R, C) from (R, n_media)
        hit_dist = sl(prims.neg_inv_density)[None] * jnp.log(
            jnp.maximum(u_chunk, 1e-12)
        )
        ok_m = exists & (rec1 < rec2) & (hit_dist <= dist_inside)
        t_med = jnp.where(ok_m, rec1 + hit_dist / dlen, INF)
        t = jnp.where(kind >= PRIM_MEDIUM_SPHERE, t_med, t)

    return t


def intersect_scene(scene: SceneData, ro, rd, rt, key, t_max=INF,
                    engine: str = "xla", lane_ids=None) -> HitRecord:
    """Closest hit of each ray against the whole scene.

    ``ro``/``rd``: (R, 3); ``rt``: (R,) ray times; ``key`` feeds the medium
    free-flight sampling (one uniform per ray and medium, keyed by
    ``lane_ids`` so the draw is independent of lane position).
    ``engine="pallas"`` runs the solid-primitive sweep as a fused Pallas
    kernel (media keep the XLA path and are min-combined).
    """
    best_t, best_i = intersect_ti(scene, ro, rd, rt, key, t_max, engine,
                                  lane_ids)
    return _hit_record(scene, ro, rd, rt, best_t, best_i)


def intersect_ti(scene: SceneData, ro, rd, rt, key, t_max=INF,
                 engine: str = "xla", lane_ids=None):
    """(best_t, best_i) of the closest hit, without the record rebuild.

    The fused Pallas shading kernel (ops/shade_pallas.py) consumes this
    directly and rebuilds the record in-kernel.
    """
    n = scene.n_prims
    t_min = jnp.float32(scene.t_min)
    R = ro.shape[0]

    best_t = jnp.full((R,), INF)
    best_i = jnp.zeros((R,), jnp.int32)
    # one free-flight uniform per (ray, medium) for the whole scene
    if scene.has_media:
        from ..core import rng as rng_mod

        if lane_ids is None:
            lane_ids = jnp.arange(R, dtype=jnp.uint32)
        u_med = rng_mod.lane_uniforms(key, lane_ids, scene.n_media)
    else:
        u_med = None
    if engine == "pallas" and scene.n_solid > 0:
        from .intersect_pallas import intersect_solids_pallas

        best_t, best_i = intersect_solids_pallas(scene, ro, rd, rt)
        best_t = jnp.where(best_t < t_max, best_t, INF)
        start0 = scene.n_solid  # media suffix via the XLA path
    else:
        start0 = 0

    inv_rd = 1.0 / rd

    def _chunk_aabb(p, do):
        """Conservative chunk AABB (motion union over t in [0,1]); padded
        rows (radius-0 kind-0 spheres) are excluded.  Returns (lo, hi)."""
        if do.get("do_quads"):
            valid = p.kind == PRIM_QUAD
            corners = jnp.stack([
                p.quad_p0, p.quad_p0 + p.quad_e1, p.quad_p0 + p.quad_e2,
                p.quad_p0 + p.quad_e1 + p.quad_e2,
            ])  # (4, C, 3)
            lo = jnp.where(valid[:, None], corners.min(0), INF).min(0)
            hi = jnp.where(valid[:, None], corners.max(0), -INF).max(0)
        elif do.get("do_boxes"):
            valid = p.kind == PRIM_BOX
            lo = jnp.where(valid[:, None], p.box_min, INF).min(0)
            hi = jnp.where(valid[:, None], p.box_max, -INF).max(0)
        else:
            valid = p.radius > 0.0
            c0 = p.center + p.velocity * (0.0 - p.time0)[:, None]
            c1 = p.center + p.velocity * (1.0 - p.time0)[:, None]
            r = p.radius[:, None]
            lo = jnp.where(valid[:, None], jnp.minimum(c0, c1) - r, INF).min(0)
            hi = jnp.where(valid[:, None], jnp.maximum(c0, c1) + r, -INF).max(0)
        return lo, hi

    def sweep(best, lo, hi, **do):
        """Min-sweep prim rows [lo, hi) with kind-specialized chunk math."""
        best_t, best_i = best
        count = hi - lo
        if count <= 0:
            return best
        take = lambda a: jax.lax.slice_in_dim(a, lo, hi, axis=0)
        if count <= CHUNK:
            p = jax.tree.map(take, scene.prims)
            t = _chunk_t(scene, p, ro, rd, rt, u_med, t_min, t_max, **do)
            ct = jnp.min(t, axis=1)
            cidx = jnp.argmin(t, axis=1).astype(jnp.int32) + lo
            closer = ct < best_t
            return jnp.where(closer, ct, best_t), jnp.where(closer, cidx, best_i)
        # many chunks: lax.scan over a (n_chunks, CHUNK, ...) stack so only
        # one chunk's (R, C) temporaries are ever live (an unrolled loop let
        # XLA keep ~10 of them and blew HBM on 3400-prim scenes)
        pad = (-count) % CHUNK

        def stack(a):
            a = take(a)
            a = jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
            return a.reshape((-1, CHUNK) + a.shape[1:])

        stacked = jax.tree.map(stack, scene.prims)
        # padded rows are radius-0 spheres at the origin: never hit

        def body(carry, p):
            bt, bi, base = carry

            def run(bt, bi):
                t = _chunk_t(scene, p, ro, rd, rt, u_med, t_min, t_max, **do)
                ct = jnp.min(t, axis=1)
                cidx = jnp.argmin(t, axis=1).astype(jnp.int32) + base
                closer = ct < bt
                return jnp.where(closer, ct, bt), jnp.where(closer, cidx, bi)

            if do.get("do_media"):
                bt, bi = run(bt, bi)  # media chunks are tiny; never culled
            else:
                # chunk-AABB culling: prims are Morton-ordered (compile.py)
                # so chunks are spatially tight; any hit point inside the
                # chunk lies within [tn, tf] of its slab, so a chunk whose
                # entry tn can't beat a ray's best (with a relative margin
                # for f32 slab-vs-primitive rounding) is skipped exactly.
                clo, chi = _chunk_aabb(p, do)
                t0 = (clo[None] - ro) * inv_rd
                t1 = (chi[None] - ro) * inv_rd
                tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
                tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
                slack = 1e-4 * (1.0 + jnp.abs(tn))
                needed = jnp.any(
                    (tn - slack <= jnp.minimum(tf, bt)) & (tf > t_min)
                )
                bt, bi = jax.lax.cond(needed, run, lambda a, b: (a, b), bt, bi)
            return (bt, bi, base + CHUNK), None

        (best_t, best_i, _), _ = jax.lax.scan(
            body, (best_t, best_i, jnp.int32(lo)), stacked
        )
        return best_t, best_i

    # homogeneous regions (models/compile.py sorts spheres | boxes | quads
    # | media)
    mxu = engine == "mxu" and not scene.has_moving
    best = (best_t, best_i)
    if start0 < scene.n_solid:
        s0 = max(start0, 0)
        n_sb = scene.n_sphere + scene.n_box
        best = sweep(best, s0, scene.n_sphere_static,
                     do_spheres=True, do_quads=False, do_media=False,
                     do_boxes=False, sphere_mxu=mxu, moving=False)
        best = sweep(best, max(scene.n_sphere_static, s0), scene.n_sphere,
                     do_spheres=True, do_quads=False, do_media=False,
                     do_boxes=False, sphere_mxu=mxu, moving=True)
        best = sweep(best, max(scene.n_sphere, s0), n_sb,
                     do_spheres=False, do_quads=False, do_media=False,
                     do_boxes=True)
        best = sweep(best, max(n_sb, s0), scene.n_solid,
                     do_spheres=False, do_quads=True, do_media=False,
                     do_boxes=False)
    best = sweep(best, scene.n_solid, n,
                 do_spheres=False, do_quads=False, do_media=scene.has_media,
                 do_boxes=False)
    best_t, best_i = best

    return best_t, best_i


def _hit_record(scene: SceneData, ro, rd, rt, t, idx) -> HitRecord:
    """Reconstruct the full hit record for each ray's winning primitive.

    One wide payload-row pull per ray (TPU gathers cost per op, not per
    byte; the one-hot contraction beats them - core/vec.py:take_rows);
    layout in models/compile.py.
    """
    pay = vec.take_rows(scene.prim_payload, idx)  # (R, 22)
    hit = jnp.isfinite(t)
    ts = jnp.where(hit, t, 1.0)  # keep dead lanes finite
    kind = pay[:, 0].astype(jnp.int32)
    mat = pay[:, 1].astype(jnp.int32)
    point = ro + ts[:, None] * rd

    # sphere normal + spherical UV (src/Lib.hs:1096-1105)
    ct = pay[:, 2:5]
    if scene.has_moving:
        ct = ct + pay[:, 5:8] * (rt - pay[:, 8])[:, None]
    n_sph = (point - ct) / jnp.maximum(pay[:, 9], 1e-12)[:, None]
    phi = jnp.arctan2(n_sph[..., 2], n_sph[..., 0])
    theta = jnp.arcsin(jnp.clip(n_sph[..., 1], -1.0, 1.0))
    u_sph = 1.0 - (phi + jnp.pi) / (2.0 * jnp.pi)
    v_sph = (theta + jnp.pi / 2.0) / jnp.pi

    normal, uu, vv = n_sph, u_sph, v_sph
    if scene.has_quads:
        # quad normal + parallelogram UV (src/Lib.hs:1014-1026)
        x = point - pay[:, 10:13]
        u_q = vec.dot(x, pay[:, 13:16])
        v_q = vec.dot(x, pay[:, 16:19])
        is_quad = kind == PRIM_QUAD
        normal = vec.where3(is_quad, pay[:, 19:22], normal)
        uu = jnp.where(is_quad, u_q, uu)
        vv = jnp.where(is_quad, v_q, vv)

    if scene.has_solid_box:
        # solid box: recompute the slab times with the same fp ops as the
        # sweep (bit-identical), pick the face axis, and emit the same
        # outward normal / face UV the exploded 6-rect form produces
        # (rect axes per orientation: src/Lib.hs:607-660, 1005-1026)
        bmin = pay[:, 10:13]
        bmax = pay[:, 13:16]
        inv_d = 1.0 / rd
        ta = (bmin - ro) * inv_d
        tb = (bmax - ro) * inv_d
        t3n = jnp.minimum(ta, tb)           # (R, 3) per-axis entry
        t3f = jnp.maximum(ta, tb)
        tn_b = jnp.max(t3n, axis=-1)
        use_entry = tn_b > jnp.float32(scene.t_min)
        axis = jnp.where(use_entry, jnp.argmax(t3n, axis=-1),
                         jnp.argmin(t3f, axis=-1))
        # pre-flip normal is the +axis direction for EVERY face, exactly as
        # the exploded rects' (src/Lib.hs:1005-1012 k-axis normals): the
        # cuboid's min-side faces point INTO the box, so their front flag is
        # inverted relative to "outside" - observable on dielectric boxes
        # (front picks 1/ri vs ri) and emissive back-face checks; preserved.
        n_box = (axis[:, None] == jnp.arange(3)[None, :]).astype(rd.dtype)
        # face UV, matching the rect conventions: z-face -> (x, y),
        # y-face -> (x, z), x-face -> (y, z)
        ua = jnp.where(axis == 0, 1, 0)
        va = jnp.where(axis == 2, 1, 2)
        ext = jnp.maximum(bmax - bmin, 1e-30)
        frac = (point - bmin) / ext
        u_b = jnp.take_along_axis(frac, ua[:, None], axis=-1)[:, 0]
        v_b = jnp.take_along_axis(frac, va[:, None], axis=-1)[:, 0]
        is_box = kind == PRIM_BOX
        normal = vec.where3(is_box, n_box.astype(normal.dtype), normal)
        uu = jnp.where(is_box, u_b, uu)
        vv = jnp.where(is_box, v_b, vv)

    front = vec.dot(rd, normal) < 0.0
    normal = vec.where3(front, normal, -normal)

    if scene.has_media:
        # medium hits: fixed normal (1,0,0), front face, uv = 0
        # (src/Lib.hs:1073-1079)
        is_med = kind >= PRIM_MEDIUM_SPHERE
        med_n = jnp.broadcast_to(
            jnp.array([1.0, 0.0, 0.0], normal.dtype), normal.shape
        )
        normal = vec.where3(is_med, med_n, normal)
        front = jnp.where(is_med, True, front)
        uu = jnp.where(is_med, 0.0, uu)
        vv = jnp.where(is_med, 0.0, vv)

    return HitRecord(
        hit=hit, t=t, point=point, normal=normal, front=front,
        u=uu, v=vv, mat=mat, prim=idx,
    )
