"""Fused Pallas TPU kernel for the solid-primitive intersect sweep.

The brute-force intersector's inner product (every ray x every primitive) is
the hot loop of the whole tracer.  The XLA version (ops/intersect.py) relies
on fusion to keep the (R, C) candidate-t tiles out of HBM; this kernel makes
that explicit: a grid over ray tiles keeps a (TILE_R,) running minimum in
registers/VMEM while looping over primitive blocks that live entirely in
VMEM, so HBM traffic is exactly "rays in, (t, prim) out".

Covers spheres (static + moving) and quads - the solid prefix of the
primitive table (models/compile.py orders media last).  Constant media need
per-ray RNG and are intersected by the XLA path and min-combined in
ops/intersect.intersect_scene(engine="pallas").

All math in f32; shapes are (TILE_R, PBLK) = (256, 128) - aligned to the
8x128 VPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.scene_data import PRIM_QUAD, PRIM_SPHERE, SceneData

TILE_R = 256
PBLK = 128
# Per-block kind specialization produces a kernel that faults the real
# TPU worker (interpret mode is fine); disabled until the Mosaic issue
# is understood.  The uniform kernel is the one validated on hardware.
SPECIALIZE_BLOCKS = False
BIG = 3.4e38  # sentinel (finite, so masked min/argmin stay sane)


def _kernel(ro_ref, rd_ref, rt_ref,
            kind_ref, cx_ref, cy_ref, cz_ref, vx_ref, vy_ref, vz_ref,
            t0_ref, r2_ref,
            qpx_ref, qpy_ref, qpz_ref, qnx_ref, qny_ref, qnz_ref, qd_ref,
            u1x_ref, u1y_ref, u1z_ref, u2x_ref, u2y_ref, u2z_ref,
            bbox_ref,
            out_t_ref, out_i_ref,
            bt_ref, bi_ref,
            *, block_kinds, t_min: float, has_moving: bool, cull: bool):
    rox = ro_ref[:, 0:1]; roy = ro_ref[:, 1:2]; roz = ro_ref[:, 2:3]  # (T,1)
    rdx = rd_ref[:, 0:1]; rdy = rd_ref[:, 1:2]; rdz = rd_ref[:, 2:3]
    a = rdx * rdx + rdy * rdy + rdz * rdz        # (T,1)
    inv_a = 1.0 / a
    rt = rt_ref[:, 0:1]
    if cull:
        ix = 1.0 / rdx; iy = 1.0 / rdy; iz = 1.0 / rdz

    bt_ref[:] = jnp.full((TILE_R, 1), BIG)
    bi_ref[:] = jnp.zeros((TILE_R, 1), jnp.int32)

    def block_body(pb, sph_b, quad_b):
        s = slice(pb * PBLK, (pb + 1) * PBLK)
        kind = kind_ref[0, s][None, :]           # (1,P)
        t = None
        if sph_b:
            # --- spheres: quadratic (src/Lib.hs:1081-1108) ---
            cx = cx_ref[0, s][None, :]
            cy = cy_ref[0, s][None, :]
            cz = cz_ref[0, s][None, :]
            if has_moving:
                dt = rt - t0_ref[0, s][None, :]  # (T,P)
                cx = cx + vx_ref[0, s][None, :] * dt
                cy = cy + vy_ref[0, s][None, :] * dt
                cz = cz + vz_ref[0, s][None, :] * dt
            ocx = rox - cx; ocy = roy - cy; ocz = roz - cz
            b = ocx * rdx + ocy * rdy + ocz * rdz
            c = ocx * ocx + ocy * ocy + ocz * ocz - r2_ref[0, s][None, :]
            disc = b * b - a * c
            ok = disc > 0.0
            sd = jnp.sqrt(jnp.maximum(disc, 0.0))
            t1 = (-b - sd) * inv_a
            t2 = (-b + sd) * inv_a
            t_s = jnp.where(ok & (t1 > t_min), t1,
                            jnp.where(ok & (t2 > t_min), t2, BIG))
            t = jnp.where(kind == PRIM_SPHERE, t_s, BIG)
        if quad_b:
            # --- quads: world-space parallelogram (cf. ops/intersect.py) ---
            nx = qnx_ref[0, s][None, :]
            ny = qny_ref[0, s][None, :]
            nz = qnz_ref[0, s][None, :]
            dn = rdx * nx + rdy * ny + rdz * nz
            tq = (qd_ref[0, s][None, :] - (rox * nx + roy * ny + roz * nz)) / dn
            xx = rox + tq * rdx - qpx_ref[0, s][None, :]
            xy = roy + tq * rdy - qpy_ref[0, s][None, :]
            xz = roz + tq * rdz - qpz_ref[0, s][None, :]
            uq = xx * u1x_ref[0, s][None, :] + xy * u1y_ref[0, s][None, :] \
                + xz * u1z_ref[0, s][None, :]
            vq = xx * u2x_ref[0, s][None, :] + xy * u2y_ref[0, s][None, :] \
                + xz * u2z_ref[0, s][None, :]
            okq = (tq > t_min) & (uq >= 0.0) & (uq <= 1.0) \
                & (vq >= 0.0) & (vq <= 1.0)
            tq = jnp.where((kind == PRIM_QUAD) & okq, tq, BIG)
            t = tq if t is None else jnp.where(kind == PRIM_QUAD, tq, t)
        if t is None:  # pad-only block
            return

        bt = jnp.min(t, axis=1, keepdims=True)             # (T,1)
        bi = jnp.argmin(t, axis=1, keepdims=True).astype(jnp.int32) + pb * PBLK
        prev_t = bt_ref[:]
        closer = bt < prev_t
        bt_ref[:] = jnp.where(closer, bt, prev_t)
        bi_ref[:] = jnp.where(closer, bi, bi_ref[:])

    for pb, (sph_b, quad_b) in enumerate(block_kinds):
        if not (sph_b or quad_b):
            continue
        if not cull:
            block_body(pb, sph_b, quad_b)
            continue
        # block-AABB cull (Morton-ordered prims keep blocks tight): run the
        # 128-prim math only when some ray in the tile enters the block's
        # box closer than its current best (slack covers f32 slab-vs-
        # primitive rounding; prim hits lie inside the box, so skipping is
        # exact - cf. the chunk cull in ops/intersect.py)
        tx0 = (bbox_ref[0, 6 * pb + 0] - rox) * ix
        tx1 = (bbox_ref[0, 6 * pb + 3] - rox) * ix
        ty0 = (bbox_ref[0, 6 * pb + 1] - roy) * iy
        ty1 = (bbox_ref[0, 6 * pb + 4] - roy) * iy
        tz0 = (bbox_ref[0, 6 * pb + 2] - roz) * iz
        tz1 = (bbox_ref[0, 6 * pb + 5] - roz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                     jnp.minimum(ty0, ty1)),
                         jnp.minimum(tz0, tz1))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                     jnp.maximum(ty0, ty1)),
                         jnp.maximum(tz0, tz1))
        slack = 1e-4 * (1.0 + jnp.abs(tn))
        needed = jnp.any(
            (tn - slack <= jnp.minimum(tf, bt_ref[:])) & (tf > t_min)
        )

        @pl.when(needed)
        def _():
            block_body(pb, sph_b, quad_b)

    out_t_ref[:, 0] = bt_ref[:, 0]
    out_i_ref[:, 0] = bi_ref[:, 0]


def _pack_solids(scene: SceneData):
    """Solid prims padded to a PBLK multiple, split into flat (1, P) fields."""
    p = scene.prims
    n = scene.n_solid
    pad = (-n) % PBLK or (PBLK if n == 0 else 0)
    P = n + pad

    def f1(a, fill=0.0):
        return jnp.pad(a[:n], (0, pad), constant_values=fill)[None]

    def f3(a, i):
        return jnp.pad(a[:n, i], (0, pad))[None]

    fields = (
        f1(p.kind.astype(jnp.int32), PRIM_SPHERE),
        f3(p.center, 0), f3(p.center, 1), f3(p.center, 2),
        f3(p.velocity, 0), f3(p.velocity, 1), f3(p.velocity, 2),
        f1(p.time0),
        f1(p.radius ** 2, 0.0),   # padded rows: radius 0 never hits
        f3(p.quad_p0, 0), f3(p.quad_p0, 1), f3(p.quad_p0, 2),
        f3(p.quad_n, 0), f3(p.quad_n, 1), f3(p.quad_n, 2),
        f1(p.quad_d),
        f3(p.quad_inv1, 0), f3(p.quad_inv1, 1), f3(p.quad_inv1, 2),
        f3(p.quad_inv2, 0), f3(p.quad_inv2, 1), f3(p.quad_inv2, 2),
    )
    return fields, P


def _block_bounds(scene: SceneData, P: int) -> jnp.ndarray:
    """(1, 6*nblk) per-PBLK-block AABBs [lox loy loz hix hiy hiz]*nblk.

    Conservative over shutter t in [0, 1] for moving spheres (every
    reference camera uses t0=0, t1=1 - Scenes.hs cameras); padded rows are
    excluded.  O(N) jnp math - fused into the wave program, negligible next
    to the O(R*N) sweep.
    """
    p = scene.prims
    n = scene.n_solid
    pad = P - n

    def padto(a, fill):
        return jnp.pad(a[:n], [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                       constant_values=fill)

    kind = padto(p.kind.astype(jnp.int32), -1)
    c0 = p.center[:n] + p.velocity[:n] * (0.0 - p.time0[:n])[:, None]
    c1 = p.center[:n] + p.velocity[:n] * (1.0 - p.time0[:n])[:, None]
    r = p.radius[:n][:, None]
    lo_s = padto(jnp.minimum(c0, c1) - r, BIG)
    hi_s = padto(jnp.maximum(c0, c1) + r, -BIG)
    q0 = p.quad_p0[:n]
    corners = jnp.stack([q0, q0 + p.quad_e1[:n], q0 + p.quad_e2[:n],
                         q0 + p.quad_e1[:n] + p.quad_e2[:n]])
    lo_q = padto(corners.min(0), BIG)
    hi_q = padto(corners.max(0), -BIG)
    is_q = (kind == PRIM_QUAD)[:, None]
    is_s = (kind == PRIM_SPHERE)[:, None]
    lo = jnp.where(is_q, lo_q, jnp.where(is_s, lo_s, BIG))
    hi = jnp.where(is_q, hi_q, jnp.where(is_s, hi_s, -BIG))
    lo = lo.reshape(-1, PBLK, 3).min(axis=1)   # (nblk, 3)
    hi = hi.reshape(-1, PBLK, 3).max(axis=1)
    return jnp.concatenate([lo, hi], axis=1).reshape(1, -1)


def intersect_solids_pallas(scene: SceneData, ro, rd, rt,
                            interpret: bool | None = None,
                            cull: bool | None = None):
    """(best_t, best_i) of each ray against the solid prims, via Pallas.

    ``interpret`` defaults to True on CPU (tests) and False on TPU.
    ``cull=True`` skips whole 128-prim blocks per ray tile via block-AABB
    slab tests.  Default OFF: measured on real TPU (PERFLOG.md round 2),
    a 256-ray tile of bounced (incoherent) rays virtually never agrees to
    skip a block, so the slab tests cost ~2x the sweep on secondary
    bounces (30.9 ms vs 16.6 ms at 160k rays x 3409 prims) and even
    primary camera tiles lose slightly (17.3 vs 16.2 ms).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    R = ro.shape[0]
    pad_r = (-R) % TILE_R
    if pad_r:
        ro = jnp.pad(ro, ((0, pad_r), (0, 0)))
        rd = jnp.pad(rd, ((0, pad_r), (0, 0)), constant_values=1.0)
        rt = jnp.pad(rt, (0, pad_r))
    Rp = R + pad_r

    fields, P = _pack_solids(scene)
    if cull is None:
        cull = False
    grid = (Rp // TILE_R,)
    # per-block kind flags: prims are sorted spheres | quads (compile.py),
    # so each 128-block runs only the math it needs
    if SPECIALIZE_BLOCKS:
        block_kinds = tuple(
            (pb * PBLK < scene.n_sphere,
             scene.has_quads and (pb + 1) * PBLK > scene.n_sphere
             and pb * PBLK < scene.n_solid)
            for pb in range(P // PBLK)
        )
    else:
        block_kinds = tuple(
            (scene.has_spheres, scene.has_quads) for _ in range(P // PBLK)
        )
    kern = partial(
        _kernel,
        block_kinds=block_kinds,
        t_min=float(scene.t_min),
        has_moving=scene.has_moving,
        cull=cull,
    )
    ray_spec = pl.BlockSpec((TILE_R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rt_spec = pl.BlockSpec((TILE_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    prim_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # full array
    bbox_spec = pl.BlockSpec(memory_space=pltpu.SMEM)  # per-block scalars
    bbox = _block_bounds(scene, P)
    out_t, out_i = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[ray_spec, ray_spec, rt_spec] + [prim_spec] * len(fields)
        + [bbox_spec],
        out_specs=(
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Rp, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE_R, 1), jnp.float32),
            pltpu.VMEM((TILE_R, 1), jnp.int32),
        ],
        interpret=interpret,
    )(ro, rd, rt[:, None], *fields, bbox)
    best_t = jnp.where(out_t[:R, 0] >= BIG, jnp.inf, out_t[:R, 0])
    return best_t, out_i[:R, 0]
