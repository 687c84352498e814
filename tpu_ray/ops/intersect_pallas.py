"""Fused Pallas TPU kernels for the solid-primitive intersect sweep.

The brute-force intersector's inner product (every ray x every primitive) is
the hot loop of the whole tracer.  The XLA version (ops/intersect.py) relies
on fusion to keep the (R, C) candidate-t tiles out of HBM; these kernels make
that explicit: a grid over ray tiles keeps a (TILE_R,) running minimum in
VMEM scratch while looping over primitive blocks that live entirely in VMEM,
so HBM traffic is exactly "rays in, (t, prim) out".

The scene compiler sorts solids into kind-homogeneous ranges (spheres |
boxes | quads, models/compile.py), and each range runs as its OWN
pallas_call with a kernel specialized to that kind.  This replaces round 1's
single uniform kernel, which computed sphere AND quad math for every
128-prim block; per-kind launches run only the math each block needs, with
no per-block branching inside the kernel.  (Round 1 tried ``pl.when``-
guarded per-block specialization inside one uniform kernel; that variant
faulted the real TPU worker while interpret mode passed - a Mosaic issue
never root-caused; the repro was tools/repro_specialize.py, removed in
commit c8830a6.  Do NOT reintroduce per-block pl.when specialization
without re-validating on hardware.  The unrelated big-scene environment
flakiness at >150k-lane dispatches is documented separately in PERFLOG.md.
Kind-sorted ranges made the question moot: per-kind launches get the same
math savings with zero in-kernel branching.)

Constant media need per-ray RNG and are intersected by the XLA path and
min-combined in ops/intersect.intersect_scene(engine="pallas").

All math in f32; shapes are (TILE_R, PBLK) = (256, 128) - aligned to the
8x128 VPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.scene_data import SceneData

TILE_R = 256
PBLK = 128
BIG = 3.4e38  # sentinel (finite, so masked min/argmin stay sane)

# Static-sphere sweep on the MXU (see _sphere_mxu_kernel).  MEASURED LOSS:
# 32.2 vs 13.6 ms/sweep on book1's 485 static spheres at 983k rays
# (tools/bench_mxu_sweep.py, TPU v5e, PERFLOG.md round 2) - the quadratic's
# cross terms are a K=3 contraction, so the MXU charges a full 128-deep
# pass (x6 for f32 HIGHEST) for 3 MACs of useful work while the VPU does
# them in-register.  Kept behind TPU_RAY_SWEEP_MXU=1 as a documented
# negative result; never auto-selected.
def _use_mxu_spheres(n: int, interpret: bool) -> bool:
    import os

    return os.environ.get("TPU_RAY_SWEEP_MXU", "0") == "1"


def _sphere_kernel(ro_ref, rd_ref, rt_ref,
                   cx_ref, cy_ref, cz_ref, vx_ref, vy_ref, vz_ref,
                   t0_ref, r2_ref,
                   *rest,
                   n_blocks: int, t_min: float, has_moving: bool,
                   cull: bool = False):
    """Sphere quadratic sweep (src/Lib.hs:1081-1108); moving spheres lerp
    their center by ray time.  Padded rows have radius^2 = 0: never hit.

    With ``cull`` a per-(tile, block) SMEM mask (computed by the XLA-side
    slab test in _needed_mask, exact by the block-AABB containment
    argument) gates each 128-prim block behind a scalar pl.when - no
    vector slab work in-kernel, unlike the round-2 in-kernel cull that
    measured 2x overhead (PERFLOG.md)."""
    if cull:
        needed_ref, out_t_ref, out_i_ref, bt_ref, bi_ref = rest
    else:
        out_t_ref, out_i_ref, bt_ref, bi_ref = rest
    rox = ro_ref[:, 0:1]; roy = ro_ref[:, 1:2]; roz = ro_ref[:, 2:3]  # (T,1)
    rdx = rd_ref[:, 0:1]; rdy = rd_ref[:, 1:2]; rdz = rd_ref[:, 2:3]
    a = rdx * rdx + rdy * rdy + rdz * rdz
    inv_a = 1.0 / a
    rt = rt_ref[:, 0:1]
    bt_ref[:] = jnp.full((TILE_R, 1), BIG)
    bi_ref[:] = jnp.zeros((TILE_R, 1), jnp.int32)

    def do_block(pb):
        s = slice(pb * PBLK, (pb + 1) * PBLK)
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
        t = jnp.where(ok & (t1 > t_min), t1,
                      jnp.where(ok & (t2 > t_min), t2, BIG))
        bt = jnp.min(t, axis=1, keepdims=True)
        bi = jnp.argmin(t, axis=1, keepdims=True).astype(jnp.int32) + pb * PBLK
        prev = bt_ref[:]
        closer = bt < prev
        bt_ref[:] = jnp.where(closer, bt, prev)
        bi_ref[:] = jnp.where(closer, bi, bi_ref[:])

    if cull:
        tile = pl.program_id(0)
    for pb in range(n_blocks):
        if cull:
            @pl.when(needed_ref[0, tile * n_blocks + pb] > 0)
            def _(pb=pb):
                do_block(pb)
        else:
            do_block(pb)
    out_t_ref[:, 0] = bt_ref[:, 0]
    out_i_ref[:, 0] = bi_ref[:, 0]


def _sphere_mxu_kernel(ro_ref, rd_ref, rt_ref, dm_ref, om_ref,
                       c1_ref, c2_ref,
                       out_t_ref, out_i_ref, bt_ref, bi_ref,
                       *, n_blocks: int, t_min: float):
    """Static-sphere sweep with the quadratic's cross terms on the MXU.

    Expands the classic per-pair form (src/Lib.hs:1081-1108)

        oc = o - c;  b = oc.d;  c = |oc|^2 - r^2

    around the range centroid m (o' = o - m, c' = c - m):

        b  = o'.d - (c'.d)                       <- M1: d  @ [c']
        cc = |o'|^2 + (-2 o'.c' + |c'|^2 - r^2)  <- M2: o' @ [-2c' ; k']

    The two (T,8)@(8,P) matmuls run on the MXU (f32, HIGHEST precision),
    replacing ~14 of the ~30 VPU ops per (ray, sphere) pair.  MEASURED
    2.4x SLOWER than the classic kernel on hardware (see the module-level
    note); kept as an opt-in negative result (TPU_RAY_SWEEP_MXU=1).  The
    expansion also reassociates the fp math, so t agrees with the classic
    kernel only to ~1e-5 relative (grazing hits ~1e-3) - the same
    conditioning as round 1's chunk-centred XLA "mxu" engine (PERFLOG.md).

    Input packing (host side, _sweep_sphere_mxu):
      dm (R,8): [dx, dy, dz, o'.d, 0...]  (col 3 rides along: c1 row 3 = 0)
      om (R,8): [o'x, o'y, o'z, 1, |o'|^2, 0...]  (c2 rows 4-7 = 0)
      c1 (8,P): rows [c'x, c'y, c'z, 0...]
      c2 (8,P): rows [-2c'x, -2c'y, -2c'z, k', 0...], k' = |c'|^2 - r^2
    Padded prim columns are all-zero: cc = |o'|^2 makes disc = -(perp)^2
    <= 0, so they never hit (same guarantee as the classic pad r^2 = 0).
    """
    rdx = rd_ref[:, 0:1]; rdy = rd_ref[:, 1:2]; rdz = rd_ref[:, 2:3]
    a = rdx * rdx + rdy * rdy + rdz * rdz
    inv_a = 1.0 / a
    od = dm_ref[:, 3:4]
    oo = om_ref[:, 4:5]
    dm = dm_ref[:]
    om = om_ref[:]
    dn = (((1,), (0,)), ((), ()))
    bt_ref[:] = jnp.full((TILE_R, 1), BIG)
    bi_ref[:] = jnp.zeros((TILE_R, 1), jnp.int32)
    for pb in range(n_blocks):
        s = slice(pb * PBLK, (pb + 1) * PBLK)
        cd = jax.lax.dot_general(dm, c1_ref[:, s], dn,
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
        ccp = jax.lax.dot_general(om, c2_ref[:, s], dn,
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
        b = od - cd
        c = oo + ccp
        disc = b * b - a * c
        ok = disc > 0.0
        sd = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (-b - sd) * inv_a
        t2 = (-b + sd) * inv_a
        t = jnp.where(ok & (t1 > t_min), t1,
                      jnp.where(ok & (t2 > t_min), t2, BIG))
        bt = jnp.min(t, axis=1, keepdims=True)
        bi = jnp.argmin(t, axis=1, keepdims=True).astype(jnp.int32) + pb * PBLK
        prev = bt_ref[:]
        closer = bt < prev
        bt_ref[:] = jnp.where(closer, bt, prev)
        bi_ref[:] = jnp.where(closer, bi, bi_ref[:])
    out_t_ref[:, 0] = bt_ref[:, 0]
    out_i_ref[:, 0] = bi_ref[:, 0]


def _sweep_sphere_mxu(scene: SceneData, ro, rd, rt, lo: int, hi: int,
                      interpret: bool):
    """(bt, bi) over the static-sphere rows [lo, hi) via the MXU kernel."""
    p = scene.prims
    n = hi - lo
    pad = (-n) % PBLK
    P = n + pad
    R = ro.shape[0]

    c = jax.lax.slice_in_dim(p.center, lo, hi, axis=0)      # (n, 3)
    r2 = jax.lax.slice_in_dim(p.radius, lo, hi, axis=0) ** 2
    m = jnp.mean(c, axis=0)                                  # range centroid
    cs = c - m
    k = jnp.sum(cs * cs, axis=1) - r2
    zpad = ((0, pad),)
    c1 = jnp.zeros((8, P), jnp.float32)
    c1 = c1.at[0:3, :].set(jnp.pad(cs.T, ((0, 0),) + zpad))
    c2 = jnp.zeros((8, P), jnp.float32)
    c2 = c2.at[0:3, :].set(jnp.pad(-2.0 * cs.T, ((0, 0),) + zpad))
    c2 = c2.at[3, :].set(jnp.pad(k, zpad[0]))

    os_ = ro - m[None, :]
    dm = jnp.zeros((R, 8), jnp.float32)
    dm = dm.at[:, 0:3].set(rd)
    dm = dm.at[:, 3].set(jnp.sum(os_ * rd, axis=1))
    om = jnp.zeros((R, 8), jnp.float32)
    om = om.at[:, 0:3].set(os_)
    om = om.at[:, 3].set(1.0)
    om = om.at[:, 4].set(jnp.sum(os_ * os_, axis=1))

    kern = partial(_sphere_mxu_kernel, n_blocks=P // PBLK,
                   t_min=float(scene.t_min))
    ray_spec = pl.BlockSpec((TILE_R, 3), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    rt_spec = pl.BlockSpec((TILE_R, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    aug_spec = pl.BlockSpec((TILE_R, 8), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    prim_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_t, out_i = pl.pallas_call(
        kern,
        grid=(R // TILE_R,),
        in_specs=[ray_spec, ray_spec, rt_spec, aug_spec, aug_spec,
                  prim_spec, prim_spec],
        out_specs=(
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE_R, 1), jnp.float32),
            pltpu.VMEM((TILE_R, 1), jnp.int32),
        ],
        interpret=interpret,
    )(ro, rd, rt, dm, om, c1, c2)
    return out_t[:, 0], out_i[:, 0] + lo


def _quad_kernel(ro_ref, rd_ref, rt_ref,
                 qpx_ref, qpy_ref, qpz_ref, qnx_ref, qny_ref, qnz_ref, qd_ref,
                 u1x_ref, u1y_ref, u1z_ref, u2x_ref, u2y_ref, u2z_ref,
                 *rest,
                 n_blocks: int, t_min: float, cull: bool = False):
    """World-space parallelogram sweep (generalizes src/Lib.hs:1005-1028).
    Padded rows have n = 0: tq = 0/0 = NaN, every comparison False."""
    if cull:
        needed_ref, out_t_ref, out_i_ref, bt_ref, bi_ref = rest
    else:
        out_t_ref, out_i_ref, bt_ref, bi_ref = rest
    rox = ro_ref[:, 0:1]; roy = ro_ref[:, 1:2]; roz = ro_ref[:, 2:3]
    rdx = rd_ref[:, 0:1]; rdy = rd_ref[:, 1:2]; rdz = rd_ref[:, 2:3]
    bt_ref[:] = jnp.full((TILE_R, 1), BIG)
    bi_ref[:] = jnp.zeros((TILE_R, 1), jnp.int32)

    def do_block(pb):
        s = slice(pb * PBLK, (pb + 1) * PBLK)
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
        t = jnp.where(okq, tq, BIG)
        bt = jnp.min(t, axis=1, keepdims=True)
        bi = jnp.argmin(t, axis=1, keepdims=True).astype(jnp.int32) + pb * PBLK
        prev = bt_ref[:]
        closer = bt < prev
        bt_ref[:] = jnp.where(closer, bt, prev)
        bi_ref[:] = jnp.where(closer, bi, bi_ref[:])

    if cull:
        tile = pl.program_id(0)
    for pb in range(n_blocks):
        if cull:
            @pl.when(needed_ref[0, tile * n_blocks + pb] > 0)
            def _(pb=pb):
                do_block(pb)
        else:
            do_block(pb)
    out_t_ref[:, 0] = bt_ref[:, 0]
    out_i_ref[:, 0] = bi_ref[:, 0]


def _box_kernel(ro_ref, rd_ref, rt_ref,
                x0_ref, y0_ref, z0_ref, x1_ref, y1_ref, z1_ref,
                *rest,
                n_blocks: int, t_min: float, cull: bool = False):
    """Axis-aligned solid-box slab sweep: one test per box instead of the
    reference cuboid's 6 rect tests (src/Lib.hs:594-605, 989-1004).
    Padded rows are degenerate point boxes (min == max): after the per-
    axis min/max normalization tn >= tf, so the strict tf > tn never
    passes.  (Inverted min > max padding does NOT miss - normalization
    turns it into a real box.)"""
    if cull:
        needed_ref, out_t_ref, out_i_ref, bt_ref, bi_ref = rest
    else:
        out_t_ref, out_i_ref, bt_ref, bi_ref = rest
    rox = ro_ref[:, 0:1]; roy = ro_ref[:, 1:2]; roz = ro_ref[:, 2:3]
    rdx = rd_ref[:, 0:1]; rdy = rd_ref[:, 1:2]; rdz = rd_ref[:, 2:3]
    ix = 1.0 / rdx; iy = 1.0 / rdy; iz = 1.0 / rdz
    bt_ref[:] = jnp.full((TILE_R, 1), BIG)
    bi_ref[:] = jnp.zeros((TILE_R, 1), jnp.int32)

    def do_block(pb):
        s = slice(pb * PBLK, (pb + 1) * PBLK)
        tax = (x0_ref[0, s][None, :] - rox) * ix
        tbx = (x1_ref[0, s][None, :] - rox) * ix
        tay = (y0_ref[0, s][None, :] - roy) * iy
        tby = (y1_ref[0, s][None, :] - roy) * iy
        taz = (z0_ref[0, s][None, :] - roz) * iz
        tbz = (z1_ref[0, s][None, :] - roz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(tax, tbx),
                                     jnp.minimum(tay, tby)),
                         jnp.minimum(taz, tbz))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(tax, tbx),
                                     jnp.maximum(tay, tby)),
                         jnp.maximum(taz, tbz))
        ok = tf > tn
        t = jnp.where(ok & (tn > t_min), tn,
                      jnp.where(ok & (tf > t_min), tf, BIG))
        bt = jnp.min(t, axis=1, keepdims=True)
        bi = jnp.argmin(t, axis=1, keepdims=True).astype(jnp.int32) + pb * PBLK
        prev = bt_ref[:]
        closer = bt < prev
        bt_ref[:] = jnp.where(closer, bt, prev)
        bi_ref[:] = jnp.where(closer, bi, bi_ref[:])

    if cull:
        tile = pl.program_id(0)
    for pb in range(n_blocks):
        if cull:
            @pl.when(needed_ref[0, tile * n_blocks + pb] > 0)
            def _(pb=pb):
                do_block(pb)
        else:
            do_block(pb)
    out_t_ref[:, 0] = bt_ref[:, 0]
    out_i_ref[:, 0] = bi_ref[:, 0]


def _pad1(a, n, pad, fill=0.0):
    return jnp.pad(a[:n], (0, pad), constant_values=fill)[None]


def _range_aabbs(scene: SceneData, lo: int, hi: int, flavor: str):
    """(n, 3) conservative per-prim AABBs of rows [lo, hi); motion union
    over t in [0, 1] for moving spheres (cf. the chunk AABB in
    ops/intersect.py and the reference's boundingBox, src/Lib.hs:905-927)."""
    p = scene.prims
    take = lambda a: jax.lax.slice_in_dim(a, lo, hi, axis=0)
    if flavor == "sphere":
        c = take(p.center)
        v = take(p.velocity)
        t0 = take(p.time0)[:, None]
        r = take(p.radius)[:, None]
        c0 = c - v * t0
        c1 = c + v * (1.0 - t0)
        return jnp.minimum(c0, c1) - r, jnp.maximum(c0, c1) + r
    if flavor == "box":
        return take(p.box_min), take(p.box_max)
    p0 = take(p.quad_p0)
    e1 = take(p.quad_e1)
    e2 = take(p.quad_e2)
    cs = jnp.stack([p0, p0 + e1, p0 + e2, p0 + e1 + e2])
    return cs.min(0), cs.max(0)


def _block_aabbs(alo, ahi, pad: int):
    """Union the per-prim AABBs into per-128-block AABBs (B, 3)."""
    alo = jnp.pad(alo, ((0, pad), (0, 0)), constant_values=jnp.inf)
    ahi = jnp.pad(ahi, ((0, pad), (0, 0)), constant_values=-jnp.inf)
    B = alo.shape[0] // PBLK
    return (alo.reshape(B, PBLK, 3).min(1), ahi.reshape(B, PBLK, 3).max(1))


def _needed_mask(ro, rd, blo, bhi, t_min: float):
    """(T, B) int32: does ANY ray in tile t enter block b's AABB past
    t_min?  Skipping is exact: a primitive hit lies inside its block's
    box, so it lies within [tn, tf] of the box slab (slack covers f32
    slab-vs-primitive rounding; same rule as ops/intersect.py's chunk
    cull).  Zero direction components are nudged to keep the slab finite
    (conservative: a huge |t| never excludes a block wrongly)."""
    safe = jnp.where(jnp.abs(rd) < 1e-30,
                     jnp.where(rd < 0, -1e-30, 1e-30), rd)
    inv = 1.0 / safe
    R = ro.shape[0]
    B = blo.shape[0]
    tn = jnp.full((R, B), -jnp.inf)
    tf = jnp.full((R, B), jnp.inf)
    for ax in range(3):
        t0 = (blo[None, :, ax] - ro[:, ax:ax + 1]) * inv[:, ax:ax + 1]
        t1 = (bhi[None, :, ax] - ro[:, ax:ax + 1]) * inv[:, ax:ax + 1]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    slack = 1e-4 * (1.0 + jnp.abs(tn))
    need = (tn - slack <= tf) & (tf > t_min)
    return need.reshape(R // TILE_R, TILE_R, B).any(1).astype(jnp.int32)


def _spread10(v):
    """Interleave 10 bits with two zero bits each (Morton component)."""
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def _sort_key(scene: SceneData, ro, rd):
    """Ray-coherence sort key: 3-bit direction octant major, 29-bit Morton
    code of the origin within the solid-scene AABB minor.  Measured the
    best tile-coherence key on real bounced pool waves
    (tools/study_sort_cull.py: next-week block-skip 1.6% unsorted ->
    38-40% sorted)."""
    los, his = [], []
    n_sb = scene.n_sphere + scene.n_box
    for lo, hi, flavor in ((0, scene.n_sphere, "sphere"),
                           (scene.n_sphere, n_sb, "box"),
                           (n_sb, scene.n_solid, "quad")):
        if hi <= lo:
            continue
        alo, ahi = _range_aabbs(scene, lo, hi, flavor)
        los.append(alo.min(0))
        his.append(ahi.max(0))
    wlo = jnp.stack(los).min(0)
    whi = jnp.stack(his).max(0)
    oct_ = ((rd[:, 0] < 0).astype(jnp.uint32) * 4
            + (rd[:, 1] < 0).astype(jnp.uint32) * 2
            + (rd[:, 2] < 0).astype(jnp.uint32))
    q = jnp.clip((ro - wlo) / jnp.maximum(whi - wlo, 1e-9), 0.0, 0.999999)
    q = (q * 1024.0).astype(jnp.uint32)
    m = ((_spread10(q[:, 0]) << 2) | (_spread10(q[:, 1]) << 1)
         | _spread10(q[:, 2]))
    return (oct_ << 29) | (m >> 1)


def _tile_lists(ro, rd, blo, bhi, t_min: float):
    """Front-to-back compacted block lists per 256-ray tile.

    Returns (cnt (T, 1) int32, lst (T, B) int32): lst[t, :cnt[t]] are the
    block ids some ray in tile t can enter (same exact slab rule as
    _needed_mask), ordered by the tile's closest entry distance so the
    kernel accumulates near-to-far."""
    safe = jnp.where(jnp.abs(rd) < 1e-30,
                     jnp.where(rd < 0, -1e-30, 1e-30), rd)
    inv = 1.0 / safe
    R = ro.shape[0]
    B = blo.shape[0]
    tn = jnp.full((R, B), -jnp.inf)
    tf = jnp.full((R, B), jnp.inf)
    for ax in range(3):
        t0 = (blo[None, :, ax] - ro[:, ax:ax + 1]) * inv[:, ax:ax + 1]
        t1 = (bhi[None, :, ax] - ro[:, ax:ax + 1]) * inv[:, ax:ax + 1]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    slack = 1e-4 * (1.0 + jnp.abs(tn))
    need = (tn - slack <= tf) & (tf > t_min)
    T = R // TILE_R
    needT = need.reshape(T, TILE_R, B).any(1)
    keyT = jnp.where(need, jnp.maximum(tn, 0.0), jnp.inf) \
        .reshape(T, TILE_R, B).min(1)
    order = jnp.argsort(jnp.where(needT, keyT, jnp.inf), axis=1)
    return (needT.sum(1, dtype=jnp.int32)[:, None],
            order.astype(jnp.int32))


def _pack_blocks(fields, rows: int):
    """Stack per-prim (1, P) fields into a block-major (B*rows, PBLK)
    array: rows [b*rows, (b+1)*rows) hold block b's fields, so one
    ALIGNED dynamic slice fetches a whole block (rows is a multiple of 8,
    the VMEM sublane tile)."""
    P = fields[0].shape[1]
    stk = jnp.concatenate(
        list(fields) + [jnp.zeros((rows - len(fields), P), jnp.float32)],
        axis=0)                                     # (rows, P)
    return (stk.reshape(rows, P // PBLK, PBLK)
            .transpose(1, 0, 2).reshape(-1, PBLK))  # (B*rows, PBLK)


def _compact_kernel(ro_ref, rd_ref, rt_ref, pk_ref, cnt_ref, lst_ref,
                    out_t_ref, out_i_ref, bt_ref, bi_ref,
                    *, flavor: str, rows: int, t_min: float,
                    has_moving: bool, n_b: int):
    """Kind-specialized sweep over a per-tile compacted block list.

    The culling decision is fully precomputed (XLA slab test ->
    _tile_lists in SMEM); the kernel just fori_loops over the tile's
    needed blocks, fetching each block's packed fields with one aligned
    (rows, 128) dynamic slice.  No per-block predication - the round-2
    in-kernel cull's 2x pl.when overhead (PERFLOG.md) doesn't apply.

    cnt/lst arrive FLATTENED to (1, T) / (1, T*B) SMEM residents: a
    (T, 1)/(T, B) shape pads every row's minor dim to 128 lanes in SMEM
    (1250 tiles -> 628K per operand) and OOMs the 1M smem budget at
    production lane counts; one long row pads once.  (A (1, B) per-tile
    SMEM window is not an option - Mosaic's last-two-dims rule.)"""
    tile = pl.program_id(0)
    rox = ro_ref[:, 0:1]; roy = ro_ref[:, 1:2]; roz = ro_ref[:, 2:3]
    rdx = rd_ref[:, 0:1]; rdy = rd_ref[:, 1:2]; rdz = rd_ref[:, 2:3]
    if flavor == "sphere":
        a = rdx * rdx + rdy * rdy + rdz * rdz
        inv_a = 1.0 / a
        rt = rt_ref[:, 0:1]
    elif flavor == "box":
        ix = 1.0 / rdx; iy = 1.0 / rdy; iz = 1.0 / rdz
    bt_ref[:] = jnp.full((TILE_R, 1), BIG)
    bi_ref[:] = jnp.zeros((TILE_R, 1), jnp.int32)

    def body(j, carry):
        pb = lst_ref[0, tile * n_b + j]
        blk = pk_ref[pl.ds(pb * rows, rows), :]     # (rows, 128)
        if flavor == "sphere":
            cx = blk[0:1, :]; cy = blk[1:2, :]; cz = blk[2:3, :]
            if has_moving:
                dt = rt - blk[6:7, :]
                cx = cx + blk[3:4, :] * dt
                cy = cy + blk[4:5, :] * dt
                cz = cz + blk[5:6, :] * dt
            ocx = rox - cx; ocy = roy - cy; ocz = roz - cz
            b = ocx * rdx + ocy * rdy + ocz * rdz
            c = ocx * ocx + ocy * ocy + ocz * ocz - blk[7:8, :]
            disc = b * b - a * c
            ok = disc > 0.0
            sd = jnp.sqrt(jnp.maximum(disc, 0.0))
            t1 = (-b - sd) * inv_a
            t2 = (-b + sd) * inv_a
            t = jnp.where(ok & (t1 > t_min), t1,
                          jnp.where(ok & (t2 > t_min), t2, BIG))
        elif flavor == "box":
            tax = (blk[0:1, :] - rox) * ix
            tbx = (blk[3:4, :] - rox) * ix
            tay = (blk[1:2, :] - roy) * iy
            tby = (blk[4:5, :] - roy) * iy
            taz = (blk[2:3, :] - roz) * iz
            tbz = (blk[5:6, :] - roz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(tax, tbx),
                                         jnp.minimum(tay, tby)),
                             jnp.minimum(taz, tbz))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(tax, tbx),
                                         jnp.maximum(tay, tby)),
                             jnp.maximum(taz, tbz))
            ok = tf > tn
            t = jnp.where(ok & (tn > t_min), tn,
                          jnp.where(ok & (tf > t_min), tf, BIG))
        else:  # quad
            nx = blk[3:4, :]; ny = blk[4:5, :]; nz = blk[5:6, :]
            dn = rdx * nx + rdy * ny + rdz * nz
            tq = (blk[6:7, :] - (rox * nx + roy * ny + roz * nz)) / dn
            xx = rox + tq * rdx - blk[0:1, :]
            xy = roy + tq * rdy - blk[1:2, :]
            xz = roz + tq * rdz - blk[2:3, :]
            uq = xx * blk[7:8, :] + xy * blk[8:9, :] + xz * blk[9:10, :]
            vq = xx * blk[10:11, :] + xy * blk[11:12, :] + xz * blk[12:13, :]
            okq = (tq > t_min) & (uq >= 0.0) & (uq <= 1.0) \
                & (vq >= 0.0) & (vq <= 1.0)
            t = jnp.where(okq, tq, BIG)
        bt = jnp.min(t, axis=1, keepdims=True)
        bi = (jnp.argmin(t, axis=1, keepdims=True).astype(jnp.int32)
              + pb * PBLK)
        prev = bt_ref[:]
        prev_i = bi_ref[:]
        # lower-prim-id tie-break restores the plain kernel's ascending
        # visit order semantics under front-to-back visiting (exact f32
        # cross-block t ties)
        closer = (bt < prev) | ((bt == prev) & (bi < prev_i))
        bt_ref[:] = jnp.where(closer, bt, prev)
        bi_ref[:] = jnp.where(closer, bi, prev_i)
        return carry

    jax.lax.fori_loop(0, cnt_ref[0, tile], body, 0)
    out_t_ref[:, 0] = bt_ref[:, 0]
    out_i_ref[:, 0] = bi_ref[:, 0]


def _sweep_range_compact(scene: SceneData, ro, rd, rt, lo: int, hi: int,
                         flavor: str, interpret: bool,
                         moving: bool = False):
    """Compacted-list variant of _sweep_range: per-tile front-to-back
    block lists replace the dense block loop.  Bit-exact with the plain
    sweep: every surviving (ray, prim) pair runs the identical math, a
    skipped block cannot contain the winner (AABB containment), and the
    in-kernel lower-prim-id tie-break reproduces the plain kernel's
    ascending visit order on exact f32 cross-block t ties."""
    p = scene.prims
    n = hi - lo
    pad = (-n) % PBLK
    P = n + pad
    take = lambda a: jax.lax.slice_in_dim(a, lo, hi, axis=0)

    if flavor == "sphere":
        fields = (
            _pad1(take(p.center[:, 0]), n, pad),
            _pad1(take(p.center[:, 1]), n, pad),
            _pad1(take(p.center[:, 2]), n, pad),
            _pad1(take(p.velocity[:, 0]), n, pad),
            _pad1(take(p.velocity[:, 1]), n, pad),
            _pad1(take(p.velocity[:, 2]), n, pad),
            _pad1(take(p.time0), n, pad),
            _pad1(take(p.radius) ** 2, n, pad, 0.0),
        )
        rows = 8
    elif flavor == "box":
        fields = (
            _pad1(take(p.box_min[:, 0]), n, pad),  # pad: point box, see below
            _pad1(take(p.box_min[:, 1]), n, pad),
            _pad1(take(p.box_min[:, 2]), n, pad),
            _pad1(take(p.box_max[:, 0]), n, pad),
            _pad1(take(p.box_max[:, 1]), n, pad),
            _pad1(take(p.box_max[:, 2]), n, pad),
        )
        rows = 8
    else:  # quad
        fields = (
            _pad1(take(p.quad_p0[:, 0]), n, pad),
            _pad1(take(p.quad_p0[:, 1]), n, pad),
            _pad1(take(p.quad_p0[:, 2]), n, pad),
            _pad1(take(p.quad_n[:, 0]), n, pad),
            _pad1(take(p.quad_n[:, 1]), n, pad),
            _pad1(take(p.quad_n[:, 2]), n, pad),
            _pad1(take(p.quad_d), n, pad),
            _pad1(take(p.quad_inv1[:, 0]), n, pad),
            _pad1(take(p.quad_inv1[:, 1]), n, pad),
            _pad1(take(p.quad_inv1[:, 2]), n, pad),
            _pad1(take(p.quad_inv2[:, 0]), n, pad),
            _pad1(take(p.quad_inv2[:, 1]), n, pad),
            _pad1(take(p.quad_inv2[:, 2]), n, pad),
        )
        rows = 16
    pk = _pack_blocks(fields, rows)
    alo, ahi = _range_aabbs(scene, lo, hi, flavor)
    blo, bhi = _block_aabbs(alo, ahi, pad)
    cnt, lst = _tile_lists(ro, rd, blo, bhi, float(scene.t_min))
    n_b = lst.shape[1]
    # flatten for SMEM residency: (T, B) pads EVERY row to 128 lanes
    # (smem OOM at 1250 tiles); one (1, T*B) row pads once
    cnt = cnt.reshape(1, -1)
    lst = lst.reshape(1, -1)

    kern = partial(_compact_kernel, flavor=flavor, rows=rows,
                   t_min=float(scene.t_min), has_moving=moving, n_b=n_b)
    Rp = ro.shape[0]
    ray_spec = pl.BlockSpec((TILE_R, 3), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    rt_spec = pl.BlockSpec((TILE_R, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_t, out_i = pl.pallas_call(
        kern,
        grid=(Rp // TILE_R,),
        in_specs=[ray_spec, ray_spec, rt_spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
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
    )(ro, rd, rt, pk, cnt, lst)
    return out_t[:, 0], out_i[:, 0] + lo


def _sweep_range(scene: SceneData, ro, rd, rt, lo: int, hi: int,
                 flavor: str, interpret: bool, moving: bool = False,
                 cull: bool = False):
    """(bt, bi) over prim rows [lo, hi) via one kind-specialized kernel.

    ``moving`` applies only to the sphere flavor: the scene compiler sorts
    static spheres first within the sphere range, so the static launch
    skips the per-(ray, prim) center-lerp entirely (exact - a
    zero-velocity lerp is the identity).

    ``cull`` precomputes a per-(256-ray tile, 128-prim block) needed mask
    with an XLA slab test and gates each block in-kernel behind a scalar
    SMEM read - profitable only when rays are tile-coherent (sorted)."""
    p = scene.prims
    n = hi - lo
    pad = (-n) % PBLK
    P = n + pad
    take = lambda a: jax.lax.slice_in_dim(a, lo, hi, axis=0)

    if flavor == "sphere":
        fields = (
            _pad1(take(p.center[:, 0]), n, pad),
            _pad1(take(p.center[:, 1]), n, pad),
            _pad1(take(p.center[:, 2]), n, pad),
            _pad1(take(p.velocity[:, 0]), n, pad),
            _pad1(take(p.velocity[:, 1]), n, pad),
            _pad1(take(p.velocity[:, 2]), n, pad),
            _pad1(take(p.time0), n, pad),
            _pad1(take(p.radius) ** 2, n, pad, 0.0),  # pad: r^2=0 never hits
        )
        kern = partial(_sphere_kernel, n_blocks=P // PBLK,
                       t_min=float(scene.t_min), has_moving=moving,
                       cull=cull)
    elif flavor == "box":
        # pad: DEGENERATE point boxes (min == max == 0).  An "inverted"
        # box (min > max) does NOT miss here: the slab test min/max-
        # normalizes each axis pair, so min=1/max=-1 is literally the box
        # [-1,1]^3 at the origin (real bug found at next-week R=163840 -
        # phantom t at y=1.0 exactly, tools/debug_cull_hw5/6.py).  A
        # min==max box gives tn = max_a(v_a) >= min_a(v_a) = tf, so the
        # strict tf > tn test can never pass.
        fields = (
            _pad1(take(p.box_min[:, 0]), n, pad),
            _pad1(take(p.box_min[:, 1]), n, pad),
            _pad1(take(p.box_min[:, 2]), n, pad),
            _pad1(take(p.box_max[:, 0]), n, pad),
            _pad1(take(p.box_max[:, 1]), n, pad),
            _pad1(take(p.box_max[:, 2]), n, pad),
        )
        kern = partial(_box_kernel, n_blocks=P // PBLK,
                       t_min=float(scene.t_min), cull=cull)
    else:  # quad
        fields = (
            _pad1(take(p.quad_p0[:, 0]), n, pad),
            _pad1(take(p.quad_p0[:, 1]), n, pad),
            _pad1(take(p.quad_p0[:, 2]), n, pad),
            _pad1(take(p.quad_n[:, 0]), n, pad),  # pad: n=0 -> NaN -> miss
            _pad1(take(p.quad_n[:, 1]), n, pad),
            _pad1(take(p.quad_n[:, 2]), n, pad),
            _pad1(take(p.quad_d), n, pad),
            _pad1(take(p.quad_inv1[:, 0]), n, pad),
            _pad1(take(p.quad_inv1[:, 1]), n, pad),
            _pad1(take(p.quad_inv1[:, 2]), n, pad),
            _pad1(take(p.quad_inv2[:, 0]), n, pad),
            _pad1(take(p.quad_inv2[:, 1]), n, pad),
            _pad1(take(p.quad_inv2[:, 2]), n, pad),
        )
        kern = partial(_quad_kernel, n_blocks=P // PBLK,
                       t_min=float(scene.t_min), cull=cull)

    Rp = ro.shape[0]
    ray_spec = pl.BlockSpec((TILE_R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rt_spec = pl.BlockSpec((TILE_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    prim_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # full array
    extra_in, extra_specs = (), []
    if cull:
        alo, ahi = _range_aabbs(scene, lo, hi, flavor)
        blo, bhi = _block_aabbs(alo, ahi, pad)
        needed = _needed_mask(ro, rd, blo, bhi, float(scene.t_min))
        # flattened (1, T*B) SMEM residency: (T, B) pads every row's
        # minor dim to 128 lanes and OOMs smem at production tile counts;
        # a (1, B) per-tile window fails Mosaic's last-two-dims rule
        extra_in = (needed.reshape(1, -1),)
        extra_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    out_t, out_i = pl.pallas_call(
        kern,
        grid=(Rp // TILE_R,),
        in_specs=[ray_spec, ray_spec, rt_spec] + [prim_spec] * len(fields)
        + extra_specs,
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
    )(ro, rd, rt, *fields, *extra_in)
    return out_t[:, 0], out_i[:, 0] + lo


def _use_sort_cull(scene: SceneData, interpret: bool) -> bool:
    """Sorted sweep policy.  Tile-coherence sorting only pays when there
    are enough 128-prim blocks for the per-tile mask to skip meaningfully
    (tools/study_sort_cull.py: next-week's 13 blocks skip 38-40% sorted,
    book1's 4 giant blocks only ~11%).  Default off pending hardware
    measurement; TPU_RAY_SORT=1 forces on, =0 forces off."""
    import os

    v = os.environ.get("TPU_RAY_SORT", "auto")
    if v == "1":
        return True
    if v == "auto":
        return False  # flip to a block-count threshold once measured
    return False


def intersect_solids_pallas(scene: SceneData, ro, rd, rt,
                            interpret: bool | None = None,
                            sort: bool | None = None):
    """(best_t, best_i) of each ray against the solid prims, via one
    kind-specialized Pallas launch per (non-empty) kind range.

    ``interpret`` defaults to True on CPU (tests) and False on TPU.

    ``sort`` reorders the rays by direction-octant + origin-Morton before
    the sweep (one u32 sort_key_val + one packed gather) and un-permutes
    the two outputs afterwards (one packed gather) - bit-exact, since
    every (ray, prim) pair still runs the identical test.  Sorted tiles
    are coherent enough for the per-tile block cull to fire
    (tools/study_sort_cull.py), turning the dense sweep into a
    data-parallel two-level hierarchy: XLA slab test over 128-prim
    Morton blocks -> per-kind Pallas sweep of the surviving blocks.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    if sort is None:
        sort = _use_sort_cull(scene, interpret)
    R0 = ro.shape[0]
    if sort:
        key = _sort_key(scene, ro, rd)
        _, idx = jax.lax.sort_key_val(key, jnp.arange(R0, dtype=jnp.int32))
        packed = jnp.concatenate(
            [ro, rd, rt[:, None], jnp.zeros((R0, 1), jnp.float32)], axis=1)
        packed = jnp.take(packed, idx, axis=0)
        ro, rd, rt = packed[:, 0:3], packed[:, 3:6], packed[:, 6]

    R = ro.shape[0]
    pad_r = (-R) % TILE_R
    if pad_r:
        ro = jnp.pad(ro, ((0, pad_r), (0, 0)))
        rd = jnp.pad(rd, ((0, pad_r), (0, 0)), constant_values=1.0)
        rt = jnp.pad(rt, (0, pad_r))
    rt2 = rt[:, None]

    n_sb = scene.n_sphere + scene.n_box
    ranges = (
        (0, scene.n_sphere_static, "sphere", False),
        (scene.n_sphere_static, scene.n_sphere, "sphere", True),
        (scene.n_sphere, n_sb, "box", False),
        (n_sb, scene.n_solid, "quad", False),
    )
    best_t = jnp.full((R + pad_r,), BIG)
    best_i = jnp.zeros((R + pad_r,), jnp.int32)
    import os

    style = os.environ.get("TPU_RAY_CULL_STYLE", "compact")
    for lo, hi, flavor, moving in ranges:
        if hi <= lo:
            continue
        if (flavor == "sphere" and not moving
                and _use_mxu_spheres(hi - lo, interpret)):
            bt, bi = _sweep_sphere_mxu(scene, ro, rd, rt2, lo, hi, interpret)
        elif sort and style == "compact":
            bt, bi = _sweep_range_compact(scene, ro, rd, rt2, lo, hi,
                                          flavor, interpret, moving=moving)
        else:
            bt, bi = _sweep_range(scene, ro, rd, rt2, lo, hi, flavor,
                                  interpret, moving=moving, cull=sort)
        closer = bt < best_t
        best_t = jnp.where(closer, bt, best_t)
        best_i = jnp.where(closer, bi, best_i)
    best_t = jnp.where(best_t[:R] >= BIG, jnp.inf, best_t[:R])
    best_i = best_i[:R]
    if sort:
        # un-permute both outputs with ONE packed scatter-free gather:
        # rows go back to their pre-sort lanes via the inverse permutation.
        # The packed lanes ride in INT32 domain: prim indices bitcast to
        # float32 are denormals, and the TPU flushes denormals to zero in
        # float gathers (hardware-bisected: t survived, best_i came back 0
        # at R=163840 — tools/debug_cull_hw3.py).  Any float32 bit pattern
        # is a valid int32, so gathering bitcast-t + i as int32 is exact.
        inv = jnp.zeros((R0,), jnp.int32).at[idx].set(
            jnp.arange(R0, dtype=jnp.int32))
        out = jnp.stack(
            [jax.lax.bitcast_convert_type(best_t, jnp.int32), best_i],
            axis=1)
        out = jnp.take(out, inv, axis=0)
        best_t = jax.lax.bitcast_convert_type(out[:, 0], jnp.float32)
        best_i = out[:, 1]
    return best_t, best_i
