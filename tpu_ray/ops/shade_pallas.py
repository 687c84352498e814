"""Fused Pallas shading: hit-record rebuild + scatter in ONE kernel.

Why this exists: honest chained attribution on real hardware (PERFLOG.md
round 2) showed the wavefront's per-iteration cost is dominated not by
arithmetic but by the ~dozens of fused-kernel boundaries XLA emits for the
record + texture + scatter chain - the scatter graph ran at ~3% of VPU
speed-of-light while the Pallas sweep ran at ~100%.  This kernel runs the
whole post-sweep pipeline - record reconstruction (ops/intersect.py::
_hit_record), packed texture evaluation (ops/textures.py::
texture_value_packed), material scatter + light MIS (ops/scatter.py,
ops/lights.py) - for a 1024-lane tile entirely in VMEM, consuming the
sweep's (best_t, best_i) directly.

Table pulls use Mosaic's within-tile gather (``jnp.take_along_axis`` on
(8, 128) tiles - the only dynamic-gather shape Mosaic lowers on this
hardware): the (N, 40) prim+material row table from ops/megakernel.py::
_build_tables is transposed to (40, Npad) in VMEM and each needed column is
gathered blockwise (ceil(N/128) masked 128-lane shuffles), ~3 vector ops
per block per column - cheap against the boundary costs it removes.

The one thing that stays OUTSIDE the kernel is the image-atlas fetch (a
512x1024 texel table cannot be tile-gathered): the kernel emits the lanes'
(u, v, image id, needs-image flag) and the wrapper applies the albedo with
the existing XLA gather + one multiply.  Every material weight is linear in
the albedo (Lambertian/metal/isotropic: weight = att * factor), so the
post-multiply is exact; image textures on EMISSIVE materials would break
that linearity and make supported() reject the scene (no library scene has
one).

Scope (supported()): not strict-quirks, not checker_fancy, no
image-on-emissive, no BVH.  RNG mirrors rng.lane_uniforms exactly (same
murmur3 stream per (slot id, key) - draws are bit-identical to the XLA
scatter path's).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.scene_data import (
    MAT_DIELECTRIC,
    MAT_DIFFUSE_LIGHT,
    MAT_ISOTROPIC,
    MAT_LAMBERTIAN,
    MAT_METAL,
    PRIM_BOX,
    PRIM_MEDIUM_SPHERE,
    PRIM_QUAD,
    PRIM_SPHERE,
    TEX_CHECKER,
    TEX_IMAGE,
    TEX_PERLIN,
    SceneData,
)
from .intersect import HitRecord
from .megakernel import (
    GOLD,
    INV_PI,
    TILE,
    TILE_L,
    TILE_S,
    TWO_PI,
    _build_tables,
    _cosine_direction_from,
    _dot,
    _hash_col,
    _fmix,
    _marble,
    _normalize,
    _onb_from_w,
    _onb_local,
    _reflect,
    _refract,
    _to_sphere_from,
    _unit_vector_from,
    _where3,
)
from .scatter import RR_COL, RR_PMIN, ScatterResult
from .textures import image_value_from

INF = np.float32(np.inf)


def supported(scene: SceneData) -> bool:
    """Scenes whose shading the fused kernel reproduces exactly."""
    return not (scene.strict or scene.checker_fancy or scene.n_prims <= 0
                or scene.image_on_emissive)


def _make_puller(tab_ref, idx, n_blocks: int):
    """Blockwise within-tile gather: column c of the (C, Npad) table at the
    (8, 128) int32 row indices ``idx``."""
    hi = idx // TILE_L
    lo = idx - hi * TILE_L

    def pull(c: int):
        out = jnp.zeros((TILE_S, TILE_L), jnp.float32)
        for b in range(n_blocks):
            row = tab_ref[c, b * TILE_L:(b + 1) * TILE_L]        # (128,)
            tile = jnp.broadcast_to(row[None], (TILE_S, TILE_L))
            g = jnp.take_along_axis(tile, lo, axis=1)
            out = jnp.where(hi == b, g, out)
        return out

    return pull


def _shade_core(o, d, rt, t, idx, slot, tab_ref, salt_ref, light_ref,
                kd0, kd1, *, scene: SceneData, n_lights: int, n_blocks: int):
    """Record rebuild + scatter for one (8, 128) tile; shared by the
    shade-only kernel (hit_scatter_pallas) and the full pool-step kernel
    (pool_step_pallas)."""
    f32 = np.float32
    t_min = f32(scene.t_min)
    zero = jnp.zeros_like(t)

    pull = _make_puller(tab_ref, idx, n_blocks)

    # ---- hit record (mirror ops/intersect.py::_hit_record) ----
    hit = jnp.isfinite(t)
    ts = jnp.where(hit, t, 1.0)
    px = o[0] + ts * d[0]
    py = o[1] + ts * d[1]
    pz = o[2] + ts * d[2]
    kind = pull(0).astype(jnp.int32)
    mat = pull(1).astype(jnp.int32)

    # sphere normal + spherical UV (src/Lib.hs:1096-1105)
    cx, cy, cz = pull(2), pull(3), pull(4)
    if scene.has_moving:
        dt = rt - pull(8)
        cx = cx + pull(5) * dt
        cy = cy + pull(6) * dt
        cz = cz + pull(7) * dt
    rr = jnp.maximum(pull(9), 1e-12)   # divide, not reciprocal-multiply:
    n_vec = ((px - cx) / rr, (py - cy) / rr, (pz - cz) / rr)  # bit-exact
    # with _hit_record's (point - ct) / max(radius, 1e-12).
    # Sphere spherical UV needs atan2/asin, which Mosaic does not lower -
    # the wrapper recomputes it (exactly) from the returned pre-flip normal
    # for image scenes; in-kernel uv covers quads/boxes/media.
    uu = zero
    vv = zero

    if scene.has_quads:
        qx = px - pull(2)
        qy = py - pull(3)
        qz = pz - pull(4)
        is_quad = kind == PRIM_QUAD
        n_vec = _where3(is_quad, (pull(5), pull(6), pull(7)), n_vec)
        if scene.has_image:
            u_q = qx * pull(10) + qy * pull(11) + qz * pull(12)
            v_q = qx * pull(13) + qy * pull(14) + qz * pull(15)
            uu = jnp.where(is_quad, u_q, uu)
            vv = jnp.where(is_quad, v_q, vv)

    if scene.has_solid_box:
        # slab recompute with the sweep's fp ops; first-extreme axis rule
        # (mirror _hit_record / megakernel box path)
        ix, iy, iz = 1.0 / d[0], 1.0 / d[1], 1.0 / d[2]
        bx0, by0, bz0 = pull(2), pull(3), pull(4)
        bx1, by1, bz1 = pull(5), pull(6), pull(7)
        tax = (bx0 - o[0]) * ix
        tbx = (bx1 - o[0]) * ix
        tay = (by0 - o[1]) * iy
        tby = (by1 - o[1]) * iy
        taz = (bz0 - o[2]) * iz
        tbz = (bz1 - o[2]) * iz
        t3n = (jnp.minimum(tax, tbx), jnp.minimum(tay, tby),
               jnp.minimum(taz, tbz))
        t3f = (jnp.maximum(tax, tbx), jnp.maximum(tay, tby),
               jnp.maximum(taz, tbz))
        tn_b = jnp.maximum(jnp.maximum(t3n[0], t3n[1]), t3n[2])
        use_entry = tn_b > t_min
        ax_n = jnp.where(t3n[1] > t3n[0], 1, 0)
        ax_n = jnp.where(t3n[2] > jnp.maximum(t3n[0], t3n[1]), 2, ax_n)
        ax_f = jnp.where(t3f[1] < t3f[0], 1, 0)
        ax_f = jnp.where(t3f[2] < jnp.minimum(t3f[0], t3f[1]), 2, ax_f)
        axis = jnp.where(use_entry, ax_n, ax_f)
        is_box = kind == PRIM_BOX
        n_vec = _where3(is_box, ((axis == 0).astype(jnp.float32),
                                 (axis == 1).astype(jnp.float32),
                                 (axis == 2).astype(jnp.float32)), n_vec)
        if scene.has_image:
            ext_x = jnp.maximum(bx1 - bx0, 1e-30)
            ext_y = jnp.maximum(by1 - by0, 1e-30)
            ext_z = jnp.maximum(bz1 - bz0, 1e-30)
            fx = (px - bx0) / ext_x
            fy = (py - by0) / ext_y
            fz_ = (pz - bz0) / ext_z
            # z-face -> (x, y), y-face -> (x, z), x-face -> (y, z)
            u_b = jnp.where(axis == 0, fy, fx)
            v_b = jnp.where(axis == 2, fy, fz_)
            uu = jnp.where(is_box, u_b, uu)
            vv = jnp.where(is_box, v_b, vv)

    front = _dot(d, n_vec) < 0.0
    n_vec = _where3(front, n_vec, (-n_vec[0], -n_vec[1], -n_vec[2]))

    if scene.has_media:
        is_med = kind >= PRIM_MEDIUM_SPHERE
        n_vec = _where3(is_med, (jnp.ones_like(zero), zero, zero), n_vec)
        front = front | is_med
        if scene.has_image:
            uu = jnp.where(is_med, 0.0, uu)
            vv = jnp.where(is_med, 0.0, vv)

    # ---- scatter (mirror ops/scatter.py) ----
    mkind = pull(16).astype(jnp.int32)
    base = _fmix(slot + kd0) ^ kd1          # rng.lane_uniforms base
    u = lambda i: _hash_col(base, i)

    # texture_value_packed on merged rows
    att = (pull(20), pull(21), pull(22))
    tex_kind = pull(19).astype(jnp.int32)
    if scene.has_checker:
        sines = jnp.sin(10.0 * px) * jnp.sin(10.0 * py) * jnp.sin(10.0 * pz)
        checker = _where3(sines < 0.0,
                          (pull(23), pull(24), pull(25)),
                          (pull(26), pull(27), pull(28)))
        att = _where3(tex_kind == TEX_CHECKER, checker, att)
    if scene.has_perlin:
        psalt = _pull_u32(salt_ref, idx, n_blocks)
        m = _marble(psalt, pull(29), px, py, pz)
        att = _where3(tex_kind == TEX_PERLIN, (m, m, m), att)
    if scene.has_image:
        # att stays white here; the wrapper multiplies the real albedo in
        # (exact: every present weight is linear in att - module docstring)
        need_img = tex_kind == TEX_IMAGE
        one = jnp.ones_like(zero)
        att = _where3(need_img, (one, one, one), att)
        img_id = pull(39).astype(jnp.int32)
    else:
        need_img = jnp.zeros_like(kind, jnp.bool_)
        img_id = jnp.zeros_like(kind)

    unit_d = _normalize(d)

    if scene.has_emissive:
        emit_m = (mkind == MAT_DIFFUSE_LIGHT) & ~front
        emitted = _where3(emit_m, att, (zero, zero, zero))
    else:
        emitted = (zero, zero, zero)

    branches = []
    if scene.has_lambertian:
        cd = _cosine_direction_from(u(6), u(7))
        cos_dir = _onb_local(_onb_from_w(n_vec), cd)
        if n_lights > 0:
            pick = jnp.minimum((u(1) * n_lights).astype(jnp.int32),
                               n_lights - 1)
            lrow = [jnp.full_like(zero, light_ref[0, c]) for c in range(14)]
            for li in range(1, n_lights):
                m_ = pick == li
                for c in range(14):
                    lrow[c] = jnp.where(m_, light_ref[li, c], lrow[c])
            pqx = lrow[0] + u(2) * lrow[3] + u(3) * lrow[6]
            pqy = lrow[1] + u(2) * lrow[4] + u(3) * lrow[7]
            pqz = lrow[2] + u(2) * lrow[5] + u(3) * lrow[8]
            dir_quad = (pqx - px, pqy - py, pqz - pz)
            dc = (lrow[9] - px, lrow[10] - py, lrow[11] - pz)
            d2 = _dot(dc, dc)
            loc = _to_sphere_from(u(4), u(5), lrow[12],
                                  jnp.maximum(d2, 1e-12))
            dir_sph = _onb_local(_onb_from_w(dc), loc)
            light_dir = _where3(lrow[13] > 0.5, dir_quad, dir_sph)
            dir_lam = _normalize(_where3(u(0) < 0.5, light_dir, cos_dir))
            cos_pdf = jnp.maximum(_dot(dir_lam, n_vec), 0.0) * INV_PI
            pdf_sum = zero
            for li in range(n_lights):
                lr = lambda c: light_ref[li, c]
                nl = (lr(14), lr(15), lr(16))
                dn_ = _dot(dir_lam, nl)
                t_ = (lr(17) - (px * nl[0] + py * nl[1] + pz * nl[2])) / dn_
                xx_ = px + t_ * dir_lam[0] - lr(0)
                xy_ = py + t_ * dir_lam[1] - lr(1)
                xz_ = pz + t_ * dir_lam[2] - lr(2)
                uq_ = xx_ * lr(18) + xy_ * lr(19) + xz_ * lr(20)
                vq_ = xx_ * lr(21) + xy_ * lr(22) + xz_ * lr(23)
                hit_q = (t_ > t_min) & (uq_ >= 0.0) & (uq_ <= 1.0) \
                    & (vq_ >= 0.0) & (vq_ <= 1.0)
                pdf_q = jnp.where(
                    hit_q,
                    t_ * t_ / jnp.maximum(jnp.abs(dn_) * lr(24), 1e-12),
                    0.0,
                )
                ocx_ = px - lr(9)
                ocy_ = py - lr(10)
                ocz_ = pz - lr(11)
                bq = ocx_ * dir_lam[0] + ocy_ * dir_lam[1] \
                    + ocz_ * dir_lam[2]
                oc2 = ocx_ * ocx_ + ocy_ * ocy_ + ocz_ * ocz_
                cq = oc2 - lr(12) ** 2
                disc_ = bq * bq - cq
                sd_ = jnp.sqrt(jnp.maximum(disc_, 0.0))
                hit_s = (disc_ > 0.0) & ((-bq - sd_ > t_min)
                                         | (-bq + sd_ > t_min))
                ctm = jnp.sqrt(jnp.maximum(
                    1.0 - lr(12) ** 2 / jnp.maximum(oc2, 1e-12), 0.0))
                solid = TWO_PI * (1.0 - ctm)
                pdf_s = jnp.where(hit_s, 1.0 / jnp.maximum(solid, 1e-12),
                                  0.0)
                pdf_sum = pdf_sum + jnp.where(
                    jnp.full_like(zero, lr(13)) > 0.5, pdf_q, pdf_s)
            pdf_val = 0.5 * (pdf_sum / n_lights + cos_pdf)
            w_mis = jnp.where(pdf_val > 0.0,
                              cos_pdf / jnp.maximum(pdf_val, 1e-12), 0.0)
            w_lam = (att[0] * w_mis, att[1] * w_mis, att[2] * w_mis)
        else:
            dir_lam = _normalize(cos_dir)
            w_lam = att
        branches.append((MAT_LAMBERTIAN, dir_lam, w_lam))

    if scene.has_metal:
        fuzz = pull(17)
        refl = _reflect(unit_d, n_vec)
        fvx, fvy, fvz = _unit_vector_from(u(8), u(9))
        dir_metal = (refl[0] + fuzz * fvx, refl[1] + fuzz * fvy,
                     refl[2] + fuzz * fvz)
        branches.append((MAT_METAL, dir_metal, att))

    if scene.has_dielectric:
        ri = pull(18)
        ratio = jnp.where(front, 1.0 / ri, ri)
        cos_theta = jnp.minimum(
            _dot((-unit_d[0], -unit_d[1], -unit_d[2]), n_vec), 1.0)
        sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
        r0 = ((1.0 - ratio) / (1.0 + ratio)) ** 2
        refl_prob = r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5
        do_reflect = (ratio * sin_theta > 1.0) | (u(10) < refl_prob)
        dir_diel = _where3(do_reflect, _reflect(unit_d, n_vec),
                           _refract(unit_d, n_vec, ratio))
        ones3 = (jnp.ones_like(zero),) * 3
        branches.append((MAT_DIELECTRIC, dir_diel, ones3))

    if scene.has_isotropic:
        dir_iso = _unit_vector_from(u(11), u(12))
        branches.append((MAT_ISOTROPIC, dir_iso, att))

    if not branches:
        branches.append((MAT_DIFFUSE_LIGHT, unit_d, (zero, zero, zero)))
    _, direction, weight = branches[0]
    for mk_, d_, w_ in branches[1:]:
        is_mk = mkind == mk_
        direction = _where3(is_mk, d_, direction)
        weight = _where3(is_mk, w_, weight)
    if scene.has_emissive:
        scattered = mkind != MAT_DIFFUSE_LIGHT
    else:
        scattered = jnp.ones_like(kind, jnp.bool_)

    # image flag: lanes whose weight needs the deferred albedo multiply -
    # materials whose weight is linear in att (dielectric ignores att)
    need_mul = need_img & scattered
    if scene.has_dielectric:
        need_mul = need_mul & (mkind != MAT_DIELECTRIC)

    return dict(
        hit=hit, point=(px, py, pz), normal=n_vec, front=front, u=uu, v=vv,
        mat=mat, direction=direction, weight=weight, emitted=emitted,
        scattered=scattered, need_mul=need_mul, img_id=img_id,
        is_sph=kind == PRIM_SPHERE,
    )


def _shade_kernel(ro0_ref, ro1_ref, ro2_ref, rd0_ref, rd1_ref, rd2_ref,
                  rt_ref, t_ref, idx_ref, slot_ref,
                  tab_ref, salt_ref, light_ref, kw_ref,
                  hit_ref, px_ref, py_ref, pz_ref,
                  nx_ref, ny_ref, nz_ref, fr_ref, u_ref, v_ref, mat_ref,
                  dx_ref, dy_ref, dz_ref, wx_ref, wy_ref, wz_ref,
                  ex_ref, ey_ref, ez_ref, sc_ref, if_ref, iid_ref,
                  sph_ref,
                  *, scene: SceneData, n_lights: int, n_blocks: int):
    s = _shade_core(
        (ro0_ref[...], ro1_ref[...], ro2_ref[...]),
        (rd0_ref[...], rd1_ref[...], rd2_ref[...]),
        rt_ref[...], t_ref[...], idx_ref[...], slot_ref[...],
        tab_ref, salt_ref, light_ref, kw_ref[0, 0], kw_ref[0, 1],
        scene=scene, n_lights=n_lights, n_blocks=n_blocks)
    hit_ref[...] = s["hit"].astype(jnp.int32)
    px_ref[...], py_ref[...], pz_ref[...] = s["point"]
    nx_ref[...], ny_ref[...], nz_ref[...] = s["normal"]
    fr_ref[...] = s["front"].astype(jnp.int32)
    u_ref[...] = s["u"]
    v_ref[...] = s["v"]
    mat_ref[...] = s["mat"]
    dx_ref[...], dy_ref[...], dz_ref[...] = s["direction"]
    wx_ref[...], wy_ref[...], wz_ref[...] = s["weight"]
    ex_ref[...], ey_ref[...], ez_ref[...] = s["emitted"]
    sc_ref[...] = s["scattered"].astype(jnp.int32)
    if_ref[...] = s["need_mul"].astype(jnp.int32)
    iid_ref[...] = s["img_id"]
    sph_ref[...] = s["is_sph"].astype(jnp.int32)


def _step_kernel(xs_ref, ys_ref, slot_ref,
                 o0_ref, o1_ref, o2_ref, d0_ref, d1_ref, d2_ref, tm_ref,
                 tp0_ref, tp1_ref, tp2_ref, ac0_ref, ac1_ref, ac2_ref,
                 bo_ref, sa_ref, av_ref, t_ref, idx_ref,
                 tab_ref, salt_ref, light_ref, kw_ref, cam_ref, scal_ref,
                 ns_ref, bg_ref,
                 *out_refs,
                 scene: SceneData, n_lights: int, n_blocks: int,
                 max_depth: int, inv_w: float, inv_h: float,
                 rr_depth: int = 0, sampler: str = "uniform"):
    """One full pool iteration for a (8, 128) tile: shade (record +
    textures + scatter + MIS), estimator accumulation, state update, and
    camera regeneration - mirror of integrator.trace_pool's body + regen
    (and of ops/megakernel.py's in-kernel pool update).

    The deferred image albedo (see module docstring) means the zero-
    throughput death check runs on the albedo-free throughput: a path
    whose image texel is EXACTLY black survives until depth instead of
    dying early.  Its contribution is 0 either way and all RNG is keyed
    by (slot, global sample index), so the estimate is unchanged.
    """
    f32 = np.float32
    xs = xs_ref[...]
    ys = ys_ref[...]
    slot = slot_ref[...]
    o = (o0_ref[...], o1_ref[...], o2_ref[...])
    d = (d0_ref[...], d1_ref[...], d2_ref[...])
    tm = tm_ref[...]
    tp = (tp0_ref[...], tp1_ref[...], tp2_ref[...])
    ac = (ac0_ref[...], ac1_ref[...], ac2_ref[...])
    bounce = bo_ref[...]
    sample = sa_ref[...]
    active = av_ref[...]
    t = t_ref[...]
    idx = idx_ref[...]
    zero = jnp.zeros_like(t)

    s = _shade_core(o, d, tm, t, idx, slot, tab_ref, salt_ref, light_ref,
                    kw_ref[0, 0], kw_ref[0, 1],
                    scene=scene, n_lights=n_lights, n_blocks=n_blocks)

    # ---- pool update (mirror trace_pool.body) ----
    act = active > 0
    hit = s["hit"]
    scattered = s["scattered"]
    miss = act & ~hit
    emit = act & hit & ~scattered
    cont = act & hit & scattered
    emitted = s["emitted"]
    ac = (ac[0] + jnp.where(miss, tp[0] * bg_ref[0, 0], 0.0)
          + jnp.where(emit, tp[0] * emitted[0], 0.0),
          ac[1] + jnp.where(miss, tp[1] * bg_ref[0, 1], 0.0)
          + jnp.where(emit, tp[1] * emitted[1], 0.0),
          ac[2] + jnp.where(miss, tp[2] * bg_ref[0, 2], 0.0)
          + jnp.where(emit, tp[2] * emitted[2], 0.0))
    w = s["weight"]
    kill = jnp.zeros_like(cont)
    if rr_depth:
        # Russian roulette (ops/scatter.py RR note): survival p from the
        # INCOMING tp (pre-weight; identical across engines - the carried
        # tp includes any deferred image albedo), uniform = column RR_COL
        # of the scatter stream (same base _shade_core's u() hashes)
        tp_in = jnp.maximum(jnp.maximum(tp[0], tp[1]), tp[2])
        p_rr = jnp.minimum(jnp.maximum(tp_in, f32(RR_PMIN)), f32(1.0))
        u_rr = _hash_col(_fmix(slot + kw_ref[0, 0]) ^ kw_ref[0, 1], RR_COL)
        do_rr = cont & (bounce >= rr_depth)
        kill = do_rr & (u_rr >= p_rr)
    tp = _where3(cont, (tp[0] * w[0], tp[1] * w[1], tp[2] * w[2]), tp)
    bounce = jnp.where(cont, bounce + 1, bounce)
    if rr_depth:
        surv = do_rr & ~kill
        tp = _where3(surv, (tp[0] / p_rr, tp[1] / p_rr, tp[2] / p_rr), tp)
    tp_max = jnp.maximum(jnp.maximum(tp[0], tp[1]), tp[2])
    dead_now = act & (
        miss | emit | kill | (cont & (bounce >= max_depth))
        | (cont & (tp_max <= 0.0))
    )
    o = _where3(cont, s["point"], o)
    d = _where3(cont, s["direction"], d)

    # ---- regen (mirror trace_pool.regen via rng.hash_uniforms2 +
    # camera.rays_from_uniforms; same code as megakernel's regen) ----
    sample0 = scal_ref[0, 0]
    cam_salt = scal_ref[0, 1]
    n_samples = ns_ref[0, 0]
    cam = lambda i: cam_ref[0, i]
    want = dead_now & (sample < n_samples)
    a_w = slot
    b_w = (sample0 + sample.astype(jnp.uint32)) ^ cam_salt
    base = _fmix(a_w + GOLD) ^ (b_w * np.uint32(0x85EBCA6B))
    u0 = _hash_col(base, 0)
    u1 = _hash_col(base, 1)
    u2 = _hash_col(base, 2)
    u3 = _hash_col(base, 3)
    u4 = _hash_col(base, 4)
    if sampler in ("sobol", "sobol-b0"):
        # scrambled Sobol' camera sample (core/qmc.py): dims 1-2 on the
        # pixel, 3-5 on lens disk + shutter time, on the PLAIN global
        # sample index; pure tile bit math, Pallas-safe.  sobol-b0's
        # bounce-dim override is XLA-queue-only; here it keeps the sobol
        # camera dims (hash scatter draws) rather than degrading the
        # camera sample to uniform jitter (ADVICE r4 medium)
        from ..core import qmc

        gs = sample0 + sample.astype(jnp.uint32)
        u0, u1 = qmc.pixel_uniforms(slot, gs, cam_salt)
        u2, u3, u4 = qmc.lens_time_uniforms(slot, gs, cam_salt)
    sx = xs + u0 * f32(inv_w)
    sy = ys + u1 * f32(inv_h)
    r = cam(18) * jnp.sqrt(u2)
    phi = TWO_PI * u3
    rc, rs = r * jnp.cos(phi), r * jnp.sin(phi)
    offx = rc * cam(12) + rs * cam(15)
    offy = rc * cam(13) + rs * cam(16)
    offz = rc * cam(14) + rs * cam(17)
    t_new = cam(19) + (cam(20) - cam(19)) * u4
    rox = cam(0) + offx
    roy = cam(1) + offy
    roz = cam(2) + offz
    rdx = cam(3) + sx * cam(6) + sy * cam(9) - cam(0) - offx
    rdy = cam(4) + sx * cam(7) + sy * cam(10) - cam(1) - offy
    rdz = cam(5) + sx * cam(8) + sy * cam(11) - cam(2) - offz
    o = _where3(want, (rox, roy, roz), o)
    d = _where3(want, (rdx, rdy, rdz), d)
    tm = jnp.where(want, t_new, tm)
    tp = _where3(want, (jnp.ones_like(zero),) * 3, tp)
    bounce = jnp.where(want, 0, bounce)
    sample = jnp.where(want, sample + 1, sample)
    active = ((act & ~dead_now) | want).astype(jnp.int32)

    outs = list(out_refs)
    for ref, val in zip(outs[:16], (
            o[0], o[1], o[2], d[0], d[1], d[2], tm,
            tp[0], tp[1], tp[2], ac[0], ac[1], ac[2],
            bounce, sample, active)):
        ref[...] = val
    if scene.has_image:
        # the deferred albedo applies to lanes whose (now carried)
        # throughput includes this bounce's white-att weight
        flag = s["need_mul"] & cont & ~dead_now
        n_vec = s["normal"]
        for ref, val in zip(outs[16:], (
                s["u"], s["v"], s["img_id"], flag.astype(jnp.int32),
                n_vec[0], n_vec[1], n_vec[2],
                s["front"].astype(jnp.int32),
                s["is_sph"].astype(jnp.int32))):
            ref[...] = val


def pool_step_pallas(scene: SceneData, camera, xs, ys, slot_ids,
                     origin, direction, time, throughput, accum, bounce,
                     sample, active, best_t, best_i, key, n_samples,
                     sample0, cam_salt, inv_wh, max_depth: int,
                     rr_depth: int = 0, interpret: bool | None = None):
    """One fused pool iteration (shade + accumulate + update + regen).

    Drop-in for the elementwise section of integrator.trace_pool's body
    when fused shading is active - removes the remaining per-bounce XLA
    glue kernels.  Returns the new (origin, direction, time, throughput,
    accum, bounce, sample, active) state.
    """
    assert supported(scene), "scene outside fused-shading scope"
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    R = origin.shape[0]
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)[:2][None]
    scal = jnp.stack([jnp.asarray(sample0, jnp.uint32),
                      jnp.asarray(cam_salt, jnp.uint32)])[None]
    ns = jnp.asarray(n_samples, jnp.int32).reshape(1, 1)
    bg = jnp.asarray(scene.background, jnp.float32).reshape(1, 3)
    from .megakernel import _camera_vec

    pad = (-R) % TILE
    shape2 = ((R + pad) // TILE * TILE_S, TILE_L)
    tile = lambda a, fill: jnp.pad(a, (0, pad), constant_values=fill) \
        .reshape(shape2)
    ins = (
        tile(xs, 0.0), tile(ys, 0.0), tile(jnp.asarray(slot_ids, jnp.uint32), 0),
        tile(origin[:, 0], 0.0), tile(origin[:, 1], 0.0),
        tile(origin[:, 2], 0.0),
        tile(direction[:, 0], 1.0), tile(direction[:, 1], 1.0),
        tile(direction[:, 2], 1.0), tile(time, 0.0),
        tile(throughput[:, 0], 0.0), tile(throughput[:, 1], 0.0),
        tile(throughput[:, 2], 0.0),
        tile(accum[:, 0], 0.0), tile(accum[:, 1], 0.0),
        tile(accum[:, 2], 0.0),
        tile(bounce, 0), tile(sample, 0),
        tile(active.astype(jnp.int32), 0),  # padded lanes: inactive
        tile(best_t, np.inf), tile(best_i, 0),
    )
    tab, salt_f, lights, n_blocks = _tables_for_shade(scene)

    kern = partial(_step_kernel, scene=scene, n_lights=int(scene.n_lights),
                   n_blocks=n_blocks, max_depth=int(max_depth),
                   inv_w=float(inv_wh[0]), inv_h=float(inv_wh[1]),
                   rr_depth=int(rr_depth), sampler=camera.sampler)
    tile_spec = pl.BlockSpec((TILE_S, TILE_L), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    full = lambda ms: pl.BlockSpec(memory_space=ms)
    f32s = jax.ShapeDtypeStruct(shape2, jnp.float32)
    i32s = jax.ShapeDtypeStruct(shape2, jnp.int32)
    out_shape = [f32s] * 13 + [i32s] * 3
    if scene.has_image:
        out_shape += [f32s, f32s, i32s, i32s, f32s, f32s, f32s, i32s, i32s]
    outs = pl.pallas_call(
        kern,
        grid=(shape2[0] // TILE_S,),
        in_specs=[tile_spec] * 21 + [
            full(pltpu.VMEM),                 # tab
            full(pltpu.VMEM),                 # salt bits
            full(pltpu.SMEM),                 # lights
            full(pltpu.SMEM),                 # key words (1, 2)
            full(pltpu.SMEM),                 # camera vec (1, 21)
            full(pltpu.SMEM),                 # sample0/cam_salt (1, 2) u32
            full(pltpu.SMEM),                 # n_samples (1, 1) i32
            full(pltpu.SMEM),                 # background (1, 3)
        ],
        out_specs=(tile_spec,) * len(out_shape),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*ins, tab, salt_f, lights, kd, _camera_vec(camera), scal, ns, bg)
    flat = [a.reshape(-1)[:R] for a in outs]
    (o0, o1, o2, d0, d1, d2, tm, tp0, tp1, tp2, a0, a1, a2,
     bo, sa, av) = flat[:16]
    tp = jnp.stack([tp0, tp1, tp2], -1)
    if scene.has_image:
        uu, vv, iid, flag, nx, ny, nz, fr, sph = flat[16:]
        n_pre = jnp.where((fr > 0)[:, None],
                          jnp.stack([nx, ny, nz], -1),
                          -jnp.stack([nx, ny, nz], -1))
        phi = jnp.arctan2(n_pre[:, 2], n_pre[:, 0])
        theta = jnp.arcsin(jnp.clip(n_pre[:, 1], -1.0, 1.0))
        u_s = 1.0 - (phi + jnp.pi) / (2.0 * jnp.pi)
        v_s = (theta + jnp.pi / 2.0) / jnp.pi
        uu = jnp.where(sph > 0, u_s, uu)
        vv = jnp.where(sph > 0, v_s, vv)
        att_img = image_value_from(scene, iid, uu, vv)
        tp = jnp.where((flag > 0)[:, None], tp * att_img, tp)
    return (jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1), tm,
            tp, jnp.stack([a0, a1, a2], -1), bo, sa, av > 0)


def _pull_u32(salt_ref, idx, n_blocks: int):
    """Blockwise gather of the per-prim uint32 Perlin salt (bit-exact:
    the table is pre-bitcast to f32 and the shuffle moves raw bits)."""
    hi = idx // TILE_L
    lo = idx - hi * TILE_L
    out = jnp.zeros((TILE_S, TILE_L), jnp.float32)
    for b in range(n_blocks):
        row = salt_ref[0, b * TILE_L:(b + 1) * TILE_L]
        tile = jnp.broadcast_to(row[None], (TILE_S, TILE_L))
        g = jnp.take_along_axis(tile, lo, axis=1)
        out = jnp.where(hi == b, g, out)
    return jax.lax.bitcast_convert_type(out, jnp.uint32)


def _tables_for_shade(scene: SceneData):
    geo, salt, lights = _build_tables(scene)
    n = geo.shape[0]
    pad = (-n) % TILE_L
    tab = jnp.pad(geo, ((0, pad), (0, 0))).T          # (40, Npad) f32
    salt_f = jax.lax.bitcast_convert_type(
        jnp.pad(salt, (0, pad)), jnp.float32)[None]   # (1, Npad) f32 bits
    return tab, salt_f, lights, (n + pad) // TILE_L


def hit_scatter_pallas(scene: SceneData, ro, rd, rt, best_t, best_i, key,
                       lane_ids=None, interpret: bool | None = None):
    """Drop-in for ``_hit_record`` + ``scatter`` on supported() scenes.

    Consumes the sweep's (best_t, best_i); returns (HitRecord,
    ScatterResult) with identical draws and estimator semantics (the RNG
    stream is rng.lane_uniforms' for the same ``key`` and ``lane_ids``).
    """
    assert supported(scene), "scene outside fused-shading scope"
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    R = ro.shape[0]
    if lane_ids is None:
        lane_ids = jnp.arange(R, dtype=jnp.uint32)
    lane_ids = jnp.asarray(lane_ids, jnp.uint32)
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)[:2][None]

    pad = (-R) % TILE
    shape2 = ((R + pad) // TILE * TILE_S, TILE_L)
    tile = lambda a, fill: jnp.pad(a, (0, pad), constant_values=fill) \
        .reshape(shape2)
    ins = (
        tile(ro[:, 0], 0.0), tile(ro[:, 1], 0.0), tile(ro[:, 2], 0.0),
        tile(rd[:, 0], 1.0), tile(rd[:, 1], 1.0), tile(rd[:, 2], 1.0),
        tile(rt, 0.0), tile(best_t, np.inf),
        tile(best_i, 0), tile(lane_ids, 0),
    )
    tab, salt_f, lights, n_blocks = _tables_for_shade(scene)

    kern = partial(_shade_kernel, scene=scene, n_lights=int(scene.n_lights),
                   n_blocks=n_blocks)
    tile_spec = pl.BlockSpec((TILE_S, TILE_L), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    full = lambda ms: pl.BlockSpec(memory_space=ms)
    f32s = jax.ShapeDtypeStruct(shape2, jnp.float32)
    i32s = jax.ShapeDtypeStruct(shape2, jnp.int32)
    outs = pl.pallas_call(
        kern,
        grid=(shape2[0] // TILE_S,),
        in_specs=[tile_spec] * 10 + [
            full(pltpu.VMEM),                 # tab (40, Npad)
            full(pltpu.VMEM),                 # salt bits (1, Npad)
            full(pltpu.SMEM),                 # lights (L, 25)
            full(pltpu.SMEM),                 # key words (1, 2)
        ],
        out_specs=(tile_spec,) * 24,
        out_shape=(i32s, f32s, f32s, f32s, f32s, f32s, f32s, i32s, f32s,
                   f32s, i32s, f32s, f32s, f32s, f32s, f32s, f32s, f32s,
                   f32s, f32s, i32s, i32s, i32s, i32s),
        interpret=interpret,
    )(*ins, tab, salt_f, lights, kd)
    (hit, px, py, pz, nx, ny, nz, fr, uu, vv, mat, dx, dy, dz,
     wx, wy, wz, ex, ey, ez, sc, imgf, iid, sph) = [
        a.reshape(-1)[:R] for a in outs]

    normal = jnp.stack([nx, ny, nz], -1)
    front = fr > 0
    if scene.has_image:
        # sphere spherical UV (src/Lib.hs:1096-1105): Mosaic has no atan2,
        # so recompute from the PRE-FLIP normal (negation is exact, so this
        # is bit-identical to _hit_record's in-line computation)
        n_pre = jnp.where(front[:, None], normal, -normal)
        phi = jnp.arctan2(n_pre[:, 2], n_pre[:, 0])
        theta = jnp.arcsin(jnp.clip(n_pre[:, 1], -1.0, 1.0))
        u_s = 1.0 - (phi + jnp.pi) / (2.0 * jnp.pi)
        v_s = (theta + jnp.pi / 2.0) / jnp.pi
        is_sph = sph > 0
        uu = jnp.where(is_sph, u_s, uu)
        vv = jnp.where(is_sph, v_s, vv)

    weight = jnp.stack([wx, wy, wz], -1)
    if scene.has_image:
        # deferred albedo: ONE XLA gather for the rare image-textured lanes
        att_img = image_value_from(scene, iid, uu, vv)
        weight = jnp.where((imgf > 0)[:, None], weight * att_img, weight)

    rec = HitRecord(
        hit=hit > 0, t=best_t, point=jnp.stack([px, py, pz], -1),
        normal=normal, front=front, u=uu, v=vv,
        mat=mat, prim=best_i,
    )
    res = ScatterResult(
        direction=jnp.stack([dx, dy, dz], -1), weight=weight,
        emitted=jnp.stack([ex, ey, ez], -1), scattered=sc > 0,
    )
    return rec, res
