"""Whole-wave Pallas megakernel: the entire ray-pool bounce loop on-core.

The wavefront integrator (integrator.trace_pool) runs its loop in XLA: every
iteration reads and writes the full (R, ~20)-float path state through HBM and
pays a fusion boundary at the sweep.  This kernel runs the WHOLE wave - camera
regeneration, intersect sweep, shading, light MIS, accumulation, path regen -
for a 1024-lane tile entirely in registers/VMEM, looping until every lane has
finished its samples.  HBM traffic collapses to "pixel coords in, film out".

Two properties pin this to trace_pool draw-for-draw (same paths, same
estimator; values agree to fp-reassociation level - XLA contracts fma
differently even between an unrolled loop and the SAME ops inside
lax.while_loop, so cross-compilation bit-equality is unattainable and the
tests assert ulp-level agreement instead):

* ALL pool randomness is keyed by (global slot id, global sample / iteration
  index) - never by lane position (integrator.trace_pool docstring).  A
  lane's entire path history is a pure function of its slot id and the
  iteration counter, so a tile-local loop replays exactly the draws the
  monolithic loop would produce.
* The per-iteration threefry fold_in chain (the only non-hash RNG) is
  precomputed OUTSIDE the kernel into an (iter_cap, 2) table of key words;
  in-kernel draws are the same murmur3 chains as core/rng.py.

Divergence costs almost nothing: Mosaic runs grid tiles sequentially on the
core, so a tile whose lanes all die early simply exits its while_loop - the
straggler tail is paid per 1024 lanes, not per wave (the XLA path needs
two-level compaction for the same effect).

Scope (supported()): no image textures (HBM gathers), no strict-quirks mode,
<= MAX_PRIMS prims (prim+material rows live in SMEM).  Everything else - all
five materials, checker + hash-Perlin marble textures, quad/sphere light MIS,
moving spheres, defocus/motion blur, constant media (free-flight RNG drawn
in-kernel from the same per-(slot, medium) hash stream as the XLA
intersector) - runs in-kernel.

Sweep math mirrors ops/intersect.py::_chunk_t and record reconstruction
mirrors ops/intersect.py::_hit_record; shading mirrors ops/scatter.py,
ops/lights.py and ops/textures.py op-for-op (tests/test_megakernel.py
pins agreement with the XLA pool to float-reassociation tolerance).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.scene_data import (
    LIGHT_QUAD,
    MAT_DIELECTRIC,
    MAT_DIFFUSE_LIGHT,
    MAT_ISOTROPIC,
    MAT_LAMBERTIAN,
    MAT_METAL,
    PRIM_BOX,
    PRIM_MEDIUM_BOX,
    PRIM_MEDIUM_SPHERE,
    PRIM_QUAD,
    PRIM_SPHERE,
    TEX_CHECKER,
    TEX_PERLIN,
    SceneData,
)

TILE_S, TILE_L = 8, 128          # one (8, 128) f32 vreg per state field
TILE = TILE_S * TILE_L
MAX_PRIMS = 512                  # SMEM row-table budget (cornell: 13,
                                 # book1: 485 = 76 KB of SMEM rows)
INF = np.float32(np.inf)
TWO_PI = np.float32(2.0 * np.pi)
INV_PI = np.float32(1.0 / np.pi)
GOLD = np.uint32(0x9E3779B9)


def supported(scene: SceneData) -> bool:
    """Scenes the megakernel can run (renderer falls back to XLA otherwise)."""
    return (
        not scene.has_image
        and not scene.checker_fancy
        and not scene.strict
        and 0 < scene.n_prims <= MAX_PRIMS
    )


# --- murmur3 chains (mirror core/rng.py exactly) ---------------------------

def _fmix(x):
    x = x ^ (x >> np.uint32(16))
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> np.uint32(13))
    x = x * np.uint32(0xC2B2AE35)
    x = x ^ (x >> np.uint32(16))
    return x


def _hash_col(base, i):
    """Column i of rng.hash_uniforms: one U[0,1) f32 per lane."""
    salt = np.uint32((0x9E3779B9 * (i + 1)) & 0xFFFFFFFF)
    bits = _fmix(_fmix(base + salt) ^ salt)
    # Mosaic has no uint32->f32 cast; the value is < 2^24, so the int32
    # hop is exact
    return (bits >> np.uint32(8)).astype(jnp.int32).astype(jnp.float32) \
        * np.float32(1.0 / (1 << 24))


# --- in-kernel vec3 on (8, 128) component triples --------------------------

def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _normalize(a):
    # mirror vec.normalize: zero-safe
    n2 = _dot(a, a)
    inv = jnp.where(n2 > 0.0, 1.0 / jnp.sqrt(jnp.maximum(n2, 1e-30)), 0.0)
    return (a[0] * inv, a[1] * inv, a[2] * inv)


def _where3(m, a, b):
    return (jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1]),
            jnp.where(m, a[2], b[2]))


def _reflect(v, n):
    d = _dot(v, n)
    return (v[0] - 2.0 * d * n[0], v[1] - 2.0 * d * n[1], v[2] - 2.0 * d * n[2])


def _refract(uv, n, ratio):
    # mirror vec.refract
    cos_theta = _dot((-uv[0], -uv[1], -uv[2]), n)
    rp = (ratio * (uv[0] + cos_theta * n[0]),
          ratio * (uv[1] + cos_theta * n[1]),
          ratio * (uv[2] + cos_theta * n[2]))
    k = jnp.maximum(1.0 - _dot(rp, rp), 0.0)
    s = -jnp.sqrt(k)
    return (rp[0] + s * n[0], rp[1] + s * n[1], rp[2] + s * n[2])


def _onb_from_w(n):
    # mirror vec.onb_from_w
    w = _normalize(n)
    pick = jnp.abs(w[0]) > 0.9
    a = (jnp.where(pick, 0.0, 1.0), jnp.where(pick, 1.0, 0.0),
         jnp.zeros_like(w[0]))
    v = _normalize(_cross(w, a))
    u = _cross(w, v)
    return u, v, w


def _onb_local(uvw, x):
    u, v, w = uvw
    return (x[0] * u[0] + x[1] * v[0] + x[2] * w[0],
            x[0] * u[1] + x[1] * v[1] + x[2] * w[1],
            x[0] * u[2] + x[1] * v[2] + x[2] * w[2])


def _unit_vector_from(u0, u1):
    # mirror rng.unit_vector_from
    a = TWO_PI * u0
    z = 2.0 * u1 - 1.0
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return (r * jnp.cos(a), r * jnp.sin(a), z)


def _cosine_direction_from(u0, u1):
    # mirror rng.cosine_direction_from
    z = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    phi = TWO_PI * u0
    sq = jnp.sqrt(u1)
    return (jnp.cos(phi) * sq, jnp.sin(phi) * sq, z)


def _to_sphere_from(u0, u1, radius, dist_squared):
    # mirror rng.to_sphere_from
    cos_theta_max = jnp.sqrt(jnp.maximum(1.0 - radius * radius / dist_squared, 0.0))
    z = 1.0 + u1 * (cos_theta_max - 1.0)
    phi = TWO_PI * u0
    sq = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return (jnp.cos(phi) * sq, jnp.sin(phi) * sq, z)


def _perlin_noise(salt, qx, qy, qz):
    # mirror textures._perlin_noise (hash-gradient octave)
    ix = jnp.floor(qx)
    iy = jnp.floor(qy)
    iz = jnp.floor(qz)
    ux, uy, uz = qx - ix, qy - iy, qz - iz
    hx_ = ux * ux * (3.0 - 2.0 * ux)
    hy_ = uy * uy * (3.0 - 2.0 * uy)
    hz_ = uz * uz * (3.0 - 2.0 * uz)
    cx0 = ix.astype(jnp.int32).astype(jnp.uint32) * np.uint32(0x8DA6B343)
    cy0 = iy.astype(jnp.int32).astype(jnp.uint32) * np.uint32(0xD8163841)
    cz0 = iz.astype(jnp.int32).astype(jnp.uint32) * np.uint32(0xCB1AB31F)
    hx = (cx0, cx0 + np.uint32(0x8DA6B343))
    hy = (cy0, cy0 + np.uint32(0xD8163841))
    hz = (cz0, cz0 + np.uint32(0xCB1AB31F))
    acc = jnp.zeros_like(qx)
    to_signed = np.float32(2.0 / (1 << 24))
    for di in (0, 1):
        w0 = hx_ if di else 1.0 - hx_
        ox = ux - di
        for dj in (0, 1):
            w1 = hy_ if dj else 1.0 - hy_
            oy = uy - dj
            for dk in (0, 1):
                w2 = hz_ if dk else 1.0 - hz_
                oz = uz - dk
                h1 = _fmix(hx[di] ^ hy[dj] ^ hz[dk] ^ salt)
                h2 = _fmix(h1 ^ np.uint32(0x68E31DA4))
                h3 = _fmix(h2 ^ np.uint32(0xB5297A4D))
                gx = (h1 >> np.uint32(8)).astype(jnp.int32).astype(jnp.float32) * to_signed - 1.0
                gy = (h2 >> np.uint32(8)).astype(jnp.int32).astype(jnp.float32) * to_signed - 1.0
                gz = (h3 >> np.uint32(8)).astype(jnp.int32).astype(jnp.float32) * to_signed - 1.0
                acc = acc + (w0 * w1 * w2) * (gx * ox + gy * oy + gz * oz)
    return acc


def _marble(salt, scale, px, py, pz):
    # mirror textures.marble_from: 7 octaves, 0.5*(1+sin(z + 10*|turb|))
    acc = jnp.zeros_like(px)
    ppx, ppy, ppz = px, py, pz
    weight = 1.0
    for _ in range(7):
        acc = acc + weight * _perlin_noise(salt, scale * ppx, scale * ppy,
                                           scale * ppz)
        ppx, ppy, ppz = 2.0 * ppx, 2.0 * ppy, 2.0 * ppz
        weight = weight * 0.5
    turb = jnp.abs(acc)
    return 0.5 * (1.0 + jnp.sin(pz + 10.0 * turb))


# --- prim/material row table layout (SMEM) ---------------------------------
# f32 cols: 0 kind | 2:5 A | 5:8 B | 8 C | 9 D | 10:13 E | 13:16 F
#   sphere:     A center, B velocity, C time0, D radius
#   quad:       A p0, B n, C plane d, E inv1, F inv2
#   box:        A box_min, B box_max
#   medium:     A center (sphere boundary) / object-frame box_min (box
#               boundary), B box_max, C -1/density, D radius, E xf_off,
#               30:39 xf_rot row-major (world_from_object)
# material (merged so the sweep carries shading rows with the hit):
#   16 mkind | 17 fuzz | 18 ref_idx | 19 tex_kind | 20:23 color
#   | 23:26 odd | 26:29 even | 29 perlin scale
#   | 39 image_id (f32-exact int; used only by ops/shade_pallas.py - the
#     megakernel itself rejects image scenes)
PRIM_COLS = 40


def _build_tables(scene: SceneData):
    p = scene.prims
    n = scene.n_prims
    geo = jnp.zeros((n, PRIM_COLS), jnp.float32)
    kind = p.kind[:n].astype(jnp.float32)
    is_q = p.kind[:n] == PRIM_QUAD
    is_b = (p.kind[:n] == PRIM_BOX) | (p.kind[:n] == PRIM_MEDIUM_BOX)
    is_m = p.kind[:n] >= PRIM_MEDIUM_SPHERE
    A = jnp.where(is_q[:, None], p.quad_p0[:n],
                  jnp.where(is_b[:, None], p.box_min[:n], p.center[:n]))
    B = jnp.where(is_q[:, None], p.quad_n[:n],
                  jnp.where(is_b[:, None], p.box_max[:n], p.velocity[:n]))
    C = jnp.where(is_m, p.neg_inv_density[:n],
                  jnp.where(is_q, p.quad_d[:n], p.time0[:n]))
    E = jnp.where(is_m[:, None], p.xf_off[:n], p.quad_inv1[:n])
    geo = geo.at[:, 0].set(kind)
    geo = geo.at[:, 1].set(p.mat[:n].astype(jnp.float32))  # shade_pallas
    geo = geo.at[:, 2:5].set(A)
    geo = geo.at[:, 5:8].set(B)
    geo = geo.at[:, 8].set(C)
    geo = geo.at[:, 9].set(p.radius[:n])
    geo = geo.at[:, 10:13].set(E)
    geo = geo.at[:, 13:16].set(p.quad_inv2[:n])
    geo = geo.at[:, 30:39].set(
        jnp.where(is_m[:, None], p.xf_rot[:n].reshape(n, 9), 0.0))
    mp = scene.mat_payload[p.mat[:n]]        # (n, 16) host-side row pull
    geo = geo.at[:, 16:30].set(mp[:, 0:14])
    geo = geo.at[:, 39].set(mp[:, 15])       # image_id (shade_pallas)
    # per-prim perlin salt (texs.perlin_salt[perlin_id]); 0 when unused
    if scene.has_perlin:
        salt = scene.texs.perlin_salt[mp[:, 14].astype(jnp.int32)]
    else:
        salt = jnp.zeros((n,), jnp.uint32)
    # lights packed exactly as ops/lights.py::sample_lights_from
    if scene.n_lights > 0:
        L = scene.n_lights
        lt = scene.lights
        lights = jnp.concatenate([
            lt.quad_p0[:L], lt.quad_e1[:L], lt.quad_e2[:L], lt.center[:L],
            lt.radius[:L, None],
            (lt.kind[:L] == LIGHT_QUAD).astype(jnp.float32)[:, None],
            lt.quad_n[:L], lt.quad_d[:L, None], lt.quad_inv1[:L],
            lt.quad_inv2[:L], lt.quad_area[:L, None],
        ], axis=1)                           # (L, 25)
    else:
        lights = jnp.zeros((1, 25), jnp.float32)
    return geo, salt.astype(jnp.uint32), lights


def _camera_vec(camera):
    return jnp.concatenate([
        camera.origin, camera.lower_left, camera.horizontal, camera.vertical,
        camera.u, camera.v,
        jnp.stack([camera.lens_radius, camera.time0, camera.time1]),
    ]).astype(jnp.float32)[None]             # (1, 21)


def _kernel(xs_ref, ys_ref, slot_ref, keys_ref, geo_ref, salt_ref, light_ref,
            cam_ref, scal_ref, bg_ref,
            ax_ref, ay_ref, az_ref, ns_ref, *,
            scene: SceneData, n_samples: int, max_depth: int, iter_cap: int,
            inv_w: float, inv_h: float, n_lights: int, rr_depth: int = 0,
            sampler: str = "uniform"):
    f32 = np.float32
    t_min = f32(scene.t_min)
    xs = xs_ref[...]
    ys = ys_ref[...]
    slot = slot_ref[...]
    sample0 = scal_ref[0, 0]
    cam_salt = scal_ref[0, 1]

    cam = lambda i: cam_ref[0, i]
    zero = jnp.zeros_like(xs)

    def regen(just_died, sample, active, o, d, tm, tp, bounce):
        # mirror trace_pool.regen: camera uniforms from hash_uniforms2.
        # ``active`` is an int32 0/1 mask: Mosaic crashes on i1 vector
        # while_loop carries (minimal repro in PERFLOG.md round 2)
        want = just_died & (sample < n_samples)
        a_w = slot
        b_w = (sample0 + sample.astype(jnp.uint32)) ^ cam_salt
        base = _fmix(a_w + GOLD) ^ (b_w * np.uint32(0x85EBCA6B))
        u0 = _hash_col(base, 0)
        u1 = _hash_col(base, 1)
        u2 = _hash_col(base, 2)
        u3 = _hash_col(base, 3)
        u4 = _hash_col(base, 4)
        if sampler in ("sobol", "sobol-b0"):
            # scrambled Sobol' camera sample (core/qmc.py): dims 1-2 on
            # the pixel, 3-5 on lens disk + shutter time; sobol-b0 keeps
            # the sobol camera dims here (bounce override is queue-only)
            from ..core import qmc

            gs = sample0 + sample.astype(jnp.uint32)
            u0, u1 = qmc.pixel_uniforms(slot, gs, cam_salt)
            u2, u3, u4 = qmc.lens_time_uniforms(slot, gs, cam_salt)
        sx = xs + u0 * f32(inv_w)
        sy = ys + u1 * f32(inv_h)
        # mirror camera.rays_from_uniforms
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
        tp = _where3(want, (jnp.ones_like(tp[0]),) * 3, tp)
        bounce = jnp.where(want, 0, bounce)
        sample = jnp.where(want, sample + 1, sample)
        active = (((active > 0) & ~just_died) | want).astype(jnp.int32)
        return sample, active, o, d, tm, tp, bounce

    # ---- initial state: all lanes regen their first sample ----
    init = regen(
        jnp.ones_like(xs, bool), jnp.zeros_like(slot, jnp.int32),
        jnp.zeros_like(slot, jnp.int32), (zero, zero, zero),
        (zero, zero, zero), zero, (jnp.ones_like(xs),) * 3,
        jnp.zeros_like(slot, jnp.int32),
    )

    g = lambda i, j: geo_ref[i, j]
    n_sphere, n_box = scene.n_sphere, scene.n_box
    n_sb = n_sphere + n_box
    n_solid = scene.n_solid

    def body(carry):
        it, sample, active, o, d, tm, tp, bounce, acc = carry
        krow = keys_ref[pl.ds(it, 1), :]     # (1, 2) uint32 scatter key words
        kd0, kd1 = krow[0, 0], krow[0, 1]

        # ---- intersect sweep (mirror ops/intersect.py::_chunk_t) ----
        a = _dot(d, d)
        inv_a = 1.0 / a
        bt = jnp.full_like(xs, INF)
        # carried winner rows: geometry (c0..c3) + shading (m0..)
        def sel(closer, new, old):
            return jnp.where(closer, new, old)

        def carry_rows(i, closer, st):
            (kv, c0, c1, c2, c3, mk, fz, ri, tk, col0, col1, col2,
             od0, od1, od2, ev0, ev1, ev2, psc, psalt) = st
            kv = sel(closer, g(i, 0), kv)
            mk = sel(closer, g(i, 16), mk)
            fz = sel(closer, g(i, 17), fz)
            ri = sel(closer, g(i, 18), ri)
            tk = sel(closer, g(i, 19), tk)
            col0 = sel(closer, g(i, 20), col0)
            col1 = sel(closer, g(i, 21), col1)
            col2 = sel(closer, g(i, 22), col2)
            od0 = sel(closer, g(i, 23), od0)
            od1 = sel(closer, g(i, 24), od1)
            od2 = sel(closer, g(i, 25), od2)
            ev0 = sel(closer, g(i, 26), ev0)
            ev1 = sel(closer, g(i, 27), ev1)
            ev2 = sel(closer, g(i, 28), ev2)
            psc = sel(closer, g(i, 29), psc)
            psalt = jnp.where(closer, salt_ref[0, i], psalt)
            return (kv, c0, c1, c2, c3, mk, fz, ri, tk, col0, col1, col2,
                    od0, od1, od2, ev0, ev1, ev2, psc, psalt)

        st0 = (zero,) * 19 + (jnp.zeros_like(slot),)

        def sphere_step(i, val):
            bt, st = val
            cx, cy, cz = g(i, 2), g(i, 3), g(i, 4)
            if scene.has_moving:
                dt = tm - g(i, 8)
                cx = cx + g(i, 5) * dt
                cy = cy + g(i, 6) * dt
                cz = cz + g(i, 7) * dt
            ocx, ocy, ocz = o[0] - cx, o[1] - cy, o[2] - cz
            b = ocx * d[0] + ocy * d[1] + ocz * d[2]
            c = ocx * ocx + ocy * ocy + ocz * ocz - g(i, 9) ** 2
            disc = b * b - a * c
            ok = disc > 0.0
            sd = jnp.sqrt(jnp.maximum(disc, 0.0))
            t1 = (-b - sd) * inv_a
            t2 = (-b + sd) * inv_a
            t = jnp.where(ok & (t1 > t_min), t1,
                          jnp.where(ok & (t2 > t_min), t2, INF))
            closer = t < bt
            st = carry_rows(i, closer, st)
            # sphere geometry carry: lerped center + radius
            (kv, c0, c1, c2, c3), rest = st[:5], st[5:]
            c0 = sel(closer, cx, c0)
            c1 = sel(closer, cy, c1)
            c2 = sel(closer, cz, c2)
            c3 = sel(closer, g(i, 9), c3)
            return jnp.where(closer, t, bt), (kv, c0, c1, c2, c3) + rest

        def box_step(i, val):
            bt, st = val
            ix, iy, iz = 1.0 / d[0], 1.0 / d[1], 1.0 / d[2]
            tax = (g(i, 2) - o[0]) * ix
            tbx = (g(i, 5) - o[0]) * ix
            tay = (g(i, 3) - o[1]) * iy
            tby = (g(i, 6) - o[1]) * iy
            taz = (g(i, 4) - o[2]) * iz
            tbz = (g(i, 7) - o[2]) * iz
            t3n = (jnp.minimum(tax, tbx), jnp.minimum(tay, tby),
                   jnp.minimum(taz, tbz))
            t3f = (jnp.maximum(tax, tbx), jnp.maximum(tay, tby),
                   jnp.maximum(taz, tbz))
            tn = jnp.maximum(jnp.maximum(t3n[0], t3n[1]), t3n[2])
            tf = jnp.minimum(jnp.minimum(t3f[0], t3f[1]), t3f[2])
            ok = tf > tn
            t = jnp.where(ok & (tn > t_min), tn,
                          jnp.where(ok & (tf > t_min), tf, INF))
            closer = t < bt
            st = carry_rows(i, closer, st)
            # box normal: +axis one-hot, axis by argmax(t3n) (entry) or
            # argmin(t3f) (exit) - mirror _hit_record's first-extreme rule
            use_entry = tn > t_min
            ax_n = jnp.where(t3n[1] > t3n[0], 1, 0)
            ax_n = jnp.where(t3n[2] > jnp.maximum(t3n[0], t3n[1]), 2, ax_n)
            ax_f = jnp.where(t3f[1] < t3f[0], 1, 0)
            ax_f = jnp.where(t3f[2] < jnp.minimum(t3f[0], t3f[1]), 2, ax_f)
            axis = jnp.where(use_entry, ax_n, ax_f)
            (kv, c0, c1, c2, c3), rest = st[:5], st[5:]
            c0 = sel(closer, (axis == 0).astype(f32), c0)
            c1 = sel(closer, (axis == 1).astype(f32), c1)
            c2 = sel(closer, (axis == 2).astype(f32), c2)
            return jnp.where(closer, t, bt), (kv, c0, c1, c2, c3) + rest

        def quad_step(i, val):
            bt, st = val
            nx, ny, nz = g(i, 5), g(i, 6), g(i, 7)
            dn = d[0] * nx + d[1] * ny + d[2] * nz
            t = (g(i, 8) - (o[0] * nx + o[1] * ny + o[2] * nz)) / dn
            xx = o[0] + t * d[0] - g(i, 2)
            xy = o[1] + t * d[1] - g(i, 3)
            xz = o[2] + t * d[2] - g(i, 4)
            uq = xx * g(i, 10) + xy * g(i, 11) + xz * g(i, 12)
            vq = xx * g(i, 13) + xy * g(i, 14) + xz * g(i, 15)
            ok = (t > t_min) & (uq >= 0.0) & (uq <= 1.0) \
                & (vq >= 0.0) & (vq <= 1.0)
            t = jnp.where(ok, t, INF)
            closer = t < bt
            st = carry_rows(i, closer, st)
            (kv, c0, c1, c2, c3), rest = st[:5], st[5:]
            c0 = sel(closer, nx, c0)
            c1 = sel(closer, ny, c1)
            c2 = sel(closer, nz, c2)
            return jnp.where(closer, t, bt), (kv, c0, c1, c2, c3) + rest

        val = (bt, st0)
        if n_sphere > 0:
            val = jax.lax.fori_loop(0, n_sphere, sphere_step, val)
        if n_box > 0:
            val = jax.lax.fori_loop(n_sphere, n_sb, box_step, val)
        if n_solid > n_sb:
            val = jax.lax.fori_loop(n_sb, n_solid, quad_step, val)
        bt, st = val

        if scene.n_prims > n_solid:
            # constant media (mirror ops/intersect.py::_chunk_t media
            # section, src/Lib.hs:1053-1080): few rows, unrolled with static
            # indices; the free-flight uniform comes from the intersect
            # key's per-(slot, medium) hash stream (rng.lane_uniforms)
            ki0, ki1 = krow[0, 2], krow[0, 3]
            base_i = _fmix(slot + ki0) ^ ki1
            dlen = jnp.sqrt(a)
            for i in range(n_solid, scene.n_prims):
                # sphere boundary: both quadratic roots, unclamped
                ocx, ocy, ocz = o[0] - g(i, 2), o[1] - g(i, 3), o[2] - g(i, 4)
                b = ocx * d[0] + ocy * d[1] + ocz * d[2]
                c = ocx * ocx + ocy * ocy + ocz * ocz - g(i, 9) ** 2
                disc = b * b - a * c
                sd = jnp.sqrt(jnp.maximum(disc, 0.0))
                te = (-b - sd) * inv_a
                tx = (-b + sd) * inv_a
                exists = disc > 0.0
                if scene.has_box_media:
                    # box boundary: slab test in the box's object frame
                    if scene.any_transform:
                        wx = o[0] - g(i, 10)
                        wy = o[1] - g(i, 11)
                        wz = o[2] - g(i, 12)
                        # x_o = R^T (x_w - off); rot rows at cols 30:39
                        rox_o = wx * g(i, 30) + wy * g(i, 33) + wz * g(i, 36)
                        roy_o = wx * g(i, 31) + wy * g(i, 34) + wz * g(i, 37)
                        roz_o = wx * g(i, 32) + wy * g(i, 35) + wz * g(i, 38)
                        rdx_o = d[0] * g(i, 30) + d[1] * g(i, 33) + d[2] * g(i, 36)
                        rdy_o = d[0] * g(i, 31) + d[1] * g(i, 34) + d[2] * g(i, 37)
                        rdz_o = d[0] * g(i, 32) + d[1] * g(i, 35) + d[2] * g(i, 38)
                    else:
                        rox_o, roy_o, roz_o = o
                        rdx_o, rdy_o, rdz_o = d
                    ix, iy, iz = 1.0 / rdx_o, 1.0 / rdy_o, 1.0 / rdz_o
                    tax = (g(i, 2) - rox_o) * ix
                    tbx = (g(i, 5) - rox_o) * ix
                    tay = (g(i, 3) - roy_o) * iy
                    tby = (g(i, 6) - roy_o) * iy
                    taz = (g(i, 4) - roz_o) * iz
                    tbz = (g(i, 7) - roz_o) * iz
                    te_b = jnp.maximum(
                        jnp.maximum(jnp.minimum(tax, tbx),
                                    jnp.minimum(tay, tby)),
                        jnp.minimum(taz, tbz))
                    tx_b = jnp.minimum(
                        jnp.minimum(jnp.maximum(tax, tbx),
                                    jnp.maximum(tay, tby)),
                        jnp.maximum(taz, tbz))
                    # vector mask: Mosaic cannot legalize a scalar-predicate
                    # select over i1 vectors (arith.select fault on hardware)
                    is_sphm = jnp.full_like(xs, g(i, 0)) \
                        == f32(PRIM_MEDIUM_SPHERE)
                    te = jnp.where(is_sphm, te, te_b)
                    tx = jnp.where(is_sphm, tx, tx_b)
                    exists = (is_sphm & exists) | (~is_sphm & (tx_b > te_b))
                # second boundary probe starts at entry + eps
                exists = exists & (tx > te + f32(1e-4))
                rec1 = jnp.maximum(t_min, te)
                u_m = _hash_col(base_i, i - n_solid)
                hit_dist = g(i, 8) * jnp.log(jnp.maximum(u_m, f32(1e-12)))
                ok_m = exists & (rec1 < tx) & (hit_dist <= (tx - rec1) * dlen)
                t = jnp.where(ok_m, rec1 + hit_dist / dlen, INF)
                closer = t < bt
                st = carry_rows(i, closer, st)
                (kv, c0, c1, c2, c3), rest = st[:5], st[5:]
                one = jnp.ones_like(xs)
                c0 = sel(closer, one, c0)
                c1 = sel(closer, zero, c1)
                c2 = sel(closer, zero, c2)
                c3 = sel(closer, one, c3)
                st = (kv, c0, c1, c2, c3) + rest
                bt = jnp.where(closer, t, bt)
        (kv, c0, c1, c2, c3, mk, fz, ri, tk, col0, col1, col2,
         od0, od1, od2, ev0, ev1, ev2, psc, psalt) = st

        # ---- hit record (mirror ops/intersect.py::_hit_record) ----
        hit = jnp.isfinite(bt)
        ts = jnp.where(hit, bt, 1.0)
        px = o[0] + ts * d[0]
        py = o[1] + ts * d[1]
        pz = o[2] + ts * d[2]
        kind_i = kv.astype(jnp.int32)
        mx_r = jnp.maximum(c3, 1e-12)
        n_vec = ((px - c0) / mx_r, (py - c1) / mx_r, (pz - c2) / mx_r)
        if scene.has_quads or scene.has_solid_box or scene.has_media:
            is_sph = kind_i == PRIM_SPHERE
            n_vec = _where3(is_sph, n_vec, (c0, c1, c2))
        front = _dot(d, n_vec) < 0.0
        n_vec = _where3(front, n_vec, (-n_vec[0], -n_vec[1], -n_vec[2]))
        if scene.has_media:
            # medium hits: fixed (1,0,0) normal, front face
            # (src/Lib.hs:1073-1079; ops/intersect.py::_hit_record)
            is_med = kind_i >= PRIM_MEDIUM_SPHERE
            n_vec = _where3(is_med,
                            (jnp.ones_like(xs), zero, zero), n_vec)
            front = front | is_med

        # ---- scatter (mirror ops/scatter.py + textures + lights) ----
        mkind = mk.astype(jnp.int32)
        base = _fmix(slot + kd0) ^ kd1       # rng.lane_uniforms base
        u = lambda i: _hash_col(base, i)

        # texture_value_packed
        att = (col0, col1, col2)
        if scene.has_checker:
            sines = jnp.sin(10.0 * px) * jnp.sin(10.0 * py) * jnp.sin(10.0 * pz)
            odd_first = sines < 0.0
            checker = _where3(odd_first, (od0, od1, od2), (ev0, ev1, ev2))
            att = _where3(tk.astype(jnp.int32) == TEX_CHECKER, checker, att)
        if scene.has_perlin:
            m = _marble(psalt, psc, px, py, pz)
            att = _where3(tk.astype(jnp.int32) == TEX_PERLIN, (m, m, m), att)

        unit_d = _normalize(d)

        if scene.has_emissive:
            emit_m = (mkind == MAT_DIFFUSE_LIGHT) & ~front
            emitted = _where3(emit_m, att, (zero, zero, zero))
        else:
            emitted = (zero, zero, zero)

        branches = []
        if scene.has_lambertian:
            cx_, cy_, cz_ = _cosine_direction_from(u(6), u(7))
            cos_dir = _onb_local(_onb_from_w(n_vec), (cx_, cy_, cz_))
            if n_lights > 0:
                # sample_lights_from (packed row via unrolled select over L)
                pick = jnp.minimum((u(1) * n_lights).astype(jnp.int32),
                                   n_lights - 1)
                lrow = [jnp.full_like(xs, light_ref[0, c]) for c in range(14)]
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
                # lights_pdf: mean density over the light list
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
                    bq = ocx_ * dir_lam[0] + ocy_ * dir_lam[1] + ocz_ * dir_lam[2]
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
                        jnp.full_like(xs, lr(13)) > 0.5, pdf_q, pdf_s)
                pdf_val = 0.5 * (pdf_sum / n_lights + cos_pdf)
                w_mis = jnp.where(pdf_val > 0.0,
                                  cos_pdf / jnp.maximum(pdf_val, 1e-12), 0.0)
                w_lam = (att[0] * w_mis, att[1] * w_mis, att[2] * w_mis)
            else:
                dir_lam = _normalize(cos_dir)
                w_lam = att
            branches.append((MAT_LAMBERTIAN, dir_lam, w_lam))
        if scene.has_metal:
            refl = _reflect(unit_d, n_vec)
            fvx, fvy, fvz = _unit_vector_from(u(8), u(9))
            dir_metal = (refl[0] + fz * fvx, refl[1] + fz * fvy,
                         refl[2] + fz * fvz)
            branches.append((MAT_METAL, dir_metal, att))
        if scene.has_dielectric:
            ratio = jnp.where(front, 1.0 / ri, ri)
            cos_theta = jnp.minimum(
                _dot((-unit_d[0], -unit_d[1], -unit_d[2]), n_vec), 1.0)
            sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
            r0 = ((1.0 - ratio) / (1.0 + ratio)) ** 2
            refl_prob = r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5
            do_reflect = (ratio * sin_theta > 1.0) | (u(10) < refl_prob)
            dir_diel = _where3(do_reflect, _reflect(unit_d, n_vec),
                               _refract(unit_d, n_vec, ratio))
            ones3 = (jnp.ones_like(xs),) * 3
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
            scattered = jnp.ones_like(xs, bool)

        # ---- pool update (mirror trace_pool.body) ----
        act = active > 0
        miss = act & ~hit
        emit = act & hit & ~scattered
        cont = act & hit & scattered
        acc = (acc[0] + jnp.where(miss, tp[0] * bg_ref[0, 0], 0.0),
               acc[1] + jnp.where(miss, tp[1] * bg_ref[0, 1], 0.0),
               acc[2] + jnp.where(miss, tp[2] * bg_ref[0, 2], 0.0))
        acc = (acc[0] + jnp.where(emit, tp[0] * emitted[0], 0.0),
               acc[1] + jnp.where(emit, tp[1] * emitted[1], 0.0),
               acc[2] + jnp.where(emit, tp[2] * emitted[2], 0.0))
        kill = jnp.zeros_like(cont)
        if rr_depth:
            # Russian roulette (ops/scatter.py RR note): p from the
            # INCOMING tp, uniform = scatter-stream column RR_COL
            from ..ops.scatter import RR_COL, RR_PMIN

            tp_in = jnp.maximum(jnp.maximum(tp[0], tp[1]), tp[2])
            p_rr = jnp.minimum(jnp.maximum(tp_in, np.float32(RR_PMIN)),
                               np.float32(1.0))
            do_rr = cont & (bounce >= rr_depth)
            kill = do_rr & (u(RR_COL) >= p_rr)
        tp = _where3(cont, (tp[0] * weight[0], tp[1] * weight[1],
                            tp[2] * weight[2]), tp)
        bounce = jnp.where(cont, bounce + 1, bounce)
        if rr_depth:
            surv = do_rr & ~kill
            tp = _where3(surv, (tp[0] / p_rr, tp[1] / p_rr, tp[2] / p_rr),
                         tp)
        tp_max = jnp.maximum(jnp.maximum(tp[0], tp[1]), tp[2])
        dead_now = act & (
            miss | emit | kill | (cont & (bounce >= max_depth))
            | (cont & (tp_max <= 0.0))
        )
        o = _where3(cont, (px, py, pz), o)
        d = _where3(cont, direction, d)
        sample, active, o, d, tm, tp, bounce = regen(
            dead_now, sample, active, o, d, tm, tp, bounce)
        return (it + 1, sample, active, o, d, tm, tp, bounce, acc)

    def cond(carry):
        it, _, active = carry[0], carry[1], carry[2]
        return jnp.any(active > 0) & (it < iter_cap)

    sample, active, o, d, tm, tp, bounce = init
    carry = (jnp.int32(0), sample, active, o, d, tm, tp, bounce,
             (zero, zero, zero))
    carry = jax.lax.while_loop(cond, body, carry)
    _, sample, _, _, _, _, _, _, acc = carry
    ax_ref[...] = acc[0]
    ay_ref[...] = acc[1]
    az_ref[...] = acc[2]
    ns_ref[...] = sample


def trace_pool_mega(scene: SceneData, camera, s, t, inv_wh, key, n_samples,
                    sample0, max_depth: int, cam_salt=np.uint32(0),
                    slot_ids=None, rr_depth: int = 0,
                    interpret: bool | None = None):
    """Drop-in for integrator.trace_pool on supported() scenes.

    ``n_samples`` must be a static int (it sizes the precomputed key table).
    Returns (accum (R, 3), samples_done (R,)).
    """
    assert supported(scene), "scene outside megakernel scope"
    n_samples = int(n_samples)
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    R = s.shape[0]
    if slot_ids is None:
        slot_ids = jnp.arange(R, dtype=jnp.uint32)
    slot_ids = jnp.asarray(slot_ids, jnp.uint32)
    pad = (-R) % TILE
    if pad:
        s = jnp.pad(s, (0, pad))
        t = jnp.pad(t, (0, pad))
        slot_ids = jnp.pad(slot_ids, (0, pad))
    G = (R + pad) // TILE
    shape2 = (G * TILE_S, TILE_L)
    xs = s.reshape(shape2)
    ys = t.reshape(shape2)
    slot2 = slot_ids.reshape(shape2)

    # precomputed per-iteration scatter key words:
    # key_data(fold_in(fold_in(key, it), 1)) - mirror trace_pool.body
    iter_cap = n_samples * max_depth + max_depth

    def kw(it):
        # cols 0:2 = scatter key words (fold_in(kb, 1)), cols 2:4 = intersect
        # key words (fold_in(kb, 0), feeds the media free-flight draws) -
        # mirror trace_pool.body's two stream keys
        kb = jax.random.fold_in(key, it)
        ks = jax.random.key_data(jax.random.fold_in(kb, 1)).astype(jnp.uint32)
        ki = jax.random.key_data(jax.random.fold_in(kb, 0)).astype(jnp.uint32)
        return jnp.concatenate([ks.reshape(-1)[:2], ki.reshape(-1)[:2]])

    keys = jax.vmap(kw)(jnp.arange(iter_cap)).reshape(iter_cap, 4)

    geo, salt, lights = _build_tables(scene)
    scal = jnp.stack([jnp.asarray(sample0, jnp.uint32),
                      jnp.asarray(cam_salt, jnp.uint32)])[None]  # (1, 2)

    kern = partial(
        _kernel, scene=scene, n_samples=n_samples, max_depth=int(max_depth),
        iter_cap=int(iter_cap), inv_w=float(inv_wh[0]), inv_h=float(inv_wh[1]),
        n_lights=int(scene.n_lights), rr_depth=int(rr_depth),
        sampler=camera.sampler,
    )
    bg = jnp.asarray(scene.background, jnp.float32).reshape(1, 3)
    tile_spec = pl.BlockSpec((TILE_S, TILE_L), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    full = lambda ms: pl.BlockSpec(memory_space=ms)
    ax, ay, az, ns = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            tile_spec, tile_spec, tile_spec,
            full(pltpu.VMEM),                 # keys (iter_cap, 2)
            full(pltpu.SMEM),                 # geo (N, 30)
            full(pltpu.SMEM),                 # salt (1, N)
            full(pltpu.SMEM),                 # lights (L, 25)
            full(pltpu.SMEM),                 # camera (1, 21)
            full(pltpu.SMEM),                 # scalars (1, 2)
            full(pltpu.SMEM),                 # background (1, 3)
        ],
        out_specs=(tile_spec, tile_spec, tile_spec, tile_spec),
        out_shape=(
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.int32),
        ),
        interpret=interpret,
    )(xs, ys, slot2, keys, geo, salt[None], lights, _camera_vec(camera), scal,
      bg)
    accum = jnp.stack([ax.reshape(-1)[:R], ay.reshape(-1)[:R],
                       az.reshape(-1)[:R]], axis=-1)
    return accum, ns.reshape(-1)[:R]
