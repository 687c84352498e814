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


def _perlin_noise(salt, q):
    """One octave of hash-gradient noise: random gradient per lattice
    corner, hermite-smoothed trilinear interpolation of corner dots.

    TPU-native analogue of the reference ``noise`` (src/Lib.hs:441-461):
    the reference draws its per-corner gradient from a 256-entry table
    indexed by the xor of three shuffled permutations; here the gradient
    comes from a full-avalanche counter hash of the lattice coordinates -
    the same random-gradient-per-corner structure (and the same hermite
    interpolation, src/Lib.hs:472-476), but pure VPU arithmetic.  The
    table version cost 7 octaves x 8 corners x 4 = 224 serial gathers per
    lane per marble evaluation, which made scatter 85% of the wave cost on
    real TPU hardware (PERFLOG.md round 2).  Aperiodic (the table's mod-256
    tiling was a size artifact, not a feature).

    ``salt``: (R,) uint32 per-Perlin-instance stream key; ``q``: (R, 3)
    pre-scaled point.
    """
    from ..core.rng import _murmur3_fmix

    ijk = jnp.floor(q)
    uvw = q - ijk
    # hermite smoothing for the interpolation weights (src/Lib.hs:472-476)
    h = uvw * uvw * (3.0 - 2.0 * uvw)
    # per-axis lattice hashes for both corners (negative coords wrap into
    # uint32 space consistently)
    def corners(c, mult):
        c0 = c.astype(jnp.int32).astype(jnp.uint32) * jnp.uint32(mult)
        return c0, c0 + jnp.uint32(mult)

    hx = corners(ijk[..., 0], 0x8DA6B343)
    hy = corners(ijk[..., 1], 0xD8163841)
    hz = corners(ijk[..., 2], 0xCB1AB31F)
    acc = jnp.zeros(q.shape[:-1], q.dtype)
    to_signed = jnp.float32(2.0 / (1 << 24))
    for di in (0, 1):
        w0 = h[..., 0] if di else 1.0 - h[..., 0]
        ox = uvw[..., 0] - di
        for dj in (0, 1):
            w1 = h[..., 1] if dj else 1.0 - h[..., 1]
            oy = uvw[..., 1] - dj
            for dk in (0, 1):
                w2 = h[..., 2] if dk else 1.0 - h[..., 2]
                oz = uvw[..., 2] - dk
                h1 = _murmur3_fmix(hx[di] ^ hy[dj] ^ hz[dk] ^ salt)
                h2 = _murmur3_fmix(h1 ^ jnp.uint32(0x68E31DA4))
                h3 = _murmur3_fmix(h2 ^ jnp.uint32(0xB5297A4D))
                # gradient components uniform in [-1, 1) (the reference's
                # gradients are uniform in [-1,1]^3, src/Lib.hs:424-427)
                gx = (h1 >> jnp.uint32(8)).astype(jnp.float32) * to_signed - 1.0
                gy = (h2 >> jnp.uint32(8)).astype(jnp.float32) * to_signed - 1.0
                gz = (h3 >> jnp.uint32(8)).astype(jnp.float32) * to_signed - 1.0
                acc = acc + (w0 * w1 * w2) * (gx * ox + gy * oy + gz * oz)
    return acc


def _perlin_noise_table(scene: SceneData, pid, q):
    """One octave of the reference's TABLE noise (src/Lib.hs:441-476):
    gradient = ranvec[permX[(i+di) mod 256] ^ permY[..] ^ permZ[..]],
    hermite-smoothed trilinear interpolation of corner dots.

    The strict-mode (--estimator reference) octave: unlike the default
    hash-gradient redesign above, the noise FIELD here has the
    reference's exact construction - 256-entry shuffled tables, xor
    indexing, mod-256 lattice tiling (VERDICT r4 missing #1).  Cost: 6
    hoisted permutation gathers + 8 gradient-row gathers per lane per
    octave - the measured ~85%-of-wave gather bill that motivated the
    default redesign (PERFLOG round 2), acceptable off the default path.

    ``pid``: (R,) int32 Perlin instance; ``q``: (R, 3) pre-scaled point.
    """
    texs = scene.texs
    P = texs.perlin_perm.shape[0]
    permf = texs.perlin_perm.reshape(-1)      # (P*3*256,)
    ranf = texs.perlin_ranvec.reshape(-1, 3)  # (P*256, 3)
    ijk = jnp.floor(q)
    uvw = q - ijk
    h = uvw * uvw * (3.0 - 2.0 * uvw)
    i0 = ijk.astype(jnp.int32)
    base = pid * jnp.int32(3 * 256)
    # (i + di) mod 256 for possibly-negative lattice coords: & 255 on the
    # two's-complement int32 is the mathematical mod (Haskell `mod`)
    px = [permf[base + ((i0[..., 0] + d) & 255)] for d in (0, 1)]
    py = [permf[base + 256 + ((i0[..., 1] + d) & 255)] for d in (0, 1)]
    pz = [permf[base + 512 + ((i0[..., 2] + d) & 255)] for d in (0, 1)]
    vbase = pid * jnp.int32(256)
    acc = jnp.zeros(q.shape[:-1], q.dtype)
    for di in (0, 1):
        w0 = h[..., 0] if di else 1.0 - h[..., 0]
        ox = uvw[..., 0] - di
        for dj in (0, 1):
            w1 = h[..., 1] if dj else 1.0 - h[..., 1]
            oy = uvw[..., 1] - dj
            for dk in (0, 1):
                w2 = h[..., 2] if dk else 1.0 - h[..., 2]
                oz = uvw[..., 2] - dk
                g = ranf[vbase + (px[di] ^ py[dj] ^ pz[dk])]
                acc = acc + (w0 * w1 * w2) * (
                    g[..., 0] * ox + g[..., 1] * oy + g[..., 2] * oz)
    return acc


def _marble(scene: SceneData, tex_id, p):
    texs = scene.texs
    return marble_from(scene, texs.perlin_id[tex_id], texs.scale[tex_id], p)


def marble_from(scene: SceneData, pid, sc, p):
    """Turbulence-phase marble (reference ``turb``/``marbleTexture``,
    src/Lib.hs:486-494, 512-513): 0.5 * (1 + sin(z + 10 * |sum w_n noise(2^n p)|)),
    7 octaves, noise scaled per texture.  Strict scenes evaluate the
    reference's table noise per octave (_perlin_noise_table); the
    default keeps the hash-gradient field (_perlin_noise)."""
    sc = sc[..., None]
    if scene.strict:
        octave = lambda q: _perlin_noise_table(scene, pid, q)
    else:
        salt = scene.texs.perlin_salt[pid]  # one tiny gather, then pure ALU
        octave = lambda q: _perlin_noise(salt, q)
    acc = jnp.zeros(p.shape[:-1], p.dtype)
    pp = p
    weight = 1.0
    for _ in range(7):
        acc = acc + weight * octave(sc * pp)
        pp = 2.0 * pp
        weight = weight * 0.5
    turb = jnp.abs(acc)
    return 0.5 * (1.0 + jnp.sin(p[..., 2] + 10.0 * turb))


def _image_value(scene: SceneData, tex_id, u, v):
    return image_value_from(scene, scene.texs.image_id[tex_id], u, v)


def image_value_from(scene: SceneData, iid, u, v):
    """Image lookup with the reference's clamping and v-flip (src/Lib.hs:504-509).

    The atlas packs each texel's 8-bit RGB into one uint32
    (models/compile.py), so the per-lane fetch is a single scalar gather -
    measured 3.5 vs 5.2 ms per 390k-lane wave for the 3-wide f32 row gather
    (PERFLOG.md round 2).  colorToAlbedo's /255 (src/Lib.hs:294-297) is
    applied on unpack as byte * (1/255): within 1 ulp of byte/255.
    """
    size = scene.texs.img_size[iid].astype(jnp.float32)  # (R, 2) = (w, h)
    nx, ny = size[..., 0], size[..., 1]
    i = jnp.floor(jnp.clip(u * nx, 0.0, nx - _EPS)).astype(jnp.int32)
    j = jnp.floor(jnp.clip((1.0 - v) * ny - _EPS, 0.0, ny - _EPS)).astype(jnp.int32)
    # single linear index into the flattened atlas: a one-index-vector 1-D
    # gather compiles to a much cheaper op than the (iid, j, i) triple-index
    # form (the three index vectors get concatenated/transposed into an
    # (R, 3) tensor and the gather loses its fast path)
    atlas = scene.texs.img_atlas
    I, H, W = atlas.shape
    lin = (iid * jnp.int32(H) + j) * jnp.int32(W) + i
    w = atlas.reshape(-1)[lin]                           # (R,) packed RGB
    s = jnp.float32(1.0 / 255.0)
    byte = jnp.uint32(0xFF)
    return jnp.stack([
        (w & byte).astype(jnp.float32) * s,
        ((w >> jnp.uint32(8)) & byte).astype(jnp.float32) * s,
        ((w >> jnp.uint32(16)) & byte).astype(jnp.float32) * s,
    ], axis=-1)


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
