"""First-hit AOV passes: albedo, normal, depth, coverage.

Production path tracers emit auxiliary feature buffers alongside the
beauty pass - albedo and shading normal are the standard denoiser inputs
(OIDN/OptiX), depth feeds compositing and focus tooling.  The reference
has no analogue (its only output is the beauty PPM, app/Main.hs:59-63);
this is a framework extension, additive to the reference surface.

Design: a depth-1 wavefront.  Each sample wave draws its camera rays from
the SAME per-(pixel, sample) streams as the beauty render (the uniform
hash jitter or the Owen-scrambled Sobol' point, matching
integrator._make_pool_loop's regen draws), runs ONE intersect sweep, and
fetches shade-free features from the hit record:

  albedo    texture value at the hit (the scatter attenuation; emissive
            materials contribute their emitted color) - miss -> background
  normal    faceNormal-flipped unit shading normal - miss contributes 0;
            the per-pixel mean is re-normalized where it is nonzero
  depth     Euclidean distance from the ray origin to the hit point,
            averaged over HITTING samples only; a pixel with no hits at
            all is +inf
  coverage  fraction of samples that hit anything

All buffers are averaged over ``spp`` sample waves through one reused
executable (the wave index is traced, not compiled in).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .core import qmc
from .core import rng as rng_mod
from .core import vec
from .models.scene_data import SceneData
from .ops.intersect import intersect_scene
from .ops.textures import texture_value, texture_value_packed

AOV_NAMES = ("albedo", "normal", "depth", "coverage")


def _camera_rays(camera, slot_ids, sample_idx, cam_salt, s, t, inv_w, inv_h):
    """Primary rays for one sample wave, drawn from the beauty pass's
    camera streams (integrator._make_pool_loop regen; qmc for sobol)."""
    gs = jnp.broadcast_to(sample_idx.astype(jnp.uint32), slot_ids.shape)
    if camera.sampler == "sobol":
        jx, jy = qmc.pixel_uniforms(slot_ids, gs, cam_salt)
        u3 = jnp.stack(qmc.lens_time_uniforms(slot_ids, gs, cam_salt),
                       axis=-1)
    else:
        u5 = rng_mod.hash_uniforms2(slot_ids, gs ^ cam_salt, 5)
        jx, jy = u5[:, 0], u5[:, 1]
        u3 = u5[:, 2:5]
    return camera.rays_from_uniforms(s + jx * inv_w, t + jy * inv_h, u3)


@partial(jax.jit, static_argnums=(3, 4, 7), donate_argnums=0)
def _aov_step(acc, scene: SceneData, camera, width: int, height: int,
              sample_idx, cam_salt, engine: str, slot0=0):
    """Accumulate one sample wave's first-hit features into ``acc``.

    ``slot0`` is the GLOBAL pixel index of the band's first lane (traced,
    so band position never recompiles); the per-lane camera streams are
    keyed by global slot id, making band-tiled output bit-identical to a
    full-frame pass (same contract as renderer band tiling).
    """
    P_band = acc["depth"].shape[0]
    slot_ids = jnp.uint32(slot0) + jnp.arange(P_band, dtype=jnp.uint32)
    # image row 0 is the TOP of the frame (renderer._pixel_grid)
    row = (slot_ids // width).astype(jnp.float32)
    col = (slot_ids % width).astype(jnp.float32)
    ys = (height - 1 - row) / height
    xs = col / width
    ro, rd, rt = _camera_rays(camera, slot_ids, sample_idx, cam_salt,
                              xs, ys, 1.0 / width, 1.0 / height)
    key = jax.random.fold_in(
        jax.random.fold_in(jax.random.PRNGKey(0), cam_salt), sample_idx)
    rec = intersect_scene(scene, ro, rd, rt, key, engine=engine,
                          lane_ids=slot_ids)

    mp = vec.take_rows(scene.mat_payload, rec.mat)  # (P, 16)
    if scene.checker_fancy:
        att = texture_value(scene, scene.mats.tex[rec.mat], rec.u, rec.v,
                            rec.point)
    else:
        att = texture_value_packed(scene, mp, rec.u, rec.v, rec.point)
    hit = rec.hit
    albedo = vec.where3(hit, att, scene.background)
    dist = rec.t * vec.length(rd)

    return {
        "albedo": acc["albedo"] + albedo,
        "normal": acc["normal"] + vec.where3(hit, rec.normal, 0.0),
        "depth": acc["depth"] + jnp.where(hit, dist, 0.0),
        "hits": acc["hits"] + hit.astype(jnp.float32),
    }


def render_aovs(scene: SceneData, camera, width: int, height: int,
                spp: int = 16, seed: int = 0, engine: str = "xla",
                band_cap: int | None = None) -> dict:
    """Render the first-hit AOV buffers.

    Returns a dict of (H, W[, 3]) float32 arrays: ``albedo``, ``normal``
    (mean shading normal, re-normalized; 0 where nothing was ever hit),
    ``depth`` (mean hit distance; +inf where nothing was ever hit) and
    ``coverage`` (hit fraction in [0, 1]).

    The frame is processed in horizontal bands under the SAME device lane
    caps as the beauty pass (renderer.XLA_BIG_SCENE_LANES /
    pallas_lane_cap), so a full-resolution pass on a >512-prim scene
    respects HBM limits; global slot ids keep banded output bit-identical
    to an unbanded pass.  ``band_cap`` overrides the cap (tests).
    """
    from .renderer import XLA_BIG_SCENE_LANES, pallas_lane_cap

    if band_cap is None:
        band_cap = (XLA_BIG_SCENE_LANES
                    if engine in ("xla", "mxu") and scene.n_prims > 512
                    else pallas_lane_cap(scene.n_prims))
    cam_salt = jnp.uint32(seed)
    band_h = max(1, band_cap // width)
    parts = []
    for row0 in range(0, height, band_h):
        bh = min(band_h, height - row0)
        bp = bh * width
        acc = {
            "albedo": jnp.zeros((bp, 3), jnp.float32),
            "normal": jnp.zeros((bp, 3), jnp.float32),
            "depth": jnp.zeros((bp,), jnp.float32),
            "hits": jnp.zeros((bp,), jnp.float32),
        }
        for s in range(spp):
            acc = _aov_step(acc, scene, camera, width, height, jnp.uint32(s),
                            cam_salt, engine, jnp.uint32(row0 * width))
        parts.append(acc)
    acc = {k: jnp.concatenate([p[k] for p in parts]) for k in parts[0]}
    hits = acc["hits"]
    some = hits > 0
    n_mean = acc["normal"] / spp
    n_len = vec.length(n_mean)
    normal = jnp.where((some & (n_len > 1e-12))[:, None],
                       n_mean / jnp.maximum(n_len, 1e-12)[:, None], 0.0)
    depth = jnp.where(some, acc["depth"] / jnp.maximum(hits, 1.0),
                      jnp.float32(jnp.inf))
    return {
        "albedo": (acc["albedo"] / spp).reshape(height, width, 3),
        "normal": normal.reshape(height, width, 3),
        "depth": depth.reshape(height, width),
        "coverage": (hits / spp).reshape(height, width),
    }


def aov_images(aovs: dict) -> dict:
    """Map raw AOV buffers to displayable [0, 1] RGB images.

    albedo is already linear [0,1]; normals map to the usual (n+1)/2
    encoding; depth is normalized by its finite maximum (misses -> 1);
    coverage is grayscale.
    """
    import numpy as np

    albedo = np.clip(np.asarray(aovs["albedo"]), 0.0, 1.0)
    normal = (np.asarray(aovs["normal"]) + 1.0) * 0.5
    depth = np.asarray(aovs["depth"])
    finite = np.isfinite(depth)
    dmax = float(depth[finite].max()) if finite.any() else 1.0
    d01 = np.where(finite, depth / max(dmax, 1e-12), 1.0)
    cov = np.asarray(aovs["coverage"])
    return {
        "albedo": albedo,
        "normal": np.clip(normal, 0.0, 1.0),
        "depth": np.repeat(d01[..., None], 3, axis=-1).astype(np.float32),
        "coverage": np.repeat(cov[..., None], 3, axis=-1).astype(np.float32),
    }
