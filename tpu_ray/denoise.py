"""AOV-guided denoiser: cross-bilateral filtering of the beauty pass.

Production path tracers ship a feature-guided denoiser consuming the
albedo/normal(/depth) buffers (OIDN, OptiX denoiser).  The reference has
no analogue (its only output is the raw Monte-Carlo PPM,
app/Main.hs:59-63); this is a framework extension layered on the AOV
passes (tpu_ray/aov.py).

Design: a cross-bilateral (joint) filter.  Each pixel's radiance is a
weighted mean over a (2r+1)^2 window, with weights the product of

  spatial   exp(-(dx^2+dy^2) / 2 sigma_s^2)
  albedo    exp(-||da||^2    / 2 sigma_a^2)   edges in texture/material
  normal    exp(-||dn||^2    / 2 sigma_n^2)   geometric silhouettes/creases
  depth     exp(-(dd/scale)^2 / 2 sigma_d^2)  depth discontinuities
            (dd relative to the window center's depth; misses (+inf)
            never exchange energy with hits)

The window is evaluated as (2r+1)^2 static shifts (jnp.roll) so the
whole filter is one fused XLA program - no gathers, TPU-friendly - and
the border is handled by masking rolled-in wraparound texels to weight
zero.  Luma-preserving: weights normalize to 1, so a constant image is a
fixed point; a noise-free edge between two albedos is exactly preserved
(weights vanish across it).

This is an estimator POST-PROCESS: biased like every practical denoiser,
so it is opt-in (`--denoise`) and never the benchmark or golden path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["denoise"]


@partial(jax.jit, static_argnames=("radius",))
def denoise(img, albedo, normal, depth, radius: int = 3,
            sigma_spatial: float = 2.0, sigma_albedo: float = 0.1,
            sigma_normal: float = 0.25, sigma_depth: float = 0.02):
    """Cross-bilateral denoise of a linear (H, W, 3) radiance image.

    ``albedo``/``normal``: (H, W, 3) first-hit AOVs; ``normal`` may be 0
    where nothing was hit.  ``depth``: (H, W) mean hit distance, +inf on
    misses; ``sigma_depth`` is RELATIVE (fraction of the center depth).
    Returns the filtered (H, W, 3) image, same dtype/space as ``img``.
    """
    H, W, _ = img.shape
    img = jnp.asarray(img, jnp.float32)
    albedo = jnp.asarray(albedo, jnp.float32)
    normal = jnp.asarray(normal, jnp.float32)
    depth = jnp.asarray(depth, jnp.float32)

    hit = jnp.isfinite(depth)
    # depth scale: relative differences; miss pixels only pair with misses
    safe_depth = jnp.where(hit, depth, 0.0)

    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]

    acc = jnp.zeros_like(img)
    wsum = jnp.zeros((H, W), jnp.float32)
    inv2_s = 0.5 / (sigma_spatial * sigma_spatial)
    inv2_a = 0.5 / (sigma_albedo * sigma_albedo)
    inv2_n = 0.5 / (sigma_normal * sigma_normal)
    inv2_d = 0.5 / (sigma_depth * sigma_depth)

    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            sh = lambda a: jnp.roll(a, (dy, dx), axis=(0, 1))
            # mask wraparound: a rolled-in texel from the far edge is not
            # a neighbor
            valid = ((ys - dy >= 0) & (ys - dy < H)
                     & (xs - dx >= 0) & (xs - dx < W))
            da = albedo - sh(albedo)
            dn = normal - sh(normal)
            n_hit = sh(hit)
            dd = jnp.where(hit & n_hit,
                           (safe_depth - sh(safe_depth))
                           / jnp.maximum(safe_depth, 1e-6), 0.0)
            w = jnp.exp(-(dy * dy + dx * dx) * inv2_s
                        - jnp.sum(da * da, axis=-1) * inv2_a
                        - jnp.sum(dn * dn, axis=-1) * inv2_n
                        - dd * dd * inv2_d)
            # hit/miss boundaries never exchange energy
            w = jnp.where(hit == n_hit, w, 0.0)
            w = jnp.where(valid, w, 0.0)
            acc = acc + w[..., None] * sh(img)
            wsum = wsum + w
    return acc / jnp.maximum(wsum, 1e-12)[..., None]
