"""Render driver: sample waves, accumulation, checkpointing.

Replaces the reference's row-by-row spark pipeline (``runRender``,
src/Lib.hs:1491-1523): instead of one RNG per image column threaded row to
row, every wave renders k jittered samples for every pixel of the image in
one wavefront (W*H*k rays), and waves accumulate into an (H, W, 3) film until
the target samples-per-pixel is reached.  Wave keys are derived from the
global wave index, so the result is independent of how waves are scheduled
(host loop here, device mesh in tpu_ray.parallel).

Monte-Carlo accumulation is associative, so the film doubles as a
checkpoint: pass ``checkpoint_path`` to make the render resumable (the
reference's only "resume" story is that finished rows were already on
stdout - SURVEY.md section 5).
"""
from __future__ import annotations

import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .core.camera import Camera
from .integrator import trace
from .models.scene_data import SceneData


def pick_samples_per_wave(width: int, height: int, spp: int, rays_per_wave: int) -> int:
    """Largest divisor of spp with width*height*k <= rays_per_wave."""
    k = max(1, min(rays_per_wave // max(width * height, 1), spp))
    while spp % k:
        k -= 1
    return k


def make_wave_fn(scene: SceneData, camera: Camera, width: int, height: int,
                 k: int, max_depth: int):
    """Build fn(key) -> (H, W, 3) sum of k radiance samples per pixel.

    Pixel (col x, image row r) maps to screen fractions
    u = (x + ju)/W, v = (H-1-r + jv)/H with jitter j ~ U[0,1), matching
    ``uniformRandomUVs`` + ``pixelPositions`` (src/Lib.hs:1352-1371, 1488-1489).
    """
    ys = jnp.broadcast_to(
        jnp.arange(height - 1, -1, -1, dtype=jnp.float32)[None, :, None],
        (k, height, width),
    ).reshape(-1)
    xs = jnp.broadcast_to(
        jnp.arange(width, dtype=jnp.float32)[None, None, :], (k, height, width)
    ).reshape(-1)

    def wave(key):
        k_jit, k_cam, k_path = jax.random.split(key, 3)
        jitter = jax.random.uniform(k_jit, (xs.shape[0], 2))
        u = (xs + jitter[:, 0]) / width
        v = (ys + jitter[:, 1]) / height
        ro, rd, rt = camera.get_rays(k_cam, u, v)
        rad = trace(scene, ro, rd, rt, k_path, max_depth)
        return rad.reshape(k, height, width, 3).sum(axis=0)

    return wave


def render(
    scene: SceneData,
    camera: Camera,
    width: int,
    height: int,
    spp: int,
    max_depth: int = 50,
    seed: int = 1024,
    rays_per_wave: int = 1 << 20,
    mesh=None,
    progress: bool = False,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
) -> np.ndarray:
    """Render to a linear (H, W, 3) float32 image (mean over spp samples)."""
    k = pick_samples_per_wave(width, height, spp, rays_per_wave)
    n_waves = spp // k
    base_key = jax.random.PRNGKey(seed)
    wave_fn = make_wave_fn(scene, camera, width, height, k, max_depth)

    if mesh is not None:
        from .parallel.mesh import render_sharded

        accum = render_sharded(wave_fn, n_waves, base_key, mesh, (height, width, 3))
        return np.asarray(accum) / spp

    step = jax.jit(lambda acc, key: acc + wave_fn(key), donate_argnums=0)
    accum = jnp.zeros((height, width, 3), jnp.float32)
    start_wave = 0

    if checkpoint_path:
        try:
            ck = np.load(checkpoint_path)
            if int(ck["k"]) == k and int(ck["n_waves"]) == n_waves:
                accum = jnp.asarray(ck["accum"])
                start_wave = int(ck["waves_done"])
                if progress:
                    print(f"\nresuming at wave {start_wave}", file=sys.stderr)
        except (FileNotFoundError, KeyError):
            pass

    for w in range(start_wave, n_waves):
        if progress:
            print(f"\rRendering wave {w + 1} of {n_waves}", end="", file=sys.stderr)
        accum = step(accum, jax.random.fold_in(base_key, w))
        if checkpoint_path and checkpoint_every and (w + 1) % checkpoint_every == 0:
            np.savez(
                checkpoint_path, accum=np.asarray(accum), waves_done=w + 1,
                k=k, n_waves=n_waves,
            )
    if progress:
        print(file=sys.stderr)
    return np.asarray(accum) / spp
