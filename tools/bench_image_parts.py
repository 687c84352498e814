"""Break down the deferred image-albedo cost at production lane count.

Times, at R=320000 lanes on the default device:
  uv:     the arctan2/arcsin sphere-uv chain (XLA, all lanes)
  size:   the per-lane img_size row gather
  atlas:  the packed-uint32 linear atlas gather
  full:   image_value_from + where-multiply (what the fused path pays)
"""
from __future__ import annotations

import sys
import time

import numpy as np


def bench(fn, *args, iters=50):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from tpu_ray.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tpu_ray.models.scenes import SCENES
    from tpu_ray.ops.textures import image_value_from

    print("device:", jax.devices()[0], file=sys.stderr)
    scene = SCENES["next-week-final"].build(seed=1024)
    R = 320000
    rng = np.random.default_rng(0)
    n = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    n = n / jnp.linalg.norm(n, axis=1, keepdims=True)
    iid = jnp.zeros((R,), jnp.int32)
    flag = jnp.asarray((rng.random(R) < 0.02).astype(np.int32))
    tp = jnp.ones((R, 3), jnp.float32)

    @jax.jit
    def uv(n):
        phi = jnp.arctan2(n[:, 2], n[:, 0])
        theta = jnp.arcsin(jnp.clip(n[:, 1], -1.0, 1.0))
        return (1.0 - (phi + jnp.pi) / (2 * jnp.pi),
                (theta + jnp.pi / 2) / jnp.pi)

    @jax.jit
    def size_gather(iid):
        return scene.texs.img_size[iid]

    @jax.jit
    def atlas_gather(iid, u, v):
        return image_value_from(scene, iid, u, v)

    @jax.jit
    def full(n, iid, flag, tp):
        u, v = uv(n)
        att = image_value_from(scene, iid, u, v)
        return jnp.where((flag > 0)[:, None], tp * att, tp)

    u, v = uv(n)
    for name, t in [
        ("uv chain", bench(uv, n)),
        ("img_size gather", bench(size_gather, iid)),
        ("atlas fetch (incl size+unpack)", bench(atlas_gather, iid, u, v)),
        ("full deferred block", bench(full, n, iid, flag, tp)),
    ]:
        print(f"{name:32s} {t*1e3:7.3f} ms")


if __name__ == "__main__":
    raise SystemExit(main())
