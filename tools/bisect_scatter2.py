"""Attribute scatter's varying-input cost on next-week (chained honestly).

bisect_wave.py showed scatter with a loop-invariant hit record times at
9 ms/iter but adds ~25 ms/iter when the record varies - XLA hoists the
texture/payload work out of the invariant chain.  This probe varies ONLY
the suspect input of each ingredient:

    python tools/bisect_scatter2.py [--scene next-week-final] [--rays 390144]
"""
from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, reps=6, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / reps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="next-week-final")
    p.add_argument("--rays", type=int, default=390144)
    p.add_argument("--chain", type=int, default=8)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tpu_ray.core import vec
    from tpu_ray.models.scenes import SCENES
    from tpu_ray.ops.textures import image_value_from, marble_from
    from tpu_ray.ops.lights import lights_pdf, sample_lights_from
    from tpu_ray.core import rng

    print("device:", jax.devices()[0], file=sys.stderr)
    spec = SCENES[args.scene]
    scene = spec.build(seed=1024)
    R, C = args.rays, args.chain
    print(f"{args.scene}: n_mats={scene.mat_payload.shape[0]}, "
          f"atlas={None if not scene.has_image else scene.texs.img_atlas.shape}")
    key = jax.random.PRNGKey(0)
    uv = jax.random.uniform(key, (R, 2))
    pt = jax.random.uniform(key, (R, 3)) * 500.0
    mat_idx = (jnp.arange(R, dtype=jnp.int32) * 131) % scene.mat_payload.shape[0]
    ids = jnp.arange(R, dtype=jnp.uint32)
    ms = lambda s: f"{s * 1e3 / C:8.2f} ms/iter"

    def chain(fn, x0):
        def run(x):
            def body(i, carry):
                x, acc = carry
                out = fn(x, i)
                s = jnp.sum(out)
                return (x + 1e-12 * s, acc + s)

            return jax.lax.fori_loop(0, C, body, (x, 0.0))[1]

        return jax.jit(run), x0

    if scene.has_image:
        iid = jnp.zeros((R,), jnp.int32)
        f, x0 = chain(lambda x, i: image_value_from(
            scene, iid, uv[:, 0] * 0 + x[:, 0], uv[:, 1] * 0 + x[:, 1]), uv)
        print("image gather (vary) ", ms(bench(f, x0)))

    if scene.has_perlin:
        f, x0 = chain(lambda x, i: marble_from(
            scene, jnp.zeros((R,), jnp.int32), jnp.full((R,), 0.1), x), pt)
        print("marble (vary p)     ", ms(bench(f, x0)))

    f, x0 = chain(lambda x, i: vec.take_rows(
        scene.mat_payload, mat_idx + (x[:, 0] * 0).astype(jnp.int32)),
        uv)
    print("mat take_rows (vary) ", ms(bench(f, x0)))

    if scene.n_lights > 0:
        u5 = jax.random.uniform(key, (R, 5))
        f, x0 = chain(lambda x, i: sample_lights_from(scene, u5, x), pt)
        print("sample_lights (vary)", ms(bench(f, x0)))
        d = vec.normalize(jax.random.normal(key, (R, 3)))
        f, x0 = chain(lambda x, i: lights_pdf(scene, x, d), pt)
        print("lights_pdf (vary)   ", ms(bench(f, x0)))

    f, x0 = chain(lambda x, i: rng.lane_uniforms(
        jax.random.fold_in(key, i), ids, 14) + x[:, :1] * 0, uv)
    print("lane_uniforms 14    ", ms(bench(f, x0)))


if __name__ == "__main__":
    main()
