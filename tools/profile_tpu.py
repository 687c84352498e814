"""Microbenchmark the per-iteration cost components on the current device.

Bisection harness: times the integrator body pieces (intersect, scatter,
hit-record gathers, RNG, camera regen) independently so optimization effort
goes where the cycles are.  Run on the real TPU:

    python tools/profile_tpu.py [--scene two-spheres] [--rays 1048576]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, reps=20, warmup=2):
    # NOTE: on the axon remote backend, block_until_ready does not actually
    # wait; force a device->host transfer to measure real completion.
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
    p.add_argument("--scene", default="two-spheres")
    p.add_argument("--rays", type=int, default=1 << 20)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tpu_ray.models.scenes import SCENES
    from tpu_ray.ops.intersect import intersect_scene
    from tpu_ray.ops.scatter import scatter
    from tpu_ray.integrator import trace_pool

    print("device:", jax.devices()[0])
    spec = SCENES[args.scene]
    scene = spec.build(seed=1024)
    cam = spec.camera(600, 400)
    R = args.rays
    key = jax.random.PRNGKey(0)

    # plausible rays: camera rays
    xs = jnp.tile(jnp.linspace(0, 1, 1024), R // 1024)
    ys = jnp.repeat(jnp.linspace(0, 1, R // 1024), 1024)
    ro, rd, rt = cam.get_rays(key, xs, ys)
    jax.block_until_ready((ro, rd, rt))
    ms = lambda s: f"{s * 1e3:8.2f} ms"

    t_uniform = bench(jax.jit(lambda k: jax.random.uniform(k, (R, 12))), key)
    print("uniform (R,12)      ", ms(t_uniform))

    fold_all = jax.jit(
        lambda k, seeds: jax.vmap(lambda kk: jax.random.uniform(kk, (5,)))(
            jax.vmap(jax.random.fold_in, in_axes=(None, 0))(k, seeds)
        )
    )
    seeds = jnp.arange(R, dtype=jnp.uint32)
    t_fold = bench(fold_all, key, seeds)
    print("per-lane fold+unif5 ", ms(t_fold))

    from tpu_ray.core import rng as rng_mod

    t_lane = bench(
        jax.jit(lambda k, s: rng_mod.lane_uniforms(k, s, 14)), key, seeds
    )
    print("lane_uniforms (R,14)", ms(t_lane))

    gather_p = jax.jit(lambda i: scene.prim_payload[i])
    idx = jnp.arange(R, dtype=jnp.int32) % scene.n_prims
    t_gp = bench(gather_p, idx)
    print("prim_payload gather ", ms(t_gp), f"(R,{scene.prim_payload.shape[1]})")

    from tpu_ray.ops.intersect import _hit_record

    t_best = jnp.abs(ro[:, 2]) + 1.0
    t_hr = bench(
        jax.jit(lambda ro, rd, rt, t, i: _hit_record(scene, ro, rd, rt, t, i)),
        ro, rd, rt, t_best, idx,
    )
    print("hit_record          ", ms(t_hr))

    isect = jax.jit(lambda ro, rd, rt, k: intersect_scene(scene, ro, rd, rt, k))
    rec = isect(ro, rd, rt, key)
    t_isect = bench(isect, ro, rd, rt, key)
    print("intersect_scene     ", ms(t_isect), f"({scene.n_prims} prims)")

    scat = jax.jit(lambda k, rd, rec: scatter(scene, k, rd, rec))
    t_scat = bench(scat, key, rd, rec)
    print("scatter             ", ms(t_scat))

    both = jax.jit(
        lambda ro, rd, rt, k: scatter(
            scene, jax.random.fold_in(k, 1), rd,
            intersect_scene(scene, ro, rd, rt, jax.random.fold_in(k, 0)),
        ).weight
    )
    t_both = bench(both, ro, rd, rt, key)
    print("intersect+scatter   ", ms(t_both))

    pool = jax.jit(
        lambda k, n: trace_pool(
            scene, cam, xs, ys, (1 / 600, 1 / 400), k, n, jnp.uint32(0), 50
        )[0]
    )
    for n in (1, 4):
        t_pool = bench(pool, key, jnp.int32(n), reps=3, warmup=1)
        print(f"trace_pool n={n}     ", ms(t_pool), f"~{t_pool/ (n*4+2) * 1e3:.2f} ms/iter est")


if __name__ == "__main__":
    main()
