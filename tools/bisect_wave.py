"""Ground-truth per-iteration attribution of the wavefront pool on device.

Times, at the SAME lane count the production path uses:
  * trace_pool per-iteration cost by differencing n_samples=1 vs 3
    (real loop, real state traffic), and
  * the chained cost of intersect (chosen engine), scatter, and
    intersect+scatter fused - with a data dependence between iterations so
    tunnel dispatch overhead amortizes and XLA cannot dead-code anything.

The residual (pool - isect+scatter) is loop state traffic + regen + RNG.

    python tools/bisect_wave.py --scene next-week-final --engine pallas
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
    p.add_argument("--engine", default="pallas")
    p.add_argument("--rays", type=int, default=0)
    p.add_argument("--chain", type=int, default=8)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tpu_ray.integrator import _make_isect, trace_pool
    from tpu_ray.models.scenes import SCENES
    from tpu_ray.ops.scatter import scatter
    from tpu_ray.renderer import pallas_lane_cap

    print("device:", jax.devices()[0], file=sys.stderr)
    spec = SCENES[args.scene]
    scene = spec.build(seed=1024)
    cam = spec.camera(400, 400)
    R = args.rays or (pallas_lane_cap(scene.n_prims) // 1024 * 1024)
    C = args.chain
    print(f"{args.scene}: {scene.n_prims} prims, R={R}, engine={args.engine}")
    key = jax.random.PRNGKey(0)
    xs = jnp.tile(jnp.linspace(0, 1, 1024), R // 1024)
    ys = jnp.repeat(jnp.linspace(0, 1, R // 1024), 1024)
    ro, rd, rt = cam.get_rays(key, xs, ys)
    ids = jnp.arange(R, dtype=jnp.uint32)
    isect = _make_isect(scene, None, args.engine)
    rec0 = jax.jit(isect)(ro, rd, rt, key, ids)
    jax.block_until_ready(rec0)
    ms = lambda s: f"{s * 1e3 / C:8.2f} ms/iter"

    def chain_isect(ro, rd, rt, key):
        def body(i, carry):
            ro2, acc = carry
            rec = isect(ro2, rd, rt, jax.random.fold_in(key, i), ids)
            ro2 = ro2 + 1e-12 * rec.point * 0.0 + 1e-12 * jnp.sum(rec.t)
            return (ro2, acc + rec.t)

        return jax.lax.fori_loop(0, C, body, (ro, jnp.zeros_like(rt)))[1]

    t_i = bench(jax.jit(chain_isect), ro, rd, rt, key)
    print("intersect chained   ", ms(t_i))

    def chain_scat(rd, key):
        def body(i, carry):
            rd2, acc = carry
            out = scatter(scene, jax.random.fold_in(key, i), rd2, rec0, ids)
            rd2 = rd2 + 1e-9 * out.direction
            return (rd2, acc + out.weight)

        return jax.lax.fori_loop(0, C, body, (rd, jnp.zeros_like(rd)))[1]

    t_s = bench(jax.jit(chain_scat), rd, key)
    print("scatter chained     ", ms(t_s))

    def chain_both(ro, rd, rt, key):
        def body(i, carry):
            ro2, rd2, acc = carry
            kb = jax.random.fold_in(key, i)
            rec = isect(ro2, rd2, rt, jax.random.fold_in(kb, 0), ids)
            out = scatter(scene, jax.random.fold_in(kb, 1), rd2, rec, ids)
            ro2 = jnp.where(rec.hit[:, None], rec.point, ro2)
            rd2 = out.direction
            return (ro2, rd2, acc + out.weight)

        return jax.lax.fori_loop(0, C, body, (ro, rd, jnp.zeros_like(rd)))[2]

    t_b = bench(jax.jit(chain_both), ro, rd, rt, key)
    print("isect+scatter chain ", ms(t_b))

    pool = jax.jit(lambda k, n: trace_pool(
        scene, cam, xs, ys, (1.0 / 400, 1.0 / 400), k, n, jnp.uint32(0), 50,
        engine=args.engine)[0], static_argnums=1)
    for n in (1, 3):
        t_p = bench(pool, key, n, reps=3, warmup=1)
        print(f"trace_pool n={n}      {t_p * 1e3:8.1f} ms total")


if __name__ == "__main__":
    main()
