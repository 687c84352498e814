"""Phase split of the production pool-step body on real hardware.

The fused body per iteration is exactly two kernels plus glue:
  (a) intersect_ti      - the Pallas solid sweep (+ media pass if any)
  (b) pool_step_pallas  - fused shade + accumulate + update + regen
      (+ the deferred XLA image gather when scene.has_image)

This times each at the scene's production lane count, then one chained
body iteration, so the residual (chain - a - b) exposes XLA glue cost.

    python tools/bench_stepphase.py --scene next-week-final
    python tools/bench_stepphase.py --scene cornell --width 500 --height 500
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, args, iters):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="next-week-final")
    p.add_argument("--width", type=int, default=400)
    p.add_argument("--height", type=int, default=400)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--no-image", action="store_true",
                   help="build the scene without the earth image")
    args = p.parse_args()

    from tpu_ray.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_ray.models.scenes import SCENES
    from tpu_ray.ops.intersect import intersect_ti
    from tpu_ray.ops.shade_pallas import pool_step_pallas
    from tpu_ray.renderer import plan_pool, resolve_engine

    print("device:", jax.devices()[0], file=sys.stderr)
    spec = SCENES[args.scene]
    kw = {"earth": None} if args.no_image else {}
    scene = spec.build(seed=1024, **kw)
    camera = spec.camera(args.width, args.height)
    engine = resolve_engine(scene, "auto")
    k_pool, s_wave, n_waves = plan_pool(scene, args.width, args.height, 100,
                                        engine=engine)
    R = args.width * args.height * k_pool
    print(f"{args.scene}: {scene.n_prims} prims ({scene.n_solid} solid), "
          f"engine={engine}, lanes={R}, has_image={scene.has_image}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.uniform(-50, 400, (R, 3)).astype(np.float32))
    rd = jnp.asarray(rng.normal(0, 1, (R, 3)).astype(np.float32))
    rt = jnp.asarray(rng.random(R).astype(np.float32))
    key = jax.random.PRNGKey(7)
    slot_ids = jnp.arange(R, dtype=jnp.uint32)
    xs = jnp.asarray(rng.random(R).astype(np.float32))
    ys = jnp.asarray(rng.random(R).astype(np.float32))
    tp = jnp.ones((R, 3), jnp.float32)
    ac = jnp.zeros((R, 3), jnp.float32)
    bo = jnp.zeros((R,), jnp.int32)
    sa = jnp.zeros((R,), jnp.int32)
    av = jnp.ones((R,), bool)
    inv_wh = (1.0 / args.width, 1.0 / args.height)

    isect = jax.jit(lambda o, d, t, k_: intersect_ti(
        scene, o, d, t, k_, engine=engine, lane_ids=slot_ids))
    per_isect = timeit(isect, (ro, rd, rt, key), args.iters)
    bt, bi = isect(ro, rd, rt, key)
    print(f"intersect_ti:     {per_isect*1e3:8.3f} ms "
          f"({per_isect/R*1e9:6.2f} ns/lane)")

    step = jax.jit(lambda o, d, t, tp_, ac_, bt_, bi_: pool_step_pallas(
        scene, camera, xs, ys, slot_ids, o, d, t, tp_, ac_, bo, sa, av,
        bt_, bi_, key, 100, jnp.uint32(0), jnp.uint32(0), inv_wh, 50))
    per_step = timeit(step, (ro, rd, rt, tp, ac, bt, bi), args.iters)
    print(f"pool_step_pallas: {per_step*1e3:8.3f} ms "
          f"({per_step/R*1e9:6.2f} ns/lane)")

    def chain(o, d, t, tp_, ac_):
        bt_, bi_ = intersect_ti(scene, o, d, t, key, engine=engine,
                                lane_ids=slot_ids)
        return pool_step_pallas(
            scene, camera, xs, ys, slot_ids, o, d, t, tp_, ac_, bo, sa, av,
            bt_, bi_, key, 100, jnp.uint32(0), jnp.uint32(0), inv_wh, 50)

    chain_j = jax.jit(chain)
    per_chain = timeit(chain_j, (ro, rd, rt, tp, ac), args.iters)
    print(f"chained body:     {per_chain*1e3:8.3f} ms "
          f"({per_chain/R*1e9:6.2f} ns/lane)")
    print(f"residual (glue):  {(per_chain-per_isect-per_step)*1e3:8.3f} ms")
    print(f"step share of body: {per_step/per_chain:.1%}")


if __name__ == "__main__":
    raise SystemExit(main())
