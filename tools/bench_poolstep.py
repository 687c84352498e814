"""Split the production pool-step cost: solid sweep vs everything else.

Times (a) intersect_solids_pallas alone and (b) one full _pool_step
iteration at the production lane count for a scene, on the default
device.  The difference is the fused shade/step kernel + media + glue.

    python tools/bench_poolstep.py --scene next-week-final
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="next-week-final")
    p.add_argument("--width", type=int, default=400)
    p.add_argument("--height", type=int, default=400)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    from tpu_ray.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tpu_ray.models.scenes import SCENES
    from tpu_ray.ops.intersect_pallas import intersect_solids_pallas
    from tpu_ray.renderer import plan_pool, resolve_engine

    print("device:", jax.devices()[0], file=sys.stderr)
    spec = SCENES[args.scene]
    scene = spec.build(seed=1024)
    engine = resolve_engine(scene, "auto")
    k, lanes, n_waves = plan_pool(scene, args.width, args.height, 100,
                                  1 << 20, engine=engine)
    R = lanes
    print(f"{args.scene}: {scene.n_prims} prims, engine={engine}, "
          f"lanes={R}", file=sys.stderr)

    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.uniform(-50, 400, (R, 3)).astype(np.float32))
    rd = jnp.asarray(rng.normal(0, 1, (R, 3)).astype(np.float32))
    rt = jnp.asarray(rng.random(R).astype(np.float32))

    sweep = jax.jit(lambda a, b, c: intersect_solids_pallas(
        scene, a, b, c, sort=False))
    out = sweep(ro, rd, rt)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = sweep(ro, rd, rt)
    jax.block_until_ready(out)
    per_sweep = (time.perf_counter() - t0) / args.iters
    pairs = R * (scene.n_solid + 127) // 128 * 128
    print(f"solid sweep: {per_sweep*1e3:8.3f} ms "
          f"({pairs/per_sweep/1e9:.1f} Gpairs/s)")


if __name__ == "__main__":
    raise SystemExit(main())
