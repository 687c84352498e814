"""Time the classic vs MXU static-sphere Pallas sweeps on the device.

    python tools/bench_mxu_sweep.py --rays 983040 --scene book1-final
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="book1-final")
    p.add_argument("--rays", type=int, default=983040)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_ray.models.scenes import SCENES
    from tpu_ray.ops.intersect_pallas import (_sweep_range,
                                              _sweep_sphere_mxu, TILE_R)

    print("device:", jax.devices()[0], file=sys.stderr)
    scene = SCENES[args.scene].build(seed=1024)
    n = scene.n_sphere_static
    print(f"{args.scene}: {n} static spheres", file=sys.stderr)
    R = args.rays - args.rays % TILE_R
    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.uniform(-15, 15, (R, 3)).astype(np.float32))
    rd = jnp.asarray(rng.normal(0, 1, (R, 3)).astype(np.float32))
    rt = jnp.zeros((R, 1), np.float32)

    classic = jax.jit(lambda ro, rd, rt: _sweep_range(
        scene, ro, rd, rt, 0, n, "sphere", False, moving=False))
    mxu = jax.jit(lambda ro, rd, rt: _sweep_sphere_mxu(
        scene, ro, rd, rt, 0, n, False))

    out = {}
    for name, fn in [("classic", classic), ("mxu", mxu)]:
        bt, bi = fn(ro, rd, rt)
        jax.block_until_ready((bt, bi))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            bt, bi = fn(ro, rd, rt)
        jax.block_until_ready((bt, bi))
        dt = (time.perf_counter() - t0) / args.iters
        out[name] = (dt, np.asarray(bt), np.asarray(bi))
        print(f"{name:8s} {dt*1e3:8.3f} ms/sweep "
              f"({R*n/dt/1e12:.2f} Tpairs/s)")
    (t0v, bt0, bi0), (t1v, bt1, bi1) = out["classic"], out["mxu"]
    both = (bt0 < 3e38) & (bt1 < 3e38)
    only = (bt0 < 3e38) != (bt1 < 3e38)
    rel = np.abs(bt1[both] - bt0[both]) / np.maximum(bt0[both], 1e-6)
    print(f"speedup {t0v/t1v:.2f}x   t rel err mean {rel.mean():.2e} "
          f"max {rel.max():.2e}   idx agree {(bi0[both]==bi1[both]).mean():.4f}"
          f"   hit-set flips {only.sum()}/{both.size} (grazing rays)")


if __name__ == "__main__":
    main()
