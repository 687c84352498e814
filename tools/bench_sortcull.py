"""Time the Pallas solid sweep with/without sort+cull on the device.

    python tools/bench_sortcull.py --scene next-week-final --rays 163840
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="next-week-final")
    p.add_argument("--rays", type=int, default=163840)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_ray.models.scenes import SCENES
    from tpu_ray.ops.intersect_pallas import intersect_solids_pallas

    print("device:", jax.devices()[0], file=sys.stderr)
    scene = SCENES[args.scene].build(seed=1024)
    R = args.rays
    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.uniform(-50, 400, (R, 3)).astype(np.float32))
    rd = jnp.asarray(rng.normal(0, 1, (R, 3)).astype(np.float32))
    rt = jnp.asarray(rng.random(R).astype(np.float32))

    plain = jax.jit(lambda ro, rd, rt: intersect_solids_pallas(
        scene, ro, rd, rt, sort=False))
    sorted_ = jax.jit(lambda ro, rd, rt: intersect_solids_pallas(
        scene, ro, rd, rt, sort=True))

    out = {}
    for name, fn in [("plain", plain), ("sort+cull", sorted_)]:
        bt, bi = fn(ro, rd, rt)
        jax.block_until_ready((bt, bi))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            bt, bi = fn(ro, rd, rt)
        jax.block_until_ready((bt, bi))
        dt = (time.perf_counter() - t0) / args.iters
        out[name] = (dt, np.asarray(bt), np.asarray(bi))
        print(f"{name:10s} {dt*1e3:8.3f} ms/sweep")
    (t0v, bt0, bi0), (t1v, bt1, bi1) = out["plain"], out["sort+cull"]
    h = np.isfinite(bt0)
    print(f"speedup {t0v/t1v:.2f}x  exact: hit {np.array_equal(h, np.isfinite(bt1))}"
          f" t {np.array_equal(bt0[h], bt1[h])} i {np.array_equal(bi0[h], bi1[h])}")


if __name__ == "__main__":
    main()
