"""Measure the scrambled-Sobol image-plane sampler against uniform jitter.

Renders a scene at several equal sample budgets with both samplers and
reports MSE (linear radiance space) against a high-spp truth render, plus
wall time - the claim under test is "same cost, lower variance".

Usage:  python tools/bench_sampler.py [--scene cornell] [--size 200]
        [--spp 16,64,256] [--truth-spp 8192]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_ray.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np  # noqa: E402

from tpu_ray.models.scenes import SCENES  # noqa: E402
from tpu_ray.renderer import render  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="cornell")
    p.add_argument("--size", type=int, default=200)
    p.add_argument("--spp", default="16,64,256")
    p.add_argument("--truth-spp", type=int, default=8192)
    p.add_argument("--max-depth", type=int, default=50)
    p.add_argument("--seeds", type=int, default=1,
                   help="report mean MSE over this many render seeds")
    args = p.parse_args()

    spec = SCENES[args.scene]
    scene = spec.build(seed=1024)
    cam = spec.camera(args.size, args.size)
    n = args.size

    print(f"[sampler] truth: {args.scene} {n}x{n} @ {args.truth_spp} spp",
          file=sys.stderr)
    # truth seed must not collide with any comparison seed (a shared seed
    # at lower spp is a prefix of the truth's sample stream -> correlated)
    truth = np.asarray(render(scene, cam, n, n, spp=args.truth_spp,
                              max_depth=args.max_depth, seed=101))

    budgets = [int(s) for s in args.spp.split(",")]
    rows = []
    for spp in budgets:
        row = {"spp": spp}
        for sampler in ("uniform", "sobol"):
            c = cam.replace(sampler=sampler)
            # warm the executable, then time; MSE is the mean over seeds
            render(scene, c, n, n, spp=spp, max_depth=args.max_depth, seed=3)
            mses, wall = [], 0.0
            for s in range(args.seeds):
                t0 = time.perf_counter()
                img = np.asarray(render(scene, c, n, n, spp=spp,
                                        max_depth=args.max_depth, seed=3 + s))
                wall += time.perf_counter() - t0
                mses.append(float(np.mean((img - truth) ** 2)))
            row[sampler] = (float(np.mean(mses)), wall / args.seeds)
        u, q = row["uniform"][0], row["sobol"][0]
        rows.append(row)
        print(f"[sampler] spp={spp:5d}  uniform mse={u:.3e} "
              f"({row['uniform'][1]:.2f}s)  sobol mse={q:.3e} "
              f"({row['sobol'][1]:.2f}s)  ratio={u / q:.2f}x", file=sys.stderr)

    print("\n| spp | uniform MSE | sobol MSE | variance ratio | "
          "uniform s | sobol s |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        u, q = r["uniform"], r["sobol"]
        print(f"| {r['spp']} | {u[0]:.3e} | {q[0]:.3e} | "
              f"{u[0] / q[0]:.2f}x | {u[1]:.2f} | {q[1]:.2f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
