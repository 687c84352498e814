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
    p.add_argument("--samplers", default="uniform,sobol",
                   help="comma list: uniform, sobol, sobol-b0 (the "
                        "first-bounce QMC probe; force --mode queue "
                        "--engine xla, the only path implementing it)")
    p.add_argument("--mode", default="auto")
    p.add_argument("--engine", default="auto")
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
                              max_depth=args.max_depth, seed=101,
                              mode=args.mode, engine=args.engine))

    budgets = [int(s) for s in args.spp.split(",")]
    samplers = [s for s in args.samplers.split(",") if s]
    rows = []
    for spp in budgets:
        row = {"spp": spp}
        for sampler in samplers:
            c = cam.replace(sampler=sampler)
            # warm the executable, then time; MSE is the mean over seeds
            render(scene, c, n, n, spp=spp, max_depth=args.max_depth, seed=3,
                   mode=args.mode, engine=args.engine)
            mses, wall = [], 0.0
            for s in range(args.seeds):
                t0 = time.perf_counter()
                img = np.asarray(render(scene, c, n, n, spp=spp,
                                        max_depth=args.max_depth, seed=3 + s,
                                        mode=args.mode, engine=args.engine))
                wall += time.perf_counter() - t0
                mses.append(float(np.mean((img - truth) ** 2)))
            row[sampler] = (float(np.mean(mses)), wall / args.seeds)
        rows.append(row)
        base = row[samplers[0]][0]
        print("[sampler] spp=%5d  " % spp + "  ".join(
            f"{sm} mse={row[sm][0]:.3e} ({row[sm][1]:.2f}s, "
            f"{base / row[sm][0]:.2f}x)" for sm in samplers),
            file=sys.stderr)

    print("\n| spp | " + " | ".join(
        f"{sm} MSE | {sm} s" for sm in samplers) + " | ratio vs first |")
    print("|---" * (2 * len(samplers) + 2) + "|")
    for r in rows:
        cells = []
        for sm in samplers:
            cells += [f"{r[sm][0]:.3e}", f"{r[sm][1]:.2f}"]
        cells.append(" / ".join(
            f"{r[samplers[0]][0] / r[sm][0]:.2f}x" for sm in samplers[1:]))
        print(f"| {r['spp']} | " + " | ".join(cells) + " |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
