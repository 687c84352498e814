"""Adaptive-sampling demo/benchmark: quality-matched wall-clock vs uniform.

Renders a scene uniformly at --spp, then adaptively at --tol with the
same per-pixel budget, and reports wall times, the per-pixel sample
distribution, and the display-space (sqrt tone map, 0..255) difference
between the two images.

    python tools/bench_adaptive.py --scene cornell --size 500 --spp 1000
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="cornell")
    p.add_argument("--size", type=int, default=500, help="image W=H")
    p.add_argument("--spp", type=int, default=1000)
    p.add_argument("--tol", type=float, default=0.03)
    p.add_argument("--max-depth", type=int, default=50)
    p.add_argument("--pilot", type=int, default=32)
    p.add_argument("--skip-uniform", action="store_true")
    p.add_argument("--cold", action="store_true",
                   help="time the FIRST runs (include compile/upload); "
                        "default times a second, warm run of each path")
    args = p.parse_args()

    from tpu_ray.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from tpu_ray.adaptive import render_adaptive
    from tpu_ray.models.scenes import SCENES
    from tpu_ray.renderer import render

    spec = SCENES[args.scene]
    scene = spec.build(seed=1024)
    W = H = args.size
    cam = spec.camera(W, H)
    kw = dict(max_depth=args.max_depth, seed=1024)

    def disp(img):
        return np.sqrt(np.clip(img, 0.0, 0.999)) * 256.0

    if not args.skip_uniform:
        if not args.cold:  # warm with the EXACT shapes, then time
            render(scene, cam, W, H, spp=args.spp, **kw)
        t0 = time.perf_counter()
        uni = np.asarray(render(scene, cam, W, H, spp=args.spp, **kw))
        t_uni = time.perf_counter() - t0
        print(f"uniform  {args.spp} spp: {t_uni:.3f}s", file=sys.stderr)

    akw = dict(spp_max=args.spp, tol=args.tol, pilot_spp=args.pilot, **kw)
    if not args.cold:  # warm every bucket executable the run will touch
        render_adaptive(scene, cam, W, H, **akw)
    t0 = time.perf_counter()
    ada, n = render_adaptive(scene, cam, W, H, return_spp=True,
                             progress=True, **akw)
    t_ada = time.perf_counter() - t0
    print(f"adaptive tol={args.tol}: {t_ada:.3f}s  spp min/mean/p99/max = "
          f"{n.min()}/{n.mean():.1f}/{int(np.quantile(n, 0.99))}/{n.max()}",
          file=sys.stderr)
    if not args.skip_uniform:
        d = np.abs(disp(ada) - disp(uni))
        print(f"display |adaptive - uniform|: mean {d.mean():.3f}/255, "
              f"p99 {np.quantile(d, 0.99):.2f}/255", file=sys.stderr)
        print(f"speedup at tol {args.tol}: {t_uni / t_ada:.2f}x "
              f"({t_uni:.3f}s -> {t_ada:.3f}s)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
