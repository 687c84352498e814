"""Time full renders, pool vs queue mode, one process (exclusive worker).

    python tools/bench_mode.py --scene next-week-final --spp 100 \
        --width 400 --height 400 --modes pool,queue
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="next-week-final")
    p.add_argument("--width", type=int, default=400)
    p.add_argument("--height", type=int, default=400)
    p.add_argument("--spp", type=int, default=100)
    p.add_argument("--depth", type=int, default=50)
    p.add_argument("--modes", default="pool,queue")
    p.add_argument("--repeat", type=int, default=2)
    args = p.parse_args()

    from tpu_ray.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np

    from tpu_ray.models.scenes import SCENES
    from tpu_ray.renderer import render

    print("device:", jax.devices()[0], file=sys.stderr)
    spec = SCENES[args.scene]
    scene = spec.build(seed=1024)
    camera = spec.camera(args.width, args.height)

    imgs = {}
    for mode in args.modes.split(","):
        times = []
        for r in range(args.repeat):
            t0 = time.perf_counter()
            img = render(scene, camera, args.width, args.height, args.spp,
                         max_depth=args.depth, seed=1024, mode=mode)
            dt = time.perf_counter() - t0
            times.append(dt)
            print(f"{mode:6s} run {r}: {dt:8.3f} s", flush=True)
        imgs[mode] = img
        print(f"{mode:6s} best : {min(times):8.3f} s  mean px "
              f"{float(np.mean(img)):.6f}", flush=True)
    if len(imgs) == 2:
        a, b = imgs.values()
        d = np.abs(a - b)
        print(f"mode diff: max {d.max():.3e} mean {d.mean():.3e} "
              f"(MC-noise-level expected; streams differ by design)")


if __name__ == "__main__":
    raise SystemExit(main())
