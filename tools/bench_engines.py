"""Compare render engines wall-clock on the current device.

    python tools/bench_engines.py --scene book1-final --width 300 --height 200 \
        --spp 20 --engines xla,mega

Reports per-engine render seconds (after a warmup compile render) and the
mean-image agreement between engines.
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="book1-final")
    p.add_argument("--width", type=int, default=300)
    p.add_argument("--height", type=int, default=200)
    p.add_argument("--spp", type=int, default=20)
    p.add_argument("--depth", type=int, default=50)
    p.add_argument("--engines", default="xla,mega")
    args = p.parse_args()

    from tpu_ray.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from tpu_ray.models.scenes import SCENES
    from tpu_ray.renderer import render

    print("device:", jax.devices()[0], file=sys.stderr)
    spec = SCENES[args.scene]
    scene = spec.build(seed=1024)
    cam = spec.camera(args.width, args.height)
    print(f"{args.scene}: {scene.n_prims} prims", file=sys.stderr)

    imgs = {}
    for eng in args.engines.split(","):
        t0 = time.perf_counter()
        img = render(scene, cam, args.width, args.height, spp=args.spp,
                     max_depth=args.depth, seed=1024, engine=eng)
        img = np.asarray(img)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        img = np.asarray(render(scene, cam, args.width, args.height,
                                spp=args.spp, max_depth=args.depth,
                                seed=1024, engine=eng))
        hot = time.perf_counter() - t0
        imgs[eng] = img
        print(f"{eng:8s} warm {warm:7.2f}s   hot {hot:7.2f}s   "
              f"mean {img.mean():.6f}")
    engs = list(imgs)
    for i in range(1, len(engs)):
        a, b = imgs[engs[0]], imgs[engs[i]]
        print(f"{engs[0]} vs {engs[i]}: max|d| {np.abs(a - b).max():.3e}  "
              f"mean|d| {np.abs(a - b).mean():.3e}")


if __name__ == "__main__":
    main()
