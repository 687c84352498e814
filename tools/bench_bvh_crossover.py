"""BVH vs dense-sweep crossover on synthetic big scenes (VERDICT r4 #5).

ops/bvh.py has claimed since round 1 that "the BVH wins once scenes get
large" without a measurement above 3,409 prims.  This benches the three
intersection paths on N-sphere scenes up to 100k prims on real hardware:

  * xla     - the chunk-culled lax.scan dense sweep (production default)
  * pallas  - the fused Pallas VMEM sweep (production for >512 prims)
  * bvh     - stack-based lockstep BVH traversal (ops/bvh.py)

All variants run the pool integrator with XLA shading (TPU_RAY_SHADE=off
is set below) so the comparison isolates intersection cost.  Small image
+ small lane cap keep every dispatch under the remote-worker watchdog at
100k prims.

    python tools/bench_bvh_crossover.py [--sizes 3409,12000,50000,100000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("TPU_RAY_SHADE", "off")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_scene(n: int):
    """n random spheres filling the view frustum + ground, deterministic."""
    import numpy as np

    from tpu_ray.models import objects as ob
    from tpu_ray.models.compile import build_scene

    rng = np.random.default_rng(1024)
    # keep density constant: volume grows with n so the per-ray hit
    # profile stays comparable across sizes
    side = 100.0 * (n / 3409.0) ** (1.0 / 3.0)
    centers = rng.uniform(-side, side, (n, 3))
    centers[:, 1] = rng.uniform(0.5, 2.0 * side, n)  # above the ground
    radii = rng.uniform(0.5, 2.5, n)
    world = [ob.Sphere((0, -10000, 0), 10000.0,
                       ob.Lambertian((0.5, 0.5, 0.5)))]
    for c, r in zip(centers, radii):
        world.append(ob.Sphere(tuple(c), float(r),
                               ob.Lambertian((0.4, 0.6, 0.4))))
    return build_scene(world, background=(0.7, 0.8, 0.9)), side


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="3409,12000,50000,100000")
    p.add_argument("--spp", type=int, default=16)
    p.add_argument("--wh", type=int, default=64)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--lanes", type=int, default=16384)
    p.add_argument("--variants", default="xla,pallas,bvh")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from tpu_ray.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from tpu_ray.core.camera import Camera
    from tpu_ray.renderer import render

    on_tpu = jax.devices()[0].platform.lower() in ("tpu", "axon")
    results = {}
    for n in (int(s) for s in args.sizes.split(",")):
        scene, side = make_scene(n)
        cam = Camera.create((0, 1.2 * side, 3.2 * side), (0, 0.4 * side, 0),
                            (0, 1, 0), 60.0, 1.0, 0.0, 10.0)
        row = {}
        for variant in args.variants.split(","):
            if variant == "pallas" and not on_tpu:
                continue
            kw = dict(spp=args.spp, max_depth=args.depth, seed=1024,
                      mode="pool", rays_per_wave=args.lanes,
                      engine="xla" if variant == "bvh" else variant,
                      bvh=(variant == "bvh"))
            t0 = time.perf_counter()
            img = render(scene, cam, args.wh, args.wh, **kw)
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            img = render(scene, cam, args.wh, args.wh, **kw)
            wall = time.perf_counter() - t0
            row[variant] = round(min(wall, warm), 3)
            print(f"[bvh-x] n={n} {variant}: {wall:.3f}s "
                  f"(first {warm:.1f}s) mean={float(img.mean()):.4f}",
                  file=sys.stderr)
        results[n] = row
    print(json.dumps({"config": f"{args.wh}x{args.wh}@{args.spp}spp"
                      f"d{args.depth} lanes={args.lanes}",
                      "wall_s": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
