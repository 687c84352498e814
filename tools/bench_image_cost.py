"""Cost of the deferred XLA image-atlas gather in the fused-shade path.

Renders next-week-final with the real earth image vs earth=None (the
reference's missing-image -> cyan degrade, scene.has_image=False) at the
same config; the difference is the per-pool-step image gather + multiply.

    python tools/bench_image_cost.py
"""
from __future__ import annotations

import sys
import time


def main():
    from tpu_ray.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from tpu_ray.models.scenes import SCENES
    from tpu_ray.renderer import render

    print("device:", jax.devices()[0], file=sys.stderr)
    spec = SCENES["next-week-final"]
    cam = spec.camera(400, 400)
    out = {}
    for tag, kw in (("earth", {}), ("no-image", {"earth": None})):
        scene = spec.build(seed=1024, **kw)
        print(f"{tag}: has_image={scene.has_image}", file=sys.stderr)
        render(scene, cam, 400, 400, spp=2, max_depth=50, seed=1024)  # warm
        t0 = time.perf_counter()
        render(scene, cam, 400, 400, spp=40, max_depth=50, seed=1024)
        out[tag] = time.perf_counter() - t0
        print(f"{tag:9s} 400x400@40spp: {out[tag]:.3f}s")
    print(f"image-gather share: {1 - out['no-image'] / out['earth']:.1%}")


if __name__ == "__main__":
    raise SystemExit(main())
