"""Hardware-vs-interpret validation sweep.

The Mosaic kernels are developed and tested in interpret mode on CPU;
real-TPU divergence has historically come from lowering differences the
tests can't see (denormal flush in f32 gathers, SMEM capacity, vector
masks - see PERFLOG.md).  This tool runs the production solid sweep on
the DEFAULT device and in interpret mode on CPU over random rays for
every benchable scene and demands bit-exact agreement, then renders a
small image on both and compares within Monte-Carlo tolerance.

    python tools/validate_hw.py            # full check (~minutes: compiles)
    python tools/validate_hw.py --scenes cornell,next-week-final

Exit code 0 = all checks pass.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

RAY_BOXES = {
    "book1-final": (-12, 12),
    "two-spheres": (-15, 15),
    "cornell": (0, 555),
    "cornell-smoke": (0, 555),
    "next-week-final": (-100, 600),
    "simple-light": (-10, 10),
    "two-perlin-spheres": (-10, 10),
    "earth": (-6, 6),
    "random-moving": (-12, 12),
}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--scenes", default=",".join(RAY_BOXES))
    p.add_argument("--rays", type=int, default=163840)
    p.add_argument("--render", action="store_true",
                   help="also render 32x24@16spp on both platforms")
    args = p.parse_args()

    from tpu_ray.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tpu_ray.models.scenes import SCENES
    from tpu_ray.ops.intersect_pallas import intersect_solids_pallas

    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    print(f"device under test: {dev}", file=sys.stderr)
    if dev.platform == "cpu":
        print("no accelerator attached; nothing to validate", file=sys.stderr)
        return 0

    failures = 0
    for name in filter(None, args.scenes.split(",")):
        lo, hi = RAY_BOXES[name]
        scene = SCENES[name].build(seed=1024)
        if scene.n_solid <= 0:
            continue
        rng = np.random.default_rng(7)
        R = args.rays
        ro = jnp.asarray(rng.uniform(lo, hi, (R, 3)).astype(np.float32))
        rd = jnp.asarray(rng.normal(0, 1, (R, 3)).astype(np.float32))
        rt = jnp.asarray(rng.random(R).astype(np.float32))

        bt_h, bi_h = map(np.asarray, jax.jit(
            lambda a, b, c, s=scene: intersect_solids_pallas(
                s, a, b, c, interpret=False))(ro, rd, rt))
        with jax.default_device(cpu):
            cs = SCENES[name].build(seed=1024)
            bt_c, bi_c = map(np.asarray, jax.jit(
                lambda a, b, c, s=cs: intersect_solids_pallas(
                    s, a, b, c, interpret=True))(
                np.asarray(ro), np.asarray(rd), np.asarray(rt)))
        h = np.isfinite(bt_c)
        t_eq = np.array_equal(bt_h, bt_c)
        # index ties at EXACTLY equal t may resolve differently (Mosaic
        # argmin vs interpret on equal lanes); count only t-backed diffs
        i_diff = int(((bi_h != bi_c) & h & (bt_h == bt_c)).sum())
        status = "OK" if t_eq else "FAIL"
        if not t_eq:
            failures += 1
        nbad = int((bt_h != bt_c).sum())
        print(f"{name:20s} sweep {status}: hits {int(h.sum())}/{R}, "
              f"t-mismatch {nbad}, index-only ties {i_diff}")

    if args.render:
        from tpu_ray.renderer import render

        for name in ("two-spheres", "cornell"):
            spec = SCENES[name]
            scene = spec.build(seed=1024)
            cam = spec.camera(32, 24)
            img_h = np.asarray(render(scene, cam, 32, 24, spp=16,
                                      max_depth=8, seed=3))
            with jax.default_device(cpu):
                cs = spec.build(seed=1024)
                img_c = np.asarray(render(cs, cam, 32, 24, spp=16,
                                          max_depth=8, seed=3))
            err = np.abs(img_h - img_c).mean()
            ok = err < 0.02
            print(f"{name:20s} render {'OK' if ok else 'FAIL'}: "
                  f"mean |TPU-CPU| = {err:.5f}")
            if not ok:
                failures += 1

    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
