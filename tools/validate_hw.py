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
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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
        # hardware vs interpret is NOT bit-exact (Mosaic div/sqrt/fma
        # differ in ulps from the CPU lowering; ~half of all hit lanes
        # differ in the last ulp).  The honest criterion: hit masks agree
        # except grazing rays, t within fp tolerance, prim ids agree
        # wherever t is not a near-tie.
        h_h = np.isfinite(bt_h)
        h_c = np.isfinite(bt_c)
        mask_diff = int((h_h != h_c).sum())
        both = h_h & h_c
        rel = np.abs(bt_h[both] - bt_c[both]) / np.maximum(bt_c[both], 1e-6)
        # mask the miss lanes BEFORE subtracting: both-miss lanes hold
        # +inf on each side and inf-inf is NaN (r3 RuntimeWarning)
        t_h = np.where(both, bt_h, 0.0)
        t_c = np.where(both, bt_c, 0.0)
        firm = both & (np.abs(t_h - t_c) > 1e-5 * np.maximum(np.abs(t_c), 1.0))
        prim_diff = firm & (bi_h != bi_c)
        i_bad = int(prim_diff.sum())
        # grazing hits of r=1000 ground spheres cancel catastrophically
        # (same conditioning note as tests/test_pallas.py rtol=5e-4):
        # p99.9 stays ~1e-4..1e-3 on those scenes, max can reach a few %
        ok = (mask_diff <= R * 1e-3 and rel.max() < 0.1
              and np.quantile(rel, 0.999) < 1e-3 and i_bad <= R // 50000)
        if not ok:
            failures += 1
        # attribution: a phantom-hit regression must be nameable from the
        # driver log alone (scene + lane + prim + both t values).  Prim
        # mismatches always print; plain t diffs only on a failed sweep
        # (they are ulp-scale noise by the thousands on curved scenes)
        detail = prim_diff if ok else firm
        for lane in np.nonzero(detail)[0][:5]:
            print(f"  {name}: firm diff lane {lane}: "
                  f"t_hw={bt_h[lane]:.6g} t_cpu={bt_c[lane]:.6g} "
                  f"prim_hw={int(bi_h[lane])} prim_cpu={int(bi_c[lane])}"
                  f"{' PRIM-MISMATCH' if bi_h[lane] != bi_c[lane] else ''}")
        print(f"{name:20s} sweep {'OK' if ok else 'FAIL'}: "
              f"hits {int(both.sum())}/{R}, mask-diff {mask_diff}, "
              f"rel t max {rel.max():.2e} p99.9 "
              f"{np.quantile(rel, 0.999):.2e}, firm t diffs "
              f"{int(firm.sum())}, firm prim diffs {i_bad}")

    if args.render:
        # compare hardware renders against the committed CPU goldens: the
        # lane-keyed RNG gives identical draws across engines, so the only
        # divergence is fp reassociation between the Mosaic kernels and
        # the XLA-CPU path (tests/goldens/, tests/test_golden.py CONFIGS)
        import os

        from tpu_ray.renderer import render

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from tests.test_golden import CONFIGS, GOLDEN_DIR

        for name in ("two-spheres", "cornell", "book1-final"):
            spp, depth, w, h = CONFIGS[name]
            spec = SCENES[name]
            scene = spec.build(seed=1024, earth=None)
            cam = spec.camera(w, h)
            img_h = np.asarray(render(scene, cam, w, h, spp=spp,
                                      max_depth=depth, seed=1024))
            golden = np.load(os.path.join(GOLDEN_DIR, f"{name}.npy"))
            err = np.abs(img_h - golden).mean()
            ok = err < 0.02
            print(f"{name:20s} render {'OK' if ok else 'FAIL'}: "
                  f"mean |TPU-golden| = {err:.5f}")
            if not ok:
                failures += 1

    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
