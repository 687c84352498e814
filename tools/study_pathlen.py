"""Path-length survival study: how much work would Russian roulette save?

Steps the plain wavefront body (same isect/scatter kernels and RNG
layout as integrator.trace) over camera rays for a scene, recording the
alive-lane fraction after every bounce.  From the survival curve and the
per-lane throughput it prices throughput-proportional Russian roulette
(survive with p = clamp(max(throughput), pmin, 1), weight /= p) started
at a given depth: expected lane-iterations with RR vs without.

    python tools/study_pathlen.py --scene cornell --spp 4 --size 64
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="cornell")
    p.add_argument("--size", type=int, default=64, help="image W=H")
    p.add_argument("--spp", type=int, default=4)
    p.add_argument("--max-depth", type=int, default=50)
    p.add_argument("--rr-depth", type=int, default=3)
    p.add_argument("--pmin", type=float, default=0.05)
    p.add_argument("--platform", default="cpu")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from tpu_ray.core import vec
    from tpu_ray.integrator import _make_isect
    from tpu_ray.models.scenes import SCENES
    from tpu_ray.ops.scatter import scatter

    spec = SCENES[args.scene]
    scene = spec.build(seed=1024)
    W = H = args.size
    camera = spec.camera(W, H)

    key = jax.random.PRNGKey(0)
    R = W * H * args.spp
    lane_ids = jnp.arange(R, dtype=jnp.uint32)
    px = (jnp.arange(R) // args.spp) % W
    py = (jnp.arange(R) // args.spp) // W
    ku, kv, kc = jax.random.split(jax.random.fold_in(key, 7), 3)
    s = (px + jax.random.uniform(ku, (R,))) / W
    t = 1.0 - (py + jax.random.uniform(kv, (R,))) / H
    ro, rd, rt = camera.get_rays(kc, s, t)

    isect = _make_isect(scene, None, "xla")

    @jax.jit
    def step(bounce, origin, direction, throughput, alive):
        kb = jax.random.fold_in(key, bounce)
        rec = isect(origin, direction, rt, jax.random.fold_in(kb, 0),
                    lane_ids)
        sc = scatter(scene, jax.random.fold_in(kb, 1), direction, rec,
                     lane_ids)
        cont = alive & rec.hit & sc.scattered
        throughput = vec.where3(cont, throughput * sc.weight, throughput)
        alive2 = cont & (jnp.max(throughput, axis=-1) > 0.0)
        return (vec.where3(cont, rec.point, origin),
                vec.where3(cont, sc.direction, direction),
                throughput, alive2)

    origin, direction = ro, rd
    throughput = jnp.ones((R, 3), jnp.float32)
    alive = jnp.ones((R,), bool)
    surv, rr_work, tp_mean = [], 0.0, []
    # RR pricing: a lane alive at bounce b >= rr_depth survives the NEXT
    # bounce with p = clamp(max(throughput), pmin, 1); expected work is
    # the product of survival probabilities (independent approximation).
    rr_alive_frac = 1.0
    rr_cum = []
    for b in range(args.max_depth):
        a = float(jnp.mean(alive))
        tp = np.asarray(jnp.max(throughput, axis=-1))
        al = np.asarray(alive)
        surv.append(a)
        if b >= args.rr_depth and a > 0:
            pk = np.clip(tp[al], args.pmin, 1.0)
            keep = float(pk.mean())
        else:
            keep = 1.0
        rr_alive_frac = a if b < args.rr_depth else rr_alive_frac * keep
        rr_cum.append(min(rr_alive_frac, a))
        tp_mean.append(float(tp[al].mean()) if al.any() else 0.0)
        if a == 0.0:
            break
        origin, direction, throughput, alive = step(
            b, origin, direction, throughput, alive)

    surv = np.array(surv)
    rr_cum = np.array(rr_cum)
    mean_len = surv.sum()
    rr_len = rr_cum.sum()
    print(f"scene={args.scene} R={R} max_depth={args.max_depth}")
    print("bounce  alive%   maxTP(alive)  rr-alive%")
    for b in range(len(surv)):
        if surv[b] > 0.0005 or b < 8:
            print(f"{b:5d}  {100*surv[b]:6.2f}  {tp_mean[b]:11.4f}"
                  f"  {100*rr_cum[b]:8.2f}")
    print(f"mean path length      : {mean_len:.3f} bounces")
    print(f"with RR(depth>={args.rr_depth}, pmin={args.pmin}): "
          f"{rr_len:.3f} ({100 * (1 - rr_len / mean_len):.1f}% fewer "
          f"lane-iterations)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
