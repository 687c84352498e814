"""Knockout attribution of the HONEST fused isect+scatter chain.

bisect_wave.py's fused chain costs ~39 ms/iter on next-week while the sum
of its separately-chained parts is ~24 ms - and isolated scatter lets XLA
hoist record-dependent work.  Here the same fused chain is recompiled with
static scene flags knocked out one at a time (renders would be wrong; only
the timing delta matters):

    python tools/bisect_fused.py [--scene next-week-final]
"""
from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, reps=6, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / reps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="next-week-final")
    p.add_argument("--rays", type=int, default=390144)
    p.add_argument("--chain", type=int, default=8)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tpu_ray.integrator import _make_isect
    from tpu_ray.models.scenes import SCENES
    from tpu_ray.ops.scatter import scatter

    print("device:", jax.devices()[0], file=sys.stderr)
    spec = SCENES[args.scene]
    scene0 = spec.build(seed=1024)
    cam = spec.camera(400, 400)
    R, C = args.rays, args.chain
    key = jax.random.PRNGKey(0)
    xs = jnp.tile(jnp.linspace(0, 1, 1024), R // 1024)
    ys = jnp.repeat(jnp.linspace(0, 1, R // 1024), 1024)
    ro, rd, rt = cam.get_rays(key, xs, ys)
    ids = jnp.arange(R, dtype=jnp.uint32)
    ms = lambda s: f"{s * 1e3 / C:8.2f} ms/iter"

    def fused(scene, do_scatter=True):
        isect = _make_isect(scene, None, "pallas")

        def run(ro, rd, rt, key):
            def body(i, carry):
                ro2, rd2, acc = carry
                kb = jax.random.fold_in(key, i)
                rec = isect(ro2, rd2, rt, jax.random.fold_in(kb, 0), ids)
                if do_scatter:
                    out = scatter(scene, jax.random.fold_in(kb, 1), rd2, rec,
                                  ids)
                    d_new, w = out.direction, out.weight
                else:
                    d_new = rd2 * (1.0 - 1e-9 * rec.t[:, None])
                    w = rec.normal
                ro2 = jnp.where(rec.hit[:, None], rec.point, ro2)
                return (ro2, d_new, acc + w)

            return jax.lax.fori_loop(0, C, body, (ro, rd, jnp.zeros_like(rd)))[2]

        return jax.jit(run)

    variants = [
        ("full", scene0, True),
        ("isect+record only", scene0, False),
        ("no image", scene0.replace(has_image=False), True),
        ("no perlin", scene0.replace(has_perlin=False), True),
        ("no media", scene0.replace(
            has_media=False, n_media=0,
            n_prims=scene0.n_solid), True),
    ]
    for name, sc, do_s in variants:
        try:
            t = bench(fused(sc, do_s), ro, rd, rt, key)
            print(f"{name:20s}", ms(t))
        except Exception as e:  # knocked-out combos may be inconsistent
            print(f"{name:20s} FAILED {type(e).__name__}: {e}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
