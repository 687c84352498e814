"""Bisect the scatter cost on the current device (book1 is shading-bound).

Per-op timings through the axon tunnel carry ~5-18 ms of dispatch overhead,
so each variant here runs CHAINED x5 inside one jit (outputs feed the next
iteration's inputs) and reports the marginal per-iteration cost:

    python tools/bisect_scatter.py [--scene book1-final] [--rays 983040]

Variants knock out one scatter ingredient at a time; the delta vs "full"
attributes the cycles.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, reps=10, warmup=2):
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
    p.add_argument("--scene", default="book1-final")
    p.add_argument("--rays", type=int, default=983040)
    p.add_argument("--chain", type=int, default=5)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tpu_ray.core import rng as rng_mod
    from tpu_ray.core import vec
    from tpu_ray.models.scenes import SCENES
    from tpu_ray.ops.intersect import intersect_scene
    from tpu_ray.ops.scatter import scatter

    print("device:", jax.devices()[0])
    spec = SCENES[args.scene]
    scene = spec.build(seed=1024)
    cam = spec.camera(600, 400)
    R, C = args.rays, args.chain
    key = jax.random.PRNGKey(0)
    xs = jnp.tile(jnp.linspace(0, 1, 1024), R // 1024)
    ys = jnp.repeat(jnp.linspace(0, 1, R // 1024), 1024)
    ro, rd, rt = cam.get_rays(key, xs, ys)
    rec = jax.jit(lambda *a: intersect_scene(scene, *a))(ro, rd, rt, key)
    jax.block_until_ready(rec)
    ids = jnp.arange(R, dtype=jnp.uint32)

    def chain(fn):
        """Run fn C times with a data dependence between iterations."""

        def run(rd, rec, key):
            def body(i, carry):
                rd, acc = carry
                out = fn(jax.random.fold_in(key, i), rd, rec)
                # perturb the next direction so iterations can't collapse
                rd2 = rd + 1e-9 * out
                return (rd2, acc + out)

            return jax.lax.fori_loop(0, C, body, (rd, jnp.zeros_like(rd)))[1]

        return jax.jit(run)

    ms = lambda s: f"{s * 1e3 / C:8.2f} ms/iter"

    full = chain(lambda k, rd_, rec_: scatter(scene, k, rd_, rec_, ids).direction)
    print("scatter full        ", ms(bench(full, rd, rec, key)))

    # ingredient: the 14-column murmur3 uniforms
    uni = chain(
        lambda k, rd_, rec_: rng_mod.lane_uniforms(k, ids, 14)[:, :3] + rd_ * 0.0
    )
    print("lane_uniforms(14)   ", ms(bench(uni, rd, rec, key)))

    # ingredient: the material-payload one-hot pull
    rows = chain(
        lambda k, rd_, rec_: vec.take_rows(scene.mat_payload, rec_.mat)[:, :3]
        + rd_ * 0.0
    )
    print(f"take_rows mats {scene.mat_payload.shape}", ms(bench(rows, rd, rec, key)))

    # scatter with the payload pull replaced by row 0 (isolates take_rows)
    import tpu_ray.ops.scatter as scat_mod

    orig_take = vec.take_rows
    try:
        scat_mod.vec.take_rows = lambda tbl, idx: jnp.broadcast_to(
            tbl[0], (idx.shape[0],) + tbl.shape[1:]
        )
        no_rows = chain(
            lambda k, rd_, rec_: scatter(scene, k, rd_, rec_, ids).direction
        )
        print("scatter, const mats ", ms(bench(no_rows, rd, rec, key)))
    finally:
        scat_mod.vec.take_rows = orig_take

    orig_lane = rng_mod.lane_uniforms
    try:
        fixed = jnp.linspace(0.01, 0.99, 14, dtype=jnp.float32)
        scat_mod.rng.lane_uniforms = lambda k, i, n: jnp.broadcast_to(
            fixed[:n], (i.shape[0], n)
        )
        no_uni = chain(
            lambda k, rd_, rec_: scatter(scene, k, rd_, rec_, ids).direction
        )
        print("scatter, const unifs", ms(bench(no_uni, rd, rec, key)))
    finally:
        scat_mod.rng.lane_uniforms = orig_lane

    isect = chain(
        lambda k, rd_, rec_: intersect_scene(scene, rec_.point, rd_, rt, k).t[
            :, None
        ] * jnp.ones((1, 3))
    )
    print("intersect (chained) ", ms(bench(isect, rd, rec, key)))


if __name__ == "__main__":
    main()
