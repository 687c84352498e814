"""Attribute _hit_record's per-wave cost (next-week: ~14.5 ms/iter).

Times the full record rebuild plus each ingredient in isolation, chained
inside one jit so tunnel dispatch overhead (~5-18 ms/op) amortizes:

    python tools/bisect_hitrec.py [--scene next-week-final] [--rays 390144]

Candidate costs: the one-hot payload pull (core/vec.py:take_rows at
N=1409 x 22), the sphere spherical-UV transcendentals (arctan2 + arcsin
for ALL lanes), the solid-box slab recompute, and the quad branch.
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
    p.add_argument("--scene", default="next-week-final")
    p.add_argument("--rays", type=int, default=390144)
    p.add_argument("--chain", type=int, default=8)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tpu_ray.core import vec
    from tpu_ray.models.scenes import SCENES
    from tpu_ray.ops import intersect as isect

    print("device:", jax.devices()[0])
    spec = SCENES[args.scene]
    scene = spec.build(seed=1024)
    cam = spec.camera(400, 400)
    R, C = args.rays, args.chain
    key = jax.random.PRNGKey(0)
    xs = jnp.tile(jnp.linspace(0, 1, 1024), R // 1024)
    ys = jnp.repeat(jnp.linspace(0, 1, R // 1024), 1024)
    ro, rd, rt = cam.get_rays(key, xs, ys)
    # plausible winner indices + finite ts so every branch is live
    idx = (jnp.arange(R, dtype=jnp.int32) * 7919) % scene.n_prims
    ts = 1.0 + (jnp.arange(R, dtype=jnp.float32) % 7.0)

    def chain(fn):
        """fn(ro, rd, ts, idx) -> (R, 3)-ish; C dependent iterations."""

        def run(ro, rd, ts, idx):
            def body(i, carry):
                ro2, acc = carry
                out = fn(ro2, rd, ts, idx)
                out3 = out if out.ndim == 2 else out[:, None]
                ro2 = ro2 + 1e-12 * out3[:, :3] * 0.0 + 1e-12 * jnp.sum(out3)
                return (ro2, acc + jnp.sum(out3))

            return jax.lax.fori_loop(0, C, body, (ro, 0.0))[1]

        return jax.jit(run)

    ms = lambda s: f"{s * 1e3 / C:8.2f} ms/iter"

    full = chain(lambda ro_, rd_, t_, i_: isect._hit_record(
        scene, ro_, rd_, rt, jnp.where(t_ > 0, t_, jnp.inf), i_).normal)
    print("hit_record full     ", ms(bench(full, ro, rd, ts, idx)))

    pull = chain(lambda ro_, rd_, t_, i_: vec.take_rows(
        scene.prim_payload, i_ + (ro_[:, 0] * 0).astype(i_.dtype)))
    print("take_rows pull only ", ms(bench(pull, ro, rd, ts, idx)))

    def trig(ro_, rd_, t_, i_):
        pt = ro_ + t_[:, None] * rd_
        n = pt / jnp.maximum(jnp.linalg.norm(pt, axis=-1, keepdims=True),
                             1e-12)
        phi = jnp.arctan2(n[..., 2], n[..., 0])
        theta = jnp.arcsin(jnp.clip(n[..., 1], -1.0, 1.0))
        return jnp.stack([phi, theta, phi + theta], -1)

    print("sphere trig only    ", ms(bench(chain(trig), ro, rd, ts, idx)))

    def box(ro_, rd_, t_, i_):
        pay = vec.take_rows(scene.prim_payload, i_)
        bmin, bmax = pay[:, 10:13], pay[:, 13:16]
        inv_d = 1.0 / rd_
        ta = (bmin - ro_) * inv_d
        tb = (bmax - ro_) * inv_d
        t3n = jnp.minimum(ta, tb)
        t3f = jnp.maximum(ta, tb)
        axis = jnp.where(jnp.max(t3n, -1) > 1e-3, jnp.argmax(t3n, -1),
                         jnp.argmin(t3f, -1))
        return (axis[:, None] == jnp.arange(3)[None, :]).astype(jnp.float32)

    print("box slab (incl pull)", ms(bench(chain(box), ro, rd, ts, idx)))


if __name__ == "__main__":
    main()
