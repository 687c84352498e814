"""Microbench the XLA glue a global work-queue scheduler would add per
pool iteration, on hardware:

  (a) film scatter-WRITE: dead lanes' (work-id, radiance) written into a
      per-(pixel, sample) film plane (unique indices - order-free, exact)
  (b) film scatter-ADD: same into a (P, 3) accumulator (order-dependent)
  (c) inject: cumsum over dead mask + arithmetic camera regen for fresh
      work items off a global frontier
  (d) a fori_loop carrying the big film plane, to check XLA aliases the
      scatter in place instead of copying 200MB+ per iteration

Every call gets a DISTINCT scalar argument: repeat calls with identical
inputs have measured anomalously fast through the tunnel (suspected
value-level result caching), so same-input timing loops are not trusted.

    python tools/bench_queue_glue.py --lanes 320000 --pixels 160000 --spp 100
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lanes", type=int, default=320000)
    p.add_argument("--pixels", type=int, default=160000)
    p.add_argument("--spp", type=int, default=100)
    p.add_argument("--dead-frac", type=float, default=0.3)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    from tpu_ray.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    print("device:", jax.devices()[0], file=sys.stderr)
    R, P, S = args.lanes, args.pixels, args.spp

    def time_fn(fn, fargs, iters=args.iters):
        out = fn(jnp.int32(10_000), *fargs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(jnp.int32(i), *fargs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    rng = np.random.default_rng(0)
    dead = jnp.asarray(rng.random(R) < args.dead_frac)
    w_ids = jnp.asarray(rng.integers(0, P * S - args.iters - 1, R), jnp.int32)
    rad = jnp.asarray(rng.random((R, 3)), jnp.float32)

    # (a) scatter-write into the (P*S, 3) sample plane
    plane = jnp.zeros((P * S, 3), jnp.float32)

    @jax.jit
    def scat_write(i, plane, w, r, m):
        idx = jnp.where(m, w + i, P * S)  # dead lanes write; others dropped
        return plane.at[idx].set(r, mode="drop")

    t = time_fn(scat_write, (plane, w_ids, rad, dead)) * 1e3
    print(f"(a) scatter-write (R={R} -> {P*S}x3 plane, {args.dead_frac:.0%} live): {t:8.3f} ms")

    # (b) scatter-add into (P, 3)
    film = jnp.zeros((P, 3), jnp.float32)

    @jax.jit
    def scat_add(i, film, w, r, m):
        idx = jnp.where(m, (w + i) % P, P)
        return film.at[idx].add(r, mode="drop")

    t = time_fn(scat_add, (film, w_ids, rad, dead)) * 1e3
    print(f"(b) scatter-add  (R={R} -> {P}x3 film): {t:8.3f} ms")

    # (c) inject: cumsum ranks + arithmetic work->(x, y, sample) + where3
    o = jnp.asarray(rng.random((R, 3)), jnp.float32)

    @jax.jit
    def inject(i, frontier, dead, o):
        ranks = jnp.cumsum(dead.astype(jnp.int32)) - 1
        w = frontier + i + ranks
        valid = dead & (w < P * S)
        pix = (w % P).astype(jnp.float32)
        x = (pix % 600.0) * (1.0 / 600.0)
        y = jnp.floor(pix * (1.0 / 600.0)) * (1.0 / 400.0)
        # stand-in for rays_from_uniforms: a few transcendental-free ops
        o2 = jnp.stack([x, y, x * y], axis=-1)
        return jnp.where(valid[:, None], o2, o), frontier + jnp.sum(
            dead.astype(jnp.int32))

    t = time_fn(inject, (jnp.int32(0), dead, o)) * 1e3
    print(f"(c) inject (cumsum+arith, R={R}): {t:8.3f} ms")

    # (d) fori_loop carrying the plane: does the scatter alias in place?
    @jax.jit
    def loop_plane(i, plane, w, r, m):
        def body(j, pl):
            idx = jnp.where(m, w + ((i + j) % 16), P * S)
            return pl.at[idx].set(r * (j + 1.0), mode="drop")

        return jax.lax.fori_loop(0, 20, body, plane)

    t = time_fn(loop_plane, (plane, w_ids, rad, dead), iters=5) * 1e3
    print(f"(d) 20-iter fori carrying the {P*S*12/1e6:.0f}MB plane: "
          f"{t:8.3f} ms total, {t/20:.3f} ms/iter")


if __name__ == "__main__":
    raise SystemExit(main())
