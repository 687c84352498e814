"""Price the two candidate v2 flush designs for the queue integrator.

v1 (landed): 3x 1D scatter of ALL R rows into the 16M plane = 8.6 ms/iter.
Candidates:
  A. compacted staging: 1D int32 scatter R rows -> C=R/4 stage map, 3
     gathers of C rows, then 3x 1D scatter C rows -> plane.
  B. position map + log: 1D int32 scatter R rows -> plane-sized posmap
     (2.9 ms measured) + 3 free DUS log appends; amortized plane
     materialization = 3x 1D gather of 16M rows from a 32M log.

This measures the missing numbers: small-dest int32 scatter, C-row
gathers, C-row scatters, and the 16M-from-32M gather.

    python tools/bench_flush_v2.py
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lanes", type=int, default=390347)
    p.add_argument("--rows", type=int, default=16_000_000)
    p.add_argument("--log", type=int, default=32_000_000)
    p.add_argument("--k", type=int, default=50)
    args = p.parse_args()

    from tpu_ray.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    print("device:", jax.devices()[0], file=sys.stderr)
    R, k, N = args.lanes, args.k, args.rows
    C = R // 4
    rng = np.random.default_rng(0)
    died = jnp.asarray(rng.random(R) < 0.23)
    base_ids = jnp.asarray(rng.permutation(N - k - 1)[:R], jnp.int32)
    vals = jnp.asarray(rng.random((R,)), jnp.float32)

    def timeit(make_loop, dest, iters=3):
        fn = jax.jit(make_loop, donate_argnums=0)
        out = fn(dest, jnp.int32(0))
        jax.block_until_ready(out)
        times = []
        for i in range(iters):
            d = jax.tree.map(jnp.zeros_like, out)
            jax.block_until_ready(d)
            t0 = time.perf_counter()
            out2 = fn(d, jnp.int32(i + 1))
            _ = float(jax.tree.leaves(out2)[0].ravel()[0])
            times.append(time.perf_counter() - t0)
        return min(times) / k

    def control(dest, salt):
        return jax.lax.fori_loop(
            0, k, lambda j, d: jax.tree.map(lambda a: a + a.dtype.type(0), d),
            dest)

    # A1: int32 scatter R rows -> C-row stage map
    prank = jnp.cumsum(died.astype(jnp.int32)) - 1

    def stage_build(dest, salt):
        def body(j, d):
            idx = jnp.where(died & (prank < C), prank,
                            C + jnp.arange(R, dtype=jnp.int32))
            return d.at[idx].set(jnp.arange(R, dtype=jnp.int32) + j + salt,
                                 mode="drop", unique_indices=True)
        return jax.lax.fori_loop(0, k, body, dest)

    base = timeit(control, jnp.zeros((C,), jnp.int32))
    t = timeit(stage_build, jnp.zeros((C,), jnp.int32))
    print(f"A1 int32 scatter R -> C={C} stage     : {(t-base)*1e3:8.3f} ms")

    # A2: gather C rows from R + scatter C rows -> 16M plane (x3 channels)
    lanes_c = jnp.asarray(rng.integers(0, R, C), jnp.int32)

    def gath_scat(dest, salt):
        def body(j, d):
            v = vals[lanes_c + (j + salt) % 7]          # C-row gather
            w = base_ids[lanes_c] + j + salt            # C-row gather
            return d.at[w].set(v, mode="drop", unique_indices=True)
        return jax.lax.fori_loop(0, k, body, dest)

    base = timeit(control, jnp.zeros((N,), jnp.float32))
    t = timeit(gath_scat, jnp.zeros((N,), jnp.float32))
    print(f"A2 per channel: 2 gathers + C->16M set: {(t-base)*1e3:8.3f} ms")

    # B1: cumsum alone (shared by A; posmap needs none)
    def cs(dest, salt):
        def body(j, d):
            return d + jnp.cumsum((died ^ (j % 2 == 0)).astype(jnp.int32))
        return jax.lax.fori_loop(0, k, body, dest)

    base = timeit(control, jnp.zeros((R,), jnp.int32))
    t = timeit(cs, jnp.zeros((R,), jnp.int32))
    print(f"B1 cumsum over R                      : {(t-base)*1e3:8.3f} ms")

    # B2: materialize gather, 16M rows from 32M log (per channel), plus
    # the posmap>=0 select
    logv = jnp.asarray(rng.random(args.log), jnp.float32)
    posm = jnp.asarray(rng.integers(-1, args.log, N), jnp.int32)

    def materialize(dest, salt):
        def body(j, d):
            idx = jnp.clip(posm + j + salt, 0, args.log - 1)
            return jnp.where(posm >= 0, logv[idx], d)
        return jax.lax.fori_loop(0, 3, body, dest)

    base_m = timeit(control, jnp.zeros((N,), jnp.float32)) * k / 3
    fn = jax.jit(materialize, donate_argnums=0)
    out = fn(jnp.zeros((N,), jnp.float32), jnp.int32(0))
    jax.block_until_ready(out)
    times = []
    for i in range(3):
        d = jnp.zeros((N,), jnp.float32)
        jax.block_until_ready(d)
        t0 = time.perf_counter()
        out2 = fn(d, jnp.int32(i + 1))
        _ = float(out2[0])
        times.append(time.perf_counter() - t0)
    t = min(times) / 3
    print(f"B2 materialize 16M gather from 32M log: {(t-base_m)*1e3:8.3f} ms"
          f" per channel pass")

    # B3: DUS append R rows into the 32M log at moving offset
    def dus(dest, salt):
        def body(j, d):
            off = ((j + salt) * jnp.int32(R)) % jnp.int32(args.log - R)
            return jax.lax.dynamic_update_slice(d, vals, (off,))
        return jax.lax.fori_loop(0, k, body, dest)

    base = timeit(control, jnp.zeros((args.log,), jnp.float32))
    t = timeit(dus, jnp.zeros((args.log,), jnp.float32))
    print(f"B3 DUS R rows -> 32M log              : {(t-base)*1e3:8.3f} ms")


if __name__ == "__main__":
    raise SystemExit(main())
