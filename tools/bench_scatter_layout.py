"""Layout variants for the queue flush scatter: (N,3) row scatter vs
planar 1D scatters vs int32 position-map scatter.

TPU arrays are (8,128)-tiled; a (R,3)-row scatter into a (16M,3) operand
updates 12-byte slivers of tiles.  Planar (three 1D scatters, or one
(3,N) axis-1 scatter) may lower very differently.

    python tools/bench_scatter_layout.py
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
    p.add_argument("--k", type=int, default=50)
    args = p.parse_args()

    from tpu_ray.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    print("device:", jax.devices()[0], file=sys.stderr)
    R, k, N = args.lanes, args.k, args.rows
    rng = np.random.default_rng(0)
    rad = jnp.asarray(rng.random((R, 3)), jnp.float32)
    died = jnp.asarray(rng.random(R) < 0.23)
    base_ids = jnp.asarray(rng.permutation(N - k - 1)[:R], jnp.int32)
    sent = N + jnp.arange(R, dtype=jnp.int32)

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

    base = timeit(control, jnp.zeros((N, 3), jnp.float32))
    print(f"control (N,3): {base*1e3:8.3f} ms/iter")

    def row(dest, salt):
        def body(j, d):
            idx = jnp.where(died, base_ids + j + salt, sent)
            return d.at[idx].set(rad, mode="drop", unique_indices=True)
        return jax.lax.fori_loop(0, k, body, dest)

    t = timeit(row, jnp.zeros((N, 3), jnp.float32))
    print(f"(N,3) row scatter      : {(t-base)*1e3:8.3f} ms/iter")

    base1 = timeit(control, tuple(jnp.zeros((N,), jnp.float32)
                                  for _ in range(3)))

    def planar(dest, salt):
        def body(j, ds):
            idx = jnp.where(died, base_ids + j + salt, sent)
            return tuple(
                d.at[idx].set(rad[:, c], mode="drop", unique_indices=True)
                for c, d in enumerate(ds))
        return jax.lax.fori_loop(0, k, body, dest)

    t = timeit(planar, tuple(jnp.zeros((N,), jnp.float32) for _ in range(3)))
    print(f"3x 1D scatter          : {(t-base1)*1e3:8.3f} ms/iter")

    base2 = timeit(control, jnp.zeros((3, N), jnp.float32))

    def axis1(dest, salt):
        def body(j, d):
            idx = jnp.where(died, base_ids + j + salt, sent)
            return d.at[:, idx].set(rad.T, mode="drop",
                                    unique_indices=True)
        return jax.lax.fori_loop(0, k, body, dest)

    t = timeit(axis1, jnp.zeros((3, N), jnp.float32))
    print(f"(3,N) axis-1 scatter   : {(t-base2)*1e3:8.3f} ms/iter")

    base3 = timeit(control, jnp.zeros((N,), jnp.int32))

    def posmap(dest, salt):
        def body(j, d):
            idx = jnp.where(died, base_ids + j + salt, sent)
            return d.at[idx].set(jnp.arange(R, dtype=jnp.int32) + j,
                                 mode="drop", unique_indices=True)
        return jax.lax.fori_loop(0, k, body, dest)

    t = timeit(posmap, jnp.zeros((N,), jnp.int32))
    print(f"1D int32 position map  : {(t-base3)*1e3:8.3f} ms/iter")

    # packed rgb: 3x f32 -> one u32 (11/11/10-bit mantissa loss is NOT
    # acceptable for the film; this row only probes the cost structure)
    def packed(dest, salt):
        def body(j, d):
            idx = jnp.where(died, base_ids + j + salt, sent)
            word = (rad[:, 0] * 1023).astype(jnp.uint32)
            return d.at[idx].set(word, mode="drop", unique_indices=True)
        return jax.lax.fori_loop(0, k, body, dest)

    t = timeit(packed, jnp.zeros((N,), jnp.uint32))
    print(f"1D u32 scatter         : {(t-base3)*1e3:8.3f} ms/iter")


if __name__ == "__main__":
    raise SystemExit(main())
