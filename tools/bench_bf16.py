"""Does the VPU run bf16 elementwise math at 2x f32 throughput?

Decides whether a bf16 candidate-t sweep pass (+ f32 winner refine) can
roughly halve the dominant Pallas sweep cost.  Chains a sphere-test-like
op mix at (R,) lanes in both dtypes:

    python tools/bench_bf16.py
"""
from __future__ import annotations

import argparse
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
    p.add_argument("--rays", type=int, default=1 << 20)
    p.add_argument("--chain", type=int, default=64)
    args = p.parse_args()
    R, C = args.rays, args.chain

    def mix(x, y):
        # sphere-test-like op mix: mul/add/sub/cmp/select/sqrt
        b = x * y + x
        c = x * x + y * y - b
        disc = b * b - c
        ok = disc > 0
        sd = jnp.sqrt(jnp.maximum(disc, 0))
        t = jnp.where(ok, (b - sd) * 0.5, b)
        return t * 0.999 + y * 1e-3

    def chain(dtype):
        def run(x, y):
            def body(i, v):
                return mix(v, y)
            return jax.lax.fori_loop(0, C, body, x)

        xs = jnp.linspace(1.0, 2.0, R).astype(dtype)
        ys = jnp.linspace(0.5, 1.5, R).astype(dtype)
        return jax.jit(run), xs, ys

    for dt in (jnp.float32, jnp.bfloat16):
        f, xs, ys = chain(dt)
        t = bench(f, xs, ys)
        print(f"{np.dtype(dt).name:9s} {t * 1e3 / C:7.3f} ms/iter "
              f"at {R} lanes")


if __name__ == "__main__":
    main()
