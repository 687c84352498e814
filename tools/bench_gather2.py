"""Image-atlas gather formulations, chained at production lane count.

The (iid, j, i) triple-index gather costs ~14 ms/iter in the fused bounce
loop (tools/bisect_fused.py).  Candidates:
  a) current: atlas[(R,) iid, (R,) j, (R,) i] -> (R, 3)
  b) flat:    atlas.reshape(-1, 3)[linear]    -> (R, 3) one index vector
  c) packed:  uint32 atlas word per texel, one scalar gather + VPU unpack

    python tools/bench_gather2.py
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
    p.add_argument("--rays", type=int, default=390144)
    p.add_argument("--chain", type=int, default=8)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    R, C = args.rays, args.chain
    H, W = 512, 1024
    key = jax.random.PRNGKey(0)
    atlas = jax.random.uniform(key, (1, H, W, 3), jnp.float32)
    flat = atlas.reshape(-1, 3)
    packed = (
        (flat[:, 0] * 255).astype(jnp.uint32)
        | ((flat[:, 1] * 255).astype(jnp.uint32) << 8)
        | ((flat[:, 2] * 255).astype(jnp.uint32) << 16)
    )
    uv = jax.random.uniform(key, (R, 2))
    iid = jnp.zeros((R,), jnp.int32)
    ms = lambda s: f"{s * 1e3 / C:8.2f} ms/iter"

    def chain(fn):
        def run(x):
            def body(i, carry):
                x, acc = carry
                out = fn(x)
                s = jnp.sum(out)
                return (x + 1e-12 * s, acc + s)

            return jax.lax.fori_loop(0, C, body, (x, 0.0))[1]

        return jax.jit(run)

    def idx(x):
        i = jnp.clip((x[:, 0] * W).astype(jnp.int32), 0, W - 1)
        j = jnp.clip((x[:, 1] * H).astype(jnp.int32), 0, H - 1)
        return i, j

    def cur(x):
        i, j = idx(x)
        return atlas[iid, j, i]

    def flt(x):
        i, j = idx(x)
        return flat[j * W + i]

    def pck(x):
        i, j = idx(x)
        w = packed[j * W + i]
        s = jnp.float32(1.0 / 255.0)
        return jnp.stack([
            (w & 0xFF).astype(jnp.float32) * s,
            ((w >> 8) & 0xFF).astype(jnp.float32) * s,
            ((w >> 16) & 0xFF).astype(jnp.float32) * s,
        ], -1)

    print("triple-index gather ", ms(bench(chain(cur), uv)))
    print("flat (N,3) take     ", ms(bench(chain(flt), uv)))
    print("packed u32 gather   ", ms(bench(chain(pck), uv)))


if __name__ == "__main__":
    main()
