"""Measure the device cost of the ray-sort machinery at pool lane counts.

The sort-for-culling scheme (tools/study_sort_cull.py) permutes only the
sweep INPUTS (pack ro/rd/rt into one (R,8) gather) and un-permutes the
two outputs (pack t + bitcast(i) into one (R,2) gather), so its total
per-iteration overhead is:

    key compute (VPU) + sort_key_val (R,) u32 + gather (R,8) + gather (R,2)

    python tools/bench_sort.py --rays 327680
"""
from __future__ import annotations

import argparse
import sys
import time


def timeit(fn, args, iters=50):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=327680)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    print("device:", jax.devices()[0], file=sys.stderr)
    R = args.rays
    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.uniform(-50, 50, (R, 3)).astype(np.float32))
    rd = jnp.asarray(rng.normal(0, 1, (R, 3)).astype(np.float32))
    rt = jnp.asarray(rng.random(R).astype(np.float32))
    keys = jnp.asarray(rng.integers(0, 2**32, R, dtype=np.uint32))

    @jax.jit
    def key_compute(ro, rd):
        # octant(3b) | 29-bit morton-ish hash of quantized origin (the
        # real key uses interleaved bits; ALU cost is comparable)
        oct_ = ((rd[:, 0] < 0).astype(jnp.uint32) * 4
                + (rd[:, 1] < 0).astype(jnp.uint32) * 2
                + (rd[:, 2] < 0).astype(jnp.uint32))
        q = jnp.clip((ro + 50.0) * (1024.0 / 100.0), 0, 1023).astype(jnp.uint32)

        def spread(v):
            v = (v | (v << 16)) & jnp.uint32(0x030000FF)
            v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
            v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
            v = (v | (v << 2)) & jnp.uint32(0x09249249)
            return v

        m = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
        return (oct_ << 29) | (m >> 3)

    @jax.jit
    def sort_kv(k):
        idx = jnp.arange(R, dtype=jnp.int32)
        return jax.lax.sort_key_val(k, idx)

    @jax.jit
    def argsort(k):
        return jnp.argsort(k)

    @jax.jit
    def pack_gather(ro, rd, rt, idx):
        packed = jnp.concatenate(
            [ro, rd, rt[:, None], jnp.zeros((R, 1), jnp.float32)], axis=1)
        return jnp.take(packed, idx, axis=0)

    @jax.jit
    def unsort2(t, i, idx):
        packed = jnp.stack([t, jax.lax.bitcast_convert_type(i, jnp.float32)],
                           axis=1)
        inv = jnp.zeros((R,), jnp.int32).at[idx].set(
            jnp.arange(R, dtype=jnp.int32))
        out = jnp.take(packed, inv, axis=0)
        return out[:, 0], jax.lax.bitcast_convert_type(out[:, 1], jnp.int32)

    @jax.jit
    def full_pipe(ro, rd, rt):
        k = key_compute(ro, rd)
        _, idx = jax.lax.sort_key_val(k, jnp.arange(R, dtype=jnp.int32))
        packed = pack_gather(ro, rd, rt, idx)
        # stand-in sweep output
        t = packed[:, 0] + packed[:, 3]
        i = idx
        return unsort2(t, i, idx)

    k = key_compute(ro, rd)
    idx = sort_kv(k)[1]
    t = ro[:, 0]
    i = jnp.arange(R, dtype=jnp.int32)

    for name, fn, a in [
        ("key_compute", key_compute, (ro, rd)),
        ("sort_key_val u32", sort_kv, (k,)),
        ("argsort u32", argsort, (k,)),
        ("gather (R,8)", pack_gather, (ro, rd, rt, idx)),
        ("unsort 2 outputs", unsort2, (t, i, idx)),
        ("FULL pipeline", full_pipe, (ro, rd, rt)),
    ]:
        dt = timeit(jax.jit(fn), a, args.iters)
        print(f"{name:18s} {dt*1e3:8.3f} ms at {R} lanes")


if __name__ == "__main__":
    main()
