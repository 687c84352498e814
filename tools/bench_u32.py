"""Raw VPU op-cost probe: is uint32 hashing the pool loop's hidden floor?

Chains each candidate op x64 inside one jit at 1M lanes and reports the
marginal per-op cost; run on the real TPU.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

R = 1 << 20
REPS = 64


def bench(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / reps


def chain(step):
    def run(x):
        def body(i, v):
            return step(v) ^ i.astype(jnp.uint32) if v.dtype == jnp.uint32 \
                else step(v) + i
        return jax.lax.fori_loop(0, REPS, body, x)

    return jax.jit(run)


def chain_f(step):
    def run(x):
        def body(i, v):
            return step(v) + i.astype(jnp.float32)
        return jax.lax.fori_loop(0, REPS, body, x)

    return jax.jit(run)


def main():
    print("device:", jax.devices()[0])
    xf = jnp.linspace(1.0, 2.0, R, dtype=jnp.float32)
    xu = jnp.arange(R, dtype=jnp.uint32)
    xi = jnp.arange(R, dtype=jnp.int32)
    ms = lambda s: f"{s * 1e3 / REPS:7.3f} ms/step"

    t = bench(chain_f(lambda v: v * np.float32(1.000001)), xf)
    print("f32 mul             ", ms(t))
    t = bench(chain_f(lambda v: v * v + v), xf)
    print("f32 fma+add         ", ms(t))
    t = bench(chain(lambda v: v * np.uint32(0x85EBCA6B)), xu)
    print("u32 mul             ", ms(t))
    t = bench(chain(lambda v: v ^ (v >> np.uint32(16))), xu)
    print("u32 xor+shr         ", ms(t))
    t = bench(chain(lambda v: (v * np.int32(0x15EBCA6B))), xi)
    print("i32 mul             ", ms(t))

    from tpu_ray.core.rng import _murmur3_fmix

    t = bench(chain(_murmur3_fmix), xu)
    print("murmur3 fmix        ", ms(t))

    # uint32 -> float32 conversion flavors
    t = bench(chain_f(lambda v: (v.astype(jnp.uint32) >> np.uint32(8))
                      .astype(jnp.float32) * np.float32(2**-24)), xf)
    print("u32>>8 -> f32       ", ms(t))
    t = bench(chain_f(lambda v: (v.astype(jnp.uint32) >> np.uint32(8))
                      .astype(jnp.int32).astype(jnp.float32)
                      * np.float32(2**-24)), xf)
    print("u32>>8 -> i32 -> f32", ms(t))

    from tpu_ray.core.rng import hash_uniforms

    t = bench(chain_f(lambda v: hash_uniforms(
        v.astype(jnp.uint32), 14).sum(-1)), xf)
    print("hash_uniforms(14)   ", ms(t))
    t = bench(chain_f(lambda v: hash_uniforms(
        v.astype(jnp.uint32), 5).sum(-1)), xf)
    print("hash_uniforms(5)    ", ms(t))


if __name__ == "__main__":
    main()
