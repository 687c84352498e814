"""Microbench: table-lookup strategies on TPU (scalar gathers vs row gather
vs one-hot matmul) to pick the hit-record/shading fetch pattern."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, reps=50):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    R = 1 << 20
    print("device:", jax.devices()[0], " R =", R)
    key = jax.random.PRNGKey(0)
    for N in (16, 128, 1024):
        idx = jax.random.randint(key, (R,), 0, N)
        tables = [jax.random.normal(jax.random.fold_in(key, i), (N,)) for i in range(18)]
        table2d = jnp.stack(tables, axis=1)  # (N, 18)

        f_scalar = jax.jit(lambda idx, *ts: sum(t[idx] for t in ts))
        f_row = jax.jit(lambda idx, t2: t2[idx].sum(axis=1))
        def onehot_fn(idx, t2):
            oh = (idx[:, None] == jnp.arange(N)[None, :]).astype(jnp.float32)
            return (oh @ t2).sum(axis=1)
        f_oh = jax.jit(onehot_fn)

        t_s = bench(f_scalar, idx, *tables)
        t_r = bench(f_row, idx, table2d)
        t_o = bench(f_oh, idx, table2d)
        print(f"N={N:5d}: 18 scalar gathers {t_s:7.2f} ms | row gather (N,18) "
              f"{t_r:7.2f} ms | one-hot matmul {t_o:7.2f} ms")

    # single scalar gather cost for calibration
    idx = jax.random.randint(key, (R,), 0, 128)
    t1 = bench(jax.jit(lambda i, t: t[i]), idx, tables[0])
    print(f"single (R,) gather from (128,): {t1:.3f} ms")


if __name__ == "__main__":
    main()
