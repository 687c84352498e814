"""Compare compaction implementations on hardware: stable argsort vs
cumsum+scatter partition, at production pool sizes.

The pool's straggler compaction (integrator.py::trace_pool) gathers the
active lanes to the front of a smaller pool.  Stability (active lanes keep
their relative order) is NOT required for correctness - randomness is keyed
on slot_ids which travel with the lanes - but determinism is.  Both forms
here are deterministic; cumsum+scatter replaces an O(R log R) sort with two
linear passes.

    python tools/bench_compact.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from tpu_ray.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    print("device:", jax.devices()[0], file=sys.stderr)

    def time_fn(fn, fargs, iters=30):
        out = fn(*fargs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*fargs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    sizes = [320000, 160000, 80000, 40000, 20000, 10000]
    print(f"{'size':>8} {'argsort(ms)':>12} {'cumsum(ms)':>11}")
    for m in sizes:
        k = max(m // 2, 1024)

        @jax.jit
        def by_argsort(av, o, d, tm, tp, bo, sa):
            order = jnp.argsort(~av, stable=True)[:k]
            return (o[order], d[order], tm[order], tp[order], bo[order],
                    sa[order], av[order], order)

        @jax.jit
        def by_cumsum(av, o, d, tm, tp, bo, sa):
            # dest slot for each active lane; inactive lanes dropped
            dest = jnp.cumsum(av.astype(jnp.int32)) - 1
            dest = jnp.where(av, dest, k)  # out-of-range -> dropped
            order = jnp.zeros((k,), jnp.int32).at[dest].set(
                jnp.arange(m, dtype=jnp.int32), mode="drop")
            n_act = jnp.sum(av.astype(jnp.int32))
            av2 = jnp.arange(k, dtype=jnp.int32) < n_act
            return (o[order], d[order], tm[order], tp[order], bo[order],
                    sa[order], av2, order)

        rng = np.random.default_rng(0)
        av = jnp.asarray(rng.random(m) < 0.4)
        o = jnp.zeros((m, 3), jnp.float32)
        fargs = (av, o, o, jnp.zeros((m,)), o,
                 jnp.zeros((m,), jnp.int32), jnp.zeros((m,), jnp.int32))
        ta = time_fn(by_argsort, fargs) * 1e3
        tc = time_fn(by_cumsum, fargs) * 1e3
        # equivalence on the active prefix
        ra, rc = by_argsort(*fargs), by_cumsum(*fargs)
        n_act = int(jnp.sum(av))
        assert np.array_equal(np.asarray(ra[7])[:n_act],
                              np.asarray(rc[7])[:n_act]), m
        print(f"{m:>8} {ta:>12.3f} {tc:>11.3f}")


if __name__ == "__main__":
    raise SystemExit(main())
