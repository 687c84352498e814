"""Cost model for the queue flush scatter on hardware.

bench_queue_phase isolated the per-iteration flush at ~34 ms (64% of the
queue body).  This times scatter variants INSIDE a fori_loop carrying the
destination (one dispatch of K iterations, so axon tunnel async-dispatch
cannot fake the numbers; a no-op control loop is subtracted):

  * update rows: R vs R/4  (does cost scale with update count?)
  * destination: 16M-row plane vs 160k-row film (operand size?)
  * op: set(drop, unique) vs add(drop)
  * baseline: dynamic_update_slice of the same rows (dense write floor)

    python tools/bench_scatter_model.py
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
    p.add_argument("--film", type=int, default=160_000)
    p.add_argument("--k", type=int, default=50, help="loop iterations")
    args = p.parse_args()

    from tpu_ray.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    print("device:", jax.devices()[0], file=sys.stderr)
    R, k = args.lanes, args.k
    rng = np.random.default_rng(0)
    rad = jnp.asarray(rng.random((R, 3)), jnp.float32)
    # ~23% die per iteration (next-week steady state); unique in-bounds ids
    died = jnp.asarray(rng.random(R) < 0.23)
    base_ids = jnp.asarray(rng.permutation(args.rows - k - 1)[:R], jnp.int32)

    def timeit(make_loop, dest_rows, iters=3):
        dest = jnp.zeros((dest_rows, 3), jnp.float32)
        fn = jax.jit(make_loop, donate_argnums=0)
        out = fn(dest, jnp.int32(0))
        jax.block_until_ready(out)
        times = []
        for i in range(iters):
            dest = jnp.zeros((dest_rows, 3), jnp.float32)
            jax.block_until_ready(dest)
            t0 = time.perf_counter()
            out = fn(dest, jnp.int32(i + 1))
            _ = float(out[0, 0])  # force through the tunnel
            times.append(time.perf_counter() - t0)
        return min(times) / k

    def control(dest, salt):
        def body(j, d):
            return d * 1.0 + 0.0
        return jax.lax.fori_loop(0, k, body, dest)

    base_plane = timeit(control, args.rows)
    base_film = timeit(control, args.film)
    print(f"control loop: plane {base_plane*1e3:7.3f} film "
          f"{base_film*1e3:7.3f} ms/iter")

    def report(name, per, base):
        print(f"{name:44s}: {(per-base)*1e3:8.3f} ms/iter")

    # (1) production shape: all R rows, ~23% in-bounds, set+drop+unique
    def scat_full(dest, salt):
        sent = args.rows + jnp.arange(R, dtype=jnp.int32)
        def body(j, d):
            idx = jnp.where(died, base_ids + j + salt, sent)
            return d.at[idx].set(rad, mode="drop", unique_indices=True)
        return jax.lax.fori_loop(0, k, body, dest)

    report("set R rows (23% live) -> 16M, unique+drop",
           timeit(scat_full, args.rows), base_plane)

    # (2) same without unique_indices
    def scat_nouniq(dest, salt):
        def body(j, d):
            idx = jnp.where(died, base_ids + j + salt, args.rows)
            return d.at[idx].set(rad, mode="drop")
        return jax.lax.fori_loop(0, k, body, dest)

    report("set R rows (23% live) -> 16M, drop only",
           timeit(scat_nouniq, args.rows), base_plane)

    # (3) quarter update rows (compacted dead), same destination
    Rq = R // 4
    def scat_quarter(dest, salt):
        sent = args.rows + jnp.arange(Rq, dtype=jnp.int32)
        def body(j, d):
            idx = jnp.where(died[:Rq], base_ids[:Rq] + j + salt, sent)
            return d.at[idx].set(rad[:Rq], mode="drop", unique_indices=True)
        return jax.lax.fori_loop(0, k, body, dest)

    report("set R/4 rows -> 16M, unique+drop",
           timeit(scat_quarter, args.rows), base_plane)

    # (4) small destination: scatter-ADD R rows into the film
    def scat_add_film(dest, salt):
        def body(j, d):
            idx = jnp.where(died, (base_ids + j + salt) % args.film,
                            args.film)
            return d.at[idx].add(rad, mode="drop")
        return jax.lax.fori_loop(0, k, body, dest)

    report("add R rows -> 160k film, drop",
           timeit(scat_add_film, args.film), base_film)

    # (5) small destination, set
    def scat_set_film(dest, salt):
        sent = args.film + jnp.arange(R, dtype=jnp.int32)
        def body(j, d):
            idx = jnp.where(died, (base_ids + j + salt) % args.film, sent)
            return d.at[idx].set(rad, mode="drop", unique_indices=True)
        return jax.lax.fori_loop(0, k, body, dest)

    report("set R rows -> 160k film, unique+drop",
           timeit(scat_set_film, args.film), base_film)

    # (6) dense floor: dynamic_update_slice R rows at a moving offset
    def dus(dest, salt):
        def body(j, d):
            off = (j + salt) * jnp.int32(1024) % jnp.int32(args.rows - R)
            return jax.lax.dynamic_update_slice(d, rad, (off, 0))
        return jax.lax.fori_loop(0, k, body, dest)

    report("dynamic_update_slice R rows -> 16M",
           timeit(dus, args.rows), base_plane)


if __name__ == "__main__":
    raise SystemExit(main())
