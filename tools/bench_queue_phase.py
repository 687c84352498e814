"""Isolate the work-queue body's per-iteration overhead on hardware.

The queue render measured ~2x the pool body per iteration (commit
2a46e8f) with no obvious HLO copies.  This times the REAL _queue_epoch
(fixed iteration count, chained donated state, one scalar fetch at the
end to sync through the axon tunnel) under the integrator's static
``ablate`` knob, so each glue stage's cost is the difference from the
production row:

    production        full body (flush scatter + cumsum + camera inject)
    noflush           plane scatter-write disabled
    nocam             inject keeps frontier math but reuses stale rays
    nocumsum          frontier ranks from iota instead of cumsum
    noinject          body ends after the flush

Also sweeps the film-plane row count to expose any scatter cost that
scales with the operand (in-place aliasing failure would).

    python tools/bench_queue_phase.py --scene next-week-final
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="next-week-final")
    p.add_argument("--width", type=int, default=400)
    p.add_argument("--height", type=int, default=400)
    p.add_argument("--spp", type=int, default=100)
    p.add_argument("--iters", type=int, default=32, help="iterations/epoch")
    p.add_argument("--epochs", type=int, default=4, help="timed epochs")
    p.add_argument("--plane-rows", type=int, default=0,
                   help="override film plane rows (default W*H*spp)")
    args = p.parse_args()

    from tpu_ray.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_ray import integrator as integ
    from tpu_ray.models.scenes import SCENES
    from tpu_ray.renderer import plan_queue, resolve_engine

    print("device:", jax.devices()[0], file=sys.stderr)
    spec = SCENES[args.scene]
    scene = spec.build(seed=1024)
    camera = spec.camera(args.width, args.height)
    engine = resolve_engine(scene, "auto")
    R, chunk_spp, epoch_iters, drain = plan_queue(
        scene, args.width, args.height, args.spp, engine=engine)
    P = args.width * args.height
    rows = args.plane_rows or P * args.spp
    fused = integ._use_fused_shading(scene, None, engine)
    print(f"{args.scene}: {scene.n_prims} prims, engine={engine}, "
          f"fused={fused}, R={R}, plane={rows} rows "
          f"({rows*12/1e6:.0f} MB), prod epoch_iters={epoch_iters}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(7)
    k_isect = jax.random.fold_in(key, 0)
    k_scat = jax.random.fold_in(key, 1)
    # total >> plane rows: injection never stops, OOB flushes still pay the
    # scatter, cond never exits early -> exactly `iters` iterations/epoch
    total = jnp.int32(1 << 30)

    def fresh_state():
        return integ._QueueState(
            iteration=jnp.int32(0),
            frontier=jnp.int32(0),
            origin=jnp.asarray(rng.uniform(-50, 400, (R, 3)), jnp.float32),
            direction=jnp.asarray(rng.normal(0, 1, (R, 3)), jnp.float32),
            time=jnp.asarray(rng.random(R), jnp.float32),
            throughput=jnp.ones((R, 3), jnp.float32),
            accum=jnp.zeros((R, 3), jnp.float32),
            bounce=jnp.zeros((R,), jnp.int32),
            work=jnp.arange(R, dtype=jnp.int32),
            active=jnp.ones((R,), bool),
            plane=tuple(jnp.zeros((rows,), jnp.float32) for _ in range(3)),
            # log sized like the plane: DUS cost is row-count-bound, not
            # capacity-bound, so clamped appends past `rows` time the same
            log=jnp.zeros((rows, 3), jnp.float32),
            posmap=jnp.full((rows,), -1, jnp.int32),
            cursor=jnp.int32(0),
        )

    def run(ablate):
        st = fresh_state()
        # positional tail: max_depth=50, rr_depth=0, then ablate (the
        # rr_depth slot grew under this tool once - keyed by position)
        ep = lambda s: integ._queue_epoch(
            s, scene, camera, k_isect, k_scat, jnp.uint32(0), jnp.uint32(0),
            total, R, args.iters, 0, args.width, args.height, engine, fused,
            50, 0, ablate)
        st = ep(st)              # warmup/compile
        int(st.frontier)         # sync
        t0 = time.perf_counter()
        for _ in range(args.epochs):
            st = ep(st)
        int(st.frontier)         # force the chain to completion
        dt = time.perf_counter() - t0
        per = dt / (args.epochs * args.iters)
        return per

    base = None
    for ablate in ("", "noflush", "nocam", "nocumsum", "noinject"):
        per = run(ablate)
        name = ablate or "production"
        delta = "" if base is None else f"  ({(base-per)*1e3:+7.3f} ms saved)"
        if base is None:
            base = per
        print(f"{name:11s}: {per*1e3:8.3f} ms/iter "
              f"({per/R*1e9:6.2f} ns/lane){delta}")


if __name__ == "__main__":
    raise SystemExit(main())
