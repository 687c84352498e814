"""Occupancy + compaction-ladder study of the production pool loop.

Single-steps the EXACT production pool body (same kernels, same RNG)
counting active lanes per iteration, then times the chained body and the
argsort compaction on hardware at every halving of the pool size, and
prices candidate compaction ladders (fraction 8/4/2, perfect) against the
measured survival curve.  This is what sized integrator.py's halving
ladder (COMPACT_FRACTION=2, COMPACT_FLOOR=4096) - results in PERFLOG.md
"Straggler-tail compaction ladder".

Also sweeps s_wave to test whether in-wave regeneration beats per-wave
decay (it does not: the deepest-slot tail grows with s_wave while
compaction runs only between run_until levels).

    python tools/study_occupancy.py --scene next-week-final --s-wave 1 2 5
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="next-week-final")
    p.add_argument("--width", type=int, default=400)
    p.add_argument("--height", type=int, default=400)
    p.add_argument("--spp", type=int, default=100)
    p.add_argument("--s-wave", type=int, nargs="+", default=[1, 2, 5])
    p.add_argument("--max-depth", type=int, default=50)
    p.add_argument("--seed", type=int, default=1024)
    p.add_argument("--print-counts", action="store_true",
                   help="dump the per-iteration active-lane counts")
    p.add_argument("--skip-timing", action="store_true",
                   help="counts only; skip the body/compact timing sweep")
    args = p.parse_args()

    from tpu_ray.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_ray import integrator
    from tpu_ray.models.scenes import SCENES
    from tpu_ray.renderer import _pixel_grid, _slot_ids, plan_pool, resolve_engine

    print("device:", jax.devices()[0], file=sys.stderr)
    spec = SCENES[args.scene]
    scene = spec.build(seed=1024)
    camera = spec.camera(args.width, args.height)
    engine = resolve_engine(scene, "auto")
    k_pool, s_wave_prod, n_waves_prod = plan_pool(
        scene, args.width, args.height, args.spp, engine=engine)
    R = args.width * args.height * k_pool
    print(f"{args.scene}: {scene.n_prims} prims, engine={engine}, "
          f"k_pool={k_pool}, lanes={R}, production s_wave={s_wave_prod} "
          f"x {n_waves_prod} waves", file=sys.stderr)

    xs, ys = _pixel_grid(args.width, args.height, k_pool)
    sids = _slot_ids(args.width, args.height, k_pool)
    inv_wh = (1.0 / args.width, 1.0 / args.height)
    base_key = jax.random.PRNGKey(args.seed)

    from tpu_ray.ops.intersect import intersect_ti
    from tpu_ray.ops.shade_pallas import pool_step_pallas

    def make_body(n_samples):
        ns = jnp.int32(n_samples)

        def body(it, o, d, tm, tp, ac, bo, sa, av, sample0):
            kb = jax.random.fold_in(base_key, it)
            bt, bi = intersect_ti(scene, o, d, tm,
                                  jax.random.fold_in(kb, 0),
                                  engine=engine, lane_ids=sids)
            return pool_step_pallas(
                scene, camera, xs, ys, sids, o, d, tm, tp, ac, bo, sa, av,
                bt, bi, jax.random.fold_in(kb, 1), ns, sample0,
                jnp.uint32(args.seed), inv_wh, args.max_depth)

        return jax.jit(body)

    from tpu_ray.core import rng as rng_mod

    @jax.jit
    def init_state(sample0):
        # mirror trace_pool's out-of-loop `regen(init_state(R), all-True)`:
        # every slot starts its first camera sample of the wave
        u5 = rng_mod.hash_uniforms2(
            sids, (sample0 + jnp.uint32(0)) ^ jnp.uint32(args.seed), 5)
        ro, rd, rt = camera.rays_from_uniforms(
            xs + u5[:, 0] * inv_wh[0], ys + u5[:, 1] * inv_wh[1], u5[:, 2:5])
        return ro, rd, rt

    def run_wave(n_samples, sample0):
        body = make_body(n_samples)
        o, d, tm = init_state(jnp.uint32(sample0))
        tp = jnp.ones((R, 3), jnp.float32)
        ac = jnp.zeros((R, 3), jnp.float32)
        bo = jnp.zeros((R,), jnp.int32)
        sa = jnp.ones((R,), jnp.int32)   # sample 0 consumed by init
        av = jnp.ones((R,), bool)
        counts = []
        it = 0
        cap = n_samples * args.max_depth + args.max_depth
        while True:
            (o, d, tm, tp, ac, bo, sa, av) = body(
                jnp.int32(it), o, d, tm, tp, ac, bo, sa, av,
                jnp.uint32(sample0))
            n_act = int(jnp.sum(av))
            counts.append(n_act)
            it += 1
            if n_act == 0 or it >= cap:
                break
        return np.asarray(counts)

    print(f"{'s_wave':>6} {'iters':>6} {'segs(M)':>9} {'occ%':>6} "
          f"{'cost(M.lane.it)':>16} {'full-render(M)':>15}")
    all_counts = {}
    for sw in args.s_wave:
        counts = run_wave(sw, 0)
        all_counts[sw] = counts
        if args.print_counts:
            print(f"counts s_wave={sw}: {counts.tolist()}")
        # legacy cost model for cross-s_wave comparison: full R per
        # iteration until active <= R/8, then R/8 until <= R/64, then R/64
        # (the ROUND-2 ladder; compaction sort cost excluded)
        cost = 0
        for c in counts:
            if c > R // 8:
                cost += R
            elif c > R // 64:
                cost += R // 8
            else:
                cost += R // 64
        segs = counts.sum()
        n_waves = args.spp // (k_pool * sw)
        print(f"{sw:>6} {len(counts):>6} {segs/1e6:>9.2f} "
              f"{100.0*segs/(len(counts)*R):>6.1f} {cost/1e6:>16.2f} "
              f"{cost*n_waves/1e6:>15.1f}")

    if args.skip_timing:
        return 0

    # ---- measured ladder evaluation (ms, not lane-iterations) -----------
    # Time the real chained body at each candidate pool size, and the real
    # compaction (stable argsort + state gather) at each source size; then
    # price each ladder against the measured per-iteration active counts.
    import time as _time

    def time_fn(fn, fargs, iters=20):
        out = fn(*fargs)
        jax.block_until_ready(out)
        t0 = _time.perf_counter()
        for _ in range(iters):
            out = fn(*fargs)
        jax.block_until_ready(out)
        return (_time.perf_counter() - t0) / iters

    sizes = []
    m = R
    while m >= 1024:
        sizes.append(m)
        m //= 2
    body_ms = {}
    for m in sizes:
        xs_m, ys_m, sids_m = xs[:m], ys[:m], sids[:m]
        ns = jnp.int32(1)

        @jax.jit
        def body_m(it, o, d, tm, tp, ac, bo, sa, av):
            kb = jax.random.fold_in(base_key, it)
            bt, bi = intersect_ti(scene, o, d, tm,
                                  jax.random.fold_in(kb, 0),
                                  engine=engine, lane_ids=sids_m)
            return pool_step_pallas(
                scene, camera, xs_m, ys_m, sids_m, o, d, tm, tp, ac, bo,
                sa, av, bt, bi, jax.random.fold_in(kb, 1), ns,
                jnp.uint32(0), jnp.uint32(args.seed), inv_wh,
                args.max_depth)

        o, d, tm = (jnp.asarray(v[:m]) for v in init_state(jnp.uint32(0)))
        st = (jnp.int32(0), o, d, tm, jnp.ones((m, 3), jnp.float32),
              jnp.zeros((m, 3), jnp.float32), jnp.zeros((m,), jnp.int32),
              jnp.ones((m,), jnp.int32), jnp.ones((m,), bool))
        body_ms[m] = time_fn(body_m, st) * 1e3
        print(f"body @ {m:>7} lanes: {body_ms[m]:8.3f} ms", file=sys.stderr)

    compact_ms = {}
    for m in sizes[:-1]:

        @jax.jit
        def compact_m(av, o, d, tm, tp, bo, sa):
            order = jnp.argsort(~av, stable=True)[: max(m // 2, 1024)]
            return (o[order], d[order], tm[order], tp[order], bo[order],
                    sa[order], av[order], order)

        o = jnp.zeros((m, 3), jnp.float32)
        compact_ms[m] = time_fn(
            compact_m,
            (jnp.ones((m,), bool), o, o, jnp.zeros((m,)), o,
             jnp.zeros((m,), jnp.int32), jnp.zeros((m,), jnp.int32))) * 1e3
        print(f"compact @ {m:>7} lanes: {compact_ms[m]:8.3f} ms",
              file=sys.stderr)

    def ladder_cost(counts, fraction):
        levels = []
        m = R
        while m // fraction >= 1024:
            m = m // fraction
            levels.append(m)
        cur = R
        total = 0.0
        pending = list(levels)
        for c in counts:
            while pending and c <= pending[0]:
                # compaction fires: price sort+gather at the CURRENT size
                src = cur
                while src not in compact_ms and src < R:
                    src *= 2
                total += compact_ms.get(src, 0.0)
                cur = pending.pop(0)
            # body runs at the nearest measured size >= cur
            sz = cur
            while sz not in body_ms and sz < R:
                sz *= 2
            total += body_ms[sz]
        return total, levels

    for sw, counts1 in all_counts.items():
        n_waves = max(args.spp // (k_pool * sw), 1)
        print(f"\nladder evaluation (s_wave={sw}, {len(counts1)} iters/wave,"
              f" {n_waves} waves):")
        t = len(counts1) * body_ms[R]
        print(f"  no-compact : {t:8.2f} ms/wave  {t*n_waves/1e3:7.2f} s/render")
        for frac in (8, 4, 2):
            t, levels = ladder_cost(counts1, frac)
            print(f"  fraction={frac}: {t:8.2f} ms/wave  "
                  f"{t*n_waves/1e3:7.2f} s/render  levels={levels}")
        # perfect compaction floor: every iteration at the smallest
        # MEASURED size >= active (sort cost excluded)
        t = 0.0
        for c in counts1:
            fits = [sz for sz in body_ms if sz >= c]
            t += body_ms[min(fits)] if fits else body_ms[R]
        print(f"  perfect    : {t:8.2f} ms/wave  {t*n_waves/1e3:7.2f} s/render"
              f"  (body only, no sort cost)")


if __name__ == "__main__":
    raise SystemExit(main())
