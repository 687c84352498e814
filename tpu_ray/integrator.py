"""Wavefront path-tracing integrator.

TPU-native replacement for the reference's recursive ``rayColor``
(src/Lib.hs:1297-1333): instead of CPS recursion per ray, a whole wavefront
carries (origin, direction, throughput, radiance, alive) through a bounded
``lax.while_loop`` over bounce depth.  The loop exits early once every lane
is dead - with the reference's depth cap of 50 but typical path lengths of
~5-15, that early exit is the difference between paying for 50 bounces and
paying for the actual path length.

Estimator (matching src/Lib.hs:1309-1333):
  * miss            -> radiance += throughput * background; die
  * emissive hit    -> radiance += throughput * emitted;    die
  * scattering hit  -> throughput *= weight (specular: albedo; diffuse:
                       albedo * scatteringPdf / pdfValue); continue
  * depth exhausted -> contributes nothing (the reference multiplies the
                       accumulator by black)
A lane whose throughput hits exactly 0 is also killed: everything it could
add later is 0.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .core import qmc
from .core import rng as rng_mod
from .core import vec
from .models.scene_data import SceneData
from .ops.intersect import intersect_scene
from .ops.scatter import RR_COL, RR_PMIN, scatter

COMPACT_MIN = 1 << 14
# Compaction-ladder shape, chosen per scene by sweep weight (measured on
# v5e, tools/study_occupancy.py + full renders, PERFLOG.md "Straggler-tail
# compaction ladder"):
#  * sweep-heavy scenes (>=2 prim blocks) want a HALVING ladder - the body
#    cost is ~linear in lanes down to ~20k and floors near 5k lanes, so
#    tracking the survival curve closely pays for the extra argsorts
#    (next-week 11.6 -> 9.93 s, book1 1.59 -> 1.36 s).  Levels stop at
#    4096: measured body cost RISES again below ~2.5k lanes (grid padding).
#  * tiny scenes (1 prim block) keep the shallow round-2 ladder - their
#    per-iteration body costs about as much as the argsort itself, so every
#    extra level is pure overhead (cornell 3.9 -> 4.25 s, two-spheres
#    0.478 -> 0.613 s under the halving ladder).
COMPACT_FRACTION = 2
COMPACT_FLOOR = 4096
COMPACT_FRACTION_TINY = 8
COMPACT_FLOOR_TINY = 1024
COMPACT_TINY_PRIMS = 128  # one Pallas sweep block

# Fused Pallas shading (ops/shade_pallas.py): record + texture + scatter in
# one kernel.  "auto" enables it on TPU for supported scenes (draws are
# bit-identical to the XLA path; values agree to fp-reassociation level,
# like the sweep engines); "on" forces it (tests run it interpreted on
# CPU); "off" disables.  Override with TPU_RAY_SHADE or the CLI --shade.
import os as _os

FUSED_SHADING = _os.environ.get("TPU_RAY_SHADE", "auto")


def _use_fused_shading(scene, bvh, engine: str) -> bool:
    if FUSED_SHADING == "off":
        return False
    from .ops import shade_pallas

    ok = (bvh is None and engine in ("xla", "mxu", "pallas")
          and shade_pallas.supported(scene))
    if FUSED_SHADING == "on":
        return ok
    platform = jax.devices()[0].platform.lower()
    return ok and ("tpu" in platform or platform == "axon")


def _make_isect(scene, bvh, engine="xla"):
    if bvh is None:
        return lambda ro, rd, rt, key, ids: intersect_scene(
            scene, ro, rd, rt, key, engine=engine, lane_ids=ids
        )
    from .ops.bvh import intersect_scene_bvh

    return lambda ro, rd, rt, key, ids: intersect_scene_bvh(
        scene, bvh, ro, rd, rt, key, lane_ids=ids
    )


class _PathState(NamedTuple):
    bounce: jnp.ndarray      # () int32
    origin: jnp.ndarray      # (R, 3)
    direction: jnp.ndarray   # (R, 3)
    throughput: jnp.ndarray  # (R, 3)
    radiance: jnp.ndarray    # (R, 3)
    alive: jnp.ndarray       # (R,) bool


def trace(scene: SceneData, ro, rd, rt, key, max_depth: int, bvh=None,
          engine: str = "xla", lane_ids=None, rr_depth: int = 0):
    """Trace a wavefront to completion; returns per-ray radiance (R, 3).

    ``rt`` is the per-ray shutter time, constant along each path (the
    reference threads ``rtime`` through every scattered ray).  Pass a
    :class:`~tpu_ray.ops.bvh.BVHArrays` as ``bvh`` to use traversal instead
    of the brute-force intersector.  ``lane_ids`` keys each lane's
    randomness (defaults to position).  ``rr_depth`` > 0 enables Russian
    roulette after that many bounces (ops/scatter.py RR note; unbiased,
    NOT reference semantics - default off).
    """
    isect = _make_isect(scene, bvh, engine)
    R = ro.shape[0]
    if lane_ids is None:
        lane_ids = jnp.arange(R, dtype=jnp.uint32)
    state = _PathState(
        bounce=jnp.int32(0),
        origin=ro,
        direction=rd,
        throughput=jnp.ones((R, 3), jnp.float32),
        radiance=jnp.zeros((R, 3), jnp.float32),
        alive=jnp.ones((R,), bool),
    )

    def cond(s: _PathState):
        return (s.bounce < max_depth) & jnp.any(s.alive)

    def body(s: _PathState) -> _PathState:
        kb = jax.random.fold_in(key, s.bounce)
        k_sc = jax.random.fold_in(kb, 1)
        rec = isect(s.origin, s.direction, rt, jax.random.fold_in(kb, 0), lane_ids)
        sc = scatter(scene, k_sc, s.direction, rec, lane_ids)

        miss = s.alive & ~rec.hit
        emit = s.alive & rec.hit & ~sc.scattered
        cont = s.alive & rec.hit & sc.scattered

        radiance = s.radiance + vec.where3(
            miss, s.throughput * scene.background, jnp.zeros_like(s.radiance)
        )
        radiance = radiance + vec.where3(
            emit, s.throughput * sc.emitted, jnp.zeros_like(radiance)
        )
        throughput = vec.where3(cont, s.throughput * sc.weight, s.throughput)
        kill = jnp.zeros_like(cont)
        if rr_depth:
            # survival p from the INCOMING throughput (identical across
            # engines - the fused kernels' carried tp already includes any
            # deferred image albedo); see ops/scatter.py RR note
            p = jnp.clip(jnp.max(s.throughput, axis=-1), RR_PMIN, 1.0)
            do_rr = cont & (s.bounce >= rr_depth)
            kill = do_rr & (rng_mod.lane_uniform_col(k_sc, lane_ids,
                                                     RR_COL) >= p)
            throughput = vec.where3(do_rr & ~kill, throughput / p[:, None],
                                    throughput)
        alive = cont & ~kill & (jnp.max(throughput, axis=-1) > 0.0)
        return _PathState(
            bounce=s.bounce + 1,
            origin=vec.where3(cont, rec.point, s.origin),
            direction=vec.where3(cont, sc.direction, s.direction),
            throughput=throughput,
            radiance=radiance,
            alive=alive,
        )

    final = jax.lax.while_loop(cond, body, state)
    return final.radiance


class _PoolState(NamedTuple):
    iteration: jnp.ndarray    # () int32
    origin: jnp.ndarray       # (R, 3)
    direction: jnp.ndarray    # (R, 3)
    time: jnp.ndarray         # (R,)
    throughput: jnp.ndarray   # (R, 3)
    bounce: jnp.ndarray       # (R,) int32 bounces of the current path
    sample: jnp.ndarray       # (R,) int32 next local sample index to start
    active: jnp.ndarray       # (R,) bool: slot carries a live path
    accum: jnp.ndarray        # (R, 3) radiance summed over completed samples


def _init_pool_state(count: int) -> _PoolState:
    return _PoolState(
        iteration=jnp.int32(0),
        origin=jnp.zeros((count, 3), jnp.float32),
        direction=jnp.zeros((count, 3), jnp.float32),
        time=jnp.zeros((count,), jnp.float32),
        throughput=jnp.ones((count, 3), jnp.float32),
        bounce=jnp.zeros((count,), jnp.int32),
        sample=jnp.zeros((count,), jnp.int32),
        active=jnp.zeros((count,), bool),
        accum=jnp.zeros((count, 3), jnp.float32),
    )


def _pool_levels(R: int, n_prims: int):
    """Compaction-ladder pool sizes for an R-lane pool (COMPACT_* note)."""
    if n_prims > COMPACT_TINY_PRIMS:
        frac, floor = COMPACT_FRACTION, COMPACT_FLOOR
    else:
        frac, floor = COMPACT_FRACTION_TINY, COMPACT_FLOOR_TINY
    levels = []
    m = R
    while R >= COMPACT_MIN and m // frac >= floor:
        m = m // frac
        levels.append(m)
    return levels


def _make_pool_loop(scene, camera, k_loop, n_samples, sample0, cam_salt,
                    inv_w, inv_h, max_depth, engine, fused, rr_depth, bvh,
                    s_loc, t_loc, slot_ids_loc):
    """(regen, body) closures over a (possibly compacted) slot subset.

    Shared by trace_pool's in-jit ladder (the mesh path traces the whole
    ladder inside one shard_map program) and the staged per-executable
    ladder (trace_pool_staged) - one definition guarantees both paths draw
    identical streams and produce bit-identical radiance."""
    isect = _make_isect(scene, bvh, engine)
    if fused:
        from .ops.intersect import intersect_ti
        from .ops.shade_pallas import pool_step_pallas

    def regen(state: _PoolState, just_died) -> _PoolState:
        want = just_died & (state.sample < n_samples)
        # per-(slot, global sample) camera uniforms: jitter x/y, lens,
        # time, from a 2-word counter hash over (global slot id,
        # global sample index) - no packing into one word, so no
        # wrap collisions at any render size
        u5 = rng_mod.hash_uniforms2(
            slot_ids_loc,
            (sample0 + state.sample.astype(jnp.uint32)) ^ cam_salt,
            5,
        )
        jx, jy = u5[:, 0], u5[:, 1]
        u3 = u5[:, 2:5]
        if camera.sampler in ("sobol", "sobol-b0"):
            # low-discrepancy camera sample (core/qmc.py): scrambled
            # Sobol' dims 1-2 on the pixel, 3-5 on lens disk + time
            gs = sample0 + state.sample.astype(jnp.uint32)
            jx, jy = qmc.pixel_uniforms(slot_ids_loc, gs, cam_salt)
            u3 = jnp.stack(
                qmc.lens_time_uniforms(slot_ids_loc, gs, cam_salt), axis=-1)
        ro, rd, rt = camera.rays_from_uniforms(
            s_loc + jx * inv_w, t_loc + jy * inv_h, u3
        )
        return state._replace(
            origin=vec.where3(want, ro, state.origin),
            direction=vec.where3(want, rd, state.direction),
            time=jnp.where(want, rt, state.time),
            throughput=vec.where3(
                want, jnp.ones_like(state.throughput), state.throughput
            ),
            bounce=jnp.where(want, 0, state.bounce),
            sample=jnp.where(want, state.sample + 1, state.sample),
            active=(state.active & ~just_died) | want,
        )

    def body(st: _PoolState) -> _PoolState:
        kb = jax.random.fold_in(k_loop, st.iteration)
        if fused:
            # same two key streams, same draws - ONE Pallas kernel for
            # record + textures + scatter + accumulation + state update
            # + camera regen (ops/shade_pallas.py::pool_step_pallas)
            bt, bi = intersect_ti(
                scene, st.origin, st.direction, st.time,
                jax.random.fold_in(kb, 0), engine=engine,
                lane_ids=slot_ids_loc)
            (o2, d2, tm2, tp2, ac2, bo2, sa2, av2) = pool_step_pallas(
                scene, camera, s_loc, t_loc, slot_ids_loc,
                st.origin, st.direction, st.time, st.throughput,
                st.accum, st.bounce, st.sample, st.active, bt, bi,
                jax.random.fold_in(kb, 1), n_samples, sample0,
                cam_salt, (inv_w, inv_h), max_depth,
                rr_depth=rr_depth)
            return _PoolState(
                iteration=st.iteration + 1, origin=o2, direction=d2,
                time=tm2, throughput=tp2, bounce=bo2, sample=sa2,
                active=av2, accum=ac2)
        k_sc = jax.random.fold_in(kb, 1)
        rec = isect(st.origin, st.direction, st.time,
                    jax.random.fold_in(kb, 0), slot_ids_loc)
        sc = scatter(scene, k_sc, st.direction, rec, slot_ids_loc)

        miss = st.active & ~rec.hit
        emit = st.active & rec.hit & ~sc.scattered
        cont = st.active & rec.hit & sc.scattered

        accum = st.accum + vec.where3(
            miss, st.throughput * scene.background, jnp.zeros_like(st.accum)
        )
        accum = accum + vec.where3(
            emit, st.throughput * sc.emitted, jnp.zeros_like(accum)
        )
        throughput = vec.where3(cont, st.throughput * sc.weight, st.throughput)
        bounce = jnp.where(cont, st.bounce + 1, st.bounce)
        kill = jnp.zeros_like(cont)
        if rr_depth:
            p = jnp.clip(jnp.max(st.throughput, axis=-1), RR_PMIN, 1.0)
            do_rr = cont & (st.bounce >= rr_depth)
            kill = do_rr & (rng_mod.lane_uniform_col(
                k_sc, slot_ids_loc, RR_COL) >= p)
            throughput = vec.where3(do_rr & ~kill,
                                    throughput / p[:, None], throughput)
        # a path also dies on depth exhaustion (contributes nothing,
        # src/Lib.hs:1303-1304), zero throughput, or a roulette kill
        dead_now = st.active & (
            miss | emit | kill
            | (cont & (bounce >= max_depth))
            | (cont & (jnp.max(throughput, axis=-1) <= 0.0))
        )
        st2 = _PoolState(
            iteration=st.iteration + 1,
            origin=vec.where3(cont, rec.point, st.origin),
            direction=vec.where3(cont, sc.direction, st.direction),
            time=st.time,
            throughput=throughput,
            bounce=bounce,
            sample=st.sample,
            active=st.active,
            accum=accum,
        )
        return regen(st2, dead_now)

    return regen, body


def trace_pool(
    scene: SceneData,
    camera,
    s: jnp.ndarray,            # (R,) screen-x fraction base (pixel / width)
    t: jnp.ndarray,            # (R,) screen-y fraction base
    inv_wh: tuple,             # (1/width, 1/height) jitter scale
    key,
    n_samples,                 # samples each slot must complete (traced ok)
    sample0,                   # global index of each slot's first sample
    max_depth: int,
    cam_salt=jnp.uint32(0),    # render-level salt for the camera stream
    bvh=None,                  # optional BVHArrays for traversal
    engine: str = "xla",       # "xla" | "pallas" solid-prim sweep
    slot_ids=None,             # (R,) uint32 GLOBAL slot ids (default arange)
    rr_depth: int = 0,         # >0: Russian roulette after this many bounces
    shade: Optional[str] = None,  # "fused" | "xla" | None = resolve here.
    # Callers that jit trace_pool (renderer._pool_step) MUST resolve this
    # OUTSIDE the jit and pass it as a static argument - the module-level
    # FUSED_SHADING knob read at trace time is not part of any jit cache
    # key, so toggling it between calls would silently reuse the stale
    # executable.
):
    """Ray-pool path tracing with immediate path regeneration.

    The plain wavefront (:func:`trace`) pays for max_depth iterations over
    the whole wave while lanes die off; with the reference's depth cap of 50
    and typical path lengths of 3-15 that is mostly masked idle work.  Here
    every slot owns one pixel and renders ``n_samples`` jittered camera
    samples *sequentially*: the iteration a path terminates (background,
    emission, zero throughput, depth cap), its radiance lands in the slot
    accumulator and the slot immediately starts its next camera ray.  Lane
    utilization stays ~100% until the final-sample tail.

    ALL randomness (camera uniforms, path-space draws, medium free flight)
    is keyed by the slot's *global* id (``slot_ids``) and global sample /
    iteration index - never by lane position - so the rendered estimate is
    bit-identical no matter how the pool is scheduled into waves, split
    into bands, compacted, or sharded over a mesh.

    Returns (accum (R, 3) summed radiance, samples_done (R,)).
    """
    R = s.shape[0]
    if max_depth <= 0:
        # depth 0 -> every sample is black (src/Lib.hs:1303-1304)
        return (
            jnp.zeros((R, 3), jnp.float32),
            jnp.full((R,), 1, jnp.int32) * n_samples,
        )
    if engine == "mega" and bvh is None:
        # whole-wave Pallas megakernel (ops/megakernel.py); the renderer's
        # resolve_engine only selects this for supported() scenes
        from .ops.megakernel import trace_pool_mega

        return trace_pool_mega(scene, camera, s, t, inv_wh, key,
                               n_samples, sample0, max_depth, cam_salt,
                               slot_ids=slot_ids, rr_depth=rr_depth)
    n_samples = jnp.asarray(n_samples, jnp.int32)
    fused = (_use_fused_shading(scene, bvh, engine) if shade is None
             else shade == "fused")
    if slot_ids is None:
        slot_ids = jnp.arange(R, dtype=jnp.uint32)
    slot_ids = jnp.asarray(slot_ids, jnp.uint32)
    cam_salt = jnp.asarray(cam_salt, jnp.uint32)
    inv_w, inv_h = inv_wh

    def make_loop(s_loc, t_loc, slot_ids_loc):
        return _make_pool_loop(
            scene, camera, key, n_samples, sample0, cam_salt, inv_w, inv_h,
            max_depth, engine, fused, rr_depth, bvh, s_loc, t_loc,
            slot_ids_loc)

    iter_cap = n_samples * max_depth + max_depth
    regen, body = make_loop(s, t, slot_ids)
    state = regen(_init_pool_state(R), jnp.ones((R,), bool))

    def run_until(body_fn, st, threshold):
        """Advance the loop while more than ``threshold`` slots are active."""
        if threshold > 0:
            cond = lambda q: (jnp.sum(q.active) > threshold) & (q.iteration < iter_cap)
        else:
            cond = lambda q: jnp.any(q.active) & (q.iteration < iter_cap)
        return jax.lax.while_loop(cond, body_fn, st)

    # straggler compaction: each time active occupancy falls below the next
    # ladder level (slots exhausted their samples while deeper paths
    # remain), gather the survivors into a pool of that size and continue.
    # Ladder shape per scene weight - see the COMPACT_* note above.
    levels = _pool_levels(R, scene.n_prims)

    if not levels:
        final = run_until(body, state, 0)
        return final.accum, final.sample

    st = run_until(body, state, levels[0])
    accum, sample = st.accum, st.sample
    # ``gids``: each compacted lane's position in the ORIGINAL pool (for
    # scattering results back); randomness stays keyed on slot_ids[gids],
    # so compaction is invisible to the estimate.
    gids = jnp.arange(R, dtype=jnp.int32)
    for li, m in enumerate(levels):
        order = jnp.argsort(~st.active, stable=True)[:m]
        gids = gids[order]
        take = lambda a: a[order]
        stage = _PoolState(
            iteration=st.iteration,
            origin=take(st.origin),
            direction=take(st.direction),
            time=take(st.time),
            throughput=take(st.throughput),
            bounce=take(st.bounce),
            sample=take(st.sample),
            active=take(st.active),
            accum=jnp.zeros((m, 3), jnp.float32),
        )
        _, body_m = make_loop(s[gids], t[gids], slot_ids[gids])
        nxt = levels[li + 1] if li + 1 < len(levels) else 0
        st = run_until(body_m, stage, nxt)
        accum = accum.at[gids].add(st.accum)
        sample = sample.at[gids].set(st.sample)
    return accum, sample


# ---------------------------------------------------------------------------
# Staged pool: the ladder as separate executables
# ---------------------------------------------------------------------------
#
# trace_pool traces its whole compaction ladder into ONE program, so a
# 4-level render compiles every level's full body (fused shade kernel +
# sweep + argsort) inside a single server-side XLA compile - measured ~4x
# the single-body compile on the remote worker (tools/r3/
# measure_cold_ablate.py: cornell 624 s with the ladder vs 148 s without,
# while the ladder is worth 2x at render time: 3.8 vs 7.8 s/1000spp).
# Here each ladder stage runs as its OWN executable: cold start pays one
# R-sized body plus near-free smaller bodies (subsequent same-kernel
# compiles measured 4-8 s, tools/r3/measure_parallel_compile.py), warm
# starts load smaller per-stage cache entries, and the driver dispatches
# every stage eagerly with no host reads (an already-drained stage's
# while_loop cond is false on entry - a bit-exact identity).
#
# Draws are identical to trace_pool's by construction (_make_pool_loop is
# shared and the iteration counter rides in the carried state), so staged
# and staged renders agree to fp-fusion level (sample counts bit-equal;
# tests/test_pool.py) - the same difference class as the engine variants.

from functools import partial as _pl_partial


@_pl_partial(jax.jit, static_argnums=(10, 11, 12, 13, 14, 15))
def _pool_stage_first(scene, camera, s, t, slot_ids, key, n_samples,
                      sample0, cam_salt, threshold, inv_w, inv_h, max_depth,
                      engine, fused, rr_depth, bvh=None):
    """Init + regen + run the full-R pool until <= threshold slots live."""
    R = s.shape[0]
    regen, body = _make_pool_loop(scene, camera, key, n_samples, sample0,
                                  cam_salt, inv_w, inv_h, max_depth, engine,
                                  fused, rr_depth, bvh, s, t, slot_ids)
    st = regen(_init_pool_state(R), jnp.ones((R,), bool))
    iter_cap = n_samples * max_depth + max_depth
    return jax.lax.while_loop(
        lambda q: (jnp.sum(q.active, dtype=jnp.int32) > threshold)
        & (q.iteration < iter_cap), body, st)


@_pl_partial(jax.jit, static_argnums=(14, 15, 16, 17, 18, 19, 20))
def _pool_level(st, gids, accum, sample, scene, camera, s_full, t_full,
                sid_full, key, n_samples, sample0, cam_salt, threshold,
                m, inv_w, inv_h, max_depth, engine, fused, rr_depth,
                bvh=None):
    """One staged ladder level as ONE executable: gather the ``m``
    most-active slots out of ``st`` (trace_pool's argsort take), run the
    compacted pool until <= ``threshold`` slots live, and fold its radiance
    / sample counts back into the full-R accumulators.

    Compact + stage + fold used to be three separate executables; through
    the remote-worker tunnel every launch costs ~25 ms, and those un-
    overlappable launches WERE the small-scene dispatch floor (two-spheres
    0.33 -> 0.59 s when the staged ladder first landed - PERFLOG round 3
    "Small-scene dispatch floor").  One executable per level keeps the
    cold-start property (one body per program) at 1/3 the launches."""
    order = jnp.argsort(~st.active, stable=True)[:m]
    g2 = gids[order]
    take = lambda a: a[order]
    stage = _PoolState(
        iteration=st.iteration,
        origin=take(st.origin),
        direction=take(st.direction),
        time=take(st.time),
        throughput=take(st.throughput),
        bounce=take(st.bounce),
        sample=take(st.sample),
        active=take(st.active),
        accum=jnp.zeros((m, 3), jnp.float32),
    )
    s_m, t_m, sid_m = s_full[g2], t_full[g2], sid_full[g2]
    _, body = _make_pool_loop(scene, camera, key, n_samples, sample0,
                              cam_salt, inv_w, inv_h, max_depth, engine,
                              fused, rr_depth, bvh, s_m, t_m, sid_m)
    iter_cap = n_samples * max_depth + max_depth
    st2 = jax.lax.while_loop(
        lambda q: (jnp.sum(q.active, dtype=jnp.int32) > threshold)
        & (q.iteration < iter_cap), body, stage)
    return (st2, g2, accum.at[g2].add(st2.accum),
            sample.at[g2].set(st2.sample))


def trace_pool_staged(
    scene: SceneData,
    camera,
    s: jnp.ndarray,
    t: jnp.ndarray,
    inv_wh: tuple,
    key,
    n_samples,
    sample0,
    max_depth: int,
    cam_salt=jnp.uint32(0),
    bvh=None,
    engine: str = "xla",
    slot_ids=None,
    rr_depth: int = 0,
    shade: Optional[str] = None,
):
    """trace_pool with the compaction ladder as separate executables
    (module note above); same signature, same draws, values to fp-fusion
    level (sample counts bit-equal).  The
    production single-device pool path (renderer.render); the mesh path
    keeps trace_pool (a shard_map body can't host a host-side loop)."""
    R = s.shape[0]
    if max_depth <= 0:
        return (jnp.zeros((R, 3), jnp.float32),
                jnp.full((R,), 1, jnp.int32) * n_samples)
    if engine == "mega" and bvh is None:
        return trace_pool(scene, camera, s, t, inv_wh, key, n_samples,
                          sample0, max_depth, cam_salt, bvh=bvh,
                          engine=engine, slot_ids=slot_ids,
                          rr_depth=rr_depth, shade=shade)
    n_samples = jnp.asarray(n_samples, jnp.int32)
    fused = (_use_fused_shading(scene, bvh, engine) if shade is None
             else shade == "fused")
    if slot_ids is None:
        slot_ids = jnp.arange(R, dtype=jnp.uint32)
    slot_ids = jnp.asarray(slot_ids, jnp.uint32)
    cam_salt = jnp.asarray(cam_salt, jnp.uint32)
    sample0 = jnp.asarray(sample0, jnp.uint32)
    inv_w, inv_h = float(inv_wh[0]), float(inv_wh[1])

    levels = _pool_levels(R, scene.n_prims)
    thr0 = jnp.int32(levels[0] if levels else 0)
    st = _pool_stage_first(scene, camera, s, t, slot_ids, key, n_samples,
                           sample0, cam_salt, thr0, inv_w, inv_h, max_depth,
                           engine, fused, rr_depth, bvh)
    if not levels:
        return st.accum, st.sample
    accum, sample = st.accum, st.sample
    gids = jnp.arange(R, dtype=jnp.int32)
    for li, m in enumerate(levels):
        nxt = jnp.int32(levels[li + 1] if li + 1 < len(levels) else 0)
        st, gids, accum, sample = _pool_level(
            st, gids, accum, sample, scene, camera, s, t, slot_ids, key,
            n_samples, sample0, cam_salt, nxt, m, inv_w, inv_h, max_depth,
            engine, fused, rr_depth, bvh)
    return accum, sample


# ---------------------------------------------------------------------------
# Global work-queue integrator
# ---------------------------------------------------------------------------
#
# trace_pool keeps occupancy high WITHIN a slot's sample budget, but the
# production schedule for big scenes is 1 sample per slot per wave, so every
# wave decays along the raw path-survival curve and pays its own straggler
# tail (next-week measured 8.8% occupancy under the round-2 ladder,
# PERFLOG.md "Straggler-tail compaction ladder").  trace_queue removes the
# wave structure entirely: one persistent pool of R lanes draws
# (pixel, sample) work items off a single global frontier - the moment a
# path dies, its lane takes the next work item - so occupancy stays ~100%
# until the frontier is exhausted and the render pays exactly ONE survival
# tail at the very end.
#
# Scheduling is invisible to the estimate: path-space draws are keyed by
# (render key, purpose, work item, bounce) via rng.path_ids - NOT by pool
# iteration, wave index, or lane position - and camera draws by
# (pixel, global sample) like trace_pool's.  Radiances are scatter-WRITTEN
# (unique indices, no accumulation order) into a per-(sample, pixel) film
# plane and reduced in fixed sample-major order, so the image is
# bit-identical for ANY lane count, epoch length, or sample chunking.  The
# bounce-draw streams differ from trace_pool's (which fold the wave key and
# pool iteration), so queue and pool renders of the same seed are
# statistically identical but not bit-equal.

from functools import partial as _partial


class _QueueState(NamedTuple):
    iteration: jnp.ndarray    # () int32 epoch-local iteration counter
    frontier: jnp.ndarray     # () int32 next unissued work item
    origin: jnp.ndarray       # (R, 3)
    direction: jnp.ndarray    # (R, 3)
    time: jnp.ndarray         # (R,)
    throughput: jnp.ndarray   # (R, 3)
    accum: jnp.ndarray        # (R, 3) radiance of the CURRENT work item
    bounce: jnp.ndarray       # (R,) int32
    work: jnp.ndarray         # (R,) int32 chunk-local work item id
    active: jnp.ndarray       # (R,) bool
    plane: tuple              # 3x (total,) planar per-(sample, pixel) radiance
    # (planar, not (total, 3): a 1D f32 scatter measured 2.9 ms for 390k
    # rows into 16M on v5e vs 33.4 ms for the same scatter of (390k, 3)
    # rows - tools/bench_scatter_layout.py - so three planar scatters cut
    # the flush ~4x, and the flush was 64% of the queue body)
    log: jnp.ndarray          # (L, 3) append-only per-iteration radiance log
    posmap: jnp.ndarray       # (total,) int32 log row holding the work
    #                           item's death radiance; -1 = see plane
    cursor: jnp.ndarray       # () int32 next free log row
    # v2 flush (tools/bench_flush_v2.py): appending ALL m lanes' radiance
    # to the log via dynamic_update_slice is FREE (contiguous tiles), and
    # recording just the dying lanes' log rows is ONE int32 scatter
    # (2.9 ms/iter at R=390k) instead of three f32 plane scatters
    # (8.6 ms/iter); the plane is materialized from the log ONCE per chunk
    # instead of being written every iteration.  The log is PACKED (L, 3),
    # unlike the plane: appends are contiguous DUS either way (accum is
    # already (R, 3)), and the materialize gather pays per INDEX, not per
    # element - one (L, 3) row-gather of 16M rows measured 264 ms on v5e
    # vs 766 ms for three planar gathers (/tmp/bench_mat5.py, 2026-08-18).
    # The log is sized for the whole chunk (trace_queue); if a chunk
    # outlives it, _queue_epoch's device-side guard materializes and
    # resets mid-chunk.


# Worklist packing (adaptive sampling, tpu_ray/adaptive.py): one uint32
# per work item, pixel id in the high bits and the pixel's ABSOLUTE sample
# index in the low WL_SAMP_BITS.  Bounds checked by the driver: P < 2^18
# pixels, < 2^14 samples per pixel.
WL_SAMP_BITS = 14
WL_SAMP_MASK = (1 << WL_SAMP_BITS) - 1


def _queue_body(st: _QueueState, scene, camera, k_isect, k_scat, cam_salt,
                chunk_s0, total, *, m, width, height, engine, fused,
                max_depth, rr_depth=0, ablate="", worklist=None,
                work_id0=None):
    """One queue iteration: trace + shade + flush dead + inject fresh.

    ``worklist`` (optional (Wl,) uint32, Wl >= total) overrides the
    implicit work->(pixel, sample) map: item w renders pixel
    ``worklist[w] >> WL_SAMP_BITS`` at absolute per-pixel sample index
    ``worklist[w] & WL_SAMP_MASK``.  Entries past ``total`` are padding
    (shape bucketing for executable reuse) and are never dispatched.

    ``ablate`` (static, bench-only — tools/bench_queue_phase.py) disables
    one glue stage to isolate its hardware cost: "noflush" skips the plane
    scatter, "nocam" injects without regenerating camera rays, "nocumsum"
    replaces the frontier ranks with an iota, "noinject" skips injection
    entirely.  Production passes "" everywhere."""
    # draw ids use the GLOBAL work item (chunk base + chunk-local id) so
    # sample chunking is invisible to the path-space streams; a mesh shard
    # passes its own ``work_id0`` so every device keys the same global ids
    # a single-device run would (trace_queue_wl_mesh)
    work_base = (chunk_s0 * jnp.uint32(width * height)
                 if work_id0 is None else work_id0)
    sid = rng_mod.path_ids(st.work.astype(jnp.uint32) + work_base, st.bounce)
    if fused:
        from .ops.intersect import intersect_ti
        from .ops.shade_pallas import pool_step_pallas

        zeros_m = jnp.zeros((m,), jnp.float32)
        bt, bi = intersect_ti(scene, st.origin, st.direction, st.time,
                              k_isect, engine=engine, lane_ids=sid)
        # n_samples=0 disables the kernel's in-slot camera regeneration;
        # the queue injects new work itself below
        (o2, d2, tm2, tp2, ac2, bo2, _sa, av2) = pool_step_pallas(
            scene, camera, zeros_m, zeros_m, sid,
            st.origin, st.direction, st.time, st.throughput,
            st.accum, st.bounce, jnp.zeros((m,), jnp.int32),
            st.active, bt, bi, k_scat, jnp.int32(0), jnp.uint32(0),
            jnp.uint32(0), (1.0 / width, 1.0 / height), max_depth,
            rr_depth=rr_depth)
    else:
        isect = _make_isect(scene, None, engine)
        rec = isect(st.origin, st.direction, st.time, k_isect, sid)
        u_sc = None
        if camera.sampler == "sobol-b0":
            # probe sampler (PERFLOG "bounce-dim QMC"): FIRST-bounce scatter
            # draws come from Owen-Sobol dims 6-10 keyed (pixel, global
            # sample) - same contract as the camera dims - so each pixel's
            # first-vertex mixture coin / light uv / cosine uv are jointly
            # stratified with its camera sample.  Deeper bounces keep the
            # hash stream.  XLA queue path only (fused kernels fall back to
            # sobol camera dims + hash scatter).
            u_sc = rng_mod.lane_uniforms(k_scat, sid, 14)
            if worklist is None:
                lane_pix = (st.work % (width * height)).astype(jnp.uint32)
                lane_gs = (chunk_s0
                           + st.work // (width * height)).astype(jnp.uint32)
            else:
                lp = worklist[jnp.clip(st.work, 0, worklist.shape[0] - 1)]
                lane_pix = (lp >> jnp.uint32(WL_SAMP_BITS)).astype(jnp.uint32)
                lane_gs = lp & jnp.uint32(WL_SAMP_MASK)
            q5 = qmc.bounce0_uniforms(lane_pix, lane_gs, cam_salt)
            b0 = st.bounce == 0
            # the mixture COIN (col 0) stays hashed: a QMC coin makes each
            # branch consume a structured SUBSET of the uv dims' indices,
            # breaking their net property (measured: cornell 64spp MSE
            # 1.7x WORSE with a Sobol coin; PERFLOG "Bounce-dim QMC").
            # Both uv pairs are computed unconditionally per lane, so their
            # full per-pixel prefixes stay stratified.  q5[0] is the coin
            # dim (6), skipped; the light-uv pair takes dims 7-8 and the
            # cosine-uv pair dims 9-10 (ADVICE r4: zipping all of q5
            # silently dropped dim 10 and shifted the pairs).
            for col, qv in zip((2, 3, 6, 7), q5[1:]):
                u_sc = u_sc.at[:, col].set(jnp.where(b0, qv, u_sc[:, col]))
        sc = scatter(scene, k_scat, st.direction, rec, sid, u=u_sc)
        miss = st.active & ~rec.hit
        emit = st.active & rec.hit & ~sc.scattered
        cont = st.active & rec.hit & sc.scattered
        ac2 = st.accum + vec.where3(
            miss, st.throughput * scene.background, jnp.zeros_like(st.accum))
        ac2 = ac2 + vec.where3(
            emit, st.throughput * sc.emitted, jnp.zeros_like(ac2))
        tp2 = vec.where3(cont, st.throughput * sc.weight, st.throughput)
        bo2 = jnp.where(cont, st.bounce + 1, st.bounce)
        kill = jnp.zeros_like(cont)
        if rr_depth:
            p = jnp.clip(jnp.max(st.throughput, axis=-1), RR_PMIN, 1.0)
            do_rr = cont & (st.bounce >= rr_depth)
            kill = do_rr & (rng_mod.lane_uniform_col(k_scat, sid,
                                                     RR_COL) >= p)
            tp2 = vec.where3(do_rr & ~kill, tp2 / p[:, None], tp2)
        dead_now = st.active & (
            miss | emit | kill
            | (cont & (bo2 >= max_depth))
            | (cont & (jnp.max(tp2, axis=-1) <= 0.0))
        )
        o2 = vec.where3(cont, rec.point, st.origin)
        d2 = vec.where3(cont, sc.direction, st.direction)
        tm2 = st.time
        av2 = st.active & ~dead_now

    # ---- flush: a dying lane's radiance is WRITTEN (each work item dies
    # exactly once, so there is no accumulation order).  v2: every lane's
    # radiance is appended to the log (free DUS) and the posmap records the
    # dying lanes' rows - one int32 scatter instead of three f32 ones; the
    # plane itself is only materialized at chunk end (trace_queue).
    died = st.active & ~av2
    if ablate == "noflush":
        log, posmap, cursor = st.log, st.posmap, st.cursor
    else:
        log = jax.lax.dynamic_update_slice(
            st.log, ac2, (st.cursor, jnp.int32(0)))
        # indices are globally unique (live lanes' sentinels are distinct
        # out-of-bounds rows, dropped), so XLA may parallelize the scatter.
        # The sentinel base is the STATIC posmap size, not the traced
        # ``total``: with a padded worklist total < len(posmap) and a
        # total-based sentinel would corrupt the padding rows.
        sentinel = jnp.int32(st.posmap.shape[0]) + jnp.arange(
            m, dtype=jnp.int32)
        idx = jnp.where(died, st.work, sentinel)
        posmap = st.posmap.at[idx].set(
            st.cursor + jnp.arange(m, dtype=jnp.int32),
            mode="drop", unique_indices=True)
        cursor = st.cursor + jnp.int32(m)

    if ablate == "noinject":
        return st._replace(iteration=st.iteration + 1, origin=o2,
                           direction=d2, time=tm2, throughput=tp2,
                           accum=ac2, bounce=bo2, active=av2, log=log,
                           posmap=posmap, cursor=cursor)

    # ---- inject: free lanes take the next work items off the frontier
    free = ~av2
    if ablate == "nocumsum":
        ranks = jnp.arange(m, dtype=jnp.int32)
    else:
        ranks = jnp.cumsum(free.astype(jnp.int32)) - 1
    w_new = st.frontier + jnp.where(free, ranks, 0)
    valid = free & (w_new < total)
    if worklist is None:
        pix = jnp.where(valid, w_new % (width * height), 0)
        gsample = chunk_s0 + jnp.where(valid, w_new // (width * height),
                                       0).astype(jnp.uint32)
    else:
        packed = worklist[jnp.where(valid, w_new, 0)]
        pix = jnp.where(valid,
                        (packed >> jnp.uint32(WL_SAMP_BITS)).astype(jnp.int32),
                        0)
        gsample = jnp.where(valid, packed & jnp.uint32(WL_SAMP_MASK),
                            jnp.uint32(0))
    if ablate == "nocam":
        ro, rd, rt = o2, d2, tm2
    else:
        # camera stream: (pixel, global sample) counter hash,
        # trace_pool.regen's construction with the pixel id as the slot word
        u5 = rng_mod.hash_uniforms2(
            pix.astype(jnp.uint32), gsample ^ cam_salt, 5)
        jx, jy = u5[:, 0], u5[:, 1]
        u3 = u5[:, 2:5]
        if camera.sampler in ("sobol", "sobol-b0"):
            # keyed (slot=pixel, PLAIN gsample) exactly like trace_pool's
            # regen: the camera stream is schedule-independent here too
            jx, jy = qmc.pixel_uniforms(
                pix.astype(jnp.uint32), gsample, cam_salt)
            u3 = jnp.stack(qmc.lens_time_uniforms(
                pix.astype(jnp.uint32), gsample, cam_salt), axis=-1)
        sx = ((pix % width).astype(jnp.float32) + jx) * (1.0 / width)
        sy = ((height - 1 - pix // width).astype(jnp.float32)
              + jy) * (1.0 / height)
        ro, rd, rt = camera.rays_from_uniforms(sx, sy, u3)
    return _QueueState(
        iteration=st.iteration + 1,
        frontier=jnp.minimum(
            st.frontier + jnp.sum(free.astype(jnp.int32)), total),
        origin=vec.where3(valid, ro, o2),
        direction=vec.where3(valid, rd, d2),
        time=jnp.where(valid, rt, tm2),
        throughput=vec.where3(valid, jnp.ones_like(tp2), tp2),
        accum=vec.where3(valid, jnp.zeros_like(ac2), ac2),
        bounce=jnp.where(valid, 0, bo2),
        work=jnp.where(valid, w_new, st.work),
        active=av2 | valid,
        plane=st.plane,
        log=log,
        posmap=posmap,
        cursor=cursor,
    )


def _queue_epoch_impl(st: _QueueState, scene, camera, k_isect, k_scat,
                      cam_salt, chunk_s0, total, m, iters, threshold,
                      width, height, engine, fused, max_depth, rr_depth=0,
                      ablate="", worklist=None, work_id0=None):
    """Up to ``iters`` queue iterations on an ``m``-lane pool; exits early
    once the frontier is spent and at most ``threshold`` lanes remain
    active.  Pure function: jitted below for the single-device path and
    wrapped in shard_map by trace_queue_mesh.  Epochs bound the device
    time per dispatch (the remote worker crashes under multi-second
    sustained executions - renderer.plan_pool note)."""

    def cond(q: _QueueState):
        if threshold > 0:
            more = (q.frontier < total) | (
                jnp.sum(q.active.astype(jnp.int32)) > threshold)
        else:
            more = (q.frontier < total) | jnp.any(q.active)
        return (q.iteration < iters) & more

    L = st.log.shape[0]

    def body(q: _QueueState):
        # log-room guard, ON DEVICE: fold the log into the plane when this
        # iteration's m-row append would overflow (bit-invisible - posmap
        # rows are absolute; rare - the log is sized for the whole chunk).
        # Device-side wrapping keeps the host loop free of cursor reads.
        q = jax.lax.cond(q.cursor + m > L, _materialize, lambda s: s, q)
        return _queue_body(q, scene, camera, k_isect, k_scat, cam_salt,
                           chunk_s0, total, m=m, width=width,
                           height=height, engine=engine, fused=fused,
                           max_depth=max_depth, rr_depth=rr_depth,
                           ablate=ablate, worklist=worklist,
                           work_id0=work_id0)

    return jax.lax.while_loop(cond, body, st._replace(iteration=jnp.int32(0)))


_queue_epoch = _partial(jax.jit,
                        static_argnums=(8, 9, 10, 11, 12, 13, 14, 15, 16,
                                        17),
                        donate_argnums=0)(_queue_epoch_impl)


# log sizing: expected appends per chunk are total x avg-path-length rows
# (appends are R rows/iteration and iterations ~ total*avg/R); 8 is slack
# over the measured ~5-6, and the byte cap bounds HBM (v5e: 16 GB; the
# log's 3 channels cost 12 B/row).  An undersized log just materializes
# mid-chunk (one 43.5 ns/plane-row pass) - correct, only slower.
QUEUE_LOG_AVG_PATH = 8
QUEUE_LOG_BYTES = 2_000_000_000


def _materialize(st: _QueueState) -> _QueueState:
    """Fold the log into the plane and reset the log cursor.

    posmap rows are absolute radiance positions (each work item dies
    exactly once), so materializing commutes with everything and the
    result is bit-identical no matter when or how often it runs.  Called
    on device by _queue_epoch's log-room guard and (jitted, below) once
    per chunk by trace_queue."""
    L = st.log.shape[0]
    safe = jnp.clip(st.posmap, 0, L - 1)
    rows = st.log[safe]                     # ONE (L, 3) row-gather
    plane = tuple(
        jnp.where(st.posmap >= 0, rows[:, c], pl)
        for c, pl in enumerate(st.plane))
    return st._replace(plane=plane,
                       posmap=jnp.full_like(st.posmap, -1),
                       cursor=jnp.int32(0))


_queue_materialize = jax.jit(_materialize, donate_argnums=0)


@_partial(jax.jit, static_argnums=(0, 1, 2))
def _queue_init(R: int, pad_i: int, L: int) -> _QueueState:
    """Fresh queue state in ONE executable: eager per-leaf jnp.zeros would
    cost ~14 dispatch round trips through the remote-worker tunnel per
    trace_queue call (measured as the dominant per-round fixed cost of
    small adaptive rounds)."""
    return _QueueState(
        iteration=jnp.int32(0),
        frontier=jnp.int32(0),
        origin=jnp.zeros((R, 3), jnp.float32),
        direction=jnp.ones((R, 3), jnp.float32),
        time=jnp.zeros((R,), jnp.float32),
        throughput=jnp.ones((R, 3), jnp.float32),
        accum=jnp.zeros((R, 3), jnp.float32),
        bounce=jnp.zeros((R,), jnp.int32),
        work=jnp.full((R,), pad_i, jnp.int32),  # sentinel: no work yet
        active=jnp.zeros((R,), bool),
        plane=tuple(jnp.zeros((pad_i,), jnp.float32) for _ in range(3)),
        log=jnp.zeros((L, 3), jnp.float32),
        posmap=jnp.full((pad_i,), -1, jnp.int32),
        cursor=jnp.int32(0),
    )


@jax.jit
def _queue_counters(st: _QueueState):
    """(2,) int32 [frontier, n_active]: the host loop's whole view of an
    epoch, fetched in ONE ~12-byte transfer (a bare jnp.sum sync round
    trip measured 32 ms through the remote-worker tunnel)."""
    return jnp.stack([st.frontier, jnp.sum(st.active, dtype=jnp.int32)])


def trace_queue(
    scene: SceneData,
    camera,
    width: int,
    height: int,
    chunk_spp: int,            # samples in this chunk (static: sizes the plane)
    chunk_s0,                  # first global sample index of the chunk
    key,
    max_depth: int,
    R: int,                    # pool lanes
    engine: str = "xla",
    shade: Optional[str] = None,
    cam_salt=jnp.uint32(0),
    epoch_iters: int = 64,
    drain_levels=(),           # pool sizes for the final-drain compaction
    progress_cb=None,          # optional fn(frontier, total) per epoch
    log_rows: int = 0,         # radiance-log rows (0 = auto-size per chunk)
    rr_depth: int = 0,         # >0: Russian roulette after this many bounces
    worklist=None,             # (Wl,) uint32 packed (pixel, sample) items
    n_work: Optional[int] = None,  # true item count <= Wl (rest = padding)
    wl_block_pix=None,         # (Wl/Q,) int32 per-block pixel ids for
    #                            pixel-major Q-quantized worklists (>= P
    #                            rows drop); enables the blocked reduction
):
    """Render ``width*height*chunk_spp`` camera samples with a work-queue
    pool; returns the (H*W, 3) radiance SUM over the chunk's samples.

    Work item w (chunk-local) maps to pixel ``w % (W*H)`` (row-major, image
    row 0 at the top, matching renderer._pixel_grid) and global sample
    index ``chunk_s0 + w // (W*H)``.  The caller picks ``R`` (device lane
    cap), ``epoch_iters`` (watchdog bound) and the drain ladder.

    With ``worklist`` (adaptive sampling, tpu_ray/adaptive.py) the work->
    (pixel, sample) map instead comes from the packed entries (see
    _queue_body); ``chunk_spp`` is ignored, only the first ``n_work``
    entries are dispatched (the rest is shape-bucketing padding whose
    plane rows stay 0), and the return value is the pair
    ``(radiance sums, radiance square sums)``, each (H*W, 3), accumulated
    per PIXEL over the dispatched items.  ``chunk_s0`` still offsets the
    path-space draw ids: callers must advance it between rounds so draw
    streams never repeat.
    """
    P = width * height
    if worklist is not None:
        pad_i = int(worklist.shape[0])
        total_i = pad_i if n_work is None else int(n_work)
        chunk_spp = -(-total_i // P) or 1  # epoch-cap estimate only
    else:
        chunk_spp = int(chunk_spp)
        total_i = pad_i = P * chunk_spp
    if max_depth <= 0:
        # depth 0 -> every sample is black (src/Lib.hs:1303-1304)
        z = jnp.zeros((P, 3), jnp.float32)
        return (z, z) if worklist is not None else z
    fused = (_use_fused_shading(scene, None, engine) if shade is None
             else shade == "fused")
    # purpose keys, CONSTANT across iterations: per-draw variation comes
    # entirely from rng.path_ids(work, bounce)
    k_isect = jax.random.fold_in(key, 0)
    k_scat = jax.random.fold_in(key, 1)
    cam_salt = jnp.asarray(cam_salt, jnp.uint32)
    chunk_s0 = jnp.asarray(chunk_s0, jnp.uint32)
    total = jnp.int32(total_i)

    # L >= R keeps the device-side log-room guard sound: after a wrap the
    # next m-row append (m <= R) always fits
    L = max(log_rows, R) if log_rows > 0 else max(
        R, min(QUEUE_LOG_BYTES // 12, total_i * QUEUE_LOG_AVG_PATH))
    st = _queue_init(R, pad_i, L)

    def run(st, m, threshold):
        # host loop cap: every epoch either advances the frontier or
        # retires active paths (each bounded by max_depth iterations), so
        # this never binds unless something is wrong - fail loudly
        max_epochs = 21 + (total_i // max(R, 1) + chunk_spp * max_depth
                           + 2 * max_depth) // max(epoch_iters, 1) * 4
        # LAGGED pipeline: epoch k+1 is dispatched before epoch k's
        # counters are read, so the ~32 ms tunnel round trip per read
        # overlaps epoch k+1's execution and the device queue never
        # drains.  Over-dispatch is free: _queue_epoch's while-cond sees
        # the satisfied exit condition and runs ZERO iterations, returning
        # the state bit-unchanged.  Log wrapping is handled on device
        # (_queue_epoch's log-room guard), so nothing else needs the host.
        pending = None
        for _ in range(max_epochs):
            st = _queue_epoch(st, scene, camera, k_isect, k_scat, cam_salt,
                              chunk_s0, total, m, epoch_iters, threshold,
                              width, height, engine, fused, max_depth,
                              rr_depth, worklist=worklist)
            cur = _queue_counters(st)
            if pending is not None:
                frontier, n_active = (int(v) for v in np.asarray(pending))
                if progress_cb is not None:
                    progress_cb(frontier, total_i)
                if frontier >= total_i and n_active <= threshold:
                    return st
            pending = cur
        frontier, n_active = (int(v) for v in np.asarray(pending))
        if frontier >= total_i and n_active <= threshold:
            return st
        raise RuntimeError("trace_queue: epoch cap exceeded "
                           f"(frontier {frontier}/{total_i}, "
                           f"{n_active} active)")

    st = run(st, R, drain_levels[0] if drain_levels else 0)

    # final drain: ONE survival tail for the whole chunk, compacted down
    # the ladder (randomness travels with work/bounce, so compaction stays
    # invisible; plane writes are absolute).  _queue_compact is ONE jitted
    # executable per level: the eager argsort-take here used to run ~12
    # mini-op executables per level, i.e. ~36 of next-week's 88 cold-start
    # cache loads and ~12 tunnel dispatch RTTs per level of render wall
    # (r5 working-set audit; VERDICT r4 next-round #1b)
    for li, m in enumerate(drain_levels):
        st = _queue_compact(st, m)
        nxt = drain_levels[li + 1] if li + 1 < len(drain_levels) else 0
        st = run(st, m, nxt)

    # fold the log into the plane (the one per-chunk materialize the v2
    # flush design pays), then the per-channel sample-major reduction:
    # identical f32 association per (pixel, channel) to a (spp, P, 3)
    # .sum(axis=0)
    st = _queue_materialize(st)
    if worklist is not None:
        if wl_block_pix is not None:
            return _worklist_sums_blocked(st.plane, wl_block_pix, P)
        return _worklist_sums(st.plane, worklist, P)
    return jnp.stack(
        [pl.reshape(chunk_spp, P).sum(axis=0) for pl in st.plane], axis=-1)


@_partial(jax.jit, static_argnums=(2,))
def _worklist_sums(plane, worklist, P):
    """Per-pixel (radiance sum, radiance square sum) of a worklist chunk's
    plane, for arbitrary (unstructured) worklists: per-CHANNEL planar
    scatter-adds.  Padding rows were never written (their posmap stayed
    -1), so they add 0.  Never stack the plane into an (N, 3) array here:
    XLA lays that intermediate out lane-padded 3->128 (measured: a 64M-row
    stack copy wanted 32 GB of HBM).  Scatters pay per index (PERFLOG.md),
    so this path costs ~6 x N x 20 ns - production (adaptive) worklists
    use the blocked variant below instead."""
    pix = (worklist >> jnp.uint32(WL_SAMP_BITS)).astype(jnp.int32)
    z = jnp.zeros((P,), jnp.float32)
    sums = [z.at[pix].add(pl) for pl in plane]
    sqs = [z.at[pix].add(pl * pl) for pl in plane]
    return jnp.stack(sums, axis=-1), jnp.stack(sqs, axis=-1)


@_partial(jax.jit, static_argnums=(2,))
def _worklist_sums_blocked(plane, block_pix, P):
    """Blocked per-pixel reduction for PIXEL-MAJOR, block-quantized
    worklists (tpu_ray/adaptive.py): every Q = N // len(block_pix)
    consecutive items belong to one pixel, so each channel reduces by a
    dense (N/Q, Q) row sum (bandwidth-bound, exact per block) followed by
    ONE (N/Q,)-index scatter-add - ~Q x fewer scatter indices than the
    planar path.  ``block_pix`` entries >= P (padding blocks) drop."""
    nb = block_pix.shape[0]
    z = jnp.zeros((P,), jnp.float32)
    sums = [z.at[block_pix].add(pl.reshape(nb, -1).sum(axis=1),
                                mode="drop") for pl in plane]
    sqs = [z.at[block_pix].add((pl * pl).reshape(nb, -1).sum(axis=1),
                               mode="drop") for pl in plane]
    return jnp.stack(sums, axis=-1), jnp.stack(sqs, axis=-1)


# ---------------------------------------------------------------------------
# Work queue over a device mesh
# ---------------------------------------------------------------------------
#
# The queue's draws are keyed by GLOBAL (work item, bounce) / (pixel, global
# sample) counters and its plane writes are absolute, so splitting a chunk's
# samples across devices is exactly the same operation as splitting them
# into sample chunks on one device (tested bit-exact:
# test_queue_sample_chunking): device d runs the single-device queue on
# samples [chunk_s0 + d*spp_d, chunk_s0 + (d+1)*spp_d) with its own lanes,
# frontier, log and plane shard, entirely inside shard_map - no collective
# until ONE psum folds the per-device (P, 3) partials at the very end
# (sample-wave DP over ICI, SURVEY.md section 2.4).  The host loop drives
# all devices in lockstep: over-dispatching a finished device's epoch is a
# bit-exact identity (test_queue_overdispatch_is_identity), so no
# per-device scheduling is needed.

from jax.sharding import PartitionSpec as _PSpec


def _dev_squeeze(st):
    return jax.tree.map(lambda a: jnp.squeeze(a, 0), st)


def _dev_expand(st):
    return jax.tree.map(lambda a: a[None], st)


@_partial(jax.jit, static_argnums=tuple(range(7, 19)), donate_argnums=0)
def _queue_epoch_mesh(st, scene, camera, k_isect, k_scat, cam_salt,
                      chunk_s0, spp_d, total_d, m, iters, threshold,
                      width, height, engine, fused, max_depth, rr_depth,
                      mesh):
    """One lockstep epoch: every device advances its own sub-chunk queue.
    State leaves carry a leading device axis sharded over the mesh."""
    axis = mesh.axis_names[0]

    def dev(q, scene, camera, ki, ks, salt, cs0):
        q = _dev_squeeze(q)
        d = jax.lax.axis_index(axis).astype(jnp.uint32)
        s0 = cs0 + d * jnp.uint32(spp_d)
        q = _queue_epoch_impl(q, scene, camera, ki, ks, salt, s0,
                              jnp.int32(total_d), m, iters, threshold,
                              width, height, engine, fused, max_depth,
                              rr_depth)
        return _dev_expand(q)

    return jax.shard_map(
        dev, mesh=mesh,
        in_specs=(_PSpec(axis), _PSpec(), _PSpec(), _PSpec(), _PSpec(),
                  _PSpec(), _PSpec()),
        out_specs=_PSpec(axis), check_vma=False,
    )(st, scene, camera, k_isect, k_scat, cam_salt, chunk_s0)


@_partial(jax.jit, static_argnums=(1,))
def _queue_counters_mesh(st, mesh):
    """(D, 2) int32 [frontier, n_active] per device - the host loop's whole
    view of a lockstep epoch, one small transfer like _queue_counters."""
    axis = mesh.axis_names[0]

    def dev(q):
        q = _dev_squeeze(q)
        return jnp.stack([q.frontier,
                          jnp.sum(q.active, dtype=jnp.int32)])[None]

    return jax.shard_map(dev, mesh=mesh, in_specs=(_PSpec(axis),),
                         out_specs=_PSpec(axis), check_vma=False)(st)


@_partial(jax.jit, static_argnums=(1,), donate_argnums=0)
def _queue_compact(st: _QueueState, m: int) -> _QueueState:
    """Drain-ladder compaction as ONE executable: gather the ``m`` most-
    active lanes (stable argsort keeps work order), reset the epoch
    counter, pass the plane/log/posmap through.  Pure permutation + copies
    - bit-identical to the eager argsort-take it replaced."""
    order = jnp.argsort(~st.active, stable=True)[:m]
    take = lambda a: a[order]
    return _QueueState(
        iteration=jnp.int32(0), frontier=st.frontier,
        origin=take(st.origin), direction=take(st.direction),
        time=take(st.time), throughput=take(st.throughput),
        accum=take(st.accum), bounce=take(st.bounce),
        work=take(st.work), active=take(st.active), plane=st.plane,
        log=st.log, posmap=st.posmap, cursor=st.cursor)


@_partial(jax.jit, static_argnums=(1, 2), donate_argnums=0)
def _queue_compact_mesh(st, m, mesh):
    """Per-device drain-ladder compaction (trace_queue's argsort take)."""
    axis = mesh.axis_names[0]

    def dev(q):
        q = _dev_squeeze(q)
        order = jnp.argsort(~q.active, stable=True)[:m]
        take = lambda a: a[order]
        return _dev_expand(q._replace(
            iteration=jnp.int32(0), origin=take(q.origin),
            direction=take(q.direction), time=take(q.time),
            throughput=take(q.throughput), accum=take(q.accum),
            bounce=take(q.bounce), work=take(q.work),
            active=take(q.active)))

    return jax.shard_map(dev, mesh=mesh, in_specs=(_PSpec(axis),),
                         out_specs=_PSpec(axis), check_vma=False)(st)


@_partial(jax.jit, static_argnums=(1, 2, 3), donate_argnums=0)
def _queue_finish_mesh(st, spp_d, pixels, mesh):
    """Materialize each device's log, reduce its plane shard sample-major
    to a (P, 3) partial, and psum the partials over ICI."""
    axis = mesh.axis_names[0]

    def dev(q):
        q = _materialize(_dev_squeeze(q))
        part = jnp.stack(
            [pl.reshape(spp_d, pixels).sum(axis=0) for pl in q.plane],
            axis=-1)
        return jax.lax.psum(part, axis)

    return jax.shard_map(dev, mesh=mesh, in_specs=(_PSpec(axis),),
                         out_specs=_PSpec(), check_vma=False)(st)


def trace_queue_mesh(
    scene: SceneData,
    camera,
    width: int,
    height: int,
    chunk_spp: int,            # samples in this chunk; divisible by D
    chunk_s0,                  # first global sample index of the chunk
    key,
    max_depth: int,
    R: int,                    # pool lanes PER DEVICE
    mesh,
    engine: str = "xla",
    shade: Optional[str] = None,
    cam_salt=jnp.uint32(0),
    epoch_iters: int = 64,
    drain_levels=(),
    progress_cb=None,
    log_rows: int = 0,
    rr_depth: int = 0,
):
    """trace_queue over a device mesh: returns the chunk's (H*W, 3)
    radiance SUM, identical to the single-device queue up to the final
    psum's f32 summation order (per-sample radiances are bit-identical -
    the module note above).  ``chunk_spp`` must divide evenly over the
    mesh; the renderer arranges that (render._render_queue)."""
    D = int(mesh.devices.size)
    if chunk_spp % D:
        raise ValueError(f"chunk_spp {chunk_spp} not divisible by "
                         f"{D} devices")
    P = width * height
    spp_d = chunk_spp // D
    total_d = P * spp_d
    if max_depth <= 0:
        return jnp.zeros((P, 3), jnp.float32)
    fused = (_use_fused_shading(scene, None, engine) if shade is None
             else shade == "fused")
    k_isect = jax.random.fold_in(key, 0)
    k_scat = jax.random.fold_in(key, 1)
    cam_salt = jnp.asarray(cam_salt, jnp.uint32)
    chunk_s0 = jnp.asarray(chunk_s0, jnp.uint32)
    R = max(1024, min(R, total_d))
    drain_levels = tuple(l for l in drain_levels if l < R)

    L = max(log_rows, R) if log_rows > 0 else max(
        R, min(QUEUE_LOG_BYTES // 12, total_d * QUEUE_LOG_AVG_PATH))
    st = _QueueState(
        iteration=jnp.zeros((D,), jnp.int32),
        frontier=jnp.zeros((D,), jnp.int32),
        origin=jnp.zeros((D, R, 3), jnp.float32),
        direction=jnp.ones((D, R, 3), jnp.float32),
        time=jnp.zeros((D, R), jnp.float32),
        throughput=jnp.ones((D, R, 3), jnp.float32),
        accum=jnp.zeros((D, R, 3), jnp.float32),
        bounce=jnp.zeros((D, R), jnp.int32),
        work=jnp.full((D, R), total_d, jnp.int32),
        active=jnp.zeros((D, R), bool),
        plane=tuple(jnp.zeros((D, total_d), jnp.float32) for _ in range(3)),
        log=jnp.zeros((D, L, 3), jnp.float32),
        posmap=jnp.full((D, total_d), -1, jnp.int32),
        cursor=jnp.zeros((D,), jnp.int32),
    )

    def run(st, m, threshold):
        max_epochs = 21 + (total_d // max(R, 1) + spp_d * max_depth
                           + 2 * max_depth) // max(epoch_iters, 1) * 4
        # same lagged pipeline as trace_queue.run: epoch k+1 dispatches
        # before epoch k's counters land; over-dispatch is an identity
        pending = None
        for _ in range(max_epochs):
            st = _queue_epoch_mesh(st, scene, camera, k_isect, k_scat,
                                   cam_salt, chunk_s0, spp_d, total_d, m,
                                   epoch_iters, threshold, width, height,
                                   engine, fused, max_depth, rr_depth,
                                   mesh)
            cur = _queue_counters_mesh(st, mesh)
            if pending is not None:
                arr = np.asarray(pending)
                if progress_cb is not None:
                    progress_cb(int(arr[:, 0].sum()), total_d * D)
                if (arr[:, 0] >= total_d).all() and \
                        (arr[:, 1] <= threshold).all():
                    return st
            pending = cur
        arr = np.asarray(pending)
        if (arr[:, 0] >= total_d).all() and (arr[:, 1] <= threshold).all():
            return st
        raise RuntimeError(
            "trace_queue_mesh: epoch cap exceeded "
            f"(frontiers {arr[:, 0].tolist()}/{total_d}, "
            f"active {arr[:, 1].tolist()})")

    st = run(st, R, drain_levels[0] if drain_levels else 0)
    for li, m in enumerate(drain_levels):
        st = _queue_compact_mesh(st, m, mesh)
        nxt = drain_levels[li + 1] if li + 1 < len(drain_levels) else 0
        st = run(st, m, nxt)
    return _queue_finish_mesh(st, spp_d, P, mesh)


# ---------------------------------------------------------------------------
# Worklist queue over a device mesh (adaptive sampling, tpu_ray/adaptive.py)
# ---------------------------------------------------------------------------
#
# An adaptive round's worklist is a flat array of packed (pixel, sample)
# items; sharding it over the mesh is a contiguous split (device d takes
# items [d*wl_d, (d+1)*wl_d)).  Draw streams are keyed by the GLOBAL work
# id via ``work_id0``, so every item's radiance is bit-identical to the
# single-device round; only the final psum's f32 order differs.  Padding
# entries (>= n_work) concentrate on the last devices and are never
# dispatched - their frontier-exhaustion condition uses the per-device
# real count clip(n_work - d*wl_d, 0, wl_d).

@_partial(jax.jit, static_argnums=tuple(range(9, 20)), donate_argnums=0)
def _queue_epoch_wl_mesh(st, scene, camera, k_isect, k_scat, cam_salt,
                         chunk_s0, n_work, worklist, wl_d, m, iters,
                         threshold, width, height, engine, fused, max_depth,
                         rr_depth, mesh):
    """One lockstep epoch over per-device worklist shards."""
    axis = mesh.axis_names[0]

    def dev(q, scene, camera, ki, ks, salt, cs0, nw, wl):
        q = _dev_squeeze(q)
        wl = jnp.squeeze(wl, 0)
        d = jax.lax.axis_index(axis).astype(jnp.int32)
        total_d = jnp.clip(nw - d * wl_d, 0, wl_d)
        wid0 = (cs0 * jnp.uint32(width * height)
                + (d * wl_d).astype(jnp.uint32))
        q = _queue_epoch_impl(q, scene, camera, ki, ks, salt, cs0, total_d,
                              m, iters, threshold, width, height, engine,
                              fused, max_depth, rr_depth, worklist=wl,
                              work_id0=wid0)
        return _dev_expand(q)

    return jax.shard_map(
        dev, mesh=mesh,
        in_specs=(_PSpec(axis), _PSpec(), _PSpec(), _PSpec(), _PSpec(),
                  _PSpec(), _PSpec(), _PSpec(), _PSpec(axis)),
        out_specs=_PSpec(axis), check_vma=False,
    )(st, scene, camera, k_isect, k_scat, cam_salt, chunk_s0, n_work,
      worklist)


@_partial(jax.jit, static_argnums=(2, 3), donate_argnums=0)
def _queue_finish_wl_mesh(st, block_pix, P, mesh):
    """Materialize each device's log, blocked-reduce its plane shard per
    pixel, and psum the stacked (2, P, 3) [sums, square sums]."""
    axis = mesh.axis_names[0]

    def dev(q, bp):
        q = _materialize(_dev_squeeze(q))
        s, s2 = _worklist_sums_blocked(q.plane, jnp.squeeze(bp, 0), P)
        return jax.lax.psum(jnp.stack((s, s2)), axis)

    return jax.shard_map(dev, mesh=mesh,
                         in_specs=(_PSpec(axis), _PSpec(axis)),
                         out_specs=_PSpec(), check_vma=False)(st, block_pix)


def trace_queue_wl_mesh(
    scene: SceneData,
    camera,
    width: int,
    height: int,
    chunk_s0,                  # sample-unit offset for path-draw ids
    key,
    max_depth: int,
    R: int,                    # pool lanes PER DEVICE
    mesh,
    worklist,                  # (Wl,) uint32 packed items; Wl % (D*Q) == 0
    n_work: int,               # real items <= Wl (rest = bucket padding)
    wl_block_pix,              # (Wl/WL_QUANT,) int32 per-block pixel ids
    engine: str = "xla",
    shade: Optional[str] = None,
    cam_salt=jnp.uint32(0),
    epoch_iters: int = 64,
    log_rows: int = 0,
    rr_depth: int = 0,
):
    """trace_queue(worklist=...) sharded over a device mesh: returns the
    per-pixel ((P, 3) radiance sums, (P, 3) square sums) accumulated over
    the dispatched items, equal to the single-device worklist round up to
    the final psum's f32 summation order (per-item radiances are
    bit-identical - ``work_id0`` keys the same global draw ids)."""
    D = int(mesh.devices.size)
    Wl = int(worklist.shape[0])
    if Wl % D:
        raise ValueError(f"worklist pad {Wl} not divisible by {D} devices")
    wl_d = Wl // D
    q_blk = Wl // int(wl_block_pix.shape[0])  # adaptive.WL_QUANT
    if wl_d % q_blk:
        raise ValueError(f"per-device shard {wl_d} not {q_blk}-block-aligned")
    P = width * height
    fused = (_use_fused_shading(scene, None, engine) if shade is None
             else shade == "fused")
    k_isect = jax.random.fold_in(key, 0)
    k_scat = jax.random.fold_in(key, 1)
    cam_salt = jnp.asarray(cam_salt, jnp.uint32)
    chunk_s0 = jnp.asarray(chunk_s0, jnp.uint32)
    n_work_t = jnp.int32(n_work)
    R = max(1024, min(R, wl_d))

    L = max(log_rows, R) if log_rows > 0 else max(
        R, min(QUEUE_LOG_BYTES // 12, wl_d * QUEUE_LOG_AVG_PATH))
    st = _QueueState(
        iteration=jnp.zeros((D,), jnp.int32),
        frontier=jnp.zeros((D,), jnp.int32),
        origin=jnp.zeros((D, R, 3), jnp.float32),
        direction=jnp.ones((D, R, 3), jnp.float32),
        time=jnp.zeros((D, R), jnp.float32),
        throughput=jnp.ones((D, R, 3), jnp.float32),
        accum=jnp.zeros((D, R, 3), jnp.float32),
        bounce=jnp.zeros((D, R), jnp.int32),
        work=jnp.full((D, R), wl_d, jnp.int32),
        active=jnp.zeros((D, R), bool),
        plane=tuple(jnp.zeros((D, wl_d), jnp.float32) for _ in range(3)),
        log=jnp.zeros((D, L, 3), jnp.float32),
        posmap=jnp.full((D, wl_d), -1, jnp.int32),
        cursor=jnp.zeros((D,), jnp.int32),
    )
    worklist = worklist.reshape(D, wl_d)
    totals = np.clip(n_work - np.arange(D) * wl_d, 0, wl_d)

    max_epochs = 21 + (wl_d // max(R, 1)
                       + (wl_d // max(P, 1) + 2) * max_depth
                       + 2 * max_depth) // max(epoch_iters, 1) * 4
    pending = None
    for _ in range(max_epochs):
        st = _queue_epoch_wl_mesh(st, scene, camera, k_isect, k_scat,
                                  cam_salt, chunk_s0, n_work_t, worklist,
                                  wl_d, R, epoch_iters, 0, width, height,
                                  engine, fused, max_depth, rr_depth, mesh)
        cur = _queue_counters_mesh(st, mesh)
        if pending is not None:
            arr = np.asarray(pending)
            if (arr[:, 0] >= totals).all() and (arr[:, 1] == 0).all():
                break
        pending = cur
    else:
        arr = np.asarray(pending)
        if not ((arr[:, 0] >= totals).all() and (arr[:, 1] == 0).all()):
            raise RuntimeError(
                "trace_queue_wl_mesh: epoch cap exceeded "
                f"(frontiers {arr[:, 0].tolist()}/{totals.tolist()}, "
                f"active {arr[:, 1].tolist()})")
    out = _queue_finish_wl_mesh(st, wl_block_pix.reshape(D, -1), P, mesh)
    return out[0], out[1]
