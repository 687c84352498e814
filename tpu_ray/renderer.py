"""Render driver: sample scheduling, accumulation, checkpointing.

Replaces the reference's row-by-row spark pipeline (``runRender``,
src/Lib.hs:1491-1523): instead of one RNG per image column threaded row to
row, the image is rendered by a pool of ray slots (k slots per pixel) that
regenerate camera samples as paths terminate (:func:`tpu_ray.integrator.
trace_pool`).  Work is split into "waves" of ``samples_per_wave`` samples
per slot - the unit of progress reporting, checkpointing and multi-device
scheduling.  Wave keys and per-sample camera keys derive from global
indices, so a render is reproducible and independent of how waves are
scheduled (host loop here, device mesh in tpu_ray.parallel).

Monte-Carlo accumulation is associative, so the film doubles as a
checkpoint: pass ``checkpoint_path`` to make the render resumable (the
reference's only "resume" story is that finished rows were already on
stdout - SURVEY.md section 5).
"""
from __future__ import annotations

import os
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .core.camera import Camera
from .integrator import trace, trace_pool
from .models.scene_data import SceneData

# empirically stable lane counts on the remote TPU worker for >512-prim
# scenes (see plan_pool / the band-tiling logic in render)
XLA_BIG_SCENE_LANES = 160_000
# the Pallas sweep's stability envelope scales as lanes x prims, not lanes:
# 160k x 3409 ran stable all of round 2, and 320k x 1409 measured 1.5x
# FASTER than 160k x 1409 (44.4 vs 66.3 s/100spp on next-week, PERFLOG.md)
# because bigger waves amortize per-wave loop/tail overhead.  Doubling
# again to 640k x 1409 ran stable too but measured 6% SLOWER at the full
# bench config same-day (48.6 vs 45.7 s; compaction sorts and state
# working-set grow superlinearly) - 550M is the measured sweet spot.
PALLAS_LANE_PRIM_BUDGET = 550_000_000


def pallas_lane_cap(n_prims: int) -> int:
    return int(max(160_000,
                   min(1 << 20, PALLAS_LANE_PRIM_BUDGET // max(n_prims, 1))))


# auto-checkpoint renders of at least this many waves so a worker crash
# loses at most one checkpoint interval (the reference's streamed rows give
# it the same property for free - app/Main.hs:62)
AUTO_CHECKPOINT_WAVES = 8
# bump whenever estimator/RNG semantics change: invalidates old checkpoints
# (a resumed accumulator must have been produced by identical code)
SEMANTICS_VERSION = 4


def _largest_divisor_leq(n: int, cap: int) -> int:
    k = max(1, min(cap, n))
    while n % k:
        k -= 1
    return k


def pick_samples_per_wave(width: int, height: int, spp: int, rays_per_wave: int) -> int:
    """Largest divisor of spp with width*height*k <= rays_per_wave."""
    return _largest_divisor_leq(spp, max(1, rays_per_wave // max(width * height, 1)))


def resolve_engine(scene, engine: str = "auto") -> str:
    """'auto' -> the fused Pallas sweep for >512-prim scenes (~1.5x on
    next-week-final), else the XLA sweep; on TPU the integrator
    additionally runs the full pool-step Pallas kernel on top of either
    (integrator._use_fused_shading).  The whole-wave megakernel
    (--engine mega) is no longer auto-selected anywhere: the wavefront +
    full-step kernel beats it across the board (cornell 3.9 vs 5.0 s,
    cornell-smoke 2.55 vs 4.88 s, PERFLOG.md) - its per-prim winner-row
    carry only narrowed with scene size, never won."""
    if engine == "mega":
        from .ops.megakernel import supported

        return "mega" if supported(scene) else "xla"
    if engine != "auto":
        return engine
    platform = jax.devices()[0].platform.lower()
    on_tpu = "tpu" in platform or platform == "axon"
    if not on_tpu:
        return "xla"  # CPU (the test path): Pallas would run interpreted
    return "pallas" if scene.n_prims > 512 else "xla"


def resolve_mode(scene, mode: str = "auto", mesh=None, bvh=False,
                 engine: str = "auto", _rows=None, spp=None) -> str:
    """'auto' -> the work-queue integrator for big-prim renders, the wave
    pool otherwise.  The queue holds ~100% occupancy but pays ~19 ms/iter
    of flush + inject glue, so it wins exactly where the per-iteration
    sweep dominates (measured, tools/bench_mode.py: next-week 7.4 s queue
    vs 9.5 s pool; book1 3.4 vs 1.4 AGAINST; two-spheres 1.9 vs 0.36
    AGAINST).  BVH / megakernel / band slices stay on the pool.  Meshes
    run the queue via trace_queue_mesh; spp that doesn't divide the mesh
    is handled by a single-device remainder chunk (_render_queue), so the
    only mesh demotion left is spp unknown or smaller than the device
    count.  Every demotion away from the queue is announced on stderr -
    silently skipping the big-scene production path cost round 2 its
    headline config (VERDICT round 2 weak #2)."""
    requested = mode
    if mode == "auto":
        mode = "queue" if scene.n_prims > QUEUE_MIN_PRIMS else "pool"
    demote = None
    if mode == "queue" and (bvh or resolve_engine(scene, engine) == "mega"
                            or _rows is not None):
        demote = "bvh / megakernel / band slices run on the pool integrator"
    elif mode == "queue" and mesh is not None and (
            spp is None or spp < int(mesh.devices.size)):
        demote = (f"sharding the work queue needs spp >= the "
                  f"{int(mesh.devices.size)}-device mesh (got {spp})")
    if demote:
        if requested == "queue" or scene.n_prims > QUEUE_MIN_PRIMS:
            print(f"tpu_ray: demoting mode=queue to the wave pool: {demote}",
                  file=sys.stderr)
        mode = "pool"
    return mode


def plan_pool(scene, width: int, height: int, spp: int,
              rays_per_wave: int = 1 << 20, samples_per_wave: int = 64,
              engine: str = "xla"):
    """Pool-mode schedule: (k_pool slots/pixel, samples per slot per wave,
    wave count).  Shared by render() and warmup callers (bench) so both
    compile the same executable.

    Two device-driven bounds: pool lanes are capped so one 512-prim chunk's
    (R, C) f32 temporaries fit HBM (~6 live under the lax.scan sweep), and
    per-wave sample counts are capped so a single wave stays under remote
    runtime watchdogs (~60s of device time) on big scenes.
    """
    engine = resolve_engine(scene, engine)
    if engine in ("xla", "mxu") and scene.n_prims > 512:
        # multi-chunk (lax.scan) scenes: the remote TPU worker crashes above
        # ~150k lanes x 512-prim chunks (empirical); single-chunk scenes run
        # fine at 1M lanes
        rays_per_wave = min(rays_per_wave, XLA_BIG_SCENE_LANES)
    if engine == "pallas" and scene.n_prims > 512:
        # empirically stable lane count for big-scene kernel waves
        rays_per_wave = min(rays_per_wave, pallas_lane_cap(scene.n_prims))
    k_pool = pick_samples_per_wave(width, height, spp, rays_per_wave)
    s_total = spp // k_pool
    lanes = width * height * k_pool
    # Per-wave device-time budget: big scenes get ~2.5s dispatches (the
    # remote worker crashes under multi-second sustained executions;
    # empirically a 160k-lane x 3409-prim x 4-sample wave ~9s dies, ~2s
    # survives).  The cost model is anchored on a measurement, not flops:
    # one SAMPLE costs ~avg_path_len (~7) masked sweep iterations.
    # Measured (PERFLOG.md round 2, next-week 320k lanes): 1-sample waves
    # are FASTEST despite paying the straggler tail per wave - s_wave=2
    # measured 49.3 vs 45.7 s with XLA shading, s_wave=5 measured 13.8 vs
    # 12.3 s with fused shading (longer waves lose more to declining
    # occupancy than they save in tails; compaction only runs between
    # run_until levels, not between samples).  The 4.2e-9 constant keeps
    # s_budget at 1 for reference-scale big scenes AND keeps the per-wave
    # device time under the remote worker watchdog (a 160k x 3409 x
    # 4-sample wave ~9s dies, ~2s survives).  Small scenes keep a generous
    # cap that never binds at reference sizes.
    if scene.n_prims > 512:
        time_budget_s, per_lane_prim_sample_s = 2.5, 4.2e-9
        s_budget = max(1, int(
            time_budget_s / (lanes * max(scene.n_prims, 1)
                             * per_lane_prim_sample_s)))
    else:
        s_budget = max(1, int(2e13 / (lanes * max(scene.n_prims, 1) * 8)))
    s_wave = _largest_divisor_leq(s_total, min(samples_per_wave, s_budget))
    return k_pool, s_wave, s_total // s_wave


# film-plane budget for queue mode: per-(sample, pixel) radiance rows are
# 12 bytes; chunks of samples are sized so the plane stays under this
# (v5e has 16 GB HBM; scene + pool state are tiny next to it)
QUEUE_PLANE_BYTES = 3_500_000_000

# mode="auto" picks the work-queue integrator above this primitive count
# (see render(); measured crossover is between book1's 485 and
# next-week's 1409 solid prims - the same >512 threshold that triggers
# the big-scene lane caps)
QUEUE_MIN_PRIMS = 512


def plan_queue(scene, width: int, height: int, spp: int,
               rays_per_wave: int = 1 << 20, engine: str = "xla"):
    """Queue-mode schedule: (R lanes, chunk_spp, epoch_iters, drain_levels).

    Same device-driven lane caps as plan_pool; the epoch length targets
    ~1.5 s of device time per dispatch (remote-worker watchdog), estimated
    from the measured per-lane-prim sweep cost; the drain ladder reuses the
    pool's per-scene compaction shape (integrator.COMPACT_* notes).
    """
    from . import integrator as integ

    engine = resolve_engine(scene, engine)
    cap = rays_per_wave
    if engine in ("xla", "mxu") and scene.n_prims > 512:
        cap = min(cap, XLA_BIG_SCENE_LANES)
    if engine == "pallas" and scene.n_prims > 512:
        cap = min(cap, pallas_lane_cap(scene.n_prims))
    P = width * height
    R = max(1024, min(cap, P * spp))
    chunk_cap = max(1, QUEUE_PLANE_BYTES // (P * 12))
    chunk_spp = _largest_divisor_leq(spp, chunk_cap)
    iter_cost = R * max(scene.n_prims, 1) * 3.6e-11 + 1.5e-3
    epoch_iters = max(8, min(256, int(1.5 / iter_cost)))
    # queue drain ladder: R/2 then quarter steps (R/8, R/32, ...).  The
    # queue's epochs self-terminate on device, so each EXTRA level costs a
    # fixed ~80 ms floor (dispatch + argsort + one exposed counter RTT);
    # measured on next-week-final (PERFLOG.md "Queue drain ladder"):
    # halving 6-level 6.02 s, quarter-step 3-level 5.72 s, no ladder
    # 6.00 s - all bit-identical.
    levels = []
    m = R
    if R >= integ.COMPACT_MIN and m // 2 >= integ.COMPACT_FLOOR:
        m //= 2
        levels.append(m)
        while m // 4 >= integ.COMPACT_FLOOR:
            m //= 4
            levels.append(m)
    return R, chunk_spp, epoch_iters, tuple(levels)


def clear_auto_checkpoints() -> None:
    """Delete auto checkpoints (bench uses this so every timed attempt
    measures a FULL render instead of resuming a crashed one)."""
    import glob

    d = os.path.join(os.path.expanduser("~"), ".cache", "tpu_ray", "checkpoints")
    for f in glob.glob(os.path.join(d, "auto-*.npz")):
        try:
            os.remove(f)
        except OSError:
            pass


def _scene_fingerprint(scene: SceneData, camera: Camera) -> str:
    """Short content hash of the scene payload + camera parameters."""
    import hashlib

    h = hashlib.sha1()
    for a in (scene.prim_payload, scene.mat_payload):
        h.update(np.asarray(a).tobytes())
    for leaf in jax.tree.leaves(camera):
        h.update(np.asarray(leaf).tobytes())
    h.update(camera.sampler.encode())  # static field, not a pytree leaf
    h.update(np.float32(scene.background).tobytes())
    return h.hexdigest()[:12]


from functools import partial as _rd_partial


@_rd_partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _pixel_grid(width: int, height: int, k: int, row0: int = 0,
                rows: int | None = None):
    """Flattened (k, rows, W) pixel coordinate fractions for image rows
    [row0, row0+rows): image row 0 is the top of the frame, i.e.
    y = height-1 (pixelPositions, src/Lib.hs:1488-1489).

    Jitted (one executable instead of ~6 eager mini-ops per cold start -
    r5 working-set audit); bit-safe: integer chains + one final divide
    per array, nothing XLA can FMA-contract."""
    rows = height if rows is None else rows
    ys = jnp.broadcast_to(
        jnp.arange(height - 1 - row0, height - 1 - row0 - rows, -1,
                   dtype=jnp.float32)[None, :, None],
        (k, rows, width),
    ).reshape(-1) / height
    xs = jnp.broadcast_to(
        jnp.arange(width, dtype=jnp.float32)[None, None, :], (k, rows, width)
    ).reshape(-1) / width
    return xs, ys


@_rd_partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _slot_ids(width: int, height: int, k: int, row0: int = 0,
              rows: int | None = None):
    """GLOBAL slot ids k*(H*W) + image_row*W + col for the band's lanes.

    All pool randomness is keyed on these (integrator.trace_pool), so a
    band renders exactly the rows it would produce inside a full-frame
    pool - band-tiled, meshed and compacted renders are bit-identical.
    Jitted like _pixel_grid (exact uint32 arithmetic)."""
    rows = height if rows is None else rows
    return (
        jnp.arange(k, dtype=jnp.uint32)[:, None, None] * jnp.uint32(width * height)
        + jnp.arange(row0, row0 + rows, dtype=jnp.uint32)[None, :, None]
        * jnp.uint32(width)
        + jnp.arange(width, dtype=jnp.uint32)[None, None, :]
    ).reshape(-1)


from functools import partial


@partial(jax.jit, static_argnums=(4, 5, 6, 9, 11, 13, 14, 15, 16),
         donate_argnums=0)
def _pool_step(accum, scene, camera, key, width, height, k_pool, n_samples,
               sample0, max_depth, cam_salt=0, engine="xla", bvh=None,
               row0=0, rows=None, shade=None, rr_depth=0):
    """One pool wave, accumulated into the film.

    Module-level jit with scene/camera as *arguments* and ``n_samples``
    traced: every render() call of the same scene structure and image shape
    reuses one compiled executable (remote TPU compiles cost minutes), and a
    1-sample warmup compiles the same program as a 64-sample wave.
    """
    rows = height if rows is None else rows
    xs, ys = _pixel_grid(width, height, k_pool, row0, rows)
    rad, _ = trace_pool(
        scene, camera, xs, ys, (1.0 / width, 1.0 / height), key,
        n_samples, sample0, max_depth, cam_salt, bvh=bvh, engine=engine,
        slot_ids=_slot_ids(width, height, k_pool, row0, rows), shade=shade,
        rr_depth=rr_depth,
    )
    return accum + rad.reshape(k_pool, rows, width, 3).sum(axis=0)


@partial(jax.jit, static_argnums=(2, 3, 4), donate_argnums=0)
def _film_add(accum, rad, k_pool, rows, width):
    """Accumulate a wave's per-slot radiance into the film."""
    return accum + rad.reshape(k_pool, rows, width, 3).sum(axis=0)


# megakernel variant: n_samples must be STATIC (it sizes the in-kernel
# iteration cap and the precomputed fold_in key table)
_pool_step_mega = partial(jax.jit,
                          static_argnums=(4, 5, 6, 7, 9, 11, 13, 14, 15, 16),
                          donate_argnums=0)(_pool_step.__wrapped__)


def make_pool_wave_fn(scene: SceneData, camera: Camera, width: int, height: int,
                      k_pool: int, samples_per_slot: int, max_depth: int,
                      cam_salt=0, bvh=None, engine: str = "xla",
                      row0: int = 0, rows: int | None = None,
                      rr_depth: int = 0):
    """fn(key, sample0) -> (rows, W, 3) radiance summed over
    k_pool * samples_per_slot samples per pixel (used by the mesh path)."""
    rows = height if rows is None else rows
    xs, ys = _pixel_grid(width, height, k_pool, row0, rows)
    sids = _slot_ids(width, height, k_pool, row0, rows)
    # resolved here, outside any jit of wave(), so the executable is keyed
    # by the fused-shading choice (integrator.trace_pool docstring)
    from .integrator import _use_fused_shading

    shade = "fused" if _use_fused_shading(scene, bvh, engine) else "xla"

    def wave(key, sample0):
        accum, _ = trace_pool(
            scene, camera, xs, ys, (1.0 / width, 1.0 / height), key,
            samples_per_slot, sample0, max_depth, cam_salt, bvh=bvh,
            engine=engine, slot_ids=sids, shade=shade, rr_depth=rr_depth,
        )
        return accum.reshape(k_pool, rows, width, 3).sum(axis=0)

    return wave


def make_wave_fn(scene: SceneData, camera: Camera, width: int, height: int,
                 k: int, max_depth: int, bvh=None, engine: str = "xla",
                 rr_depth: int = 0):
    """Plain-wavefront variant (one sample per slot per wave): fn(key) ->
    (H, W, 3) sum of k samples per pixel.  Kept as the semantic reference;
    the pool integrator is the fast path."""
    if camera.sampler != "uniform":
        raise ValueError(
            "mode='wave' draws camera samples by lane position, not by "
            "(pixel, sample index), so low-discrepancy samplers do not "
            "apply; use the pool or queue mode with --sampler "
            f"{camera.sampler!r}")
    xs, ys = _pixel_grid(width, height, k)

    def wave(key):
        k_jit, k_cam, k_path = jax.random.split(key, 3)
        jitter = jax.random.uniform(k_jit, (xs.shape[0], 2))
        u = xs + jitter[:, 0] / width
        v = ys + jitter[:, 1] / height
        ro, rd, rt = camera.get_rays(k_cam, u, v)
        rad = trace(scene, ro, rd, rt, k_path, max_depth, bvh=bvh,
                    engine=engine, rr_depth=rr_depth)
        return rad.reshape(k, height, width, 3).sum(axis=0)

    return wave


def _render_queue(scene, camera, width, height, spp, max_depth, seed,
                  rays_per_wave, engine, progress, checkpoint_path,
                  checkpoint_every, mesh=None, rr_depth=0, on_partial=None):
    """Work-queue render driver (integrator.trace_queue): sample chunks
    sized by the film-plane budget, per-chunk checkpointing, epoch-level
    progress.  Returns the (H, W, 3) mean image.  With a mesh, each
    chunk's samples shard over the devices (integrator.trace_queue_mesh);
    spp that doesn't divide the mesh leaves a final remainder chunk that
    renders single-device - draw streams are keyed by global (work item,
    bounce) ids, so the split is invisible to the estimate."""
    from .integrator import _use_fused_shading, trace_queue, trace_queue_mesh

    P = width * height
    R, chunk_spp, epoch_iters, drain_levels = plan_queue(
        scene, width, height, spp, rays_per_wave, engine)
    if mesh is not None:
        # mesh chunks must split evenly over devices; the plane budget is
        # per device, so a chunk may hold D single-device chunks' samples
        D = int(mesh.devices.size)
        chunk_cap = max(1, QUEUE_PLANE_BYTES // (P * 12))
        chunk_spp = D * _largest_divisor_leq(spp // D, chunk_cap)
        chunks = [chunk_spp] * (spp // D * D // chunk_spp)
        if spp % D:
            chunks.append(spp % D)  # single-device remainder
    else:
        chunks = [chunk_spp] * (spp // chunk_spp)
    n_chunks = len(chunks)
    chunk_s0s = [sum(chunks[:c]) for c in range(n_chunks)]
    shade = "fused" if _use_fused_shading(scene, None, engine) else "xla"
    base_key = jax.random.PRNGKey(seed)
    # ONE key for every chunk: draws are keyed by (key, purpose, work item,
    # bounce) and work items are globally indexed, so chunks share streams
    # without collision (trace_queue module note)
    k_queue = jax.random.fold_in(base_key, 0x5EED)

    film = jnp.zeros((P, 3), jnp.float32)
    start_chunk = 0

    auto_ckpt = (checkpoint_path is None and checkpoint_every == 0
                 and n_chunks >= 2)
    config_tag = None
    if checkpoint_path or auto_ckpt:
        D = int(mesh.devices.size) if mesh is not None else 0
        config_tag = (f"v{SEMANTICS_VERSION}.s{int(scene.strict)}"
                      f"|{_scene_fingerprint(scene, camera)}|{scene.n_prims}"
                      f"|{width}x{height}|{spp}|{max_depth}|{seed}"
                      f"|queue|{engine}|{chunk_spp}x{n_chunks}"
                      f"r{chunks[-1]}|d{D}|rr{rr_depth}")
    if auto_ckpt:
        import hashlib

        d = os.path.join(os.path.expanduser("~"), ".cache", "tpu_ray",
                         "checkpoints")
        os.makedirs(d, exist_ok=True)
        tag12 = hashlib.sha1(config_tag.encode()).hexdigest()[:12]
        checkpoint_path = os.path.join(d, f"auto-{tag12}.npz")
        checkpoint_every = 1
    if checkpoint_path and not checkpoint_path.endswith(".npz"):
        checkpoint_path += ".npz"
    if checkpoint_path:
        try:
            ck = np.load(checkpoint_path)
            if str(ck["config"]) == config_tag:
                film = jnp.asarray(ck["accum"])
                start_chunk = int(ck["waves_done"])
                if progress:
                    print(f"\nresuming at chunk {start_chunk}",
                          file=sys.stderr)
            else:
                print(f"checkpoint {checkpoint_path} is for a different "
                      "render config; starting fresh", file=sys.stderr)
        except FileNotFoundError:
            pass
        except Exception as e:
            print(f"ignoring unreadable checkpoint {checkpoint_path}: {e}",
                  file=sys.stderr)

    total_work = P * spp
    done_base = [P * chunk_s0s[start_chunk] if start_chunk < n_chunks
                 else total_work]

    def cb(frontier, total):
        if progress:
            pct = 100.0 * (done_base[0] + frontier) / total_work
            print(f"\rRendering {pct:5.1f}%", end="", file=sys.stderr)

    for c in range(start_chunk, n_chunks):
        cs = chunks[c]
        kw = dict(engine=engine, shade=shade, cam_salt=jnp.uint32(seed),
                  epoch_iters=epoch_iters, drain_levels=drain_levels,
                  progress_cb=cb, rr_depth=rr_depth)
        if mesh is not None and cs % int(mesh.devices.size) == 0:
            part = trace_queue_mesh(
                scene, camera, width, height, cs, jnp.uint32(chunk_s0s[c]),
                k_queue, max_depth, R, mesh, **kw)
        else:
            part = trace_queue(
                scene, camera, width, height, cs, jnp.uint32(chunk_s0s[c]),
                k_queue, max_depth, R, **kw)
        film = film + part
        done_base[0] += P * cs
        if checkpoint_path and checkpoint_every and \
                (c + 1) % checkpoint_every == 0 and c + 1 < n_chunks:
            np.savez(checkpoint_path[:-4], accum=np.asarray(film),
                     waves_done=c + 1, config=config_tag)
        if on_partial is not None and c + 1 < n_chunks:
            done_spp = chunk_s0s[c] + cs
            on_partial(np.asarray(film).reshape(height, width, 3) / done_spp,
                       0)
    if progress:
        print("", file=sys.stderr)
    if auto_ckpt:
        try:
            os.remove(checkpoint_path)
        except OSError:
            pass
    return np.asarray(film).reshape(height, width, 3) / spp


def render(
    scene: SceneData,
    camera: Camera,
    width: int,
    height: int,
    spp: int,
    max_depth: int = 50,
    seed: int = 1024,
    rays_per_wave: int = 1 << 20,
    samples_per_wave: int = 64,
    mode: str = "auto",
    bvh=False,
    engine: str = "auto",
    mesh=None,
    progress: bool = False,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    rr_depth: int = 0,
    adaptive: float = 0.0,
    on_partial=None,
    _row0: int = 0,
    _rows: Optional[int] = None,
    _band_cap: Optional[int] = None,
) -> np.ndarray:
    """Render to a linear (H, W, 3) float32 image (mean over spp samples).

    ``rays_per_wave`` bounds the ray-pool size (W*H*k_pool lanes);
    ``samples_per_wave`` bounds how many samples each slot renders per wave
    (larger waves amortize the path-length tail; smaller waves give finer
    progress/checkpoint/mesh granularity).  ``bvh=True`` intersects via
    stack-based BVH traversal instead of brute force.  ``rr_depth`` > 0
    enables Russian-roulette path termination after that many bounces
    (unbiased; NOT reference estimator semantics - ops/scatter.py RR
    note; default off).  ``adaptive`` > 0 renders with per-pixel adaptive
    sampling at that tone-mapped standard-error tolerance; ``spp`` becomes
    the per-pixel budget cap (tpu_ray/adaptive.py; with a mesh, each
    round's worklist shards over the devices).

    ``on_partial(img, rows_final)``, if given, is called after every wave
    (pool/mesh), chunk (queue) or completed band with the CURRENT
    full-frame mean estimate and the number of TOP image rows that are
    already final (all spp accumulated; nonzero only for band-tiled
    renders, which finish top-to-bottom like the reference's row
    streaming, app/Main.hs:62).  Not supported with ``adaptive``.
    """
    if adaptive and adaptive > 0:
        from .adaptive import render_adaptive

        return render_adaptive(
            scene, camera, width, height, spp_max=spp, tol=adaptive,
            max_depth=max_depth, seed=seed, rays_per_wave=rays_per_wave,
            engine=engine, rr_depth=rr_depth, progress=progress, mesh=mesh)

    base_key = jax.random.PRNGKey(seed)
    engine = resolve_engine(scene, engine)
    mode = resolve_mode(scene, mode, mesh=mesh, bvh=bvh, engine=engine,
                        _rows=_rows, spp=spp)

    if camera.sampler == "sobol-b0":
        # the bounce-dim override only exists on the XLA work-queue path;
        # everywhere else sobol-b0 must still run the SOBOL camera dims
        # (never degrade below plain sobol) and say so (ADVICE r4 medium:
        # the demotion used to be silent, violating the announce-every-
        # demotion norm of resolve_mode)
        from .integrator import _use_fused_shading

        if mode != "queue" or _use_fused_shading(scene, None, engine):
            where = (f"mode={mode}" if mode != "queue"
                     else "the fused queue kernel")
            print("tpu_ray: sampler=sobol-b0's bounce-dim override only "
                  f"runs on the XLA work-queue path; {where} keeps the "
                  "sobol camera dims with hashed scatter draws",
                  file=sys.stderr)

    if mode == "queue":
        return _render_queue(
            scene, camera, width, height, spp, max_depth, seed,
            rays_per_wave, engine, progress, checkpoint_path,
            checkpoint_every, mesh=mesh, rr_depth=rr_depth,
            on_partial=on_partial)

    # if one slot per pixel already exceeds the big-scene lane cap, render
    # in horizontal bands so plan_pool's device limits actually hold
    rows = height if _rows is None else _rows
    cap = XLA_BIG_SCENE_LANES if (engine in ("xla", "mxu") and scene.n_prims > 512) else (
        pallas_lane_cap(scene.n_prims)
        if (engine == "pallas" and scene.n_prims > 512)
        else None)
    if _band_cap is not None:
        cap = _band_cap  # tests/dryrun: exercise band tiling at tiny shapes
    if cap is not None and width * rows > cap and mode == "pool":
        # bands compose with meshes: each band is rendered (sharded or not)
        # with GLOBAL slot ids, so banded == unbanded bit-for-bit
        band_h = max(1, cap // width)
        frame = np.zeros((height, width, 3), np.float32)
        for row0 in range(0, height, band_h):
            bh = min(band_h, height - row0)
            ck = (f"{checkpoint_path}.band{row0}" if checkpoint_path else None)
            band_cb = None
            if on_partial is not None:
                # compose the child band's partial into the full frame;
                # rows above this band are final (bands finish in order)
                def band_cb(img, rows_final_band, _r0=row0, _bh=bh):
                    full = frame.copy()
                    full[_r0:_r0 + _bh] = img
                    on_partial(full, _r0 + rows_final_band)
            frame[row0:row0 + bh] = render(
                scene, camera, width, height, spp,
                max_depth=max_depth, seed=seed, rays_per_wave=rays_per_wave,
                samples_per_wave=samples_per_wave, mode=mode, bvh=bvh,
                engine=engine, mesh=mesh, progress=progress,
                checkpoint_path=ck, rr_depth=rr_depth,
                checkpoint_every=checkpoint_every, on_partial=band_cb,
                _row0=row0, _rows=bh,
            )
            if on_partial is not None:
                on_partial(frame.copy(), row0 + bh)
        return frame

    bvh_arrays = None
    if bvh:
        from .ops.bvh import build_bvh

        bvh_arrays = bvh if not isinstance(bvh, bool) else build_bvh(scene)

    if mode == "wave":
        k = pick_samples_per_wave(width, height, spp, rays_per_wave)
        n_waves = spp // k
        wf = make_wave_fn(scene, camera, width, height, k, max_depth,
                          bvh=bvh_arrays, engine=engine, rr_depth=rr_depth)
        wave_fn = lambda key, sample0: wf(key)
        wave_spp = k
    else:
        k_pool, s_wave, n_waves = plan_pool(
            scene, width, rows, spp, rays_per_wave, samples_per_wave, engine
        )
        wave_fn = make_pool_wave_fn(
            scene, camera, width, height, k_pool, s_wave, max_depth,
            cam_salt=jnp.uint32(seed), bvh=bvh_arrays, engine=engine,
            row0=_row0, rows=rows, rr_depth=rr_depth,
        )
        wave_spp = k_pool * s_wave

    s_unit = s_wave if mode != "wave" else 0
    D = int(mesh.devices.size) if mesh is not None else 0
    if mesh is not None:
        # one loop unit = one mesh ROUND (one wave per device, psum'd), so
        # the host loop below gives multi-chip renders the same progress
        # and checkpoint/resume as single-chip ones (VERDICT round 2
        # missing #3)
        from .parallel.mesh import make_round_fn

        round_fn = make_round_fn(wave_fn, mesh)
        n_units = -(-n_waves // D)
        _fold = jax.jit(jax.vmap(jax.random.fold_in, in_axes=(None, 0)))

        def step(acc, w):
            ws = np.arange(w * D, w * D + D, dtype=np.uint32)
            keys = _fold(base_key, jnp.asarray(ws))
            wts = jnp.asarray(ws < n_waves, jnp.float32)
            s0s = jnp.asarray(ws * s_unit, jnp.uint32)
            return acc + round_fn(keys, wts, s0s)
    elif mode == "wave":
        n_units = n_waves
        _wave_jit = jax.jit(
            lambda acc, key, sample0: acc + wave_fn(key, sample0), donate_argnums=0
        )

        def step(acc, w):
            return _wave_jit(acc, jax.random.fold_in(base_key, w),
                             jnp.uint32(0))
    else:
        n_units = n_waves
        # resolve the fused-shading knob OUTSIDE jit so it keys the
        # executable cache (integrator.trace_pool docstring)
        from .integrator import _use_fused_shading

        shade = "fused" if _use_fused_shading(scene, bvh_arrays, engine) \
            else "xla"
        if engine == "mega":
            def step(acc, w):
                return _pool_step_mega(
                    acc, scene, camera, jax.random.fold_in(base_key, w),
                    width, height, k_pool, int(s_wave),
                    jnp.uint32(w * s_unit), max_depth, jnp.uint32(seed),
                    engine, bvh_arrays, _row0, rows, shade, rr_depth)
        else:
            # staged ladder: each compaction level runs as its own
            # executable (integrator.trace_pool_staged module note) -
            # same draws as the in-jit ladder, but a cold start
            # compiles one R-sized body instead of one program holding
            # every level (~4x the remote compile, VERDICT round 2 #1)
            from .integrator import trace_pool_staged

            s_wave_arr = jnp.int32(s_wave)
            xs, ys = _pixel_grid(width, height, k_pool, _row0, rows)
            sids = _slot_ids(width, height, k_pool, _row0, rows)

            def step(acc, w):
                rad, _ = trace_pool_staged(
                    scene, camera, xs, ys, (1.0 / width, 1.0 / height),
                    jax.random.fold_in(base_key, w), s_wave_arr,
                    jnp.uint32(w * s_unit), max_depth,
                    cam_salt=jnp.uint32(seed), bvh=bvh_arrays,
                    engine=engine, slot_ids=sids, shade=shade,
                    rr_depth=rr_depth)
                return _film_add(acc, rad, k_pool, rows, width)

    accum = jnp.zeros((rows, width, 3), jnp.float32)
    start_wave = 0

    # the accumulator must only be resumed into an identical render: the tag
    # fingerprints the scene/camera CONTENTS (not just prim count - editing
    # a material must invalidate old checkpoints) plus every render param
    auto_ckpt = (checkpoint_path is None and checkpoint_every == 0
                 and n_units >= AUTO_CHECKPOINT_WAVES)
    config_tag = None
    if checkpoint_path or auto_ckpt:
        config_tag = (f"v{SEMANTICS_VERSION}.s{int(scene.strict)}"
                      f"|{_scene_fingerprint(scene, camera)}|{scene.n_prims}"
                      f"|{width}x{height}|{spp}|{max_depth}|{seed}"
                      f"|{mode}|{engine}|{wave_spp}|{n_waves}|{_row0}:{rows}"
                      f"|d{D}|rr{rr_depth}")
    if auto_ckpt:
        # long renders checkpoint by default; the file is keyed by the
        # config tag (auto-resumed on an identical re-run after a crash)
        # and removed on completion
        import hashlib

        d = os.path.join(os.path.expanduser("~"), ".cache", "tpu_ray",
                         "checkpoints")
        os.makedirs(d, exist_ok=True)
        tag12 = hashlib.sha1(config_tag.encode()).hexdigest()[:12]
        checkpoint_path = os.path.join(d, f"auto-{tag12}.npz")
        checkpoint_every = max(1, n_units // 8)
    if checkpoint_path and not checkpoint_path.endswith(".npz"):
        checkpoint_path += ".npz"  # np.savez appends it on write

    if checkpoint_path:
        try:
            ck = np.load(checkpoint_path)
            if str(ck["config"]) == config_tag:
                accum = jnp.asarray(ck["accum"])
                start_wave = int(ck["waves_done"])
                if progress:
                    print(f"\nresuming at wave {start_wave}", file=sys.stderr)
            else:
                print(f"checkpoint {checkpoint_path} is for a different "
                      "render config; starting fresh", file=sys.stderr)
        except FileNotFoundError:
            pass
        except Exception as e:  # corrupt/partial checkpoint
            print(f"ignoring unreadable checkpoint {checkpoint_path}: {e}",
                  file=sys.stderr)

    from .utils.profiling import WaveTimer

    # big-scene waves are seconds of device time each; fetching a few bytes
    # per wave keeps the dispatch queue at depth 1 - an unthrottled queue of
    # 25 waves (minutes of device work) is what crashes the remote worker
    throttle = scene.n_prims > 512

    # fault injection for the supervision tests: a FRESH (non-resumed) run
    # dies before wave N; a resumed attempt carries on past it
    crash_after = int(os.environ.get("TPU_RAY_CRASH_AFTER_WAVE", -1))

    timer = WaveTimer(enabled=progress)
    unit = "round" if mesh is not None else "wave"
    for w in range(start_wave, n_units):
        if w == crash_after and start_wave == 0:
            raise RuntimeError(f"injected crash before {unit} {w} "
                               "(TPU_RAY_CRASH_AFTER_WAVE)")
        if progress:
            print(f"\rRendering {unit} {w + 1} of {n_units}", end="",
                  file=sys.stderr)
        timer.start()
        accum = step(accum, w)
        if checkpoint_path and checkpoint_every and (w + 1) % checkpoint_every == 0:
            np.savez(
                checkpoint_path[:-4], accum=np.asarray(accum), waves_done=w + 1,
                config=config_tag,
            )
        elif throttle:
            np.asarray(accum[0, 0])  # device->host fetch = real completion
        if on_partial is not None and w + 1 < n_units:
            done_waves = min((w + 1) * max(D, 1), n_waves)
            done_spp = max(1, min(done_waves * wave_spp, spp))
            on_partial(np.asarray(accum) / done_spp, 0)
        timer.stop()
    if progress:
        print(f"\n{timer.summary()}", file=sys.stderr)
    if auto_ckpt:
        try:
            os.remove(checkpoint_path)
        except OSError:
            pass
    return np.asarray(accum) / spp
