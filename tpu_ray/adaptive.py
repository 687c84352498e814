"""Adaptive sampling: per-pixel sample allocation driven by running
variance, riding the work-queue integrator.

The reference renders a fixed ``nSamples`` for every pixel
(/root/reference/src/Lib.hs:1343-1350); adaptive sampling is an
extension, not a parity feature, and ships opt-in (``--adaptive TOL``).
It changes the quality contract - "every pixel's tone-mapped standard
error <= TOL" instead of "spp samples everywhere" - so adaptive renders
are never compared sample-for-sample against uniform ones.

TPU-native design: the work-queue integrator already treats rendering as
a flat frontier of (pixel, sample) work items drained by a fixed-size
lane pool (integrator.trace_queue), so adaptive sampling is just a
different WORK LIST.  Each round the driver

1. renders a packed uint32 worklist (pixel << WL_SAMP_BITS | absolute
   per-pixel sample index) via ``trace_queue(worklist=...)``, which
   returns per-pixel radiance sums and square sums (two scatter-adds);
2. folds them into running (n, sum, sumsq) statistics;
3. computes each pixel's standard error of the TONE-MAPPED value
   (display = sqrt(linear), so sigma_display ~= sigma_linear /
   (2 sqrt(mean)) per channel) and stops pixels whose worst channel is
   within ``tol``;
4. allocates the next round ~ n * (err/tol)^2 growth per unconverged
   pixel (clipped to ``round_cap`` and the ``spp_max`` budget) and
   repeats.

Worklists are padded to power-of-two buckets so XLA executables are
reused across rounds (shapes are static under jit); padding entries are
never dispatched (``n_work``) and their plane rows stay zero.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .integrator import (WL_SAMP_BITS, WL_SAMP_MASK, trace_queue,
                         trace_queue_wl_mesh)

# tone-map-space error floor: pixels darker than FLOOR**2 in linear RGB
# are judged against FLOOR (err = sigma / (2*FLOOR)) so black pixels
# don't demand infinite samples chasing a 0/0 relative error
DISPLAY_FLOOR = 0.05

# per-pixel allocations are multiples of WL_QUANT so the per-round pixel
# reduction can run blocked (integrator._worklist_sums_blocked: dense
# (N/Q, Q) row sums + one N/Q-index scatter instead of N-index scatters,
# and no (N, 3) stacked intermediate - the naive stack's lane padding
# wanted 32 GB at a 64M-item round)
WL_QUANT = 16
# per-round work cap: bounds the round's plane/posmap/log HBM and the
# blocked-reduction scatter; over-demand spills into later rounds
ROUND_ITEMS = 32_000_000

# worklist shape buckets: powers of FOUR so at most ~6 distinct epoch
# executables ever compile (a fresh bucket costs a full XLA compile
# through the remote-TPU tunnel - the first adaptive run spent 10 min
# compiling per-round shapes and seconds rendering), at <= 4x padding
# waste.  Padding is dispatch-free (n_work bounds the frontier); its
# per-round cost is the pad-sized materialize gather + blocked scan.
PAD_LADDER = tuple((1 << 16) << (2 * i) for i in range(6))  # 64k .. 64M


def _round_sizes(n, s, s2, tol, spp_max, pilot_spp, round_cap):
    """Per-pixel extra samples for the next round (0 = converged/budget).

    Growth targets n*(err/tol)^2 - the sample count at which the CURRENT
    variance estimate would meet tol - but at least +pilot_spp and at
    most +round_cap per round, so bad early variance estimates can't
    either stall progress or blow the budget in one round.
    """
    nn = np.maximum(n, 1).astype(np.float64)[:, None]
    mean = s / nn
    # unbiased variance of the per-pixel MEAN, per channel
    var_mean = np.maximum(s2 / nn - mean * mean, 0.0) / np.maximum(
        nn - 1.0, 1.0)
    sigma_d = np.sqrt(var_mean) / (
        2.0 * np.sqrt(np.maximum(mean, DISPLAY_FLOOR**2)))
    err = sigma_d.max(axis=1)  # worst channel, tone-mapped space
    need = (err > tol) & (n < spp_max) & (n > 0)
    # n, pilot_spp, round_cap, spp_max are all multiples of WL_QUANT
    # (render_adaptive aligns them), so every bound below preserves that
    target = np.ceil(n * np.square(err / tol)).astype(np.int64)
    extra = np.clip(target - n, pilot_spp, round_cap)
    extra = -(-extra // WL_QUANT) * WL_QUANT
    extra = np.minimum(extra, spp_max - n)
    extra = np.where(need, extra, 0)
    total = int(extra.sum())
    if total > ROUND_ITEMS:
        scale = ROUND_ITEMS / total
        extra = np.where(
            need, np.maximum((extra * scale).astype(np.int64)
                             // WL_QUANT, 1) * WL_QUANT, 0)
    return extra.astype(np.int64), err


from functools import partial as _partial


@_partial(jax.jit, static_argnums=(3, 4))
def _expand_worklist(idx, reps_q, base, nb, P):
    """Device-side worklist expansion: from the COMPACT per-pixel
    allocation (pixel ids ``idx``, WL_QUANT-block counts ``reps_q``,
    first sample index ``base``; K rows, zero-count padding rows allowed)
    build the (nb,) per-block pixel ids and the (nb*WL_QUANT,) packed
    entries.  The tunnel moves ~45 MB/s (measured), so shipping the K-row
    compact form (<= 3 MB) and expanding on device beats uploading the
    64 MB expanded list by ~2 s/round.  Blocks past the allocation get
    pixel id P (dropped by the blocked reduction; never dispatched)."""
    K = idx.shape[0]
    cumb = jnp.cumsum(reps_q)
    starts = cumb - reps_q
    b = jnp.arange(nb, dtype=jnp.int32)
    k = jnp.searchsorted(cumb, b, side="right").astype(jnp.int32)
    kc = jnp.minimum(k, K - 1)
    valid = k < K
    block_pix = jnp.where(valid, idx[kc], P).astype(jnp.int32)
    samp0 = jnp.where(valid, base[kc] + (b - starts[kc]) * WL_QUANT, 0)
    packed = (
        (block_pix.astype(jnp.uint32) << jnp.uint32(WL_SAMP_BITS))[:, None]
        | (samp0[:, None] + jnp.arange(WL_QUANT)).astype(jnp.uint32)
    ).reshape(-1)
    return packed, block_pix


def _compact_alloc(extra: np.ndarray, n: np.ndarray, k_pad: int):
    """Host side of the worklist: (idx, reps_q, base) padded to k_pad rows
    (zero-count rows are inert in _expand_worklist)."""
    idx = np.nonzero(extra)[0]
    pad = (0, k_pad - idx.size)
    return (np.pad(idx.astype(np.int32), pad),
            np.pad((extra[idx] // WL_QUANT).astype(np.int32), pad),
            np.pad(n[idx].astype(np.int32), pad))


def _build_worklist(extra: np.ndarray, n: np.ndarray):
    """Host-side reference expansion (tests oracle for _expand_worklist):
    each pixel p repeated extra[p] times (a multiple of WL_QUANT,
    pixel-major) with absolute sample indices n[p], n[p]+1, ..."""
    idx = np.nonzero(extra)[0]
    reps = extra[idx]
    wl_pix = np.repeat(idx, reps)
    starts = np.repeat(np.cumsum(reps) - reps, reps)
    occ = np.arange(wl_pix.size, dtype=np.int64) - starts
    samp = n[wl_pix] + occ
    packed = ((wl_pix.astype(np.uint32) << np.uint32(WL_SAMP_BITS))
              | samp.astype(np.uint32))
    block_pix = np.repeat(idx, reps // WL_QUANT).astype(np.int32)
    return packed, block_pix


def render_adaptive(
    scene,
    camera,
    width: int,
    height: int,
    *,
    spp_max: int = 1000,       # per-pixel sample budget (the --spp value)
    tol: float = 0.01,         # tone-mapped standard-error target (0..1)
    max_depth: int = 50,
    seed: int = 1024,
    rays_per_wave: int = 1 << 20,
    engine: str = "auto",
    shade: Optional[str] = None,
    mode: str = "auto",        # "queue" | "pool" | "auto" (per scene size)
    pilot_spp: int = 16,       # uniform first round (variance bootstrap)
    round_cap: int = 512,      # max extra samples per pixel per round
    max_rounds: int = 64,
    rr_depth: int = 0,
    progress: bool = False,
    return_spp: bool = False,
    mesh=None,
):
    """Render with per-pixel adaptive sampling; returns the (H, W, 3) mean
    image (and the (H, W) per-pixel sample-count map if ``return_spp``).

    With ``mesh``, every round's worklist shards contiguously over the
    devices (integrator.trace_queue_wl_mesh): per-item draws are keyed by
    global work ids, so the round statistics - and therefore the adaptive
    allocations - match the single-device run up to the one psum's f32
    summation order.  Meshes always use the queue backend (the worklist
    IS the sharding unit).

    Every pixel receives between ``pilot_spp`` and ``spp_max`` samples;
    sampling stops per pixel once the standard error of its tone-mapped
    value drops below ``tol`` (worst channel).  Two backends, matching the
    uniform renderer's mode split (renderer.resolve_mode):

    - "queue": worklist rounds on the work-queue integrator, per-pixel
      allocations ~ n*(err/tol)^2.  Production path for big-prim scenes.
    - "pool": replicate-slot rounds on trace_pool (slot_ids = pixel +
      replicate*P, so variance comes from POOL_REPS independent slot
      sums), with EQUAL doubling allocations so all active pixels share
      one sample count - no per-lane indirection at all, which keeps the
      pool's 3-12 ns/lane-iter rate (the queue pays ~56 ns + an
      injection gather; PERFLOG.md "Adaptive sampling").
    """
    from .renderer import resolve_engine, resolve_mode

    P = width * height
    if P > (1 << (32 - WL_SAMP_BITS)):
        raise ValueError(
            f"adaptive sampling supports up to {1 << (32 - WL_SAMP_BITS)} "
            f"pixels ({width}x{height} = {P}); render in slices")
    if spp_max > WL_SAMP_MASK:
        raise ValueError(
            f"adaptive sampling supports spp <= {WL_SAMP_MASK}")
    engine = resolve_engine(scene, engine)
    if mesh is not None:
        mode = "queue"
    elif mode == "auto":
        mode = resolve_mode(scene, "auto", engine=engine, spp=spp_max)
    kw = dict(spp_max=spp_max, tol=tol, max_depth=max_depth, seed=seed,
              rays_per_wave=rays_per_wave, engine=engine, shade=shade,
              pilot_spp=pilot_spp, round_cap=round_cap,
              max_rounds=max_rounds, rr_depth=rr_depth, progress=progress,
              return_spp=return_spp)
    if mode == "pool":
        if camera.sampler == "sobol-b0":
            # the bounce-dim override only exists on the XLA work-queue
            # path; the pool backend keeps sobol camera dims with hashed
            # scatter draws - announce it like renderer.render does
            # (review r5: this demotion was the one silent one left)
            import sys

            print("tpu_ray: sampler=sobol-b0's bounce-dim override only "
                  "runs on the XLA work-queue path; the adaptive pool "
                  "backend keeps the sobol camera dims with hashed "
                  "scatter draws", file=sys.stderr)
        return _render_adaptive_pool(scene, camera, width, height, **kw)
    return _render_adaptive_queue(scene, camera, width, height, mesh=mesh,
                                  **kw)


def _render_adaptive_queue(
    scene, camera, width, height, *, spp_max, tol, max_depth, seed,
    rays_per_wave, engine, shade, pilot_spp, round_cap, max_rounds,
    rr_depth, progress, return_spp, mesh=None,
):
    """Worklist rounds on the work-queue integrator (see render_adaptive)."""
    from .renderer import plan_queue

    P = width * height
    D = int(mesh.devices.size) if mesh is not None else 1
    pad_unit = D * WL_QUANT  # per-device shards stay WL_QUANT-aligned
    # align every budget knob to WL_QUANT blocks (the blocked reduction's
    # unit); spp_max rounds DOWN (a budget cap), the others up
    spp_max = max(WL_QUANT, spp_max // WL_QUANT * WL_QUANT)
    pilot_spp = max(2, min(pilot_spp, spp_max))  # variance needs n >= 2
    pilot_spp = -(-pilot_spp // WL_QUANT) * WL_QUANT
    round_cap = max(WL_QUANT, round_cap // WL_QUANT * WL_QUANT)
    # no drain ladder: each level is another executable PER BUCKET and the
    # queue's device-side early exit already absorbs most of the tail
    # (PERFLOG.md "Queue drain ladder": no-ladder within 5% of the best)
    R, _, epoch_iters, _ = plan_queue(
        scene, width, height, spp_max, rays_per_wave, engine)

    key = jax.random.PRNGKey(seed)
    n = np.zeros(P, np.int64)
    s = np.zeros((P, 3), np.float64)
    s2 = np.zeros((P, 3), np.float64)
    extra = np.full(P, pilot_spp, np.int64)
    work_s0 = 0  # sample-unit offset keeping path-draw ids distinct
    for rnd in range(max_rounds):
        import time as _time

        t_round = _time.perf_counter()
        n_work = int(extra.sum())
        n_pix = int((extra > 0).sum())
        floor = max(n_work, R * D, pad_unit)
        pad = next((p for p in PAD_LADDER if p >= floor),
                   -(-floor // WL_QUANT) * WL_QUANT)
        pad = -(-pad // pad_unit) * pad_unit
        k_pad = next((p for p in PAD_LADDER if p >= n_pix), n_pix)
        wl, bp = _expand_worklist(
            *map(jnp.asarray, _compact_alloc(extra, n, k_pad)),
            pad // WL_QUANT, P)
        # log rows keyed to the BUCKET, not n_work, so every round in a
        # bucket reuses one executable set
        log_rows = min(6 * pad // D, 160_000_000)
        if mesh is not None:
            sums, sqs = trace_queue_wl_mesh(
                scene, camera, width, height, jnp.uint32(work_s0),
                jax.random.fold_in(key, rnd), max_depth, R, mesh,
                wl, n_work, bp, engine=engine, shade=shade,
                cam_salt=jnp.uint32(seed), epoch_iters=epoch_iters,
                log_rows=log_rows, rr_depth=rr_depth)
        else:
            sums, sqs = trace_queue(
                scene, camera, width, height, 0, jnp.uint32(work_s0),
                jax.random.fold_in(key, rnd), max_depth, R, engine=engine,
                shade=shade, cam_salt=jnp.uint32(seed),
                epoch_iters=epoch_iters, log_rows=log_rows,
                rr_depth=rr_depth, worklist=wl, n_work=n_work,
                wl_block_pix=bp)
        both = np.asarray(jnp.stack((sums, sqs)), np.float64)  # 1 transfer
        s += both[0]
        s2 += both[1]
        n += extra
        work_s0 += -(-n_work // P)
        extra, err = _round_sizes(n, s, s2, tol, spp_max, pilot_spp,
                                  round_cap)
        # tail cutoff: once only a sliver of pixels still needs work,
        # finish them to the budget cap in ONE final round instead of
        # paying per-round fixed costs for repeated small re-estimates
        need = extra > 0
        if 0 < int(need.sum()) < max(64, P // 256):
            extra = np.where(need, spp_max - n, 0)
        if progress:
            import sys

            done_pct = 100.0 * np.mean(extra == 0)
            sys.stderr.write(
                f"\r[adaptive] round {rnd + 1}: {done_pct:5.1f}% pixels "
                f"converged, spp {n.min()}-{n.max()} "
                f"(mean {n.mean():.1f}), err p99 {np.quantile(err, 0.99):.4f},"
                f" {_time.perf_counter() - t_round:.2f}s\n")
            sys.stderr.flush()
        if not extra.any():
            break
    if progress:
        import sys

        sys.stderr.write("\n")
    img = (s / n[:, None]).astype(np.float32).reshape(height, width, 3)
    if return_spp:
        return img, n.reshape(height, width)
    return img


# replicate slots per pixel on the pool backend: the per-round variance
# estimate has POOL_REPS - 1 degrees of freedom (and sharpens as rounds
# accumulate via inverse-variance combination)
POOL_REPS = 8


@_partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9))
def _pool_round(scene, camera, act, key, width, height, max_depth,
                engine, shade, rr_depth, n_slot, sample0):
    """One pool round over the active pixel list ``act`` ((A,) int32,
    padding rows render pixel 0 and are discarded by the caller): each
    pixel runs POOL_REPS replicate slots of ``n_slot`` samples.  Returns
    the stacked ((2, A, 3)) per-pixel [sum of slot sums, sum of squared
    slot sums].  Slot ids pixel + replicate*P give every replicate a
    distinct camera/path stream; ``sample0`` (per-slot samples already
    rendered) keeps streams distinct across rounds."""
    from .integrator import trace_pool

    P = width * height
    A = act.shape[0]
    pix = act.astype(jnp.uint32)
    reps = jnp.arange(POOL_REPS, dtype=jnp.uint32)
    slot = (pix[:, None] + reps[None, :] * jnp.uint32(P)).reshape(-1)
    sx = (pix % width).astype(jnp.float32) * (1.0 / width)
    sy = ((jnp.uint32(height - 1) - pix // width).astype(jnp.float32)
          * (1.0 / height))
    s = jnp.broadcast_to(sx[:, None], (A, POOL_REPS)).reshape(-1)
    t = jnp.broadcast_to(sy[:, None], (A, POOL_REPS)).reshape(-1)
    accum, _ = trace_pool(
        scene, camera, s, t, (1.0 / width, 1.0 / height), key, n_slot,
        sample0, max_depth, jnp.uint32(0), engine=engine, slot_ids=slot,
        shade=shade, rr_depth=rr_depth)
    acc = accum.reshape(A, POOL_REPS, 3)
    return jnp.stack((acc.sum(axis=1), (acc * acc).sum(axis=1)))


def _render_adaptive_pool(
    scene, camera, width, height, *, spp_max, tol, max_depth, seed,
    rays_per_wave, engine, shade, pilot_spp, round_cap, max_rounds,
    rr_depth, progress, return_spp,
):
    """Replicate-slot doubling rounds on trace_pool (see render_adaptive).

    All active pixels always share ONE sample count (every pixel gets the
    same allocation each round and drops out when converged or capped),
    so rounds need no per-lane indirection: slot ids and film coords are
    broadcast from the compacted active list, and the reduction is a
    dense (A, POOL_REPS) reshape-sum."""
    P = width * height
    Q = POOL_REPS
    spp_max = max(Q, spp_max // Q * Q)
    pilot_spp = -(-max(2, min(pilot_spp, spp_max)) // Q) * Q
    round_cap = max(Q, round_cap // Q * Q)
    lane_cap = max(Q * 4096, rays_per_wave)
    if shade is None:
        # _pool_round jits trace_pool, so the fused-shading choice must be
        # resolved OUTSIDE the jit (trace_pool's own docstring warning)
        from .integrator import _use_fused_shading

        shade = ("fused" if _use_fused_shading(scene, None, engine)
                 else "xla")
        if shade == "fused" and camera.sampler == "sobol-b0":
            # same demotion notice as renderer.render (ADVICE r4 medium):
            # the fused kernel keeps sobol camera dims, hashed scatter
            import sys

            print("tpu_ray: sampler=sobol-b0's bounce-dim override only "
                  "runs on the XLA work-queue path; the fused adaptive "
                  "kernel keeps the sobol camera dims with hashed scatter "
                  "draws", file=sys.stderr)

    key = jax.random.PRNGKey(seed)
    n = np.zeros(P, np.int64)
    s = np.zeros((P, 3), np.float64)
    # inverse-variance bookkeeping: var(total mean) = acc_a / n^2 where
    # acc_a accumulates k_round^2 * var(round mean) per channel
    acc_a = np.zeros((P, 3), np.float64)
    active = np.arange(P, dtype=np.int64)
    k_round = pilot_spp
    for rnd in range(max_rounds):
        import time as _time

        t_round = _time.perf_counter()
        m = k_round // Q  # samples per replicate slot this round
        slot_base = int(n[active[0]]) // Q  # per-slot samples so far
        slab = max(4096, lane_cap // Q)
        ssum = np.empty((active.size, 3), np.float64)
        ssq = np.empty((active.size, 3), np.float64)
        for lo in range(0, active.size, slab):
            part = active[lo:lo + slab]
            a_pad = 1 << max(12, (int(part.size) - 1).bit_length())
            act = jnp.asarray(
                np.pad(part, (0, a_pad - part.size)).astype(np.int32))
            out = np.asarray(_pool_round(
                scene, camera, act, jax.random.fold_in(key, rnd),
                width, height, max_depth, engine, shade, rr_depth,
                jnp.int32(m), jnp.uint32(slot_base)), np.float64)
            ssum[lo:lo + slab] = out[0, : part.size]
            ssq[lo:lo + slab] = out[1, : part.size]
        # per-round mean variance from the Q replicate slot means
        mu_sum = ssum / m
        mu_sq = ssq / (m * m)
        mean_r = mu_sum / Q
        var_mu = np.maximum(mu_sq - Q * mean_r * mean_r, 0.0) / (Q - 1)
        s[active] += ssum
        acc_a[active] += (k_round * k_round) * (var_mu / Q)
        n[active] += k_round
        # convergence: display-space stderr of the combined mean
        na = n[active].astype(np.float64)[:, None]
        mean = s[active] / na
        var_mean = acc_a[active] / (na * na)
        sigma_d = np.sqrt(var_mean) / (
            2.0 * np.sqrt(np.maximum(mean, DISPLAY_FLOOR**2)))
        err = sigma_d.max(axis=1)
        keep = (err > tol) & (n[active] < spp_max)
        if progress:
            import sys

            sys.stderr.write(
                f"\r[adaptive/pool] round {rnd + 1}: "
                f"{100.0 * (1 - keep.sum() / P):5.1f}% pixels done, "
                f"spp {n.min()}-{n.max()} (mean {n.mean():.1f}), err p99 "
                f"{np.quantile(err, 0.99):.4f}, "
                f"{_time.perf_counter() - t_round:.2f}s\n")
            sys.stderr.flush()
        active = active[keep]
        if active.size == 0:
            break
        # equal doubling, clipped to the per-round cap and the budget
        # (every active pixel shares n, so the remaining headroom is
        # identical across the set); a straggler sliver fills to the cap
        k_round = int(min(max(n[active[0]], pilot_spp), round_cap,
                          spp_max - n[active[0]]))
        if active.size < max(64, P // 256):
            k_round = int(spp_max - n[active[0]])
        k_round = max(Q, k_round // Q * Q)
    if progress:
        import sys

        sys.stderr.write("\n")
    img = (s / n[:, None]).astype(np.float32).reshape(height, width, 3)
    if return_spp:
        return img, n.reshape(height, width)
    return img
