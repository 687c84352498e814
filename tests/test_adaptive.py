"""Adaptive sampling (tpu_ray/adaptive.py) and the queue worklist mode.

The reference renders a fixed spp everywhere (src/Lib.hs:1343-1350);
adaptive sampling is an opt-in extension.  Its correctness splits into
two claims tested here: (1) the queue's worklist mode dispatches exactly
the requested (pixel, sample) items with the same per-sample semantics
as the implicit uniform map, padding inert; (2) the driver's allocation
loop converges, respects the budget, and spends samples where the
variance is.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_ray.integrator import WL_SAMP_BITS, trace_queue
from tpu_ray.models.scenes import SCENES
from tpu_ray.renderer import render


def _uniform_worklist(P: int, spp: int) -> np.ndarray:
    """The packed worklist equivalent to the implicit uniform map at
    chunk_s0=0: item w -> pixel w % P, sample w // P."""
    w = np.arange(P * spp, dtype=np.uint32)
    return ((w % P) << np.uint32(WL_SAMP_BITS)) | (w // P)


def _queue_sums(scene, cam, W, H, spp, *, worklist=None, n_work=None,
                seed=3):
    kw = dict(engine="xla", cam_salt=jnp.uint32(seed), epoch_iters=16)
    key = jax.random.PRNGKey(seed)
    if worklist is None:
        return trace_queue(scene, cam, W, H, spp, jnp.uint32(0), key, 50,
                           R=W * H, **kw)
    return trace_queue(scene, cam, W, H, 0, jnp.uint32(0), key, 50,
                       R=W * H, worklist=jnp.asarray(worklist, jnp.uint32),
                       n_work=n_work, **kw)


def test_worklist_uniform_matches_plain_queue():
    """A uniform worklist reproduces the plain queue's radiance sums: the
    packed (pixel, sample) entries feed the same camera/path streams, so
    the per-sample radiances are identical and only the final reduction
    (scatter-add vs sample-major reshape-sum) can reassociate."""
    sc = SCENES["cornell"].build()
    W = H = 10
    cam = SCENES["cornell"].camera(W, H)
    plain = np.asarray(_queue_sums(sc, cam, W, H, 4))
    sums, sqs = _queue_sums(sc, cam, W, H, 0,
                            worklist=_uniform_worklist(W * H, 4))
    np.testing.assert_allclose(np.asarray(sums), plain, rtol=1e-5,
                               atol=1e-6)
    assert np.isfinite(np.asarray(sqs)).all()
    assert (np.asarray(sqs) >= 0).all()


def test_worklist_padding_is_inert():
    """Shape-bucketing padding (entries past n_work) must contribute
    nothing: padded vs exact-size worklists give bit-equal sums."""
    sc = SCENES["two-spheres"].build()
    W, H = 8, 6
    cam = SCENES["two-spheres"].camera(W, H)
    wl = _uniform_worklist(W * H, 2)
    exact = _queue_sums(sc, cam, W, H, 0, worklist=wl)
    # pad with entries pointing at pixel 0, sample 0: dispatched they would
    # add real radiance to pixel 0 - inert only because n_work excludes them
    padded = _queue_sums(sc, cam, W, H, 0,
                         worklist=np.pad(wl, (0, 61)), n_work=wl.size)
    for a, b in zip(exact, padded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_blocked_reduction_matches_planar():
    """The blocked per-pixel reduction (pixel-major Q-quantized worklists)
    must agree with the planar scatter path - only the f32 association
    differs (in-block pre-sum vs scatter order)."""
    from tpu_ray.adaptive import WL_QUANT, _build_worklist
    from tpu_ray.integrator import trace_queue

    sc = SCENES["cornell"].build()
    W = H = 8
    P = W * H
    cam = SCENES["cornell"].camera(W, H)
    extra = np.full(P, WL_QUANT, np.int64)
    extra[: P // 2] = 2 * WL_QUANT  # non-uniform counts
    packed, block_pix = _build_worklist(extra, np.zeros(P, np.int64))
    kw = dict(engine="xla", cam_salt=jnp.uint32(3), epoch_iters=16)
    key = jax.random.PRNGKey(3)
    wl = jnp.asarray(packed, jnp.uint32)
    planar = trace_queue(sc, cam, W, H, 0, jnp.uint32(0), key, 50, R=P,
                         worklist=wl, **kw)
    blocked = trace_queue(sc, cam, W, H, 0, jnp.uint32(0), key, 50, R=P,
                          worklist=wl,
                          wl_block_pix=jnp.asarray(block_pix), **kw)
    for a, b in zip(planar, blocked):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_device_worklist_expansion_matches_host():
    """_expand_worklist (device, broadcast form) must reproduce the host
    reference expansion exactly, including zero-count padding rows and
    block padding past the allocation."""
    from tpu_ray.adaptive import (WL_QUANT, _build_worklist, _compact_alloc,
                                  _expand_worklist)

    rng = np.random.default_rng(7)
    P = 101
    extra = rng.integers(0, 5, P).astype(np.int64) * WL_QUANT
    n = rng.integers(0, 40, P).astype(np.int64) * WL_QUANT
    ref_packed, ref_bp = _build_worklist(extra, n)
    nb = ref_bp.size + 9  # force padding blocks
    packed, bp = _expand_worklist(
        *map(jnp.asarray, _compact_alloc(extra, n, 128)), nb, P)
    np.testing.assert_array_equal(np.asarray(bp)[: ref_bp.size], ref_bp)
    assert (np.asarray(bp)[ref_bp.size:] == P).all()
    np.testing.assert_array_equal(
        np.asarray(packed)[: ref_packed.size], ref_packed)


def test_adaptive_zero_variance_stops_at_pilot():
    """A furnace plane (every sample is exactly the albedo) converges in
    the pilot round: n == pilot everywhere (one WL_QUANT block) and the
    mean is exact."""
    from tests.test_rr import _down_camera, _plane_scene
    from tpu_ray.adaptive import WL_QUANT, render_adaptive

    scene, cam = _plane_scene(), _down_camera()
    img, n = render_adaptive(scene, cam, 8, 8, spp_max=256, tol=0.01,
                             max_depth=8, seed=2, pilot_spp=4,
                             mode="queue", return_spp=True)
    assert (n == WL_QUANT).all(), \
        "zero-variance pixels must stop at the (quantized) pilot"
    np.testing.assert_allclose(
        img, np.broadcast_to([0.5, 0.25, 0.125], img.shape), rtol=1e-5)


def test_adaptive_budget_and_convergence():
    """Cornell: sample counts stay within [pilot, spp_max], at least one
    pixel needs more than the pilot, counts VARY across pixels (that is
    the point of adaptive), and the mean matches a uniform render of the
    same scene within Monte-Carlo tolerance."""
    from tpu_ray.adaptive import render_adaptive

    sc = SCENES["cornell"].build()
    W = H = 12
    cam = SCENES["cornell"].camera(W, H)
    img, n = render_adaptive(sc, cam, W, H, spp_max=64, tol=0.02,
                             max_depth=50, seed=5, pilot_spp=16,
                             round_cap=32, mode="queue", return_spp=True)
    assert n.min() >= 16 and n.max() <= 64
    assert n.max() > 16, "no pixel needed more than the pilot?"
    assert len(np.unique(n)) > 1, "adaptive allocated uniformly"
    assert np.isfinite(img).all()
    ref = np.asarray(render(sc, cam, W, H, spp=128, max_depth=50, seed=11))
    np.testing.assert_allclose(img.mean(), ref.mean(), rtol=0.08)


def test_adaptive_pool_zero_variance_stops_at_pilot():
    """Pool backend on the furnace plane: every replicate slot sum is
    exact, so round-1 variance is ~0 and every pixel stops at the
    (POOL_REPS-aligned) pilot with the exact mean."""
    from tests.test_rr import _down_camera, _plane_scene
    from tpu_ray.adaptive import POOL_REPS, render_adaptive

    scene, cam = _plane_scene(), _down_camera()
    img, n = render_adaptive(scene, cam, 8, 8, spp_max=256, tol=0.01,
                             max_depth=8, seed=2, pilot_spp=POOL_REPS,
                             mode="pool", return_spp=True)
    assert (n == POOL_REPS).all()
    np.testing.assert_allclose(
        img, np.broadcast_to([0.5, 0.25, 0.125], img.shape), rtol=1e-5)


def test_adaptive_pool_budget_and_convergence():
    """Pool backend on Cornell: equal doubling keeps all counts in
    [pilot, spp_max], counts vary across pixels, and the mean matches a
    uniform render within Monte-Carlo tolerance."""
    from tpu_ray.adaptive import render_adaptive

    sc = SCENES["cornell"].build()
    W = H = 12
    cam = SCENES["cornell"].camera(W, H)
    img, n = render_adaptive(sc, cam, W, H, spp_max=128, tol=0.02,
                             max_depth=50, seed=5, pilot_spp=16,
                             mode="pool", return_spp=True)
    assert n.min() >= 16 and n.max() <= 128
    assert len(np.unique(n)) > 1, "adaptive allocated uniformly"
    assert np.isfinite(img).all()
    ref = np.asarray(render(sc, cam, W, H, spp=128, max_depth=50, seed=11))
    np.testing.assert_allclose(img.mean(), ref.mean(), rtol=0.08)


def test_adaptive_pool_matches_queue_statistically():
    """The two adaptive backends draw different streams but estimate the
    same image; their means agree within Monte-Carlo tolerance."""
    from tpu_ray.adaptive import render_adaptive

    sc = SCENES["two-spheres"].build()
    W, H = 10, 8
    cam = SCENES["two-spheres"].camera(W, H)
    kw = dict(spp_max=64, tol=0.03, max_depth=8, seed=4)
    a = render_adaptive(sc, cam, W, H, mode="pool", **kw)
    b = render_adaptive(sc, cam, W, H, mode="queue", **kw)
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.08)


def test_adaptive_via_render_api():
    """renderer.render(adaptive=TOL) dispatches to the adaptive driver and
    returns the usual (H, W, 3) mean image."""
    sc = SCENES["two-spheres"].build()
    W, H = 10, 8
    cam = SCENES["two-spheres"].camera(W, H)
    img = render(sc, cam, W, H, spp=32, max_depth=8, seed=3, adaptive=0.05)
    assert img.shape == (H, W, 3)
    assert np.isfinite(img).all()
    # sanity: agrees with the uniform render's brightness
    ref = np.asarray(render(sc, cam, W, H, spp=64, max_depth=8, seed=4))
    np.testing.assert_allclose(img.mean(), ref.mean(), rtol=0.1)


def test_adaptive_worklist_round_mesh_matches_single_device():
    """One worklist round sharded over the mesh returns the same per-pixel
    (sums, square sums) as the single-device queue: per-item draws are
    keyed by global work ids (integrator work_id0), so only the final
    psum's f32 summation order differs."""
    import jax

    from tpu_ray.adaptive import WL_QUANT, _build_worklist
    from tpu_ray.integrator import trace_queue, trace_queue_wl_mesh
    from tpu_ray.parallel.mesh import make_mesh

    sc = SCENES["cornell"].build()
    W = H = 8
    cam = SCENES["cornell"].camera(W, H)
    P = W * H
    rng = np.random.RandomState(3)
    extra = rng.randint(0, 4, P).astype(np.int64) * WL_QUANT
    extra[:4] = 2 * WL_QUANT  # a few guaranteed-live pixels
    n0 = np.zeros(P, np.int64)
    wl_np, bp_np = _build_worklist(extra, n0)
    n_work = int(extra.sum())
    D = 8
    pad = -(-n_work // (D * WL_QUANT)) * (D * WL_QUANT)
    wl = jnp.asarray(np.pad(wl_np, (0, pad - n_work)))
    bp = jnp.asarray(np.pad(bp_np, (0, pad // WL_QUANT - bp_np.size),
                            constant_values=P))
    key = jax.random.PRNGKey(9)
    kw = dict(engine="xla", cam_salt=jnp.uint32(7), epoch_iters=16,
              max_depth=6)
    s1, q1 = trace_queue(sc, cam, W, H, 0, jnp.uint32(0), key,
                         kw.pop("max_depth"), 1024, engine=kw["engine"],
                         cam_salt=kw["cam_salt"],
                         epoch_iters=kw["epoch_iters"], worklist=wl,
                         n_work=n_work, wl_block_pix=bp)
    s2, q2 = trace_queue_wl_mesh(sc, cam, W, H, jnp.uint32(0), key, 6,
                                 1024, make_mesh(D), wl, n_work, bp,
                                 engine="xla", cam_salt=jnp.uint32(7),
                                 epoch_iters=16)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q1),
                               rtol=1e-5, atol=1e-6)


def test_adaptive_render_on_mesh():
    """--adaptive over a mesh end-to-end: per-item draws are identical to
    the single-device QUEUE backend, so round statistics, allocations and
    the final image agree up to reduction order (meshes always use the
    queue backend - the worklist is the sharding unit)."""
    from tpu_ray.adaptive import render_adaptive
    from tpu_ray.parallel.mesh import make_mesh

    sc = SCENES["two-spheres"].build()
    W, H = 10, 8
    cam = SCENES["two-spheres"].camera(W, H)
    kw = dict(spp_max=64, tol=0.03, max_depth=8, seed=4, return_spp=True)
    a, n_a = render_adaptive(sc, cam, W, H, mode="queue", **kw)
    b, n_b = render_adaptive(sc, cam, W, H, mesh=make_mesh(8), **kw)
    np.testing.assert_array_equal(n_b, n_a)  # same allocations per round
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-4, atol=1e-5)
    # the public API routes adaptive+mesh here
    c = render(sc, cam, W, H, spp=64, adaptive=0.03, max_depth=8, seed=4,
               mesh=make_mesh(8))
    np.testing.assert_allclose(np.asarray(c), np.asarray(b),
                               rtol=1e-6, atol=1e-7)
