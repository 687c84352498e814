"""Russian-roulette path termination (--rr-depth): unbiasedness and
cross-engine agreement.

RR is an estimator OPTION the reference does not have (the reference runs
every path to the depth-50 cap - src/Lib.hs:1303-1333); default off, so
these tests only exercise rr_depth > 0.  Semantics (ops/scatter.py RR
note): a path that has completed >= rr_depth bounces survives each
further bounce with p = clamp(max(incoming throughput), RR_PMIN, 1) and
scales its throughput by 1/p; the survival uniform is column RR_COL of
the scatter stream, so every engine kills the same paths.
"""
import numpy as np
import pytest

from tpu_ray.models import objects as ob
from tpu_ray.models.compile import build_scene
from tpu_ray.models.scenes import SCENES
from tpu_ray.renderer import render


def _plane_scene(albedo=(0.5, 0.25, 0.125)):
    return build_scene(
        [ob.Rect("xz", -1e5, 1e5, -1e5, 1e5, 0.0, ob.Lambertian(albedo))],
        background=(1.0, 1.0, 1.0),
    )


def _down_camera():
    from tpu_ray.core.camera import Camera

    return Camera.create((0, 5, 0), (0, 0, 0), (1, 0, 0), 60.0, 1.0, 0.0, 5.0)


def test_rr_inert_below_depth():
    """Every path in the furnace-plane scene terminates after ONE bounce,
    so rr_depth=3 never fires and the image is BIT-identical to rr off
    (RR must not perturb paths it does not kill)."""
    scene, cam = _plane_scene(), _down_camera()
    kw = dict(spp=8, max_depth=8, seed=11)
    base = render(scene, cam, 8, 8, **kw)
    rr = render(scene, cam, 8, 8, rr_depth=3, **kw)
    np.testing.assert_array_equal(np.asarray(rr), np.asarray(base))


def test_rr_furnace_still_exact():
    """With p clamped to 1 for unit-throughput paths, an albedo-1.0-free
    single-bounce estimator stays exact under RR."""
    scene, cam = _plane_scene(), _down_camera()
    img = render(scene, cam, 8, 8, spp=16, max_depth=8, seed=1, rr_depth=1)
    np.testing.assert_allclose(
        img, np.broadcast_to([0.5, 0.25, 0.125], img.shape), rtol=1e-5)


def test_rr_unbiased_cornell():
    """Cornell's closed box is where RR actually kills paths (mean path
    length ~4.7, tools/study_pathlen.py): the RR estimate must agree with
    the plain estimator within Monte-Carlo tolerance."""
    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(12, 12)
    kw = dict(spp=48, max_depth=50, seed=5)
    base = render(sc, cm, 12, 12, **kw)
    rr = render(sc, cm, 12, 12, rr_depth=3, **kw)
    assert not np.array_equal(np.asarray(rr), np.asarray(base)), \
        "RR changed nothing on a long-path scene - it is not firing"
    np.testing.assert_allclose(rr.mean(), base.mean(), rtol=0.05)


def test_rr_engines_agree():
    """The RR kill decisions are drawn from the shared scatter stream, so
    the fused Pallas pool step and the megakernel reproduce the XLA
    pool's RR render (same tolerance style as tests/test_megakernel.py -
    fp reassociation only)."""
    import tpu_ray.integrator as integrator

    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(10, 10)
    kw = dict(spp=16, max_depth=50, seed=9, rr_depth=3, mode="pool")
    ref = np.asarray(render(sc, cm, 10, 10, engine="xla", **kw))

    old = integrator.FUSED_SHADING
    try:
        integrator.FUSED_SHADING = "on"
        fused = np.asarray(render(sc, cm, 10, 10, engine="xla", **kw))
    finally:
        integrator.FUSED_SHADING = old
    np.testing.assert_allclose(fused, ref, rtol=2e-4, atol=1e-4)

    mega = np.asarray(render(sc, cm, 10, 10, engine="mega", **kw))
    np.testing.assert_allclose(mega, ref, rtol=2e-4, atol=1e-4)


def test_rr_queue_matches_pool_statistically():
    """The queue draws RR uniforms from its (work, bounce)-keyed streams -
    different draws than the pool, same estimator."""
    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(10, 10)
    kw = dict(spp=64, max_depth=50, seed=7, rr_depth=3)
    q = render(sc, cm, 10, 10, mode="queue", **kw)
    p = render(sc, cm, 10, 10, mode="pool", **kw)
    np.testing.assert_allclose(q.mean(), p.mean(), rtol=0.1)


def test_rr_mesh_matches_single_device():
    """RR under a mesh: the pool's slot-keyed draws make the sharded
    render bit-identical to single-device; the meshed queue agrees up to
    the final psum order."""
    from tpu_ray.parallel.mesh import make_mesh

    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(10, 10)
    mesh = make_mesh(8)
    kw = dict(spp=16, max_depth=50, seed=13, rr_depth=3)
    one_p = render(sc, cm, 10, 10, mode="pool", **kw)
    mesh_p = render(sc, cm, 10, 10, mode="pool", mesh=mesh, **kw)
    np.testing.assert_allclose(mesh_p, one_p, rtol=1e-5, atol=1e-6)
    one_q = render(sc, cm, 10, 10, mode="queue", **kw)
    mesh_q = render(sc, cm, 10, 10, mode="queue", mesh=mesh, **kw)
    np.testing.assert_allclose(mesh_q, one_q, rtol=1e-4, atol=1e-5)
