"""Work-queue integrator (integrator.trace_queue): estimator semantics and
the schedule-invariance guarantees it is built around."""
import jax
import jax.numpy as jnp
import numpy as np

from tpu_ray.integrator import trace_queue
from tpu_ray.models import objects as ob
from tpu_ray.models.compile import build_scene
from tpu_ray.models.scenes import SCENES
from tpu_ray.renderer import render

KEY = jax.random.fold_in(jax.random.PRNGKey(3), 0x5EED)


def _plane_scene(albedo=(0.5, 0.25, 0.125)):
    return build_scene(
        [ob.Rect("xz", -1e5, 1e5, -1e5, 1e5, 0.0, ob.Lambertian(albedo))],
        background=(1.0, 1.0, 1.0),
    )


def _down_camera():
    from tpu_ray.core.camera import Camera

    return Camera.create((0, 5, 0), (0, 0, 0), (1, 0, 0), 60.0, 1.0, 0.0, 5.0)


def test_queue_furnace_exact():
    """Every sample of the albedo-a plane under white bg is exactly a, so
    the queue's sample accounting (each work item traced and flushed
    exactly once) is exact, not statistical."""
    scene = _plane_scene()
    cam = _down_camera()
    img = render(scene, cam, 8, 8, spp=16, max_depth=8, seed=1, mode="queue")
    np.testing.assert_allclose(
        img, np.broadcast_to([0.5, 0.25, 0.125], img.shape), rtol=1e-5
    )


def test_queue_depth_semantics():
    scene = _plane_scene((0.9, 0.9, 0.9))
    cam = _down_camera()
    kw = dict(spp=4, seed=2, mode="queue")
    np.testing.assert_allclose(
        render(scene, cam, 8, 8, max_depth=0, **kw), 0.0, atol=1e-7)
    np.testing.assert_allclose(
        render(scene, cam, 8, 8, max_depth=1, **kw), 0.0, atol=1e-7)
    np.testing.assert_allclose(
        render(scene, cam, 8, 8, max_depth=2, **kw), 0.9, rtol=1e-5)


def test_queue_schedule_invariance_exact():
    """The queue's core guarantee: lane count, epoch length, and the drain
    ladder are all BIT-invisible (draws keyed by (work item, bounce), film
    plane written at absolute indices, reduced in fixed order)."""
    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(12, 12)

    def run(R, iters, drain=()):
        return np.asarray(trace_queue(
            sc, cm, 12, 12, 8, 0, KEY, 12, R=R, engine="xla", shade="xla",
            cam_salt=jnp.uint32(3), epoch_iters=iters, drain_levels=drain))

    base = run(144, 64)
    np.testing.assert_array_equal(base, run(512, 3, (64, 16)))
    np.testing.assert_array_equal(base, run(300, 17))


def test_queue_sample_chunking():
    """Chunks partition the work space: the chunk sums differ from the
    one-shot render only by the final f32 reduce association (the draws
    themselves are keyed by GLOBAL work item, so they are identical)."""
    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(12, 12)

    def run(chunk, s0):
        return np.asarray(trace_queue(
            sc, cm, 12, 12, chunk, s0, KEY, 12, R=300, engine="xla",
            shade="xla", cam_salt=jnp.uint32(3), epoch_iters=17))

    base = run(8, 0)
    np.testing.assert_allclose(run(4, 0) + run(4, 4), base,
                               rtol=1e-5, atol=1e-7)


def test_queue_fused_matches_xla():
    """The fused Pallas step (interpret mode on CPU) draws the identical
    streams; values agree to fp-reassociation level, and it has the same
    bit-exact schedule invariance."""
    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(10, 10)

    def run(shade, R=100, iters=64, drain=()):
        return np.asarray(trace_queue(
            sc, cm, 10, 10, 4, 0, KEY, 10, R=R, engine="xla", shade=shade,
            cam_salt=jnp.uint32(3), epoch_iters=iters, drain_levels=drain))

    x = run("xla")
    f = run("fused")
    np.testing.assert_allclose(f, x, rtol=2e-3, atol=2e-6)
    np.testing.assert_array_equal(f, run("fused", R=256, iters=5,
                                         drain=(32,)))


def test_queue_log_wrap_invisible():
    """The v2 flush's radiance log is normally sized for the whole chunk;
    an undersized log forces mid-iteration materialize-and-reset passes
    (the device-side log-room guard), which must be bit-invisible."""
    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(12, 12)

    def run(log_rows, R=144, iters=64, drain=()):
        return np.asarray(trace_queue(
            sc, cm, 12, 12, 8, 0, KEY, 12, R=R, engine="xla", shade="xla",
            cam_salt=jnp.uint32(3), epoch_iters=iters, drain_levels=drain,
            log_rows=log_rows))

    base = run(0)                                  # auto: no wraps
    np.testing.assert_array_equal(base, run(144))  # wrap ~every iteration
    np.testing.assert_array_equal(base, run(500, R=300, iters=17))
    np.testing.assert_array_equal(base, run(700, R=512, iters=3, drain=(64,)))


def test_queue_matches_pool_statistically():
    """Queue and pool draw different (both valid) streams; the estimates
    agree in expectation."""
    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(12, 12)
    iq = render(sc, cm, 12, 12, spp=96, max_depth=12, seed=3, mode="queue")
    ip = render(sc, cm, 12, 12, spp=96, max_depth=12, seed=3, mode="pool")
    np.testing.assert_allclose(iq.mean(), ip.mean(), rtol=0.12)
    np.testing.assert_allclose(iq.mean(axis=(0, 1)), ip.mean(axis=(0, 1)),
                               rtol=0.15)


def test_queue_media_statistics():
    """Constant-medium free flight draws through the queue's (work, bounce)
    keying match the pool estimator in expectation."""
    sc = SCENES["cornell-smoke"].build()
    cm = SCENES["cornell-smoke"].camera(10, 10)
    iq = render(sc, cm, 10, 10, spp=64, max_depth=12, seed=5, mode="queue")
    ip = render(sc, cm, 10, 10, spp=64, max_depth=12, seed=5, mode="pool")
    np.testing.assert_allclose(iq.mean(), ip.mean(), rtol=0.15)
