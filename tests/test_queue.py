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


def test_queue_overdispatch_is_identity():
    """The pipelined host loop reads epoch counters LAGGED by one epoch,
    so it always dispatches one epoch past the satisfied exit condition;
    that is only sound because _queue_epoch's while-cond self-terminates,
    returning the state bit-unchanged.  Pin that invariant directly."""
    from tpu_ray import integrator as integ

    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(8, 8)
    total = jnp.int32(8 * 8 * 2)
    k_i = jax.random.fold_in(KEY, 0)
    k_s = jax.random.fold_in(KEY, 1)
    args = (sc, cm, k_i, k_s, jnp.uint32(3), jnp.uint32(0), total,
            128, 64, 0, 8, 8, "xla", False, 8)
    R, total_i = 128, 128
    st = integ._QueueState(
        iteration=jnp.int32(0), frontier=jnp.int32(0),
        origin=jnp.zeros((R, 3)), direction=jnp.ones((R, 3)),
        time=jnp.zeros((R,)), throughput=jnp.ones((R, 3)),
        accum=jnp.zeros((R, 3)), bounce=jnp.zeros((R,), jnp.int32),
        work=jnp.full((R,), total_i, jnp.int32),
        active=jnp.zeros((R,), bool),
        plane=tuple(jnp.zeros((total_i,), jnp.float32) for _ in range(3)),
        log=jnp.zeros((R, 3), jnp.float32),
        posmap=jnp.full((total_i,), -1, jnp.int32),
        cursor=jnp.int32(0),
    )
    # run epochs until the exit condition holds (frontier spent, none active)
    for _ in range(40):
        st = integ._queue_epoch(*((st,) + args))
        f, n = (int(v) for v in np.asarray(integ._queue_counters(st)))
        if f >= total_i and n == 0:
            break
    else:
        raise AssertionError("queue never drained")
    # iteration is epoch-local bookkeeping, reset at every epoch entry;
    # the invariant covers everything else
    before = jax.tree_util.tree_map(
        np.asarray, st._replace(iteration=jnp.int32(0)))
    st2 = integ._queue_epoch(*((st,) + args))
    after = jax.tree_util.tree_map(
        np.asarray, st2._replace(iteration=jnp.int32(0)))
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)


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


# ---------------------------------------------------------------------------
# queue over a device mesh (integrator.trace_queue_mesh)
# ---------------------------------------------------------------------------
def test_queue_mesh_matches_single_device():
    """Sharding a chunk's samples over devices is the same operation as
    sample-chunking on one device, so the meshed queue must reproduce the
    single-device queue (per-sample radiances are bit-identical; only the
    final psum's f32 summation order differs)."""
    from tpu_ray.parallel.mesh import make_mesh

    scene, cam = _plane_scene(), _down_camera()
    kw = dict(spp=16, max_depth=6, seed=7, mode="queue")
    img_single = render(scene, cam, 12, 12, **kw)
    img_mesh = render(scene, cam, 12, 12, mesh=make_mesh(8), **kw)
    np.testing.assert_allclose(img_mesh, img_single, rtol=1e-5, atol=1e-6)


def test_queue_mesh_lights_mis():
    """MIS light sampling + emissives through the meshed queue match the
    single-device queue (cornell has the glass-sphere-in-light-list)."""
    from tpu_ray.parallel.mesh import make_mesh

    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(10, 10)
    kw = dict(spp=8, max_depth=6, seed=13, mode="queue")
    img_single = render(sc, cm, 10, 10, **kw)
    img_mesh = render(sc, cm, 10, 10, mesh=make_mesh(8), **kw)
    np.testing.assert_allclose(img_mesh, img_single, rtol=1e-4, atol=1e-5)


def test_queue_mesh_chunked(monkeypatch):
    """Multiple sample chunks under a mesh (film-plane budget forces
    chunking) still reproduce the unchunked meshed render."""
    import tpu_ray.renderer as R
    from tpu_ray.parallel.mesh import make_mesh

    scene, cam = _plane_scene(), _down_camera()
    kw = dict(spp=16, max_depth=4, seed=9, mode="queue")
    mesh = make_mesh(8)
    img_one = render(scene, cam, 8, 8, mesh=mesh, **kw)
    # budget of one device-chunk row group: 8*8 pixels * 12 B * spp_d rows
    monkeypatch.setattr(R, "QUEUE_PLANE_BYTES", 8 * 8 * 12 * 1)
    img_chunked = render(scene, cam, 8, 8, mesh=mesh, **kw)
    np.testing.assert_allclose(img_chunked, img_one, rtol=1e-6, atol=1e-7)


def test_queue_mesh_uneven_spp_falls_back():
    """spp that does not split over the devices renders via the pool (and
    stays finite) instead of erroring."""
    from tpu_ray.parallel.mesh import make_mesh

    scene, cam = _plane_scene(), _down_camera()
    img = render(scene, cam, 8, 8, spp=5, max_depth=3, seed=1,
                 mode="queue", mesh=make_mesh(8))
    assert img.shape == (8, 8, 3)
    np.testing.assert_allclose(img, np.full((8, 8, 3), [0.5, 0.25, 0.125]),
                               rtol=1e-5)
