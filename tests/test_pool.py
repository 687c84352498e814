"""Ray-pool (regeneration) integrator: semantics and sample accounting."""
import jax
import jax.numpy as jnp
import numpy as np

from tpu_ray.integrator import trace_pool
from tpu_ray.models import objects as ob
from tpu_ray.models.compile import build_scene
from tpu_ray.models.scenes import SCENES
from tpu_ray.renderer import render

KEY = jax.random.PRNGKey(0)


def _plane_scene(albedo=(0.5, 0.25, 0.125)):
    return build_scene(
        [ob.Rect("xz", -1e5, 1e5, -1e5, 1e5, 0.0, ob.Lambertian(albedo))],
        background=(1.0, 1.0, 1.0),
    )


def _down_camera():
    from tpu_ray.core.camera import Camera

    return Camera.create((0, 5, 0), (0, 0, 0), (1, 0, 0), 60.0, 1.0, 0.0, 5.0)


def test_pool_furnace_exact():
    """Every sample of the albedo-a plane under white bg is exactly a."""
    scene = _plane_scene()
    cam = _down_camera()
    img = render(scene, cam, 8, 8, spp=16, max_depth=8, seed=1)
    np.testing.assert_allclose(
        img, np.broadcast_to([0.5, 0.25, 0.125], img.shape), rtol=1e-5
    )


def test_pool_depth_semantics():
    scene = _plane_scene((0.9, 0.9, 0.9))
    cam = _down_camera()
    kw = dict(spp=4, seed=2)
    np.testing.assert_allclose(render(scene, cam, 8, 8, max_depth=0, **kw), 0.0, atol=1e-7)
    np.testing.assert_allclose(render(scene, cam, 8, 8, max_depth=1, **kw), 0.0, atol=1e-7)
    np.testing.assert_allclose(
        render(scene, cam, 8, 8, max_depth=2, **kw), 0.9, rtol=1e-5
    )


def test_pool_sample_accounting():
    """Every slot completes exactly n_samples, and the accumulator is their sum."""
    scene = _plane_scene()
    from tpu_ray.core.camera import Camera

    cam = _down_camera()
    R = 64
    xs = jnp.tile(jnp.linspace(0.0, 1.0, 8), 8)
    ys = jnp.repeat(jnp.linspace(0.0, 1.0, 8), 8)
    accum, done = trace_pool(
        scene, cam, xs, ys, (1.0 / 8, 1.0 / 8), KEY, 7, jnp.uint32(0), 8
    )
    np.testing.assert_array_equal(np.asarray(done), 7)
    np.testing.assert_allclose(np.asarray(accum)[:, 0], 7 * 0.5, rtol=1e-4)


def test_pool_matches_wave_statistically():
    """Pool and plain-wavefront renders agree in expectation (cornell)."""
    scene = SCENES["cornell"].build()
    cam = SCENES["cornell"].camera(12, 12)
    img_pool = render(scene, cam, 12, 12, spp=96, max_depth=12, seed=3, mode="pool")
    img_wave = render(scene, cam, 12, 12, spp=96, max_depth=12, seed=4, mode="wave")
    assert np.isfinite(img_pool).all() and np.isfinite(img_wave).all()
    # different RNG schedules -> compare means, not pixels
    np.testing.assert_allclose(img_pool.mean(), img_wave.mean(), rtol=0.12)
    np.testing.assert_allclose(
        img_pool.mean(axis=(0, 1)), img_wave.mean(axis=(0, 1)), rtol=0.15
    )


def test_pool_media_statistics():
    """Smoke box mean brightness matches the wavefront integrator."""
    scene = SCENES["cornell-smoke"].build()
    cam = SCENES["cornell-smoke"].camera(10, 10)
    img_pool = render(scene, cam, 10, 10, spp=64, max_depth=12, seed=5, mode="pool")
    img_wave = render(scene, cam, 10, 10, spp=64, max_depth=12, seed=6, mode="wave")
    np.testing.assert_allclose(img_pool.mean(), img_wave.mean(), rtol=0.15)


def test_pool_wave_scheduling_invariance():
    """Same seed, different samples_per_wave: camera sample streams are keyed
    by global sample index, so the estimates agree closely (in-loop bounce
    randomness differs, so exact equality is not expected for bouncy scenes;
    the furnace plane is exact)."""
    scene = _plane_scene()
    cam = _down_camera()
    img_a = render(scene, cam, 8, 8, spp=8, max_depth=4, seed=7, samples_per_wave=8)
    img_b = render(scene, cam, 8, 8, spp=8, max_depth=4, seed=7, samples_per_wave=2)
    np.testing.assert_allclose(img_a, img_b, atol=1e-6)


def test_pool_compaction_ladder_invisible(monkeypatch):
    """Straggler compaction must not change the estimate: shrink the ladder
    thresholds so it engages at test sizes (production gates it at R >=
    2**14) and compare against the uncompacted pool.  Draws are keyed on
    slot_ids, which travel with the lanes, so only the accumulation
    ASSOCIATION changes - tolerances are a few f32 ULPs."""
    from tpu_ray import integrator

    scene = SCENES["cornell"].build()
    cam = SCENES["cornell"].camera(16, 16)
    xs = jnp.tile(jnp.linspace(0.0, 1.0, 16, endpoint=False), 16)
    ys = jnp.repeat(jnp.linspace(0.0, 1.0, 16, endpoint=False), 16)
    args = (scene, cam, xs, ys, (1.0 / 16, 1.0 / 16), KEY, 4, jnp.uint32(0), 12)

    base_accum, base_done = trace_pool(*args)  # R=256 < COMPACT_MIN: no ladder
    monkeypatch.setattr(integrator, "COMPACT_MIN", 1)
    monkeypatch.setattr(integrator, "COMPACT_FLOOR", 8)
    monkeypatch.setattr(integrator, "COMPACT_FLOOR_TINY", 8)

    # cornell is a "tiny" scene: fraction-8 ladder [32]
    tiny_accum, tiny_done = trace_pool(*args)
    np.testing.assert_array_equal(np.asarray(tiny_done), np.asarray(base_done))
    np.testing.assert_allclose(np.asarray(tiny_accum), np.asarray(base_accum),
                               rtol=3e-6, atol=2e-7)

    # force the halving ladder [128, 64, 32, 16, 8] down the same pool
    monkeypatch.setattr(integrator, "COMPACT_TINY_PRIMS", 0)
    deep_accum, deep_done = trace_pool(*args)
    np.testing.assert_array_equal(np.asarray(deep_done), np.asarray(base_done))
    np.testing.assert_allclose(np.asarray(deep_accum), np.asarray(base_accum),
                               rtol=3e-6, atol=2e-7)


def test_staged_ladder_matches_in_jit_pool():
    """trace_pool_staged (per-stage executables) draws the same streams as
    trace_pool's in-jit ladder (_make_pool_loop is shared, the iteration
    counter rides in the state): sample counts are bit-equal and radiance
    agrees to fp-fusion level (XLA fuses across the stage boundaries
    differently - measured max 4e-5 on ~0.3% of lanes, the same class of
    difference as the xla/pallas engine variants)."""
    import jax
    import jax.numpy as jnp

    from tpu_ray.integrator import _pool_levels, trace_pool, trace_pool_staged
    from tpu_ray.models.scenes import SCENES

    spec = SCENES["cornell"]
    scene = spec.build()
    W, H, k = 64, 64, 4
    cam = spec.camera(W, H)
    R = W * H * k
    assert _pool_levels(R, scene.n_prims), "config must exercise the ladder"
    xs = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None] / W,
                          (k * H, W)).reshape(-1)
    ys = jnp.broadcast_to(
        jnp.arange(H - 1, -1, -1, dtype=jnp.float32)[None].repeat(k, 0)
        .reshape(-1, 1) / H, (k * H, W)).reshape(-1)
    key = jax.random.PRNGKey(3)
    kw = dict(cam_salt=jnp.uint32(11), engine="xla")
    a, na = trace_pool(scene, cam, xs, ys, (1.0 / W, 1.0 / H), key,
                       jnp.int32(3), jnp.uint32(0), 8, **kw)
    b, nb = trace_pool_staged(scene, cam, xs, ys, (1.0 / W, 1.0 / H), key,
                              jnp.int32(3), jnp.uint32(0), 8, **kw)
    np.testing.assert_array_equal(np.asarray(na), np.asarray(nb))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)
