"""Integrator semantics, scene library, multi-device rendering."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ray.core.camera import Camera
from tpu_ray.integrator import trace
from tpu_ray.models import objects as ob
from tpu_ray.models.compile import build_scene
from tpu_ray.models.scenes import SCENES
from tpu_ray.renderer import pick_samples_per_wave, render

KEY = jax.random.PRNGKey(0)


def _trace(scene, ro, rd, max_depth=8, key=KEY):
    ro = jnp.asarray(ro, jnp.float32).reshape(-1, 3)
    rd = jnp.asarray(rd, jnp.float32).reshape(-1, 3)
    return np.asarray(trace(scene, ro, rd, jnp.zeros(ro.shape[0]), key, max_depth))


def test_miss_returns_background():
    scene = build_scene(
        [ob.Sphere((0, 0, -100), 1.0, ob.Lambertian((1, 1, 1)))],
        background=(0.25, 0.5, 0.75),
    )
    rad = _trace(scene, [[0, 0, 0]], [[0, 0, 1]])
    np.testing.assert_allclose(rad[0], [0.25, 0.5, 0.75], atol=1e-6)


def test_enclosing_emissive_sphere_exact():
    """Inside an emissive sphere every ray sees the back face -> exact emission."""
    scene = build_scene(
        [ob.Sphere((0, 0, 0), 10.0, ob.DiffuseLight((2.0, 3.0, 4.0)))],
        background=(9, 9, 9),
    )
    dirs = np.asarray(jax.random.normal(KEY, (64, 3)), np.float32)
    rad = _trace(scene, np.zeros((64, 3), np.float32), dirs)
    np.testing.assert_allclose(rad, np.tile([2.0, 3.0, 4.0], (64, 1)), rtol=1e-5)


def test_lambertian_plane_furnace_exact():
    """Camera ray hits an albedo-a plane under a white background: with pure
    cosine sampling the estimator is exactly a * bg for every sample (the
    weight is the albedo, the scattered ray always escapes upward)."""
    scene = build_scene(
        [ob.Rect("xz", -1e5, 1e5, -1e5, 1e5, 0.0, ob.Lambertian((0.5, 0.25, 0.125)))],
        background=(1.0, 1.0, 1.0),
    )
    n = 256
    ro = np.tile([[0.0, 5.0, 0.0]], (n, 1)).astype(np.float32)
    rd = np.tile([[0.0, -1.0, 0.0]], (n, 1)).astype(np.float32)
    rad = _trace(scene, ro, rd, max_depth=8)
    np.testing.assert_allclose(rad, np.tile([0.5, 0.25, 0.125], (n, 1)), rtol=1e-5)


def test_depth_zero_and_exhaustion():
    scene = build_scene(
        [ob.Rect("xz", -1e5, 1e5, -1e5, 1e5, 0.0, ob.Lambertian((0.9, 0.9, 0.9)))],
        background=(1.0, 1.0, 1.0),
    )
    ro = np.array([[0.0, 5.0, 0.0]], np.float32)
    rd = np.array([[0.0, -1.0, 0.0]], np.float32)
    # depth 0 -> black (src/Lib.hs:1303-1304)
    np.testing.assert_allclose(_trace(scene, ro, rd, max_depth=0), 0.0, atol=1e-7)
    # depth 1: the only bounce scatters, then the loop ends -> black
    np.testing.assert_allclose(_trace(scene, ro, rd, max_depth=1), 0.0, atol=1e-7)
    # depth 2: scatter + escape -> albedo * bg
    np.testing.assert_allclose(_trace(scene, ro, rd, max_depth=2)[0], 0.9, rtol=1e-5)


def test_zero_throughput_terminates():
    scene = build_scene(
        [ob.Rect("xz", -1e5, 1e5, -1e5, 1e5, 0.0, ob.Lambertian((0.0, 0.0, 0.0)))],
        background=(1.0, 1.0, 1.0),
    )
    ro = np.array([[0.0, 5.0, 0.0]], np.float32)
    rd = np.array([[0.0, -1.0, 0.0]], np.float32)
    np.testing.assert_allclose(_trace(scene, ro, rd, max_depth=50), 0.0, atol=1e-7)


def test_emissive_quad_seen_from_below():
    """An XZ light emits downward only (back-face emission quirk,
    src/Lib.hs:880-884): from below we see it, from above we do not."""
    scene = build_scene(
        [ob.Rect("xz", -1, 1, -1, 1, 0.0, ob.DiffuseLight((5, 5, 5)))],
        background=(0, 0, 0),
    )
    from_below = _trace(scene, [[0, -3, 0]], [[0, 1, 0]])
    from_above = _trace(scene, [[0, 3, 0]], [[0, -1, 0]])
    np.testing.assert_allclose(from_below[0], 5.0, rtol=1e-5)
    np.testing.assert_allclose(from_above[0], 0.0, atol=1e-7)


# ---------------------------------------------------------------------------
# renderer
# ---------------------------------------------------------------------------
def test_pick_samples_per_wave():
    assert pick_samples_per_wave(100, 100, 10, 1 << 20) == 10
    assert pick_samples_per_wave(1000, 1000, 100, 1 << 20) == 1
    assert pick_samples_per_wave(100, 100, 12, 50_000) == 4  # divisor of 12 <= 5


def test_render_shapes_and_determinism():
    spec = SCENES["two-spheres"]
    scene = spec.build()
    cam = spec.camera(24, 16)
    img1 = render(scene, cam, 24, 16, spp=4, max_depth=4, seed=7)
    img2 = render(scene, cam, 24, 16, spp=4, max_depth=4, seed=7)
    assert img1.shape == (16, 24, 3)
    np.testing.assert_array_equal(img1, img2)
    assert np.isfinite(img1).all()
    img3 = render(scene, cam, 24, 16, spp=4, max_depth=4, seed=8)
    assert np.abs(img3 - img1).max() > 0


def test_render_orientation():
    """Emissive ceiling over a dark floor: the top image rows are brighter.

    Note: emission is back-face only (src/Lib.hs:880-884), so a ceiling XZ
    rect (normal +y) lights everything below it; spheres seen from outside
    never emit - a reference quirk this framework reproduces.
    """
    world = [
        ob.Rect("xz", -50, 50, -50, 50, 12, ob.DiffuseLight((5, 5, 5))),
        ob.Rect("xz", -50, 50, -50, 50, 0, ob.Lambertian((0.1, 0.1, 0.1))),
    ]
    scene = build_scene(world)
    cam = Camera.create((0, 5, 20), (0, 5, 0), (0, 1, 0), 60.0, 1.0, 0.0, 10.0)
    img = render(scene, cam, 16, 16, spp=8, max_depth=4, seed=0)
    assert img[:4].mean() > img[-4:].mean() * 2


@pytest.mark.parametrize("name", list(SCENES))
def test_scene_builds_and_renders(name):
    spec = SCENES[name]
    scene = spec.build(seed=1024, earth=None)
    cam = spec.camera(12, 12)
    img = render(scene, cam, 12, 12, spp=2, max_depth=4, seed=3)
    assert img.shape == (12, 12, 3)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0


def test_scene_prim_counts():
    assert SCENES["cornell"].build().n_prims == 13  # 6 walls + 6 box faces + sphere
    assert SCENES["cornell-smoke"].build().n_prims == 8  # 6 walls + 2 medium boxes
    assert SCENES["two-spheres"].build().n_prims == 2
    n1 = SCENES["book1-final"].build(seed=1024).n_prims
    assert 400 <= n1 <= 488  # 4 heroes + 22x22 grid minus skips
    # 400 axis-aligned ground cuboids compile to ONE solid-box prim each
    # (not 6 rects - the reference's cuboid explosion, src/Lib.hs:594-605,
    # is an ADT artifact, not a geometric requirement)
    sc = SCENES["next-week-final"].build(seed=1024, earth=None)
    assert sc.n_prims == 400 + 1 + 1 + 1 + 1 + 1 + 2 + 1 + 1 + 1000
    assert sc.n_box == 400 and sc.n_sphere == 1006 and sc.has_solid_box


def test_cornell_light_is_lit():
    scene = SCENES["cornell"].build()
    cam = SCENES["cornell"].camera(16, 16)
    img = render(scene, cam, 16, 16, spp=16, max_depth=8, seed=0)
    # ceiling light region (top-center) must be the brightest thing
    assert img.max() > 1.0
    assert img.mean() > 0.01


def test_checkpoint_resume(tmp_path):
    spec = SCENES["two-spheres"]
    scene = spec.build()
    cam = spec.camera(16, 16)
    ck = str(tmp_path / "ck.npz")
    kw = dict(max_depth=4, seed=5, rays_per_wave=16 * 16, samples_per_wave=2)
    # full render in one go (k_pool=1, 4 waves of 2 samples)
    img_full = render(scene, cam, 16, 16, spp=8, **kw)
    # render half (checkpointing), then resume
    render(scene, cam, 16, 16, spp=8, checkpoint_path=ck, checkpoint_every=2, **kw)
    img_resumed = render(scene, cam, 16, 16, spp=8, checkpoint_path=ck, **kw)
    np.testing.assert_allclose(img_resumed, img_full, atol=1e-6)


# ---------------------------------------------------------------------------
# multi-device
# ---------------------------------------------------------------------------
def test_sharded_render_matches_single_device():
    from tpu_ray.parallel.mesh import make_mesh

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    spec = SCENES["two-spheres"]
    scene = spec.build()
    cam = spec.camera(16, 16)
    kwargs = dict(max_depth=4, seed=11, rays_per_wave=16 * 16,
                  samples_per_wave=1)  # k_pool=1, 16 waves
    img_single = render(scene, cam, 16, 16, spp=16, **kwargs)
    img_mesh = render(scene, cam, 16, 16, spp=16, mesh=make_mesh(8), **kwargs)
    np.testing.assert_allclose(img_mesh, img_single, rtol=1e-4, atol=1e-5)


def test_sharded_render_uneven_waves():
    from tpu_ray.parallel.mesh import make_mesh

    spec = SCENES["two-spheres"]
    scene = spec.build()
    cam = spec.camera(8, 8)
    kwargs = dict(max_depth=3, seed=2, rays_per_wave=8 * 8, samples_per_wave=1)
    img_single = render(scene, cam, 8, 8, spp=5, **kwargs)  # 5 waves over 8 devices
    img_mesh = render(scene, cam, 8, 8, spp=5, mesh=make_mesh(8), **kwargs)
    np.testing.assert_allclose(img_mesh, img_single, rtol=1e-4, atol=1e-5)


def test_resolve_engine():
    from tpu_ray.renderer import resolve_engine

    small = SCENES["cornell"].build()
    big = SCENES["next-week-final"].build(seed=1, earth=None)
    # on CPU (tests), auto always resolves to the XLA sweep
    assert resolve_engine(small, "auto") == "xla"
    assert resolve_engine(big, "auto") == "xla"
    assert resolve_engine(small, "pallas") == "pallas"
    assert resolve_engine(big, "xla") == "xla"


def test_resolve_mode_auto():
    from tpu_ray.renderer import resolve_mode

    small = SCENES["cornell"].build()
    big = SCENES["next-week-final"].build(seed=1, earth=None)
    # measured crossover (tools/bench_mode.py): queue wins only where the
    # per-iteration sweep dominates the flush/inject glue
    assert resolve_mode(small, "auto") == "pool"
    assert resolve_mode(big, "auto") == "queue"
    # queue scope: brute-force sweep, full frames; meshes shard the
    # sample axis so spp must split evenly over the devices
    from tpu_ray.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    assert resolve_mode(big, "auto", mesh=mesh, spp=16) == "queue"
    assert resolve_mode(big, "auto", mesh=mesh, spp=5) == "pool"
    assert resolve_mode(big, "auto", mesh=mesh) == "pool"  # spp unknown
    assert resolve_mode(big, "auto", bvh=True) == "pool"
    assert resolve_mode(big, "auto", _rows=4) == "pool"
    assert resolve_mode(big, "pool") == "pool"
    assert resolve_mode(small, "queue") == "queue"


def test_poisson_disk_blue_noise():
    from tpu_ray.utils.poisson import poisson_disk

    n = 64
    pts = poisson_disk(n, seed=3)
    assert pts.shape[0] >= n // 4  # maximal set at r = sqrt(2/n)
    assert np.all((pts >= 0) & (pts < 1))
    # every pair respects the Poisson radius
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, 1.0)
    assert d2.min() >= (2.0 / n) * 0.999


def test_checkpoint_path_without_npz(tmp_path):
    spec = SCENES["two-spheres"]
    scene = spec.build()
    cam = spec.camera(8, 8)
    ck = str(tmp_path / "film.ckpt")  # no .npz suffix
    kw = dict(max_depth=3, seed=6, rays_per_wave=64, samples_per_wave=2)
    img_full = render(scene, cam, 8, 8, spp=8, **kw)
    render(scene, cam, 8, 8, spp=8, checkpoint_path=ck, checkpoint_every=2, **kw)
    img_resumed = render(scene, cam, 8, 8, spp=8, checkpoint_path=ck, **kw)
    np.testing.assert_allclose(img_resumed, img_full, atol=1e-6)
    # a mismatched checkpoint (different max_depth) must be DISCARDED, not
    # blended: the result equals a fresh render at the new settings
    img_fresh4 = render(scene, cam, 8, 8, spp=8, max_depth=4, seed=6,
                        rays_per_wave=64, samples_per_wave=2)
    img_other = render(scene, cam, 8, 8, spp=8, checkpoint_path=ck,
                       max_depth=4, seed=6, rays_per_wave=64, samples_per_wave=2)
    np.testing.assert_allclose(img_other, img_fresh4, atol=1e-6)
    assert np.abs(np.asarray(img_fresh4) - np.asarray(img_full)).max() > 1e-4


def test_auto_checkpoint_survives_crash(monkeypatch, capsys):
    """Long renders checkpoint by default: a crash mid-render loses at most
    one checkpoint interval, and an identical re-run resumes (VERDICT round
    1 item 8; the reference's streamed rows give the same property)."""
    import tpu_ray.renderer as R

    spec = SCENES["two-spheres"]
    scene = spec.build()
    cam = spec.camera(8, 8)
    kw = dict(max_depth=3, seed=9, rays_per_wave=64, samples_per_wave=1)
    monkeypatch.setattr(R, "AUTO_CHECKPOINT_WAVES", 2)
    img_full = render(scene, cam, 8, 8, spp=8, **kw)  # 8 waves, auto-ckpt

    # _film_add runs once per wave on the staged pool path
    real_step = R._film_add
    calls = {"n": 0}

    def crashing_step(*a, **k):
        calls["n"] += 1
        if calls["n"] > 3:
            raise RuntimeError("simulated TPU worker crash")
        return real_step(*a, **k)

    monkeypatch.setattr(R, "_film_add", crashing_step)
    with pytest.raises(RuntimeError):
        render(scene, cam, 8, 8, spp=8, **kw)
    monkeypatch.setattr(R, "_film_add", real_step)

    # the auto checkpoint from the crashed run must resume, not restart
    img_resumed = render(scene, cam, 8, 8, spp=8, progress=True, **kw)
    assert "resuming at wave" in capsys.readouterr().err
    np.testing.assert_allclose(img_resumed, img_full, atol=1e-6)


def test_checkpoint_rejects_edited_scene(tmp_path):
    """Same prim count, different material -> checkpoint must not blend in."""
    def make(albedo):
        objs = [ob.Sphere((0, 0, -3), 1.0, ob.Lambertian(albedo))]
        return build_scene(objs, background=(0.7, 0.8, 0.9))

    cam = Camera.create((0, 0, 1), (0, 0, -3), (0, 1, 0), 60.0, 1.0, 0.0, 4.0)
    ck = str(tmp_path / "ck.npz")
    kw = dict(max_depth=3, seed=7, rays_per_wave=64, samples_per_wave=2)
    render(make((0.9, 0.1, 0.1)), cam, 8, 8, spp=8, checkpoint_path=ck,
           checkpoint_every=2, **kw)
    green = make((0.1, 0.9, 0.1))
    img_fresh = render(green, cam, 8, 8, spp=8, **kw)
    img_ck = render(green, cam, 8, 8, spp=8, checkpoint_path=ck, **kw)
    np.testing.assert_allclose(img_ck, img_fresh, atol=1e-6)


def _band_test_scene():
    objs = [ob.Sphere((i - 300, 0, -5), 0.45, ob.Lambertian((0.5, 0.5, 0.5)))
            for i in range(600)]  # >512 prims to qualify as a big scene
    scene = build_scene(objs, background=(0.3, 0.5, 0.7))
    cam = Camera.create((0, 0, 5), (0, 0, 0), (0, 1, 0), 60.0, 1.0, 0.0, 5.0)
    return scene, cam


def test_band_tiling_matches_unbanded(monkeypatch):
    """Force the band path with a tiny lane cap; the image must be
    BIT-IDENTICAL: all randomness is keyed by global slot/pixel ids."""
    import tpu_ray.renderer as R

    scene, cam = _band_test_scene()
    kw = dict(spp=4, max_depth=3, seed=2, rays_per_wave=16 * 12)  # k_pool=1
    img_plain = render(scene, cam, 16, 12, **kw)
    monkeypatch.setattr(R, "XLA_BIG_SCENE_LANES", 64)  # 16x12 > 64 -> bands
    img_banded = render(scene, cam, 16, 12, **kw)
    assert img_banded.shape == (12, 16, 3)
    np.testing.assert_array_equal(img_banded, img_plain)


def test_band_tiling_composes_with_mesh(monkeypatch):
    """Big scenes over a mesh band-tile too (the lane cap must hold on every
    device) and still produce the exact single-device image."""
    import tpu_ray.renderer as R
    from tpu_ray.parallel.mesh import make_mesh

    scene, cam = _band_test_scene()
    # mode pinned: the mesh path renders via the wave pool (queue v1 is
    # single-device), so the single-device comparison must be pool too
    kw = dict(spp=4, max_depth=3, seed=2, rays_per_wave=16 * 12,
              samples_per_wave=1, mode="pool")  # k_pool=1, 4 waves
    img_plain = render(scene, cam, 16, 12, **kw)
    monkeypatch.setattr(R, "XLA_BIG_SCENE_LANES", 64)
    img_banded_mesh = render(scene, cam, 16, 12, mesh=make_mesh(8), **kw)
    np.testing.assert_allclose(img_banded_mesh, img_plain, rtol=1e-5, atol=1e-6)


def test_next_week_final_banded_mesh(monkeypatch):
    """The round-1 gap: a >512-prim scene above the lane cap rendered over a
    mesh must band-tile (the cap holds per device) and stay finite."""
    import tpu_ray.renderer as R
    from tpu_ray.parallel.mesh import make_mesh

    scene = SCENES["next-week-final"].build(seed=1024, earth=None)
    cam = SCENES["next-week-final"].camera(16, 12)
    monkeypatch.setattr(R, "XLA_BIG_SCENE_LANES", 64)  # force banding at 16x12
    img = render(scene, cam, 16, 12, spp=2, max_depth=3, seed=1,
                 rays_per_wave=16 * 12, samples_per_wave=1, mesh=make_mesh(8))
    assert img.shape == (12, 16, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 0.0


def test_sharded_cornell_with_lights():
    """MIS light sampling under shard_map + psum matches single device."""
    from tpu_ray.parallel.mesh import make_mesh

    scene = SCENES["cornell"].build()
    cam = SCENES["cornell"].camera(10, 10)
    kwargs = dict(max_depth=6, seed=13, rays_per_wave=100, samples_per_wave=1)
    img_single = render(scene, cam, 10, 10, spp=8, **kwargs)
    img_mesh = render(scene, cam, 10, 10, spp=8, mesh=make_mesh(8), **kwargs)
    np.testing.assert_allclose(img_mesh, img_single, rtol=1e-4, atol=1e-5)
