"""Pallas fused intersect kernel vs the XLA reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ray.models import objects as ob
from tpu_ray.models.compile import build_scene
from tpu_ray.models.scenes import SCENES
from tpu_ray.ops.intersect import intersect_scene
from tpu_ray.renderer import render

KEY = jax.random.PRNGKey(0)


def _rays(seed, n, lo=-10, hi=10):
    r = np.random.default_rng(seed)
    ro = jnp.asarray(r.uniform(lo, hi, (n, 3)), jnp.float32)
    rd = jnp.asarray(r.normal(size=(n, 3)), jnp.float32)
    rt = jnp.asarray(r.random(n), jnp.float32)
    return ro, rd, rt


@pytest.mark.parametrize("scene_name,lo,hi", [
    ("cornell", 0, 555),
    ("book1-final", -12, 12),
    ("two-spheres", -15, 15),
])
def test_pallas_matches_xla(scene_name, lo, hi):
    scene = SCENES[scene_name].build(seed=5)
    ro, rd, rt = _rays(1, 384, lo, hi)
    ra = intersect_scene(scene, ro, rd, rt, KEY)
    rb = intersect_scene(scene, ro, rd, rt, KEY, engine="pallas")
    np.testing.assert_array_equal(np.asarray(ra.hit), np.asarray(rb.hit))
    h = np.asarray(ra.hit)
    assert h.sum() > 20
    # fp association differs slightly between the kernel and XLA on grazing
    # hits of huge spheres (catastrophic cancellation at r=1000)
    np.testing.assert_allclose(np.asarray(ra.t)[h], np.asarray(rb.t)[h], rtol=5e-4)
    np.testing.assert_array_equal(np.asarray(ra.prim)[h], np.asarray(rb.prim)[h])


def test_pallas_moving_spheres():
    scene = build_scene([
        ob.MovingSphere((0, 0, -5), (5, 0, -5), 0, 1, 1.0, ob.Lambertian((1, 1, 1))),
        ob.Sphere((0, 5, 0), 1.0, ob.Lambertian((1, 1, 1))),
    ])
    ro, rd, rt = _rays(2, 256, -8, 8)
    ra = intersect_scene(scene, ro, rd, rt, KEY)
    rb = intersect_scene(scene, ro, rd, rt, KEY, engine="pallas")
    np.testing.assert_array_equal(np.asarray(ra.hit), np.asarray(rb.hit))
    h = np.asarray(ra.hit)
    np.testing.assert_allclose(np.asarray(ra.t)[h], np.asarray(rb.t)[h], rtol=1e-5)


def test_pallas_with_media_combination():
    """Media rows keep the XLA path; solids go through the kernel."""
    scene = SCENES["cornell-smoke"].build()
    assert scene.n_solid == 6 and scene.n_prims == 8
    ro, rd, rt = _rays(3, 256, 0, 555)
    ra = intersect_scene(scene, ro, rd, rt, KEY)
    rb = intersect_scene(scene, ro, rd, rt, KEY, engine="pallas")
    np.testing.assert_array_equal(np.asarray(ra.hit), np.asarray(rb.hit))
    h = np.asarray(ra.hit)
    np.testing.assert_allclose(np.asarray(ra.t)[h], np.asarray(rb.t)[h], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ra.prim)[h], np.asarray(rb.prim)[h])


def test_pallas_per_kind_launches_big_mixed_scene():
    """A >512-prim scene with all three solid kinds exercises multi-block
    per-kind kernel launches; (hit, prim) must agree exactly with the XLA
    sweep and t to fp tolerance."""
    r = np.random.default_rng(31)
    objs = [
        ob.Sphere(tuple(r.uniform(-50, 50, 3)), r.uniform(0.3, 1.5),
                  ob.Lambertian((1, 1, 1)))
        for _ in range(500)
    ]
    for _ in range(40):
        lo3 = r.uniform(-50, 50, 3)
        objs.append(ob.Box(tuple(lo3), tuple(lo3 + r.uniform(0.5, 4.0, 3)),
                           ob.Lambertian((1, 1, 1))))
    for plane in ("xy", "xz", "yz"):
        for _ in range(30):
            a = np.sort(r.uniform(-50, 50, 2)); b = np.sort(r.uniform(-50, 50, 2))
            objs.append(ob.Rect(plane, a[0], a[1], b[0], b[1],
                                r.uniform(-50, 50), ob.Lambertian((1, 1, 1))))
    scene = build_scene(objs)
    assert scene.n_sphere == 500 and scene.n_box == 40
    ro, rd, rt = _rays(32, 1024, -120, 120)
    ra = intersect_scene(scene, ro, rd, rt, KEY)
    rb = intersect_scene(scene, ro, rd, rt, KEY, engine="pallas")
    np.testing.assert_array_equal(np.asarray(ra.hit), np.asarray(rb.hit))
    h = np.asarray(ra.hit)
    assert h.sum() > 100
    np.testing.assert_allclose(np.asarray(ra.t)[h], np.asarray(rb.t)[h], rtol=5e-4)
    np.testing.assert_array_equal(np.asarray(ra.prim)[h], np.asarray(rb.prim)[h])


def test_pallas_render_matches():
    spec = SCENES["cornell"]
    scene = spec.build()
    cam = spec.camera(12, 12)
    img_a = render(scene, cam, 12, 12, spp=8, max_depth=6, seed=4)
    img_b = render(scene, cam, 12, 12, spp=8, max_depth=6, seed=4, engine="pallas")
    np.testing.assert_allclose(img_a, img_b, rtol=1e-4, atol=1e-6)


def test_mxu_sphere_sweep_matches_classic():
    """The opt-in MXU static-sphere sweep (TPU_RAY_SWEEP_MXU=1, a documented
    2.4x-slower negative result kept for the record — PERFLOG.md) must stay
    numerically honest: centroid-shifted matmul form vs the classic per-pair
    kernel, interpret mode."""
    from tpu_ray.ops.intersect_pallas import _sweep_range, _sweep_sphere_mxu

    scene = SCENES["book1-final"].build(seed=1024)
    n = scene.n_sphere_static
    assert n > 400
    ro, rd, _ = _rays(7, 512, -12, 12)
    rt = jnp.zeros((512, 1), jnp.float32)
    bt0, bi0 = _sweep_range(scene, ro, rd, rt, 0, n, "sphere", True,
                            moving=False)
    bt1, bi1 = _sweep_sphere_mxu(scene, ro, rd, rt, 0, n, True)
    hit0 = np.asarray(bt0) < 3e38
    hit1 = np.asarray(bt1) < 3e38
    # hit sets may differ only on grazing rays; none expected at 512 rays
    np.testing.assert_array_equal(hit0, hit1)
    assert hit0.sum() > 50
    np.testing.assert_allclose(np.asarray(bt1)[hit0], np.asarray(bt0)[hit0],
                               rtol=1e-3)
    agree = (np.asarray(bi0)[hit0] == np.asarray(bi1)[hit0]).mean()
    assert agree > 0.99


def test_box_padding_rows_never_hit():
    """Regression: box-range padding rows must be degenerate.  The old
    min=1/max=-1 "inverted box" padding was min/max-normalized by the slab
    test into a REAL [-1,1]^3 box at the origin, giving phantom hits (and
    out-of-range prim ids) to any ray crossing the origin — found on
    next-week-final at R=163840 (tools/debug_cull_hw5/6.py)."""
    from tpu_ray.ops.intersect_pallas import intersect_solids_pallas

    # one box far from the origin -> 127 padding rows in the box block
    scene = build_scene([
        ob.Box((50, 50, 50), (52, 52, 52), ob.Lambertian((1, 1, 1))),
    ])
    assert scene.n_box == 1
    # rays through the origin (the phantom box's location), away from the box
    r = np.random.default_rng(99)
    ro = jnp.asarray(r.uniform(-8, 8, (256, 3)), jnp.float32)
    rd = jnp.asarray(-np.asarray(ro) + r.normal(0, 0.05, (256, 3)),
                     jnp.float32)  # aimed at the origin
    rt = jnp.zeros((256,), jnp.float32)
    bt, bi = intersect_solids_pallas(scene, ro, rd, rt, interpret=True)
    bt = np.asarray(bt)
    hits = np.isfinite(bt)
    # none of these rays reach (50,50,50)-(52,52,52); any hit is a phantom
    assert not hits.any(), f"phantom padding hits at t={bt[hits][:5]}"


def test_sorted_cull_sweep_matches_plain():
    """Octant+Morton ray sorting + per-tile block culling must be
    bit-exact vs the plain sweep: every surviving (ray, prim) pair runs
    the identical test, and skipping is exact by AABB containment
    (intersect_pallas._needed_mask)."""
    from tpu_ray.ops.intersect_pallas import intersect_solids_pallas

    for name, lo, hi in [("next-week-final", -100, 600),
                         ("cornell", 0, 555)]:
        scene = SCENES[name].build(seed=1024)
        ro, rd, rt = _rays(11, 1280, lo, hi)
        t0, i0 = intersect_solids_pallas(scene, ro, rd, rt, sort=False,
                                         interpret=True)
        t1, i1 = intersect_solids_pallas(scene, ro, rd, rt, sort=True,
                                         interpret=True)
        h = np.isfinite(np.asarray(t0))
        assert h.sum() > 300
        np.testing.assert_array_equal(h, np.isfinite(np.asarray(t1)))
        np.testing.assert_array_equal(np.asarray(t0)[h], np.asarray(t1)[h])
        np.testing.assert_array_equal(np.asarray(i0)[h], np.asarray(i1)[h])
