"""Intersection engine vs. analytic cases and a numpy brute-force oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ray.models import objects as ob
from tpu_ray.models.compile import build_scene, rotation_matrix
from tpu_ray.ops.intersect import intersect_scene

KEY = jax.random.PRNGKey(0)


def _hit(scene, ro, rd, rt=None):
    ro = jnp.asarray(ro, jnp.float32).reshape(-1, 3)
    rd = jnp.asarray(rd, jnp.float32).reshape(-1, 3)
    rt = jnp.zeros(ro.shape[0]) if rt is None else jnp.asarray(rt, jnp.float32)
    return intersect_scene(scene, ro, rd, rt, KEY)


def test_sphere_hit_analytic():
    scene = build_scene([ob.Sphere((0, 0, -5), 1.0, ob.Lambertian((1, 1, 1)))])
    rec = _hit(scene, [[0, 0, 0]], [[0, 0, -1]])
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 4.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rec.point)[0], [0, 0, -4], atol=1e-5)
    np.testing.assert_allclose(np.asarray(rec.normal)[0], [0, 0, 1], atol=1e-5)
    assert bool(rec.front[0])


def test_sphere_inside_back_face():
    scene = build_scene([ob.Sphere((0, 0, 0), 2.0, ob.Lambertian((1, 1, 1)))])
    rec = _hit(scene, [[0, 0, 0]], [[0, 0, -1]])
    assert bool(rec.hit[0]) and not bool(rec.front[0])
    # normal is flipped against the ray (faceNormal, src/Lib.hs:1111-1117)
    np.testing.assert_allclose(np.asarray(rec.normal)[0], [0, 0, 1], atol=1e-5)


def test_sphere_miss():
    scene = build_scene([ob.Sphere((0, 0, -5), 1.0, ob.Lambertian((1, 1, 1)))])
    rec = _hit(scene, [[0, 3, 0]], [[0, 0, -1]])
    assert not bool(rec.hit[0])


def test_sphere_uv_poles_and_equator():
    scene = build_scene([ob.Sphere((0, 0, 0), 1.0, ob.Lambertian((1, 1, 1)))])
    # hit at +y pole: theta = pi/2 -> v = 1
    rec = _hit(scene, [[0, 3, 0]], [[0, -1, 0]])
    np.testing.assert_allclose(float(rec.v[0]), 1.0, atol=1e-5)
    # hit at -x: normal (-1,0,0), phi = atan2(0,-1) = pi -> u = 1 - 1 = 0
    rec = _hit(scene, [[-3, 0, 0]], [[1, 0, 0]])
    np.testing.assert_allclose(float(rec.u[0]), 0.0, atol=1e-4)
    np.testing.assert_allclose(float(rec.v[0]), 0.5, atol=1e-5)


def test_moving_sphere_lerp():
    ms = ob.MovingSphere((0, 0, -5), (10, 0, -5), 0.0, 1.0, 1.0, ob.Lambertian((1, 1, 1)))
    scene = build_scene([ms])
    rec0 = _hit(scene, [[0, 0, 0]], [[0, 0, -1]], [0.0])
    rec1 = _hit(scene, [[10, 0, 0]], [[0, 0, -1]], [1.0])
    rec_half = _hit(scene, [[5, 0, 0]], [[0, 0, -1]], [0.5])
    assert bool(rec0.hit[0]) and bool(rec1.hit[0]) and bool(rec_half.hit[0])
    miss = _hit(scene, [[10, 0, 0]], [[0, 0, -1]], [0.0])
    assert not bool(miss.hit[0])


@pytest.mark.parametrize("plane,normal", [("xy", [0, 0, 1]), ("xz", [0, 1, 0]), ("yz", [1, 0, 0])])
def test_rect_orientations(plane, normal):
    scene = build_scene([ob.Rect(plane, -1, 1, -1, 1, 2.0, ob.Lambertian((1, 1, 1)))])
    n = np.array(normal, np.float32)
    ro = (4.0 * n).reshape(1, 3)
    rec = _hit(scene, ro, (-n).reshape(1, 3))
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rec.normal)[0], n, atol=1e-6)
    # uv of the center point
    np.testing.assert_allclose(float(rec.u[0]), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(rec.v[0]), 0.5, atol=1e-6)
    # outside the bounds -> miss
    off = np.array([2.5, 2.5, 2.5], np.float32) * (1 - n) + 4.0 * n
    rec2 = _hit(scene, off.reshape(1, 3), (-n).reshape(1, 3))
    assert not bool(rec2.hit[0])


def test_axis_aligned_box_is_one_prim():
    scene = build_scene([ob.Box((-1, -1, -1), (1, 1, 1), ob.Lambertian((1, 1, 1)))])
    assert scene.n_prims == 1 and scene.n_box == 1
    rec = _hit(scene, [[0, 0, 5]], [[0, 0, -1]])
    np.testing.assert_allclose(float(rec.t[0]), 4.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rec.normal)[0], [0, 0, 1], atol=1e-6)


def test_rotated_box_is_six_rects():
    # a live rotation keeps the 6-quad explosion (cf. Cornell's boxes)
    scene = build_scene([ob.Rotate("y", 15, ob.Box((-1, -1, -1), (1, 1, 1),
                                                   ob.Lambertian((1, 1, 1))))])
    assert scene.n_prims == 6 and scene.n_box == 0


def test_translate():
    scene = build_scene(
        [ob.Translate((0, 5, 0), ob.Sphere((0, 0, -5), 1.0, ob.Lambertian((1, 1, 1))))]
    )
    rec = _hit(scene, [[0, 5, 0]], [[0, 0, -1]])
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 4.0, rtol=1e-5)


def test_rotate_y_rect():
    # a YZ rect at x=2 rotated by 90 deg about y becomes (world) an XY-like
    # plane at z=-2: rotatePoint y (src/Lib.hs:769-771) maps (x,z)->(z,-x)
    # for 90 deg... verify via the matrix itself.
    rect = ob.Rect("yz", -1, 1, -1, 1, 2.0, ob.Lambertian((1, 1, 1)))
    scene = build_scene([ob.Rotate("y", 90, rect)])
    R = rotation_matrix("y", 90)
    world_center = R @ np.array([2.0, 0.0, 0.0])
    ro = world_center + np.array([0.0, 0.0, 0.0]) + 4.0 * (world_center / np.linalg.norm(world_center))
    rd = -(world_center / np.linalg.norm(world_center))
    rec = _hit(scene, ro.reshape(1, 3), rd.reshape(1, 3))
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 4.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rec.point)[0], world_center, atol=1e-4)


def test_closest_of_many():
    mats = ob.Lambertian((1, 1, 1))
    scene = build_scene([
        ob.Sphere((0, 0, -10), 1.0, mats),
        ob.Sphere((0, 0, -5), 1.0, mats),
        ob.Sphere((0, 0, -20), 1.0, mats),
    ])
    rec = _hit(scene, [[0, 0, 0]], [[0, 0, -1]])
    np.testing.assert_allclose(float(rec.t[0]), 4.0, rtol=1e-5)
    # the winning primitive is the z=-5 sphere (row order is an internal
    # detail - prims are Morton-sorted at build time)
    np.testing.assert_allclose(
        np.asarray(scene.prims.center)[int(rec.prim[0])], [0, 0, -5], atol=1e-6
    )


def test_t_min_skips_self_intersection():
    scene = build_scene([ob.Sphere((0, 0, -5), 1.0, ob.Lambertian((1, 1, 1)))])
    # origin on the sphere surface pointing away -> no hit
    rec = _hit(scene, [[0, 0, -4]], [[0, 0, 1]])
    assert not bool(rec.hit[0])


def test_brute_force_oracle_random_scene():
    """Random spheres + rects, random rays: exact (t, prim) agreement with numpy."""
    r = np.random.default_rng(7)
    objs = []
    for _ in range(40):
        c = r.uniform(-5, 5, 3)
        objs.append(ob.Sphere(tuple(c), r.uniform(0.2, 1.0), ob.Lambertian((1, 1, 1))))
    for plane in ("xy", "xz", "yz"):
        for _ in range(5):
            a = np.sort(r.uniform(-5, 5, 2))
            b = np.sort(r.uniform(-5, 5, 2))
            objs.append(ob.Rect(plane, a[0], a[1], b[0], b[1], r.uniform(-5, 5),
                                ob.Lambertian((1, 1, 1))))
    scene = build_scene(objs)

    n_rays = 256
    ro = r.uniform(-8, 8, (n_rays, 3)).astype(np.float32)
    rd = r.normal(size=(n_rays, 3)).astype(np.float32)
    rec = _hit(scene, ro, rd)

    # numpy oracle
    t_best = np.full(n_rays, np.inf)
    t_min = scene.t_min
    for oi, o in enumerate(objs):
        if isinstance(o, ob.Sphere):
            oc = ro - np.array(o.center, np.float32)
            a = np.sum(rd * rd, -1)
            bq = np.sum(oc * rd, -1)
            cq = np.sum(oc * oc, -1) - o.radius**2
            disc = bq * bq - a * cq
            sd = np.sqrt(np.maximum(disc, 0))
            for tt in ((-bq - sd) / a, (-bq + sd) / a):
                ok = (disc > 0) & (tt > t_min) & (tt < t_best)
                t_best = np.where(ok, tt, t_best)
        else:
            axes = {"xy": (0, 1, 2), "xz": (0, 2, 1), "yz": (1, 2, 0)}[o.plane]
            ia, ja, ka = axes
            tt = (np.float32(o.k) - ro[:, ka]) / rd[:, ka]
            i = ro[:, ia] + tt * rd[:, ia]
            j = ro[:, ja] + tt * rd[:, ja]
            ok = (
                (tt > t_min) & (i >= o.i0) & (i <= o.i1) & (j >= o.j0) & (j <= o.j1)
                & (tt < t_best)
            )
            t_best = np.where(ok, tt, t_best)

    got_t = np.where(np.asarray(rec.hit), np.asarray(rec.t), np.inf)
    hits = np.isfinite(t_best)
    assert hits.sum() > 50  # the scene actually gets hit
    np.testing.assert_array_equal(np.isfinite(got_t), hits)
    np.testing.assert_allclose(got_t[hits], t_best[hits], rtol=2e-4)


def test_medium_transmittance_statistics():
    """Rays through a density-rho slab of thickness L pass with prob exp(-rho L)."""
    rho, L = 0.5, 4.0
    med = ob.ConstantMedium(rho, (1, 1, 1), ob.Box((-10, -10, 0), (10, 10, L), ob.Lambertian((1, 1, 1))))
    scene = build_scene([med])
    n = 20000
    ro = np.tile(np.array([[0.0, 0.0, -5.0]], np.float32), (n, 1))
    rd = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    rec = _hit(scene, ro, rd)
    p_hit = float(np.asarray(rec.hit).mean())
    expected = 1.0 - np.exp(-rho * L)
    assert abs(p_hit - expected) < 0.01
    # hit records: normal (1,0,0), front face, uv 0 (src/Lib.hs:1073-1079)
    h = np.asarray(rec.hit)
    nm = np.asarray(rec.normal)[h]
    np.testing.assert_allclose(nm, np.broadcast_to([1.0, 0.0, 0.0], nm.shape), atol=1e-6)
    assert np.all(np.asarray(rec.front)[h])


def test_medium_sphere_from_inside():
    """Origin inside the boundary: free flight starts at the origin."""
    med = ob.ConstantMedium(10.0, (1, 1, 1), ob.Sphere((0, 0, 0), 5.0, ob.Lambertian((1, 1, 1))))
    scene = build_scene([med])
    n = 4000
    ro = np.zeros((n, 3), np.float32)
    rd = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    rec = _hit(scene, ro, rd)
    # density 10 over length 5: essentially always hits, mean t ~ 1/10
    assert float(np.asarray(rec.hit).mean()) > 0.99
    t = np.asarray(rec.t)[np.asarray(rec.hit)]
    np.testing.assert_allclose(t.mean(), 0.1, atol=0.01)


# ---------------------------------------------------------------------------
# solid box prim (axis-aligned cuboids collapse to one slab test)
# ---------------------------------------------------------------------------
def test_solid_box_equivalent_to_six_rects():
    """A PRIM_BOX must reproduce the exploded 6-rect cuboid exactly: same t,
    same (pre-flip +axis) normal convention, same front flag, same face UV
    (reference cuboid, src/Lib.hs:594-605, 989-1028)."""
    mat = ob.Dielectric(1.5)  # front flag drives the refraction ratio
    pmin, pmax = (-1.0, -2.0, -3.0), (2.0, 1.0, 0.5)
    box_scene = build_scene([ob.Box(pmin, pmax, mat)])
    assert box_scene.n_box == 1 and box_scene.has_solid_box
    from tpu_ray.models.compile import _box_rects

    rect_scene = build_scene(_box_rects(ob.Box(pmin, pmax, mat)))
    assert rect_scene.n_prims == 6

    r = np.random.default_rng(11)
    n = 512
    ro = r.uniform(-6, 6, (n, 3)).astype(np.float32)
    rd = r.normal(size=(n, 3)).astype(np.float32)
    # make a batch of rays START INSIDE the box (exit-face hits)
    ro[:64] = r.uniform([-0.9, -1.9, -2.9], [1.9, 0.9, 0.4],
                        (64, 3)).astype(np.float32)
    ra = _hit(box_scene, ro, rd)
    rb = _hit(rect_scene, ro, rd)
    np.testing.assert_array_equal(np.asarray(ra.hit), np.asarray(rb.hit))
    h = np.asarray(ra.hit)
    assert h.sum() > 80 and np.asarray(ra.hit)[:64].all()
    np.testing.assert_allclose(np.asarray(ra.t)[h], np.asarray(rb.t)[h],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ra.front)[h],
                                  np.asarray(rb.front)[h])
    np.testing.assert_allclose(np.asarray(ra.normal)[h],
                               np.asarray(rb.normal)[h], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ra.u)[h], np.asarray(rb.u)[h],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ra.v)[h], np.asarray(rb.v)[h],
                               atol=1e-4)


def test_solid_box_full_render_matches_rects():
    """End-to-end estimator parity: a glass box scene rendered with the box
    prim vs its 6-rect explosion (same seed) differs only at fp noise."""
    mat = ob.Dielectric(1.5)
    floor = ob.Rect("xz", -50, 50, -50, 50, -2.0, ob.Lambertian((0.6, 0.5, 0.4)))
    box_scene = build_scene([ob.Box((-1, -2, -1), (1, 0, 1), mat), floor],
                            background=(0.7, 0.8, 0.9))
    from tpu_ray.models.compile import _box_rects

    rect_scene = build_scene(
        list(_box_rects(ob.Box((-1, -2, -1), (1, 0, 1), mat))) + [floor],
        background=(0.7, 0.8, 0.9),
    )
    from tpu_ray.core.camera import Camera
    from tpu_ray.renderer import render

    cam = Camera.create((4, 2, 6), (0, -1, 0), (0, 1, 0), 40.0, 1.0, 0.0, 7.0)
    img_a = render(box_scene, cam, 24, 24, spp=8, max_depth=8, seed=9)
    img_b = render(rect_scene, cam, 24, 24, spp=8, max_depth=8, seed=9)
    # the same per-lane draws are used in both scenes, but slab-vs-plane fp
    # differences occasionally flip a Schlick coin at grazing incidence and
    # diverge that whole path - so identical-to-fp for the vast majority of
    # pixels, and statistically identical overall
    close = np.isclose(img_a, img_b, rtol=2e-3, atol=2e-3)
    assert close.mean() > 0.95
    np.testing.assert_allclose(img_a.mean(), img_b.mean(), rtol=0.02)


def test_mxu_sphere_sweep_matches_classic():
    """Engine "mxu" (chunk-centered MXU matmul quadratic) agrees with the
    classic per-pair sweep: same winners for ~all rays, t within fp noise.

    book1-final is the target workload: 485 static spheres including the
    1000-radius ground (the conditioning case that sank round 1's
    uncentered expanded quadratic)."""
    import jax

    from tpu_ray.models.scenes import SCENES
    from tpu_ray.ops.intersect import intersect_ti

    spec = SCENES["book1-final"]
    scene = spec.build(seed=1024, earth=None)
    cam = spec.camera(160, 120)
    key = jax.random.PRNGKey(3)
    n = 4096
    xs = jnp.tile(jnp.linspace(0.02, 0.98, 64), n // 64)
    ys = jnp.repeat(jnp.linspace(0.02, 0.98, n // 64), 64)
    ro, rd, rt = cam.get_rays(key, xs, ys)
    t_a, i_a = intersect_ti(scene, ro, rd, rt, key, engine="xla")
    t_b, i_b = intersect_ti(scene, ro, rd, rt, key, engine="mxu")
    t_a, i_a = np.asarray(t_a), np.asarray(i_a)
    t_b, i_b = np.asarray(t_b), np.asarray(i_b)
    np.testing.assert_array_equal(np.isfinite(t_a), np.isfinite(t_b))
    hit = np.isfinite(t_a)
    # winners may flip only where two candidates tie at fp scale
    same = (i_a == i_b) | ~hit
    assert same.mean() > 0.999, f"{(~same).sum()} winner flips"
    # grazing hits (disc ~ 0) amplify the ~1e-7 operand rounding to ~1e-4
    np.testing.assert_allclose(t_b[hit & same], t_a[hit & same],
                               rtol=2e-4, atol=1e-3)


def test_mxu_render_statistically_identical():
    """A small book1 render with engine="mxu" matches the classic engine."""
    from tpu_ray.models.scenes import SCENES
    from tpu_ray.renderer import render

    spec = SCENES["book1-final"]
    scene = spec.build(seed=1024, earth=None)
    cam = spec.camera(32, 24)
    a = np.asarray(render(scene, cam, 32, 24, spp=8, max_depth=8, seed=5,
                          engine="xla"))
    b = np.asarray(render(scene, cam, 32, 24, spp=8, max_depth=8, seed=5,
                          engine="mxu"))
    close = np.isclose(a, b, rtol=2e-3, atol=2e-3)
    assert close.mean() > 0.95
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.02)
