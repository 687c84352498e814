"""BVH build + traversal: exact agreement with the brute-force intersector."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ray.models import objects as ob
from tpu_ray.models.compile import build_scene
from tpu_ray.models.scenes import SCENES
from tpu_ray.ops.bvh import build_bvh, intersect_scene_bvh, prim_aabbs
from tpu_ray.ops.intersect import intersect_scene
from tpu_ray.renderer import render

KEY = jax.random.PRNGKey(0)


def _random_scene(seed=0, n_spheres=60, media=False):
    r = np.random.default_rng(seed)
    objs = []
    for _ in range(n_spheres):
        objs.append(ob.Sphere(tuple(r.uniform(-8, 8, 3)), r.uniform(0.2, 1.2),
                              ob.Lambertian((1, 1, 1))))
    for plane in ("xy", "xz", "yz"):
        for _ in range(6):
            a = np.sort(r.uniform(-8, 8, 2)); b = np.sort(r.uniform(-8, 8, 2))
            objs.append(ob.Rect(plane, a[0], a[1], b[0], b[1], r.uniform(-8, 8),
                                ob.Lambertian((1, 1, 1))))
    objs.append(ob.Translate((1, 2, 3), ob.Rotate("y", 30,
                ob.Box((-1, -1, -1), (1, 1, 1), ob.Metal((1, 1, 1), 0.1)))))
    objs.append(ob.MovingSphere((0, 0, 0), (3, 0, 0), 0, 1, 0.5,
                                ob.Lambertian((1, 1, 1))))
    if media:
        objs.append(ob.ConstantMedium(0.3, (1, 1, 1),
                    ob.Sphere((0, 0, 5), 2.0, ob.Lambertian((1, 1, 1)))))
        objs.append(ob.ConstantMedium(0.2, (1, 1, 1), ob.Translate((2, 0, 0),
                    ob.Rotate("y", 15, ob.Box((0, 0, 0), (2, 2, 2), ob.Lambertian((1, 1, 1)))))))
    return build_scene(objs)


def _rays(seed, n=512):
    r = np.random.default_rng(seed)
    ro = jnp.asarray(r.uniform(-10, 10, (n, 3)), jnp.float32)
    rd = jnp.asarray(r.normal(size=(n, 3)), jnp.float32)
    rt = jnp.asarray(r.random(n), jnp.float32)
    return ro, rd, rt


def test_prim_aabbs_contain_hits():
    scene = _random_scene(1, media=False)
    boxes = prim_aabbs(scene)
    ro, rd, rt = _rays(2)
    rec = intersect_scene(scene, ro, rd, rt, KEY)
    h = np.asarray(rec.hit)
    p = np.asarray(rec.point)[h]
    pid = np.asarray(rec.prim)[h]
    lo, hi = boxes[pid, 0], boxes[pid, 1]
    assert np.all(p >= lo - 1e-3) and np.all(p <= hi + 1e-3)


@pytest.mark.parametrize("media", [False, True])
def test_bvh_matches_brute_force(media):
    scene = _random_scene(3, media=media)
    bvh = build_bvh(scene)
    ro, rd, rt = _rays(4)
    rec_a = intersect_scene(scene, ro, rd, rt, KEY)
    rec_b = intersect_scene_bvh(scene, bvh, ro, rd, rt, KEY)
    # medium free-flight uniforms are keyed identically (per ray, medium),
    # so even stochastic hits agree exactly
    np.testing.assert_array_equal(np.asarray(rec_a.hit), np.asarray(rec_b.hit))
    h = np.asarray(rec_a.hit)
    np.testing.assert_allclose(
        np.asarray(rec_a.t)[h], np.asarray(rec_b.t)[h], rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(rec_a.prim)[h], np.asarray(rec_b.prim)[h]
    )


def test_bvh_render_matches_brute_force():
    spec = SCENES["cornell"]
    scene = spec.build()
    cam = spec.camera(12, 12)
    img_a = render(scene, cam, 12, 12, spp=8, max_depth=6, seed=9)
    img_b = render(scene, cam, 12, 12, spp=8, max_depth=6, seed=9, bvh=True)
    np.testing.assert_allclose(img_a, img_b, rtol=1e-4, atol=1e-6)


def test_chunk_culling_exact_on_big_scene():
    """>512 prims exercises the scanned sweep WITH chunk-AABB culling
    (ops/intersect.py); it must agree exactly with BVH traversal, an
    independent implementation that never culls chunks."""
    r = np.random.default_rng(21)
    objs = [
        ob.Sphere(tuple(r.uniform(-30, 30, 3)), r.uniform(0.2, 1.0),
                  ob.Lambertian((1, 1, 1)))
        for _ in range(600)
    ]
    for plane in ("xy", "xz", "yz"):
        for _ in range(20):
            a = np.sort(r.uniform(-30, 30, 2)); b = np.sort(r.uniform(-30, 30, 2))
            objs.append(ob.Rect(plane, a[0], a[1], b[0], b[1],
                                r.uniform(-30, 30), ob.Lambertian((1, 1, 1))))
    scene = build_scene(objs)
    assert scene.n_prims > 512
    bvh = build_bvh(scene)
    ro, rd, rt = _rays(22, 1024)
    ro = ro * 3.0  # origins inside and outside the scene bounds
    rec_a = intersect_scene(scene, ro, rd, rt, KEY)
    rec_b = intersect_scene_bvh(scene, bvh, ro, rd, rt, KEY)
    np.testing.assert_array_equal(np.asarray(rec_a.hit), np.asarray(rec_b.hit))
    h = np.asarray(rec_a.hit)
    np.testing.assert_array_equal(
        np.asarray(rec_a.prim)[h], np.asarray(rec_b.prim)[h]
    )
    # grazing sphere hits (disc ~ 0) amplify f32 fma-contraction differences
    # between the two compiled programs; hit/prim equality above is the
    # culling-exactness assertion, t only needs fp-level agreement
    np.testing.assert_allclose(
        np.asarray(rec_a.t)[h], np.asarray(rec_b.t)[h], rtol=5e-3
    )


def test_bvh_book1_scene():
    scene = SCENES["book1-final"].build(seed=7)
    bvh = build_bvh(scene)
    assert bvh.order.shape[0] == scene.n_prims
    # every prim appears exactly once in the leaf ordering
    np.testing.assert_array_equal(
        np.sort(np.asarray(bvh.order)), np.arange(scene.n_prims)
    )
    ro, rd, rt = _rays(8, 256)
    rec_a = intersect_scene(scene, ro, rd, rt, KEY)
    rec_b = intersect_scene_bvh(scene, bvh, ro, rd, rt, KEY)
    np.testing.assert_array_equal(np.asarray(rec_a.hit), np.asarray(rec_b.hit))
    h = np.asarray(rec_a.hit)
    np.testing.assert_array_equal(np.asarray(rec_a.prim)[h], np.asarray(rec_b.prim)[h])
