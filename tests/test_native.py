"""Native C++ components vs their Python fallbacks."""
import numpy as np
import pytest

from tpu_ray import native
from tpu_ray.core import film


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_ppm_matches_python():
    rgb = np.random.default_rng(0).integers(0, 256, (17, 23, 3), dtype=np.uint8)
    header = "P3\n23 17\n255\n"
    body = native.ppm_body(rgb)
    py_body = "\n".join(
        " ".join(map(str, row)) for row in rgb.reshape(17, 23 * 3)
    ) + "\n"
    assert header + body == header + py_body
    # film.ppm_string picks the native path transparently
    assert film.ppm_string(rgb) == header + py_body


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_bvh_build_valid():
    import jax

    from tpu_ray.models.scenes import SCENES
    from tpu_ray.ops.bvh import build_bvh, intersect_scene_bvh, prim_aabbs
    from tpu_ray.ops.intersect import intersect_scene
    import jax.numpy as jnp

    scene = SCENES["book1-final"].build(seed=11)
    bvh_nat = build_bvh(scene, use_native=True)
    bvh_py = build_bvh(scene, use_native=False)
    # both orderings cover every prim exactly once
    for b in (bvh_nat, bvh_py):
        np.testing.assert_array_equal(
            np.sort(np.asarray(b.order)), np.arange(scene.n_prims)
        )
    # and traversal through the native tree agrees with brute force
    r = np.random.default_rng(3)
    n = 256
    ro = jnp.asarray(r.uniform(-12, 12, (n, 3)), np.float32)
    rd = jnp.asarray(r.normal(size=(n, 3)), np.float32)
    rt = jnp.zeros(n)
    key = jax.random.PRNGKey(0)
    ra = intersect_scene(scene, ro, rd, rt, key)
    rb = intersect_scene_bvh(scene, bvh_nat, ro, rd, rt, key)
    np.testing.assert_array_equal(np.asarray(ra.hit), np.asarray(rb.hit))
    h = np.asarray(ra.hit)
    np.testing.assert_array_equal(np.asarray(ra.prim)[h], np.asarray(rb.prim)[h])


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_bvh_large_scale():
    """100k random boxes build quickly and produce a complete ordering."""
    from tpu_ray.native import bvh_build_native

    r = np.random.default_rng(0)
    lo = r.uniform(-100, 100, (100_000, 3)).astype(np.float32)
    boxes = np.stack([lo, lo + r.uniform(0.1, 2.0, (100_000, 3)).astype(np.float32)], 1)
    out = bvh_build_native(boxes, leaf_size=4)
    assert out is not None
    nmin, nmax, cl, cr, first, count, order = out
    np.testing.assert_array_equal(np.sort(order), np.arange(100_000))
    # root box bounds everything
    np.testing.assert_allclose(nmin[0], boxes[:, 0].min(0), rtol=1e-6)
    np.testing.assert_allclose(nmax[0], boxes[:, 1].max(0), rtol=1e-6)
