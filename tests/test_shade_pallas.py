"""Fused Pallas shading (ops/shade_pallas.py) vs the XLA record+scatter.

Runs in interpret mode on CPU (conftest pins JAX_PLATFORMS=cpu), where the
kernel executes the same jnp ops as the XLA path - agreement should be
essentially exact; discrete decisions (hit, front, scattered, material)
must match bit-for-bit.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_ray.models.scenes import SCENES
from tpu_ray.ops import shade_pallas
from tpu_ray.ops.intersect import _hit_record, intersect_ti
from tpu_ray.ops.scatter import scatter

SCENE_NAMES = ["book1-final", "two-spheres", "cornell", "simple-light",
               "cornell-smoke", "next-week-final", "random-moving"]


def _rays(spec, n, w=64, h=48):
    cam = spec.camera(w, h)
    key = jax.random.PRNGKey(5)
    xs = jnp.tile(jnp.linspace(0.05, 0.95, 64), n // 64)
    ys = jnp.repeat(jnp.linspace(0.05, 0.95, n // 64), 64)
    return cam.get_rays(key, xs, ys)


def _earth_scene():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 64, 3), np.uint8)
    return SCENES["earth"].build(seed=1024, earth=img)


@pytest.mark.parametrize("name", SCENE_NAMES + ["earth"])
def test_fused_shading_matches_xla(name):
    if name == "earth":
        scene = _earth_scene()
        spec = SCENES["earth"]
    else:
        spec = SCENES[name]
        scene = spec.build(seed=1024, earth=None)
    assert shade_pallas.supported(scene)
    R = 1024
    ro, rd, rt = _rays(spec, R)
    key = jax.random.PRNGKey(11)
    ids = jnp.arange(R, dtype=jnp.uint32)
    bt, bi = intersect_ti(scene, ro, rd, rt, jax.random.fold_in(key, 0),
                          lane_ids=ids)
    rec_ref = _hit_record(scene, ro, rd, rt, bt, bi)
    sc_ref = scatter(scene, jax.random.fold_in(key, 1), rd, rec_ref, ids)

    rec, sc = shade_pallas.hit_scatter_pallas(
        scene, ro, rd, rt, bt, bi, jax.random.fold_in(key, 1), ids)

    np.testing.assert_array_equal(np.asarray(rec.hit), np.asarray(rec_ref.hit))
    np.testing.assert_array_equal(np.asarray(rec.front),
                                  np.asarray(rec_ref.front))
    np.testing.assert_array_equal(np.asarray(rec.mat), np.asarray(rec_ref.mat))
    np.testing.assert_array_equal(np.asarray(sc.scattered),
                                  np.asarray(sc_ref.scattered))
    # interpret mode executes the same formulas but XLA may fuse/associate
    # slightly differently than the (R, 3) path; discrete decisions above
    # are exact, floats agree to reassociation level
    tol = dict(rtol=2e-4, atol=1e-5)
    # points live at scene scale (cornell ~555): abs tolerance scaled to it
    np.testing.assert_allclose(np.asarray(rec.point),
                               np.asarray(rec_ref.point), rtol=2e-4,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(rec.normal),
                               np.asarray(rec_ref.normal), **tol)
    if scene.has_image:
        np.testing.assert_allclose(np.asarray(rec.u), np.asarray(rec_ref.u),
                                   **tol)
        np.testing.assert_allclose(np.asarray(rec.v), np.asarray(rec_ref.v),
                                   **tol)
    # the light-MIS direction chains ONB + cone trig; a handful of lanes
    # reach ~5e-4 reassociation drift (cf. test_megakernel's allowance)
    np.testing.assert_allclose(np.asarray(sc.direction),
                               np.asarray(sc_ref.direction), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(sc.weight),
                               np.asarray(sc_ref.weight), **tol)
    np.testing.assert_allclose(np.asarray(sc.emitted),
                               np.asarray(sc_ref.emitted), **tol)


def test_render_fused_equals_xla_shading():
    """Full pool render with the fused kernel (interpreted) matches the XLA
    shading path at reassociation tolerance - same draws, same paths."""
    from tpu_ray import integrator
    from tpu_ray.renderer import render

    spec = SCENES["cornell"]
    scene = spec.build(seed=1024)
    cam = spec.camera(16, 12)
    kwargs = dict(spp=8, max_depth=6, seed=11, engine="xla")
    old = integrator.FUSED_SHADING
    try:
        integrator.FUSED_SHADING = "off"
        a = np.asarray(render(scene, cam, 16, 12, **kwargs))
        integrator.FUSED_SHADING = "on"
        b = np.asarray(render(scene, cam, 16, 12, **kwargs))
    finally:
        integrator.FUSED_SHADING = old
    err = np.abs(a - b) / (1.0 + np.abs(a))
    close = (err < 1e-4).all(axis=-1)
    assert 1.0 - close.mean() <= 0.02, \
        f"{(1 - close.mean()):.2%} pixels diverged (max {err.max():.2e})"
    np.testing.assert_allclose(a[close], b[close], rtol=2e-4, atol=1e-4)


def test_render_fused_image_scene():
    """The full pool-step kernel's deferred image albedo (uv + atlas fetch
    outside the kernel, throughput fix-up) matches XLA shading end-to-end."""
    from tpu_ray import integrator
    from tpu_ray.renderer import render

    scene = _earth_scene()
    cam = SCENES["earth"].camera(24, 16)
    kwargs = dict(spp=8, max_depth=6, seed=2, engine="xla")
    old = integrator.FUSED_SHADING
    try:
        integrator.FUSED_SHADING = "off"
        a = np.asarray(render(scene, cam, 24, 16, **kwargs))
        integrator.FUSED_SHADING = "on"
        b = np.asarray(render(scene, cam, 24, 16, **kwargs))
    finally:
        integrator.FUSED_SHADING = old
    err = np.abs(a - b) / (1.0 + np.abs(a))
    close = (err < 1e-4).all(axis=-1)
    assert 1.0 - close.mean() <= 0.02, \
        f"{(1 - close.mean()):.2%} pixels diverged (max {err.max():.2e})"
    np.testing.assert_allclose(a[close], b[close], rtol=2e-4, atol=1e-4)


def test_fused_shading_composes_with_mesh():
    """Fused shading inside shard_map (8 virtual devices) == single device."""
    from tpu_ray import integrator
    from tpu_ray.parallel.mesh import make_mesh
    from tpu_ray.renderer import render

    spec = SCENES["cornell"]
    scene = spec.build(seed=1024)
    cam = spec.camera(16, 12)
    kwargs = dict(spp=8, max_depth=6, seed=3, engine="xla")
    old = integrator.FUSED_SHADING
    try:
        integrator.FUSED_SHADING = "on"
        a = np.asarray(render(scene, cam, 16, 12, **kwargs))
        b = np.asarray(render(scene, cam, 16, 12, mesh=make_mesh(8),
                              **kwargs))
    finally:
        integrator.FUSED_SHADING = old
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_unsupported_scenes_detected():
    strict = SCENES["cornell"].build(seed=1024).replace(strict=True)
    assert not shade_pallas.supported(strict)
