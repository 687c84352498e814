"""Megakernel vs XLA ray-pool agreement.

The megakernel replays the pool's counter-based RNG (keyed on global slot /
sample / iteration ids, never lane position), so every lane follows the SAME
path and draws the SAME uniforms as integrator.trace_pool.  Values agree to
float-reassociation level only: XLA contracts fma differently even between
an unrolled loop and the identical ops inside lax.while_loop (measured
2.4e-7 between two pure-XLA variants), so these tests assert ulp-scale
closeness plus identical sample counts - any RNG misalignment would show up
as wholesale divergence, not 1-ulp noise.  Deep renders may flip a rare
dielectric Schlick coin at the ulp boundary, diverging a whole path; the
tests bound the fraction of such lanes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ray.integrator import trace_pool
from tpu_ray.models.scenes import SCENES
from tpu_ray.ops import megakernel
from tpu_ray.renderer import render


def _pool_args(spec, w, h):
    scene = spec.build(seed=1024, earth=None)
    cam = spec.camera(w, h)
    xs = jnp.tile(jnp.arange(w, dtype=jnp.float32) / w, h)
    ys = jnp.repeat(
        jnp.arange(h - 1, -1, -1, dtype=jnp.float32) / h, w)
    return scene, cam, xs, ys


def _assert_pool_agreement(ref, got, ref_ns, got_ns, diverged_frac=0.03):
    ref, got = np.asarray(ref), np.asarray(got)
    np.testing.assert_array_equal(np.asarray(ref_ns), np.asarray(got_ns))
    # per-lane relative agreement at fp-reassociation scale; a tiny fraction
    # of lanes may have flipped a specular coin at the ulp boundary
    err = np.abs(ref - got) / (1.0 + np.abs(ref))
    close = (err < 1e-4).all(axis=-1)
    frac = 1.0 - close.mean()
    assert frac <= diverged_frac, f"{frac:.2%} lanes diverged (max err {err.max():.2e})"
    # non-diverged lanes must agree tightly (a single coin-flipped specular
    # path legitimately moves a 192-lane mean by ~0.2%)
    np.testing.assert_allclose(ref[close], got[close], rtol=2e-4, atol=1e-4)


SUPPORTED = ["cornell", "two-spheres", "two-perlin-spheres", "simple-light",
             "cornell-smoke", "book1-final"]


@pytest.mark.parametrize("name", SUPPORTED)
def test_megakernel_matches_pool(name):
    w, h = 16, 12
    scene, cam, xs, ys = _pool_args(SCENES[name], w, h)
    assert megakernel.supported(scene)
    key = jax.random.PRNGKey(7)
    n_samples, depth = 4, 8
    sample0 = jnp.uint32(0)
    ref, ref_ns = trace_pool(
        scene, cam, xs, ys, (1.0 / w, 1.0 / h), key, n_samples, sample0,
        depth, engine="xla")
    got, got_ns = megakernel.trace_pool_mega(
        scene, cam, xs, ys, (1.0 / w, 1.0 / h), key, n_samples, sample0,
        depth)
    _assert_pool_agreement(ref, got, ref_ns, got_ns)


def test_megakernel_nonzero_sample0_and_salt():
    w, h = 16, 12
    scene, cam, xs, ys = _pool_args(SCENES["cornell"], w, h)
    key = jax.random.PRNGKey(3)
    kwargs = dict(n_samples=2, sample0=jnp.uint32(6), max_depth=6,
                  cam_salt=jnp.uint32(0xABCD1234))
    ref, ref_ns = trace_pool(scene, cam, xs, ys, (1.0 / w, 1.0 / h), key,
                             engine="xla", **kwargs)
    got, got_ns = megakernel.trace_pool_mega(
        scene, cam, xs, ys, (1.0 / w, 1.0 / h), key, **kwargs)
    _assert_pool_agreement(ref, got, ref_ns, got_ns)


def test_megakernel_unsupported_scenes_detected():
    img = np.zeros((4, 4, 3), np.uint8)
    earth = SCENES["earth"].build(seed=1024, earth=img)  # image texture
    assert not megakernel.supported(earth)
    nw = SCENES["next-week-final"].build(seed=1024, earth=None)  # 1409 prims
    assert not megakernel.supported(nw)


def test_render_engine_mega_equals_xla():
    """The renderer's engine='mega' path matches engine='xla' at the image
    level, including wave splits and nonzero sample0."""
    spec = SCENES["cornell"]
    scene = spec.build(seed=1024)
    cam = spec.camera(16, 12)
    a = np.asarray(render(scene, cam, 16, 12, spp=8, max_depth=6, seed=11,
                          samples_per_wave=2, engine="xla"))
    b = np.asarray(render(scene, cam, 16, 12, spp=8, max_depth=6, seed=11,
                          samples_per_wave=2, engine="mega"))
    err = np.abs(a - b) / (1.0 + np.abs(a))
    close = (err < 1e-4).all(axis=-1)
    assert 1.0 - close.mean() <= 0.01
    np.testing.assert_allclose(a[close], b[close], rtol=2e-4, atol=1e-4)


def test_megakernel_composes_with_mesh():
    """engine='mega' under an 8-device mesh matches the single-device mega
    render (auto picks mega for light-MIS scenes on TPU, where users also
    shard - the kernel must work inside shard_map)."""
    from tpu_ray.parallel.mesh import make_mesh

    spec = SCENES["cornell"]
    scene = spec.build(seed=1024)
    cam = spec.camera(16, 16)
    kwargs = dict(max_depth=6, seed=5, engine="mega")
    a = np.asarray(render(scene, cam, 16, 16, spp=16, **kwargs))
    b = np.asarray(render(scene, cam, 16, 16, spp=16, mesh=make_mesh(8),
                          **kwargs))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
