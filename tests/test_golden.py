"""Golden-image regression tests.

The reference's de-facto acceptance artifacts are committed renders compared
by eye (README images, SURVEY.md section 4).  Here: small fixed-seed CPU
renders are committed as .npy and every change must reproduce them
bit-for-bit on CPU (the render is deterministic given seed and platform).

Regenerate deliberately with:
    python -c "..."  # see tests/goldens/README
"""
import os

import numpy as np
import pytest

from tpu_ray.models.scenes import SCENES
from tpu_ray.renderer import render

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
# name -> (spp, depth, width, height)
CONFIGS = {
    "two-spheres": (16, 8, 32, 24),
    "cornell": (32, 12, 32, 24),
    "book1-final": (8, 8, 32, 24),
    "cornell-smoke": (16, 8, 24, 16),
    "simple-light": (16, 8, 24, 16),
    "two-perlin-spheres": (4, 4, 24, 16),
    "earth": (4, 4, 24, 16),
    "random-moving": (4, 4, 24, 16),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden(name):
    spp, depth, w, h = CONFIGS[name]
    spec = SCENES[name]
    scene = spec.build(seed=1024, earth=None)
    cam = spec.camera(w, h)
    img = render(scene, cam, w, h, spp=spp, max_depth=depth, seed=1024)
    golden = np.load(os.path.join(GOLDEN_DIR, f"{name}.npy"))
    np.testing.assert_allclose(img, golden, rtol=1e-4, atol=1e-5)


# Strict-quirks estimator (--estimator reference) pinned END-TO-END, not
# just per-scatter (VERDICT round 2 missing #2): the two scenes where the
# reference's actual code paths diverge from our documented fixes are
#   * book1-final - no lights, so the reference's Lambertian still mixes
#     in the Unhittable light sampler (src/Lib.hs:829-836, 702, 724);
#   * cornell-smoke - isotropic media weighted by cos/pi against the
#     medium's fixed (1,0,0) normal with a non-unit ball direction
#     (src/Lib.hs:861-878).
#   * simple-light - perlin surfaces: strict evaluates the reference's
#     TABLE noise field instead of the default hash-gradient redesign
#     (r5, VERDICT r4 missing #1; ops/textures._perlin_noise_table).
# name -> (spp, depth, width, height, deterministic strict-vs-fixed mean
# image difference measured at this config)
STRICT_CONFIGS = {
    "book1-final": (8, 8, 32, 24, 0.120133),
    "cornell-smoke": (16, 8, 24, 16, 0.019782),
    "simple-light": (16, 8, 24, 16, 0.001433),
}


@pytest.mark.parametrize("name", sorted(STRICT_CONFIGS))
def test_golden_strict(name):
    spp, depth, w, h, margin = STRICT_CONFIGS[name]
    spec = SCENES[name]
    scene = spec.build(seed=1024, earth=None).replace(strict=True)
    cam = spec.camera(w, h)
    img = np.asarray(render(scene, cam, w, h, spp=spp, max_depth=depth,
                            seed=1024))
    golden = np.load(os.path.join(GOLDEN_DIR, f"{name}-strict.npy"))
    np.testing.assert_allclose(img, golden, rtol=1e-4, atol=1e-5)
    # strict must differ from the fixed estimator by the measured
    # deterministic margin - a silently dead strict path can't pass this
    fixed = np.asarray(render(spec.build(seed=1024, earth=None), cam, w, h,
                              spp=spp, max_depth=depth, seed=1024))
    assert abs(np.abs(img - fixed).mean() - margin) < 0.25 * margin


def test_strict_is_noop_with_lights():
    """In scenes WITH lights and no media or perlin textures the strict
    quirks never bite (the reference's light-mixture path IS our fixed
    path there), so strict and fixed renders are bit-identical - pinned
    so a future strict-mode change can't silently leak into lit scenes.
    (simple-light moved to STRICT_CONFIGS in r5: its perlin surfaces now
    switch to table noise under strict.)"""
    spec = SCENES["cornell"]
    cam = spec.camera(24, 16)
    kw = dict(spp=16, max_depth=8, seed=1024)
    fixed = render(spec.build(seed=1024), cam, 24, 16, **kw)
    strict = render(spec.build(seed=1024).replace(strict=True), cam, 24, 16,
                    **kw)
    np.testing.assert_array_equal(np.asarray(fixed), np.asarray(strict))


def _perlin_sky_scene():
    """two-perlin-spheres geometry under a sky background.

    The shipped scene is faithful to the reference (black background, no
    emitter, Scenes.hs:211) so its golden is all zeros and regression-blind
    to the marble path; this variant pins actual Perlin-marble pixel values
    (VERDICT round 1, weak item 6).
    """
    from tpu_ray.models import objects as ob
    from tpu_ray.models.compile import build_scene

    per = ob.Noise(scale=1.5, seed=1024)
    world = [
        ob.Sphere((0, -1000, 0), 1000, ob.Lambertian(per)),
        ob.Sphere((0, 2, 0), 2, ob.Lambertian(per)),
    ]
    return build_scene(world, background=(0.7, 0.8, 0.9))


def test_golden_perlin_sky():
    scene = _perlin_sky_scene()
    cam = SCENES["two-perlin-spheres"].camera(24, 16)
    img = render(scene, cam, 24, 16, spp=8, max_depth=6, seed=1024)
    assert np.asarray(img).mean() > 0.05, "marble render should be lit"
    golden = np.load(os.path.join(GOLDEN_DIR, "perlin-sky.npy"))
    np.testing.assert_allclose(img, golden, rtol=1e-4, atol=1e-5)
