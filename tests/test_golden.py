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
