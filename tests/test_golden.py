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
CONFIGS = {
    "two-spheres": (16, 8),
    "cornell": (32, 12),
    "book1-final": (8, 8),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden(name):
    spp, depth = CONFIGS[name]
    spec = SCENES[name]
    scene = spec.build(seed=1024, earth=None)
    cam = spec.camera(32, 24)
    img = render(scene, cam, 32, 24, spp=spp, max_depth=depth, seed=1024)
    golden = np.load(os.path.join(GOLDEN_DIR, f"{name}.npy"))
    np.testing.assert_allclose(img, golden, rtol=1e-4, atol=1e-5)
