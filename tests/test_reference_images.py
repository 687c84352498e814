"""Quantitative fidelity against the reference's *published* renders.

The reference's acceptance artifacts are committed images (SURVEY.md
section 4).  Our committed example render of the Cornell box (produced on
TPU, examples/cornell_500x500_1000spp.png) must statistically match the
reference's cornellBox1000.png: identical estimator + identical scene means
the converged images agree and only independent Monte-Carlo noise differs.

Skipped when either image is unavailable.
"""
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OURS = os.path.join(REPO, "examples", "cornell_500x500_1000spp.png")
THEIRS = "/root/reference/cornellBox1000.png"


@pytest.mark.skipif(
    not (os.path.exists(OURS) and os.path.exists(THEIRS)),
    reason="example render or reference image unavailable",
)
def test_cornell_matches_published_reference_render():
    from PIL import Image

    ours = np.asarray(Image.open(OURS).convert("RGB"), np.float32)
    ref = np.asarray(Image.open(THEIRS).convert("RGB"), np.float32)
    assert ours.shape == ref.shape == (500, 500, 3)

    # global exposure agrees to a fraction of a grey level
    assert abs(ours.mean() - ref.mean()) < 1.0

    # averaging 10x10 boxes removes the independent MC noise of the two
    # renders; the converged images must then agree closely everywhere
    def box_mean(x, f=10):
        h, w, _ = x.shape
        return x.reshape(h // f, f, w // f, f, 3).mean(axis=(1, 3))

    diff = np.abs(box_mean(ours) - box_mean(ref))
    assert diff.mean() < 1.5          # measured: 0.34/255
    assert np.percentile(diff, 99) < 6.0  # measured: 1.61/255
