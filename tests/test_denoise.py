"""AOV-guided cross-bilateral denoiser (tpu_ray/denoise.py).

A framework extension with no reference analogue (the reference outputs
the raw Monte-Carlo PPM, app/Main.hs:59-63).  The tests pin the filter's
defining contracts directly: constant images are fixed points, noise on
flat regions shrinks, feature edges do not bleed, and hit/miss
boundaries exchange no energy.
"""
import subprocess
import sys

import numpy as np

from tpu_ray.denoise import denoise


def _flat_guides(h, w, albedo=(0.5, 0.5, 0.5)):
    a = np.broadcast_to(np.asarray(albedo, np.float32), (h, w, 3)).copy()
    n = np.broadcast_to(np.asarray([0, 0, 1], np.float32), (h, w, 3)).copy()
    d = np.full((h, w), 5.0, np.float32)
    return a, n, d


def test_constant_image_is_fixed_point():
    a, n, d = _flat_guides(16, 20)
    img = np.full((16, 20, 3), 0.37, np.float32)
    out = np.asarray(denoise(img, a, n, d))
    np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-6)


def test_noise_shrinks_mean_preserved():
    rng = np.random.default_rng(5)
    a, n, d = _flat_guides(32, 32)
    clean = 0.4
    img = (clean + 0.1 * rng.standard_normal((32, 32, 3))).astype(np.float32)
    out = np.asarray(denoise(img, a, n, d))
    inner = (slice(6, -6), slice(6, -6))
    assert out[inner].std() < 0.35 * img[inner].std()  # real smoothing
    assert abs(out[inner].mean() - img[inner].mean()) < 5e-3  # energy kept


def test_albedo_edge_does_not_bleed():
    """Two flat regions with different albedo AND different radiance: the
    filter must smooth within regions but not mix across the edge."""
    rng = np.random.default_rng(7)
    h, w = 24, 40
    a, n, d = _flat_guides(h, w)
    a[:, w // 2:] = (0.9, 0.1, 0.1)  # sharp material edge
    img = np.empty((h, w, 3), np.float32)
    img[:, : w // 2] = 0.2
    img[:, w // 2:] = 0.8
    img += 0.05 * rng.standard_normal(img.shape).astype(np.float32)
    out = np.asarray(denoise(img, a, n, d))
    # columns adjacent to the edge keep their own side's level
    left = out[:, w // 2 - 1].mean()
    right = out[:, w // 2].mean()
    assert abs(left - 0.2) < 0.03
    assert abs(right - 0.8) < 0.03


def test_hit_miss_boundary_is_sealed():
    h, w = 16, 16
    a, n, d = _flat_guides(h, w)
    d[:, : w // 2] = np.inf  # left half is background (miss)
    img = np.zeros((h, w, 3), np.float32)
    img[:, w // 2:] = 1.0  # bright foreground
    out = np.asarray(denoise(img, a, n, d))
    assert out[:, : w // 2].max() == 0.0  # no foreground energy leaked
    np.testing.assert_allclose(out[:, w // 2:], 1.0, atol=1e-5)


def test_normal_edge_preserved_same_albedo():
    """A crease (normal flip) with equal albedo: radiance difference across
    it must survive (geometric edge guidance)."""
    rng = np.random.default_rng(3)
    h, w = 24, 24
    a, n, d = _flat_guides(h, w)
    n[h // 2:] = (0.0, 1.0, 0.0)  # 90-degree crease
    img = np.empty((h, w, 3), np.float32)
    img[: h // 2] = 0.25
    img[h // 2:] = 0.75
    img += 0.04 * rng.standard_normal(img.shape).astype(np.float32)
    out = np.asarray(denoise(img, a, n, d))
    assert abs(out[h // 2 - 1].mean() - 0.25) < 0.03
    assert abs(out[h // 2].mean() - 0.75) < 0.03


def test_cli_denoise(tmp_path):
    import os

    out = tmp_path / "dn.png"
    r = subprocess.run(
        [sys.executable, "-m", "tpu_ray", "--platform", "cpu",
         "--scene", "two-spheres", "--width", "24", "--height", "16",
         "--spp", "4", "--max-depth", "3", "--denoise",
         "--out", str(out)],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-800:]
    assert "denoised" in r.stderr
    assert os.path.exists(out)
