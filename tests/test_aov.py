"""First-hit AOV passes (tpu_ray/aov.py): albedo, normal, depth, coverage.

A framework extension with no reference analogue (the reference's only
output is the beauty PPM, app/Main.hs:59-63), so these tests pin the
geometry directly: a unit sphere dead ahead of a pinhole camera has a
known albedo, normal, and hit distance at the image center, and known
misses at the corners.
"""
import subprocess
import sys

import jax.numpy as jnp
import numpy as np

from tpu_ray.aov import AOV_NAMES, aov_images, render_aovs
from tpu_ray.core.camera import Camera
from tpu_ray.models import objects as ob
from tpu_ray.models.compile import build_scene

BG = (0.1, 0.2, 0.7)


def _sphere_scene():
    world = [ob.Sphere((0.0, 0.0, -5.0), 1.0,
                       ob.Lambertian((0.8, 0.2, 0.2)))]
    return build_scene(world, background=BG)


def _camera(aperture=0.0):
    return Camera.create((0, 0, 0), (0, 0, -1), (0, 1, 0), 40.0, 1.0,
                         aperture, 5.0)


def test_center_pixel_features():
    scene = _sphere_scene()
    aovs = render_aovs(scene, _camera(), 33, 33, spp=8, seed=3)
    cy = cx = 16
    # albedo = the lambertian texture color
    np.testing.assert_allclose(aovs["albedo"][cy, cx], (0.8, 0.2, 0.2),
                               atol=1e-5)
    # the nearest sphere point faces the camera: normal ~ +z
    np.testing.assert_allclose(aovs["normal"][cy, cx], (0, 0, 1), atol=0.05)
    # hit distance ~ |center| - r = 4 (pixel jitter keeps it near-exact)
    assert abs(float(aovs["depth"][cy, cx]) - 4.0) < 0.01
    assert float(aovs["coverage"][cy, cx]) == 1.0


def test_miss_pixels():
    scene = _sphere_scene()
    aovs = render_aovs(scene, _camera(), 33, 33, spp=4, seed=3)
    for (y, x) in [(0, 0), (0, 32), (32, 0), (32, 32)]:
        np.testing.assert_allclose(aovs["albedo"][y, x], BG, atol=1e-6)
        np.testing.assert_allclose(aovs["normal"][y, x], 0.0, atol=0)
        assert np.isinf(aovs["depth"][y, x])
        assert float(aovs["coverage"][y, x]) == 0.0


def test_deterministic_and_sampler_sensitive():
    scene = _sphere_scene()
    cam = _camera(aperture=0.2)  # lens sampling exercises the u3 dims
    a = render_aovs(scene, cam, 17, 17, spp=4, seed=9)
    b = render_aovs(scene, cam, 17, 17, spp=4, seed=9)
    for n in AOV_NAMES:
        np.testing.assert_array_equal(np.asarray(a[n]), np.asarray(b[n]))
    # the sobol camera stream is a different (valid) sample sequence
    c = render_aovs(scene, cam.replace(sampler="sobol"), 17, 17, spp=4,
                    seed=9)
    assert not np.array_equal(np.asarray(a["coverage"]),
                              np.asarray(c["coverage"]))
    # ... but features agree where the pixel is fully covered or empty
    both = (np.asarray(a["coverage"]) == 1.0) & (
        np.asarray(c["coverage"]) == 1.0)
    assert both.any()
    # loose: two 4-sample lens-disk averages of a curved surface's depth
    np.testing.assert_allclose(np.asarray(a["depth"])[both],
                               np.asarray(c["depth"])[both], atol=0.25)


def test_emissive_albedo_is_emitted_color():
    world = [
        ob.Sphere((0.0, 0.0, -5.0), 1.0, ob.DiffuseLight((4.0, 4.0, 4.0))),
    ]
    scene = build_scene(world, background=(0, 0, 0))
    aovs = render_aovs(scene, _camera(), 9, 9, spp=4, seed=0)
    np.testing.assert_allclose(aovs["albedo"][4, 4], (4, 4, 4), atol=1e-5)


def test_aov_images_encodings():
    scene = _sphere_scene()
    aovs = render_aovs(scene, _camera(), 17, 17, spp=4, seed=1)
    imgs = aov_images(aovs)
    for n in AOV_NAMES:
        img = imgs[n]
        assert img.shape == (17, 17, 3)
        assert np.isfinite(img).all()
        assert img.min() >= 0.0 and img.max() <= 1.0
    # normal encoding: background pixels map to 0.5 gray
    np.testing.assert_allclose(imgs["normal"][0, 0], 0.5, atol=1e-6)
    # depth: misses normalize to exactly 1
    np.testing.assert_allclose(imgs["depth"][0, 0], 1.0, atol=0)


def test_cli_aov(tmp_path):
    out = tmp_path / "c.png"
    r = subprocess.run(
        [sys.executable, "-m", "tpu_ray", "--platform", "cpu",
         "--scene", "cornell", "--width", "12", "--height", "12",
         "--spp", "2", "--aov", "all", "--out", str(out)],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    for n in AOV_NAMES:
        assert (tmp_path / f"c.{n}.png").exists()
    assert not out.exists()  # no beauty pass is rendered under --aov


def test_banded_aovs_bit_identical():
    """Band tiling (the beauty pass's lane-cap mechanism, VERDICT r3 #9)
    must not change a single bit: global slot ids key the sample streams."""
    scene = _sphere_scene()
    cam = _camera(aperture=0.2)
    full = render_aovs(scene, cam, 19, 13, spp=4, seed=5)
    banded = render_aovs(scene, cam, 19, 13, spp=4, seed=5,
                         band_cap=19 * 3)  # 3-row bands, 5 bands
    for n in AOV_NAMES:
        np.testing.assert_array_equal(np.asarray(full[n]),
                                      np.asarray(banded[n]))


def test_cli_aov_announces_ignored_flags(tmp_path):
    r = subprocess.run(
        [sys.executable, "-m", "tpu_ray", "--platform", "cpu",
         "--scene", "two-spheres", "--width", "8", "--height", "8",
         "--spp", "1", "--aov", "coverage", "--devices", "8", "--bvh",
         "--out", str(tmp_path / "a.png")],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    assert "[aov] ignoring --devices, --bvh" in r.stderr


def test_cli_aov_pfm_raw_floats(tmp_path):
    """--out x.pfm writes each AOV as a RAW float PFM: signed normal
    components and +inf depth misses survive losslessly (the PNG path
    quantizes and remaps both)."""
    out = tmp_path / "c.pfm"
    r = subprocess.run(
        [sys.executable, "-m", "tpu_ray", "--platform", "cpu",
         "--scene", "cornell", "--width", "12", "--height", "12",
         "--spp", "2", "--aov", "normal,depth", "--out", str(out)],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    for n in ("normal", "depth"):
        raw = (tmp_path / f"c.{n}.pfm").read_bytes()
        head, rest = raw.split(b"\n", 1)
        assert head == b"PF"
        dims, rest = rest.split(b"\n", 1)
        _scale, body = rest.split(b"\n", 1)
        a = np.frombuffer(body, "<f4").reshape(12, 12, 3)[::-1]
        if n == "normal":
            assert a.min() < 0.0  # signed components, not (n+1)/2 encoded
        else:
            assert np.isinf(a).any()  # the open ceiling keeps inf misses
            assert np.isfinite(a).any()
