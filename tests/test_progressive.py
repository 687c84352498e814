"""Progressive output (reference parity: app/Main.hs:62 streams each
finished PPM row to stdout as it is computed, so a crashed run keeps
everything rendered so far in the output file).

Our equivalents: ``render(on_partial=...)`` surfaces the current estimate
after every wave/chunk/band, and ``film.ProgressiveOutput`` turns that
into (a) PPM rows streamed the moment they are final or (b) an atomically
rewritten image file.  The core invariant: rows reported final are
BIT-IDENTICAL to the finished render's rows, so the streamed PPM equals
the plain one byte-for-byte.
"""
import subprocess
import sys
from io import StringIO

import numpy as np

from tpu_ray.core import film
from tpu_ray.core.camera import Camera
from tpu_ray.models import objects as ob
from tpu_ray.models.compile import build_scene
from tpu_ray.renderer import render


def _scene():
    objs = [ob.Sphere((i - 300, 0, -5), 0.45, ob.Lambertian((0.5, 0.5, 0.5)))
            for i in range(600)]  # >512 prims -> band path qualifies
    scene = build_scene(objs, background=(0.3, 0.5, 0.7))
    cam = Camera.create((0, 0, 5), (0, 0, 0), (0, 1, 0), 60.0, 1.0, 0.0, 5.0)
    return scene, cam


def test_on_partial_wave_estimates_converge_to_final():
    scene, cam = _scene()
    calls = []
    img = render(scene, cam, 8, 6, spp=4, max_depth=3, seed=2,
                 rays_per_wave=8 * 6, samples_per_wave=1, mode="pool",
                 on_partial=lambda im, rf: calls.append((im.copy(), rf)))
    assert len(calls) == 3  # n_waves - 1 (the final wave is the return)
    for im, rf in calls:
        assert im.shape == (6, 8, 3)
        assert rf == 0  # unbanded: no row is final until the render is
        assert np.isfinite(im).all()
    # each partial is a valid mean estimate of the same integrand
    assert abs(calls[-1][0].mean() - img.mean()) < 0.2


def test_on_partial_banded_rows_final_are_exact(monkeypatch):
    """Rows reported final must equal the finished image's rows exactly -
    that is what licenses streaming them to an output file."""
    import tpu_ray.renderer as R

    scene, cam = _scene()
    kw = dict(spp=2, max_depth=3, seed=2, rays_per_wave=16 * 12,
              samples_per_wave=1, mode="pool")
    final = render(scene, cam, 16, 12, **kw)
    monkeypatch.setattr(R, "XLA_BIG_SCENE_LANES", 64)  # 4-row bands
    calls = []
    banded = render(scene, cam, 16, 12, **kw,
                    on_partial=lambda im, rf: calls.append((im.copy(), rf)))
    np.testing.assert_array_equal(banded, final)
    rfs = [rf for _, rf in calls]
    assert rfs == sorted(rfs)  # rows finalize monotonically, top-down
    assert rfs[-1] == 12  # the last band completion reports a full frame
    assert 0 < rfs[0] or 0 in rfs  # in-band waves report the band above
    for im, rf in calls:
        np.testing.assert_array_equal(im[:rf], final[:rf])


def test_progressive_stream_equals_plain_ppm(monkeypatch):
    """The streamed PPM (banded, rows emitted as they finalize) is
    byte-identical to film.write_image's output."""
    import tpu_ray.renderer as R

    scene, cam = _scene()
    kw = dict(spp=2, max_depth=3, seed=2, rays_per_wave=16 * 12,
              samples_per_wave=1, mode="pool")
    expected = film.ppm_string(film.to_rgb8(render(scene, cam, 16, 12, **kw)))
    monkeypatch.setattr(R, "XLA_BIG_SCENE_LANES", 64)
    po = film.ProgressiveOutput("-", 16, 12, fp=StringIO())
    img = render(scene, cam, 16, 12, **kw, on_partial=po.update)
    mid_stream = po.fp.getvalue()
    po.finish(img)
    assert po.fp.getvalue() == expected
    # ... and most rows were already on the wire before finish()
    assert po.rows_emitted == 12
    assert mid_stream == expected  # last band completion streamed the rest


def test_progressive_file_rewrites_are_whole_images(tmp_path):
    scene, cam = _scene()
    out = tmp_path / "p.png"
    po = film.ProgressiveOutput(str(out), 8, 6)
    seen = []

    def spy(im, rf):
        po.update(im, rf)
        from PIL import Image

        seen.append(np.asarray(Image.open(out)).shape)

    img = render(scene, cam, 8, 6, spp=4, max_depth=3, seed=2,
                 rays_per_wave=8 * 6, samples_per_wave=1, mode="pool",
                 on_partial=spy)
    po.finish(img)
    assert seen and all(s == (6, 8, 3) for s in seen)  # never a torn file
    from PIL import Image

    np.testing.assert_array_equal(np.asarray(Image.open(out)),
                                  film.to_rgb8(img))
    assert not out.with_name("p.png.tmp").exists()


def test_cli_progressive_stdout_byte_identical(tmp_path):
    base = [sys.executable, "-m", "tpu_ray", "--platform", "cpu",
            "--scene", "two-spheres", "--width", "12", "--height", "8",
            "--spp", "2", "--max-depth", "3"]
    plain = subprocess.run(base, capture_output=True, text=True, timeout=600)
    prog = subprocess.run(base + ["--progressive"], capture_output=True,
                          text=True, timeout=600)
    assert plain.returncode == 0 and prog.returncode == 0, (
        plain.stderr[-500:], prog.stderr[-500:])
    assert prog.stdout == plain.stdout


def test_progressive_file_float_formats_keep_linear(tmp_path):
    """--progressive with a .pfm/.hdr destination must write the LINEAR
    formats, not PNG bytes under a float extension (ADVICE r4)."""
    img = np.array([[[0.0, 0.5, 2.25], [1.0, 0.125, 0.0]],
                    [[3.5, 0.75, 0.25], [0.0, 0.0, 9.0]]], np.float32)
    out = tmp_path / "p.pfm"
    po = film.ProgressiveOutput(str(out), 2, 2)
    po.update(img * 0.5, 0)   # partial estimate
    po.finish(img)
    raw = out.read_bytes()
    assert raw.startswith(b"PF\n")
    body = raw.split(b"\n", 3)[3]
    a = np.frombuffer(body, "<f4").reshape(2, 2, 3)[::-1]
    np.testing.assert_array_equal(a, img)  # linear, untonemapped

    out_hdr = tmp_path / "p.hdr"
    po2 = film.ProgressiveOutput(str(out_hdr), 2, 2)
    po2.finish(img)
    assert out_hdr.read_bytes().startswith(b"#?RADIANCE")
