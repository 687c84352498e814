"""CLI surface: the reference's contract is PPM P3 on stdout with progress
on stderr (app/Main.hs:59-63)."""
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args, timeout=300):
    env = dict(os.environ)
    return subprocess.run(
        [sys.executable, "-m", "tpu_ray", "--platform", "cpu", *args],
        capture_output=True, text=True, cwd=REPO, timeout=timeout, env=env,
    )


def test_cli_ppm_stdout():
    r = _run("--scene", "two-spheres", "--width", "12", "--height", "8",
             "--spp", "2", "--max-depth", "3")
    assert r.returncode == 0, r.stderr[-500:]
    words = r.stdout.split()
    assert words[0] == "P3" and words[1] == "12" and words[2] == "8" and words[3] == "255"
    vals = np.array(words[4:], dtype=int)
    assert vals.shape == (12 * 8 * 3,)
    assert vals.min() >= 0 and vals.max() <= 255
    assert "Done." in r.stderr


def test_cli_list_scenes():
    r = _run("--list-scenes")
    assert r.returncode == 0
    for name in ("cornell", "book1-final", "next-week-final"):
        assert name in r.stdout


def test_cli_rejects_bad_args():
    assert _run("--scene", "nope").returncode == 2
    assert _run("--spp", "0").returncode == 2


def test_cli_supervise_recovers_from_crash(tmp_path):
    """--supervise retries a crashed render; the checkpoint makes the retry
    resume mid-render and the final image equals an uncrashed run's."""
    common = ("--scene", "two-spheres", "--width", "12", "--height", "8",
              "--spp", "8", "--max-depth", "3", "--samples-per-wave", "2",
              "--rays-per-wave", "96",  # k_pool=1 -> 4 waves of 2 samples
              "--checkpoint", str(tmp_path / "ck.npz"), "--checkpoint-every", "1")
    env = dict(os.environ, TPU_RAY_CRASH_AFTER_WAVE="2")
    r = subprocess.run(
        [sys.executable, "-m", "tpu_ray", "--platform", "cpu",
         "--supervise", "2", *common],
        capture_output=True, text=True, cwd=REPO, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr[-800:]
    assert "injected crash" in r.stderr
    assert "retry 1/2" in r.stderr
    assert "resuming at wave 2" in r.stderr

    clean = _run("--scene", "two-spheres", "--width", "12", "--height", "8",
                 "--spp", "8", "--max-depth", "3", "--samples-per-wave", "2",
                 "--rays-per-wave", "96")
    assert clean.returncode == 0
    assert r.stdout == clean.stdout, "supervised render must be bit-identical"


def test_cli_supervise_gives_up():
    env = dict(os.environ, TPU_RAY_CRASH_AFTER_WAVE="0")
    r = subprocess.run(
        [sys.executable, "-m", "tpu_ray", "--platform", "cpu", "--supervise",
         "1", "--scene", "two-spheres", "--width", "8", "--height", "8",
         "--spp", "2", "--max-depth", "2"],
        capture_output=True, text=True, cwd=REPO, timeout=600, env=env,
    )
    assert r.returncode == 1
    assert "giving up" in r.stderr


def test_cli_sampler_flag():
    """--sampler sobol is a different (still valid) estimator: the PPM is
    well-formed and differs from the default uniform-jitter render."""
    common = ("--scene", "two-spheres", "--width", "12", "--height", "8",
              "--spp", "4", "--max-depth", "3")
    u = _run(*common)
    q = _run(*common, "--sampler", "sobol")
    assert q.returncode == 0, q.stderr[-500:]
    words = q.stdout.split()
    assert words[:4] == ["P3", "12", "8", "255"]
    assert len(words) == 12 * 8 * 3 + 4
    assert q.stdout != u.stdout


def test_cli_estimator_reference_switches_perlin_field(tmp_path):
    """--estimator reference must flow scene.strict end-to-end: on a
    perlin scene the marble switches to the reference's table noise, so
    the strict render differs from the default one (r5, VERDICT r4
    missing #1)."""
    outs = {}
    for est in ("fixed", "reference"):
        out = tmp_path / f"{est}.ppm"
        r = subprocess.run(
            [sys.executable, "-m", "tpu_ray", "--platform", "cpu",
             "--scene", "simple-light", "--width", "16", "--height", "12",
             "--spp", "8", "--max-depth", "6", "--estimator", est,
             "--out", str(out)],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr
        outs[est] = out.read_text()
    assert outs["fixed"] != outs["reference"]
