"""First-bounce QMC probe sampler (Camera.sampler="sobol-b0").

Extends the 5D sobol camera sample with Owen-Sobol dims 6-10 on the
FIRST-bounce scatter draws (mixture coin, quad-light uv, cosine uv -
ops/scatter.py column layout), keyed (pixel, global sample) like the
camera dims.  XLA queue path only; these tests pin the sequence
properties, the estimator's unbiasedness in expectation, and schedule
invariance.  The MSE verdict lives in PERFLOG.md ("Bounce-dim QMC").
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ray.core import qmc
from tpu_ray.models.scenes import SCENES
from tpu_ray.renderer import render


def test_bounce0_dims_stratified_1d():
    """Owen scrambling preserves every dyadic 1-D stratification: any
    prefix of 2^k indices puts exactly one point in each 1/2^k bin, for
    each of the five bounce dims."""
    n = 64
    u5 = qmc.bounce0_uniforms(
        jnp.full((n,), 7, jnp.uint32), jnp.arange(n, dtype=jnp.uint32),
        jnp.uint32(1024))
    for d, u in enumerate(u5):
        u = np.asarray(u)
        assert (u >= 0).all() and (u < 1).all()
        counts = np.bincount((u * n).astype(int), minlength=n)
        np.testing.assert_array_equal(
            counts, np.ones(n, int), err_msg=f"dim {d}")


def test_bounce0_slots_decorrelated():
    """Different pixels carry different Owen scrambles of the same point
    set, and no dim repeats another's stream."""
    idx = jnp.arange(32, dtype=jnp.uint32)
    a = np.stack(qmc.bounce0_uniforms(
        jnp.full((32,), 3, jnp.uint32), idx, jnp.uint32(5)))
    b = np.stack(qmc.bounce0_uniforms(
        jnp.full((32,), 4, jnp.uint32), idx, jnp.uint32(5)))
    assert not np.allclose(a, b)
    for i in range(5):
        for j in range(i + 1, 5):
            assert not np.allclose(a[i], a[j])


def test_bounce0_distinct_from_camera_dims():
    """The bounce seeds continue the camera chain - no dim may alias the
    image/lens/time streams (a shared scramble would correlate the camera
    and scatter draws of every sample)."""
    idx = jnp.arange(64, dtype=jnp.uint32)
    slot = jnp.full((64,), 9, jnp.uint32)
    salt = jnp.uint32(77)
    cam = (*qmc.pixel_uniforms(slot, idx, salt),
           *qmc.lens_time_uniforms(slot, idx, salt))
    b0 = qmc.bounce0_uniforms(slot, idx, salt)
    for c in cam:
        for b in b0:
            assert not np.allclose(np.asarray(c), np.asarray(b))


def test_sobol_b0_queue_estimate_agrees():
    """sobol-b0 is the same integral estimated with different points:
    its queue render must agree with uniform in expectation and must not
    be bit-identical to plain sobol (the override really fires)."""
    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(12, 12)
    kw = dict(spp=96, max_depth=12, seed=3, mode="queue", engine="xla")
    iu = render(sc, cm, 12, 12, **kw)
    ib = render(sc, cm.replace(sampler="sobol-b0"), 12, 12, **kw)
    isb = render(sc, cm.replace(sampler="sobol"), 12, 12, **kw)
    np.testing.assert_allclose(ib.mean(), iu.mean(), rtol=0.12)
    assert not np.array_equal(np.asarray(ib), np.asarray(isb))


def test_sobol_b0_schedule_invariant():
    """Draws are keyed (pixel, global sample), so queue chunking must be
    bit-invisible exactly like the other samplers."""
    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(10, 10).replace(sampler="sobol-b0")
    kw = dict(spp=32, max_depth=8, seed=11, mode="queue", engine="xla")
    a = render(sc, cm, 10, 10, rays_per_wave=1 << 14, **kw)
    b = render(sc, cm, 10, 10, rays_per_wave=1 << 12, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sobol_b0_composes_with_adaptive():
    """The adaptive worklist path recovers (pixel, sample) from packed
    entries; sobol-b0 must run and produce a sane estimate there too."""
    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(10, 10)
    iu = render(sc, cm, 10, 10, spp=64, max_depth=8, seed=3, mode="queue",
                engine="xla")
    ib = render(sc, cm.replace(sampler="sobol-b0"), 10, 10, spp=64,
                max_depth=8, seed=3, mode="queue", engine="xla",
                adaptive=0.05)
    np.testing.assert_allclose(ib.mean(), iu.mean(), rtol=0.15)


def test_sobol_b0_never_degrades_below_sobol(capsys):
    """Off the XLA queue path, sobol-b0 must keep the SOBOL camera dims
    (bit-identical to plain sobol there, since scatter draws are hashed
    in both) and announce the demotion (ADVICE r4 medium: the Pallas
    regens used to drop the camera dims to uniform jitter)."""
    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(10, 10)
    kw = dict(spp=8, max_depth=6, seed=5, mode="pool", engine="xla")
    isb = render(sc, cm.replace(sampler="sobol"), 10, 10, **kw)
    ib0 = render(sc, cm.replace(sampler="sobol-b0"), 10, 10, **kw)
    np.testing.assert_array_equal(np.asarray(isb), np.asarray(ib0))
    assert "bounce-dim override" in capsys.readouterr().err
