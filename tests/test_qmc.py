"""Scrambled (0,2)-sequence sampler (core/qmc.py, Camera.sampler="sobol").

The reference jitters camera samples uniformly (src/Lib.hs:1352-1371);
sobol is our opt-in low-discrepancy upgrade, so these tests pin (a) the
sequence's elementary-interval stratification, (b) that every engine
draws the identical sobol stream, and (c) that it actually reduces
image error at equal spp.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ray.core import qmc
from tpu_ray.models.scenes import SCENES
from tpu_ray.renderer import render

KEY = jax.random.PRNGKey(0)


# ---------------------------------------------------------------------------
# the sequence itself
# ---------------------------------------------------------------------------
def test_bitrev32():
    x = jnp.array([0, 1, 2, 0x80000000, 0xFFFFFFFF, 0x12345678], jnp.uint32)
    got = np.asarray(qmc.bitrev32(x))
    want = [int(f"{v:032b}"[::-1], 2) for v in np.asarray(x)]
    np.testing.assert_array_equal(got, np.array(want, np.uint32))


def test_sobol2_first_values():
    """First direction-2 values of the classic generator (Smits' Sobol2,
    direction numbers v0=2^31, v_{k+1}=v_k^(v_k>>1)): XOR of the direction
    numbers selected by the index bits, hand-computed for index 0..7."""
    i = jnp.arange(8, dtype=jnp.uint32)
    got = np.asarray(qmc.sobol2_bits(i)).astype(np.float64) / 2**32
    want = np.array([0.0, 0.5, 0.75, 0.25, 0.625, 0.125, 0.375, 0.875])
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("n", [4, 16, 64, 256])
@pytest.mark.parametrize("slot", [0, 17, 123456])
def test_02_net_stratification(n, slot):
    """Any prefix of n = 4^k scrambled points puts EXACTLY one point in
    every cell of the sqrt(n) x sqrt(n) grid - the (0,2)-net property XOR
    scrambling preserves (Kollig & Keller 2002).  The uniform hash jitter
    cannot do this for any slot."""
    g = int(np.sqrt(n))
    u, v = qmc.pixel_uniforms(
        jnp.full((n,), slot, jnp.uint32), jnp.arange(n, dtype=jnp.uint32),
        jnp.uint32(1024))
    u, v = np.asarray(u), np.asarray(v)
    assert (u >= 0).all() and (u < 1).all() and (v >= 0).all() and (v < 1).all()
    cells = (u * g).astype(int) * g + (v * g).astype(int)
    counts = np.bincount(cells, minlength=n)
    np.testing.assert_array_equal(counts, np.ones(n, int))


def test_02_net_finer_elementary_intervals():
    """(0,2)-nets stratify every dyadic elementary interval, not just the
    square grid: 16 points also land one per 16x1 column strip and one per
    1x16 row strip."""
    u, v = qmc.pixel_uniforms(
        jnp.full((16,), 7, jnp.uint32), jnp.arange(16, dtype=jnp.uint32),
        jnp.uint32(0))
    for coord in (np.asarray(u), np.asarray(v)):
        counts = np.bincount((coord * 16).astype(int), minlength=16)
        np.testing.assert_array_equal(counts, np.ones(16, int))


def test_scramble_decorrelates_slots():
    """Different slots (and different salts) see different scrambles; the
    underlying stratification survives but the points differ."""
    idx = jnp.arange(16, dtype=jnp.uint32)
    a = qmc.pixel_uniforms(jnp.full((16,), 1, jnp.uint32), idx, jnp.uint32(9))
    b = qmc.pixel_uniforms(jnp.full((16,), 2, jnp.uint32), idx, jnp.uint32(9))
    c = qmc.pixel_uniforms(jnp.full((16,), 1, jnp.uint32), idx, jnp.uint32(8))
    assert not np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert not np.array_equal(np.asarray(a[0]), np.asarray(c[0]))


def test_uniform_default_bit_identical():
    """Adding the sampler field must not move a single bit of the default
    estimator: sampler='uniform' is the exact round-1 camera stream."""
    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(8, 8)
    assert cm.sampler == "uniform"
    img = render(sc, cm, 8, 8, spp=8, max_depth=6, seed=3)
    img2 = render(sc, cm.replace(sampler="uniform"), 8, 8, spp=8,
                  max_depth=6, seed=3)
    np.testing.assert_array_equal(img, img2)


# ---------------------------------------------------------------------------
# engines draw the same sobol stream
# ---------------------------------------------------------------------------
def test_sobol_fused_matches_xla_shading():
    """The in-kernel regen (ops/shade_pallas.py) computes the identical
    scrambled points as trace_pool's XLA regen."""
    from tpu_ray.integrator import trace_pool

    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(10, 10).replace(sampler="sobol")
    s = jnp.tile(jnp.linspace(0.05, 0.95, 10), 10)
    t = jnp.repeat(jnp.linspace(0.05, 0.95, 10), 10)
    args = (sc, cm, s, t, (0.1, 0.1), KEY, 8, jnp.uint32(0), 10)
    ax, _ = trace_pool(*args, shade="xla")
    af, _ = trace_pool(*args, shade="fused")
    np.testing.assert_allclose(np.asarray(af), np.asarray(ax),
                               rtol=2e-3, atol=2e-6)


def test_sobol_megakernel_matches_pool():
    """The megakernel regen draws the same sobol jitter as the XLA pool
    (same per-lane comparison discipline as test_megakernel.py: fp
    reassociation differs, a handful of t-tie pixels may flip)."""
    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(16, 12).replace(sampler="sobol")
    kw = dict(spp=8, max_depth=6, seed=11, samples_per_wave=2)
    a = np.asarray(render(sc, cm, 16, 12, engine="xla", **kw))
    b = np.asarray(render(sc, cm, 16, 12, engine="mega", **kw))
    err = np.abs(a - b) / (1.0 + np.abs(a))
    close = (err < 1e-4).all(axis=-1)
    assert 1.0 - close.mean() <= 0.01
    np.testing.assert_allclose(a[close], b[close], rtol=2e-4, atol=1e-4)


def test_sobol_pool_schedule_invariance():
    """Sobol camera draws are keyed by (global slot, global sample), so
    wave scheduling stays bit-invisible exactly like the uniform stream."""
    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(10, 10).replace(sampler="sobol")
    kw = dict(spp=16, max_depth=8, seed=11)
    a = render(sc, cm, 10, 10, samples_per_wave=16, **kw)
    b = render(sc, cm, 10, 10, samples_per_wave=4, **kw)
    np.testing.assert_array_equal(a, b)


def test_sobol_queue_runs():
    """The queue integrator accepts the sobol camera and agrees with the
    pool in expectation (the two engines key path space differently, so
    only the estimate - not bits - can match)."""
    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(12, 12).replace(sampler="sobol")
    iq = render(sc, cm, 12, 12, spp=96, max_depth=12, seed=3, mode="queue")
    ip = render(sc, cm, 12, 12, spp=96, max_depth=12, seed=3, mode="pool")
    np.testing.assert_allclose(iq.mean(), ip.mean(), rtol=0.12)


def test_sobol_wave_mode_rejected():
    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(8, 8).replace(sampler="sobol")
    with pytest.raises(ValueError, match="sobol"):
        render(sc, cm, 8, 8, spp=4, max_depth=4, mode="wave")


def test_sampler_invalidates_checkpoint_tag():
    """A sobol render must never resume a uniform accumulator: the scene
    fingerprint covers the static sampler field."""
    from tpu_ray.renderer import _scene_fingerprint

    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(8, 8)
    assert (_scene_fingerprint(sc, cm)
            != _scene_fingerprint(sc, cm.replace(sampler="sobol")))


def test_sobol_composes_with_adaptive():
    """Adaptive sampling inherits the sampler through the camera field:
    both backends run and produce a sane estimate under sobol."""
    from tpu_ray.adaptive import render_adaptive

    sc = SCENES["cornell"].build()
    cm = SCENES["cornell"].camera(12, 12).replace(sampler="sobol")
    # compare against a HIGH-spp uniform truth (a 128-spp ref is itself
    # noisy enough to flip an 8% gate)
    ref = render(sc, cm.replace(sampler="uniform"), 12, 12, spp=1024,
                 max_depth=50, seed=11)
    for mode in ("queue", "pool"):
        img = render_adaptive(sc, cm, 12, 12, spp_max=64, tol=0.02,
                              max_depth=50, seed=5, pilot_spp=16,
                              round_cap=32, mode=mode)
        assert np.isfinite(img).all()
        np.testing.assert_allclose(img.mean(), np.asarray(ref).mean(),
                                   rtol=0.1)


# ---------------------------------------------------------------------------
# it actually helps
# ---------------------------------------------------------------------------
def test_sobol_reduces_image_error():
    """At equal spp the Owen-scrambled Sobol' camera sample must beat
    uniform jitter against a high-spp truth image, averaged over a fixed
    seed set (a single seed is a coin flip at 16 spp; the set makes this
    deterministic AND statistically meaningful).  Measured means:
    uniform 8.5e-4, sobol 8.1e-4 (two-spheres 24x24@16, 8 seeds)."""
    sc = SCENES["two-spheres"].build()
    spec = SCENES["two-spheres"]
    cm = spec.camera(24, 24)
    truth = np.asarray(render(sc, cm, 24, 24, spp=1024, max_depth=8,
                              seed=99))
    mse_u, mse_q = [], []
    for seed in range(100, 106):
        u = render(sc, cm, 24, 24, spp=16, max_depth=8, seed=seed)
        q = render(sc, cm.replace(sampler="sobol"), 24, 24, spp=16,
                   max_depth=8, seed=seed)
        mse_u.append(np.mean((np.asarray(u) - truth) ** 2))
        mse_q.append(np.mean((np.asarray(q) - truth) ** 2))
    assert np.mean(mse_q) < np.mean(mse_u), (np.mean(mse_q), np.mean(mse_u))


# ---------------------------------------------------------------------------
# dims 3-5: lens disk + shutter time
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("dim", [3, 4, 5])
def test_sobol_higher_dims_stratify_1d(dim):
    """Every Sobol' dimension is a (0,1)-sequence in base 2: each prefix
    of 2^k indices puts exactly one point in every 1/2^k bin.  Per-slot
    XOR scrambling preserves this (digit permutation)."""
    V = getattr(qmc, f"_SOBOL{dim}_V")
    for k in (3, 5, 7):
        n = 1 << k
        bits = np.asarray(qmc.sobol_bits(jnp.arange(n, dtype=jnp.uint32), V))
        scr = np.asarray(qmc.owen_scramble(jnp.asarray(bits),
                                           jnp.uint32(0xDEADBEEF)))
        for vals in (bits, scr):
            bins = (vals >> np.uint32(32 - k)).astype(np.int64)
            assert np.bincount(bins, minlength=n).max() == 1


def test_lens_time_uniforms_range_and_decorrelation():
    n = 1 << 10
    slot = jnp.zeros((n,), jnp.uint32)
    sidx = jnp.arange(n, dtype=jnp.uint32)
    r, p, t = map(np.asarray, qmc.lens_time_uniforms(slot, sidx, 5))
    for v in (r, p, t):
        assert (0 <= v).all() and (v < 1).all()
        assert abs(v.mean() - 0.5) < 0.02  # stratified -> tight mean
    # ensemble decorrelation: ANY two scrambles of one base sequence
    # keep O(1) pairwise correlation (they share the base's digit tree),
    # but over the slot ensemble the mean must vanish
    cs = []
    for sl in range(1, 65):
        r2, _, _ = map(np.asarray, qmc.lens_time_uniforms(
            jnp.full((n,), sl, jnp.uint32), sidx, 5))
        cs.append(np.corrcoef(r, r2)[0, 1])
    assert np.abs(np.mean(cs)) < 0.15


def test_owen_scramble_is_nested():
    """The Owen scramble's defining property: permuting digit j of the
    input only ever changes output digits at or below j (each digit's
    permutation depends only on MORE significant digits).  Checked by
    flipping single input bits; also bijectivity on a block."""
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randint(0, 2**32, 256, dtype=np.uint64)
                    .astype(np.uint32))
    seed = jnp.uint32(0xC0FFEE)
    base = np.asarray(qmc.owen_scramble(v, seed))
    for j in (0, 5, 13, 27, 31):  # digit j = bit (31-j)
        flipped = np.asarray(qmc.owen_scramble(
            v ^ np.uint32(1 << (31 - j)), seed))
        changed = base ^ flipped
        assert (changed >> np.uint32(32 - j)).max() == 0, j  # above j: 0
        assert ((changed >> np.uint32(31 - j)) & 1).all(), j  # bit j flips
    # bijective: 2^12 consecutive values map to 2^12 distinct outputs
    block = np.asarray(qmc.owen_scramble(
        jnp.arange(1 << 12, dtype=jnp.uint32), seed))
    assert np.unique(block).size == 1 << 12


def test_sobol_lens_time_fused_matches_xla():
    """The in-kernel regen draws the identical lens/time Sobol' dims as
    the XLA regen - checked on a scene where defocus AND motion blur
    change the image (random-moving: aperture 0.1, moving spheres)."""
    from tpu_ray.integrator import trace_pool

    sc = SCENES["random-moving"].build(seed=7, earth=None)
    cm = SCENES["random-moving"].camera(10, 10).replace(sampler="sobol")
    s = jnp.tile(jnp.linspace(0.05, 0.95, 10), 10)
    t = jnp.repeat(jnp.linspace(0.05, 0.95, 10), 10)
    args = (sc, cm, s, t, (0.1, 0.1), KEY, 8, jnp.uint32(0), 8)
    ax, _ = trace_pool(*args, shade="xla")
    af, _ = trace_pool(*args, shade="fused")
    np.testing.assert_allclose(np.asarray(af), np.asarray(ax),
                               rtol=2e-3, atol=2e-6)
