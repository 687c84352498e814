"""Strict-mode (--estimator reference) table Perlin (VERDICT r4 missing #1).

The default marble is a hash-gradient redesign of the reference's noise
(ops/textures.py::_perlin_noise); under strict mode the noise FIELD now
has the reference's exact construction (src/Lib.hs:421-476): a 256-entry
gradient table with components uniform in [-1,1], three Fisher-Yates
permutations of 0..255, xor indexing, mod-256 tiling, hermite trilinear
interpolation, depth-7 turbulence, marble phase 0.5*(1+sin(z+10*turb)).

These tests pin the device evaluation against an independent numpy
oracle written straight from the Haskell, and pin the strict/default
field divergence end-to-end.
"""
import numpy as np

from tpu_ray.models import objects as ob
from tpu_ray.models.compile import build_scene
from tpu_ray.models.scenes import SCENES
from tpu_ray.renderer import render


def _scene(scale=1.5):
    per = ob.Noise(scale=scale, seed=1024)
    world = [
        ob.Sphere((0, -1000, 0), 1000, ob.Lambertian(per)),
        ob.Sphere((0, 2, 0), 2, ob.Lambertian(per)),
    ]
    return build_scene(world, background=(0.7, 0.8, 0.9))


# --- numpy oracle, written from src/Lib.hs:441-494 ---

def _oracle_noise(ranvec, permx, permy, permz, sc, p):
    q = sc * np.asarray(p, np.float64)
    i, j, k = (int(np.floor(q[a])) for a in range(3))
    u, v, w = q[0] - i, q[1] - j, q[2] - k

    def herm(z):
        return z * z * (3 - 2 * z)

    uu, vv, ww = herm(u), herm(v), herm(w)
    acc = 0.0
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                g = ranvec[permx[(i + di) % 256]
                           ^ permy[(j + dj) % 256]
                           ^ permz[(k + dk) % 256]].astype(np.float64)
                acc += ((di * uu + (1 - di) * (1 - uu))
                        * (dj * vv + (1 - dj) * (1 - vv))
                        * (dk * ww + (1 - dk) * (1 - ww))
                        * (g[0] * (u - di) + g[1] * (v - dj)
                           + g[2] * (w - dk)))
    return acc


def _oracle_marble(ranvec, perms, sc, p):
    acc, pp, weight = 0.0, np.asarray(p, np.float64), 1.0
    for _ in range(7):
        acc += weight * _oracle_noise(ranvec, perms[0], perms[1], perms[2],
                                      sc, pp)
        pp = 2.0 * pp
        weight *= 0.5
    return 0.5 * (1.0 + np.sin(p[2] + 10.0 * abs(acc)))


def test_table_marble_matches_oracle():
    import jax.numpy as jnp

    from tpu_ray.ops.textures import marble_from

    scene = _scene().replace(strict=True)
    ranvec = np.asarray(scene.texs.perlin_ranvec[0])
    perms = np.asarray(scene.texs.perlin_perm[0])
    rng = np.random.default_rng(7)
    pts = rng.uniform(-6.0, 6.0, (64, 3)).astype(np.float32)
    got = np.asarray(marble_from(
        scene, jnp.zeros(64, jnp.int32), jnp.full((64,), 1.5, jnp.float32),
        jnp.asarray(pts)))
    want = np.array([_oracle_marble(ranvec, perms, 1.5, p) for p in pts])
    np.testing.assert_allclose(got, want, atol=7e-4)


def test_table_construction_is_reference_shaped():
    """256 gradients in [-1,1]^3, three true permutations of 0..255,
    distinct per axis and per instance."""
    s1 = _scene()
    rv = np.asarray(s1.texs.perlin_ranvec[0])
    perms = np.asarray(s1.texs.perlin_perm[0])
    assert rv.shape == (256, 3) and (rv >= -1).all() and (rv <= 1).all()
    for ax in range(3):
        np.testing.assert_array_equal(np.sort(perms[ax]), np.arange(256))
    assert not np.array_equal(perms[0], perms[1])
    assert not np.array_equal(perms[1], perms[2])
    # a different seed gives different tables
    per2 = ob.Noise(scale=1.5, seed=77)
    s2 = build_scene([ob.Sphere((0, 0, 0), 1, ob.Lambertian(per2))])
    assert not np.array_equal(np.asarray(s2.texs.perlin_ranvec[0]), rv)


def test_strict_field_differs_from_default():
    """Strict (table) and default (hash) renders of a lit perlin scene
    must differ - the field really switches - while both stay tone-mapped
    sane."""
    scene = _scene()
    cam = SCENES["two-perlin-spheres"].camera(24, 16)
    kw = dict(spp=4, max_depth=4, seed=1024)
    fixed = np.asarray(render(scene, cam, 24, 16, **kw))
    strict = np.asarray(render(scene.replace(strict=True), cam, 24, 16,
                               **kw))
    assert not np.array_equal(fixed, strict)
    assert 0.05 < strict.mean() < 1.5 and 0.05 < fixed.mean() < 1.5


def test_strict_golden_perlin_sky():
    """Committed golden for the strict table-noise marble render
    (regenerate deliberately - tests/goldens/README)."""
    import os

    scene = _scene().replace(strict=True)
    cam = SCENES["two-perlin-spheres"].camera(24, 16)
    img = np.asarray(render(scene, cam, 24, 16, spp=8, max_depth=6,
                            seed=1024))
    golden = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                                  "perlin-sky-strict.npy"))
    np.testing.assert_allclose(img, golden, rtol=1e-4, atol=1e-5)
