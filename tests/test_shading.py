"""Textures, light sampling/pdf, material scatter."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ray.core import rng, vec
from tpu_ray.models import objects as ob
from tpu_ray.models.compile import build_scene
from tpu_ray.ops.intersect import HitRecord
from tpu_ray.ops.lights import lights_pdf, sample_lights
from tpu_ray.ops.scatter import scatter
from tpu_ray.ops.textures import texture_value

KEY = jax.random.PRNGKey(0)


def _tex_scene(tex, mat=None):
    return build_scene([ob.Sphere((0, 0, 0), 1.0, mat or ob.Lambertian(tex))])


# ---------------------------------------------------------------------------
# textures
# ---------------------------------------------------------------------------
def test_constant_texture():
    scene = _tex_scene(ob.SolidColor((0.2, 0.4, 0.6)))
    val = texture_value(scene, jnp.zeros(3, jnp.int32), jnp.zeros(3), jnp.zeros(3),
                        jnp.zeros((3, 3)))
    np.testing.assert_allclose(np.asarray(val), np.tile([0.2, 0.4, 0.6], (3, 1)), rtol=1e-6)


def test_checker_sign():
    scene = _tex_scene(ob.Checker(ob.SolidColor((1, 0, 0)), ob.SolidColor((0, 1, 0))))
    # checker texture id is index of the Checker row; children compiled first
    tid = jnp.full((2,), 2, jnp.int32)
    # sin(10*x)sin(10*y)sin(10*z): at p=(0.05,0.05,0.05) product>0 -> even;
    # flip x sign -> odd  (src/Lib.hs:498-501)
    p = jnp.array([[0.05, 0.05, 0.05], [-0.05, 0.05, 0.05]])
    val = np.asarray(texture_value(scene, tid, jnp.zeros(2), jnp.zeros(2), p))
    np.testing.assert_allclose(val[0], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(val[1], [1, 0, 0], atol=1e-6)


def test_perlin_marble_range_and_determinism():
    scene = _tex_scene(ob.Noise(scale=1.5, seed=3))
    p = jnp.asarray(np.random.default_rng(0).uniform(-10, 10, (256, 3)), jnp.float32)
    tid = jnp.zeros(256, jnp.int32)
    v1 = np.asarray(texture_value(scene, tid, jnp.zeros(256), jnp.zeros(256), p))
    v2 = np.asarray(texture_value(scene, tid, jnp.zeros(256), jnp.zeros(256), p))
    np.testing.assert_array_equal(v1, v2)
    # marble = 0.5*(1+sin(...)) in [0,1], grayscale
    assert np.all(v1 >= 0.0) and np.all(v1 <= 1.0)
    np.testing.assert_allclose(v1[:, 0], v1[:, 1], atol=1e-6)
    assert v1[:, 0].std() > 0.05  # actually varies


def test_image_texture_corners():
    img = np.zeros((2, 2, 3), np.uint8)
    img[0, 0] = (255, 0, 0)    # top-left
    img[0, 1] = (0, 255, 0)    # top-right
    img[1, 0] = (0, 0, 255)    # bottom-left
    img[1, 1] = (255, 255, 0)  # bottom-right
    scene = _tex_scene(ob.ImageTexture(img))
    tid = jnp.zeros(4, jnp.int32)
    # v=1 -> top row (v flipped, src/Lib.hs:504-509); u=0 -> left column
    u = jnp.array([0.1, 0.9, 0.1, 0.9])
    v = jnp.array([0.9, 0.9, 0.1, 0.1])
    val = np.asarray(texture_value(scene, tid, u, v, jnp.zeros((4, 3))))
    np.testing.assert_allclose(val[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(val[1], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(val[2], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(val[3], [1, 1, 0], atol=1e-6)


def test_image_texture_random_vs_numpy_oracle():
    """Packed-u32 atlas lookup == the reference formula on a random image.

    Oracle mirrors src/Lib.hs:504-509 (clamped index, v flip) with float64
    index math and byte/255 albedo; the packed path's byte*(1/255) unpack
    must match within 1 ulp (models/compile.py atlas packing).
    """
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (37, 53, 3), np.uint8)
    scene = _tex_scene(ob.ImageTexture(img))
    n = 512
    u = jnp.asarray(rng.uniform(-0.2, 1.2, n), jnp.float32)  # incl. clamps
    v = jnp.asarray(rng.uniform(-0.2, 1.2, n), jnp.float32)
    tid = jnp.zeros(n, jnp.int32)
    got = np.asarray(texture_value(scene, tid, u, v, jnp.zeros((n, 3))))
    h, w = img.shape[:2]
    uf = np.asarray(u, np.float32)
    vf = np.asarray(v, np.float32)
    eps = np.float32(1e-4)
    i = np.floor(np.clip(uf * w, 0.0, w - eps)).astype(np.int32)
    j = np.floor(np.clip((1.0 - vf) * h - eps, 0.0, h - eps)).astype(np.int32)
    want = img[j, i].astype(np.float64) / 255.0
    np.testing.assert_allclose(got, want, atol=1.5e-7)


def test_missing_image_is_cyan():
    scene = _tex_scene(ob.ImageTexture(None))
    val = np.asarray(texture_value(scene, jnp.zeros(1, jnp.int32), jnp.zeros(1),
                                   jnp.zeros(1), jnp.zeros((1, 3))))
    np.testing.assert_allclose(val[0], [0, 1, 1], atol=1e-6)


# ---------------------------------------------------------------------------
# lights
# ---------------------------------------------------------------------------
def _light_scene(lights):
    white = ob.Lambertian((1, 1, 1))
    return build_scene([ob.Sphere((0, -1000, 0), 1000, white)] + lights, lights=lights)


def test_rect_light_samples_hit_the_rect():
    light = ob.Rect("xz", 1, 3, 1, 3, 5.0, ob.DiffuseLight((4, 4, 4)))
    scene = _light_scene([light])
    origin = jnp.tile(jnp.array([[2.0, 0.0, 2.0]]), (2000, 1))
    d = np.asarray(sample_lights(scene, KEY, origin))
    # all directions point up toward the plane y=5
    assert np.all(d[:, 1] > 0)
    t = 5.0 / d[:, 1]
    x = 2.0 + t * d[:, 0]
    z = 2.0 + t * d[:, 2]
    assert np.all((x >= 1 - 1e-4) & (x <= 3 + 1e-4))
    assert np.all((z >= 1 - 1e-4) & (z <= 3 + 1e-4))


def test_rect_light_pdf_integrates_to_one():
    """Monte-Carlo integral of the density over the sphere of directions = 1."""
    light = ob.Rect("xz", -1, 1, -1, 1, 3.0, ob.DiffuseLight((4, 4, 4)))
    scene = _light_scene([light])
    n = 200_000
    dirs = rng.unit_vector(jax.random.PRNGKey(5), (n,))
    origin = jnp.zeros((n, 3))
    pdf = np.asarray(lights_pdf(scene, origin, dirs))
    integral = pdf.mean() * 4.0 * np.pi
    np.testing.assert_allclose(integral, 1.0, atol=0.03)


def test_sphere_light_pdf_analytic():
    """Inside the cone the density is exactly 1/solidAngle, outside 0
    (src/Lib.hs:689-693)."""
    light = ob.Sphere((0, 5, 0), 1.0, ob.DiffuseLight((4, 4, 4)))
    scene = _light_scene([light])
    dirs = jnp.asarray(np.array([
        [0.0, 1.0, 0.0],      # straight at the center: inside the cone
        [0.1, 1.0, 0.0],      # still inside (tan(theta_max) ~ 0.204)
        [0.5, 1.0, 0.0],      # outside the cone
        [0.0, -1.0, 0.0],     # opposite direction
    ], np.float32))
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    pdf = np.asarray(lights_pdf(scene, jnp.zeros((4, 3)), dirs))
    inv_sa = 1.0 / (2.0 * np.pi * (1.0 - np.sqrt(1.0 - 1.0 / 25.0)))
    np.testing.assert_allclose(pdf[0], inv_sa, rtol=1e-4)
    np.testing.assert_allclose(pdf[1], inv_sa, rtol=1e-4)
    assert pdf[2] == 0.0 and pdf[3] == 0.0


def test_two_lights_pdf_is_mean():
    l1 = ob.Rect("xz", -1, 1, -1, 1, 3.0, ob.DiffuseLight((4, 4, 4)))
    l2 = ob.Sphere((0, 5, 0), 1.0, ob.DiffuseLight((4, 4, 4)))
    s1 = _light_scene([l1])
    s2 = _light_scene([l2])
    s12 = _light_scene([l1, l2])
    dirs = rng.unit_vector(jax.random.PRNGKey(7), (10_000,))
    origin = jnp.zeros((10_000, 3))
    p1 = np.asarray(lights_pdf(s1, origin, dirs))
    p2 = np.asarray(lights_pdf(s2, origin, dirs))
    p12 = np.asarray(lights_pdf(s12, origin, dirs))
    np.testing.assert_allclose(p12, 0.5 * (p1 + p2), rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# scatter
# ---------------------------------------------------------------------------
def _fake_hit(scene, n, point, normal, front=True, mat_id=0):
    R = n
    return HitRecord(
        hit=jnp.ones(R, bool),
        t=jnp.ones(R),
        point=jnp.tile(jnp.asarray(point, jnp.float32)[None], (R, 1)),
        normal=jnp.tile(jnp.asarray(normal, jnp.float32)[None], (R, 1)),
        front=jnp.full(R, front),
        u=jnp.zeros(R),
        v=jnp.zeros(R),
        mat=jnp.full(R, mat_id, jnp.int32),
        prim=jnp.zeros(R, jnp.int32),
    )


def test_lambertian_cosine_distribution_no_lights():
    scene = build_scene([ob.Sphere((0, 0, 0), 1.0, ob.Lambertian((0.5, 0.5, 0.5)))])
    R = 20000
    rec = _fake_hit(scene, R, (0, 0, 0), (0, 0, 1))
    rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (R, 1))
    out = scatter(scene, KEY, rd, rec)
    d = np.asarray(out.direction)
    assert np.all(d[:, 2] > -1e-6)
    np.testing.assert_allclose(d[:, 2].mean(), 2.0 / 3.0, atol=0.01)
    np.testing.assert_allclose(np.asarray(out.weight), 0.5, atol=1e-6)
    assert np.all(np.asarray(out.scattered))


def test_metal_mirror_reflection():
    scene = build_scene([ob.Sphere((0, 0, 0), 1.0, ob.Metal((0.8, 0.8, 0.8), 0.0))])
    R = 8
    rec = _fake_hit(scene, R, (0, 0, 0), (0, 0, 1))
    rd = jnp.tile(jnp.array([[1.0, 0.0, -1.0]]), (R, 1))
    out = scatter(scene, KEY, rd, rec)
    d = np.asarray(vec.normalize(out.direction))
    expected = np.array([1.0, 0.0, 1.0]) / np.sqrt(2.0)
    np.testing.assert_allclose(d, np.tile(expected, (R, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.weight), 0.8, atol=1e-6)


def test_dielectric_total_internal_reflection():
    scene = build_scene([ob.Sphere((0, 0, 0), 1.0, ob.Dielectric(1.5))])
    R = 64
    # back face (inside glass), grazing angle -> must reflect
    rec = _fake_hit(scene, R, (0, 0, 0), (0, 0, 1), front=False)
    rd = jnp.tile(jnp.array([[1.0, 0.0, -0.1]]), (R, 1))
    out = scatter(scene, KEY, rd, rec)
    d = np.asarray(out.direction)
    assert np.all(d[:, 2] > 0)  # reflected back up
    np.testing.assert_allclose(np.asarray(out.weight), 1.0, atol=1e-6)


def test_dielectric_refraction_normal_incidence():
    scene = build_scene([ob.Sphere((0, 0, 0), 1.0, ob.Dielectric(1.5))])
    R = 10000
    rec = _fake_hit(scene, R, (0, 0, 0), (0, 0, 1), front=True)
    rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (R, 1))
    out = scatter(scene, KEY, rd, rec)
    d = np.asarray(out.direction)
    # schlick at cos=1, ratio 1/1.5: r0 = ((1-2/3)/(1+2/3))^2 = 0.04
    frac_reflected = (d[:, 2] > 0).mean()
    np.testing.assert_allclose(frac_reflected, 0.04, atol=0.01)


def test_diffuse_light_emits_back_face_only():
    scene = build_scene([ob.Rect("xz", 0, 1, 0, 1, 0, ob.DiffuseLight((15, 15, 15)))])
    R = 4
    rec_back = _fake_hit(scene, R, (0, 0, 0), (0, 1, 0), front=False)
    rec_front = _fake_hit(scene, R, (0, 0, 0), (0, 1, 0), front=True)
    rd = jnp.tile(jnp.array([[0.0, -1.0, 0.0]]), (R, 1))
    out_b = scatter(scene, KEY, rd, rec_back)
    out_f = scatter(scene, KEY, rd, rec_front)
    assert not np.any(np.asarray(out_b.scattered))
    # emission only when frontFace is False (src/Lib.hs:880-884)
    np.testing.assert_allclose(np.asarray(out_b.emitted), 15.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_f.emitted), 0.0, atol=1e-5)


def test_isotropic_uniform_sphere():
    scene = build_scene([
        ob.ConstantMedium(1.0, (0.3, 0.6, 0.9),
                          ob.Sphere((0, 0, 0), 1.0, ob.Lambertian((1, 1, 1))))
    ])
    R = 20000
    rec = _fake_hit(scene, R, (0, 0, 0), (1, 0, 0))
    rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (R, 1))
    out = scatter(scene, KEY, rd, rec)
    d = np.asarray(out.direction)
    assert np.abs(d.mean(0)).max() < 0.02
    np.testing.assert_allclose(np.asarray(out.weight)[0], [0.3, 0.6, 0.9], atol=1e-6)


def test_strict_lambertian_unhittable_mixture():
    """--estimator reference: no-light scenes send half the Lambertian
    samples to the fixed direction (1,0,0) with weight 2*att above the
    surface and 0 (the reference's NaN -> black) below
    (src/Lib.hs:829-836, 702, 724)."""
    scene = build_scene([ob.Sphere((0, 0, 0), 1.0, ob.Lambertian((0.5, 0.5, 0.5)))])
    strict = scene.replace(strict=True)
    R = 20000
    rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (R, 1))

    # normal +z: (1,0,0) lies in the tangent plane, dot == 0 -> weight 0
    rec_up = _fake_hit(strict, R, (0, 0, 0), (0, 0, 1))
    out = scatter(strict, KEY, rd, rec_up)
    d = np.asarray(out.direction)
    w = np.asarray(out.weight)
    to_x = np.abs(d - [1.0, 0.0, 0.0]).max(axis=1) < 1e-6
    frac_x = to_x.mean()
    np.testing.assert_allclose(frac_x, 0.5, atol=0.02)
    np.testing.assert_allclose(w[to_x], 0.0, atol=1e-6)        # below/graze
    np.testing.assert_allclose(w[~to_x], 1.0, atol=1e-5)       # 2 * 0.5
    # normal +x: the fixed direction is straight up the normal -> weight 2att
    rec_x = _fake_hit(strict, R, (0, 0, 0), (1, 0, 0))
    out_x = scatter(strict, KEY, rd, rec_x)
    np.testing.assert_allclose(np.asarray(out_x.weight), 1.0, atol=1e-5)
    # the fixed estimator never produces the (1,0,0) spike
    out_fixed = scatter(scene, KEY, rd, rec_up)
    d_fixed = np.asarray(out_fixed.direction)
    assert (np.abs(d_fixed - [1.0, 0.0, 0.0]).max(axis=1) < 1e-6).mean() < 0.01


def test_strict_isotropic_cosine_weighting():
    """--estimator reference: media scatter with a non-unit in-ball
    direction weighted by max(0, dot((1,0,0), raw_dir))/pi instead of the
    proper uniform phase function (src/Lib.hs:861-878)."""
    objs = [ob.ConstantMedium(1.0, (1.0, 1.0, 1.0),
                              ob.Sphere((0, 0, 0), 1.0, ob.Lambertian((1, 1, 1))))]
    scene = build_scene(objs)
    strict = scene.replace(strict=True)
    R = 40000
    rec = _fake_hit(strict, R, (0, 0, 0), (1, 0, 0))
    rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (R, 1))
    out = scatter(strict, KEY, rd, rec)
    d = np.asarray(out.direction)
    w = np.asarray(out.weight)[:, 0]
    r = np.linalg.norm(d, axis=1)
    assert r.max() <= 1.0 + 1e-5 and r.mean() < 0.8  # in-ball, not unit
    np.testing.assert_allclose(w, np.maximum(d[:, 0], 0.0) / np.pi, atol=1e-5)
    # E[weight] = E[max(0, x)]/pi; x uniform in the ball: E[max(0,x)] =
    # (1/2) * mean |x| = (1/2)(3/8 * ... ) -> just check the documented
    # darkening: mean weight far below the fixed mode's 1.0
    assert w.mean() < 0.1
    out_fixed = scatter(scene, KEY, rd, rec)
    np.testing.assert_allclose(np.asarray(out_fixed.weight), 1.0, atol=1e-6)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out_fixed.direction), axis=1), 1.0, atol=1e-5
    )


def test_lambertian_mis_weight_unbiased():
    """With lights present, E[weight * f(dir)] must equal the cosine-sampled
    estimate of the same integrand (the MIS estimator is unbiased)."""
    light = ob.Rect("xz", -1, 1, -1, 1, 4.0, ob.DiffuseLight((4, 4, 4)))
    scene_l = _light_scene([light])
    scene_n = build_scene([ob.Sphere((0, -1000, 0), 1000, ob.Lambertian((1, 1, 1)))])
    R = 400_000
    rec_l = _fake_hit(scene_l, R, (0, 0, 0), (0, 1, 0), mat_id=0)
    rec_n = _fake_hit(scene_n, R, (0, 0, 0), (0, 1, 0), mat_id=0)
    rd = jnp.tile(jnp.array([[0.0, -1.0, 0.0]]), (R, 1))
    out_l = scatter(scene_l, jax.random.PRNGKey(11), rd, rec_l)
    out_n = scatter(scene_n, jax.random.PRNGKey(12), rd, rec_n)
    # integrand: radiance 1 from directions with z > 0.5, else 0
    f_l = (np.asarray(out_l.direction)[:, 2] > 0.5).astype(np.float32)
    f_n = (np.asarray(out_n.direction)[:, 2] > 0.5).astype(np.float32)
    est_l = (np.asarray(out_l.weight)[:, 0] * f_l).mean()
    est_n = (np.asarray(out_n.weight)[:, 0] * f_n).mean()
    np.testing.assert_allclose(est_l, est_n, rtol=0.05)
