"""Material scatter: one wavefront step of shading.

Vectorized counterpart of the reference's ``scatter``/``scatteringPdf``/
``emitted`` (src/Lib.hs:819-903) and of the specular-vs-pdf branch of the
integrator (src/Lib.hs:1319-1333).  All five material responses are computed
masked and selected by material id - cheaper than segmenting at these
material counts, and branch-free for the VPU.

Estimator semantics follow the reference exactly where the reference is
well-defined, with two conscious fixes (SURVEY.md section 2.3):

* Scenes WITHOUT lights use pure cosine sampling for Lambertian (weight =
  albedo) instead of the reference's mixture with an ``Unhittable`` light
  list, which sends half the samples to the fixed direction (1,0,0) with
  density 0 and divides by zero (src/Lib.hs:829-836, 702, 724).  The
  reference's published book-1/2 images predate that regression.
* Isotropic (constant-medium) scattering uses the proper uniform phase
  function with weight = albedo; the reference reuses the Lambertian
  cos/pi formula against the medium's fixed (1,0,0) hit normal with pdf 1
  (src/Lib.hs:861-878), an artifact of the book-3 refactor that silently
  darkens smoke.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core import rng, vec
from ..models.scene_data import (
    MAT_DIELECTRIC,
    MAT_DIFFUSE_LIGHT,
    MAT_ISOTROPIC,
    MAT_LAMBERTIAN,
    MAT_METAL,
    SceneData,
)
from .intersect import HitRecord
from .lights import lights_pdf, sample_lights_from
from .textures import texture_value, texture_value_packed

INV_PI = 1.0 / jnp.pi

# Russian-roulette estimator option (NOT in the reference, default off):
# a path that has completed >= rr_depth bounces survives each further
# bounce with p = clamp(max(incoming throughput), RR_PMIN, 1) and scales
# its throughput by 1/p - the standard unbiased termination used by
# production tracers.  The survival uniform is column RR_COL of the
# scatter stream (columns 0-13 are consumed by scatter(); every engine -
# XLA, fused Pallas, megakernel - draws the same column from the same
# (key, lane id) base, so engines agree on the kill decisions).
RR_PMIN = 0.05
RR_COL = 14


@struct.dataclass
class ScatterResult:
    direction: jnp.ndarray  # (R, 3) next ray direction
    weight: jnp.ndarray     # (R, 3) throughput multiplier
    emitted: jnp.ndarray    # (R, 3) radiance if the path terminates here
    scattered: jnp.ndarray  # (R,) bool; False -> path ends (emissive hit)


def scatter(scene: SceneData, key, rd, rec: HitRecord,
            lane_ids=None, u=None) -> ScatterResult:
    # one packed payload row pull per lane; layout in models/compile.py
    mp = vec.take_rows(scene.mat_payload, rec.mat)  # (R, 16)
    mkind = mp[:, 0].astype(jnp.int32)
    fuzz = mp[:, 1]
    ref_idx = mp[:, 2]
    if scene.checker_fancy:
        att = texture_value(scene, scene.mats.tex[rec.mat], rec.u, rec.v, rec.point)
    else:
        att = texture_value_packed(scene, mp, rec.u, rec.v, rec.point)
    n = rec.normal
    unit_d = vec.normalize(rd)
    R = rd.shape[0]
    # this bounce's draws, keyed per lane id (position-independent - see
    # rng.lane_uniforms):
    # 0 coin | 1 pick | 2:4 quad uv | 4:6 cone | 6:8 cosine | 8:10 fuzz
    # | 10 reflect | 11:13 isotropic | 13 in-sphere radius (strict mode)
    if lane_ids is None:
        lane_ids = jnp.arange(R, dtype=jnp.uint32)
    if u is None:
        u = rng.lane_uniforms(key, lane_ids, 14)
    # else: caller supplies the (R, 14) draw - the sobol-b0 probe replaces
    # first-bounce columns with low-discrepancy points (integrator._queue_body)

    # Each material response below is compiled only when the scene's
    # material table can reach it (static has_* flags, models/compile.py);
    # present responses are computed masked and selected by material id.
    branches = []  # (material kind, direction, weight)

    # --- emission: DiffuseLight, back-face only (src/Lib.hs:880-884) ---
    if scene.has_emissive:
        emitted = jnp.where(
            ((mkind == MAT_DIFFUSE_LIGHT) & ~rec.front)[:, None], att, 0.0
        )
    else:
        emitted = jnp.zeros_like(att)

    # --- Lambertian (src/Lib.hs:823-836) ---
    if scene.has_lambertian:
        cos_local = rng.cosine_direction_from(u[:, 6:8])
        cos_dir = vec.onb_local(vec.onb_from_w(n), cos_local)
        if scene.n_lights > 0:
            light_dir = sample_lights_from(scene, u[:, 1:6], rec.point)
            dir_lam = vec.normalize(vec.where3(u[:, 0] < 0.5, light_dir, cos_dir))
            cos_pdf = jnp.maximum(vec.dot(dir_lam, n), 0.0) * INV_PI
            pdf_val = 0.5 * (lights_pdf(scene, rec.point, dir_lam) + cos_pdf)
            # scatteringPdf == the cosine density here (src/Lib.hs:874-878),
            # so the MIS weight is cos_pdf / pdf_val
            w_lam = att * jnp.where(
                pdf_val > 0.0, cos_pdf / jnp.maximum(pdf_val, 1e-12), 0.0
            )[:, None]
        elif scene.strict:
            # strict-quirks: the reference still builds the mixture with an
            # ``Unhittable`` light list - half the draws go to the fixed
            # direction (1,0,0) (htblRandom, src/Lib.hs:724) whose light
            # density is 0 (src/Lib.hs:702), so pdfVal = 0.5*cosinePdf and the
            # weight algebra collapses to 2*att when the direction is above
            # the surface; below it the reference produces a 0/0 = NaN sample
            # that its own tone map floors to black - reproduced as weight 0.
            one_x = jnp.broadcast_to(
                jnp.array([1.0, 0.0, 0.0], att.dtype), cos_dir.shape
            )
            dir_lam = vec.normalize(vec.where3(u[:, 0] < 0.5, one_x, cos_dir))
            w_lam = att * jnp.where(vec.dot(dir_lam, n) > 0.0, 2.0, 0.0)[:, None]
        else:
            dir_lam = vec.normalize(cos_dir)
            w_lam = att
        branches.append((MAT_LAMBERTIAN, dir_lam, w_lam))

    # --- Metal (src/Lib.hs:837-841): always scatters, specular ---
    if scene.has_metal:
        reflected = vec.reflect(unit_d, n)
        dir_metal = reflected + fuzz[:, None] * rng.unit_vector_from(u[:, 8:10])
        branches.append((MAT_METAL, dir_metal, att))

    # --- Dielectric (src/Lib.hs:842-859) ---
    if scene.has_dielectric:
        ratio = jnp.where(rec.front, 1.0 / ref_idx, ref_idx)
        cos_theta = jnp.minimum(vec.dot(-unit_d, n), 1.0)
        sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
        # Schlick with eta ratio as the reference passes it
        # (src/Lib.hs:855, 899-903)
        r0 = ((1.0 - ratio) / (1.0 + ratio)) ** 2
        refl_prob = r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5
        must_reflect = ratio * sin_theta > 1.0
        do_reflect = must_reflect | (u[:, 10] < refl_prob)
        dir_diel = vec.where3(
            do_reflect, vec.reflect(unit_d, n), vec.refract(unit_d, n, ratio)
        )
        branches.append((MAT_DIELECTRIC, dir_diel, jnp.ones_like(att)))

    # --- Isotropic (src/Lib.hs:861-865; corrected phase function) ---
    if scene.has_isotropic:
        if scene.strict:
            # strict-quirks: randomInUnitSphereM draws a NON-unit vector
            # uniform in the ball (src/Lib.hs:1160-1176) and the integrator
            # weighs it by the Lambertian scatteringPdf against the medium's
            # fixed (1,0,0) hit normal with pdfVal = 1 (src/Lib.hs:861-878):
            # weight = att * max(0, dot(n, raw_dir)) / pi.
            # (radius floored away from 0: a zero-length direction would make
            # the next intersect degenerate; the 1e-6 ball is ~1e-18 of mass)
            dir_iso = rng.unit_vector_from(u[:, 11:13]) \
                * jnp.cbrt(jnp.maximum(u[:, 13], 1e-6))[:, None]
            w_iso = att * (
                jnp.maximum(vec.dot(rec.normal, dir_iso), 0.0) * INV_PI
            )[:, None]
        else:
            dir_iso = rng.unit_vector_from(u[:, 11:13])
            w_iso = att
        branches.append((MAT_ISOTROPIC, dir_iso, w_iso))

    # select by material id; the first present branch is the base (lanes on
    # an emissive hit never use direction/weight - any finite value works,
    # including the emissive-only-scene fallback below)
    if not branches:
        branches.append((MAT_DIFFUSE_LIGHT, unit_d, jnp.zeros_like(att)))
    _, direction, weight = branches[0]
    for mk, d, w in branches[1:]:
        is_mk = mkind == mk
        direction = vec.where3(is_mk, d, direction)
        weight = vec.where3(is_mk, w, weight)
    scattered = mkind != MAT_DIFFUSE_LIGHT if scene.has_emissive \
        else jnp.ones(R, bool)

    return ScatterResult(
        direction=direction, weight=weight, emitted=emitted, scattered=scattered
    )
