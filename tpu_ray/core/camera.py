"""Thin-lens camera with defocus blur and shutter-time motion blur.

TPU-native counterpart of the reference camera (src/Lib.hs:1230-1295):
same precomputed origin / lower-left / horizontal / vertical frame, but
``get_rays`` produces a whole wavefront of rays from batched (s, t) screen
coordinates in one shot.  Ray directions are intentionally NOT normalized,
matching the reference (src/Lib.hs:1259-1266) - the hit parameter t is in
units of |direction|.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from . import rng, vec


@struct.dataclass
class Camera:
    origin: jnp.ndarray        # (3,)
    lower_left: jnp.ndarray    # (3,)
    horizontal: jnp.ndarray    # (3,)
    vertical: jnp.ndarray      # (3,)
    u: jnp.ndarray             # (3,)
    v: jnp.ndarray             # (3,)
    w: jnp.ndarray             # (3,)
    lens_radius: jnp.ndarray   # ()
    time0: jnp.ndarray         # ()
    time1: jnp.ndarray         # ()
    # Image-plane sample generator: "uniform" = per-sample hash jitter
    # (the reference's estimator, src/Lib.hs:1352-1371); "sobol" =
    # per-pixel scrambled (0,2)-sequence (core/qmc.py).  A static pytree
    # field: it rides every jit cache key wherever the camera flows, so
    # no integrator signature carries it explicitly.
    sampler: str = struct.field(pytree_node=False, default="uniform")

    @classmethod
    def create(
        cls,
        lookfrom,
        lookat,
        vup,
        vfov_deg: float,
        aspect: float,
        aperture: float,
        focus_dist: float,
        time0: float = 0.0,
        time1: float = 1.0,
    ) -> "Camera":
        """Precompute the camera frame (reference ``newCamera``, src/Lib.hs:1269-1295).

        ENTIRELY in host numpy f32: through round 4 this eager jnp math
        ran ~10 mini-op executables (tan, normalize's multiply / reduce /
        sqrt / divide, cross, ...) - each a persistent-cache entry to
        load and a tunnel dispatch on every cold start (r5 working-set
        audit, VERDICT r4 next-round #1b).  Host math also makes the
        camera bits platform-INDEPENDENT (the eager device chain rounded
        per backend).  tan runs in f64 and rounds once to f32; everything
        else is IEEE f32 single ops.  Zero compiles pinned by
        tests/test_core.py::test_camera_create_compiles_nothing.
        """
        import numpy as np

        f32 = np.float32
        lf = np.asarray(lookfrom, f32)
        la = np.asarray(lookat, f32)
        vu = np.asarray(vup, f32)
        theta = float(vfov_deg) * float(np.pi) / 180.0
        hh = f32(np.tan(theta / 2.0))
        hw = f32(aspect) * hh

        def norm(x):
            return x / f32(np.sqrt(f32(x @ x)))

        w = norm(lf - la)
        u = norm(np.cross(vu, w).astype(f32))
        v = np.cross(w, u).astype(f32)
        fd = f32(focus_dist)
        lower_left = lf - (hw * fd) * u - (hh * fd) * v - fd * w
        return cls(
            origin=jnp.asarray(lf),
            lower_left=jnp.asarray(lower_left),
            horizontal=jnp.asarray((f32(2.0) * hw * fd) * u),
            vertical=jnp.asarray((f32(2.0) * hh * fd) * v),
            u=jnp.asarray(u),
            v=jnp.asarray(v),
            w=jnp.asarray(w),
            lens_radius=jnp.asarray(f32(aperture / 2.0)),
            time0=jnp.asarray(f32(time0)),
            time1=jnp.asarray(f32(time1)),
        )

    def get_rays(self, key, s: jnp.ndarray, t: jnp.ndarray):
        """Batched ``getRay`` (reference: src/Lib.hs:1253-1267).

        ``s``/``t`` are (R,) screen fractions.  Returns (origin (R,3),
        direction (R,3) unnormalized, time (R,)).
        """
        u3 = jax.random.uniform(key, s.shape + (3,))
        return self.rays_from_uniforms(s, t, u3)

    def rays_from_uniforms(self, s: jnp.ndarray, t: jnp.ndarray, u3: jnp.ndarray):
        """``getRay`` from 3 pre-drawn uniforms per ray (lens disk r/phi,
        shutter time) - used by the ray-pool integrator, which regenerates
        camera rays inside the bounce loop."""
        r = self.lens_radius * jnp.sqrt(u3[..., 0])
        phi = 2.0 * jnp.pi * u3[..., 1]
        offset = (r * jnp.cos(phi))[..., None] * self.u + (r * jnp.sin(phi))[..., None] * self.v
        tm = self.time0 + (self.time1 - self.time0) * u3[..., 2]
        origin = self.origin + offset
        direction = (
            self.lower_left
            + s[..., None] * self.horizontal
            + t[..., None] * self.vertical
            - self.origin
            - offset
        )
        return origin, direction, tm
