"""Hardware repro for the round-1 SPECIALIZE_BLOCKS Mosaic fault.

Round 1 observed: per-block kind specialization in the Pallas intersect
kernel (ops/intersect_pallas.py) passes interpret mode but faults the real
TPU worker.  This script builds a synthetic mixed scene (2 sphere blocks +
2 quad blocks), runs the kernel specialized and uniform on the REAL device,
and compares against the XLA sweep.

Usage (on the TPU host):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/repro_specialize.py
Exit 0 = specialized kernel works on hardware (flip SPECIALIZE_BLOCKS on);
a worker crash/traceback = the fault reproduces (keep it off, file details
in PERFLOG.md).
"""
from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    from tpu_ray.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tpu_ray.models import objects as ob
    from tpu_ray.models.compile import build_scene
    from tpu_ray.ops import intersect_pallas as ip
    from tpu_ray.ops.intersect import intersect_scene

    r = np.random.default_rng(7)
    objs = [
        ob.Sphere(tuple(r.uniform(-20, 20, 3)), r.uniform(0.3, 1.0),
                  ob.Lambertian((1, 1, 1)))
        for _ in range(250)
    ]
    for plane in ("xy", "xz", "yz"):
        for _ in range(85):
            a = np.sort(r.uniform(-20, 20, 2))
            b = np.sort(r.uniform(-20, 20, 2))
            objs.append(ob.Rect(plane, a[0], a[1], b[0], b[1],
                                r.uniform(-20, 20), ob.Lambertian((1, 1, 1))))
    scene = build_scene(objs)
    print(f"scene: {scene.n_sphere} spheres, {scene.n_solid - scene.n_sphere}"
          f" quads -> {(-(-scene.n_solid // ip.PBLK))} blocks", file=sys.stderr)

    ro = jnp.asarray(r.uniform(-30, 30, (4096, 3)), jnp.float32)
    rd = jnp.asarray(r.normal(size=(4096, 3)), jnp.float32)
    rt = jnp.asarray(r.random(4096), jnp.float32)

    ref = intersect_scene(scene, ro, rd, rt, jax.random.PRNGKey(0))
    t_ref = np.asarray(ref.t)

    for spec in (False, True):
        ip.SPECIALIZE_BLOCKS = spec
        for cull in (False, True):
            t, i = jax.jit(
                lambda ro, rd, rt: ip.intersect_solids_pallas(
                    scene, ro, rd, rt, interpret=False, cull=cull)
            )(ro, rd, rt)
            t = np.asarray(t)  # forces real device execution + fetch
            ok = np.allclose(
                np.where(np.isfinite(t), t, 0.0),
                np.where(np.isfinite(t_ref), t_ref, 0.0), rtol=5e-4,
            )
            print(f"SPECIALIZE_BLOCKS={spec} cull={cull}: "
                  f"{'OK' if ok else 'MISMATCH'} "
                  f"({np.isfinite(t).sum()} hits)", file=sys.stderr)
            if not ok:
                return 1
    print("specialized kernel validated on hardware", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
