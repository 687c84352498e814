"""Stage 4: full-scale sorted-sweep validation after the int32-domain
unsort fix (the float32 gather flushed denormal-bitcast prim indices).

Compares intersect_solids_pallas sort=True (both cull styles) against
sort=False at R=163840 on whatever the default device is.
"""
from __future__ import annotations

import os
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpu_ray.models.scenes import SCENES
    from tpu_ray.ops import intersect_pallas as ip

    print("device:", jax.devices()[0], file=sys.stderr)
    scene = SCENES["next-week-final"].build(seed=1024)
    R = 163840
    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.uniform(-50, 400, (R, 3)).astype(np.float32))
    rd = jnp.asarray(rng.normal(0, 1, (R, 3)).astype(np.float32))
    rt = jnp.asarray(rng.random(R).astype(np.float32))

    plain = jax.jit(lambda a, b, c: ip.intersect_solids_pallas(
        scene, a, b, c, sort=False))
    bt_p, bi_p = map(np.asarray, plain(ro, rd, rt))

    for style in ("compact", "when"):
        os.environ["TPU_RAY_CULL_STYLE"] = style
        f = jax.jit(lambda a, b, c: ip.intersect_solids_pallas(
            scene, a, b, c, sort=True))
        bt_s, bi_s = map(np.asarray, f(ro, rd, rt))
        t_eq = np.array_equal(bt_p, bt_s)
        i_eq = np.array_equal(bi_p, bi_s)
        nbad = int((bt_p != bt_s).sum() + (bi_p != bi_s).sum())
        print(f"{style}: t {t_eq} i {i_eq} ({nbad} lane-fields differ)")


if __name__ == "__main__":
    main()
